"""Parsed-row sidecar cache for StreamingCorpus (round-3 verdict item 3).

The indexing pass writes the parsed token-id stream next to doc.dat;
epoch construction then reads rows from the memmapped sidecar instead of
re-tokenizing.  Pinned here: bit-identity with the re-parse path,
reopen-without-reparse, fingerprint invalidation, and the graceful
fallback when the directory is unwritable.
"""

import os
import stat

import numpy as np
import pytest

from pylda_tpu.corpus.streaming import StreamingCorpus
from pylda_tpu.corpus.synthetic import synthetic_corpus


def _write_corpus(tmp_path, num_docs=64, seed=0):
    corpus, _, _ = synthetic_corpus(
        num_docs=num_docs, num_topics=5, num_types=400,
        mean_doc_length=30.0, seed=seed,
    )
    p = str(tmp_path / "doc.dat")
    with open(p, "w") as f:
        for d in corpus.docs:
            f.write(" ".join(corpus.vocab.types[t] for t in d) + "\n")
    return p, corpus.vocab


def test_rowcache_bit_identical_to_reparse(tmp_path):
    p, vocab = _write_corpus(tmp_path)
    cached = StreamingCorpus(p, vocab, row_cache="auto")
    plain = StreamingCorpus(p, vocab, row_cache="off")
    assert cached._row_ids is not None
    assert plain._row_ids is None
    assert cached.num_tokens == plain.num_tokens
    np.testing.assert_array_equal(
        cached._unique_counts, plain._unique_counts
    )
    idx = [3, 0, 17, 63, 5]
    a, b = cached._parse(idx), plain._parse(idx)
    for da, db in zip(a.docs, b.docs):
        np.testing.assert_array_equal(da, db)
    ba = cached.to_ragged_buckets(bucket_sizes=(32, 64), doc_pad_multiple=8)
    bb = plain.to_ragged_buckets(bucket_sizes=(32, 64), doc_pad_multiple=8)
    for x, y in zip(ba, bb):
        np.testing.assert_array_equal(np.asarray(x.ids), np.asarray(y.ids))
        np.testing.assert_array_equal(np.asarray(x.cnts), np.asarray(y.cnts))
        np.testing.assert_array_equal(x.doc_ids, y.doc_ids)


def test_rowcache_reopen_skips_reparse(tmp_path, monkeypatch):
    p, vocab = _write_corpus(tmp_path)
    StreamingCorpus(p, vocab)  # writes the sidecar
    # Reopening must not call the tokenizer at all.
    import pylda_tpu.corpus.streaming as sm

    def boom(*a, **k):
        raise AssertionError("reopen re-parsed despite a valid sidecar")

    monkeypatch.setattr(
        sm.StreamingCorpus, "_index_scan", boom
    )
    again = StreamingCorpus(p, vocab)
    assert again._row_ids is not None
    assert again.num_tokens > 0


def test_rowcache_invalidated_by_text_change(tmp_path):
    p, vocab = _write_corpus(tmp_path)
    first = StreamingCorpus(p, vocab)
    tokens_before = first.num_tokens
    with open(p, "a") as f:
        f.write(vocab.types[0] + " " + vocab.types[1] + "\n")
    fresh = StreamingCorpus(p, vocab)
    assert fresh.num_docs == first.num_docs + 1
    assert fresh.num_tokens == tokens_before + 2
    assert fresh._row_ids is not None  # rewrote a valid sidecar


def test_rowcache_unwritable_directory_falls_back(tmp_path):
    p, vocab = _write_corpus(tmp_path)
    mode = os.stat(tmp_path).st_mode
    os.chmod(tmp_path, stat.S_IRUSR | stat.S_IXUSR)
    try:
        if os.access(tmp_path, os.W_OK):
            pytest.skip("running as a user the chmod cannot restrict")
        sc = StreamingCorpus(p, vocab, row_cache="auto")
        assert sc._row_ids is None  # fell back, no crash
        assert sc.num_tokens > 0
        sub = sc._parse([0, 1])
        assert len(sub.docs) == 2
    finally:
        os.chmod(tmp_path, mode)


def test_rowcache_process_local_blocks(tmp_path):
    p, vocab = _write_corpus(tmp_path, num_docs=30)
    full = StreamingCorpus(p, vocab, row_cache="off")
    a = StreamingCorpus(p, vocab, process_index=0, process_count=2)
    b = StreamingCorpus(p, vocab, process_index=1, process_count=2)
    assert a.num_docs + b.num_docs == 30
    assert a.num_tokens + b.num_tokens == full.num_tokens
    np.testing.assert_array_equal(
        a._parse([0]).docs[0], full._parse([0]).docs[0]
    )
    np.testing.assert_array_equal(
        b._parse([0]).docs[0], full._parse([a.num_docs]).docs[0]
    )
