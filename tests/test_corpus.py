import numpy as np

from pylda_tpu.corpus import Corpus, Vocabulary, synthetic_corpus
from pylda_tpu.corpus.datasets import (
    bundled_corpus_dir,
    load_input_directory,
)


def test_vocabulary_dedup_and_first_field():
    v = Vocabulary(["apple", "banana", "apple", "cherry"])
    assert len(v) == 3
    assert v.id_of("apple") == 0
    assert v.id_of("cherry") == 2
    assert v[1] == "banana"


def test_vocabulary_from_file(tmp_path):
    p = tmp_path / "voc.dat"
    p.write_text("apple 12\nbanana\napple\n\ncherry x y\n")
    v = Vocabulary.from_file(str(p))
    assert v.types == ["apple", "banana", "cherry"]


def test_corpus_parsing_drops_oov_and_lowercases():
    v = Vocabulary(["dog", "cat"])
    c = Corpus.from_lines(["Dog CAT unknown dog", "", "mouse"], v)
    assert c.num_docs == 3
    assert c.docs[0].tolist() == [0, 1, 0]
    assert c.docs[1].size == 0
    assert c.docs[2].size == 0
    ids, cnts = c.doc_unique(0)
    assert ids.tolist() == [0, 1]
    assert cnts.tolist() == [2.0, 1.0]


def test_dense_batch_matches_counts():
    v = Vocabulary(["a", "b", "c"])
    c = Corpus.from_lines(["a a b", "c"], v)
    batch = c.to_dense()
    assert batch.counts.shape == (2, 3)
    np.testing.assert_array_equal(batch.counts[0], [2, 1, 0])
    np.testing.assert_array_equal(batch.counts[1], [0, 0, 1])
    assert batch.num_tokens == 4


def test_dense_batch_padding():
    v = Vocabulary(["a"])
    c = Corpus.from_lines(["a"], v)
    batch = c.to_dense(pad_docs_to=4)
    assert batch.counts.shape == (4, 1)
    assert batch.mask.sum() == 1.0
    assert (batch.doc_ids[1:] == -1).all()


def test_ragged_buckets_conserve_tokens():
    corpus, _, _ = synthetic_corpus(
        num_docs=50, num_topics=5, num_types=300, mean_doc_length=80, seed=1
    )
    buckets = corpus.to_ragged_buckets(
        bucket_sizes=(32, 64, 128), doc_pad_multiple=8
    )
    total = sum(b.cnts.sum() for b in buckets)
    assert total == corpus.num_tokens
    # Every real row's ids are within vocab; padded slots carry zero count.
    for b in buckets:
        assert b.ids.max() < corpus.num_types
        pad_rows = b.mask == 0
        assert b.cnts[pad_rows].sum() == 0


def test_ragged_buckets_chunk_oversized_docs():
    v = Vocabulary([f"w{i}" for i in range(100)])
    # One doc with 100 unique types, bucket max 32 → 4 chunks.
    c = Corpus([np.arange(100, dtype=np.int32)], v)
    buckets = c.to_ragged_buckets(bucket_sizes=(16, 32), doc_pad_multiple=1)
    assert sum(b.cnts.sum() for b in buckets) == 100
    rows = sum(int(b.mask.sum()) for b in buckets)
    assert rows == 4


def test_sequence_buckets():
    corpus, _, _ = synthetic_corpus(
        num_docs=30, num_topics=3, num_types=100, mean_doc_length=50, seed=2
    )
    buckets = corpus.to_sequence_buckets(
        bucket_sizes=(64, 128), doc_pad_multiple=4
    )
    # Blocking, never truncation: every token survives the layout.
    total = sum(b.token_mask.sum() for b in buckets)
    assert total == corpus.num_tokens
    docs_seen = len(
        {
            int(d)
            for b in buckets
            for d in np.asarray(b.doc_ids)
            if d >= 0
        }
    )
    assert docs_seen == 30


def test_sequence_buckets_block_oversized_docs():
    """A 10x-max-bucket document becomes 10 chunk rows sharing a doc id;
    token conservation holds (SURVEY.md section 5 long-context (a))."""
    from pylda_tpu.corpus.corpus import Corpus
    from pylda_tpu.corpus.vocabulary import Vocabulary

    rng = np.random.default_rng(0)
    vocab = Vocabulary(f"w{i}" for i in range(50))
    big = rng.integers(0, 50, size=10 * 128)
    small = rng.integers(0, 50, size=30)
    corpus = Corpus([big, small], vocab)
    buckets = corpus.to_sequence_buckets(
        bucket_sizes=(64, 128), doc_pad_multiple=1
    )
    total = sum(b.token_mask.sum() for b in buckets)
    assert total == corpus.num_tokens == 10 * 128 + 30
    rows_doc0 = sum(
        int((np.asarray(b.doc_ids) == 0).sum()) for b in buckets
    )
    assert rows_doc0 == 10
    # Every chunk row of doc 0 carries exactly its share of the tokens.
    from collections import Counter

    got = Counter()
    for b in buckets:
        for r, d in enumerate(np.asarray(b.doc_ids)):
            if d == 0:
                m = b.token_mask[r].astype(bool)
                got.update(b.tokens[r][m].tolist())
    assert got == Counter(big.tolist())


def test_minibatch_indices_partition():
    corpus, _, _ = synthetic_corpus(
        num_docs=25, num_topics=3, num_types=50, mean_doc_length=10, seed=3
    )
    batches = corpus.minibatch_indices(8, seed=0)
    flat = np.concatenate(batches)
    assert sorted(flat.tolist()) == list(range(25))
    assert all(len(b) <= 8 for b in batches)


def test_bundled_corpus_loads():
    d = bundled_corpus_dir()
    train, test, vocab = load_input_directory(d)
    assert train.num_docs == 400
    assert test is not None and test.num_docs == 100
    assert len(vocab) > 100
    assert train.num_tokens > 10000


def test_synthetic_corpus_shapes():
    corpus, beta, theta = synthetic_corpus(
        num_docs=10, num_topics=4, num_types=60, mean_doc_length=20, seed=0
    )
    assert beta.shape == (4, 60)
    assert theta.shape == (10, 4)
    np.testing.assert_allclose(beta.sum(1), 1.0, rtol=1e-9)
    assert corpus.num_docs == 10


def test_ragged_chunking_respects_pad_multiple():
    """Oversized buckets split on doc_pad_multiple boundaries (the mesh
    sharding invariant; regression for raw-budget slicing)."""
    from pylda_tpu.models.layouts import build_vb_batches
    from pylda_tpu.utils.config import LDAConfig

    rng = np.random.default_rng(0)
    docs = [rng.integers(0, 5000, 40).astype(np.int32) for _ in range(640)]
    vocab = Vocabulary(f"w{i}" for i in range(5000))
    corpus = Corpus(docs, vocab)
    cfg = LDAConfig(number_of_topics=8, doc_pad_multiple=64,
                    dense_vocab_threshold=64, bucket_sizes=(64,))
    batches = build_vb_batches(corpus, cfg, memory_budget_mb=1)
    assert len(batches) > 1  # the tiny budget forces chunking
    for b in batches:
        assert b.ids.shape[0] % 64 == 0, b.ids.shape


def test_config_validates_enums():
    from pylda_tpu.utils.config import LDAConfig
    import pytest as _pytest

    for bad in (dict(gamma_init="zeros"), dict(use_pallas="auto"),
                dict(compute_dtype="fp8"),
                dict(shard_vocab=True, shard_topics=True)):
        with _pytest.raises(ValueError):
            LDAConfig(number_of_topics=4, **bad).validate()
