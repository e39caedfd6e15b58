"""Property-based layout invariants (hypothesis).

Every batch layout must conserve the corpus exactly: total token mass,
per-document mass, and id ranges — for arbitrary document length
distributions, including empty docs, single-token docs, and docs longer
than the largest bucket.
"""

import numpy as np
from hypothesis import given, settings, strategies as st

from pylda_tpu.corpus.corpus import Corpus
from pylda_tpu.corpus.vocabulary import Vocabulary

V = 50
_vocab = Vocabulary(f"w{i}" for i in range(V))

docs_strategy = st.lists(
    st.lists(st.integers(min_value=0, max_value=V - 1), max_size=300),
    min_size=1,
    max_size=20,
)


@settings(max_examples=25, deadline=None)
@given(docs=docs_strategy)
def test_dense_layout_conserves_counts(docs):
    corpus = Corpus([np.asarray(d, np.int32) for d in docs], _vocab)
    batch = corpus.to_dense()
    assert batch.counts.sum() == corpus.num_tokens
    for row, d in enumerate(batch.doc_ids):
        if d >= 0:
            assert batch.counts[row].sum() == corpus.docs[d].size


@settings(max_examples=25, deadline=None)
@given(docs=docs_strategy)
def test_ragged_layout_conserves_counts(docs):
    corpus = Corpus([np.asarray(d, np.int32) for d in docs], _vocab)
    buckets = corpus.to_ragged_buckets(
        bucket_sizes=(4, 8, 16), doc_pad_multiple=4
    )
    total = sum(b.cnts.sum() for b in buckets)
    assert total == corpus.num_tokens
    # Per-doc mass conserved across chunked rows too.
    per_doc = {}
    for b in buckets:
        for row, d in enumerate(b.doc_ids):
            if d >= 0:
                per_doc[d] = per_doc.get(d, 0.0) + float(b.cnts[row].sum())
        assert (b.ids >= 0).all() and (b.ids < V).all()
        # padded slots carry zero counts
        assert ((b.cnts > 0) <= (b.mask[:, None] > 0)).all()
    for d in range(corpus.num_docs):
        assert per_doc.get(d, 0.0) == corpus.docs[d].size


@settings(max_examples=25, deadline=None)
@given(docs=docs_strategy)
def test_sequence_layout_conserves_all_tokens(docs):
    """Blocking semantics: docs longer than the largest bucket are split
    into multiple rows sharing a doc id — every token survives (the
    round-1 layout truncated; SURVEY.md §5 long-context analog (a))."""
    corpus = Corpus([np.asarray(d, np.int32) for d in docs], _vocab)
    buckets = corpus.to_sequence_buckets(
        bucket_sizes=(4, 8, 16), doc_pad_multiple=4
    )
    seen = {}
    for b in buckets:
        for row, d in enumerate(b.doc_ids):
            if d >= 0:
                seen[d] = seen.get(d, 0) + int(b.token_mask[row].sum())
    for d in range(corpus.num_docs):
        assert seen.get(d, 0) == corpus.docs[d].size


@settings(max_examples=15, deadline=None)
@given(docs=docs_strategy, seed=st.integers(min_value=0, max_value=2**31 - 1))
def test_minibatch_indices_partition_exactly(docs, seed):
    corpus = Corpus([np.asarray(d, np.int32) for d in docs], _vocab)
    parts = corpus.minibatch_indices(3, seed=seed)
    flat = np.concatenate(parts) if parts else np.array([], np.int64)
    assert sorted(flat.tolist()) == list(range(corpus.num_docs))
