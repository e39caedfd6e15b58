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


@settings(max_examples=40, deadline=None)
@given(
    uniques=st.lists(
        st.integers(min_value=0, max_value=6000), min_size=0, max_size=200
    ),
    align=st.sampled_from([8, 16, 32]),
    max_buckets=st.integers(min_value=1, max_value=8),
)
def test_planned_geometry_always_admits_every_document(
    uniques, align, max_buckets
):
    """plan_bucket_sizes invariants for arbitrary inputs: widths are
    aligned, sorted, within cap, and every document either fits a
    bucket or (> cap) chunks into the cap-wide largest bucket; the plan
    never exceeds the single-bucket cost under its own model."""
    from pylda_tpu.models.layouts import plan_bucket_sizes
    from pylda_tpu.utils import round_up

    cap = 2048
    geom = plan_bucket_sizes(
        uniques, max_buckets=max_buckets, align=align, cap=cap,
        row_pad=8, bucket_overhead_slots=64,
    )
    assert geom == tuple(sorted(set(geom)))
    assert all(w % align == 0 and 0 < w <= max(cap, align) for w in geom)
    assert len(geom) <= max(max_buckets, 1)
    real = [u for u in uniques if u > 0]
    if real:
        assert max(geom) >= min(round_up(max(real), align), cap)


@settings(max_examples=25, deadline=None)
@given(docs=docs_strategy)
def test_auto_geometry_layout_conserves_counts(docs):
    """End-to-end: a planner-chosen geometry through to_ragged_buckets
    conserves total token mass (chunked oversized docs included)."""
    from pylda_tpu.models.layouts import plan_bucket_sizes

    corpus = Corpus([np.asarray(d, np.int32) for d in docs], _vocab)
    geom = plan_bucket_sizes(
        [ids.size for ids, _ in corpus._uniques], align=8, row_pad=8
    )
    buckets = corpus.to_ragged_buckets(bucket_sizes=geom)
    total = sum(float(np.asarray(b.cnts).sum()) for b in buckets)
    assert total == corpus.num_tokens
