"""Batch-layout policy shared by the VB-family engines.

Decides dense vs ragged per the vocabulary size and splits batches into
bounded-memory chunks: the ragged E-step materialises a gathered
[rows, T, K] block (SURVEY.md section 7.1), so rows per chunk are capped by
a VMEM/HBM budget.  Chunks of one bucket share a shape so XLA compiles each
bucket width once.
"""

from __future__ import annotations

from typing import List, Optional, Sequence, Union

import numpy as np

from pylda_tpu.corpus.corpus import Corpus, DenseBatch, RaggedBucket
from pylda_tpu.utils.config import LDAConfig

VBBatch = Union[DenseBatch, RaggedBucket]


from pylda_tpu.utils import round_up as _round_up


def _split_rows(n_rows: int, chunk: int, pad_multiple: int) -> List[int]:
    chunk = max(pad_multiple, (chunk // pad_multiple) * pad_multiple)
    sizes = []
    done = 0
    while done < n_rows:
        sizes.append(min(chunk, _round_up(n_rows - done, pad_multiple)))
        done += sizes[-1]
    return sizes


def build_vb_batches(
    corpus: Corpus,
    config: LDAConfig,
    doc_indices: Optional[Sequence[int]] = None,
    pad_docs_to: Optional[int] = None,
    memory_budget_mb: int = 512,
    bucket_capacities: Optional[dict] = None,
) -> List[VBBatch]:
    """Materialise the corpus (or a subset) as E-step ready batches.

    ``bucket_capacities`` (ragged layout only) requests the fixed bucket
    geometry of ``Corpus.to_ragged_buckets`` — every capacity bucket is
    emitted at exactly its capacity, so different document subsets yield
    IDENTICAL batch shapes (and the deterministic memory chunking below
    then yields identical chunk shapes too).  May raise
    ``corpus.GeometryOverflow``."""
    V = corpus.num_types
    K = config.number_of_topics
    pad = config.doc_pad_multiple
    out: List[VBBatch] = []
    if V <= config.dense_vocab_threshold:
        idx = (
            np.arange(corpus.num_docs)
            if doc_indices is None
            else np.asarray(doc_indices)
        )
        # Rows per chunk bounded by the [rows, V] work arrays.
        budget_rows = max(pad, int(memory_budget_mb * 1e6 / (4 * max(V, K) * 3)))
        if pad_docs_to is not None:
            sizes = [_round_up(pad_docs_to, pad)]
        else:
            sizes = _split_rows(len(idx), budget_rows, pad)
        start = 0
        for size in sizes:
            sel = idx[start : start + size]
            start += len(sel)
            out.append(corpus.to_dense(doc_indices=sel, pad_docs_to=size))
        return out

    buckets = corpus.to_ragged_buckets(
        bucket_sizes=config.bucket_sizes,
        doc_pad_multiple=pad,
        doc_indices=doc_indices,
        bucket_capacities=bucket_capacities,
    )
    for b in buckets:
        T = b.ids.shape[1]
        budget_rows = max(pad, int(memory_budget_mb * 1e6 / (4 * T * K * 3)))
        rows = b.ids.shape[0]
        if rows <= budget_rows:
            out.append(b)
            continue
        # Chunk on pad-multiple boundaries (like the dense path) so every
        # chunk keeps the doc_pad_multiple invariant mesh sharding
        # relies on; bucket rows are already a multiple of pad.
        s = 0
        for size in _split_rows(rows, budget_rows, pad):
            e = min(rows, s + size)
            out.append(
                RaggedBucket(
                    ids=b.ids[s:e],
                    cnts=b.cnts[s:e],
                    mask=b.mask[s:e],
                    doc_ids=b.doc_ids[s:e],
                )
            )
            s = e
    return out


def plan_svi_ragged_geometry(
    corpus: Corpus, config: LDAConfig, batch_size: int
) -> Optional[dict]:
    """Capacity plan (bucket size -> fixed row capacity) for shape-stable
    SVI minibatches on the ragged layout.

    Random minibatches natively produce different bucket shape sets, and
    on TPU every new shape set recompiles the minibatch step — measured
    ~166 s/epoch at K=1000, V=100k vs sub-second once shapes are fixed.
    Capacity per bucket covers the hypergeometric row-count fluctuation
    of a batch_size draw at +4 sigma (overflow probability ~3e-5 per
    bucket per batch; overflow falls back to per-batch shapes via
    ``GeometryOverflow``).  Buckets whose EXPECTED minibatch rows are
    below half a pad-multiple are dropped from the geometry — their rare
    documents promote into the next larger bucket rather than dragging a
    mostly-padding bucket through every minibatch.  The largest native
    size is always kept (documents must have somewhere to go)."""
    sizes = sorted(config.bucket_sizes)
    pad = config.doc_pad_multiple
    D = corpus.num_docs
    if D == 0 or batch_size <= 0:
        return None
    f = min(1.0, batch_size / D)
    hist = corpus.ragged_row_histogram(sizes)
    top = max((s for s in sizes if hist[s] > 0), default=sizes[0])
    caps = {}
    carry = 0.0  # expected rows of dropped buckets promote upward
    for s in sizes:
        if s > top:
            break
        e = hist[s] * f + carry
        if s < top and e < pad / 2:
            carry = e
            continue
        carry = 0.0
        caps[s] = _round_up(int(np.ceil(e + 4.0 * np.sqrt(max(e, 1.0)))), pad)
    return caps or None


def assemble_gamma(
    doc_ids_list: List[np.ndarray],
    gammas: List[np.ndarray],
    num_docs: int,
    alpha: np.ndarray,
) -> np.ndarray:
    """Stitch per-batch gamma rows back into corpus document order.

    ``doc_ids_list[i][row]`` is the (global) document index of
    ``gammas[i][row]`` (-1 for padding rows).  Oversized documents split
    into several chunk rows (same doc id) recombine additively:
    gamma_doc = alpha + sum_chunks (gamma_chunk - alpha), exact because
    the gamma update is additive over a document's token set at a fixed
    phi.
    """
    alpha = np.asarray(alpha)
    out = np.tile(alpha[None, :], (num_docs, 1))
    for doc_ids, g in zip(doc_ids_list, gammas):
        doc_ids = np.asarray(doc_ids)
        valid = doc_ids >= 0
        # Scatter-add (duplicate doc ids accumulate): vectorised — the
        # per-row Python loop was O(D) interpreter work, a real
        # bottleneck for --dump_gamma at 100k+ docs.
        np.add.at(out, doc_ids[valid], np.asarray(g)[valid] - alpha)
    return out
