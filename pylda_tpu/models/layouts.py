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
    memory_budget_mb: Optional[int] = None,
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
    if memory_budget_mb is None:
        memory_budget_mb = getattr(config, "estep_memory_budget_mb", 512)
        # kdt regime (K < 64 on accelerators): the sweep is HBM-bound
        # streaming the bf16 factor block, and chunking rows so each
        # chunk's B tile fits VMEM lets XLA keep it resident across
        # that chunk's while_loop sweeps — measured at the config-2
        # shape: 512 MB budget 95.0k docs/s, 48 MB 103.2k (+8.6%),
        # 24 MB flat (saturated).  dtk (K >= 64) keeps the full budget
        # — measured at the flagship (K=100, V=10k): 512 MB 677.0k
        # docs/s, 96 MB 629.3k, 48 MB 537.2k — chunking only adds
        # while_loop overhead where B is already effectively resident.
        import jax as _jax

        from pylda_tpu.ops.estep import _factor_layout

        if (
            _factor_layout(K) == "kdt"
            and _jax.default_backend() != "cpu"
        ):
            memory_budget_mb = min(memory_budget_mb, 48)
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
        bucket_sizes=effective_bucket_sizes(corpus, config),
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


def plan_bucket_sizes(
    unique_counts: Sequence[int],
    max_buckets: int = 8,
    align: int = 16,
    cap: int = 2048,
    row_pad: int = 64,
    bucket_overhead_slots: int = 4096,
    minibatch_fraction: Optional[float] = None,
    width_rows: Optional[dict] = None,
) -> tuple:
    """Corpus-adaptive ragged bucket geometry: DP that minimises total
    device slots (rows x bucket width, padding included).

    The sweep phase of the ragged E-step costs ~0.2 ns/slot on a v5e
    (BENCH_SUITE.md) and padding slots cost exactly as much as real
    ones, so geometry = slots is the right objective.  The fixed pow2
    default wastes up to ~50% for docs just above an edge (e.g. 130
    unique types pays 256); on the flagship bench shape it measures
    77.6% occupancy vs 91%+ planned (scripts/bucket_geometry_study.py).

    Cost model per bucket: ``round_up(rows, row_pad) * width +
    bucket_overhead_slots`` — the row padding term naturally suppresses
    slivers of buckets, and the constant term accounts for per-bucket
    glue (gather setup, while_loop scaffolding) so the DP does not
    shatter the corpus into dozens of near-empty buckets.

    - ``align``: candidate widths are multiples of this (sublane-friendly;
      the token axis sits in sublanes of the [rows, T, K] gather block).
    - ``cap``: documents with more unique types are chunked to ``cap``-wide
      rows by ``Corpus.to_ragged_buckets`` (blockwise long-doc handling),
      so each contributes ceil(u/cap) rows of width cap here.
    - Returns a sorted tuple of bucket widths (largest == the max needed),
      usable directly as ``LDAConfig.bucket_sizes``.
    - ``width_rows``: precomputed {aligned width: row count} replacing the
      ``unique_counts`` walk — the multi-host negotiation allgather-sums
      per-host histograms and plans from the GLOBAL one
      (``aligned_width_histogram`` builds the per-host vector).
    """
    rows: dict = dict(width_rows) if width_rows is not None else {}
    if width_rows is None:
        for u in unique_counts:
            u = int(u)
            if u <= 0:
                continue
            if u > cap:
                rows[cap] = rows.get(cap, 0) + -(-u // cap)
            else:
                w = _round_up(u, align)
                rows[w] = rows.get(w, 0) + 1
    rows = {w: r for w, r in rows.items() if r > 0}
    if not rows:
        return (align,)
    widths = sorted(rows)  # candidate edges (aligned)
    n = len(widths)
    counts = np.array([rows[w] for w in widths], dtype=np.int64)
    cum = np.concatenate([[0], np.cumsum(counts)])

    def seg_rows(i: int, j: int) -> int:
        r = int(cum[j + 1] - cum[i])
        if minibatch_fraction is not None:
            # SVI fixed-geometry capacity cost: a minibatch bucket is
            # provisioned at expected rows + 4 sigma, then padded
            # (plan_svi_ragged_geometry), so per-bucket overshoot
            # multiplies across buckets — the DP must price the
            # capacity formula, not corpus rows (33% fewer minibatch
            # slots than pow2 on the wiki-shaped config, 7% fewer than
            # the corpus-level plan).
            e = r * minibatch_fraction
            return _round_up(
                int(np.ceil(e + 4.0 * np.sqrt(max(e, 1.0)))), row_pad
            )
        return _round_up(r, row_pad)

    def seg_cost(i: int, j: int) -> int:  # widths[i..j] into one bucket
        return seg_rows(i, j) * widths[j] + bucket_overhead_slots

    INF = float("inf")
    m = min(max_buckets, n)
    # f[b][j] = min cost covering widths[0..j-1] with b buckets.
    f = [[INF] * (n + 1) for _ in range(m + 1)]
    back = [[-1] * (n + 1) for _ in range(m + 1)]
    f[0][0] = 0.0
    for b in range(1, m + 1):
        for j in range(1, n + 1):
            for i in range(j):
                if f[b - 1][i] == INF:
                    continue
                c = f[b - 1][i] + seg_cost(i, j - 1)
                if c < f[b][j]:
                    f[b][j] = c
                    back[b][j] = i
    best_b = min(range(1, m + 1), key=lambda b: f[b][n])
    edges = []
    j, b = n, best_b
    while j > 0:
        i = back[b][j]
        edges.append(widths[j - 1])
        j, b = i, b - 1
    return tuple(sorted(edges))


def unique_counts_of(corpus: Corpus) -> Optional[np.ndarray]:
    """Per-document unique-type counts, from whichever representation the
    corpus keeps (in-RAM ``_uniques`` or the streaming indexing pass's
    ``_unique_counts``); None when unavailable."""
    uniques = getattr(corpus, "_uniques", None)
    if uniques is not None:
        return np.asarray([ids.size for ids, _ in uniques], dtype=np.int64)
    counts = getattr(corpus, "_unique_counts", None)
    if counts is None:
        return None
    return np.asarray(counts, dtype=np.int64)


def aligned_width_histogram(
    unique_counts: np.ndarray, align: int = 16, cap: int = 2048
) -> np.ndarray:
    """Fixed-length [cap // align] row-count vector over aligned widths
    (bin i = width (i+1)*align; oversized docs contribute ceil(u/cap)
    rows to the last bin).  A fixed bin set makes the vector
    allgather-able across hosts for global geometry planning."""
    u = np.asarray(unique_counts, dtype=np.int64)
    u = u[u > 0]
    n_bins = cap // align
    out = np.zeros((n_bins,), dtype=np.int64)
    small = u[u <= cap]
    # Clip covers cap not a multiple of align: docs with u in
    # (align*n_bins, cap] land in the last bin instead of indexing out
    # of bounds.
    bins = np.minimum((small + align - 1) // align - 1, n_bins - 1)
    np.add.at(out, bins, 1)
    big = u[u > cap]
    out[-1] += int((-(-big // cap)).sum())
    return out


def effective_bucket_sizes(
    corpus: Corpus,
    config: LDAConfig,
    minibatch_fraction: Optional[float] = None,
) -> tuple:
    """The ragged bucket geometry an engine should use for ``corpus``.

    ``bucket_policy="auto"`` plans a slot-minimising geometry from the
    corpus's unique-type histogram (``plan_bucket_sizes``); anything
    else — and every case where the histogram is unavailable or the
    geometry must be negotiated across hosts (process-local corpora:
    each host sees a different histogram, and bucket KEYS must agree
    before ``lift_process_local_buckets`` can max capacities) — keeps
    the configured fixed ``bucket_sizes``.
    """
    fixed = tuple(config.bucket_sizes)
    if getattr(config, "bucket_policy", "fixed") != "auto":
        return fixed
    if fixed != LDAConfig.__dataclass_fields__["bucket_sizes"].default:
        return fixed  # explicit user geometry wins over the planner
    if getattr(corpus, "process_local", False):
        return fixed
    uniques = getattr(corpus, "_uniques", None)
    if uniques is not None:
        counts = [ids.size for ids, _ in uniques]
    else:
        # Disk-backed streaming corpus: the offset-indexing pass records
        # per-doc unique counts (4 bytes/doc), so the planner needs no
        # extra corpus pass.
        counts = getattr(corpus, "_unique_counts", None)
        if counts is None:
            return fixed
    key = (max(fixed), config.doc_pad_multiple, minibatch_fraction)
    cache = corpus.__dict__.setdefault("_auto_bucket_cache", {})
    if key not in cache:  # O(D) histogram walk — plan once per corpus
        cache[key] = plan_bucket_sizes(
            counts,
            cap=key[0],
            row_pad=key[1],
            minibatch_fraction=minibatch_fraction,
        )
    return cache[key]


def effective_sequence_bucket_sizes(corpus: Corpus, config: LDAConfig) -> tuple:
    """Sequence-layout analog of ``effective_bucket_sizes`` for the
    sampling engines (Gibbs/hybrid): bucket key is the TOKEN count (a
    within-doc sweep is a ``lax.scan`` over positions, so per-bucket cost
    is rows x width — the same slots objective; oversized docs chunk to
    the cap exactly like the ragged layout's blockwise split)."""
    fixed = tuple(config.bucket_sizes)
    if getattr(config, "bucket_policy", "fixed") != "auto":
        return fixed
    if fixed != LDAConfig.__dataclass_fields__["bucket_sizes"].default:
        return fixed
    if getattr(corpus, "process_local", False):
        return fixed
    uniques = getattr(corpus, "_uniques", None)
    if uniques is None:
        return fixed
    key = ("seq", max(fixed), config.doc_pad_multiple)
    cache = corpus.__dict__.setdefault("_auto_bucket_cache", {})
    if key not in cache:
        cache[key] = plan_bucket_sizes(
            [int(c.sum()) for _, c in uniques],
            cap=key[1],
            row_pad=key[2],
        )
    return cache[key]


def svi_capacities_from_expected(
    sizes: Sequence[int], expected: dict, pad: int
) -> Optional[dict]:
    """Capacity plan (bucket size -> fixed row capacity) from EXPECTED
    per-minibatch row counts per bucket.

    Capacity per bucket covers the hypergeometric row-count fluctuation
    at +4 sigma (overflow probability ~3e-5 per bucket per batch).
    Buckets whose expected minibatch rows are below half a pad-multiple
    are dropped from the geometry — their rare documents promote into
    the next larger bucket rather than dragging a mostly-padding bucket
    through every minibatch.  The largest size with any expected mass is
    always kept (documents must have somewhere to go).

    Deterministic in ``(sizes, expected, pad)`` — the multi-host
    negotiation (``parallel.mesh.negotiate_svi_ragged_geometry``) relies
    on every host computing IDENTICAL capacities from the allgathered
    expected-rows vector."""
    sizes = sorted(sizes)
    top = max((s for s in sizes if expected.get(s, 0) > 0), default=sizes[0])
    caps = {}
    carry = 0.0  # expected rows of dropped buckets promote upward
    for s in sizes:
        if s > top:
            break
        e = float(expected.get(s, 0)) + carry
        if s < top and e < pad / 2:
            carry = e
            continue
        carry = 0.0
        caps[s] = _round_up(int(np.ceil(e + 4.0 * np.sqrt(max(e, 1.0)))), pad)
    return caps or None


def plan_svi_ragged_geometry(
    corpus: Corpus, config: LDAConfig, batch_size: int
) -> Optional[dict]:
    """Capacity plan (bucket size -> fixed row capacity) for shape-stable
    SVI minibatches on the ragged layout (single-process corpora; the
    multi-host negotiated variant is
    ``parallel.mesh.negotiate_svi_ragged_geometry``).

    Random minibatches natively produce different bucket shape sets, and
    on TPU every new shape set recompiles the minibatch step — measured
    ~166 s/epoch at K=1000, V=100k vs sub-second once shapes are fixed.
    Overflow beyond the +4 sigma capacities falls back to per-batch
    shapes via ``GeometryOverflow``."""
    pad = config.doc_pad_multiple
    D = corpus.num_docs
    if D == 0 or batch_size <= 0:
        return None
    f = min(1.0, batch_size / D)
    # Geometry planned under the MINIBATCH capacity cost model (expected
    # rows + 4 sigma, padded): the corpus-level slot-minimising geometry
    # over-shatters minibatches, paying the sigma + pad overshoot once
    # per bucket per batch.
    sizes = sorted(effective_bucket_sizes(corpus, config, minibatch_fraction=f))
    hist = corpus.ragged_row_histogram(sizes)
    return svi_capacities_from_expected(
        sizes, {s: hist[s] * f for s in sizes}, pad
    )


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
