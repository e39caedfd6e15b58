"""Stochastic variational inference (minibatch) engine.

The reference has no minibatch mode; this is the new capability mandated
by BASELINE.json:10-11 ("Stochastic VI minibatch LDA ... corpora larger
than HBM"; "Doc-sharded SVI LDA, K=1000, vocab 100k, multi-host pod
slice with lambda allreduce"), implementing Hoffman et al. 2010 per
SURVEY.md section 8.4:

    local E-step on minibatch B_t (same kernels as batch VB), then
    lambda <- (1 - rho_t) lambda + rho_t (eta + (D/|B_t|) sstats),
    rho_t = (tau0 + t)^(-kappa),  kappa in (0.5, 1].

``learning()`` keeps the reference's "one call = one pass over the
corpus" contract: it runs one epoch of minibatches and returns the
epoch-averaged ELBO estimate.  Documents stream host->device one epoch
at a time, so the corpus never has to fit in HBM.

Doc sharding (the BASELINE config-5 path): minibatch documents shard
over the mesh "data" axis exactly like batch VB — the E-step's sstats
contraction reduces over the sharded doc axis, so GSPMD inserts one
psum before the lambda natural-gradient step ("lambda allreduce").
Multi-host: each process streams only its own contiguous corpus block
(``process_local`` corpora) and contributes per-host minibatch slices;
``pylda_tpu.parallel.mesh.shard_stacked_batch`` lifts them to global
arrays.

Dispatch discipline: when every minibatch of the epoch shares one batch
layout (the common case: fixed ``batch_size``, dense layout or a single
shared bucket shape) the WHOLE epoch — E-steps, natural-gradient lambda
updates, bound estimates — collapses into ONE ``lax.scan`` dispatch over
the stacked minibatches, sharded or not.  Non-uniform (ragged
multi-bucket) epochs fall back to one dispatch per minibatch.

Device-resident minibatching (single-process ragged layout with a
fixed geometry): the corpus's ragged rows are uploaded ONCE and each
epoch ships only [n_batches, capacity] row-index arrays — the scan
body gathers its minibatch buckets on device.  This replaces the
per-epoch host repack + full-corpus re-upload with ~100 KB of indices
(bitwise-identical results; tests/test_svi.py pins it).  Disk-backed
StreamingCorpus input qualifies too (rows materialise once at init via
the row sidecar).  Auto-disabled over ``svi_device_rows_budget_mb``
(the larger-than-HBM streaming regime) and for process-local corpora.
"""

from __future__ import annotations

from typing import List, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from pylda_tpu.corpus.corpus import Corpus, DenseBatch
from pylda_tpu.models import layouts
from pylda_tpu.models.base import LDAState
from pylda_tpu.models.vb import VariationalBayes, _elog_lambda_sum
from pylda_tpu.ops.dirichlet import beta_elbo
from pylda_tpu.ops.hyper import newton_dirichlet_mle
from pylda_tpu.utils import round_up


class StochasticVariationalBayes(VariationalBayes):
    """SVI: minibatch natural-gradient ascent on lambda."""

    SUPPORTS_PROCESS_LOCAL = True

    def _prepare(self, corpus: Corpus) -> None:
        self._gamma_np = None
        self._gammas_dev = None
        self._gamma_doc_ids = None
        # VB's corpus-pass plan stays off (the full-corpus chunks are
        # the wrong unit for minibatches); ragged minibatches get their
        # own scatter-free sufficient statistics via _plan_mb_dense_sstats.
        self._sstats_plan = None
        self._mb_sstats = self._plan_mb_dense_sstats(corpus)
        # Fixed bucket geometry for ragged minibatches: random subsets
        # natively produce different bucket shape sets, and every new
        # shape set recompiles (~40 s/shape at K=1000, V=100k through
        # this TPU tunnel — 166 s/epoch measured).  A capacity plan from
        # corpus statistics makes every minibatch emit IDENTICAL shapes,
        # so the whole epoch fuses into one lax.scan compiled once ever.
        self._svi_geometry = None
        proc_local = (
            getattr(corpus, "process_local", False)
            and jax.process_count() > 1
        )
        ragged = corpus.num_types > self._config.dense_vocab_threshold
        if ragged and not proc_local:
            plan_fn = getattr(corpus, "ragged_row_histogram", None)
            if plan_fn is not None:
                self._svi_geometry = layouts.plan_svi_ragged_geometry(
                    corpus, self._config, self._config.batch_size
                )
        self._t = getattr(self, "_t", 0)  # global minibatch counter
        self._jit_minibatch = jax.jit(self._minibatch_step)
        self._jit_beta = jax.jit(beta_elbo)
        self._jit_epoch_scan = jax.jit(self._epoch_scan)
        self._device_rows = None
        if not proc_local:
            if self._svi_geometry is not None:
                self._device_rows = self._build_device_rows(corpus)
            elif not ragged:
                self._device_rows = self._build_device_dense(corpus)
        if self._device_rows is not None:
            self._jit_epoch_gather = jax.jit(self._epoch_scan_gather)
            self._jit_epochs_gather = jax.jit(
                self._epochs_scan_gather,
                static_argnames=("n", "hyper_interval"),
            )
        self._jit_epochs_stacked = jax.jit(
            self._epochs_scan_stacked,
            static_argnames=("n", "hyper_interval"),
        )
        if proc_local:
            if self._mesh is None:
                raise ValueError(
                    "a process-sharded corpus requires a mesh (--mesh); "
                    "each host holds only its doc block, so training "
                    "without the global sharding would silently diverge"
                )
            if ragged:
                # BASELINE config 5: every host streams only its own doc
                # block at V > dense threshold.  The fused epoch scan
                # needs identical bucket shapes on every host — negotiate
                # one fixed capacity geometry across hosts.
                from pylda_tpu.parallel.mesh import (
                    negotiate_svi_ragged_geometry,
                )

                P = jax.process_count()
                b_local = -(-self._config.batch_size // P)
                self._svi_geometry = negotiate_svi_ragged_geometry(
                    corpus, self._config, b_local
                )
                if self._svi_geometry is None:
                    raise NotImplementedError(
                        "process-sharded ragged SVI requires per-doc "
                        "unique counts on the corpus (Corpus or "
                        "StreamingCorpus) to negotiate a fixed bucket "
                        "geometry across hosts"
                    )

    # -- per-minibatch scatter-free sufficient statistics ---------------------------

    def _plan_mb_dense_sstats(self, corpus: Corpus):
        """Scatter-free sufficient statistics for RAGGED minibatches.

        Round-4 profiling (scripts/profile_svi.py — per-op device trace
        at the config-5 shape, K=1000 V=100k batch 2048): ~40% of the
        fused epoch went to per-chunk segment-sum scatters, each
        materialising a [V, K] partial (~33 ms + partial-sum adds +
        zero-broadcasts per minibatch), while the gamma sweeps were
        ~5%.  This plan replaces the scatter with the same matmul form
        batch VB ships (``ops/estep.estep_dense_sstats``): the corpus's
        dense counts live on device ONCE as a [D+1, V_pad] array
        (sentinel zero row at D; bf16 when exact), each minibatch
        gathers its documents' rows by index and contracts them against
        the minibatch's per-document expEtheta — two MXU matmuls whose
        FLOPs scale with |B|·V·K, not with scatter row count.

        Gates mirror ``VariationalBayes._plan_dense_sstats``: ragged
        layout only (dense layouts are already matmul-form),
        ``sstats_mode="auto"``, single-process (each host would need the
        global matrix), docs in RAM, total dense bytes within
        ``sstats_dense_total_budget_mb``.  Returns None (keep the
        in-bucket scatter) or a dict with ``rows`` (a TUPLE of
        [D+1, w_j] device arrays — the dense matrix pre-split into
        ~50 KB-row vocab chunks, see the inline note), ``nonempty``
        ([D+1] f32), ``num_docs``, ``b_cap`` (the static per-minibatch
        doc-index length) and ``chunk_sizes`` (b_cap split so each
        [chunk, V_pad] phinorm fits ``sstats_dense_budget_mb``)."""
        cfg = self._config
        if cfg.sstats_mode == "scatter":
            return None
        if corpus.num_types <= cfg.dense_vocab_threshold:
            return None
        if (
            getattr(corpus, "process_local", False)
            and jax.process_count() > 1
        ):
            return None
        D, V = corpus.num_docs, corpus.num_types
        if D == 0 or cfg.batch_size <= 0:
            return None
        v_pad = round_up(V, 1024)
        budget = cfg.sstats_dense_total_budget_mb * 1e6
        if (D + 1) * v_pad * 2 > budget:  # even bf16 storage exceeds it
            return None
        # Disk-backed (StreamingCorpus) rows qualify: to_dense reads the
        # row sidecar/parse blockwise, and the budget gate above already
        # bounds the materialisation.  Non-empty flags come from the row
        # sums (corpus.docs is absent on the streaming path).
        #
        # Pass 1 scans only the max count + non-empty flags so the
        # storage dtype (and its budget check) are known BEFORE any big
        # allocation — the old flow staged the full [D+1, v_pad] in f32
        # first, transiently doubling the bf16 case's RAM and building
        # ~2x the budget just to discard it when only f32 was feasible
        # (round-4 advisor finding).  For in-RAM corpora this reads the
        # cached per-doc unique counts in O(tokens) with no
        # densification; the blockwise to_dense fallback covers
        # disk-backed streaming input (one extra sidecar pass at init).
        nonempty_np = np.zeros((D + 1,), np.float32)
        step = max(1, int(64e6 // max(1, 4 * V)))
        maxc = 0.0
        if getattr(corpus, "docs", None) is not None and hasattr(
            corpus, "doc_unique"
        ):
            for d in range(D):
                _ids, cts = corpus.doc_unique(d)
                if cts.size:
                    nonempty_np[d] = 1.0
                    m = float(cts.max())
                    if m > maxc:
                        maxc = m
        else:
            for start in range(0, D, step):
                stop = min(D, start + step)
                c = np.asarray(
                    corpus.to_dense(doc_indices=range(start, stop)).counts
                )
                nonempty_np[start:stop] = (
                    c.sum(axis=1) > 0
                ).astype(np.float32)
                maxc = max(maxc, float(c.max(initial=0.0)))
        # bfloat16 is exact for integer counts <= 256 (same argument and
        # gate as the batch-VB chunks); larger counts keep float32.
        dtype = jnp.bfloat16 if maxc <= 256.0 else jnp.float32
        itemsize = np.dtype(dtype).itemsize
        if (D + 1) * v_pad * itemsize > budget:
            return None
        # Store the matrix pre-split into vocab chunks of ~50 KB rows.
        # The round-5 per-op trace of the config-5 epoch showed XLA
        # lowering the per-minibatch row gather over the single
        # [D+1, 100352] array as a SPLIT of the whole corpus into
        # 25088-wide pieces (a 1.6 GB relayout, 5.1 ms) before gathering
        # each piece; pre-splitting at plan time feeds the same gathers
        # without the per-minibatch full-corpus repack.  Pass 2 fills
        # each chunk directly in the TARGET dtype (via ml_dtypes for
        # numpy bf16); peak host RAM = the chunks + one parse block.
        n_vchunks = max(1, -(-(v_pad * itemsize) // (50 * 1024)))
        w = round_up(-(-v_pad // n_vchunks), 1024)
        np_dtype = np.dtype(dtype)  # ml_dtypes-backed for bf16
        chunks_np = [
            np.zeros((D + 1, min(w, v_pad - j0)), np_dtype)
            for j0 in range(0, v_pad, w)
        ]
        for start in range(0, D, step):
            stop = min(D, start + step)
            c = np.asarray(
                corpus.to_dense(doc_indices=range(start, stop)).counts
            )
            for i, j0 in enumerate(range(0, v_pad, w)):
                j1 = min(j0 + chunks_np[i].shape[1], V)
                if j0 < V:
                    chunks_np[i][start:stop, : j1 - j0] = c[:, j0:j1]
        vchunks = [jnp.asarray(a) for a in chunks_np]
        del chunks_np
        nonempty = jnp.asarray(nonempty_np)
        if self._mesh is not None:
            from jax.sharding import NamedSharding, PartitionSpec as P

            rep = NamedSharding(self._mesh, P())
            vchunks = [jax.device_put(a, rep) for a in vchunks]
            nonempty = jax.device_put(nonempty, rep)
        arr = tuple(vchunks)
        b_cap = round_up(cfg.batch_size, cfg.doc_pad_multiple)
        rows_budget = max(
            cfg.doc_pad_multiple,
            int(cfg.sstats_dense_budget_mb * 1e6 // (4 * v_pad)),
        )
        chunk_sizes = layouts._split_rows(
            b_cap, rows_budget, cfg.doc_pad_multiple
        )
        return {
            "rows": arr,
            "nonempty": nonempty,
            "num_docs": D,
            "b_cap": b_cap,
            "chunk_sizes": chunk_sizes,
        }

    def _doc_sel_arrays(self, index_lists):
        """[B_cap] global doc-index array per minibatch (-1 pads), the
        scan-shippable handle the dense-sstats gather keys on; None when
        the plan is off."""
        if self._mb_sstats is None:
            return None
        bc = self._mb_sstats["b_cap"]
        out = []
        for sel in index_lists:
            ds = np.full((bc,), -1, np.int32)
            ds[: len(sel)] = np.asarray(sel, np.int32)
            out.append(ds)
        return out

    def _mb_rows_args(self, docsels):
        """The plan's device arrays, shipped as JIT ARGUMENTS next to a
        non-None docsels.  Closing over them instead bakes the [D+1,
        V_pad] matrix into the HLO as a literal constant — measured
        fatal on the tunneled backend (remote compile HTTP 413: the
        config-4 request body carries the 1.6 GB constant); argument
        buffers are passed by device handle at run time."""
        if docsels is None or self._mb_sstats is None:
            return None
        return (self._mb_sstats["rows"], self._mb_sstats["nonempty"])

    # -- one minibatch update (traced) ---------------------------------------------

    def _minibatch_step(
        self, lam, alpha, eta, key, batches, rho, scale, doc_sel=None,
        mb_rows=None,
    ):
        """Local E-step + natural-gradient lambda step + the doc-side
        bound terms of Hoffman's estimator (scaled by D/|B|).  The
        topic-side term (``beta_elbo``) is added ONCE per epoch at the
        epoch's final lambda by the callers — at K=1000, V=100k it is a
        ~8 ms [K,V] lgamma reduction, and paying it per minibatch bought
        nothing (the estimate is stochastic either way).

        ``doc_sel`` ([b_cap] global doc indices, -1 pads) activates the
        scatter-free sufficient statistics (``_plan_mb_dense_sstats``):
        the converged per-row gammas assemble into per-DOCUMENT gammas,
        and sstats/token score come from gathered dense count rows via
        ``estep_dense_sstats`` — numerically the same reduction as the
        row scatter up to float summation order.  ``mb_rows`` is the
        plan's (row vocab-chunk tuple, nonempty) pair, shipped as jit
        arguments — see
        ``_mb_rows_args`` for why they must not be closed over."""
        plan = self._mb_sstats
        if plan is not None and doc_sel is not None and mb_rows is not None:
            rows_vchunks, nonempty = mb_rows
            D = plan["num_docs"]
            b_cap = doc_sel.shape[0]
            safe = jnp.where(doc_sel >= 0, doc_sel, D)
            # Everything downstream runs in MINIBATCH-LOCAL doc
            # positions (0..b_cap): the round-5 config-4 trace showed
            # the gamma assembly + theta/elog reductions running at the
            # full corpus [D, K] per minibatch (~13% of the epoch for a
            # 1/16th-corpus batch).  ``inv`` maps global doc id ->
            # position in doc_sel (absent docs -> b_cap = overflow).
            # Padding slots all target index D: write the b_cap overflow
            # sentinel there (a position value would silently alias an
            # absent doc onto a pad slot's gamma row).
            inv = (
                jnp.full((D + 1,), b_cap, jnp.int32)
                .at[safe]
                .set(
                    jnp.where(
                        doc_sel >= 0,
                        jnp.arange(b_cap, dtype=jnp.int32),
                        b_cap,
                    )
                )
            )
            chunks = []
            s0 = 0
            for c in plan["chunk_sizes"]:
                ds = doc_sel[s0 : s0 + c]
                gidx = jnp.where(ds >= 0, ds, D)  # sentinel zero row
                # Gather per vocab chunk (the plan stores the matrix
                # pre-split — see _plan_mb_dense_sstats) and reassemble
                # the minibatch-rows block; the concat moves only the
                # gathered rows, not the corpus.
                gathered = [rc[gidx] for rc in rows_vchunks]
                chunks.append(
                    DenseBatch(
                        counts=(
                            gathered[0] if len(gathered) == 1
                            else jnp.concatenate(gathered, axis=1)
                        ),
                        mask=(ds >= 0).astype(lam.dtype),
                        # Chunk rows ARE sel positions s0..s0+c.
                        doc_ids=jnp.where(
                            ds >= 0,
                            jnp.arange(s0, s0 + c, dtype=jnp.int32),
                            -1,
                        ),
                    )
                )
                s0 += c
            # Selected docs only — and, like the batch-VB plan, empty
            # documents stay outside the theta/elog sums (the row paths
            # never emit rows for them).
            docs_mask = (doc_sel >= 0).astype(lam.dtype) * nonempty[safe]
            gammas, sstats, token_score, theta_score, elog_sum = (
                self._run_estep(
                    batches, lam, alpha, key,
                    dense_chunks=chunks, docs_mask=docs_mask,
                    num_docs=b_cap, doc_id_map=inv,
                )
            )
            # gammas[0] is already [b_cap, K] in doc_sel order; padding
            # rows carry doc id -1 downstream.
        else:
            gammas, sstats, token_score, theta_score, elog_sum = (
                self._run_estep(batches, lam, alpha, key)
            )
        lam_new = (1.0 - rho) * lam + rho * (eta[None, :] + scale * sstats)
        est = scale * (token_score + theta_score)
        return lam_new, est, elog_sum, gammas

    def _epoch_scan(
        self, lam, alpha, eta, key, stacked, docsels, rhos, scales,
        mb_rows=None,
    ):
        """Whole epoch in one lax.scan over stacked same-shape minibatches.
        The epoch's bound estimates get the topic-side ``beta_elbo`` term
        once, at the final lambda (see ``_minibatch_step``)."""

        def body(carry, xs):
            lam = carry
            batches, ds, rho, scale, i = xs
            sub = jax.random.fold_in(key, i)
            lam_new, est, elog_sum, gammas = self._minibatch_step(
                lam, alpha, eta, sub, batches, rho, scale, doc_sel=ds,
                mb_rows=mb_rows,
            )
            return lam_new, (est, elog_sum, gammas)

        n = rhos.shape[0]
        lam_final, (ests, elog_sums, gammas) = jax.lax.scan(
            body, lam, (stacked, docsels, rhos, scales, jnp.arange(n))
        )
        ests = ests + beta_elbo(lam_final, eta)
        return lam_final, ests, elog_sums.sum(axis=0), gammas

    # -- device-resident minibatching (single-process ragged layout) ---------------

    def _build_device_rows(self, corpus: Corpus):
        """Put the corpus's ragged rows on device ONCE so epochs ship
        only row indices (config.svi_device_rows_budget_mb rationale).

        Returns (rows_arrays, meta) or None when inapplicable:
        ``rows_arrays[j]`` = {ids [R+1, w], cnts, doc_ids [R+1]} for the
        j-th geometry width with an inert sentinel row at index R;
        ``meta[j]`` = (width, capacity, sentinel, doc_of_row [R],
        csr_start [D+1], csr_rows [R]) — the host-side doc->rows map in
        CSR form, for vectorised per-minibatch index assembly."""
        cfg = self._config
        caps = self._svi_geometry
        sizes = sorted(caps)
        hist = corpus.ragged_row_histogram(sizes)
        total_mb = sum(hist[s] * s for s in sizes) * 8 / 1e6
        if total_mb > cfg.svi_device_rows_budget_mb:
            return None  # the corpora-larger-than-HBM streaming regime
        # Disk-backed (StreamingCorpus) rows qualify too: the budget
        # check above ran on the histogram alone, and materialising
        # under-budget rows once at init (via the memmapped row sidecar
        # when present) beats re-packing + re-uploading them every epoch
        # — round-4 verdict item 5 measured the host path ~3x off the
        # device-rows bound at the wiki shape.
        buckets = {
            b.ids.shape[1]: b
            for b in corpus.to_ragged_buckets(
                bucket_sizes=tuple(sizes), doc_pad_multiple=1
            )
        }
        D = corpus.num_docs
        K = cfg.number_of_topics
        pad = cfg.doc_pad_multiple
        rows_arrays, meta = [], []
        for s in sizes:
            b = buckets.get(s)
            if b is None:
                ids = np.zeros((1, s), np.int32)
                cnts = np.zeros((1, s), np.float32)
                dids = np.full((1,), -1, np.int32)
                doc_of_row = np.zeros((0,), np.int32)
            else:
                ids = np.concatenate([b.ids, np.zeros((1, s), np.int32)])
                cnts = np.concatenate(
                    [b.cnts, np.zeros((1, s), np.float32)]
                )
                dids = np.concatenate(
                    [b.doc_ids, np.full((1,), -1, np.int32)]
                )
                doc_of_row = np.asarray(b.doc_ids, np.int64)
            # CSR doc->rows (rows are doc-major, so stable sort keeps a
            # chunked doc's row order).
            order = np.argsort(doc_of_row, kind="stable")
            counts = np.bincount(doc_of_row, minlength=D)
            start = np.zeros((D + 1,), np.int64)
            np.cumsum(counts, out=start[1:])
            arrs = {
                "ids": jnp.asarray(ids),
                "cnts": jnp.asarray(cnts),
                "doc_ids": jnp.asarray(dids),
            }
            if self._mesh is not None:
                from jax.sharding import NamedSharding, PartitionSpec as P

                rep = NamedSharding(self._mesh, P())
                arrs = {
                    k: jax.device_put(v, rep) for k, v in arrs.items()
                }
            # Memory-budget row chunking, EXACTLY mirroring the host
            # path's build_vb_batches split: identical per-chunk shapes
            # keep the RNG stream (fold_in per bucket position), the
            # per-chunk convergence granularity, and the [rows, T, K]
            # memory bound bit-for-bit equivalent to the host repack.
            budget_rows = max(
                pad,
                int(cfg.estep_memory_budget_mb * 1e6 / (4 * s * K * 3)),
            )
            chunk_sizes = layouts._split_rows(int(caps[s]), budget_rows, pad)
            meta.append(
                dict(
                    width=s, cap=int(caps[s]),
                    sentinel=ids.shape[0] - 1,
                    doc_of_row=doc_of_row.astype(np.int32),
                    csr_start=start,
                    csr_rows=order.astype(np.int32),
                    chunk_sizes=chunk_sizes,
                )
            )
            rows_arrays.extend([arrs] * len(chunk_sizes))
        return rows_arrays, meta

    def _build_device_dense(self, corpus: Corpus):
        """Dense-layout analog of ``_build_device_rows``: the [D+1, V]
        doc-term matrix (inert sentinel row at D) lives on device once;
        epochs gather [batch, V] minibatches by row index.  Same
        (rows_arrays, meta) contract — the identity CSR makes the shared
        index-assembly and gather-scan code paths handle it verbatim."""
        cfg = self._config
        D, V = corpus.num_docs, corpus.num_types
        if (D + 1) * V * 4 / 1e6 > cfg.svi_device_rows_budget_mb:
            return None
        if D == 0 or cfg.batch_size <= 0:
            return None
        b = corpus.to_dense()
        counts = np.concatenate(
            [b.counts, np.zeros((1, V), np.float32)]
        )
        dids = np.concatenate(
            [np.asarray(b.doc_ids, np.int32), np.full((1,), -1, np.int32)]
        )
        arrs = {"counts": jnp.asarray(counts), "doc_ids": jnp.asarray(dids)}
        if self._mesh is not None:
            from jax.sharding import NamedSharding, PartitionSpec as P

            rep = NamedSharding(self._mesh, P())
            arrs = {k: jax.device_put(v, rep) for k, v in arrs.items()}
        cap = round_up(cfg.batch_size, cfg.doc_pad_multiple)
        meta = [
            dict(
                width=V, cap=cap, sentinel=D,
                doc_of_row=np.arange(D, dtype=np.int32),
                csr_start=np.arange(D + 1, dtype=np.int64),
                csr_rows=np.arange(D, dtype=np.int32),
                chunk_sizes=[cap],
            )
        ]
        return [arrs], meta

    def _epoch_index_stacks(self, epoch_seed: int):
        """Host-side index assembly for one device-gathered epoch:
        (idx_stacks [n, cap_j] per width, docsels [n, b_cap] or None,
        doc_ids_lists, rhos, scales), or None when a minibatch overflows
        a capacity (fall back to the host repack path, which promotes
        rows upward)."""
        cfg = self._config
        corpus = self._corpus
        D = corpus.num_docs
        _rows_arrays, meta = self._device_rows
        index_lists = corpus.minibatch_indices(cfg.batch_size, seed=epoch_seed)
        n = len(index_lists)
        idx_stacks = [
            np.full((n, c), m["sentinel"], np.int32)
            for m in meta
            for c in m["chunk_sizes"]
        ]
        docsel_list = self._doc_sel_arrays(index_lists)
        docsels = None if docsel_list is None else np.stack(docsel_list)
        doc_ids_lists = []
        rhos, scales = [], []
        for i, sel in enumerate(index_lists):
            per_batch = []
            stack_j = 0
            for m in meta:
                st, rows = m["csr_start"], m["csr_rows"]
                ln = (st[sel + 1] - st[sel]).astype(np.int64)
                tot = int(ln.sum())
                if tot > m["cap"]:
                    return None  # ~3e-5/bucket/batch; host path promotes
                full = np.full((m["cap"],), m["sentinel"], np.int32)
                gids = np.full((m["cap"],), -1, np.int32)
                if tot:
                    base = np.repeat(st[sel], ln)
                    offs = np.arange(tot) - np.repeat(
                        np.cumsum(ln) - ln, ln
                    )
                    r = rows[base + offs]
                    full[:tot] = r
                    gids[:tot] = m["doc_of_row"][r]
                # Slice the capacity row block into the SAME chunk
                # layout the host repack emits (RNG-stream parity).
                s0 = 0
                for c in m["chunk_sizes"]:
                    idx_stacks[stack_j][i] = full[s0 : s0 + c]
                    per_batch.append(gids[s0 : s0 + c])
                    s0 += c
                    stack_j += 1
            # On the dense-sstats path the step returns one gamma block
            # per minibatch, keyed by the doc-selection array.
            doc_ids_lists.append(
                per_batch if docsels is None else [docsels[i]]
            )
            scales.append(D / max(1, len(sel)))
            rhos.append((cfg.tau0 + self._t + i) ** (-cfg.kappa))
        return idx_stacks, docsels, doc_ids_lists, rhos, scales

    def _gathered_buckets(self, rows_arrays, idxs, dtype):
        """Minibatch buckets gathered from the device-resident corpus
        rows (sentinel rows are inert: zero counts, doc id -1 ->
        mask 0)."""
        from pylda_tpu.corpus.corpus import RaggedBucket

        bl = []
        for arrs, idx in zip(rows_arrays, idxs):
            dids = arrs["doc_ids"][idx]
            mask = (dids >= 0).astype(dtype)
            if "counts" in arrs:  # dense layout
                bl.append(
                    DenseBatch(
                        counts=arrs["counts"][idx], mask=mask, doc_ids=dids
                    )
                )
            else:
                bl.append(
                    RaggedBucket(
                        ids=arrs["ids"][idx], cnts=arrs["cnts"][idx],
                        mask=mask, doc_ids=dids,
                    )
                )
        return bl

    def _epoch_scan_gather(
        self, lam, alpha, eta, key, rows_arrays, idx_stacks, docsels,
        rhos, scales, mb_rows=None,
    ):
        """Whole epoch in one lax.scan over gathered minibatches."""

        def body(carry, xs):
            lam = carry
            idxs, ds, rho, scale, i = xs
            bl = self._gathered_buckets(rows_arrays, idxs, lam.dtype)
            sub = jax.random.fold_in(key, i)
            lam_new, est, elog_sum, gammas = self._minibatch_step(
                lam, alpha, eta, sub, bl, rho, scale, doc_sel=ds,
                mb_rows=mb_rows,
            )
            return lam_new, (est, elog_sum, gammas)

        n = rhos.shape[0]
        lam_final, (ests, elog_sums, gammas) = jax.lax.scan(
            body, lam,
            (tuple(idx_stacks), docsels, rhos, scales, jnp.arange(n)),
        )
        ests = ests + beta_elbo(lam_final, eta)
        return lam_final, ests, elog_sums.sum(axis=0), gammas

    def _epochs_scan_core(
        self, state, batch_src3, docsels3, rhos2, scales2,
        n: int, hyper_interval: int, make_batches, mb_rows=None,
    ):
        """n FULL epochs in one dispatch: outer scan over epochs
        (carrying lam/alpha/eta/key — the key chain splits exactly like
        sequential ``learning()`` calls, so results are bitwise
        identical), inner scan over that epoch's minibatches, scheduled
        Newton hyper updates at epoch boundaries.  ``batch_src3`` is a
        pytree with leading [n, n_batches] axes; ``make_batches``
        resolves one scanned element into minibatch layout chunks (the
        device-rows path gathers from resident rows; the stacked path
        passes the chunks through).  Per-document gammas are NOT
        accumulated (n·corpus of them would sit in HBM for nothing) —
        ``.gamma`` lazily recomputes at the final state."""
        from pylda_tpu.models.base import LDAState

        docs_seen = jnp.asarray(float(self._corpus.global_num_docs))

        def epoch_body(carry, xs):
            lam, alpha, eta, step = carry
            src_e, ds_e, rhos_e, scales_e, key = xs

            def batch_body(lam, bxs):
                src, ds, rho, scale, i = bxs
                bl = make_batches(src, lam.dtype)
                sub = jax.random.fold_in(key, i)
                lam_new, est, elog_sum, _gammas = self._minibatch_step(
                    lam, alpha, eta, sub, bl, rho, scale, doc_sel=ds,
                    mb_rows=mb_rows,
                )
                return lam_new, (est, elog_sum)

            nb = rhos_e.shape[0]
            lam, (ests, elog_sums) = jax.lax.scan(
                batch_body, lam,
                (src_e, ds_e, rhos_e, scales_e, jnp.arange(nb)),
            )
            # Topic-side bound term once per epoch, BEFORE the hyper
            # update (the same order sequential learning() uses).
            ests = ests + beta_elbo(lam, eta)
            elog_sum = elog_sums.sum(axis=0)
            step = step + 1
            if hyper_interval > 0:
                do_up = step % hyper_interval == 0
                alpha = jax.lax.cond(
                    do_up,
                    lambda a: newton_dirichlet_mle(a, elog_sum, docs_seen),
                    lambda a: a,
                    alpha,
                )
                eta = jax.lax.cond(
                    do_up,
                    lambda e: newton_dirichlet_mle(
                        e, _elog_lambda_sum(lam),
                        jnp.asarray(self._config.number_of_topics),
                    ),
                    lambda e: e,
                    eta,
                )
            return (lam, alpha, eta, step), ests

        # The key chain: epoch e uses sub_e where (key, sub) = split —
        # precompute the n subs (mirrors sequential learning() exactly).
        subs = []
        k = state.key
        for _ in range(n):
            k, s = jax.random.split(k)
            subs.append(s)
        (lam, alpha, eta, _step), ests2 = jax.lax.scan(
            epoch_body,
            (state.lam, state.alpha, state.eta, state.step),
            (batch_src3, docsels3, rhos2, scales2, jnp.stack(subs)),
        )
        new_state = LDAState(
            lam=lam, alpha=alpha, eta=eta, step=state.step + n, key=k
        )
        return new_state, ests2

    def _epochs_scan_gather(
        self, state, rows_arrays, idx3, docsels3, rhos2, scales2,
        n: int, hyper_interval: int, mb_rows=None,
    ):
        """Device-rows variant: minibatches gather from resident rows."""
        return self._epochs_scan_core(
            state, tuple(idx3), docsels3, rhos2, scales2, n,
            hyper_interval,
            lambda idxs, dtype: self._gathered_buckets(
                rows_arrays, idxs, dtype
            ),
            mb_rows=mb_rows,
        )

    def _epochs_scan_stacked(
        self, state, stacked3, docsels3, rhos2, scales2,
        n: int, hyper_interval: int,
    ):
        """Host-stacked variant (process-local / fixed-geometry
        repack): minibatch chunks arrive pre-stacked with [n, n_batches]
        leading axes (round-3 verdict item 5 — the proc-local epochs
        were one collective dispatch EACH, leaving the known ~18%
        fusion win and the per-epoch collective-dispatch latency on the
        table)."""
        return self._epochs_scan_core(
            state, stacked3, docsels3, rhos2, scales2, n, hyper_interval,
            lambda bl, dtype: bl,
        )

    # -- host-side epoch batch construction ----------------------------------------

    def _epoch_batches(self, epoch_seed: int):
        """One epoch of HOST-side minibatch layouts.

        Returns (batch_lists, doc_ids_lists, rhos, scales,
        process_local, docsels) where ``batch_lists[i]`` is the i-th
        minibatch as a list of layout chunks (this process's rows only
        when process_local), ``doc_ids_lists[i]`` maps the i-th
        minibatch's GLOBAL rows to global document indices (for gamma
        assembly), and ``docsels`` is the per-minibatch doc-selection
        list for the dense-sstats path (None when that plan is off)."""
        cfg = self._config
        corpus = self._corpus
        if (
            getattr(corpus, "process_local", False)
            and jax.process_count() > 1
        ):
            return self._process_local_epoch(epoch_seed)
        D = corpus.num_docs
        index_lists = corpus.minibatch_indices(cfg.batch_size, seed=epoch_seed)
        batch_lists: List[List[layouts.VBBatch]] = []
        scales: List[float] = []
        rhos: List[float] = []
        for idx in index_lists:
            # Dense minibatches share one [batch, V] shape, so dense
            # epochs collapse into a single lax.scan dispatch; ragged
            # minibatches keep per-batch bucketing — a uniform fixed-T
            # layout was measured SLOWER (padding waste beats dispatch
            # savings ~3:1 at wiki-shaped length distributions).
            bl = (
                layouts.build_vb_batches(
                    corpus, cfg, doc_indices=idx, pad_docs_to=cfg.batch_size
                )
                if corpus.num_types <= cfg.dense_vocab_threshold
                else self._ragged_minibatch(corpus, cfg, idx)
            )
            batch_lists.append(bl)
            scales.append(D / max(1, len(idx)))
            rhos.append((cfg.tau0 + self._t) ** (-cfg.kappa))
            self._t += 1
        docsels = self._doc_sel_arrays(index_lists)
        doc_ids_lists = (
            [[ds] for ds in docsels]
            if docsels is not None
            else [[b.doc_ids for b in bl] for bl in batch_lists]
        )
        return batch_lists, doc_ids_lists, rhos, scales, False, docsels

    def _ragged_minibatch(self, corpus, cfg, idx):
        """Ragged minibatch layout: the fixed capacity geometry when one
        is planned (shape-stable epochs; one compile ever), per-batch
        shapes as the rare-overflow / no-plan fallback."""
        if self._svi_geometry is not None:
            from pylda_tpu.corpus.corpus import GeometryOverflow

            try:
                return layouts.build_vb_batches(
                    corpus, cfg, doc_indices=idx,
                    bucket_capacities=self._svi_geometry,
                )
            except GeometryOverflow:
                pass  # ~3e-5/bucket/batch: this batch recompiles, alone
        return layouts.build_vb_batches(corpus, cfg, doc_indices=idx)

    def _process_local_epoch(self, epoch_seed: int):
        """Minibatches over a process-local corpus: every host
        contributes ``b_local`` documents per global minibatch from its
        own contiguous block (BASELINE config 5 —
        "Doc-sharded SVI ... multi-host pod slice").

        Per-host permutations use deterministic seeds (epoch_seed, p),
        so every host can reconstruct every other host's document order
        WITHOUT communication — that is what makes the global per-batch
        document counts (hence the D/|B_t| scale and the rho_t schedule)
        agree across hosts.

        Dense layout: one [b_local, V] block per host, lifted to a
        global [P*b_local, V] batch.  Ragged layout (V > threshold —
        the literal config-5 shape): each host packs its documents into
        the NEGOTIATED fixed capacity geometry (``_prepare``), so every
        host emits identical bucket shapes and the epoch fuses into one
        sharded lax.scan; the row->doc map is read back from the lifted
        device doc_ids (host p cannot reconstruct host q's bucket
        packing without q's unique counts)."""
        cfg = self._config
        corpus = self._corpus
        P = jax.process_count()
        my = jax.process_index()
        total = corpus.global_num_docs
        per = -(-total // P)  # the loader's ceil block size
        S = self._mesh.shape["data"]
        if S % P:
            raise ValueError(
                f"data axis ({S}) must be a multiple of process count ({P})"
            )
        dense = corpus.num_types <= cfg.dense_vocab_threshold
        if dense:
            rows_per_proc = S // P
            b_local = round_up(-(-cfg.batch_size // P), rows_per_proc)
        else:
            # Ragged: b_local counts selected DOCUMENTS; device-row
            # alignment lives in the negotiated bucket capacities (each
            # a doc_pad_multiple round-up, and doc_pad_multiple is
            # validated divisible by the data-axis size at initialize).
            b_local = -(-cfg.batch_size // P)
        n_batches = -(-per // b_local)
        local_counts = [
            max(0, min(per, total - p * per)) for p in range(P)
        ]
        perms = {
            p: np.random.default_rng((epoch_seed, p)).permutation(
                local_counts[p]
            )
            for p in range(P)
        }
        batch_lists: List[List[layouts.VBBatch]] = []
        doc_ids_lists: List[Optional[List[np.ndarray]]] = []
        rhos: List[float] = []
        scales: List[float] = []
        for i in range(n_batches):
            sel = perms[my][i * b_local : (i + 1) * b_local]
            if dense:
                b = corpus.to_dense(doc_indices=sel, pad_docs_to=b_local)
                doc_ids = np.where(
                    b.doc_ids >= 0, b.doc_ids + corpus.global_doc_offset, -1
                ).astype(np.int32)
                batch_lists.append(
                    [DenseBatch(counts=b.counts, mask=b.mask, doc_ids=doc_ids)]
                )
                # Global row->doc map: concatenation of every host's block.
                gids = np.full((P, b_local), -1, dtype=np.int32)
                for p in range(P):
                    selp = perms[p][i * b_local : (i + 1) * b_local]
                    gids[p, : len(selp)] = selp + p * per
                doc_ids_lists.append([gids.reshape(-1)])
            else:
                batch_lists.append(self._ragged_process_minibatch(sel))
                # Row->doc maps come from the lifted device arrays after
                # stacking (learning() fills these in).
                doc_ids_lists.append(None)
            docs_in = sum(
                min(b_local, max(0, c - i * b_local)) for c in local_counts
            )
            scales.append(total / max(1, docs_in))
            rhos.append((cfg.tau0 + self._t) ** (-cfg.kappa))
            self._t += 1
        # Dense-sstats plan is gated off for process-local corpora.
        return batch_lists, doc_ids_lists, rhos, scales, True, None

    def _ragged_process_minibatch(self, sel) -> List[layouts.VBBatch]:
        """This host's slice of one global ragged minibatch, packed into
        the negotiated fixed geometry with GLOBAL doc ids."""
        from pylda_tpu.corpus.corpus import GeometryOverflow

        cfg = self._config
        corpus = self._corpus
        caps = self._svi_geometry
        try:
            buckets = corpus.to_ragged_buckets(
                bucket_sizes=sorted(caps),
                doc_pad_multiple=cfg.doc_pad_multiple,
                doc_indices=sel,
                bucket_capacities=caps,
            )
        except GeometryOverflow as e:
            # Unlike the single-process path there is NO per-batch shape
            # fallback: one host recompiling alone would deadlock the
            # collective epoch scan.  +4-sigma capacities put one batch's
            # overflow probability at ~3e-5 per bucket; reaching this
            # means the corpus block is far from the negotiated
            # statistics (e.g. the corpus changed under a resumed run).
            raise RuntimeError(
                "process-sharded SVI minibatch overflowed the negotiated "
                "bucket geometry; re-initialize so the geometry is "
                f"renegotiated ({e})"
            ) from e
        off = corpus.global_doc_offset
        return [
            type(b)(
                ids=b.ids, cnts=b.cnts, mask=b.mask,
                doc_ids=np.where(b.doc_ids >= 0, b.doc_ids + off, -1).astype(
                    np.int32
                ),
            )
            for b in buckets
        ]

    # -- one epoch -------------------------------------------------------------------

    def learning(self, _prepared=None) -> float:
        """One epoch of minibatch updates; returns the mean per-batch
        corpus-scaled ELBO estimate (a stochastic bound estimate, not the
        exact batch ELBO).  ``_prepared``: host-side epoch construction
        already done (the prefetch pipeline in ``learning_many``)."""
        st = self.state
        cfg = self._config
        key, sub = jax.random.split(st.key)
        epoch_seed = self._counter * 100003 + cfg.seed

        stacks = (
            self._epoch_index_stacks(epoch_seed)
            if self._device_rows is not None and _prepared is None
            else None
        )
        if stacks is not None:
            # Device-resident minibatching: ship row indices only; the
            # fused scan gathers each minibatch's buckets on device.
            idx_stacks, docsels, doc_ids_lists, rhos, scales = stacks
            rows_arrays, _meta = self._device_rows
            idx_dev = [jnp.asarray(x) for x in idx_stacks]
            ds_dev = None if docsels is None else jnp.asarray(docsels)
            if self._mesh is not None:
                from jax.sharding import NamedSharding, PartitionSpec as P

                sh = NamedSharding(self._mesh, P(None, "data"))
                idx_dev = [jax.device_put(x, sh) for x in idx_dev]
                if ds_dev is not None:
                    ds_dev = jax.device_put(ds_dev, sh)
            lam, ests, elog_sum_epoch, gammas_stacked = (
                self._jit_epoch_gather(
                    st.lam, st.alpha, st.eta, sub, rows_arrays, idx_dev,
                    ds_dev,
                    jnp.asarray(rhos, self._dtype),
                    jnp.asarray(scales, self._dtype),
                    mb_rows=self._mb_rows_args(ds_dev),
                )
            )
            n = len(rhos)
            self._t += n
            ests = list(np.asarray(ests, dtype=np.float64))
            gammas = [
                g
                for i in range(n)
                for g in jax.tree.map(lambda x: x[i], gammas_stacked)
            ]
            return self._finish_epoch(
                st, key, lam, ests, elog_sum_epoch, gammas, doc_ids_lists
            )

        batch_lists, doc_ids_lists, rhos, scales, proc_local, docsels = (
            _prepared
            if _prepared is not None
            else self._epoch_batches(epoch_seed)
        )

        lam, alpha = st.lam, st.alpha
        structs = {
            str(jax.tree.structure(bl))
            + str([jax.tree.map(jnp.shape, b) for b in bl])
            for bl in batch_lists
        }
        fuse = len(structs) == 1 and (proc_local or len(batch_lists) > 1)
        # Process-local epochs MUST fuse: the fixed geometry (dense
        # shape / negotiated capacities) guarantees one shape set, and
        # every host has to dispatch the same collective program.
        assert fuse or not proc_local, "process-local epoch failed to fuse"
        if fuse:
            # Uniform layout: stack the epoch host-side, place/shard the
            # stacked arrays once, run ONE scan dispatch.
            stacked = jax.tree.map(
                lambda *xs: np.stack([np.asarray(x) for x in xs]),
                *batch_lists,
            )
            if self._mesh is None:
                stacked = [jax.device_put(b) for b in stacked]
            else:
                from pylda_tpu.parallel.mesh import shard_stacked_batch

                stacked = [
                    shard_stacked_batch(b, self._mesh, process_local=proc_local)
                    for b in stacked
                ]
            if any(dl is None for dl in doc_ids_lists):
                # Ragged process-local: the global row->doc maps are the
                # lifted doc_ids themselves (device slices; .gamma
                # host-gathers them lazily and collectively).
                doc_ids_lists = [
                    [b.doc_ids[i] for b in stacked]
                    for i in range(len(batch_lists))
                ]
            ds_stacked = (
                None if docsels is None else jnp.asarray(np.stack(docsels))
            )
            if ds_stacked is not None and self._mesh is not None:
                from jax.sharding import NamedSharding, PartitionSpec as P

                ds_stacked = jax.device_put(
                    ds_stacked, NamedSharding(self._mesh, P(None, "data"))
                )
            lam, ests, elog_sum_epoch, gammas_stacked = self._jit_epoch_scan(
                lam, alpha, st.eta, sub, stacked, ds_stacked,
                jnp.asarray(rhos, self._dtype),
                jnp.asarray(scales, self._dtype),
                mb_rows=self._mb_rows_args(ds_stacked),
            )
            ests = list(np.asarray(ests, dtype=np.float64))
            gammas = [
                g
                for i in range(len(batch_lists))
                for g in jax.tree.map(lambda x: x[i], gammas_stacked)
            ]
        else:
            batch_lists = [self._maybe_shard(bl) for bl in batch_lists]
            ests_dev = []
            elog_sum_epoch = jnp.zeros_like(alpha)
            gammas = []
            for bi, bl in enumerate(batch_lists):
                ds_i = None if docsels is None else jnp.asarray(docsels[bi])
                lam, est, elog_sum, gs = self._jit_minibatch(
                    lam, alpha, st.eta, jax.random.fold_in(sub, bi), bl,
                    jnp.asarray(rhos[bi], self._dtype),
                    jnp.asarray(scales[bi], self._dtype),
                    ds_i,
                    mb_rows=self._mb_rows_args(ds_i),
                )
                ests_dev.append(est)
                elog_sum_epoch = elog_sum_epoch + elog_sum
                gammas.extend(gs)
            # Topic-side bound term once, at the epoch's final lambda —
            # identical float ops to the fused scans' epilogue.
            ests_dev = jnp.stack(ests_dev) + self._jit_beta(lam, st.eta)
            ests = list(np.asarray(ests_dev, dtype=np.float64))

        return self._finish_epoch(
            st, key, lam, ests, elog_sum_epoch, gammas, doc_ids_lists
        )

    def _finish_epoch(
        self, st, key, lam, ests, elog_sum_epoch, gammas, doc_ids_lists
    ) -> float:
        """Shared epoch postlude: scheduled hyper updates, gamma
        bookkeeping, state publication, epoch-mean bound estimate."""
        cfg = self._config
        docs_seen = float(self._corpus.global_num_docs)
        alpha_new, eta_new = st.alpha, st.eta
        step_new = self._counter + 1
        interval = cfg.hyper_parameter_optimize_interval
        if interval > 0 and step_new % interval == 0:
            alpha_new = newton_dirichlet_mle(
                st.alpha, elog_sum_epoch, jnp.asarray(docs_seen)
            )
            eta_new = newton_dirichlet_mle(
                st.eta, _elog_lambda_sum(lam),
                jnp.asarray(cfg.number_of_topics),
            )

        self._set_gammas(gammas, [d for dl in doc_ids_lists for d in dl])
        self._state = LDAState(
            lam=lam, alpha=alpha_new, eta=eta_new,
            step=st.step + 1, key=key,
        )
        self._step_host = step_new
        return float(np.mean(ests))

    def learning_many(self, n: int):
        """n epochs.  On the device-rows path this is ONE dispatch: an
        outer scan over epochs, inner scan over gathered minibatches,
        with the key chain split exactly as n sequential ``learning()``
        calls (bitwise-identical results; tests/test_svi.py pins it).
        Other paths loop ``learning()``."""
        if n <= 0:
            return []
        if self._device_rows is None:
            if (
                getattr(self._corpus, "process_local", False)
                and jax.process_count() > 1
            ):
                # Process-local epochs are shape-stable by construction
                # (negotiated fixed geometry / uniform dense rows), so n
                # epochs fuse into ONE collective dispatch — per-epoch
                # dispatch latency and cross-host sync amortise 1/n
                # (round-3 verdict item 5).
                return self._learning_many_fused_stacked(n)
            return self._learning_many_prefetch(n)
        cfg = self._config
        st = self.state
        saved_t = self._t
        idx_eps, ds_eps, rhos_eps, scales_eps = [], [], [], []
        for e in range(n):
            epoch_seed = (self._counter + e) * 100003 + cfg.seed
            stacks = self._epoch_index_stacks(epoch_seed)
            if stacks is None:  # rare capacity overflow: host fallback
                self._t = saved_t
                return [self.learning() for _ in range(n)]
            idx, docsels, _dids, rhos, scales = stacks
            idx_eps.append(idx)
            ds_eps.append(docsels)
            rhos_eps.append(rhos)
            scales_eps.append(scales)
            self._t += len(rhos)
        idx3 = [
            np.stack([idx_eps[e][j] for e in range(n)])
            for j in range(len(idx_eps[0]))
        ]
        idx_dev = [jnp.asarray(x) for x in idx3]
        ds_dev = (
            None if ds_eps[0] is None else jnp.asarray(np.stack(ds_eps))
        )
        if self._mesh is not None:
            from jax.sharding import NamedSharding, PartitionSpec as P

            sh = NamedSharding(self._mesh, P(None, None, "data"))
            idx_dev = [jax.device_put(x, sh) for x in idx_dev]
            if ds_dev is not None:
                ds_dev = jax.device_put(ds_dev, sh)
        rows_arrays, _meta = self._device_rows
        new_state, ests2 = self._jit_epochs_gather(
            st, rows_arrays, idx_dev, ds_dev,
            jnp.asarray(np.asarray(rhos_eps), self._dtype),
            jnp.asarray(np.asarray(scales_eps), self._dtype),
            n=n,
            hyper_interval=cfg.hyper_parameter_optimize_interval,
            mb_rows=self._mb_rows_args(ds_dev),
        )
        self._state = new_state
        self._step_host = self._counter + n
        self._set_gammas(None, None)  # lazy: .gamma re-runs the E-step
        return [
            float(np.mean(row))
            for row in np.asarray(ests2, dtype=np.float64)
        ]

    def _learning_many_fused_stacked(self, n: int):
        """n epochs in ONE dispatch for the host-repack process-local
        path: construct every epoch's minibatch layouts (advancing the
        rho schedule exactly as sequential epochs would), stack them
        with [n, n_batches] leading axes, shard once, and run the same
        outer-epoch scan as the device-rows path.  The key chain is
        bitwise-equal to n ``learning()`` calls
        (tests/test_multiprocess.py pins 2-process parity).  Falls back
        to the per-epoch loop if any epoch's shapes diverge (cannot
        happen under the negotiated geometry; a GeometryOverflow
        recompile path raises loudly upstream instead)."""
        import numpy as _np

        from pylda_tpu.parallel.mesh import shard_stacked_batch

        cfg = self._config
        st = self.state
        prepared = []
        structs, counts = set(), set()
        for e in range(n):
            epoch_seed = (self._counter + e) * 100003 + cfg.seed
            prep = self._epoch_batches(epoch_seed)
            prepared.append(prep)
            bl0 = prep[0]
            structs.update(
                str(jax.tree.structure(bl))
                + str([jax.tree.map(jnp.shape, b) for b in bl])
                for bl in bl0
            )
            counts.add(len(bl0))
        if len(structs) > 1 or len(counts) > 1:  # shapes diverged
            return [self.learning(_prepared=p) for p in prepared]
        # Stack: epoch axis over (batch axis over chunk fields).
        per_epoch_stacked = [
            jax.tree.map(
                lambda *xs: _np.stack([_np.asarray(x) for x in xs]),
                *prep[0],
            )
            for prep in prepared
        ]
        stacked3 = jax.tree.map(
            lambda *xs: _np.stack(xs), *per_epoch_stacked
        )
        proc_local = prepared[0][4]
        if self._mesh is None:
            stacked3 = [jax.device_put(b) for b in stacked3]
        else:
            stacked3 = [
                shard_stacked_batch(
                    b, self._mesh, process_local=proc_local, stack_axes=2
                )
                for b in stacked3
            ]
        rhos2 = jnp.asarray(
            _np.asarray([p[2] for p in prepared]), self._dtype
        )
        scales2 = jnp.asarray(
            _np.asarray([p[3] for p in prepared]), self._dtype
        )
        new_state, ests2 = self._jit_epochs_stacked(
            st, stacked3, None, rhos2, scales2,
            n=n, hyper_interval=cfg.hyper_parameter_optimize_interval,
        )
        self._state = new_state
        self._step_host = self._counter + n
        self._set_gammas(None, None)  # lazy: .gamma re-runs the E-step
        return [
            float(_np.mean(row))
            for row in _np.asarray(ests2, dtype=_np.float64)
        ]

    def _learning_many_prefetch(self, n: int):
        """Pipelined epochs for the HOST-repack paths (streaming and
        process-local corpora): a worker thread builds epoch e+1's
        minibatch layouts while the device executes epoch e.  The
        native tokenizer releases the GIL and jax blocking waits do
        too, so parse/pack genuinely overlaps device compute —
        streaming epochs are parse-dominated (~0.6 s host vs ~0.25 s
        device at the wiki shape).  Construction stays strictly ordered
        (epoch e+1 is only submitted after e's construction finished),
        so the self._t schedule and per-host determinism are untouched."""
        from concurrent.futures import ThreadPoolExecutor

        cfg = self._config
        counter0 = self._counter
        out = []

        # NOTE (round 5, measured): device_put-ing epoch e+1's arrays
        # from the worker to overlap the upload made the host-repack
        # wiki-shape epoch 9x SLOWER through this tunneled backend
        # (0.51 -> 4.55 s — per-array remote transfers serialise
        # against the running dispatch).  The worker overlaps only the
        # host-side pack; the upload rides the jit dispatch.
        with ThreadPoolExecutor(max_workers=1) as ex:
            fut = ex.submit(
                self._epoch_batches, counter0 * 100003 + cfg.seed
            )
            for e in range(n):
                prepared = fut.result()
                if e + 1 < n:
                    fut = ex.submit(
                        self._epoch_batches,
                        (counter0 + e + 1) * 100003 + cfg.seed,
                    )
                out.append(self.learning(_prepared=prepared))
        return out

    # -- lazy gamma on the device-rows path ------------------------------------------

    @property
    def gamma(self):
        if self._gamma_np is None and self._gammas_dev is None:
            if self._device_rows is not None:
                self._recompute_gammas_device()
            elif getattr(self, "_corpus", None) is not None:
                self._recompute_gammas_host()
        return VariationalBayes.gamma.fget(self)

    def _recompute_gammas_host(self) -> None:
        """Lazy gamma refresh for the host-repack paths after a fused
        multi-epoch scan (which deliberately does not accumulate
        per-document gammas): run ONE rho=0 epoch through the normal
        ``learning()`` machinery — lambda is untouched at zero learning
        rate and every document is visited exactly once — then restore
        the state/schedule so the refresh is side-effect-free."""
        st = self._state
        saved_t = self._t
        saved_step = self._step_host
        cfg = self._config
        prep = self._epoch_batches(self._counter * 100003 + cfg.seed)
        prep = (
            prep[0], prep[1], [0.0] * len(prep[2]), prep[3], prep[4],
            prep[5],
        )
        self.learning(_prepared=prep)
        self._t = saved_t
        self._state = st
        self._step_host = saved_step

    def _recompute_gammas_device(self) -> None:
        """Refresh per-document gammas at the current state: one rho=0
        epoch through the gather scan (lambda unchanged, every document
        visited exactly once)."""
        cfg = self._config
        st = self.state
        stacks = None
        for trial in range(8):  # overflow is seed-dependent and ~3e-5
            stacks = self._epoch_index_stacks(
                (self._counter + 7 * trial) * 100003 + cfg.seed + trial
            )
            if stacks is not None:
                break
        if stacks is None:
            raise RuntimeError(
                "could not draw an epoch partition fitting the fixed "
                "bucket geometry for the gamma refresh"
            )
        idx_stacks, docsels, doc_ids_lists, rhos, scales = stacks
        rows_arrays, _meta = self._device_rows
        idx_dev = [jnp.asarray(x) for x in idx_stacks]
        ds_dev = None if docsels is None else jnp.asarray(docsels)
        if self._mesh is not None:
            from jax.sharding import NamedSharding, PartitionSpec as P

            sh = NamedSharding(self._mesh, P(None, "data"))
            idx_dev = [jax.device_put(x, sh) for x in idx_dev]
            if ds_dev is not None:
                ds_dev = jax.device_put(ds_dev, sh)
        n = len(rhos)
        key = jax.random.fold_in(st.key, 0x6A33A)
        _lam, _ests, _elog, gammas_stacked = self._jit_epoch_gather(
            st.lam, st.alpha, st.eta, key, rows_arrays, idx_dev, ds_dev,
            jnp.zeros((n,), self._dtype),  # rho=0: lambda untouched
            jnp.ones((n,), self._dtype),
            mb_rows=self._mb_rows_args(ds_dev),
        )
        self._gammas_dev = [
            g
            for i in range(n)
            for g in jax.tree.map(lambda x: x[i], gammas_stacked)
        ]
        self._gamma_doc_ids = [d for dl in doc_ids_lists for d in dl]

    # -- per-phase timing (debug/observability surface) -----------------------------

    def phase_timings(self, repeats: int = 3) -> dict:
        """One-minibatch step wall time (ms): E-step + natural-gradient
        lambda update + bound estimate, best of repeats."""
        import time as _time

        st = self.state
        cfg = self._config
        t_saved = self._t
        try:
            batch_lists, _ids, rhos, scales, _pl, docsels = (
                self._epoch_batches(cfg.seed)
            )
        finally:
            self._t = t_saved  # timing must not advance the rho schedule
        if _pl:
            from pylda_tpu.parallel.mesh import lift_process_local_batch

            bl = [
                lift_process_local_batch(b, self._mesh)
                for b in batch_lists[0]
            ]
        else:
            bl = self._maybe_shard(batch_lists[0])
        key = jax.random.fold_in(st.key, 0x7131)
        ds0 = None if docsels is None else jnp.asarray(docsels[0])
        args = (
            st.lam, st.alpha, st.eta, key, bl,
            jnp.asarray(rhos[0], self._dtype),
            jnp.asarray(scales[0], self._dtype),
            ds0,
            self._mb_rows_args(ds0),
        )
        r = self._jit_minibatch(*args)
        jax.block_until_ready(r)
        best = float("inf")
        for _ in range(repeats):
            t0 = _time.perf_counter()
            r = self._jit_minibatch(*args)
            jax.block_until_ready(r)
            best = min(best, _time.perf_counter() - t0)
        return {
            "svi_minibatch_ms": round(best * 1e3, 3),
            "minibatches_per_epoch": len(batch_lists),
        }

    # -- checkpoint extras ----------------------------------------------------------

    def _extra_state(self) -> dict:
        return {"t": np.asarray(self._t, dtype=np.int64)}

    def _load_extra_state(self, blobs: dict) -> None:
        if "t" in blobs:
            self._t = int(blobs["t"])
