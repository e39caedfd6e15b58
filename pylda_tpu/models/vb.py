"""Batch mean-field variational Bayes engine.

TPU-native counterpart of the reference's ``class VariationalBayes``
(upstream:variational_bayes.py [UNVERIFIED]; SURVEY.md sections 2.1 row 4,
3.1, 8.1): E-step = batched exp-domain gamma fixed point
(``pylda_tpu.ops.estep``), M-step = lambda = eta + sufficient stats, ELBO
per iteration, Newton alpha/eta updates at the configured interval.

The public surface mirrors the reference: ``initialize``/``_initialize``,
``learning() -> elbo``, ``inference(test) -> (ll, gamma)``,
``export_beta``.

Dispatch discipline (the #1 throughput lever on this hardware): one
``learning()`` call is ONE jitted device dispatch covering every batch,
the M-step, the bound, and (on schedule) the Newton hyperparameter
updates; ``learning_many(n)`` goes further and runs n full iterations
inside a single ``lax.scan``, so the per-dispatch latency amortises to
nothing.  Per-document gammas stay on device and are only assembled into
a host array lazily via the ``gamma`` property.
"""

from __future__ import annotations

import functools
from typing import List, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from pylda_tpu.corpus.corpus import Corpus, DenseBatch, RaggedBucket
from pylda_tpu.models import layouts
from pylda_tpu.models.base import Inferencer, LDAState
from pylda_tpu.ops.dirichlet import (
    beta_elbo,
    dirichlet_expectation,
    exp_dirichlet_expectation,
    exp_dirichlet_expectation_fast,
    theta_elbo,
)
from pylda_tpu.ops.estep import (
    estep_dense,
    estep_dense_sstats,
    estep_ragged,
    estep_ragged_gamma,
)
from pylda_tpu.ops.hyper import newton_dirichlet_mle
from pylda_tpu.utils import round_up as _round_up


def _gamma_init(key, shape, dtype, mode):
    if mode == "ones":
        return jnp.ones(shape, dtype)
    if mode == "normal":
        # CLT surrogate for Gamma(100) * 0.01 (mean 1, std 0.1): one
        # Box-Muller draw instead of gamma rejection sampling, which
        # measured ~0.7 ms/pass of the flagship's 12.9 (inner=1 e2e
        # delta 5.85 vs 4.31 ms).  Clipped well above 0 so digamma
        # stays in range.
        return jnp.clip(
            1.0 + 0.1 * jax.random.normal(key, shape, dtype=dtype),
            0.2, None,
        )
    return jax.random.gamma(key, 100.0, shape, dtype=dtype) * 0.01


@functools.partial(
    jax.jit,
    static_argnames=(
        "inner_iterations", "convergence_threshold", "eps", "gamma_init_mode",
        "compute_dtype", "stall_patience",
    ),
)
def _vb_dense_batch(
    counts, mask, lam, alpha, key,
    inner_iterations, convergence_threshold, eps, gamma_init_mode="gamma",
    compute_dtype="float32", gamma0=None, stall_patience=0,
):
    """E-step + per-batch ELBO terms for one dense chunk (one jit round)."""
    exp_elog_beta = exp_dirichlet_expectation_fast(lam)
    if gamma0 is None:
        gamma0 = _gamma_init(
            key, (counts.shape[0], alpha.shape[0]), lam.dtype,
            gamma_init_mode,
        )
    gamma, sstats, token_score, sweeps = estep_dense(
        counts, gamma0, exp_elog_beta, alpha,
        inner_iterations=inner_iterations,
        convergence_threshold=convergence_threshold,
        eps=eps,
        compute_dtype=compute_dtype,
        stall_patience=stall_patience,
    )
    theta_score = theta_elbo(gamma, alpha, mask)
    elog_sum = (dirichlet_expectation(gamma) * mask[:, None]).sum(axis=0)
    return gamma, sstats, token_score, theta_score, elog_sum, sweeps


@functools.partial(
    jax.jit,
    static_argnames=(
        "num_types", "inner_iterations", "convergence_threshold", "eps",
        "gamma_init_mode", "compute_dtype", "stall_patience",
    ),
)
def _vb_ragged_batch(
    ids, cnts, mask, lam, alpha, key,
    num_types, inner_iterations, convergence_threshold, eps,
    gamma_init_mode="gamma", compute_dtype="float32", gamma0=None,
    stall_patience=0,
):
    exp_elog_beta = exp_dirichlet_expectation_fast(lam)
    if gamma0 is None:
        gamma0 = _gamma_init(
            key, (ids.shape[0], alpha.shape[0]), lam.dtype, gamma_init_mode
        )
    gamma, sstats, token_score, sweeps = estep_ragged(
        ids, cnts, gamma0, exp_elog_beta, alpha,
        num_types=num_types,
        inner_iterations=inner_iterations,
        convergence_threshold=convergence_threshold,
        eps=eps,
        compute_dtype=compute_dtype,
        stall_patience=stall_patience,
    )
    theta_score = theta_elbo(gamma, alpha, mask)
    elog_sum = (dirichlet_expectation(gamma) * mask[:, None]).sum(axis=0)
    return gamma, sstats, token_score, theta_score, elog_sum, sweeps


@jax.jit
def _elog_lambda_sum(lam):
    return dirichlet_expectation(lam).sum(axis=0)


@functools.partial(jax.jit, static_argnames=("num_docs",))
def _assemble_gamma_device(rows, row_doc_ids, alpha, num_docs: int):
    """Recombine per-row gammas (bucket rows; chunked long docs share a
    doc id) into per-DOCUMENT gamma [num_docs, K], on device: gamma_doc =
    alpha + sum_rows (gamma_row - alpha), exact at fixed phi.  Padding
    rows (doc id -1) fall into a discarded overflow segment."""
    idx = jnp.where(row_doc_ids >= 0, row_doc_ids, num_docs)
    delta = jax.ops.segment_sum(
        rows - alpha[None, :], idx, num_segments=num_docs + 1
    )[:num_docs]
    return alpha[None, :] + delta


class VariationalBayes(Inferencer):
    """Batch VB over the full corpus each iteration."""

    SUPPORTS_PROCESS_LOCAL = True

    def _build_batches(self, corpus: Corpus) -> List[layouts.VBBatch]:
        if (
            getattr(corpus, "process_local", False)
            and jax.process_count() > 1
        ):
            # Multi-host input pipeline: this host parsed only its
            # contiguous doc block; pad it to the uniform per-host row
            # count and lift to one globally-sharded batch (SURVEY.md
            # section 7.3).  Dense layout only for now.
            from pylda_tpu.parallel.mesh import lift_process_local_batch

            cfg = self._config
            if self._mesh is None:
                raise ValueError(
                    "a process-sharded corpus requires a mesh (--mesh); "
                    "each host holds only its doc block, so training "
                    "without the global sharding would silently diverge"
                )
            if corpus.num_types > cfg.dense_vocab_threshold:
                return self._build_ragged_process_local(corpus)
            P = jax.process_count()
            rows = -(-corpus.global_num_docs // P)
            rows = ((rows + cfg.doc_pad_multiple - 1)
                    // cfg.doc_pad_multiple) * cfg.doc_pad_multiple
            local = corpus.to_dense(pad_docs_to=rows)
            # Re-base doc ids to GLOBAL document indices so cross-host
            # gamma assembly scatters each host's rows to its own docs.
            doc_ids = np.where(
                local.doc_ids >= 0,
                local.doc_ids + corpus.global_doc_offset,
                local.doc_ids,
            ).astype(np.int32)
            local = type(local)(
                counts=local.counts, mask=local.mask, doc_ids=doc_ids
            )
            return [lift_process_local_batch(local, self._mesh)]
        return self._maybe_shard(
            layouts.build_vb_batches(corpus, self._config)
        )

    def _build_ragged_process_local(
        self, corpus: Corpus
    ) -> List[layouts.VBBatch]:
        """Multi-host input pipeline for LARGE vocabularies (the
        NIPS/wiki shapes, V > dense_vocab_threshold; SURVEY.md section
        7.3 "Multi-host input pipeline").

        Every host parses only its contiguous doc block; bucket geometry
        is negotiated across hosts (allgathered histograms, elementwise
        max, inert padding) by
        ``pylda_tpu.parallel.mesh.lift_process_local_buckets``."""
        from pylda_tpu.parallel.mesh import lift_process_local_buckets

        cfg = self._config
        return lift_process_local_buckets(
            corpus.to_ragged_buckets(
                bucket_sizes=tuple(cfg.bucket_sizes), doc_pad_multiple=1
            ),
            cfg.bucket_sizes,
            cfg.doc_pad_multiple,
            self._mesh,
            corpus.global_doc_offset,
        )

    def _prepare(self, corpus: Corpus) -> None:
        self._batches = self._build_batches(corpus)
        self._sstats_plan = self._plan_dense_sstats(corpus)
        self._gamma_np: Optional[np.ndarray] = None
        self._gammas_dev: Optional[List[jax.Array]] = None
        self._gamma_doc_ids: Optional[List[np.ndarray]] = None
        # One trace per engine: every batch + M-step + bound + hyper
        # updates in a single dispatch (module docstring).
        self._jit_iteration = jax.jit(
            self._iteration, static_argnames=("update_hypers",)
        )
        self._jit_scan = jax.jit(
            self._iterations_scan, static_argnames=("n", "hyper_interval")
        )

    # -- hybrid sstats plan: ragged sweeps + scatter-free dense sstats ------------

    def _plan_dense_sstats(self, corpus: Corpus):
        """Decide whether the ragged layout should compute sufficient
        statistics against a corpus-static dense counts matrix instead of
        the row segment-sum scatter (ops/estep.estep_dense_sstats: the
        matmul form measured ~4x faster than ANY scatter variant on TPU).

        Returns None (keep the in-bucket scatter) or a dict with
        ``chunks`` (list of DenseBatch, doc-chunked to the memory
        budget), ``docs_mask`` ([num_docs] f32, non-empty docs — keeps
        the theta-ELBO/elog_sum sums identical to the row-wise path) and
        ``num_docs``.  Gated off for: dense layouts (their E-step is
        already matmul-form), process-sharded corpora (each host would
        need the global dense matrix), and sstats_mode="scatter"."""
        cfg = self._config
        if cfg.sstats_mode == "scatter":
            return None
        if corpus.num_types <= cfg.dense_vocab_threshold:
            return None  # dense layout: estep_dense is already matmul-form
        if (
            getattr(corpus, "process_local", False)
            and jax.process_count() > 1
        ):
            return None
        total_mb = corpus.num_docs * corpus.num_types * 4 / 1e6
        if total_mb > cfg.sstats_dense_total_budget_mb:
            # Every chunk is device-resident for the whole run (a 400k-doc
            # V=100k corpus would need 160 GB dense): keep the scatter.
            return None
        if getattr(corpus, "docs", None) is None:
            return None  # disk-backed corpus (no in-RAM doc list)
        pad = cfg.doc_pad_multiple
        rows_budget = int(cfg.sstats_dense_budget_mb * 1e6
                          // (4 * corpus.num_types))
        rows_budget = max(pad, (rows_budget // pad) * pad)
        num_docs = corpus.num_docs
        # Vocab-prepad once at plan time to a multiple of 1024 (covers
        # every Pallas tile width the planner can pick): the per-pass
        # jnp.pad of the bf16 counts block inside the fused scan
        # measured 0.11 ms/pass of pure copy on the flagship shape.
        # Zero columns are inert in sstats and the token score.
        v_pad = _round_up(corpus.num_types, 1024)
        chunks = []
        for start in range(0, num_docs, rows_budget):
            stop = min(num_docs, start + rows_budget)
            ch = corpus.to_dense(
                doc_indices=range(start, stop),
                pad_docs_to=_round_up(stop - start, pad),
            )
            counts = np.asarray(ch.counts)
            if v_pad > counts.shape[1]:
                counts = np.pad(
                    counts, ((0, 0), (0, v_pad - counts.shape[1]))
                )
            dtype = (
                jnp.bfloat16 if counts.max(initial=0.0) <= 256.0
                # bfloat16 is exact for integers <= 256, and these
                # counts are read every pass (the dominant sstats HBM
                # stream): half the bytes, bit-identical results after
                # the f32 upcast inside estep_dense_sstats.
                else counts.dtype
            )
            ch = type(ch)(
                counts=jnp.asarray(counts, dtype=dtype),
                mask=ch.mask, doc_ids=ch.doc_ids,
            )
            chunks.append(ch)
        docs_mask = np.asarray(
            [d.size > 0 for d in corpus.docs], np.float32
        )
        return {
            "chunks": self._maybe_shard(chunks),
            "docs_mask": jnp.asarray(docs_mask),
            "num_docs": num_docs,
        }

    # -- E-step over every batch (traced; one sub-call per batch shape) ----------

    def _run_estep_hybrid(
        self, batches, lam, alpha, key, dense_chunks, docs_mask,
        num_docs: int, gamma0s=None, doc_id_map=None,
    ):
        """Ragged sweeps + scatter-free dense sufficient statistics.

        Per bucket: gamma fixed point only (``estep_ragged_gamma``).
        Bucket-row gammas (chunked long docs included) recombine into
        per-DOCUMENT gamma on device, then sstats + token score come from
        ``estep_dense_sstats`` against the corpus-static dense counts
        chunks — two MXU matmuls instead of a 500k-row scatter.  The
        theta-ELBO and elog sums are computed on the per-document gamma,
        which for chunked long documents is *more* faithful to the
        reference's per-document bound than the old per-chunk-row sum.
        """
        cfg = self._config
        # Fast exp-psi for the per-pass [K, V] expectation too (~1M
        # digamma+exp at the flagship = ~0.1 ms/pass; same <2e-6 f32
        # relative error as the inner loop).  Exports and the beta-ELBO
        # stay on the exact form.
        eeb = exp_dirichlet_expectation_fast(lam)
        rows, row_ids = [], []
        for i, b in enumerate(batches):
            if gamma0s is not None:
                gamma0 = gamma0s[i]
            else:
                sub = jax.random.fold_in(key, i)
                gamma0 = _gamma_init(
                    sub, (b.ids.shape[0], alpha.shape[0]), lam.dtype,
                    cfg.gamma_init,
                )
            g = self._ragged_gamma_fixed_point(b, gamma0, eeb, alpha)
            rows.append(g)
            dids = jnp.asarray(b.doc_ids)
            if doc_id_map is not None:
                # SVI minibatch path: remap GLOBAL doc ids to positions
                # within the minibatch's doc selection so the gamma
                # assembly and theta/elog reductions below run at
                # [b_cap, K], not [corpus D, K] — the round-5 config-4
                # trace showed the full-D reductions costing ~13% of
                # the epoch for a 1/16th-corpus minibatch.
                dids = jnp.where(
                    dids >= 0,
                    doc_id_map[jnp.clip(dids, 0, doc_id_map.shape[0] - 1)],
                    -1,
                )
            row_ids.append(dids)
        gamma_docs = _assemble_gamma_device(
            jnp.concatenate(rows, axis=0),
            jnp.concatenate(row_ids, axis=0),
            alpha,
            num_docs=num_docs,
        )
        et_docs = exp_dirichlet_expectation(gamma_docs)
        sstats = None
        token_score = jnp.zeros((), dtype=self._dtype)
        if cfg.resolved_sstats_kernel(jax.default_backend()) == "pallas":
            from pylda_tpu.ops.pallas_sstats import pallas_dense_sstats

            sstats_fn = functools.partial(
                pallas_dense_sstats,
                interpret=jax.default_backend() == "cpu",
            )
        else:
            sstats_fn = estep_dense_sstats
        for ch in dense_chunks:
            cidx = jnp.where(ch.doc_ids >= 0, ch.doc_ids, 0)
            # Padding rows gather doc 0's expEtheta but carry all-zero
            # counts — inert in both sstats and the token score.
            ss, tok = sstats_fn(
                ch.counts, et_docs[cidx], eeb,
                eps=cfg.eps, compute_dtype=cfg.compute_dtype,
            )
            sstats = ss if sstats is None else sstats + ss
            token_score = token_score + tok
        theta_score = theta_elbo(gamma_docs, alpha, docs_mask)
        elog_sum = (
            dirichlet_expectation(gamma_docs) * docs_mask[:, None]
        ).sum(axis=0)
        return [gamma_docs], sstats, token_score, theta_score, elog_sum

    def _ragged_gamma_fixed_point(self, b, gamma0, eeb, alpha):
        """Gamma fixed point for one ragged bucket: the fused Pallas
        kernel (B read from HBM once, all sweeps VMEM-resident) when
        ``use_pallas="always"`` and the tile plan fits, else the XLA
        path (``estep_ragged_gamma``)."""
        cfg = self._config
        if cfg.use_pallas == "always":
            from pylda_tpu.ops.pallas_ragged import (
                pallas_estep_ragged_gamma,
                plan_pallas_ragged,
            )

            plan = plan_pallas_ragged(
                b.ids.shape[0], b.ids.shape[1], cfg.number_of_topics,
                cfg.compute_dtype,
            )
            if plan is not None:
                g, _sweeps = pallas_estep_ragged_gamma(
                    b.ids, b.cnts, gamma0, eeb, alpha,
                    inner_iterations=cfg.inner_iterations,
                    convergence_threshold=cfg.convergence_threshold,
                    eps=cfg.eps,
                    tile_d=plan[0],
                    tile_t=plan[1],
                    storage_dtype=plan[2],
                    interpret=jax.default_backend() == "cpu",
                )
                return g
        g, _sweeps = estep_ragged_gamma(
            b.ids, b.cnts, gamma0, eeb, alpha,
            inner_iterations=cfg.inner_iterations,
            convergence_threshold=cfg.convergence_threshold,
            eps=cfg.eps,
            compute_dtype=cfg.compute_dtype,
            stall_patience=cfg.estep_stall_patience,
        )
        return g

    def _run_estep(
        self, batches: List[layouts.VBBatch], lam, alpha, key,
        dense_chunks=None, docs_mask=None, num_docs: Optional[int] = None,
        gamma0s=None, doc_id_map=None,
    ):
        """Run the E-step over every batch; returns device accumulators.

        ``gamma0s`` (optional, one array per batch) supplies precomputed
        gamma initialisations; when absent each batch draws its own from
        ``key``.  The fused multi-iteration scan passes a single set
        drawn OUTSIDE the scan body: the per-iteration redraw was pure
        scan-body RNG cost (~2.0 ms/pass of threefry + Gamma-rejection
        while_loops at the flagship shape — 20% of the measured pass,
        scripts/profile_sweep.py device trace), and the init is an
        arbitrary cold start whose distribution, not its per-iteration
        freshness, is what matters."""
        cfg = self._config
        if dense_chunks is not None:
            return self._run_estep_hybrid(
                batches, lam, alpha, key, dense_chunks, docs_mask,
                num_docs if num_docs is not None
                else self._sstats_plan["num_docs"],
                gamma0s=gamma0s, doc_id_map=doc_id_map,
            )
        sstats = None
        token_score = jnp.zeros((), dtype=self._dtype)
        theta_score = jnp.zeros((), dtype=self._dtype)
        elog_sum = jnp.zeros((cfg.number_of_topics,), dtype=self._dtype)
        gammas = []
        for i, b in enumerate(batches):
            sub = jax.random.fold_in(key, i)
            g0 = gamma0s[i] if gamma0s is not None else None
            if isinstance(b, DenseBatch) and cfg.use_pallas == "always":
                from pylda_tpu.ops.pallas_estep import pallas_estep_dense

                gamma0 = g0 if g0 is not None else _gamma_init(
                    sub, (b.counts.shape[0], alpha.shape[0]), lam.dtype,
                    cfg.gamma_init,
                )
                g, ss, tok = pallas_estep_dense(
                    b.counts, gamma0, exp_dirichlet_expectation(lam), alpha,
                    inner_iterations=cfg.inner_iterations,
                    convergence_threshold=cfg.convergence_threshold,
                    eps=cfg.eps,
                    interpret=jax.default_backend() == "cpu",
                )
                th = theta_elbo(g, alpha, b.mask)
                el = (dirichlet_expectation(g) * b.mask[:, None]).sum(axis=0)
            elif isinstance(b, DenseBatch):
                g, ss, tok, th, el, _ = _vb_dense_batch(
                    b.counts, b.mask, lam, alpha, sub,
                    cfg.inner_iterations, cfg.convergence_threshold, cfg.eps,
                    cfg.gamma_init, cfg.compute_dtype, gamma0=g0,
                    stall_patience=cfg.estep_stall_patience,
                )
            else:
                g, ss, tok, th, el, _ = _vb_ragged_batch(
                    b.ids, b.cnts, b.mask, lam, alpha, sub,
                    len(self._vocab), cfg.inner_iterations,
                    cfg.convergence_threshold, cfg.eps, cfg.gamma_init,
                    cfg.compute_dtype, gamma0=g0,
                    stall_patience=cfg.estep_stall_patience,
                )
            sstats = ss if sstats is None else sstats + ss
            token_score = token_score + tok
            theta_score = theta_score + th
            elog_sum = elog_sum + el
            gammas.append(g)
        return gammas, sstats, token_score, theta_score, elog_sum

    def _gamma0s_for(self, batches, num_topics: int, dtype, key):
        """One gamma init per batch (drawn once per dispatch; see
        ``_iterations_scan``).  Returns None for layouts whose E-step
        does not take a gamma init (the hybrid engine's sequence
        buckets initialise topic assignments instead)."""
        if any(
            not (hasattr(b, "ids") or hasattr(b, "counts")) for b in batches
        ):
            return None
        out = []
        for i, b in enumerate(batches):
            sub = jax.random.fold_in(key, i)
            rows = b.ids.shape[0] if hasattr(b, "ids") else b.counts.shape[0]
            out.append(
                _gamma_init(
                    sub, (rows, num_topics), dtype, self._config.gamma_init
                )
            )
        return out

    # -- one full VB iteration, fully on device -----------------------------------

    def _iteration(
        self, state: LDAState, batches, dense_chunks, docs_mask,
        update_hypers: bool, gamma0s=None,
    ):
        """One batch-VB iteration as a pure function of (state, batches)."""
        cfg = self._config
        key, sub = jax.random.split(state.key)
        gammas, sstats, token_score, theta_score, elog_sum = self._run_estep(
            batches, state.lam, state.alpha, sub,
            dense_chunks=dense_chunks, docs_mask=docs_mask,
            gamma0s=gamma0s,
        )
        elbo = token_score + theta_score + beta_elbo(state.lam, state.eta)
        lam_new = state.eta[None, :] + sstats

        alpha_new, eta_new = state.alpha, state.eta
        if update_hypers:
            alpha_new = newton_dirichlet_mle(
                state.alpha, elog_sum,
                jnp.asarray(self._corpus.global_num_docs),
            )
            eta_new = newton_dirichlet_mle(
                state.eta,
                _elog_lambda_sum(lam_new),
                jnp.asarray(cfg.number_of_topics),
            )
        new_state = LDAState(
            lam=lam_new, alpha=alpha_new, eta=eta_new,
            step=state.step + 1, key=key,
        )
        return new_state, elbo, gammas

    def _iterations_scan(
        self, state: LDAState, batches, dense_chunks, docs_mask, n: int,
        hyper_interval: int,
    ):
        """n full iterations in one lax.scan (one dispatch total).

        Hyper updates run via lax.cond on the carried step counter, so the
        scan is iteration-for-iteration identical to n ``learning()``
        calls — up to the gamma-init RNG stream: the scan draws ONE set
        of per-batch gamma inits outside the body and reuses it for all
        n iterations.  A per-iteration redraw inside the body measured
        ~2.0 ms/pass of pure threefry + Gamma-rejection device time at
        the flagship shape (scripts/profile_sweep.py), and the cold init
        is arbitrary — its distribution matters, its freshness does not
        (warm-starting, the thing that would change dynamics, is ruled
        out separately; see CLAUDE.md round-2 leads)."""
        gamma0s = self._gamma0s_for(
            batches, state.alpha.shape[0], state.lam.dtype,
            jax.random.fold_in(state.key, 0x60A4),
        )

        def body(carry, _):
            st = carry
            if hyper_interval > 0:
                do_up = (st.step + 1) % hyper_interval == 0

                def with_up(s):
                    return self._iteration(
                        s, batches, dense_chunks, docs_mask,
                        update_hypers=True, gamma0s=gamma0s,
                    )[:2]

                def without_up(s):
                    return self._iteration(
                        s, batches, dense_chunks, docs_mask,
                        update_hypers=False, gamma0s=gamma0s,
                    )[:2]

                new_st, elbo = jax.lax.cond(do_up, with_up, without_up, st)
            else:
                new_st, elbo, _ = self._iteration(
                    st, batches, dense_chunks, docs_mask,
                    update_hypers=False, gamma0s=gamma0s,
                )
            return new_st, elbo

        new_state, elbos = jax.lax.scan(body, state, None, length=n)
        # No gamma recomputation here: gammas are only consumed by
        # export/--dump_gamma, and the recompute is a full extra E-step
        # (1/n of every learning_many — 6% of the 16-pass benchmark).
        # The .gamma property recomputes lazily at the final lambda.
        return new_state, elbos

    # -- public training surface ---------------------------------------------------

    def learning(self) -> float:
        """One batch-VB iteration: E-step, bound, M-step, hyper updates.

        Returns the ELBO at (gamma*, lambda-used-in-E-step).  Coordinate
        ascent makes this monotone non-decreasing ONLY when each E-step
        is run to convergence from a deterministic start: with the
        default random per-iteration gamma init and a capped inner loop
        it is monotone up to a small wobble (observed ~3e-6 relative
        near convergence — e.g. a −0.34 absolute dip at iteration 10 on
        the bundled quickstart).  ``gamma_init="ones"`` plus a high
        ``inner_iterations`` recovers strict monotonicity;
        tests/test_vb_engine.py::test_elbo_monotone pins the 1e-4
        relative band."""
        st = self.state
        interval = self._config.hyper_parameter_optimize_interval
        update = interval > 0 and (self._counter + 1) % interval == 0
        plan = self._sstats_plan
        new_state, elbo, gammas = self._jit_iteration(
            st, self._batches,
            plan["chunks"] if plan else None,
            plan["docs_mask"] if plan else None,
            update_hypers=update,
        )
        self._state = new_state
        self._step_host = self._counter + 1
        self._set_gammas(gammas, self._gamma_doc_ids_for(self._batches, plan))
        return float(elbo)

    def learning_many(self, n: int) -> List[float]:
        """n iterations in ONE device dispatch (lax.scan); returns the
        per-iteration ELBOs.  Semantically identical to n ``learning()``
        calls up to the RNG stream of the per-iteration gamma inits."""
        if n <= 0:
            return []
        st = self.state
        plan = self._sstats_plan
        new_state, elbos = self._jit_scan(
            st, self._batches,
            plan["chunks"] if plan else None,
            plan["docs_mask"] if plan else None,
            n=n,
            hyper_interval=self._config.hyper_parameter_optimize_interval,
        )
        self._state = new_state
        self._step_host = self._counter + n
        self._set_gammas(None, None)  # lazy: .gamma re-runs the E-step
        return [float(x) for x in np.asarray(elbos)]

    def _gamma_doc_ids_for(self, batches, plan) -> List[np.ndarray]:
        """Row->document maps matching the gammas the E-step returned:
        per-bucket rows on the scatter path, one per-document block on
        the hybrid dense-sstats path."""
        if plan is not None:
            return [np.arange(plan["num_docs"], dtype=np.int32)]
        return [b.doc_ids for b in batches]

    # -- per-phase timing (debug/observability surface) -----------------------------

    def phase_timings(self, repeats: int = 3) -> dict:
        """Per-phase device wall times in ms for one training iteration
        — the repo surface for the reference's per-phase clocks inside
        ``learning()`` (SURVEY.md section 5 "Tracing / profiling").

        Each phase is dispatched separately and ``block_until_ready``-d
        (best of ``repeats``), so the sum is an UPPER BOUND on the fused
        iteration: the production path runs all phases in one dispatch
        and lets XLA fuse across these boundaries."""
        import time as _time

        st = self.state
        cfg = self._config
        key = jax.random.fold_in(st.key, 0x7131)
        out = {}

        def timed(name, fn, *a):
            r = fn(*a)  # compile + warm
            jax.block_until_ready(r)
            best = float("inf")
            for _ in range(repeats):
                t0 = _time.perf_counter()
                r = fn(*a)
                jax.block_until_ready(r)
                best = min(best, _time.perf_counter() - t0)
            out[name] = round(best * 1e3, 3)
            return r

        plan = self._sstats_plan
        if plan is not None:
            # Hybrid path: the ragged sweeps + dense sstats are one fused
            # unit; time them as the production E-step plus a separate
            # sweeps-only row so the sstats share is visible.
            full = jax.jit(
                lambda bs, lam, alpha, k: self._run_estep(
                    bs, lam, alpha, k,
                    dense_chunks=plan["chunks"],
                    docs_mask=plan["docs_mask"],
                )
            )
            r = timed(
                "estep_hybrid_full_ms", full, self._batches, st.lam,
                st.alpha, key,
            )
            sstats, elog_sum = r[1], r[4]
            sweeps_only = jax.jit(
                lambda bs, lam, alpha, k: [
                    self._ragged_gamma_fixed_point(
                        b,
                        _gamma_init(
                            jax.random.fold_in(k, i),
                            (b.ids.shape[0], alpha.shape[0]), lam.dtype,
                            cfg.gamma_init,
                        ),
                        exp_dirichlet_expectation(lam), alpha,
                    )
                    for i, b in enumerate(bs)
                ]
            )
            timed(
                "estep_sweeps_only_ms", sweeps_only, self._batches, st.lam,
                st.alpha, key,
            )
            out["estep_total_ms"] = out["estep_hybrid_full_ms"]
        else:
            estep1 = jax.jit(
                lambda b, lam, alpha, k: self._run_estep([b], lam, alpha, k)
            )
            sstats, elog_sum = None, None
            for i, b in enumerate(self._batches):
                shape = (
                    f"dense{tuple(b.counts.shape)}"
                    if isinstance(b, DenseBatch)
                    else f"rows{b.mask.shape[0]}"
                )
                r = timed(
                    f"estep_batch{i}_{shape}_ms", estep1, b, st.lam, st.alpha,
                    jax.random.fold_in(key, i),
                )
                sstats = r[1] if sstats is None else sstats + r[1]
                elog_sum = r[4] if elog_sum is None else elog_sum + r[4]
            out["estep_total_ms"] = round(
                sum(v for k, v in out.items() if k.startswith("estep_batch")),
                3,
            )
        mstep = jax.jit(lambda eta, ss: eta[None, :] + ss)
        lam_new = timed("mstep_ms", mstep, st.eta, sstats)
        timed("bound_ms", jax.jit(beta_elbo), st.lam, st.eta)
        timed(
            "hyper_newton_ms",
            jax.jit(
                lambda a, e, es, lam: (
                    newton_dirichlet_mle(
                        a, es,
                        jnp.asarray(float(self._corpus.global_num_docs)),
                    ),
                    newton_dirichlet_mle(
                        e, _elog_lambda_sum(lam),
                        jnp.asarray(cfg.number_of_topics),
                    ),
                )
            ),
            st.alpha, st.eta, elog_sum, lam_new,
        )
        return out

    # -- gamma bookkeeping (lazy host assembly) -------------------------------------

    def _set_gammas(self, gammas, doc_ids_list) -> None:
        """``doc_ids_list[i]`` maps rows of ``gammas[i]`` to global doc
        indices (host or device arrays; gathered lazily)."""
        self._gammas_dev = gammas
        self._gamma_doc_ids = doc_ids_list
        self._gamma_np = None

    @property
    def _jit_run_estep(self):
        """One-dispatch E-step (shared by the lazy .gamma refresh and
        held-out inference — the unjitted per-op path paid the ~30 ms
        tunnel dispatch tax hundreds of times per pylda-test run).
        Created on first use so it also exists on engines restored from
        a checkpoint without a training corpus."""
        fn = getattr(self, "_jit_run_estep_fn", None)
        if fn is None:
            fn = jax.jit(
                lambda bs, lam, alpha, key, chunks, mask: self._run_estep(
                    bs, lam, alpha, key, dense_chunks=chunks, docs_mask=mask,
                    num_docs=(
                        None if mask is None else mask.shape[0]
                    ),
                )
            )
            self._jit_run_estep_fn = fn
        return fn

    def _recompute_gammas(self) -> None:
        """E-step at the current lambda to refresh gammas (lazy path for
        ``learning_many``, which no longer pays an extra per-scan E-step
        just in case gamma is exported)."""
        st = self.state
        plan = self._sstats_plan
        key = jax.random.fold_in(st.key, 0x6A33A)
        gammas, *_ = self._jit_run_estep(
            self._batches, st.lam, st.alpha, key,
            plan["chunks"] if plan else None,
            plan["docs_mask"] if plan else None,
        )
        self._gammas_dev = gammas
        self._gamma_doc_ids = self._gamma_doc_ids_for(self._batches, plan)

    @property
    def gamma(self) -> Optional[np.ndarray]:
        """Per-document gamma [D, K] in corpus order (host array,
        assembled on first access; recomputed at the current lambda if a
        fused multi-iteration scan left them stale)."""
        if self._gamma_np is None:
            if self._gammas_dev is None:
                if getattr(self, "_batches", None) is None:
                    return None
                self._recompute_gammas()
            from pylda_tpu.parallel.mesh import host_gather

            self._gamma_np = layouts.assemble_gamma(
                [host_gather(d) for d in self._gamma_doc_ids],
                [host_gather(g) for g in self._gammas_dev],
                self._corpus.global_num_docs,
                host_gather(self.state.alpha),
            )
        return self._gamma_np

    # -- held-out ------------------------------------------------------------------

    def inference(self, test_corpus: Corpus) -> Tuple[float, np.ndarray]:
        """E-step on held-out docs with lambda frozen (SURVEY.md 3.4);
        returns (doc-side bound, gamma in corpus order)."""
        st = self.state
        batches = self._build_batches(test_corpus)
        plan = self._plan_dense_sstats(test_corpus)
        key = jax.random.fold_in(st.key, 0x7E57)
        # One device dispatch for the whole held-out E-step (the unjitted
        # path dispatched per op — hundreds of ~30 ms tunnel round-trips
        # per pylda-test run on this setup).
        gammas, _, token_score, theta_score, _ = self._jit_run_estep(
            batches, st.lam, st.alpha, key,
            plan["chunks"] if plan else None,
            plan["docs_mask"] if plan else None,
        )
        from pylda_tpu.parallel.mesh import host_gather

        ll = float(token_score + theta_score)
        gamma = layouts.assemble_gamma(
            [host_gather(i) for i in self._gamma_doc_ids_for(batches, plan)],
            [host_gather(g) for g in gammas],
            test_corpus.num_docs,
            host_gather(st.alpha),
        )
        return ll, gamma
