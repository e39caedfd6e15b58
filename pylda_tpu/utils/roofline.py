"""Analytic roofline / occupancy report for the VB-family E-step.

SURVEY.md section 5 (tracing/profiling) calls for kernel-level occupancy
reporting alongside the per-phase clocks.  TPU kernels here are either
MXU-bound (dense matmuls), VPU-bound (batched per-document matvecs) or
HBM-bound (streaming the corpus), so an analytic FLOP/byte model against
the chip's peaks gives an honest utilisation number without a profiler
attached — the measured side comes from ``VariationalBayes.phase_timings``
or the scan-fused studies in ``scripts/``.

Peaks default to TPU v5e (the benched chip): 197 TFLOP/s bf16 /
~98 TFLOP/s f32 on the MXU, 819 GB/s HBM.  Override for other chips.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Dict, Optional

import jax


@dataclass
class ChipPeaks:
    mxu_flops: float = 98e12  # f32 (bf16 operands double this)
    mxu_flops_bf16: float = 197e12
    hbm_bytes: float = 819e9
    # VPU: (8, 128) lanes x 4 ALUs x FMA at ~940 MHz — the ceiling for
    # the ragged sweep's batched per-document matvecs, which cannot tile
    # onto the MXU (each document contracts its own [T, K] block).
    vpu_flops: float = 7.7e12

    def flops(self, compute_dtype: str) -> float:
        return (
            self.mxu_flops_bf16
            if compute_dtype == "bfloat16"
            else self.mxu_flops
        )


def estep_cost_model(
    engine, peaks: Optional[ChipPeaks] = None
) -> Dict[str, dict]:
    """Per-phase FLOPs / HBM bytes / roofline-bound milliseconds for one
    training iteration of a prepared VB-family engine.

    Phases:
      - ``sweeps``: the gamma fixed point — per sweep, two contractions
        over every (real + padding) slot of every bucket (ragged) or the
        full [D, V] block (dense layout).
      - ``sstats``: sufficient statistics (dense-matmul hybrid path when
        planned, else the in-bucket scatter, modeled as the same flops).
      - ``elog_beta``: the once-per-iteration K x V Dirichlet expectation
        (bandwidth-only; transcendentals overlap it on the VPU).
    """
    peaks = peaks or ChipPeaks()
    cfg = engine._config
    K = cfg.number_of_topics
    cdt = cfg.compute_dtype
    fpk = peaks.flops(cdt)
    V = getattr(engine, "_vocab", None)
    V = len(V) if V else 0

    out: Dict[str, dict] = {}
    batches = getattr(engine, "_batches", None) or []
    slots = 0
    dense_dv = 0
    seq_slots = 0
    for b in batches:
        if hasattr(b, "ids"):
            slots += b.ids.shape[0] * b.ids.shape[1]
        elif hasattr(b, "tokens"):  # sequence layout (sampling engines)
            seq_slots += b.tokens.shape[0] * b.tokens.shape[1]
        else:
            dense_dv += b.counts.shape[0] * b.counts.shape[1]

    if seq_slots:
        # Sampled local step (hybrid): per sweep, the per-position
        # conditional p = (ndk + alpha) * phi[:, w] costs ~6 VPU
        # flops/slot/K (gather + mul + two one_hot count updates), and
        # the cdf sampler adds a [*, K] x [K, K] prefix-sum matmul —
        # 2*K MXU flops per slot.  A deliberate LOWER bound (scheduling
        # and scan overhead excluded).
        sampler = cfg.resolved_topic_sampler()
        vpu_ms = 6 * seq_slots * K / peaks.vpu_flops * 1e3
        mxu_ms = (
            2 * seq_slots * K * K / fpk * 1e3 if sampler == "cdf" else 0.0
        )
        hbm_ms = seq_slots * 8 / peaks.hbm_bytes * 1e3
        out["sweeps_per_sweep"] = {
            "flops": 6 * seq_slots * K
            + (2 * seq_slots * K * K if sampler == "cdf" else 0),
            "hbm_bytes": seq_slots * 8,
            "bound_ms": max(vpu_ms + mxu_ms, hbm_ms),
            "bound": "vpu+mxu" if vpu_ms + mxu_ms > hbm_ms else "hbm",
        }
        if V and K:
            b_ = 3 * K * V * 4
            out["elog_beta"] = {
                "flops": 0,
                "hbm_bytes": b_,
                "bound_ms": b_ / peaks.hbm_bytes * 1e3,
                "bound": "hbm",
            }
        return out

    # -- sweeps ------------------------------------------------------------
    itemsize = 2 if cdt == "bfloat16" else 4
    if slots:
        # Ragged fixed point: per-DOCUMENT [T, K] matvec pairs — VPU
        # work (no shared contraction to tile onto the MXU).  The fused
        # engine never materialises the gathered B block (HBM reads:
        # (ids, cnts) once + the [K, V] factor, which cache-resides), so
        # the binding resource is VPU flops, NOT bandwidth — measured
        # 0.131 ms/sweep over 622k slots at K=100 on the v5e flagship
        # (CLAUDE.md), i.e. ~25% of this VPU ceiling.
        flops = 2 * 2 * slots * K  # two dtk contractions per sweep
        bytes_ = slots * 8  # ids (i32) + cnts (f32) streamed once
        compute_ms = flops / peaks.vpu_flops * 1e3
        bound_kind = "vpu"
    else:
        # Dense layout: the sweep is two [D, V] x [V, K]-class matmuls —
        # genuine MXU work with the counts block streamed from HBM.
        flops = 2 * 2 * dense_dv * K
        bytes_ = 2 * dense_dv * itemsize
        compute_ms = flops / fpk * 1e3
        bound_kind = "mxu"
    hbm_ms = bytes_ / peaks.hbm_bytes * 1e3
    out["sweeps_per_sweep"] = {
        "flops": flops,
        "hbm_bytes": bytes_,
        "bound_ms": max(compute_ms, hbm_ms),
        "bound": bound_kind if compute_ms > hbm_ms else "hbm",
    }

    # -- sstats ------------------------------------------------------------
    plan = getattr(engine, "_sstats_plan", None)
    if plan is not None:
        D = plan["num_docs"]
        c_bytes = sum(
            ch.counts.size * ch.counts.dtype.itemsize
            for ch in plan["chunks"]
        )
        rows = sum(ch.counts.shape[0] for ch in plan["chunks"])
        flops = 2 * 2 * rows * V * K  # phinorm + sstats matmuls
        # XLA path round-trips phinorm (write + 2 reads); the Pallas
        # kernel (sstats_kernel="pallas") keeps it in VMEM.
        phinorm_traffic = (
            0
            if cfg.resolved_sstats_kernel(jax.default_backend()) == "pallas"
            else 3 * rows * V * 4
        )
        bytes_ = c_bytes + phinorm_traffic
        out["sstats"] = {
            "flops": flops,
            "hbm_bytes": bytes_,
            "bound_ms": max(flops / fpk, bytes_ / peaks.hbm_bytes) * 1e3,
            "bound": "mxu" if flops / fpk > bytes_ / peaks.hbm_bytes
            else "hbm",
            "docs": D,
        }

    # -- elog_beta ---------------------------------------------------------
    if V and K:
        b = 3 * K * V * 4  # read lambda, write E[log beta] + exp form
        out["elog_beta"] = {
            "flops": 0,
            "hbm_bytes": b,
            "bound_ms": b / peaks.hbm_bytes * 1e3,
            "bound": "hbm",
        }
    return out


def utilisation(measured_ms: float, bound_ms: float) -> float:
    """Fraction of the roofline achieved (1.0 = speed of light)."""
    return 0.0 if measured_ms <= 0 else min(1.0, bound_ms / measured_ms)


def measured_sweep_counts(engine) -> list:
    """Per-batch CONVERGED sweep counts at the engine's current state,
    in one jitted dispatch — the dynamic denominator the pass-level
    roofline needs (the 1e-5 convergence threshold fires in steady
    state: measured 50 -> ~20 sweeps on the flagship shape, so sizing
    the bound at ``inner_iterations`` would overstate it ~2.5x)."""
    import jax

    from pylda_tpu.models.vb import _gamma_init
    from pylda_tpu.ops.dirichlet import exp_dirichlet_expectation
    from pylda_tpu.ops.estep import estep_dense, estep_ragged_gamma

    cfg = engine._config
    if any(hasattr(b, "tokens") for b in engine._batches):
        # Sequence layout (hybrid): the sampled local step runs a FIXED
        # burn_in + num_samples sweeps — no convergence threshold.
        return [
            cfg.burn_in_sweeps + cfg.number_of_samples
            for _ in engine._batches
        ]
    st = engine.state
    key = jax.random.fold_in(st.key, 0x5EE9)

    @jax.jit
    def counts(lam, alpha, k):
        eeb = exp_dirichlet_expectation(lam)
        out = []
        for i, b in enumerate(engine._batches):
            sub = jax.random.fold_in(k, i)
            rows = b.ids.shape[0] if hasattr(b, "ids") else b.counts.shape[0]
            g0 = _gamma_init(
                sub, (rows, alpha.shape[0]), lam.dtype, cfg.gamma_init
            )
            if hasattr(b, "ids"):
                _g, s = estep_ragged_gamma(
                    b.ids, b.cnts, g0, eeb, alpha,
                    inner_iterations=cfg.inner_iterations,
                    convergence_threshold=cfg.convergence_threshold,
                    eps=cfg.eps, compute_dtype=cfg.compute_dtype,
                    stall_patience=cfg.estep_stall_patience,
                )
            else:
                _g, _ss, _tok, s = estep_dense(
                    b.counts, g0, eeb, alpha,
                    inner_iterations=cfg.inner_iterations,
                    convergence_threshold=cfg.convergence_threshold,
                    eps=cfg.eps, compute_dtype=cfg.compute_dtype,
                )
            out.append(s)
        return out
    return [float(s) for s in jax.device_get(counts(st.lam, st.alpha, key))]


def _batch_sweep_bound_ms(b, cfg, peaks: ChipPeaks) -> float:
    """Roofline bound for ONE sweep of one batch (same resource model as
    ``estep_cost_model``: VPU for the ragged batched matvecs, MXU for
    the dense matmul layout)."""
    K = cfg.number_of_topics
    itemsize = 2 if cfg.compute_dtype == "bfloat16" else 4
    if hasattr(b, "ids"):
        slots = b.ids.shape[0] * b.ids.shape[1]
        compute_ms = 4 * slots * K / peaks.vpu_flops * 1e3
        hbm_ms = slots * 8 / peaks.hbm_bytes * 1e3
    elif hasattr(b, "tokens"):  # sequence layout (sampling engines)
        slots = b.tokens.shape[0] * b.tokens.shape[1]
        compute_ms = 6 * slots * K / peaks.vpu_flops * 1e3
        if cfg.resolved_topic_sampler() == "cdf":
            compute_ms += (
                2 * slots * K * K / peaks.flops(cfg.compute_dtype) * 1e3
            )
        hbm_ms = slots * 8 / peaks.hbm_bytes * 1e3
    else:
        slots = b.counts.shape[0] * b.counts.shape[1]
        compute_ms = 4 * slots * K / peaks.flops(cfg.compute_dtype) * 1e3
        hbm_ms = 2 * slots * itemsize / peaks.hbm_bytes * 1e3
    return max(compute_ms, hbm_ms)


def pass_bound_ms(engine, peaks: Optional[ChipPeaks] = None) -> float:
    """Roofline lower bound (ms) for ONE full training pass at the
    engine's current state: the per-sweep bound scaled by each batch's
    measured converged sweep count, plus the sstats and E[log beta]
    phases.  ``measured_pass_ms / pass_bound_ms`` is the headline
    utilisation ("mfu") bench.py reports."""
    peaks = peaks or ChipPeaks()
    cfg = engine._config
    sweeps = measured_sweep_counts(engine)
    total = 0.0
    for b, s in zip(engine._batches, sweeps):
        total += _batch_sweep_bound_ms(b, cfg, peaks) * s
    model = estep_cost_model(engine, peaks)
    for phase in ("sstats", "elog_beta"):
        if phase in model:
            total += model[phase]["bound_ms"]
    return total


def _svi_epoch_bound_ms(eng, peaks: ChipPeaks) -> float:
    """Roofline lower bound for ONE SVI epoch: the per-sweep bound of
    every minibatch chunk x a measured converged sweep count per
    distinct chunk shape (one probe dispatch per shape — the fixed
    negotiated geometry keeps that to a handful).  Deliberately a
    LOWER bound: the natural-gradient update, sstats scatter, and
    E[log beta] phases are omitted, so the reported utilisation is
    conservative."""
    import jax

    from pylda_tpu.models.vb import _gamma_init
    from pylda_tpu.ops.dirichlet import exp_dirichlet_expectation
    from pylda_tpu.ops.estep import estep_dense, estep_ragged_gamma

    cfg = eng._config
    t_save = eng._t
    try:
        batch_lists = eng._epoch_batches(0)[0]
    finally:
        eng._t = t_save
    st = eng.state
    eeb = exp_dirichlet_expectation(st.lam)
    key = jax.random.fold_in(st.key, 0x5F1)
    sweeps_by_shape: Dict[tuple, float] = {}
    total = 0.0
    for bl in batch_lists:
        for b in bl:
            shape = b.ids.shape if hasattr(b, "ids") else b.counts.shape
            if shape not in sweeps_by_shape:
                g0 = _gamma_init(
                    key, (shape[0], cfg.number_of_topics), st.lam.dtype,
                    cfg.gamma_init,
                )
                if hasattr(b, "ids"):
                    _, s = estep_ragged_gamma(
                        b.ids, b.cnts, g0, eeb, st.alpha,
                        inner_iterations=cfg.inner_iterations,
                        convergence_threshold=cfg.convergence_threshold,
                        eps=cfg.eps, compute_dtype=cfg.compute_dtype,
                        stall_patience=cfg.estep_stall_patience,
                    )
                else:
                    _, _, _, s = estep_dense(
                        b.counts, g0, eeb, st.alpha,
                        inner_iterations=cfg.inner_iterations,
                        convergence_threshold=cfg.convergence_threshold,
                        eps=cfg.eps, compute_dtype=cfg.compute_dtype,
                        stall_patience=cfg.estep_stall_patience,
                    )
                sweeps_by_shape[shape] = float(s)
            total += _batch_sweep_bound_ms(b, cfg, peaks) * sweeps_by_shape[
                shape
            ]
    return total


def suite_mfu(eng, measured_seconds: float) -> float:
    """Roofline utilisation of one measured training unit (a full-corpus
    pass for vb/gibbs/hybrid, one epoch for SVI) — the per-row ``mfu``
    bench_suite.py reports for every BASELINE config (SURVEY.md
    section 5 occupancy; round-3 verdict item 4).

    Engine-specific accounting:
      - vb / hybrid: ``pass_bound_ms`` (sweep bound x measured converged
        counts + sstats + E[log beta]; hybrid's sequence layout runs the
        fixed burn_in + num_samples sweeps).
      - gibbs: ONE sweep per ``learning()`` over the sequence buckets
        (the n_kv rebuild and bookkeeping are omitted — a LOWER bound).
      - svi: ``_svi_epoch_bound_ms`` (sweeps-only, conservative).
    """
    peaks = ChipPeaks()
    cfg = eng._config
    mode = cfg.inference_mode
    if mode == "svi":
        bound = _svi_epoch_bound_ms(eng, peaks)
    elif mode == "gibbs":
        bound = sum(
            _batch_sweep_bound_ms(b, cfg, peaks) for b in eng._buckets
        )
    else:
        bound = pass_bound_ms(eng, peaks)
    return round(utilisation(measured_seconds * 1e3, bound), 6)


def roofline_report(engine, repeats: int = 3) -> dict:
    """Measured per-phase times next to their roofline bounds + a
    utilisation fraction per phase (SURVEY.md section 5 occupancy
    reporting; the ``--roofline`` CLI surface logs this).

    Phases are matched by construction: the sweeps-only row against the
    sweep bound x measured converged sweep counts, the hybrid full
    E-step (when planned) against sweeps + sstats, and the total
    iteration against the full pass bound."""
    peaks = ChipPeaks()
    timings = engine.phase_timings(repeats=repeats)
    model = estep_cost_model(engine, peaks)
    cfg = engine._config
    sweeps = measured_sweep_counts(engine)
    sweep_bound = sum(
        _batch_sweep_bound_ms(b, cfg, peaks) * s
        for b, s in zip(engine._batches, sweeps)
    )

    rows = {}

    def row(name, measured, bound):
        rows[name] = {
            "measured_ms": round(measured, 3),
            "bound_ms": round(bound, 3),
            "utilisation": round(utilisation(measured, bound), 4),
        }

    if "estep_sweeps_only_ms" in timings:
        row("sweeps", timings["estep_sweeps_only_ms"], sweep_bound)
    if "estep_hybrid_full_ms" in timings and "sstats" in model:
        row(
            "estep_full",
            timings["estep_hybrid_full_ms"],
            sweep_bound + model["sstats"]["bound_ms"],
        )
    if "estep_total_ms" in timings:
        row(
            "iteration",
            timings["estep_total_ms"] + timings.get("mstep_ms", 0.0),
            pass_bound_ms(engine, peaks),
        )
    rows["sweep_counts"] = sweeps
    return rows
