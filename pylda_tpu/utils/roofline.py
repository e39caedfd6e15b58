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

    out: Dict[str, dict] = {}
    batches = getattr(engine, "_batches", None) or []
    slots = 0
    dense_dv = 0
    for b in batches:
        if hasattr(b, "ids"):
            slots += b.ids.shape[0] * b.ids.shape[1]
        else:
            dense_dv += b.counts.shape[0] * b.counts.shape[1]

    # -- sweeps ------------------------------------------------------------
    if slots:
        flops = 2 * 2 * slots * K  # two dtk contractions per sweep
        itemsize = 2 if cdt == "bfloat16" else 4
        bytes_ = 2 * slots * K * itemsize  # B re-read by both einsums
    else:
        flops = 2 * 2 * dense_dv * K
        bytes_ = 2 * dense_dv * (2 if cdt == "bfloat16" else 4)
    out["sweeps_per_sweep"] = {
        "flops": flops,
        "hbm_bytes": bytes_,
        "bound_ms": max(flops / fpk, bytes_ / peaks.hbm_bytes) * 1e3,
        "bound": "mxu" if flops / fpk > bytes_ / peaks.hbm_bytes
        else "hbm",
    }

    # -- sstats ------------------------------------------------------------
    plan = getattr(engine, "_sstats_plan", None)
    V = getattr(engine, "_vocab", None)
    V = len(V) if V else 0
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
