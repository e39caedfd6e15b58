"""Batched variational E-step kernels (JAX/XLA).

This replaces the reference's ~95%-of-runtime hot loop — a per-document
Python loop around a ~50-iteration digamma fixed point
(upstream:variational_bayes.py e_step [UNVERIFIED], SURVEY.md section 3.1)
— with the exp-domain formulation of SURVEY.md section 7.1 in which phi is
never materialised and each fixed-point sweep is two MXU matmuls (dense
layout) or two batched contractions against a gathered [D, T, K] block
(ragged layout).

Convergence: the reference early-exits each document at
mean|dgamma| < 1e-6.  Data-dependent per-document exits don't map to XLA's
static traces, so we run a ``lax.while_loop`` over whole-batch sweeps in
which each row FREEZES once below threshold (the reference's own
per-document break) and the loop stops when every row is frozen or
currently stalled at the bf16 noise floor (see ``_exit_update``), or at
``inner_iterations``.  Parity is judged on perplexity, not iteration
counts (SURVEY.md section 7.3).

Returns per batch: (gamma, sstats, token_score, sweeps_used) where
``token_score = sum_dv c_dv log phinorm_dv`` is the
E[log p(w|theta,beta)] - E[log q(z)] part of the bound at the optimal phi.
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp

from pylda_tpu.ops.dirichlet import (
    exp_dirichlet_expectation,
    exp_dirichlet_expectation_fast,
)


def _exit_update(change, best, age, done, threshold, use_stall, patience):
    """Shared per-row exit bookkeeping for the fixed-point loops.

    Returns (best, age, done, exitable) where:

    - ``done`` (sticky) marks rows whose mean|dgamma| has fallen below
      the threshold — the reference's own per-document break
      (SURVEY.md section 3.1).  Done rows FREEZE their gamma in the
      callers: at the fixed point further sweeps are numerically
      no-ops, and freezing makes each row's output independent of WHEN
      the other rows exit — an exit-timing flip in one knife-edge row
      (e.g. ulp reordering under vocab sharding) perturbs only that
      row by at most one threshold-sized step instead of changing
      every row's total sweep count (round-4 verdict item 4).
    - ``exitable`` additionally includes CURRENTLY-stalled rows (no 1%
      improvement of their best change for ``patience`` consecutive
      sweeps — the bf16 limit-cycle noise floor).  Stalling is
      deliberately NOT sticky and does NOT freeze: a row on a
      legitimate mid-descent plateau resumes counting as active the
      moment it improves again, and keeps updating while other rows
      hold the loop open (a sticky stall-freeze variant measured a 2%
      ELBO regression vs the f64 oracle by truncating exactly those
      plateau rows).  The loop exits when every row is exitable.

    ``threshold == 0`` disables freezing entirely (pure
    run-to-the-cap semantics — the pinned-sweep parity tests rely on
    bitwise-identical full-cap trajectories)."""
    improved = change < 0.99 * best
    age_new = jnp.where(improved, 0, age + 1)
    best_new = jnp.minimum(best, change)
    done_new = done
    if threshold > 0.0:
        done_new = jnp.logical_or(done_new, best_new <= threshold)
    exitable = done_new
    if use_stall:
        exitable = jnp.logical_or(exitable, age_new >= patience)
    return best_new, age_new, done_new, exitable


@functools.partial(
    jax.jit,
    static_argnames=(
        "inner_iterations", "convergence_threshold", "eps", "compute_dtype",
        "stall_patience",
    ),
)
def estep_dense(
    counts: jnp.ndarray,  # [D, V] float
    gamma_init: jnp.ndarray,  # [D, K]
    exp_elog_beta: jnp.ndarray,  # [K, V]
    alpha: jnp.ndarray,  # [K]
    inner_iterations: int = 50,
    convergence_threshold: float = 1e-5,
    eps: float = 1e-30,
    compute_dtype: str = "float32",
    stall_patience: int = 0,
) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Dense doc-term E-step: pure matmuls on the MXU.

    ``compute_dtype="bfloat16"`` is the mixed-precision mode the MXU
    prefers: contraction INPUTS are cast to bf16 with f32 accumulation
    (preferred_element_type), while gamma, phinorm, and all state stay
    f32 — halves matmul input bandwidth without touching accumulator
    precision."""
    acc = jnp.promote_types(gamma_init.dtype, jnp.float32)
    cdt = jnp.bfloat16 if compute_dtype == "bfloat16" else acc
    eeb_c = exp_elog_beta.astype(cdt)

    def sweep(gamma, exp_etheta):
        phinorm = (
            jnp.matmul(
                exp_etheta.astype(cdt), eeb_c, preferred_element_type=acc
            )
            + eps
        )  # [D, V] f32
        ratio = counts / phinorm
        gamma_new = alpha[None, :] + exp_etheta * jnp.matmul(
            ratio.astype(cdt), eeb_c.T, preferred_element_type=acc
        )
        return gamma_new

    use_stall = stall_patience > 0 and convergence_threshold > 0.0
    freeze = convergence_threshold > 0.0

    def cond(carry):
        i, _gamma, _exp_etheta, _best, _age, _done, exitable = carry
        return jnp.logical_and(
            i < inner_iterations, jnp.logical_not(exitable.all())
        )

    def body(carry):
        i, gamma, exp_etheta, best, age, done, _exitable = carry
        gamma_prop = sweep(gamma, exp_etheta)
        gamma_new = (
            jnp.where(done[:, None], gamma, gamma_prop)
            if freeze else gamma_prop
        )
        change = jnp.abs(gamma_new - gamma).mean(axis=-1)
        best, age, done, exitable = _exit_update(
            change, best, age, done, convergence_threshold, use_stall,
            stall_patience,
        )
        return (
            i + 1, gamma_new,
            exp_dirichlet_expectation_fast(gamma_new), best, age, done,
            exitable,
        )

    exp_etheta0 = exp_dirichlet_expectation(gamma_init)
    rows = gamma_init.shape[0]
    i, gamma, _, _, _, _, _ = jax.lax.while_loop(
        cond, body, (
            jnp.int32(0), gamma_init, exp_etheta0,
            jnp.full((rows,), jnp.inf, dtype=gamma_init.dtype),
            jnp.zeros((rows,), dtype=jnp.int32),
            jnp.zeros((rows,), dtype=jnp.bool_),
            jnp.zeros((rows,), dtype=jnp.bool_),
        )
    )
    # Exported statistics use the EXACT Dirichlet expectation at the
    # converged gamma (once per call; the fast form is loop-only).
    exp_etheta = exp_dirichlet_expectation(gamma)

    phinorm = (
        jnp.matmul(exp_etheta.astype(cdt), eeb_c, preferred_element_type=acc)
        + eps
    )
    ratio = counts / phinorm
    # sstats[k, v] = sum_d c_dv phi_dvk = expElogbeta_kv * sum_d
    # expEtheta_dk ratio_dv  — the scatter-free matmul form (SURVEY.md 7.1).
    sstats = exp_elog_beta * jnp.matmul(
        exp_etheta.T.astype(cdt), ratio.astype(cdt), preferred_element_type=acc
    )
    token_score = (counts * jnp.log(phinorm)).sum()
    return gamma, sstats, token_score, i


# Single-pass-over-B sweeps for the kdt (small-K) layout: the gamma
# update is elementwise-independent in t, so phinorm and the update can
# be computed blockwise over T with each B block read ONCE per sweep
# instead of twice — the kdt sweep is HBM-bound streaming the bf16
# factor block (config-2 trace: the phinorm fusion alone ran at ~90% of
# HBM bandwidth).  0 disables; T must divide evenly or the plain
# two-pass form runs.  Standalone microbench: 0.86 -> 0.46 ms/sweep at
# the config-2 bucket shape (TB=400); gate kept measurable in-engine
# via scripts.  Only ever active on accelerators (CPU keeps dtk).
SWEEP_T_BLOCK = 400
# Extend blocking to the dtk layout (K >= 64).  Default OFF and
# MEASURED off: at a long-doc K=100 shape (D=1536, mean len 900) the
# blocked dtk sweep is 3.2x SLOWER (103.5k -> 32.7k docs/s) — dtk's B
# block is VMEM-resident across both contractions and the per-block
# scan destroys that residency.  The knob exists so the A/B stays
# reproducible on other toolchains.
SWEEP_T_BLOCK_DTK = False


def _pick_t_block(T: int, target: int = 0) -> int:
    """Divisor of T closest to the block target within [0.6x, 1.5x] of
    it (0 = no blocking: T too small or no divisor in band).  The band
    is measured: at the config-2 bucket shapes TB=400 wins (+17%
    in-engine), TB=200 is neutral and TB=160 loses (scan-step overhead
    dominates thin blocks), so only near-target divisors are used.
    Per-bucket planner widths are 16-aligned (800 -> 400, 832 -> 416,
    880 -> 440)."""
    target = target or SWEEP_T_BLOCK
    if target <= 0 or T <= target:
        return 0
    lo, hi = int(0.6 * target), int(1.5 * target)
    best = 0
    for tb in range(lo, min(hi, T - 1) + 1):
        if T % tb == 0 and (
            best == 0 or abs(tb - target) < abs(best - target)
        ):
            best = tb
    return best


def _factor_layout(num_topics: int) -> str:
    """Per-slot factor block layout for the ragged sweeps.

    "dtk" ([D, T, K], K on the 128-lane axis) is the default: XLA
    lowers both contractions as dots and keeps B VMEM-resident.  Below
    K=64, XLA instead lowers the K-contraction as multiply+reduce
    fusions AND the lane padding wastes >= 2x of every vector op — the
    measured cliff: at K=50 the "kdt" layout ([K, D, T], T on lanes) is
    2.0x faster at T~128 and 2.67x at T~800, while at K=64/96/100/200
    it is 3-5x SLOWER (measured grid in BENCH_SUITE round 4).  CPU
    keeps "dtk" (no lane tiling; preserves bitwise parity with the
    oracle pathways)."""
    if num_topics < 64 and jax.default_backend() != "cpu":
        return "kdt"
    return "dtk"


def _gather_factor(exp_elog_beta, ids, layout: str, dtype):
    if layout == "kdt":
        return exp_elog_beta[:, ids].astype(dtype)  # [K, D, T]
    return exp_elog_beta.T[ids].astype(dtype)  # [D, T, K]


_EINSUMS = {
    "dtk": ("dk,dtk->dt", "dt,dtk->dk"),
    "kdt": ("dk,kdt->dt", "dt,kdt->dk"),
}


def _b_storage_dtype(acc_dtype, cdt):
    """Storage dtype for the gathered per-slot factor block B.

    On accelerator backends B is stored bf16 explicitly: at K >= ~100
    XLA lowers the sweep contractions as dots and its bf16 propagation
    already demotes B (keeping it VMEM-resident), but at small K (e.g.
    the NIPS config's K=50) it lowers them as multiply+reduce FUSIONS,
    which the demotion pass skips — B then sits in HBM as f32 and every
    sweep streams it (measured 85 ms/pass vs a ~2 ms bound at
    D=1536/T~800/K=50: the whole E-step was HBM-bound on a block that
    fits VMEM in bf16).  The convert back to f32 fuses into the
    contraction.  CPU keeps the nominal dtype (no bf16 units; also
    preserves bitwise parity with the f64 oracle pathways), as does
    every non-f32 accumulator (the x64 oracle-parity path)."""
    if acc_dtype == jnp.float32 and jax.default_backend() != "cpu":
        return jnp.bfloat16
    return cdt


def _ragged_sweep_loop(
    ids, cnts, gamma_init, exp_elog_beta, alpha,
    inner_iterations, convergence_threshold, eps, cdt, acc_dtype,
    stall_patience=0,
    layout=None,
):
    """Batched gamma fixed point over one (ids, cnts) block.

    Exit criterion: a row is DONE when its mean|dgamma| falls below the
    threshold — the reference's own per-document test — OR when it has
    gone ``stall_patience`` consecutive sweeps without improving its
    best change by at least 1% ("stalled").  Done rows freeze their
    gamma (``_exit_update``); the loop exits when every row is done (or
    at the ``inner_iterations`` cap).  The 1%/sweep bar deliberately
    only catches near-ZERO progress (the bf16 noise floor, where change
    oscillates around a constant): genuinely slow fixed points
    (2-5%/sweep plateaus, common at small K) keep their full sweep
    budget — a 5% bar measured a 2.2% ELBO regression vs the f64
    oracle on exactly those.

    Why stall detection exists (measured on v5e at the flagship shape):
    XLA demotes these VPU batched-matvec contractions to bf16 operands
    (and keeps the gathered B block VMEM-resident in bf16 — forcing f32
    storage measured 18.6 vs 6.3 ms/pass because B spills to HBM).
    Under the bf16-rounded map, ~40% of rows limit-cycle at mean|dgamma|
    ~3e-3 once lambda sharpens, so a 1e-5 threshold alone NEVER fires
    at steady state and every row pays the full 50-sweep cap — while
    p50 of rows reaches its floor by sweep ~11.  A stalled row is at
    the bf16-map noise floor: more sweeps do not move it (this is the
    accuracy every round shipped, passing all parity gates).  Damped
    averaging (g <- (g+F(g))/2 on oscillating rows) and a two-phase
    f32-polish compaction were both built and measured slower or
    non-convergent; stall-exit keeps the fast bf16 sweeps and simply
    stops paying for no-op cycles.

    ``stall_patience=0`` disables stall detection (pure threshold/cap
    semantics — also forced when convergence_threshold == 0, which the
    pinned-sweep parity tests rely on)."""
    # bf16 B storage on accelerators (see _b_storage_dtype: at small K
    # the contraction lowers to multiply+reduce fusions that XLA's own
    # bf16 demotion skips, leaving an HBM-streamed f32 B), and a
    # K-dependent layout (see _factor_layout).
    if layout is None:
        layout = _factor_layout(gamma_init.shape[1])
    B = _gather_factor(
        exp_elog_beta, ids, layout, _b_storage_dtype(acc_dtype, cdt)
    )
    e_phinorm, e_update = _EINSUMS[layout]
    use_stall = stall_patience > 0 and convergence_threshold > 0.0
    freeze = convergence_threshold > 0.0

    def cond(carry):
        i, _gamma, _exp_etheta, _best, _age, _done, exitable = carry
        return jnp.logical_and(
            i < inner_iterations, jnp.logical_not(exitable.all())
        )

    T = ids.shape[1]
    tb = (
        _pick_t_block(T)
        if (layout == "kdt" or SWEEP_T_BLOCK_DTK) else 0
    )
    blocked = tb > 0
    if blocked:
        nb = T // tb
        K = gamma_init.shape[1]
        rows_ = gamma_init.shape[0]
        if layout == "kdt":
            # [nb, K, D, TB] blocks of the kdt factor + matching counts.
            B_blk = B.reshape(K, rows_, nb, tb).transpose(2, 0, 1, 3)
        else:  # dtk: [nb, D, TB, K]
            B_blk = B.reshape(rows_, nb, tb, -1).transpose(1, 0, 2, 3)
        c_blk = cnts.reshape(rows_, nb, tb).transpose(1, 0, 2)

    def _sweep_update(exp_etheta):
        """One fixed-point contraction pair; returns the gamma update
        term (sum_t ratio * B)."""
        if blocked:
            etc = exp_etheta.astype(cdt)

            def blk(acc, xs):
                Bx, cx = xs
                phinorm = (
                    jnp.einsum(
                        e_phinorm, etc, Bx,
                        preferred_element_type=acc_dtype,
                    )
                    + eps
                )
                return acc + jnp.einsum(
                    e_update, (cx / phinorm).astype(cdt), Bx,
                    preferred_element_type=acc_dtype,
                ), None

            upd, _ = jax.lax.scan(
                blk, jnp.zeros_like(exp_etheta), (B_blk, c_blk)
            )
            return upd
        phinorm = (
            jnp.einsum(
                e_phinorm, exp_etheta.astype(cdt), B,
                preferred_element_type=acc_dtype,
            )
            + eps
        )
        return jnp.einsum(
            e_update, (cnts / phinorm).astype(cdt), B,
            preferred_element_type=acc_dtype,
        )

    def body(carry):
        i, gamma, exp_etheta, best, age, done, _exitable = carry
        gamma_prop = alpha[None, :] + exp_etheta * _sweep_update(
            exp_etheta
        )
        gamma_new = (
            jnp.where(done[:, None], gamma, gamma_prop)
            if freeze else gamma_prop
        )
        change = jnp.abs(gamma_new - gamma).mean(axis=-1)
        best, age, done, exitable = _exit_update(
            change, best, age, done, convergence_threshold, use_stall,
            stall_patience,
        )
        return (
            i + 1, gamma_new,
            exp_dirichlet_expectation_fast(gamma_new), best, age, done,
            exitable,
        )

    # Exact expectation at the init (once per call): keeps this loop
    # trajectory identical to estep_ragged's for pinned sweep counts.
    exp_etheta0 = exp_dirichlet_expectation(gamma_init)
    rows = gamma_init.shape[0]
    best0 = jnp.full((rows,), jnp.inf, dtype=gamma_init.dtype)
    age0 = jnp.zeros((rows,), dtype=jnp.int32)
    done0 = jnp.zeros((rows,), dtype=jnp.bool_)
    i, gamma, _exp_etheta, _best, _age, _done, _ex = jax.lax.while_loop(
        cond, body, (jnp.int32(0), gamma_init, exp_etheta0, best0, age0,
                     done0, done0)
    )
    return i, gamma


@functools.partial(
    jax.jit,
    static_argnames=(
        "inner_iterations", "convergence_threshold", "eps", "compute_dtype",
        "stall_patience",
    ),
)
def estep_ragged_gamma(
    ids: jnp.ndarray,  # [D, T] int32 (0 on padded slots)
    cnts: jnp.ndarray,  # [D, T] float (0 on padded slots)
    gamma_init: jnp.ndarray,  # [D, K]
    exp_elog_beta: jnp.ndarray,  # [K, V]
    alpha: jnp.ndarray,  # [K]
    inner_iterations: int = 50,
    convergence_threshold: float = 1e-5,
    eps: float = 1e-30,
    compute_dtype: str = "float32",
    stall_patience: int = 0,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Ragged fixed point ONLY — returns (gamma, sweeps_used).

    The sufficient statistics / token score are intentionally absent:
    the hybrid sstats path (``estep_dense_sstats``) computes them from
    the converged per-document gamma against the corpus-static dense
    counts matrix as two MXU matmuls, which measures ~4x faster than the
    row segment-sum scatter on TPU (scripts/sstats_variants.py).
    ``stall_patience`` — see ``_ragged_sweep_loop``."""
    acc_dtype = jnp.promote_types(gamma_init.dtype, jnp.float32)
    cdt = jnp.bfloat16 if compute_dtype == "bfloat16" else acc_dtype
    i, gamma = _ragged_sweep_loop(
        ids, cnts, gamma_init, exp_elog_beta, alpha,
        inner_iterations, convergence_threshold, eps, cdt, acc_dtype,
        stall_patience=stall_patience,
    )
    return gamma, i



@functools.partial(
    jax.jit, static_argnames=("eps", "compute_dtype")
)
def estep_dense_sstats(
    counts: jnp.ndarray,  # [D, V] float (dense doc-term rows; 0 pads)
    exp_etheta: jnp.ndarray,  # [D, K] exp E[log theta] at converged gamma
    exp_elog_beta: jnp.ndarray,  # [K, V]
    eps: float = 1e-30,
    compute_dtype: str = "float32",
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Scatter-free sufficient statistics + token score from dense counts.

    sstats[k, v] = eeb[k, v] * sum_d expEtheta[d, k] * c[d, v] / phinorm[d, v]
    with phinorm = expEtheta @ eeb — two MXU matmuls and a fused
    elementwise divide; numerically the same reduction as the ragged
    segment-sum but with ZERO scatter (TPU scatters cost ~12 ns/row;
    the matmul form measured 1.1 ms vs 4.2-8.5 ms for every scatter
    variant at D=4k, V=10k, K=100).  The dense counts matrix is
    corpus-static, so it is materialised once and amortises over all
    passes.  Rows with all-zero counts (padding) contribute nothing.
    """
    acc_dtype = jnp.promote_types(exp_etheta.dtype, jnp.float32)
    cdt = jnp.bfloat16 if compute_dtype == "bfloat16" else acc_dtype
    V = exp_elog_beta.shape[1]
    Vc = counts.shape[1]
    # Counts may arrive vocab-PREPADDED (multiple of the Pallas tile
    # width, padded once at plan time — a per-pass pad of the bf16
    # counts block measured 0.11 ms on the flagship).  Padding columns
    # carry zero counts: inert in the token score, and their sstats
    # columns are sliced away below.
    eeb_w = (
        jnp.pad(exp_elog_beta, ((0, 0), (0, Vc - V))) if Vc > V
        else exp_elog_beta
    )
    et_c = exp_etheta.astype(cdt)
    eeb_c = eeb_w.astype(cdt)
    phinorm = (
        jnp.matmul(et_c, eeb_c, preferred_element_type=acc_dtype) + eps
    )  # [D, Vc]
    ratio = counts / phinorm
    sstats = exp_elog_beta * jax.lax.dot_general(
        et_c, ratio.astype(cdt),
        dimension_numbers=(((0,), (0,)), ((), ())),
        preferred_element_type=acc_dtype,
    )[:, :V]  # [K, V]
    token_score = (counts * jnp.log(phinorm)).sum()
    return sstats, token_score


@functools.partial(
    jax.jit,
    static_argnames=(
        "num_types", "inner_iterations", "convergence_threshold", "eps",
        "compute_dtype", "stall_patience",
    ),
)
def estep_ragged(
    ids: jnp.ndarray,  # [D, T] int32 (0 on padded slots)
    cnts: jnp.ndarray,  # [D, T] float (0 on padded slots)
    gamma_init: jnp.ndarray,  # [D, K]
    exp_elog_beta: jnp.ndarray,  # [K, V]
    alpha: jnp.ndarray,  # [K]
    num_types: int,
    inner_iterations: int = 50,
    convergence_threshold: float = 1e-5,
    eps: float = 1e-30,
    compute_dtype: str = "float32",
    stall_patience: int = 0,
) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Ragged (ids, counts) E-step for large vocabularies.

    Gathers the per-document topic-word block B = expElogbeta.T[ids]
    ([D, T, K]) once per call — lambda is fixed for the whole batch — then
    every fixed-point sweep is two batched contractions against B.
    Sufficient statistics scatter back via segment_sum over token ids.
    Padded token slots (count 0) are inert everywhere.

    ``compute_dtype="bfloat16"`` stores the gathered B block and the
    contraction inputs in bf16 (halving the dominant HBM traffic) with
    f32 accumulation; gamma and all returned statistics stay f32.
    """
    D, T = ids.shape
    K = gamma_init.shape[-1]
    acc_dtype = jnp.promote_types(gamma_init.dtype, jnp.float32)
    cdt = jnp.bfloat16 if compute_dtype == "bfloat16" else acc_dtype
    # bf16 storage on accelerators (_b_storage_dtype) + the K-gated
    # factor layout (_factor_layout — kdt below K=64 on accelerators).
    layout = _factor_layout(K)
    B = _gather_factor(
        exp_elog_beta, ids, layout, _b_storage_dtype(acc_dtype, cdt)
    )
    e_phinorm, e_update = _EINSUMS[layout]

    def phinorm_of(exp_etheta):
        return (
            jnp.einsum(
                e_phinorm, exp_etheta.astype(cdt), B,
                preferred_element_type=acc_dtype,
            )
            + eps
        )

    use_stall = stall_patience > 0 and convergence_threshold > 0.0
    freeze = convergence_threshold > 0.0

    def cond(carry):
        i, _gamma, _exp_etheta, _best, _age, _done, exitable = carry
        return jnp.logical_and(
            i < inner_iterations, jnp.logical_not(exitable.all())
        )

    def body(carry):
        i, gamma, exp_etheta, best, age, done, _exitable = carry
        phinorm = phinorm_of(exp_etheta)
        gamma_prop = alpha[None, :] + exp_etheta * jnp.einsum(
            e_update, (cnts / phinorm).astype(cdt), B,
            preferred_element_type=acc_dtype,
        )
        gamma_new = (
            jnp.where(done[:, None], gamma, gamma_prop)
            if freeze else gamma_prop
        )
        change = jnp.abs(gamma_new - gamma).mean(axis=-1)
        best, age, done, exitable = _exit_update(
            change, best, age, done, convergence_threshold, use_stall,
            stall_patience,
        )
        return (
            i + 1, gamma_new,
            exp_dirichlet_expectation_fast(gamma_new), best, age, done,
            exitable,
        )

    exp_etheta0 = exp_dirichlet_expectation(gamma_init)
    rows = gamma_init.shape[0]
    done0 = jnp.zeros((rows,), dtype=jnp.bool_)
    i, gamma, _, _, _, _, _ = jax.lax.while_loop(
        cond, body, (
            jnp.int32(0), gamma_init, exp_etheta0,
            jnp.full((rows,), jnp.inf, dtype=gamma_init.dtype),
            jnp.zeros((rows,), dtype=jnp.int32),
            done0, done0,
        )
    )
    # Exported statistics use the EXACT Dirichlet expectation at the
    # converged gamma (once per call; the fast form is loop-only).
    exp_etheta = exp_dirichlet_expectation(gamma)

    phinorm = phinorm_of(exp_etheta)
    ratio = cnts / phinorm  # [D, T]
    # sstats[k, v] = sum_{(d,t): ids=v} c phi
    #             = eeb[k, v] * sum_{(d,t): ids=v} expEtheta[d,k] ratio[d,t]
    # B[d, t, :] == eeb.T[ids[d, t], :] is CONSTANT within a segment, so
    # the eeb factor hoists out of the segment sum — the summand U is the
    # rank-1 outer product expEtheta x ratio, and B (the largest array in
    # the whole E-step) is never touched in the sstats phase.
    # Accumulated in f32 regardless of compute_dtype: segment sums add
    # across the whole batch.
    U = exp_etheta[:, None, :].astype(acc_dtype) * ratio[:, :, None]
    A = jax.ops.segment_sum(
        U.reshape(D * T, K), ids.reshape(-1), num_segments=num_types
    )  # [V, K]
    sstats = exp_elog_beta * A.T  # [K, V]
    token_score = (cnts * jnp.log(phinorm)).sum()
    return gamma, sstats, token_score, i
