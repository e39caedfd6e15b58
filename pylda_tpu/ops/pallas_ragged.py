"""Pallas TPU kernel: fused RAGGED-layout gamma fixed point.

The XLA ragged path (``ops/estep.estep_ragged_gamma``) re-reads the
gathered token block B = exp(E[log beta]).T[ids] ([D, T, K], the largest
array in the E-step) from HBM TWICE per fixed-point sweep — once for the
phinorm contraction and once for the gamma update.  At the flagship
shape (D=4096, K=100, V=10k, ~50 sweeps) that is ~100 passes over B and
the sweep phase is bandwidth/glue-bound at ~0.15 ms/sweep
(BENCH_SUITE.md per-phase table).

This kernel keeps one DOC-TILE of B, the tile's counts, and the tile's
gamma resident in VMEM across ALL sweeps, so HBM reads B exactly once
per E-step — the bandwidth speed-of-light for the ragged formulation
(pallas_guide.md "Memory Hierarchy"; BASELINE.json:5 "fused
digamma/exp-normalize E-step kernels").  The per-sweep contractions are
VPU reductions in the 3D [tile_d, T, K] layout (K on lanes, T on
sublanes), so no transposes or MXU-starving batched matvecs are emitted:

    phinorm[d,t]   = sum_k  B[d,t,k] * expEtheta[d,k]     (lane reduce)
    acc[d,k]       = sum_t  B[d,t,k] * (cnt/phinorm)[d,t] (sublane reduce)
    gamma'[d,k]    = alpha[k] + expEtheta[d,k] * acc[d,k]

Only the GAMMA fixed point lives here, mirroring ``estep_ragged_gamma``:
the production hybrid path (models/vb.py) computes sufficient statistics
and the token score from the converged per-document gamma against
corpus-static dense counts chunks (``estep_dense_sstats``), which is
already two large MXU matmuls with zero scatter.

Same conventions as the dense kernel (ops/pallas_estep.py): topic axis
padded to the 128-lane boundary with padded slots masked out of the
digamma normaliser and pinned at gamma = 1; per-tile convergence via a
``lax.while_loop`` on the tile's worst document mean |dgamma| (the
reference's per-document early exit, applied per tile); in-kernel
digamma via the validated 6-term asymptotic series (digamma_approx).

Padded TOKEN slots carry count 0 (and id 0, so their B rows hold real
topic values): they contribute ratio = 0/phinorm = 0 to the gamma
update, exactly as in the XLA path.  Padded DOC rows carry all-zero
counts and converge to gamma = alpha in one sweep.
"""

from __future__ import annotations

import functools
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from pylda_tpu.ops.pallas_estep import _exp_dirichlet_expectation_rows
from pylda_tpu.utils import round_up as _round_up


def _ragged_tile_kernel(
    b_ref,  # [tile_d, Tp, Kp] VMEM, storage dtype (gathered eeb.T[ids])
    cnts_ref,  # [tile_d, Tp] VMEM f32
    alpha_ref,  # [1, Kp] VMEM f32
    gamma0_ref,  # [tile_d, Kp] VMEM f32
    gamma_ref,  # out [tile_d, Kp] VMEM f32
    sweeps_ref,  # out [1, 1] SMEM i32 (max over tiles)
    *,
    inner_iterations: int,
    convergence_threshold: float,
    eps: float,
    real_k: int,
    tile_t: int,
):
    alpha = alpha_ref[0, :]
    K = alpha.shape[0]
    Tp = b_ref.shape[1]
    n_tc = Tp // tile_t
    kmask = (
        jax.lax.broadcasted_iota(jnp.int32, (1, K), 1) < real_k
    ).astype(jnp.float32)

    # Hoisted once per tile and reused by every sweep: the 2D->3D
    # relayout of the counts (token slots move lanes -> sublanes) costs
    # real VPU shuffles, and doing it per sweep measured 1.7x slower
    # than amortising it here (20.8 vs 12.3 ms at D=3328/T=128).  The
    # price is VMEM: Mosaic lane-pads the trailing unit axis, so this
    # buffer costs tile_d*Tp*128*4 bytes — charged in _vmem_need.
    cnts3 = cnts_ref[:][:, :, None]

    def sweep(gamma):
        """One fixed-point sweep, chunked over static token-slot tiles
        so the f32 temporaries stay [tile_d, tile_t, Kp] regardless of
        the bucket width (same trick as the dense kernel's vocab tiles
        — the temp footprint, not B, is what limits the doc tile).
        Everything stays in the 3D lanes=Kp layout: the keepdims sum
        broadcasts back along lanes for free."""
        exp_etheta = _exp_dirichlet_expectation_rows(gamma, kmask)
        et3 = exp_etheta[:, None, :]
        acc = jnp.zeros_like(gamma)
        for j in range(n_tc):
            sl = slice(j * tile_t, (j + 1) * tile_t)
            Bc = b_ref[:, sl, :].astype(jnp.float32)
            phinorm = (Bc * et3).sum(axis=-1, keepdims=True) + eps
            ratio = cnts3[:, sl, :] / phinorm  # [tile_d, tile_t, 1]
            acc = acc + (Bc * ratio).sum(axis=1)
        return alpha[None, :] + exp_etheta * acc

    if convergence_threshold > 0.0:

        def cond(carry):
            i, _gamma, maxchange = carry
            return jnp.logical_and(
                i < inner_iterations, maxchange > convergence_threshold
            )

        def body(carry):
            i, gamma, _ = carry
            gamma_new = sweep(gamma)
            maxchange = (
                jnp.abs(gamma_new - gamma).sum(axis=-1) / real_k
            ).max()
            return i + 1, gamma_new, maxchange

        sweeps, gamma, _ = jax.lax.while_loop(
            cond, body, (jnp.int32(0), gamma0_ref[:], jnp.float32(jnp.inf))
        )
    else:
        gamma = jax.lax.fori_loop(
            0, inner_iterations, lambda _i, g: sweep(g), gamma0_ref[:]
        )
        sweeps = jnp.int32(inner_iterations)

    @pl.when(pl.program_id(0) == 0)
    def _():
        sweeps_ref[0, 0] = 0

    gamma_ref[:] = gamma
    sweeps_ref[0, 0] = jnp.maximum(sweeps_ref[0, 0], sweeps)


_RAGGED_VMEM_BUDGET = 13 * 1024 * 1024  # Mosaic staging headroom vs 16M


def _vmem_need(tile_d: int, Tp: int, Kp: int, itemsize: int,
               tile_t: int = 0) -> int:
    """Bytes of VMEM: double-buffered B tile (storage dtype) + three
    f32 [tile_d, tile_t, Kp]-sized sweep temporaries (the B-chunk
    upcast, the product, and staging) + the hoisted counts-broadcast
    buffer (trailing unit axis lane-padded to 128 by Mosaic — a
    [tile_d, Tp, 128] f32 allocation; this is what blew the 16 MB
    scoped-vmem limit on the first in-engine compile) + gamma working
    set."""
    tile_t = tile_t or Tp
    return (
        2 * tile_d * Tp * Kp * itemsize  # B tile, pipelined x2
        + 3 * tile_d * tile_t * Kp * 4  # f32 sweep temporaries
        + tile_d * Tp * 128 * 4  # cnts3, lane-padded unit axis
        + 8 * tile_d * Kp * 4  # gamma/expEtheta/acc + buffers
    )


def plan_pallas_ragged(
    num_rows: int,
    num_slots: int,
    num_topics: int,
    compute_dtype: str = "float32",
) -> Optional[Tuple[int, int, str]]:
    """Pick (tile_d, tile_t, storage_dtype) or None when even the
    smallest tile cannot fit VMEM.

    Preference order is MEASURED, not theoretical
    (scripts/bench_pallas_ragged.py on v5e, D=3328/T=128/K=100, 50
    sweeps): full-width token chunks beat doc-tile size — f32
    (tile_d=32, tile_t=Tp) 12.28 ms vs bf16 (128, 16) 13.8 ms and f32
    (64, 32) 13.1 ms — because every chunk boundary re-stages the
    expEtheta broadcast and the accumulator.  So: largest tile_t first,
    f32 before bf16 (the per-use upcast costs more than the halved
    residency buys), tile_d as the remaining degree of freedom."""
    Kp = _round_up(num_topics, 128)
    sub = 16 if compute_dtype == "bfloat16" else 8
    Tp = _round_up(num_slots, sub)
    order = ["float32", "bfloat16"]
    if compute_dtype == "bfloat16":
        order = ["bfloat16"]
    t_chunks = [Tp] + [t for t in (256, 128, 64, 32, 16) if t < Tp]
    for tile_t in t_chunks:
        if Tp % tile_t:
            continue
        for dtype in order:
            itemsize = 2 if dtype == "bfloat16" else 4
            for tile_d in (128, 64, 32, 16, 8):
                if tile_d > _round_up(num_rows, 8):
                    continue
                if _vmem_need(tile_d, Tp, Kp, itemsize, tile_t) \
                        < _RAGGED_VMEM_BUDGET:
                    return tile_d, tile_t, dtype
    return None


def pallas_ragged_supported(
    num_rows: int, num_slots: int, num_topics: int,
    compute_dtype: str = "float32",
) -> bool:
    return plan_pallas_ragged(
        num_rows, num_slots, num_topics, compute_dtype
    ) is not None


@functools.partial(
    jax.jit,
    static_argnames=(
        "inner_iterations", "convergence_threshold", "eps", "tile_d",
        "tile_t", "storage_dtype", "interpret",
    ),
)
def pallas_estep_ragged_gamma(
    ids: jnp.ndarray,  # [D, T] int32 (0 on padded slots)
    cnts: jnp.ndarray,  # [D, T] float (0 on padded slots)
    gamma0: jnp.ndarray,  # [D, K] float32 initial gamma
    exp_elog_beta: jnp.ndarray,  # [K, V] float32
    alpha: jnp.ndarray,  # [K]
    inner_iterations: int = 50,
    convergence_threshold: float = 1e-5,
    eps: float = 1e-30,
    tile_d: int = 0,
    tile_t: int = 0,
    storage_dtype: str = "",
    interpret: bool = False,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Drop-in for ``estep_ragged_gamma``: returns (gamma [D, K],
    sweeps_used scalar).  The B gather itself stays in XLA (Mosaic has
    no efficient HBM gather; see ops/pallas_estep.py module docstring) —
    the kernel's win is reading the gathered block once instead of
    2 x sweeps times."""
    D, T = ids.shape
    K = exp_elog_beta.shape[0]
    if tile_d <= 0 or tile_t <= 0 or not storage_dtype:
        plan = plan_pallas_ragged(D, T, K)
        assert plan is not None, (
            "VMEM working set too large; use estep_ragged_gamma"
        )
        tile_d = tile_d if tile_d > 0 else plan[0]
        tile_t = tile_t if tile_t > 0 else plan[1]
        storage_dtype = storage_dtype or plan[2]
    sdt = jnp.bfloat16 if storage_dtype == "bfloat16" else jnp.float32
    Kp = _round_up(K, 128)
    sub = 16 if storage_dtype == "bfloat16" else 8
    Tp = _round_up(T, sub)
    if Tp % tile_t:  # manual tile_t that does not divide the padded T
        Tp = _round_up(Tp, tile_t)
    Dp = _round_up(D, tile_d)

    # Pad/cast the SMALL [K, V] topic matrix BEFORE the gather, so the
    # gather emits the kernel-shaped [*, *, Kp] storage-dtype block
    # directly — padding B afterwards would copy the largest array in
    # the E-step (observed ~0.25 ms/bucket/iteration at the flagship
    # shape) once per outer iteration.
    eeb_p = exp_elog_beta
    if Kp != K:
        eeb_p = jnp.pad(eeb_p, ((0, Kp - K), (0, 0)))
        alpha = jnp.pad(alpha, (0, Kp - K), constant_values=1.0)
        gamma0 = jnp.pad(gamma0, ((0, 0), (0, Kp - K)), constant_values=1.0)
    if Tp != T:
        # Padded slots gather id 0 with count 0 — inert, as in-bucket pads.
        ids = jnp.pad(ids, ((0, 0), (0, Tp - T)))
        cnts = jnp.pad(cnts, ((0, 0), (0, Tp - T)))
    if Dp != D:
        ids = jnp.pad(ids, ((0, Dp - D), (0, 0)))
        cnts = jnp.pad(cnts, ((0, Dp - D), (0, 0)))
        gamma0 = jnp.pad(gamma0, ((0, Dp - D), (0, 0)), constant_values=1.0)
    B = eeb_p.T.astype(sdt)[ids]  # [Dp, Tp, Kp] — the XLA gather

    kernel = functools.partial(
        _ragged_tile_kernel,
        inner_iterations=inner_iterations,
        convergence_threshold=convergence_threshold,
        eps=eps,
        real_k=K,
        tile_t=min(tile_t, Tp),
    )
    gamma, sweeps = pl.pallas_call(
        kernel,
        grid=(Dp // tile_d,),
        in_specs=[
            pl.BlockSpec(
                (tile_d, Tp, Kp), lambda i: (i, 0, 0),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(
                (tile_d, Tp), lambda i: (i, 0), memory_space=pltpu.VMEM
            ),
            pl.BlockSpec((1, Kp), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec(
                (tile_d, Kp), lambda i: (i, 0), memory_space=pltpu.VMEM
            ),
        ],
        out_specs=[
            pl.BlockSpec(
                (tile_d, Kp), lambda i: (i, 0), memory_space=pltpu.VMEM
            ),
            pl.BlockSpec((1, 1), lambda i: (0, 0), memory_space=pltpu.SMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((Dp, Kp), jnp.float32),
            jax.ShapeDtypeStruct((1, 1), jnp.int32),
        ],
        interpret=interpret,
    )(
        B,
        cnts.astype(jnp.float32),
        alpha.reshape(1, Kp).astype(jnp.float32),
        gamma0.astype(jnp.float32),
    )
    return gamma[:D, :K], sweeps[0, 0]
