"""Pallas TPU kernel: fused dense-batch VB E-step.

The XLA path (``pylda_tpu.ops.estep.estep_dense``) lowers each fixed-point
sweep to two MXU matmuls, but every sweep re-reads the [D, V] counts block
and the [K, V] topic matrix from HBM.  This kernel keeps one row-tile of
counts, the whole exp(E[log beta]) matrix, and the tile's gamma resident
in VMEM across ALL sweeps, so HBM sees the corpus exactly once per E-step
— the bandwidth speed-of-light for this op (pallas_guide.md "Memory
Hierarchy"; BASELINE.json:5 "fused digamma/exp-normalize E-step kernels").

Applicability gate (checked by ``pallas_estep_supported``): the [K, V]
topic block plus one [TILE_D, V] counts tile must fit the ~16 MB VMEM
budget — i.e. small-to-mid vocabularies (the dense layout's own domain).
Everything else falls back to the XLA path; both compute the same math
(property-tested against each other and the float64 oracle).

In-kernel digamma: jax.scipy.special.digamma does not lower inside Pallas
on all toolchains, so the kernel uses the standard 6-term asymptotic
series after argument-shifting into x >= 6 (float32 accurate to ~1e-7,
validated in tests/test_pallas_estep.py).  gamma > 0 always holds (gamma
= alpha + positive mass), and the shift loop is a fixed 6-step unroll.
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_VMEM_BUDGET = 14 * 1024 * 1024  # leave headroom under ~16 MB/core


from pylda_tpu.utils import round_up as _round_up


def digamma_approx(x):
    """psi(x) for x > 0: shift x into [6, inf) by the recurrence
    psi(x) = psi(x+1) - 1/x (6 unrolled steps), then the asymptotic
    series psi(x) ~ ln x - 1/2x - 1/12x^2 + 1/120x^4 - 1/252x^6."""
    acc = jnp.zeros_like(x)
    for _ in range(6):
        small = x < 6.0
        acc = acc - jnp.where(small, 1.0 / x, 0.0)
        x = jnp.where(small, x + 1.0, x)
    inv = 1.0 / x
    inv2 = inv * inv
    series = (
        jnp.log(x)
        - 0.5 * inv
        - inv2 * (1.0 / 12.0 - inv2 * (1.0 / 120.0 - inv2 / 252.0))
    )
    return series + acc


def _exp_dirichlet_expectation_rows(gamma, kmask):
    """exp(psi(gamma) - psi(sum_k gamma)) along the last axis, with
    lane-padded topic slots (kmask == 0) excluded from the normaliser and
    zeroed in the result (the topic axis is padded to the 128-lane
    boundary; see pallas_estep_dense)."""
    total = (gamma * kmask).sum(axis=-1, keepdims=True)
    return jnp.exp(digamma_approx(gamma) - digamma_approx(total)) * kmask


def _estep_tile_kernel(
    counts_ref,  # [TILE_D, V] VMEM
    eeb_ref,  # [K, V] VMEM (exp E[log beta], computed outside)
    alpha_ref,  # [1, K] VMEM
    gamma0_ref,  # [TILE_D, K] VMEM initial gamma
    gamma_ref,  # out [TILE_D, K] VMEM
    sstats_ref,  # out [K, V] VMEM (accumulated over grid)
    score_ref,  # out [1, 1] SMEM (accumulated over grid)
    *,
    inner_iterations: int,
    convergence_threshold: float,
    eps: float,
    real_k: int,
):
    counts = counts_ref[:]
    eeb = eeb_ref[:]
    alpha = alpha_ref[0, :]
    K = alpha.shape[0]
    kmask = (
        jax.lax.broadcasted_iota(jnp.int32, (1, K), 1) < real_k
    ).astype(jnp.float32)

    gamma0 = gamma0_ref[:]

    def sweep(gamma):
        exp_etheta = _exp_dirichlet_expectation_rows(gamma, kmask)
        phinorm = (
            jnp.dot(exp_etheta, eeb, preferred_element_type=jnp.float32)
            + eps
        )
        ratio = counts / phinorm
        # Contract over V without materialising eeb.T — an explicit
        # in-kernel transpose would run on the VPU every sweep.
        acc = jax.lax.dot_general(
            ratio, eeb,
            dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        gamma_new = alpha[None, :] + exp_etheta * acc
        return gamma_new

    # Fixed-count fori_loop: a data-dependent while_loop would serialise a
    # scalar cross-lane reduction into every sweep; at fixed count the
    # whole fixed point stays on the MXU/VPU pipeline.  Converged tiles
    # just iterate at their fixed point (the batch-convergence story of
    # ops/estep.py applies per tile).
    del convergence_threshold
    gamma = jax.lax.fori_loop(
        0, inner_iterations, lambda _i, g: sweep(g), gamma0
    )

    exp_etheta = _exp_dirichlet_expectation_rows(gamma, kmask)
    phinorm = (
        jnp.dot(exp_etheta, eeb, preferred_element_type=jnp.float32) + eps
    )
    ratio = counts / phinorm
    sstats_tile = eeb * jax.lax.dot_general(
        exp_etheta, ratio,
        dimension_numbers=(((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    score_tile = (counts * jnp.log(phinorm)).sum()

    gamma_ref[:] = gamma

    @pl.when(pl.program_id(0) == 0)
    def _():
        sstats_ref[:] = jnp.zeros_like(sstats_ref)
        score_ref[0, 0] = 0.0

    sstats_ref[:] += sstats_tile
    score_ref[0, 0] += score_tile


def _vmem_need(tile: int, K: int, V: int) -> int:
    # counts (double-buffered) + in-kernel [tile, V] temporaries
    # (phinorm, ratio, two matmul staging buffers) + eeb + sstats
    # accumulator + gamma work set.  Calibrated against Mosaic's
    # scoped-vmem accounting (17.6 MB reported at tile=512, K=128,
    # V=512 variants); staying well under the 16 MB limit matters —
    # borderline fits compile but thrash.
    return 4 * (2 * tile * V + 4 * tile * V + 2 * K * V + 8 * tile * K)


def pick_tile_d(num_docs: int, num_topics: int, num_types: int) -> int:
    """Largest row tile whose VMEM working set (double-buffered counts
    tile + topic matrix + sstats accumulator) fits the budget; 0 when
    even the smallest tile does not fit."""
    # The kernel pads the topic axis to the 128-lane boundary — budget
    # with the PADDED K or small-K shapes under-estimate the working set.
    K = _round_up(num_topics, 128)
    V = _round_up(num_types, 128)
    for tile in (512, 256, 128, 64, 32, 16, 8):
        if tile <= _round_up(num_docs, 8) and _vmem_need(tile, K, V) < _VMEM_BUDGET:
            return tile
    return 0


def pallas_estep_supported(
    num_docs: int, num_topics: int, num_types: int
) -> bool:
    return pick_tile_d(num_docs, num_topics, num_types) > 0


@functools.partial(
    jax.jit,
    static_argnames=(
        "inner_iterations", "convergence_threshold", "eps", "tile_d",
        "interpret",
    ),
)
def pallas_estep_dense(
    counts: jnp.ndarray,  # [D, V] float32
    gamma0: jnp.ndarray,  # [D, K] float32 initial gamma
    exp_elog_beta: jnp.ndarray,  # [K, V] float32
    alpha: jnp.ndarray,  # [K]
    inner_iterations: int = 50,
    convergence_threshold: float = 1e-5,
    eps: float = 1e-30,
    tile_d: int = 0,
    interpret: bool = False,
) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Fused dense E-step: returns (gamma [D, K], sstats [K, V],
    token_score scalar).  Padded rows are all-zero counts and converge
    to gamma = alpha — inert everywhere downstream."""
    D, V = counts.shape
    K = exp_elog_beta.shape[0]
    if tile_d <= 0:
        tile_d = pick_tile_d(D, K, V)
        assert tile_d > 0, "VMEM working set too large; use estep_dense"
    Dp = _round_up(D, tile_d)
    if Dp != D:
        counts = jnp.pad(counts, ((0, Dp - D), (0, 0)))
        gamma0 = jnp.pad(gamma0, ((0, Dp - D), (0, 0)), constant_values=1.0)
    # Pad the topic axis to the 128-lane boundary: unaligned K forces the
    # Mosaic matmuls off the efficient MXU path.  Padded topic slots are
    # masked out of the digamma normaliser in-kernel (kmask) and stay
    # exactly at gamma = 1 with zero sufficient statistics.
    Kp = _round_up(K, 128)
    if Kp != K:
        exp_elog_beta = jnp.pad(exp_elog_beta, ((0, Kp - K), (0, 0)))
        alpha = jnp.pad(alpha, (0, Kp - K), constant_values=1.0)
        gamma0 = jnp.pad(gamma0, ((0, 0), (0, Kp - K)), constant_values=1.0)
    grid = Dp // tile_d

    kernel = functools.partial(
        _estep_tile_kernel,
        inner_iterations=inner_iterations,
        convergence_threshold=convergence_threshold,
        eps=eps,
        real_k=K,
    )
    gamma, sstats, score = pl.pallas_call(
        kernel,
        grid=(grid,),
        in_specs=[
            pl.BlockSpec(
                (tile_d, V), lambda i: (i, 0), memory_space=pltpu.VMEM
            ),
            pl.BlockSpec((Kp, V), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, Kp), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec(
                (tile_d, Kp), lambda i: (i, 0), memory_space=pltpu.VMEM
            ),
        ],
        out_specs=[
            pl.BlockSpec(
                (tile_d, Kp), lambda i: (i, 0), memory_space=pltpu.VMEM
            ),
            pl.BlockSpec((Kp, V), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec(
                (1, 1), lambda i: (0, 0), memory_space=pltpu.SMEM
            ),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((Dp, Kp), jnp.float32),
            jax.ShapeDtypeStruct((Kp, V), jnp.float32),
            jax.ShapeDtypeStruct((1, 1), jnp.float32),
        ],
        interpret=interpret,
    )(counts, exp_elog_beta, alpha.reshape(1, Kp), gamma0)
    return gamma[:D, :K], sstats[:K], score[0, 0]
