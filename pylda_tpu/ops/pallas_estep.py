"""Pallas TPU kernel: fused dense-batch VB E-step.

The XLA paths (``pylda_tpu.ops.estep``) re-touch HBM every fixed-point
sweep: the dense path re-reads the [D, V] counts block and the [K, V]
topic matrix per sweep, and the ragged path re-reads the gathered
[D, T, K] token block per sweep.  This kernel keeps one row-tile of
counts, the whole exp(E[log beta]) matrix, and the tile's gamma resident
in VMEM across ALL sweeps, so HBM sees the corpus exactly once per
E-step — the bandwidth speed-of-light for this op (pallas_guide.md
"Memory Hierarchy"; BASELINE.json:5 "fused digamma/exp-normalize E-step
kernels").

Design (round-2 rework):

- **Vocabulary tiling.**  Every sweep loops over static 512-lane vocab
  tiles, so in-kernel temporaries are [TILE_D, 512] instead of
  [TILE_D, V].  That removes the O(TILE_D * V) temp term from the VMEM
  budget and lets the kernel run at vocabularies (V ~ 10-20k) where the
  round-1 whole-row kernel either did not fit or degenerated to
  MXU-starving 8-row tiles.
- **bf16 storage mode.**  ``storage_dtype="bfloat16"`` keeps the counts
  tile and exp(E[log beta]) in VMEM as bf16 (counts below 257 are exact
  in bf16) with all matmuls accumulating in f32 — halves the resident
  working set, doubling the viable (TILE_D, V) envelope.  gamma, the
  sufficient-statistics accumulator, and the token score stay f32.
- **Per-tile convergence.**  A ``lax.while_loop`` stops each doc tile
  when its worst document's mean |dgamma| falls below the threshold —
  the same whole-batch rule as the XLA path, applied per tile (strictly
  closer to the reference's per-document early exit than one global
  check).  The round-1 kernel always ran ``inner_iterations`` sweeps,
  ~4x the converged count at the flagship shape.

Why a DENSE kernel is the TPU answer to the ragged E-step (the sstats
scatter + B-gather overhead of ``estep_ragged``): Mosaic's dynamic
gather/scatter is register-level only (``tpu.dynamic_gather`` requires
the table to fit one vreg along the gather axis — verified on this
toolchain), so a token-gather kernel cannot be written efficiently.  The
dense counts matrix, however, is corpus-static: materialising it once in
HBM and streaming row tiles through VMEM turns every sweep into pure
well-shaped MXU matmuls with zero gather/scatter, and the counts-tile
HBM read amortises over all sweeps.  At K=100, V=10k this beats the XLA
ragged path ~4x end to end (BENCH_SUITE.md).

In-kernel digamma: jax.scipy.special.digamma does not lower inside
Pallas on all toolchains, so the kernel uses the standard 6-term
asymptotic series after argument-shifting into x >= 6 (float32 accurate
to ~1e-7, validated in tests/test_pallas_estep.py).  gamma > 0 always
holds (gamma = alpha + positive mass), and the shift loop is a fixed
6-step unroll.
"""

from __future__ import annotations

import functools
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_VMEM_BUDGET = 14 * 1024 * 1024  # leave headroom under ~16 MB/core
_TILE_V = 512  # static vocab tile width (lanes); multiple of 128


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
    counts_ref,  # [TILE_D, Vp] VMEM, storage dtype
    eeb_ref,  # [Kp, Vp] VMEM, storage dtype (exp E[log beta])
    alpha_ref,  # [1, Kp] VMEM f32
    gamma0_ref,  # [TILE_D, Kp] VMEM f32 initial gamma
    gamma_ref,  # out [TILE_D, Kp] VMEM f32
    sstats_ref,  # out [Kp, Vp] VMEM f32 (accumulated over grid)
    score_ref,  # out [1, 1] SMEM f32 (accumulated over grid)
    *,
    inner_iterations: int,
    convergence_threshold: float,
    eps: float,
    real_k: int,
    tile_v: int,
):
    alpha = alpha_ref[0, :]
    K = alpha.shape[0]
    Vp = counts_ref.shape[1]
    n_vt = Vp // tile_v
    kmask = (
        jax.lax.broadcasted_iota(jnp.int32, (1, K), 1) < real_k
    ).astype(jnp.float32)
    cdt = eeb_ref.dtype  # storage/compute dtype for MXU inputs

    def sweep(gamma):
        """One fixed-point sweep: loop static 512-lane vocab tiles so
        temporaries stay [TILE_D, 512]; two MXU matmuls per tile with f32
        accumulation."""
        exp_etheta = _exp_dirichlet_expectation_rows(gamma, kmask)
        et_c = exp_etheta.astype(cdt)
        acc = jnp.zeros_like(gamma)
        for j in range(n_vt):
            sl = slice(j * tile_v, (j + 1) * tile_v)
            eeb_j = eeb_ref[:, sl]  # [Kp, TILE_V]
            phinorm_j = (
                jnp.dot(et_c, eeb_j, preferred_element_type=jnp.float32)
                + eps
            )
            ratio_j = counts_ref[:, sl].astype(jnp.float32) / phinorm_j
            # Contract over the vocab tile without materialising eeb.T.
            acc = acc + jax.lax.dot_general(
                ratio_j.astype(cdt), eeb_j,
                dimension_numbers=(((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
        return alpha[None, :] + exp_etheta * acc

    if convergence_threshold > 0.0:
        # Per-tile convergence (same rule as ops/estep.py, applied to
        # this tile's documents): stop when the worst document's mean
        # |dgamma| over the real topics drops below the threshold.
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

        _, gamma, _ = jax.lax.while_loop(
            cond, body, (jnp.int32(0), gamma0_ref[:], jnp.float32(jnp.inf))
        )
    else:
        gamma = jax.lax.fori_loop(
            0, inner_iterations, lambda _i, g: sweep(g), gamma0_ref[:]
        )

    # Final pass at the converged gamma: sufficient statistics
    # (sstats = eeb * (expEtheta^T @ ratio), the scatter-free matmul form
    # of SURVEY.md 7.1) and the token score, per vocab tile.
    exp_etheta = _exp_dirichlet_expectation_rows(gamma, kmask)
    et_c = exp_etheta.astype(cdt)

    @pl.when(pl.program_id(0) == 0)
    def _():
        sstats_ref[:] = jnp.zeros_like(sstats_ref)
        score_ref[0, 0] = 0.0

    score = jnp.float32(0.0)
    for j in range(n_vt):
        sl = slice(j * tile_v, (j + 1) * tile_v)
        eeb_j = eeb_ref[:, sl]
        phinorm_j = (
            jnp.dot(et_c, eeb_j, preferred_element_type=jnp.float32) + eps
        )
        cnt_j = counts_ref[:, sl].astype(jnp.float32)
        ratio_j = cnt_j / phinorm_j
        sstats_ref[:, sl] += eeb_j.astype(jnp.float32) * jax.lax.dot_general(
            et_c, ratio_j.astype(cdt),
            dimension_numbers=(((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        score = score + (cnt_j * jnp.log(phinorm_j)).sum()

    gamma_ref[:] = gamma
    score_ref[0, 0] += score


def _vmem_need(tile: int, K: int, V: int, itemsize: int) -> int:
    """Bytes of VMEM for the tiled kernel: double-buffered counts tile +
    resident topic matrix (storage dtype) + f32 sstats accumulator +
    gamma working set + [tile, 512] per-vocab-tile temporaries."""
    tv = min(_TILE_V, V)
    return (
        2 * tile * V * itemsize  # counts tile, pipelined x2
        + K * V * itemsize  # eeb, resident
        + K * V * 4  # sstats accumulator (f32)
        + 8 * tile * K * 4  # gamma0/gamma/expEtheta/acc + buffers
        + 6 * tile * tv * 4  # phinorm/ratio/staging per vocab tile
    )


def plan_pallas_estep(
    num_docs: int,
    num_topics: int,
    num_types: int,
    compute_dtype: str = "float32",
    min_tile: int = 8,
) -> Optional[Tuple[int, str]]:
    """Pick (tile_d, storage_dtype) for the kernel, or None if even the
    bf16 working set cannot fit VMEM.

    Tile size dominates dtype: a large bf16 tile beats a small f32 tile
    because small row tiles starve the MXU (measured on v5e at D=4096,
    K=100, V=10k: tile128-bf16 11.7 ms vs tile32-f32 20.5 ms for the
    full 50-sweep E-step — scripts/bench_pallas_estep.py).  So iterate
    tiles outermost, preferring the requested dtype at equal tile size;
    bf16 storage is exact for counts < 257 and all matmuls accumulate
    in f32."""
    K = _round_up(num_topics, 128)
    V = _round_up(num_types, _TILE_V if num_types > _TILE_V else 128)
    order = ["float32", "bfloat16"]
    if compute_dtype == "bfloat16":
        order = ["bfloat16"]
    for tile in (512, 256, 128, 64, 32, 16, 8):
        if tile < min_tile:
            break
        if tile > _round_up(num_docs, 8):
            continue
        for dtype in order:
            itemsize = 2 if dtype == "bfloat16" else 4
            if _vmem_need(tile, K, V, itemsize) < _VMEM_BUDGET:
                return tile, dtype
    return None


def pick_tile_d(num_docs: int, num_topics: int, num_types: int) -> int:
    """Largest row tile whose f32 VMEM working set fits the budget; 0
    when even the smallest tile does not fit (back-compat surface)."""
    plan = plan_pallas_estep(num_docs, num_topics, num_types, "float32")
    return plan[0] if plan and plan[1] == "float32" else 0


def pallas_estep_supported(
    num_docs: int, num_topics: int, num_types: int,
    compute_dtype: str = "float32",
) -> bool:
    return plan_pallas_estep(
        num_docs, num_topics, num_types, compute_dtype
    ) is not None


@functools.partial(
    jax.jit,
    static_argnames=(
        "inner_iterations", "convergence_threshold", "eps", "tile_d",
        "storage_dtype", "interpret",
    ),
)
def pallas_estep_dense(
    counts: jnp.ndarray,  # [D, V] float32 (or pre-cast storage dtype)
    gamma0: jnp.ndarray,  # [D, K] float32 initial gamma
    exp_elog_beta: jnp.ndarray,  # [K, V] float32
    alpha: jnp.ndarray,  # [K]
    inner_iterations: int = 50,
    convergence_threshold: float = 1e-5,
    eps: float = 1e-30,
    tile_d: int = 0,
    storage_dtype: str = "",
    interpret: bool = False,
) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Fused dense E-step: returns (gamma [D, K], sstats [K, V],
    token_score scalar).  Padded rows are all-zero counts and converge
    to gamma = alpha — inert everywhere downstream."""
    D, V = counts.shape
    K = exp_elog_beta.shape[0]
    if tile_d <= 0 or not storage_dtype:
        plan = plan_pallas_estep(D, K, V)
        assert plan is not None, "VMEM working set too large; use estep_dense"
        tile_d = tile_d if tile_d > 0 else plan[0]
        storage_dtype = storage_dtype or plan[1]
    sdt = jnp.bfloat16 if storage_dtype == "bfloat16" else jnp.float32
    Dp = _round_up(D, tile_d)
    if Dp != D:
        counts = jnp.pad(counts, ((0, Dp - D), (0, 0)))
        gamma0 = jnp.pad(gamma0, ((0, Dp - D), (0, 0)), constant_values=1.0)
    # Pad the topic axis to the 128-lane boundary: unaligned K forces the
    # Mosaic matmuls off the efficient MXU path.  Padded topic slots are
    # masked out of the digamma normaliser in-kernel (kmask) and stay
    # exactly at gamma = 1 with zero sufficient statistics.  The vocab
    # axis pads to the static 512-lane tile width; padded columns carry
    # zero counts and zero eeb — inert in phinorm, sstats, and score.
    Kp = _round_up(K, 128)
    if V > _TILE_V:
        Vp, tile_v = _round_up(V, _TILE_V), _TILE_V
    else:
        Vp = _round_up(V, 128)
        tile_v = Vp
    if Kp != K:
        exp_elog_beta = jnp.pad(exp_elog_beta, ((0, Kp - K), (0, 0)))
        alpha = jnp.pad(alpha, (0, Kp - K), constant_values=1.0)
        gamma0 = jnp.pad(gamma0, ((0, 0), (0, Kp - K)), constant_values=1.0)
    if Vp != V:
        counts = jnp.pad(counts, ((0, 0), (0, Vp - V)))
        exp_elog_beta = jnp.pad(exp_elog_beta, ((0, 0), (0, Vp - V)))
    grid = Dp // tile_d

    kernel = functools.partial(
        _estep_tile_kernel,
        inner_iterations=inner_iterations,
        convergence_threshold=convergence_threshold,
        eps=eps,
        real_k=K,
        tile_v=tile_v,
    )
    gamma, sstats, score = pl.pallas_call(
        kernel,
        grid=(grid,),
        in_specs=[
            pl.BlockSpec(
                (tile_d, Vp), lambda i: (i, 0), memory_space=pltpu.VMEM
            ),
            pl.BlockSpec((Kp, Vp), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, Kp), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec(
                (tile_d, Kp), lambda i: (i, 0), memory_space=pltpu.VMEM
            ),
        ],
        out_specs=[
            pl.BlockSpec(
                (tile_d, Kp), lambda i: (i, 0), memory_space=pltpu.VMEM
            ),
            pl.BlockSpec((Kp, Vp), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec(
                (1, 1), lambda i: (0, 0), memory_space=pltpu.SMEM
            ),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((Dp, Kp), jnp.float32),
            jax.ShapeDtypeStruct((Kp, Vp), jnp.float32),
            jax.ShapeDtypeStruct((1, 1), jnp.float32),
        ],
        interpret=interpret,
    )(
        counts.astype(sdt),
        exp_elog_beta.astype(sdt),
        alpha.reshape(1, Kp).astype(jnp.float32),
        gamma0,
    )
    return gamma[:D, :K], sstats[:K, :V], score[0, 0]
