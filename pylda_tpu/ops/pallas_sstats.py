"""Pallas TPU kernel: fused scatter-free sufficient statistics.

``ops.estep.estep_dense_sstats`` is two MXU matmuls chained through a
[D, V] ``phinorm`` intermediate:

    phinorm = expEtheta @ expElogBeta          # [D, V]
    sstats  = expElogBeta * (expEtheta^T @ (counts / phinorm))
    score   = sum(counts * log(phinorm))

XLA cannot fuse a matmul producer into two matmul consumers, so
``phinorm`` (and the ratio) round-trip HBM: at the flagship shape
(D=4096, V=10k f32 = 164 MB per [D, V] array) the phase is
bandwidth-bound at ~3x the counts bytes.  This kernel tiles over
(vocab, docs), keeps the ``phinorm`` tile in VMEM, and accumulates the
[K, TILE_V] sufficient-statistics block across doc tiles — HBM sees
``counts`` exactly once and ``phinorm`` never (pallas_guide.md "Memory
Hierarchy": intermediates belong in VMEM).

Grid = (V tiles, D tiles), D minor: the sstats output block depends only
on the V tile, so Mosaic keeps it VMEM-resident across the D sweep of
each V tile (initialised at d == 0).  The token score accumulates in
SMEM across the whole grid.

Reference math: SURVEY.md section 7.1/8.1 (Hoffman phi-free form); this
kernel is numerically the same reduction as ``estep_dense_sstats`` (f32
accumulation, optional bf16 operands) and is parity-tested against it in
tests/test_pallas_sstats.py.
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from pylda_tpu.utils import round_up as _round_up


def _sstats_tile_kernel(
    counts_ref,  # [TD, TV] VMEM (f32 or bf16 storage)
    et_ref,  # [TD, Kp] VMEM f32
    eeb_ref,  # [Kp, TV] VMEM f32
    sstats_ref,  # out [Kp, TV] VMEM f32 (accumulated over d)
    score_ref,  # out [1, 1] SMEM f32 (accumulated over the grid)
    *,
    eps: float,
    bf16_compute: bool,
):
    v = pl.program_id(0)
    d = pl.program_id(1)

    @pl.when(jnp.logical_and(v == 0, d == 0))
    def _():
        score_ref[0, 0] = jnp.float32(0.0)

    @pl.when(d == 0)
    def _():
        sstats_ref[...] = jnp.zeros_like(sstats_ref)

    counts = counts_ref[...].astype(jnp.float32)
    cdt = jnp.bfloat16 if bf16_compute else jnp.float32
    et = et_ref[...].astype(cdt)
    eeb = eeb_ref[...].astype(cdt)
    phinorm = (
        jnp.dot(et, eeb, preferred_element_type=jnp.float32) + eps
    )  # [TD, TV] — VMEM-resident, never leaves the chip
    ratio = counts / phinorm
    sstats_ref[...] += jax.lax.dot_general(
        et, ratio.astype(cdt),
        dimension_numbers=(((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    score_ref[0, 0] += jnp.sum(counts * jnp.log(phinorm))


def _vmem_need(td: int, tv: int, kp: int, counts_itemsize: int) -> int:
    """Scoped-VMEM estimate (bytes) for one grid step: double-buffered
    input blocks + the phinorm/ratio temporaries + the resident output
    block.  A plan over ~14 MB OOMs at compile time — and on this
    tunneled setup a failed remote compile has been observed to WEDGE
    the device, so the planner is deliberately conservative."""
    return (
        2 * td * tv * counts_itemsize  # counts block (double-buffered)
        + 2 * td * tv * 4  # phinorm + ratio f32 temporaries
        + 2 * td * kp * 4  # et block (double-buffered)
        + 2 * kp * tv * 4  # eeb block (double-buffered)
        + kp * tv * 4  # sstats accumulator (revisited, single)
    )


def plan_sstats_tiles(
    D: int, V: int, K: int, counts_itemsize: int = 4,
    budget: int = 13 * 2**20,
) -> Tuple[int, int]:
    """Largest (tile_d, tile_v) under the VMEM budget, preferring deep
    doc tiles (counts reads amortise the eeb/sstats blocks over more
    rows)."""
    kp = _round_up(K, 128)
    for td, tv in ((1024, 512), (512, 512), (512, 256), (256, 256),
                   (128, 256), (128, 128), (64, 128), (8, 128)):
        if _vmem_need(td, tv, kp, counts_itemsize) <= budget:
            return td, tv
    return 8, 128


@functools.partial(
    jax.jit,
    static_argnames=("eps", "compute_dtype", "tile_d", "tile_v", "interpret"),
)
def pallas_dense_sstats(
    counts: jnp.ndarray,  # [D, V] (f32 or bf16; zero rows/cols inert)
    exp_etheta: jnp.ndarray,  # [D, K] f32
    exp_elog_beta: jnp.ndarray,  # [K, V] f32
    eps: float = 1e-30,
    compute_dtype: str = "float32",
    tile_d: int = 0,  # 0 = plan under the VMEM budget
    tile_v: int = 0,
    interpret: bool = False,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Fused ``estep_dense_sstats`` (same contract: returns
    ``(sstats [K, V], token_score scalar)``).

    ``counts`` may arrive vocab-PREPADDED (width >= eeb's V, padded once
    at plan time): zero padding columns are inert in both outputs, and
    prepadding to a multiple of the tile width makes the per-pass
    ``jnp.pad`` of the counts block a no-op (it measured 0.11 ms/pass
    of pure copy on the flagship shape)."""
    D, Vc = counts.shape
    V = exp_elog_beta.shape[1]
    K = exp_etheta.shape[1]
    Kp = _round_up(K, 128)
    if not tile_d or not tile_v:
        planned = plan_sstats_tiles(D, Vc, K, counts.dtype.itemsize)
        tile_d, tile_v = (tile_d or planned[0], tile_v or planned[1])
    TD = min(tile_d, _round_up(D, 8))
    TV = min(tile_v, _round_up(Vc, 128))
    Dp = _round_up(D, TD)
    Vp = _round_up(Vc, TV)

    counts_p = jnp.pad(counts, ((0, Dp - D), (0, Vp - Vc)))
    # Padding doc rows carry et = 1 (phinorm > 0, log finite) and zero
    # counts, so they are inert in both outputs.
    et_p = jnp.pad(
        exp_etheta.astype(jnp.float32),
        ((0, Dp - D), (0, Kp - K)),
        constant_values=((0.0, 1.0), (0.0, 0.0)),
    )
    eeb_p = jnp.pad(
        exp_elog_beta.astype(jnp.float32), ((0, Kp - K), (0, Vp - V))
    )

    grid = (Vp // TV, Dp // TD)
    raw, score = pl.pallas_call(
        functools.partial(
            _sstats_tile_kernel,
            eps=eps,
            bf16_compute=(compute_dtype == "bfloat16"),
        ),
        grid=grid,
        in_specs=[
            pl.BlockSpec((TD, TV), lambda v, d: (d, v),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((TD, Kp), lambda v, d: (d, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((Kp, TV), lambda v, d: (0, v),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((Kp, TV), lambda v, d: (0, v),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1), lambda v, d: (0, 0),
                         memory_space=pltpu.SMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((Kp, Vp), jnp.float32),
            jax.ShapeDtypeStruct((1, 1), jnp.float32),
        ],
        interpret=interpret,
    )(counts_p, et_p, eeb_p)
    sstats = exp_elog_beta * raw[:K, :V]
    return sstats, score[0, 0]
