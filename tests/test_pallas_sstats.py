"""Parity: fused Pallas sufficient-statistics kernel vs the XLA form.

Same reduction as ops/estep.estep_dense_sstats (f32 accumulation), so
agreement is to f32 matmul reassociation noise, not a statistical
tolerance.  Runs in interpret mode on the CPU test platform.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from pylda_tpu.ops.estep import estep_dense_sstats
from pylda_tpu.ops.pallas_sstats import pallas_dense_sstats


def _case(D, V, K, seed, counts_dtype=jnp.float32):
    rng = np.random.default_rng(seed)
    counts = rng.poisson(0.02, size=(D, V)).astype(np.float32)
    counts[rng.integers(0, D, 3)] = 0.0  # some all-zero (padding-like) rows
    gamma = rng.gamma(100.0, 0.01, size=(D, K)).astype(np.float32)
    lam = rng.gamma(100.0, 0.01, size=(K, V)).astype(np.float32)
    from pylda_tpu.ops.dirichlet import exp_dirichlet_expectation

    et = exp_dirichlet_expectation(jnp.asarray(gamma))
    eeb = exp_dirichlet_expectation(jnp.asarray(lam))
    return jnp.asarray(counts, dtype=counts_dtype), et, eeb


@pytest.mark.parametrize(
    "D,V,K,tile_d,tile_v",
    [
        (96, 640, 7, 32, 256),   # padding on every axis, multi-tile grid
        (256, 1024, 32, 128, 512),
        (64, 384, 100, 64, 128), # K pads to 128
    ],
)
def test_matches_xla_form(D, V, K, tile_d, tile_v):
    counts, et, eeb = _case(D, V, K, seed=D + V + K)
    ss_ref, tok_ref = estep_dense_sstats(counts, et, eeb)
    ss, tok = pallas_dense_sstats(
        counts, et, eeb, tile_d=tile_d, tile_v=tile_v, interpret=True
    )
    np.testing.assert_allclose(np.asarray(ss), np.asarray(ss_ref),
                               rtol=2e-5, atol=1e-6)
    assert float(tok) == pytest.approx(float(tok_ref), rel=2e-5)


def test_tile_planner_respects_vmem_budget():
    from pylda_tpu.ops.pallas_sstats import _vmem_need, plan_sstats_tiles

    for K in (8, 100, 1000):
        for itemsize in (2, 4):
            td, tv = plan_sstats_tiles(4096, 100_000, K, itemsize)
            kp = (K + 127) // 128 * 128
            assert _vmem_need(td, tv, kp, itemsize) <= 13 * 2**20
    # the plan that OOM'd the device is correctly over budget
    assert _vmem_need(2048, 512, 128, 4) > 13 * 2**20


def test_tiny_shapes():
    counts, et, eeb = _case(5, 70, 3, seed=1)
    ss_ref, tok_ref = estep_dense_sstats(counts, et, eeb)
    ss, tok = pallas_dense_sstats(counts, et, eeb, interpret=True)
    np.testing.assert_allclose(np.asarray(ss), np.asarray(ss_ref),
                               rtol=2e-5, atol=1e-6)
    assert float(tok) == pytest.approx(float(tok_ref), rel=2e-5, abs=1e-6)


def test_engine_kernel_flag_matches_xla():
    """sstats_kernel='pallas' through the full VB engine (interpret mode
    on CPU): per-iteration ELBOs match the XLA backend to f32 noise."""
    from pylda_tpu.corpus.synthetic import synthetic_corpus
    from pylda_tpu.models import VariationalBayes
    from pylda_tpu.utils.config import LDAConfig

    corpus, _, _ = synthetic_corpus(
        num_docs=192, num_topics=6, num_types=500,
        mean_doc_length=30.0, seed=11,
    )

    def run(kernel):
        cfg = LDAConfig(
            number_of_topics=6, inference_mode="vb", seed=0,
            inner_iterations=15, dense_vocab_threshold=8,  # force ragged
            sstats_kernel=kernel,
        )
        eng = VariationalBayes(cfg)
        eng.initialize(corpus)
        return eng.learning_many(4)

    e_xla = run("xla")
    e_pallas = run("pallas")
    np.testing.assert_allclose(e_pallas, e_xla, rtol=1e-5)


def test_auto_kernel_resolution():
    """Default sstats_kernel='auto' = pallas on TPU, xla on CPU (the
    decision measured by scripts/sstats_kernel_ab.py: +4.6% in-engine on
    v5e; interpret-mode Pallas would slow the CPU test platform)."""
    from pylda_tpu.utils.config import LDAConfig

    cfg = LDAConfig(number_of_topics=4).validate()
    assert cfg.sstats_kernel == "auto"
    assert cfg.resolved_sstats_kernel("cpu") == "xla"
    assert cfg.resolved_sstats_kernel("tpu") == "pallas"
    assert cfg.resolved_sstats_kernel("axon") == "pallas"
    forced = LDAConfig(number_of_topics=4, sstats_kernel="xla")
    assert forced.resolved_sstats_kernel("tpu") == "xla"


def test_bf16_counts_storage_and_compute():
    counts, et, eeb = _case(128, 512, 16, seed=0,
                            counts_dtype=jnp.bfloat16)
    # bf16 counts are exact integers here; f32-compute results must match
    # the f32-storage XLA form exactly up to matmul reassociation.
    ss_ref, tok_ref = estep_dense_sstats(
        counts.astype(jnp.float32), et, eeb
    )
    ss, tok = pallas_dense_sstats(counts, et, eeb, interpret=True)
    np.testing.assert_allclose(np.asarray(ss), np.asarray(ss_ref),
                               rtol=2e-5, atol=1e-6)
    # bf16 compute: statistical agreement only
    ss2, tok2 = pallas_dense_sstats(
        counts, et, eeb, compute_dtype="bfloat16", interpret=True
    )
    np.testing.assert_allclose(np.asarray(ss2), np.asarray(ss_ref),
                               rtol=2e-2, atol=1e-4)
    assert float(tok2) == pytest.approx(float(tok_ref), rel=2e-2)
