"""Correctness of the fused Pallas dense E-step kernel.

Runs in Pallas interpreter mode on the CPU test backend; the kernel math
must match the XLA path (ops/estep.estep_dense) within the f32
fixed-point noise floor, and the in-kernel digamma series must match
scipy to f32 accuracy over the E-step's operating range.
"""

import jax.numpy as jnp
import numpy as np
from scipy.special import psi

from pylda_tpu.corpus.synthetic import synthetic_corpus
from pylda_tpu.models import VariationalBayes
from pylda_tpu.ops.dirichlet import exp_dirichlet_expectation
from pylda_tpu.ops.estep import estep_dense
from pylda_tpu.ops.pallas_estep import (
    digamma_approx,
    pallas_estep_dense,
    pick_tile_d,
)
from pylda_tpu.utils.config import LDAConfig


def test_digamma_series_accuracy():
    x = np.random.default_rng(0).uniform(0.005, 200.0, 8192).astype(np.float32)
    got = np.asarray(digamma_approx(jnp.asarray(x)))
    want = psi(x.astype(np.float64))
    # Absolute error floor set by f32 cancellation at small x (|psi| ~ 1/x).
    assert np.abs(got - want).max() < 5e-4
    rel = np.abs((got - want) / (np.abs(want) + 1e-3)).max()
    assert rel < 2e-5


def test_pick_tile_respects_budget():
    assert pick_tile_d(4096, 100, 512) >= 128
    assert pick_tile_d(4096, 100, 100_000) == 0  # topic matrix alone too big


def test_kernel_matches_xla_path():
    D, K, V = 96, 10, 256
    rng = np.random.default_rng(5)
    counts = jnp.asarray(rng.poisson(0.2, (D, V)).astype(np.float32))
    lam = jnp.asarray(rng.gamma(100.0, 0.01, (K, V)), jnp.float32)
    alpha = jnp.full((K,), 0.1, jnp.float32)
    eeb = exp_dirichlet_expectation(lam)
    g0 = jnp.ones((D, K), jnp.float32)

    g_p, ss_p, sc_p = pallas_estep_dense(
        counts, g0, eeb, alpha, inner_iterations=20,
        convergence_threshold=1e-6, eps=1e-30, tile_d=32, interpret=True,
    )
    g_x, ss_x, sc_x, _ = estep_dense(
        counts, g0, eeb, alpha, inner_iterations=20,
        convergence_threshold=0.0, eps=1e-30,
    )
    # f32 fixed points wander slightly (limit cycles); compare loosely on
    # gamma and tightly on the aggregate score.
    assert float(jnp.abs(sc_p - sc_x)) < 1e-3 * abs(float(sc_x))
    np.testing.assert_allclose(
        np.asarray(g_p), np.asarray(g_x), rtol=0.05, atol=0.05
    )
    np.testing.assert_allclose(
        np.asarray(ss_p), np.asarray(ss_x), rtol=0.1, atol=0.01
    )
    # Exact invariants hold independently of the XLA path.
    doc_len = np.asarray(counts.sum(axis=1))
    np.testing.assert_allclose(
        np.asarray(g_p.sum(axis=1)), 0.1 * K + doc_len, rtol=1e-3
    )
    np.testing.assert_allclose(
        float(ss_p.sum()), float(counts.sum()), rtol=1e-3
    )


def test_engine_use_pallas_end_to_end():
    corpus, _, _ = synthetic_corpus(
        num_docs=64, num_topics=4, num_types=128, mean_doc_length=25, seed=2
    )
    # threshold=0 pins both engines to the 15-sweep cap: the XLA path's
    # per-row freeze exit (ops/estep._exit_update) and the kernel's
    # per-tile convergence exit otherwise diverge legitimately in WHEN
    # they stop, and this test is about kernel MATH parity.
    ref_cfg = LDAConfig(
        number_of_topics=4, inference_mode="vb", inner_iterations=15,
        doc_pad_multiple=8, gamma_init="ones", seed=0,
        convergence_threshold=0.0,
    )
    pal_cfg = LDAConfig(
        number_of_topics=4, inference_mode="vb", inner_iterations=15,
        doc_pad_multiple=8, gamma_init="ones", seed=0, use_pallas="always",
        convergence_threshold=0.0,
    )
    ref, pal = VariationalBayes(ref_cfg), VariationalBayes(pal_cfg)
    ref.initialize(corpus)
    pal.initialize(corpus)
    e_ref = [ref.learning() for _ in range(5)]
    e_pal = [pal.learning() for _ in range(5)]
    for a, b in zip(e_ref, e_pal):
        assert abs(a - b) < 1e-3 * abs(a), (e_ref, e_pal)
    test = corpus.subset(range(16))
    assert abs(ref.perplexity(test) - pal.perplexity(test)) < 0.5


# -- ragged kernel (ops/pallas_ragged.py) -------------------------------------


def test_ragged_kernel_matches_xla_path():
    from pylda_tpu.ops.estep import estep_ragged_gamma
    from pylda_tpu.ops.pallas_ragged import pallas_estep_ragged_gamma

    rng = np.random.default_rng(7)
    D, T, K, V = 37, 21, 13, 500  # deliberately unaligned everywhere
    ids = rng.integers(0, V, (D, T)).astype(np.int32)
    cnts = rng.integers(1, 5, (D, T)).astype(np.float32)
    cnts[:, 17:] = 0
    ids[:, 17:] = 0  # padded token slots
    cnts[-3:] = 0
    ids[-3:] = 0  # padded doc rows
    lam = jnp.asarray(rng.gamma(1.0, 1.0, (K, V)), jnp.float32)
    eeb = exp_dirichlet_expectation(lam)
    alpha = jnp.full((K,), 0.1, jnp.float32)
    g0 = jnp.asarray(rng.gamma(100.0, 0.01, (D, K)), jnp.float32)

    for thresh in (1e-6, 0.0):
        g_x, _ = estep_ragged_gamma(
            jnp.asarray(ids), jnp.asarray(cnts), g0, eeb, alpha,
            inner_iterations=30, convergence_threshold=thresh,
        )
        g_p, sweeps = pallas_estep_ragged_gamma(
            jnp.asarray(ids), jnp.asarray(cnts), g0, eeb, alpha,
            inner_iterations=30, convergence_threshold=thresh,
            interpret=True,
        )
        np.testing.assert_allclose(
            np.asarray(g_p), np.asarray(g_x), rtol=5e-4, atol=5e-4
        )
        assert 1 <= int(sweeps) <= 30
    # Exact invariant: gamma row sums = sum(alpha) + doc length.
    doc_len = cnts.sum(axis=1)
    np.testing.assert_allclose(
        np.asarray(g_p.sum(axis=1)), 0.1 * K + doc_len, rtol=1e-3
    )


def test_ragged_plan_respects_budget():
    from pylda_tpu.ops.pallas_ragged import plan_pallas_ragged

    plan = plan_pallas_ragged(4096, 48, 100)
    assert plan is not None and plan[0] >= 64
    # A giant per-doc slot count cannot fit any tile.
    assert plan_pallas_ragged(4096, 200_000, 100) is None
    # bf16 request is honoured in the storage dtype.
    plan_bf16 = plan_pallas_ragged(4096, 48, 100, "bfloat16")
    assert plan_bf16 is not None and plan_bf16[2] == "bfloat16"
    # Measured preference (scripts/bench_pallas_ragged.py): full-width
    # token chunks beat doc-tile size — at T=128 the planner keeps
    # tile_t = Tp and shrinks the doc tile instead.
    plan_wide = plan_pallas_ragged(3328, 128, 100)
    assert plan_wide is not None and plan_wide[1] == 128
    assert plan_wide[2] == "float32"
    # Very wide buckets fall back to token chunking as the last resort
    # (bf16 residency + tile_t < Tp), and past that to None (the engine
    # then uses the XLA path for that bucket).
    plan_huge = plan_pallas_ragged(64, 1024, 100)
    assert plan_huge is not None and plan_huge[1] < 1024
    assert 1024 % plan_huge[1] == 0
    assert plan_pallas_ragged(32, 2048, 100) is None


def test_engine_use_pallas_ragged_end_to_end():
    """use_pallas=always on a LARGE-vocab corpus routes the hybrid path's
    gamma fixed point through the ragged kernel; ELBO + perplexity must
    track the XLA engine."""
    corpus, _, _ = synthetic_corpus(
        num_docs=64, num_topics=4, num_types=6000, mean_doc_length=25, seed=2
    )
    common = dict(
        number_of_topics=4, inference_mode="vb", inner_iterations=15,
        doc_pad_multiple=8, gamma_init="ones", seed=0,
        convergence_threshold=0.0,  # pin sweeps: math parity, not exits
    )
    ref_cfg = LDAConfig(**common)
    pal_cfg = LDAConfig(**common, use_pallas="always")
    ref, pal = VariationalBayes(ref_cfg), VariationalBayes(pal_cfg)
    ref.initialize(corpus)
    pal.initialize(corpus)
    assert ref._sstats_plan is not None  # hybrid dense-sstats path active
    e_ref = [ref.learning() for _ in range(5)]
    e_pal = [pal.learning() for _ in range(5)]
    for a, b in zip(e_ref, e_pal):
        assert abs(a - b) < 1e-3 * abs(a), (e_ref, e_pal)
    test = corpus.subset(range(16))
    assert abs(ref.perplexity(test) - pal.perplexity(test)) < 0.5


def test_fast_transcendental_accuracy():
    """digamma_fast / gammaln_fast (the [K, V] ELBO surfaces) vs scipy
    over the operating range: gamma/lambda values span ~1e-5 (eta at
    V=100k) to ~1e6 (hot-word lambda)."""
    from scipy.special import gammaln as sp_gammaln

    from pylda_tpu.ops.dirichlet import digamma_fast, gammaln_fast

    x = np.concatenate([
        np.logspace(-5, 6, 4000),
        np.random.default_rng(0).uniform(0.005, 500.0, 4000),
    ]).astype(np.float32)
    got_g = np.asarray(gammaln_fast(jnp.asarray(x)))
    want_g = sp_gammaln(x.astype(np.float64))
    # absolute error floor: the Stirling tail (<3e-7) + f32 evaluation
    # noise of the (y-1/2)ln(y) - y cancellation at moderate y.
    err = np.abs(got_g - want_g)
    rel = err / np.maximum(np.abs(want_g), 1.0)
    assert rel.max() < 5e-6, rel.max()

    got_p = np.asarray(digamma_fast(jnp.asarray(x)))
    want_p = psi(x.astype(np.float64))
    # mixed bound: relative away from psi's root (x ~ 1.46), small
    # absolute floor at it.
    errp = np.abs(got_p - want_p)
    assert (errp <= 2e-5 * np.abs(want_p) + 1e-5).all(), errp.max()

    # f64 inputs fall back to the exact forms (covered end to end by
    # the x64 subprocess gates: tests/test_estep_f64.py and
    # tests/test_svi_f64.py run theta/beta_elbo in float64).
