"""Inverse-CDF categorical sampler: distributional parity with gumbel.

``sample_doc_topics(sampler="cdf")`` draws from the same per-position
conditional as the gumbel path (p proportional to (n_dk + alpha) *
phi[:, w]) via inverse-CDF with one pregenerated uniform per token.
Different random stream — parity is distributional, pinned here on a
single-token-per-doc design where the exact categorical is known in
closed form.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from pylda_tpu.ops.sampling import sample_doc_topics

K, V, D = 7, 13, 40_000


@pytest.mark.parametrize("sampler", ["cdf", "gumbel", "race"])
def test_single_token_matches_exact_categorical(sampler):
    """D one-token docs, all the same word, ndk=0 after decrement: the
    conditional is exactly p_k = alpha_k * phi_kw / sum; the empirical
    topic histogram over D docs must match it."""
    rng = np.random.default_rng(0)
    word = 5
    tokens = jnp.full((D, 1), word, dtype=jnp.int32)
    mask = jnp.ones((D, 1), dtype=jnp.float32)
    log_tw = jnp.asarray(
        np.log(rng.dirichlet(np.ones(V), size=K)), dtype=jnp.float32
    )
    alpha = jnp.asarray(rng.uniform(0.1, 2.0, size=K), dtype=jnp.float32)
    z0 = jnp.zeros((D, 1), dtype=jnp.int32)
    _g, _ss, z, _ndk = sample_doc_topics(
        tokens, mask, log_tw, alpha, z0, jax.random.PRNGKey(3),
        num_topics=K, num_types=V, burn_in=0, num_samples=1,
        sampler=sampler,
    )
    counts = np.bincount(np.asarray(z).ravel(), minlength=K)
    p = np.asarray(alpha) * np.exp(np.asarray(log_tw))[:, word]
    p = p / p.sum()
    emp = counts / D
    # 4-sigma binomial band per topic.
    tol = 4 * np.sqrt(p * (1 - p) / D)
    assert (np.abs(emp - p) < tol + 1e-3).all(), (emp, p)


def test_cdf_extreme_log_factor_no_underflow():
    """Columns of log_tw far below f32 exp range (hybrid E[log beta] on
    rare words) must still sample: per-word max-normalisation keeps one
    entry at exp(0)."""
    tokens = jnp.zeros((64, 4), dtype=jnp.int32)
    mask = jnp.ones((64, 4), dtype=jnp.float32)
    log_tw = jnp.full((5, 3), -500.0, dtype=jnp.float32)
    log_tw = log_tw.at[2, 0].set(-480.0)  # word 0: topic 2 dominates
    alpha = jnp.ones((5,), dtype=jnp.float32)
    z0 = jnp.zeros((64, 4), dtype=jnp.int32)
    _g, _ss, z, ndk = sample_doc_topics(
        tokens, mask, log_tw, alpha, z0, jax.random.PRNGKey(0),
        num_topics=5, num_types=3, burn_in=0, num_samples=1,
        sampler="cdf",
    )
    z = np.asarray(z)
    assert np.isfinite(np.asarray(ndk)).all()
    # Topic 2's factor is e^20 times the rest: ~all draws land there.
    assert (z == 2).mean() > 0.95


@pytest.mark.parametrize("sampler", ["race", "cdf"])
def test_large_k_single_token_matches_exact_categorical(sampler):
    """Distributional parity at a config-5-adjacent K (auto resolves to
    race there): empirical topic histogram vs the closed-form
    categorical, chi-square-style 4-sigma band on the head topics."""
    K_big, D_big = 600, 60_000
    rng = np.random.default_rng(2)
    word = 1
    tokens = jnp.full((D_big, 1), word, dtype=jnp.int32)
    mask = jnp.ones((D_big, 1), dtype=jnp.float32)
    log_tw = jnp.asarray(
        np.log(rng.dirichlet(np.ones(5), size=K_big)), dtype=jnp.float32
    )
    alpha = jnp.asarray(
        rng.uniform(0.1, 2.0, size=K_big), dtype=jnp.float32
    )
    z0 = jnp.zeros((D_big, 1), dtype=jnp.int32)
    _g, _ss, z, _ndk = sample_doc_topics(
        tokens, mask, log_tw, alpha, z0, jax.random.PRNGKey(11),
        num_topics=K_big, num_types=5, burn_in=0, num_samples=1,
        sampler=sampler,
    )
    counts = np.bincount(np.asarray(z).ravel(), minlength=K_big)
    p = np.asarray(alpha) * np.exp(np.asarray(log_tw))[:, word]
    p = p / p.sum()
    emp = counts / D_big
    tol = 4 * np.sqrt(p * (1 - p) / D_big)
    assert (np.abs(emp - p) < tol + 2e-4).all(), (
        np.abs(emp - p).max(), tol.max()
    )


@pytest.mark.parametrize("sampler", ["cdf", "gumbel", "race"])
@pytest.mark.parametrize("block", [2, 4, 7])
def test_blocked_sampler_conserves_counts(sampler, block):
    """block_positions > 1 (incl. a non-divisor of L, forcing padding)
    must keep padding frozen and counts exactly conserved."""
    rng = np.random.default_rng(3)
    D2, L = 16, 9
    tokens = jnp.asarray(rng.integers(0, V, size=(D2, L)), dtype=jnp.int32)
    mask = (jnp.arange(L)[None, :] < jnp.asarray(
        rng.integers(1, L + 1, size=(D2, 1)))).astype(jnp.float32)
    log_tw = jnp.asarray(
        np.log(rng.dirichlet(np.ones(V), size=K)), dtype=jnp.float32
    )
    alpha = jnp.full((K,), 0.3, dtype=jnp.float32)
    z0 = jnp.asarray(rng.integers(0, K, size=(D2, L)), dtype=jnp.int32)
    _g, ss, z, ndk = sample_doc_topics(
        tokens, mask, log_tw, alpha, z0, jax.random.PRNGKey(7),
        num_topics=K, num_types=V, burn_in=1, num_samples=2,
        sampler=sampler, block_positions=block,
    )
    z = np.asarray(z)
    assert z.shape == (D2, L)
    np.testing.assert_array_equal(
        z[np.asarray(mask) == 0], np.asarray(z0)[np.asarray(mask) == 0]
    )
    np.testing.assert_allclose(
        np.asarray(ndk).sum(axis=1), np.asarray(mask).sum(axis=1), rtol=1e-6
    )
    np.testing.assert_allclose(
        float(np.asarray(ss).sum()), float(np.asarray(mask).sum()), rtol=1e-5
    )


@pytest.mark.parametrize("sampler", ["cdf", "gumbel", "race"])
def test_blocked_single_token_matches_exact_categorical(sampler):
    """With one real token per doc, blocking cannot change the
    conditional (the rest of the block is padding): the empirical
    histogram must still match the closed-form categorical."""
    rng = np.random.default_rng(4)
    word = 5
    tokens = jnp.full((D, 4), word, dtype=jnp.int32)
    mask = jnp.concatenate(
        [jnp.ones((D, 1)), jnp.zeros((D, 3))], axis=1
    ).astype(jnp.float32)
    log_tw = jnp.asarray(
        np.log(rng.dirichlet(np.ones(V), size=K)), dtype=jnp.float32
    )
    alpha = jnp.asarray(rng.uniform(0.1, 2.0, size=K), dtype=jnp.float32)
    z0 = jnp.zeros((D, 4), dtype=jnp.int32)
    _g, _ss, z, _ndk = sample_doc_topics(
        tokens, mask, log_tw, alpha, z0, jax.random.PRNGKey(5),
        num_topics=K, num_types=V, burn_in=0, num_samples=1,
        sampler=sampler, block_positions=4,
    )
    counts = np.bincount(np.asarray(z)[:, 0].ravel(), minlength=K)
    p = np.asarray(alpha) * np.exp(np.asarray(log_tw))[:, word]
    p = p / p.sum()
    emp = counts / D
    tol = 4 * np.sqrt(p * (1 - p) / D)
    assert (np.abs(emp - p) < tol + 1e-3).all(), (emp, p)


def test_auto_sampler_resolves_by_cost_model():
    """topic_sampler="auto" picks cdf below the calibrated crossover
    K*(B) = 680 + 170/B (scripts/sampler_grid.py, 22-cell on-chip grid)
    and gumbel above; the crossover moves with the block size through
    the RNG-amortisation term; explicit values pass through
    untouched."""
    from pylda_tpu.utils.config import LDAConfig

    assert LDAConfig(number_of_topics=100).resolved_topic_sampler() == "cdf"
    # B=8 default: K* = 701
    assert LDAConfig(number_of_topics=700).resolved_topic_sampler() == "cdf"
    assert (
        LDAConfig(number_of_topics=710).resolved_topic_sampler() == "gumbel"
    )
    # B=1: K* = 850 — a K=800 run flips sampler with the block size
    assert (
        LDAConfig(number_of_topics=800, sampler_block_positions=1)
        .resolved_topic_sampler()
        == "cdf"
    )
    assert (
        LDAConfig(number_of_topics=800).resolved_topic_sampler() == "gumbel"
    )
    assert (
        LDAConfig(number_of_topics=1000).resolved_topic_sampler() == "gumbel"
    )
    assert (
        LDAConfig(number_of_topics=1000, topic_sampler="race")
        .resolved_topic_sampler()
        == "race"
    )


@pytest.mark.parametrize("sampler", ["cdf", "gumbel", "race"])
def test_mask_and_count_conservation(sampler):
    """Padding rows/positions never move; ndk sums stay at doc lengths."""
    rng = np.random.default_rng(1)
    D2, L = 16, 9
    tokens = jnp.asarray(rng.integers(0, V, size=(D2, L)), dtype=jnp.int32)
    mask = (jnp.arange(L)[None, :] < jnp.asarray(
        rng.integers(1, L + 1, size=(D2, 1)))).astype(jnp.float32)
    log_tw = jnp.asarray(
        np.log(rng.dirichlet(np.ones(V), size=K)), dtype=jnp.float32
    )
    alpha = jnp.full((K,), 0.3, dtype=jnp.float32)
    z0 = jnp.asarray(rng.integers(0, K, size=(D2, L)), dtype=jnp.int32)
    _g, ss, z, ndk = sample_doc_topics(
        tokens, mask, log_tw, alpha, z0, jax.random.PRNGKey(7),
        num_topics=K, num_types=V, burn_in=1, num_samples=2,
        sampler=sampler,
    )
    z = np.asarray(z)
    np.testing.assert_array_equal(
        z[np.asarray(mask) == 0], np.asarray(z0)[np.asarray(mask) == 0]
    )
    np.testing.assert_allclose(
        np.asarray(ndk).sum(axis=1), np.asarray(mask).sum(axis=1), rtol=1e-6
    )
    np.testing.assert_allclose(
        float(np.asarray(ss).sum()), float(np.asarray(mask).sum()), rtol=1e-5
    )
