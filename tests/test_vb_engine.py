"""JAX VB engine vs the float64 oracle (SURVEY.md section 4 items 1-2)."""

import numpy as np
import pytest

from pylda_tpu.corpus import synthetic_corpus
from pylda_tpu.models import VariationalBayes
from pylda_tpu.oracle import OracleVB
from pylda_tpu.utils.config import LDAConfig


@pytest.fixture(scope="module")
def corpus():
    c, _, _ = synthetic_corpus(
        num_docs=64, num_topics=5, num_types=120, mean_doc_length=40, seed=7
    )
    return c


@pytest.fixture(scope="module")
def lam_init():
    rng = np.random.default_rng(42)
    return rng.gamma(100.0, 0.01, size=(5, 120))


def _engine(corpus, lam_init, **kw):
    cfg = LDAConfig(
        number_of_topics=5,
        alpha_alpha=0.2,
        alpha_beta=0.01,
        inner_iterations=100,
        convergence_threshold=1e-7,
        doc_pad_multiple=8,
        seed=0,
        gamma_init="ones",
        **kw,
    )
    eng = VariationalBayes(cfg)
    eng.initialize(corpus, lam_init=lam_init)
    return eng


@pytest.fixture(scope="module")
def trained_pair(corpus, lam_init):
    """Engine and oracle trained 3 iterations from the same lambda."""
    eng = _engine(corpus, lam_init)
    ora = OracleVB(
        corpus, num_topics=5, alpha=0.2, eta=0.01, seed=0,
        inner_iterations=100, convergence_threshold=1e-9,
        gamma_init="ones",
    )
    ora.lam = lam_init.copy()
    e_elbos = [eng.learning() for _ in range(3)]
    o_elbos = [ora.learning() for _ in range(3)]
    return eng, ora, e_elbos, o_elbos


def test_elbo_matches_oracle(trained_pair):
    _, _, e_elbos, o_elbos = trained_pair
    for e, o in zip(e_elbos, o_elbos):
        assert abs(e - o) / abs(o) < 5e-4, (e, o)


def test_topics_match_oracle_one_step(corpus, lam_init):
    """After ONE iteration from identical (lambda, gamma) the normalised
    topic-word distributions must agree to f32 arithmetic tolerance.
    (Multi-iteration trajectories amplify f32-vs-f64 rounding through the
    nonconvex dynamics into different-but-equally-good optima — those are
    compared via ELBO/perplexity, not cellwise; SURVEY.md section 7.3.)"""
    eng = _engine(corpus, lam_init)
    ora = OracleVB(
        corpus, num_topics=5, alpha=0.2, eta=0.01, seed=0,
        inner_iterations=100, convergence_threshold=1e-9,
        gamma_init="ones",
    )
    ora.lam = lam_init.copy()
    eng.learning()
    ora.learning()
    beta_e = eng.topic_word_distribution()
    # Same estimator as the engine export: exp(E[log beta]) normalised
    # (the reference's exp_beta convention, SURVEY.md section 3.5).
    from pylda_tpu.oracle.vb import dirichlet_expectation as _de

    elog_o = _de(ora.lam)
    e_o = np.exp(elog_o - elog_o.max(axis=1, keepdims=True))
    beta_o = e_o / e_o.sum(axis=1, keepdims=True)
    np.testing.assert_allclose(beta_e, beta_o, atol=3e-3)
    # Top-word lists — the BASELINE.json:5 parity surface — must agree.
    top_e = np.argsort(-beta_e, axis=1)[:, :10]
    top_o = np.argsort(-beta_o, axis=1)[:, :10]
    for k in range(5):
        assert len(set(top_e[k]) & set(top_o[k])) >= 9, k


def test_perplexity_within_one_percent(trained_pair, corpus):
    """The BASELINE.json:5 parity gate at small scale."""
    eng, ora, _, _ = trained_pair
    test = corpus.subset(range(12))
    pe = eng.perplexity(test)
    po = ora.perplexity(test)
    assert abs(pe - po) / po < 0.01, (pe, po)


def test_gamma_row_sums(trained_pair, corpus):
    """gamma rows sum to sum(alpha) + doc length (SURVEY.md section 4.2)."""
    eng, _, _, _ = trained_pair
    doc_lens = np.array([d.size for d in corpus.docs], dtype=np.float64)
    sums = eng.gamma.sum(axis=1)
    # f32 fixed-point limit cycles bound the residual (~1e-3 relative);
    # the exact identity is asserted at f64 in test_estep_f64.py.
    np.testing.assert_allclose(sums, 0.2 * 5 + doc_lens, rtol=5e-3)


def test_lambda_floor(trained_pair):
    eng, _, _, _ = trained_pair
    assert float(eng.state.lam.min()) >= 0.01 - 1e-6


def test_bfloat16_compute_matches_f32(corpus, lam_init):
    """Mixed-precision E-step (bf16 contraction inputs, f32 accumulate):
    perplexity must track the f32 path closely (BASELINE.json:5 parity
    is judged on perplexity)."""
    engines = {}
    for cd in ("float32", "bfloat16"):
        eng = _engine(corpus, lam_init, compute_dtype=cd)
        for _ in range(6):
            elbo = eng.learning()
        engines[cd] = (eng, elbo)
    e32, b32 = engines["float32"]
    e16, b16 = engines["bfloat16"]
    assert abs(b32 - b16) / abs(b32) < 2e-3, (b32, b16)
    test = corpus.subset(range(12))
    p32, p16 = e32.perplexity(test), e16.perplexity(test)
    assert abs(p32 - p16) / p32 < 5e-3, (p32, p16)


def test_elbo_monotone(corpus, lam_init):
    eng = _engine(corpus, lam_init)
    elbos = [eng.learning() for _ in range(6)]
    diffs = np.diff(elbos)
    assert (diffs > -1e-4 * abs(elbos[0])).all(), elbos


def test_ragged_path_matches_dense(corpus, lam_init):
    """Forcing the large-vocab ragged layout must not change the math."""
    dense = _engine(corpus, lam_init)
    ragged = _engine(
        corpus, lam_init, dense_vocab_threshold=0, bucket_sizes=(32, 64, 128)
    )
    e_d = dense.learning()
    e_r = ragged.learning()
    # One step from identical state: ELBO and normalised topics must agree
    # to f32 tolerance (multi-step cellwise comparison is chaotic — see
    # test_topics_match_oracle_one_step; exact equality of the two layouts
    # is proven at f64 in test_estep_f64.py).
    assert abs(e_d - e_r) / abs(e_d) < 5e-4, (e_d, e_r)
    np.testing.assert_allclose(
        dense.topic_word_distribution(),
        ragged.topic_word_distribution(),
        atol=3e-3,
    )


def test_hyperopt_newton_improves_alpha(corpus, lam_init):
    eng = _engine(corpus, lam_init, hyper_parameter_optimize_interval=2)
    for _ in range(4):
        eng.learning()
    alpha = np.asarray(eng.state.alpha)
    eta = np.asarray(eng.state.eta)
    assert (alpha > 0).all() and (eta > 0).all()
    # Newton moved alpha off the symmetric init.
    assert not np.allclose(alpha, 0.2)


def test_alpha_newton_matches_oracle(corpus, lam_init):
    from pylda_tpu.ops.hyper import newton_dirichlet_mle
    import jax.numpy as jnp
    from pylda_tpu.oracle.vb import dirichlet_expectation as de

    ora = OracleVB(corpus, num_topics=5, alpha=0.3, eta=0.01, seed=0)
    ora.lam = lam_init.copy()
    for _ in range(3):
        ora.learning()
    elog_sum = de(ora.gamma).sum(axis=0)
    got = np.asarray(
        newton_dirichlet_mle(
            jnp.asarray(ora.alpha, jnp.float32),
            jnp.asarray(elog_sum, jnp.float32),
            jnp.asarray(float(corpus.num_docs)),
        )
    )
    ora.update_alpha(ora.gamma)
    np.testing.assert_allclose(got, ora.alpha, rtol=2e-2)


def test_phase_timings_all_engines(corpus):
    """The per-phase observability surface (SURVEY.md section 5
    tracing): every engine reports positive phase times that include an
    E-step/sweep entry."""
    from pylda_tpu.models import make_engine
    from pylda_tpu.utils.config import LDAConfig

    for mode in ("vb", "gibbs", "hybrid", "svi"):
        eng = make_engine(
            LDAConfig(
                number_of_topics=5, inference_mode=mode, batch_size=16,
                inner_iterations=10, number_of_samples=2, burn_in_sweeps=1,
                seed=0,
            )
        )
        eng.initialize(corpus)
        times = eng.phase_timings(repeats=1)
        assert times, mode
        assert all(v >= 0 for v in times.values()), (mode, times)
        assert any(
            k.startswith(("estep", "gibbs_sweep", "svi_minibatch"))
            for k in times
        ), (mode, times)


def test_gamma_init_normal_mode(corpus):
    """gamma_init="normal" (CLT surrogate for the Gamma(100)*0.01 init)
    must be strictly positive and train to the same quality."""
    import jax
    import jax.numpy as jnp

    from pylda_tpu.models.vb import _gamma_init

    g = _gamma_init(jax.random.PRNGKey(0), (512, 32), jnp.float32, "normal")
    assert float(g.min()) >= 0.2
    assert abs(float(g.mean()) - 1.0) < 0.02
    cfgs = {
        m: LDAConfig(number_of_topics=10, inference_mode="vb", seed=0,
                     gamma_init=m)
        for m in ("gamma", "normal")
    }
    perp = {}
    for m, cfg in cfgs.items():
        eng = VariationalBayes(cfg)
        eng.initialize(corpus)
        eng.learning_many(12)
        perp[m] = eng.perplexity(corpus.subset(range(32)))
    # Same basin quality within noise (different random inits).
    assert abs(perp["gamma"] - perp["normal"]) / perp["gamma"] < 0.05, perp


def _recovery_overlap(true_beta, est, top_n=10):
    import numpy as np

    K = true_beta.shape[0]
    true_top = np.argsort(-true_beta, axis=1)[:, :top_n]
    est_top = np.argsort(-est, axis=1)[:, :top_n]
    overlaps = np.zeros((K, K))
    for i in range(K):
        for j in range(K):
            overlaps[i, j] = len(
                set(true_top[i].tolist()) & set(est_top[j].tolist())
            )
    return overlaps.max(axis=1)


def test_vb_engine_topic_recovery():
    """Planted-topic recovery on the JAX VB ENGINE itself (the oracle
    variant lives in test_oracle.py; SURVEY.md section 4 item 3 asks it
    of every engine)."""
    import numpy as np

    from pylda_tpu.corpus.synthetic import synthetic_corpus
    from pylda_tpu.models import make_engine
    from pylda_tpu.utils.config import LDAConfig

    K, V = 4, 80
    corpus, true_beta, _ = synthetic_corpus(
        num_docs=200, num_topics=K, num_types=V,
        mean_doc_length=80, alpha=0.08, beta_concentration=0.03, seed=13,
    )
    eng = make_engine(LDAConfig(
        number_of_topics=K, inference_mode="vb",
        alpha_alpha=0.1, alpha_beta=0.01, seed=1,
    ))
    eng.initialize(corpus)
    eng.learning_many(40)
    best = _recovery_overlap(true_beta, eng.topic_word_distribution())
    assert (best >= 4).all(), best
    assert best.mean() >= 6.5, best


def test_svi_engine_topic_recovery():
    """Planted-topic recovery for the SVI engine (minibatch
    natural-gradient path) — the fourth engine family."""
    from pylda_tpu.corpus.synthetic import synthetic_corpus
    from pylda_tpu.models import make_engine
    from pylda_tpu.utils.config import LDAConfig

    K, V = 4, 80
    corpus, true_beta, _ = synthetic_corpus(
        num_docs=200, num_topics=K, num_types=V,
        mean_doc_length=80, alpha=0.08, beta_concentration=0.03, seed=13,
    )
    eng = make_engine(LDAConfig(
        number_of_topics=K, inference_mode="svi", batch_size=64,
        tau0=16.0, kappa=0.7, alpha_alpha=0.1, alpha_beta=0.01, seed=1,
    ))
    eng.initialize(corpus)
    eng.learning_many(40)
    best = _recovery_overlap(true_beta, eng.topic_word_distribution())
    assert (best >= 4).all(), best
    assert best.mean() >= 6.5, best


def test_memory_budget_chunking_is_math_invariant():
    """Row chunking (estep_memory_budget_mb) partitions independent
    per-document fixed points; at pinned sweep counts (threshold=0) the
    chunk layout must not change the math — only float summation order.
    (At the shipping threshold/stall exits, chunk granularity is a
    legitimate CONVERGENCE lever: each chunk exits on its own rows.)"""
    import numpy as np

    from pylda_tpu.corpus.synthetic import synthetic_corpus
    from pylda_tpu.models import make_engine
    from pylda_tpu.utils.config import LDAConfig

    corpus, _, _ = synthetic_corpus(
        num_docs=256, num_topics=8, num_types=6000, mean_doc_length=60,
        seed=5,
    )
    runs = {}
    for mb in (512, 1):  # 1 MB forces many row chunks
        eng = make_engine(LDAConfig(
            number_of_topics=8, inference_mode="vb", seed=0,
            convergence_threshold=0.0, inner_iterations=15,
            estep_memory_budget_mb=mb,
        ))
        eng.initialize(corpus)
        elbos = eng.learning_many(3)
        runs[mb] = (np.asarray(eng.state.lam), elbos)
    # Measured: ELBOs come out BITWISE identical; lambda differs only
    # in summation order on near-floor entries (max 3.3e-5 relative at
    # eta = 1/V magnitudes, mean 5e-8).
    assert runs[512][1] == runs[1][1], (runs[512][1], runs[1][1])
    np.testing.assert_allclose(
        runs[512][0], runs[1][0], rtol=1e-4, atol=1e-6
    )
