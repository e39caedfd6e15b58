"""Hybrid E-step: ragged gamma sweeps + scatter-free dense sufficient
statistics (ops/estep.estep_dense_sstats; SURVEY.md section 7.1).

The dense-matmul sstats form measured ~4x faster than every TPU scatter
variant (scripts/sstats_variants.py); these tests pin its math to the
ragged scatter path it replaces.
"""

import jax.numpy as jnp
import numpy as np
import pytest

from pylda_tpu.corpus import synthetic_corpus
from pylda_tpu.models import VariationalBayes
from pylda_tpu.ops.dirichlet import exp_dirichlet_expectation
from pylda_tpu.ops.estep import (
    estep_dense_sstats,
    estep_ragged,
    estep_ragged_gamma,
)
from pylda_tpu.utils.config import LDAConfig

K = 5


@pytest.fixture(scope="module")
def big_vocab_corpus():
    """V > dense_vocab_threshold so the engine takes the ragged layout."""
    c, _, _ = synthetic_corpus(
        num_docs=48, num_topics=K, num_types=5000, mean_doc_length=30,
        seed=3,
    )
    return c


@pytest.fixture(scope="module")
def lam_init():
    rng = np.random.default_rng(9)
    return rng.gamma(100.0, 0.01, size=(K, 5000))


def test_op_level_matches_ragged_scatter(big_vocab_corpus, lam_init):
    """Same converged gamma in, the dense-matmul sstats must equal the
    segment-sum scatter sstats and token score."""
    c = big_vocab_corpus
    (bucket,) = c.to_ragged_buckets(doc_pad_multiple=8, bucket_sizes=(64,))
    eeb = exp_dirichlet_expectation(jnp.asarray(lam_init, jnp.float32))
    alpha = jnp.full((K,), 0.2, jnp.float32)
    g0 = jnp.ones((bucket.ids.shape[0], K), jnp.float32)

    g_ref, ss_ref, tok_ref, _ = estep_ragged(
        bucket.ids, bucket.cnts, g0, eeb, alpha,
        num_types=c.num_types, inner_iterations=30,
        convergence_threshold=0.0,
    )
    g_new, _sweeps = estep_ragged_gamma(
        bucket.ids, bucket.cnts, g0, eeb, alpha,
        inner_iterations=30, convergence_threshold=0.0,
    )
    np.testing.assert_allclose(g_new, g_ref, rtol=1e-6)

    dense = c.to_dense(pad_docs_to=bucket.ids.shape[0])
    # Bucket rows are a permutation of documents here (no chunking):
    # realign expEtheta rows to the dense doc order.
    et_rows = exp_dirichlet_expectation(g_new)
    et_docs = np.zeros_like(np.asarray(et_rows))
    valid = np.asarray(bucket.doc_ids) >= 0
    et_docs[np.asarray(bucket.doc_ids)[valid]] = np.asarray(et_rows)[valid]
    ss_new, tok_new = estep_dense_sstats(
        dense.counts, jnp.asarray(et_docs), eeb
    )
    np.testing.assert_allclose(ss_new, ss_ref, rtol=1e-4, atol=1e-6)
    np.testing.assert_allclose(tok_new, tok_ref, rtol=1e-5)


def _engine(corpus, lam_init, **kw):
    cfg = LDAConfig(
        number_of_topics=K, alpha_alpha=0.2, alpha_beta=0.01,
        inner_iterations=30, doc_pad_multiple=8, seed=0,
        gamma_init="ones", **kw,
    )
    eng = VariationalBayes(cfg)
    eng.initialize(corpus, lam_init=lam_init)
    return eng


def test_engine_auto_matches_scatter_unchunked(big_vocab_corpus, lam_init):
    """With no chunked documents the hybrid path is the same math as the
    scatter path — ELBO trajectory and lambda must agree."""
    e_auto = _engine(big_vocab_corpus, lam_init, sstats_mode="auto")
    e_scat = _engine(big_vocab_corpus, lam_init, sstats_mode="scatter")
    assert e_auto._sstats_plan is not None
    assert e_scat._sstats_plan is None
    a = [e_auto.learning() for _ in range(3)]
    s = [e_scat.learning() for _ in range(3)]
    np.testing.assert_allclose(a, s, rtol=1e-5)
    np.testing.assert_allclose(
        e_auto.state.lam, e_scat.state.lam, rtol=1e-4, atol=1e-5
    )
    np.testing.assert_allclose(
        e_auto.gamma, e_scat.gamma, rtol=1e-4, atol=1e-4
    )


def test_engine_auto_chunked_conserves_counts(lam_init):
    """With an oversized document (chunked into multiple bucket rows)
    the hybrid path recombines per-document gamma; the M-step must still
    conserve total token mass: sum(lam - eta) == corpus tokens."""
    from pylda_tpu.corpus.corpus import Corpus

    base, _, _ = synthetic_corpus(
        num_docs=24, num_topics=K, num_types=5000, mean_doc_length=30,
        seed=5,
    )
    # Oversize doc 0 well past the largest bucket (uniques cache is
    # built at construction, so rebuild the corpus with the long doc).
    rng = np.random.default_rng(0)
    ids = rng.choice(5000, size=150, replace=False).astype(np.int32)
    docs = list(base.docs)
    docs[0] = np.repeat(ids, 2).astype(np.int32)
    c = Corpus(docs, base.vocab)
    eng = _engine(
        c, lam_init, sstats_mode="auto", bucket_sizes=(32, 64),
    )
    assert eng._sstats_plan is not None
    # At least one doc must actually be chunked for this test to bite.
    row_ids = np.concatenate(
        [np.asarray(b.doc_ids) for b in eng._batches]
    )
    row_ids = row_ids[row_ids >= 0]
    assert len(row_ids) > len(np.unique(row_ids)), "expected chunked rows"
    elbos = [eng.learning() for _ in range(3)]
    assert elbos[-1] > elbos[0]  # bound improves
    total = sum(len(d) for d in c.docs)
    lam = np.asarray(eng.state.lam)
    eta = np.asarray(eng.state.eta)
    np.testing.assert_allclose(
        (lam - eta[None, :]).sum(), total, rtol=1e-4
    )


def test_total_budget_gate_falls_back_to_scatter(big_vocab_corpus, lam_init):
    """A corpus whose full dense matrix exceeds the total HBM budget must
    keep the scatter path."""
    eng = _engine(
        big_vocab_corpus, lam_init, sstats_mode="auto",
        sstats_dense_total_budget_mb=0,
    )
    assert eng._sstats_plan is None
    eng.learning()  # still trains


def test_factor_layouts_agree(big_vocab_corpus, lam_init):
    """The kdt ([K, D, T]) and dtk ([D, T, K]) factor layouts are the
    same math — gamma fixed points must agree to f32 arithmetic noise.
    (kdt ships below K=64 on accelerators, where XLA lowers the dtk
    contraction as multiply+reduce fusions with >=2x lane waste —
    measured 2-2.7x; see ops/estep._factor_layout.)"""
    import jax.numpy as jnp

    from pylda_tpu.ops.estep import _ragged_sweep_loop

    c = big_vocab_corpus
    (bucket,) = c.to_ragged_buckets(doc_pad_multiple=8, bucket_sizes=(64,))
    eeb = exp_dirichlet_expectation(jnp.asarray(lam_init, jnp.float32))
    alpha = jnp.full((K,), 0.2, jnp.float32)
    g0 = jnp.ones((bucket.ids.shape[0], K), jnp.float32)
    outs = {}
    for layout in ("dtk", "kdt"):
        _i, g = _ragged_sweep_loop(
            bucket.ids, bucket.cnts, g0, eeb, alpha,
            20, 0.0, 1e-30, jnp.float32, jnp.float32,
            layout=layout,
        )
        outs[layout] = np.asarray(g)
    np.testing.assert_allclose(outs["kdt"], outs["dtk"], rtol=2e-5)
