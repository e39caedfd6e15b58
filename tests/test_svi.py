"""Stochastic VI engine (SURVEY.md section 8.4)."""

import numpy as np
import pytest

from pylda_tpu.corpus import synthetic_corpus
from pylda_tpu.models import StochasticVariationalBayes, VariationalBayes
from pylda_tpu.utils.config import LDAConfig


@pytest.fixture(scope="module")
def corpus():
    c, _, _ = synthetic_corpus(
        num_docs=200, num_topics=5, num_types=150, mean_doc_length=40, seed=4
    )
    return c


def _cfg(mode, **kw):
    base = dict(
        number_of_topics=5,
        inference_mode=mode,
        alpha_alpha=0.2,
        alpha_beta=0.02,
        inner_iterations=30,
        doc_pad_multiple=8,
        batch_size=64,
        tau0=16.0,
        kappa=0.7,
        seed=0,
    )
    base.update(kw)
    return LDAConfig(**base)


def test_svi_rho_schedule():
    cfg = _cfg("svi")
    eng = StochasticVariationalBayes(cfg)
    # rho_t = (tau0 + t)^-kappa decays and satisfies Robbins-Monro.
    rhos = [(cfg.tau0 + t) ** (-cfg.kappa) for t in range(100)]
    assert all(a > b for a, b in zip(rhos, rhos[1:]))
    assert rhos[0] < 1.0
    del eng


def test_svi_approaches_batch_vb(corpus):
    test = corpus.subset(range(20))
    vb = VariationalBayes(_cfg("vb"))
    vb.initialize(corpus)
    svi = StochasticVariationalBayes(_cfg("svi"))
    svi.initialize(corpus)
    for _ in range(10):
        vb.learning()
    for _ in range(10):
        svi.learning()
    pv, ps = vb.perplexity(test), svi.perplexity(test)
    # SVI after 10 epochs should be within 15% of batch VB.
    assert ps < pv * 1.15, (pv, ps)


def test_svi_kappa_validation():
    with pytest.raises(ValueError):
        _cfg("svi", kappa=0.4).validate()


def test_svi_minibatch_counter_advances(corpus):
    svi = StochasticVariationalBayes(_cfg("svi", batch_size=64))
    svi.initialize(corpus)
    svi.learning()
    # 200 docs / 64 per batch → 4 minibatches (last partial, padded).
    assert svi._t == 4
    svi.learning()
    assert svi._t == 8
