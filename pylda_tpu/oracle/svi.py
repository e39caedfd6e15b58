"""Golden NumPy float64 stochastic-VI oracle (Hoffman et al. 2010).

SURVEY.md section 8.4: minibatch B_t, local E-step as batch VB on the
minibatch (inherited from ``OracleVB``), then the natural-gradient
global update

    lambda <- (1 - rho_t) lambda + rho_t (eta + (D / |B_t|) sstats),
    rho_t = (tau0 + t)^(-kappa).

Statistical parity surface for ``pylda_tpu.models.svi``.
"""

from __future__ import annotations

import numpy as np

from pylda_tpu.corpus.corpus import Corpus
from pylda_tpu.oracle.vb import OracleVB


class OracleSVI(OracleVB):
    def __init__(
        self,
        corpus: Corpus,
        num_topics: int,
        alpha,
        eta,
        seed: int = 0,
        batch_size: int = 64,
        tau0: float = 64.0,
        kappa: float = 0.7,
        **kw,
    ):
        super().__init__(corpus, num_topics, alpha, eta, seed=seed, **kw)
        self.batch_size = batch_size
        self.tau0 = tau0
        self.kappa = kappa
        self.t = 0

    def learning(self) -> float:
        """One epoch of shuffled minibatches; returns the scaled
        last-minibatch bound estimate (the SVI objective surrogate)."""
        order = self.rng.permutation(self.D)
        est = 0.0
        for start in range(0, self.D, self.batch_size):
            idx = order[start : start + self.batch_size]
            gamma, sstats, token_score = self.e_step(doc_indices=idx)
            scale = self.D / len(idx)
            rho = (self.tau0 + self.t) ** (-self.kappa)
            self.lam = (1.0 - rho) * self.lam + rho * (
                self.eta[None, :] + scale * sstats
            )
            est = scale * (token_score + self.theta_score(gamma))
            est += self.beta_score()
            self.t += 1
        self._counter += 1
        return est
