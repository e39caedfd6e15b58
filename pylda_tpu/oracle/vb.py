"""Golden NumPy float64 batch-VB oracle.

A fresh implementation of the smoothed mean-field VB updates of SURVEY.md
section 8.1 (Blei/Ng/Jordan 2003; Hoffman et al. 2010 exp-domain
formulation), written from the equations — NOT ported from the reference.
It deliberately keeps the reference's *loop structure* — a per-document
Python loop around a digamma fixed point with per-document early exit
(SURVEY.md section 3.1) — because it doubles as:

1. the correctness oracle the JAX engines are property-tested against
   (SURVEY.md section 4 item 1), and
2. the PyLDA-CPU-style baseline whose docs/sec anchors the >=100x
   throughput target (BASELINE.md "Action item").
"""

from __future__ import annotations

from typing import Optional, Sequence, Tuple

import numpy as np
from scipy.special import gammaln, psi

from pylda_tpu.corpus.corpus import Corpus


def dirichlet_expectation(x: np.ndarray) -> np.ndarray:
    """E[log p] for p ~ Dir(x), along the last axis."""
    if x.ndim == 1:
        return psi(x) - psi(x.sum())
    return psi(x) - psi(x.sum(axis=-1, keepdims=True))


class OracleVB:
    """Batch VB LDA in float64 with per-document inner loops."""

    def __init__(
        self,
        corpus: Corpus,
        num_topics: int,
        alpha: float | np.ndarray,
        eta: float | np.ndarray,
        seed: int = 0,
        inner_iterations: int = 50,
        convergence_threshold: float = 1e-6,
        gamma_init: str = "gamma",
    ):
        self.gamma_init = gamma_init
        self.corpus = corpus
        self.K = num_topics
        self.V = corpus.num_types
        self.D = corpus.num_docs
        self.alpha = (
            np.full(self.K, alpha, dtype=np.float64)
            if np.isscalar(alpha)
            else np.asarray(alpha, dtype=np.float64)
        )
        self.eta = (
            np.full(self.V, eta, dtype=np.float64)
            if np.isscalar(eta)
            else np.asarray(eta, dtype=np.float64)
        )
        self.inner_iterations = inner_iterations
        self.convergence_threshold = convergence_threshold
        self.rng = np.random.default_rng(seed)
        # Reference-style init: lambda ~ Gamma(100, 0.01) (SURVEY.md 3.1).
        self.lam = self.rng.gamma(100.0, 0.01, size=(self.K, self.V))
        self.gamma = self.rng.gamma(100.0, 0.01, size=(self.D, self.K))
        self._counter = 0

    # -- E-step ----------------------------------------------------------------

    def e_step(
        self,
        corpus: Optional[Corpus] = None,
        doc_indices: Optional[Sequence[int]] = None,
    ) -> Tuple[np.ndarray, np.ndarray, float]:
        """Per-document gamma/phi fixed point.

        Returns (gamma [D, K], sstats [K, V], token_score) where
        token_score = sum_d sum_v c_dv log(sum_k expElogtheta_dk
        expElogbeta_kv) — the E[log p(w|theta,beta)] - E[log q(z)] part of
        the bound at the optimal phi.
        """
        corpus = corpus if corpus is not None else self.corpus
        idx = (
            list(range(corpus.num_docs))
            if doc_indices is None
            else [int(i) for i in doc_indices]
        )
        Elogbeta = dirichlet_expectation(self.lam)
        expElogbeta = np.exp(Elogbeta)
        sstats = np.zeros_like(self.lam)
        if self.gamma_init == "ones":
            gamma_out = np.ones((len(idx), self.K))
        else:
            gamma_out = self.rng.gamma(100.0, 0.01, size=(len(idx), self.K))
        token_score = 0.0
        for row, d in enumerate(idx):
            ids, cts = corpus.doc_unique(d)
            if ids.size == 0:
                gamma_out[row] = self.alpha
                continue
            cts = cts.astype(np.float64)
            gamma_d = gamma_out[row]
            expEtheta = np.exp(dirichlet_expectation(gamma_d))
            betad = expElogbeta[:, ids]  # [K, T]
            phinorm = expEtheta @ betad + 1e-100
            for _ in range(self.inner_iterations):
                last = gamma_d
                gamma_d = self.alpha + expEtheta * (betad @ (cts / phinorm))
                expEtheta = np.exp(dirichlet_expectation(gamma_d))
                phinorm = expEtheta @ betad + 1e-100
                if np.mean(np.abs(gamma_d - last)) < self.convergence_threshold:
                    break
            gamma_out[row] = gamma_d
            sstats[:, ids] += np.outer(expEtheta, cts / phinorm)
            token_score += float(cts @ np.log(phinorm))
        sstats *= expElogbeta
        return gamma_out, sstats, token_score

    # -- M-step ----------------------------------------------------------------

    def m_step(self, sstats: np.ndarray) -> None:
        self.lam = self.eta[None, :] + sstats

    # -- bound -----------------------------------------------------------------

    def theta_score(self, gamma: np.ndarray) -> float:
        """Per-document theta ELBO terms under the current alpha."""
        Elogtheta = dirichlet_expectation(gamma)
        s = float(((self.alpha[None, :] - gamma) * Elogtheta).sum())
        s += float(gammaln(gamma).sum() - gammaln(gamma.sum(axis=1)).sum())
        s += gamma.shape[0] * float(
            gammaln(self.alpha.sum()) - gammaln(self.alpha).sum()
        )
        return s

    def beta_score(self) -> float:
        Elogbeta = dirichlet_expectation(self.lam)
        s = float(((self.eta[None, :] - self.lam) * Elogbeta).sum())
        s += float(gammaln(self.lam).sum() - gammaln(self.lam.sum(axis=1)).sum())
        s += self.K * float(gammaln(self.eta.sum()) - gammaln(self.eta).sum())
        return s

    # -- training --------------------------------------------------------------

    def learning(self) -> float:
        """One full VB iteration; returns the ELBO evaluated at (gamma*,
        lambda_used_in_estep) — monotone non-decreasing across iterations."""
        gamma, sstats, token_score = self.e_step()
        elbo = token_score + self.theta_score(gamma) + self.beta_score()
        self.gamma = gamma
        self.m_step(sstats)
        self._counter += 1
        return elbo

    # -- held-out ----------------------------------------------------------------

    def inference(self, test: Corpus) -> Tuple[float, np.ndarray]:
        """Held-out doc bound with lambda frozen (SURVEY.md section 3.4)."""
        gamma, _, token_score = self.e_step(corpus=test)
        ll = token_score + self.theta_score(gamma)
        return ll, gamma

    def perplexity(self, test: Corpus) -> float:
        ll, _ = self.inference(test)
        return float(np.exp(-ll / max(1, test.num_tokens)))

    # -- hyperparameter updates (SURVEY.md section 8.1 Newton) -----------------

    def update_alpha(self, gamma: np.ndarray, iterations: int = 100) -> None:
        """Blei lda-c style Newton with Sherman–Morrison shared Hessian."""
        D = gamma.shape[0]
        ss = dirichlet_expectation(gamma).sum(axis=0)  # sum_d Elogtheta_dk
        alpha = self.alpha.copy()
        for _ in range(iterations):
            g = D * (psi(alpha.sum()) - psi(alpha)) + ss
            h = -D * _trigamma(alpha)
            z = D * _trigamma(alpha.sum())
            c = (g / h).sum() / (1.0 / z + (1.0 / h).sum())
            step = (g - c) / h
            decay = 1.0
            while np.any(alpha - decay * step <= 0) and decay > 1e-10:
                decay *= 0.5
            new_alpha = alpha - decay * step
            if np.any(new_alpha <= 0):  # backtracking bottomed out — keep
                break                   # the old (positive) vector
            if np.max(np.abs(new_alpha - alpha)) < 1e-8:
                alpha = new_alpha
                break
            alpha = new_alpha
        self.alpha = alpha

    def update_eta(self, iterations: int = 100) -> None:
        """Same Newton structure on eta given lambda (treating lambda rows
        as K Dirichlet observations of a V-dim Dirichlet prior)."""
        K = self.lam.shape[0]
        ss = dirichlet_expectation(self.lam).sum(axis=0)
        eta = self.eta.copy()
        for _ in range(iterations):
            g = K * (psi(eta.sum()) - psi(eta)) + ss
            h = -K * _trigamma(eta)
            z = K * _trigamma(eta.sum())
            c = (g / h).sum() / (1.0 / z + (1.0 / h).sum())
            step = (g - c) / h
            decay = 1.0
            while np.any(eta - decay * step <= 0) and decay > 1e-10:
                decay *= 0.5
            new_eta = eta - decay * step
            if np.any(new_eta <= 0):  # backtracking bottomed out — keep
                break                 # the old (positive) vector
            if np.max(np.abs(new_eta - eta)) < 1e-10:
                eta = new_eta
                break
            eta = new_eta
        self.eta = eta


def _trigamma(x: np.ndarray | float) -> np.ndarray:
    from scipy.special import polygamma

    return polygamma(1, x)
