"""Golden NumPy collapsed-Gibbs oracle.

Fresh implementation of the Griffiths & Steyvers 2004 collapsed Gibbs
sampler and the Wallach slice-sampled hyperparameter optimization, from the
equations in SURVEY.md section 8.2 — not ported.  Used for:

1. count-table invariant tests and joint-likelihood cross-checks against
   the JAX sampling engines (SURVEY.md section 4 items 1-2), and
2. the per-token-Python-loop CPU baseline (reference call stack SURVEY.md
   section 3.2).
"""

from __future__ import annotations



import numpy as np
from scipy.special import gammaln

from pylda_tpu.corpus.corpus import Corpus


class OracleGibbs:
    """Per-token collapsed Gibbs sampling in pure NumPy."""

    def __init__(
        self,
        corpus: Corpus,
        num_topics: int,
        alpha: float | np.ndarray,
        beta: float | np.ndarray,
        seed: int = 0,
    ):
        self.corpus = corpus
        self.K = num_topics
        self.V = corpus.num_types
        self.D = corpus.num_docs
        self.alpha = (
            np.full(self.K, alpha, dtype=np.float64)
            if np.isscalar(alpha)
            else np.asarray(alpha, dtype=np.float64)
        )
        self.beta = (
            np.full(self.V, beta, dtype=np.float64)
            if np.isscalar(beta)
            else np.asarray(beta, dtype=np.float64)
        )
        self.rng = np.random.default_rng(seed)
        # Random topic assignment for every token; build the count tables.
        self.z = [
            self.rng.integers(0, self.K, size=doc.size).astype(np.int32)
            for doc in corpus.docs
        ]
        self.n_dk = np.zeros((self.D, self.K), dtype=np.int64)
        self.n_kv = np.zeros((self.K, self.V), dtype=np.int64)
        self.n_k = np.zeros((self.K,), dtype=np.int64)
        for d, (doc, zd) in enumerate(zip(corpus.docs, self.z)):
            for w, k in zip(doc, zd):
                self.n_dk[d, k] += 1
                self.n_kv[k, w] += 1
                self.n_k[k] += 1
        self._counter = 0

    def sweep(self) -> None:
        """One full Gibbs sweep over every token (SURVEY.md section 3.2)."""
        beta_sum = self.beta.sum()
        for d, (doc, zd) in enumerate(zip(self.corpus.docs, self.z)):
            ndk = self.n_dk[d]
            for n in range(doc.size):
                w = doc[n]
                k_old = zd[n]
                ndk[k_old] -= 1
                self.n_kv[k_old, w] -= 1
                self.n_k[k_old] -= 1
                p = (ndk + self.alpha) * (
                    (self.n_kv[:, w] + self.beta[w]) / (self.n_k + beta_sum)
                )
                p /= p.sum()
                k_new = int(self.rng.choice(self.K, p=p))
                zd[n] = k_new
                ndk[k_new] += 1
                self.n_kv[k_new, w] += 1
                self.n_k[k_new] += 1

    def learning(self) -> float:
        self.sweep()
        self._counter += 1
        return self.log_likelihood(self.alpha, self.beta)

    def log_likelihood(
        self, alpha: np.ndarray, beta: np.ndarray
    ) -> float:
        """Joint log p(w, z | alpha, beta) per SURVEY.md section 8.2."""
        alpha = np.broadcast_to(np.asarray(alpha, np.float64), (self.K,))
        beta = np.broadcast_to(np.asarray(beta, np.float64), (self.V,))
        beta_sum = beta.sum()
        alpha_sum = alpha.sum()
        n_d = self.n_dk.sum(axis=1)
        s = self.K * (gammaln(beta_sum) - gammaln(beta).sum())
        s += gammaln(self.n_kv + beta[None, :]).sum()
        s -= gammaln(self.n_k + beta_sum).sum()
        s += self.D * (gammaln(alpha_sum) - gammaln(alpha).sum())
        s += gammaln(self.n_dk + alpha[None, :]).sum()
        s -= gammaln(n_d + alpha_sum).sum()
        return float(s)

    # -- Wallach slice sampler (SURVEY.md section 8.2) --------------------------

    def optimize_hyperparameters(
        self, samples: int = 5, step: float = 3.0
    ) -> None:
        """Slice sampling on (log alpha_scalar, log beta_scalar).

        The reference treats alpha/beta as symmetric scalars for hyperopt
        (upstream:monte_carlo.py optimize_hyperparameters [UNVERIFIED]);
        each accepted sample rescales the full vectors.
        """
        x0 = np.array(
            [np.log(self.alpha.mean()), np.log(self.beta.mean())]
        )
        for _ in range(samples):
            ll0 = self.log_likelihood(np.exp(x0[0]), np.exp(x0[1]))
            log_u = ll0 + np.log(self.rng.random())
            lo = x0 - step * self.rng.random(2)
            hi = lo + step
            while True:
                x1 = lo + self.rng.random(2) * (hi - lo)
                ll1 = self.log_likelihood(np.exp(x1[0]), np.exp(x1[1]))
                if ll1 > log_u:
                    x0 = x1
                    break
                # Shrink the bracket toward the current point.
                lo = np.where(x1 < x0, x1, lo)
                hi = np.where(x1 >= x0, x1, hi)
        self.alpha = np.full(self.K, np.exp(x0[0]))
        self.beta = np.full(self.V, np.exp(x0[1]))

    # -- point estimates ---------------------------------------------------------

    def phi_hat(self) -> np.ndarray:
        """(n_kv + beta) / (n_k + sum beta) topic-word point estimate."""
        return (self.n_kv + self.beta[None, :]) / (
            self.n_k[:, None] + self.beta.sum()
        )

    def theta_hat(self) -> np.ndarray:
        num = self.n_dk + self.alpha[None, :]
        return num / num.sum(axis=1, keepdims=True)

    def inference(
        self,
        test_corpus: Corpus,
        burn_in: int = 5,
        num_samples: int = 10,
        seed: int = 1,
    ) -> tuple:
        """Held-out scoring with the same convention as
        models/gibbs.py::MonteCarlo.inference (documented there; the
        reference recipe is [UNVERIFIED]): per test document, within-doc
        Gibbs against the FROZEN phi_hat point estimate, gamma = alpha +
        mean n_dk over kept sweeps, token score sum_t log(theta_hat @
        phi_hat[:, w_t]).  Returns (log_likelihood, gamma [D, K])."""
        phi = self.phi_hat()
        rng = np.random.default_rng(seed)
        K = self.K
        gamma = np.tile(self.alpha[None, :], (test_corpus.num_docs, 1))
        ll = 0.0
        for d, doc in enumerate(test_corpus.docs):
            if doc.size == 0:
                continue
            z = rng.integers(0, K, size=doc.size)
            ndk = np.bincount(z, minlength=K).astype(np.float64)
            acc = np.zeros(K, dtype=np.float64)
            kept = 0
            for s in range(burn_in + num_samples):
                for n in range(doc.size):
                    w = int(doc[n])
                    ndk[z[n]] -= 1.0
                    p = (ndk + self.alpha) * phi[:, w]
                    p /= p.sum()
                    z[n] = int(rng.choice(K, p=p))
                    ndk[z[n]] += 1.0
                if s >= burn_in:
                    acc += ndk
                    kept += 1
            g = self.alpha + acc / max(kept, 1)
            gamma[d] = g
            theta = g / g.sum()
            ll += float(np.log(theta @ phi[:, doc]).sum())
        return ll, gamma

    def check_invariants(self) -> None:
        """Count-table conservation (SURVEY.md section 4 item 2)."""
        doc_lens = np.array([d.size for d in self.corpus.docs])
        assert (self.n_dk.sum(axis=1) == doc_lens).all()
        assert self.n_kv.sum() == doc_lens.sum()
        assert (self.n_kv.sum(axis=1) == self.n_k).all()
        assert (self.n_dk >= 0).all() and (self.n_kv >= 0).all()
