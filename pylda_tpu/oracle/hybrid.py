"""Golden NumPy float64 hybrid-LDA oracle (Mimno/Hoffman/Blei 2012).

Fresh implementation of SURVEY.md section 8.3, written from the
equations: the global lambda update stays variational (inherited from
``OracleVB``), while the per-document local step replaces the gamma/phi
fixed point with collapsed Gibbs sweeps over the document's tokens —
topic-word factor frozen at exp(E[log beta]) within the outer iteration,
doc-topic factor the running within-doc count n_dk^{-n} + alpha.  After
``burn_in_sweeps`` discarded sweeps, indicator counts average over
``number_of_samples`` kept sweeps into the phi-bar sufficient statistics
and the per-document gamma = alpha + mean n_dk.

Role: statistical parity surface for ``pylda_tpu.models.hybrid.Hybrid``
(RNG parity is impossible — SURVEY.md section 7.3 — so tests gate on
perplexity closeness, not chains).
"""

from __future__ import annotations

from typing import Optional, Sequence, Tuple

import numpy as np

from pylda_tpu.corpus.corpus import Corpus
from pylda_tpu.oracle.vb import OracleVB, dirichlet_expectation


class OracleHybrid(OracleVB):
    """VB global step + sampled per-document local step, float64."""

    def __init__(
        self,
        corpus: Corpus,
        num_topics: int,
        alpha,
        eta,
        seed: int = 0,
        number_of_samples: int = 10,
        burn_in_sweeps: int = 5,
        **kw,
    ):
        super().__init__(corpus, num_topics, alpha, eta, seed=seed, **kw)
        self.number_of_samples = number_of_samples
        self.burn_in_sweeps = burn_in_sweeps

    def e_step(
        self,
        corpus: Optional[Corpus] = None,
        doc_indices: Optional[Sequence[int]] = None,
    ) -> Tuple[np.ndarray, np.ndarray, float]:
        corpus = corpus if corpus is not None else self.corpus
        idx = (
            list(range(corpus.num_docs))
            if doc_indices is None
            else [int(i) for i in doc_indices]
        )
        expElogbeta = np.exp(dirichlet_expectation(self.lam))
        sstats = np.zeros_like(self.lam)
        gamma_out = np.tile(self.alpha[None, :], (len(idx), 1))
        token_score = 0.0
        S = self.number_of_samples
        B = self.burn_in_sweeps
        for row, d in enumerate(idx):
            tokens = np.asarray(corpus.docs[d], dtype=np.int64)
            n = tokens.size
            if n == 0:
                continue
            # Random initial assignments, then B + S within-doc sweeps.
            z = self.rng.integers(0, self.K, size=n)
            ndk = np.bincount(z, minlength=self.K).astype(np.float64)
            kept_ndk = np.zeros(self.K)
            kept_kw = np.zeros((self.K, n))  # per-position indicator sums
            for sweep in range(B + S):
                for i in range(n):
                    ndk[z[i]] -= 1.0
                    p = (ndk + self.alpha) * expElogbeta[:, tokens[i]]
                    p /= p.sum()
                    z[i] = self.rng.choice(self.K, p=p)
                    ndk[z[i]] += 1.0
                if sweep >= B:
                    kept_ndk += ndk
                    kept_kw[z, np.arange(n)] += 1.0
            gamma_d = self.alpha + kept_ndk / S
            gamma_out[row] = gamma_d
            # phi-bar sufficient statistics: averaged indicators per
            # (topic, type), accumulated over the doc's token positions.
            for i in range(n):
                sstats[:, tokens[i]] += kept_kw[:, i] / S
            # Token score at the smoothed doc-topic posterior (the same
            # E[log p(w)] surface the VB bound uses at converged gamma).
            expEtheta = np.exp(dirichlet_expectation(gamma_d))
            ids, cts = corpus.doc_unique(d)
            phinorm = expEtheta @ expElogbeta[:, ids] + 1e-100
            token_score += float(cts.astype(np.float64) @ np.log(phinorm))
        return gamma_out, sstats, token_score
