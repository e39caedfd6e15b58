"""Float64 NumPy oracle for stochastic variational inference.

Hoffman et al. 2010 (SURVEY.md section 8.4): per minibatch B_t, a local
E-step exactly as batch VB (OracleVB.e_step over the minibatch's
documents), then the natural-gradient step

    lambda <- (1 - rho_t) lambda + rho_t (eta + (D/|B_t|) sstats),
    rho_t = (tau0 + t)^(-kappa).

Shares the engine's minibatch SCHEDULE by calling the same
``corpus.minibatch_indices(batch_size, seed=epoch_seed)`` the engine
uses (identical permutations by construction), so an x64 run of the JAX
engine must match this oracle's lambda trajectory to rounding — the SVI
analog of tests/test_estep_f64.py's batch-VB equivalence proof.
"""

from __future__ import annotations

import numpy as np

from pylda_tpu.oracle.vb import OracleVB


class OracleSVI(OracleVB):
    """SVI in float64 with per-document inner loops."""

    def __init__(
        self,
        corpus,
        num_topics: int,
        alpha,
        eta,
        seed: int = 0,
        *,
        batch_size: int = 64,
        tau0: float = 64.0,
        kappa: float = 0.7,
        **kw,
    ):
        # seed keeps its historical 5th positional slot; the SVI knobs
        # are keyword-only so positional calls cannot silently bind a
        # seed as a batch size.
        super().__init__(corpus, num_topics, alpha, eta, seed=seed, **kw)
        self.batch_size = int(batch_size)
        self.tau0 = float(tau0)
        self.kappa = float(kappa)
        self.t = 0  # global minibatch counter

    def learning(self, epoch_seed: int | None = None) -> float:
        """One epoch over the corpus; returns the mean per-minibatch
        bound estimate (token + theta terms scaled by D/|B|, plus the
        topic-side beta term at the epoch's final lambda — the engine's
        per-epoch estimator convention).

        ``epoch_seed=None`` draws the epoch's permutation from the
        oracle's own rng (statistical-parity use); passing the engine's
        ``counter * 100003 + seed`` value replays the engine's EXACT
        minibatch schedule (both call the same
        ``corpus.minibatch_indices``) for the x64 equivalence test."""
        if epoch_seed is None:
            order = self.rng.permutation(self.D)
            index_lists = [
                order[s : s + self.batch_size]
                for s in range(0, self.D, self.batch_size)
            ]
        else:
            index_lists = self.corpus.minibatch_indices(
                self.batch_size, seed=epoch_seed
            )
        ests = []
        for sel in index_lists:
            gamma, sstats, token_score = self.e_step(doc_indices=sel)
            scale = self.D / max(1, len(sel))
            rho = (self.tau0 + self.t) ** (-self.kappa)
            self.lam = (1.0 - rho) * self.lam + rho * (
                self.eta[None, :] + scale * sstats
            )
            ests.append(scale * (token_score + self.theta_score(gamma)))
            self.t += 1
        beta = self.beta_score()
        self._counter += 1
        return float(np.mean([e + beta for e in ests]))
