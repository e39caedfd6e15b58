"""Stochastic variational inference (minibatch) engine.

The reference has no minibatch mode; this is the new capability mandated
by BASELINE.json:10-11 ("Stochastic VI minibatch LDA ... corpora larger
than HBM"), implementing Hoffman et al. 2010 per SURVEY.md section 8.4:

    local E-step on minibatch B_t (same kernels as batch VB), then
    lambda <- (1 - rho_t) lambda + rho_t (eta + (D/|B_t|) sstats),
    rho_t = (tau0 + t)^(-kappa),  kappa in (0.5, 1].

``learning()`` keeps the reference's "one call = one pass over the
corpus" contract: it runs one epoch of minibatches and returns the
epoch-averaged ELBO estimate.  Documents stream host->device one
minibatch at a time, so the corpus never has to fit in HBM.  Under doc
sharding the per-shard sstats are psum'd before the lambda update
(SURVEY.md section 2.2; wired in pylda_tpu.parallel).
"""

from __future__ import annotations

from typing import List, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from pylda_tpu.corpus.corpus import Corpus
from pylda_tpu.models import layouts
from pylda_tpu.models.base import LDAState
from pylda_tpu.models.vb import VariationalBayes, _elog_lambda_sum
from pylda_tpu.ops.dirichlet import beta_elbo
from pylda_tpu.ops.hyper import newton_dirichlet_mle


@jax.jit
def _svi_update(lam, eta, sstats, rho, scale):
    """Natural-gradient step on lambda (SURVEY.md section 8.4)."""
    return (1.0 - rho) * lam + rho * (eta[None, :] + scale * sstats)


class StochasticVariationalBayes(VariationalBayes):
    """SVI: minibatch natural-gradient ascent on lambda."""

    def _prepare(self, corpus: Corpus) -> None:
        self._gamma_np = None
        self._t = getattr(self, "_t", 0)  # global minibatch counter

    def learning(self) -> float:
        """One epoch of minibatch updates; returns the mean per-batch
        corpus-scaled ELBO estimate (a stochastic bound estimate, not the
        exact batch ELBO)."""
        st = self.state
        cfg = self._config
        corpus = self._corpus
        D = corpus.num_docs
        key, sub = jax.random.split(st.key)
        epoch_seed = int(st.step) * 100003 + cfg.seed
        elbo_estimates = []
        gamma_rows: List[np.ndarray] = []
        batch_lists: List[layouts.VBBatch] = []
        lam = st.lam
        alpha = st.alpha
        elog_sum_epoch = jnp.zeros_like(alpha)
        docs_seen = 0.0
        for bi, idx in enumerate(
            corpus.minibatch_indices(cfg.batch_size, seed=epoch_seed)
        ):
            batches = self._maybe_shard(
                layouts.build_vb_batches(
                    corpus, cfg, doc_indices=idx, pad_docs_to=cfg.batch_size
                )
                if corpus.num_types <= cfg.dense_vocab_threshold
                else layouts.build_vb_batches(corpus, cfg, doc_indices=idx)
            )
            gammas, sstats, token_score, theta_score, elog_sum = (
                self._run_estep(batches, lam, alpha, jax.random.fold_in(sub, bi))
            )
            n_batch = float(sum(b.mask.sum() for b in batches))
            rho = (cfg.tau0 + self._t) ** (-cfg.kappa)
            scale = D / max(1.0, n_batch)
            lam = _svi_update(
                lam,
                st.eta,
                sstats,
                jnp.asarray(rho, self._dtype),
                jnp.asarray(scale, self._dtype),
            )
            self._t += 1
            # Corpus-scaled stochastic bound estimate (Hoffman eq. for
            # holding the whole-corpus ELBO in expectation).
            est = scale * float(token_score + theta_score) + float(
                beta_elbo(lam, st.eta)
            )
            elbo_estimates.append(est)
            elog_sum_epoch = elog_sum_epoch + elog_sum
            docs_seen += n_batch
            batch_lists.extend(batches)
            gamma_rows.extend(np.asarray(g) for g in gammas)

        alpha_new, eta_new = alpha, st.eta
        step_new = int(st.step) + 1
        interval = cfg.hyper_parameter_optimize_interval
        if interval > 0 and step_new % interval == 0:
            alpha_new = newton_dirichlet_mle(
                alpha, elog_sum_epoch, jnp.asarray(docs_seen)
            )
            eta_new = newton_dirichlet_mle(
                st.eta, _elog_lambda_sum(lam),
                jnp.asarray(cfg.number_of_topics),
            )

        self._gamma_np = layouts.assemble_gamma(
            batch_lists, gamma_rows, D, np.asarray(alpha)
        )
        self._state = LDAState(
            lam=lam, alpha=alpha_new, eta=eta_new,
            step=jnp.int32(step_new), key=key,
        )
        return float(np.mean(elbo_estimates))

    # -- checkpoint extras ----------------------------------------------------------

    def _extra_state(self) -> dict:
        return {"t": np.asarray(self._t, dtype=np.int64)}

    def _load_extra_state(self, blobs: dict) -> None:
        if "t" in blobs:
            self._t = int(blobs["t"])
