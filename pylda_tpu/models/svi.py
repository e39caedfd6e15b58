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

Dispatch discipline: each minibatch (E-step + natural-gradient lambda
update + bound estimate) is ONE jitted dispatch, and when every minibatch
of the epoch has the same batch layout (the common case: fixed
``batch_size``, dense layout or a single shared bucket shape) the whole
epoch collapses into ONE ``lax.scan`` dispatch over the stacked
minibatches.
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


class StochasticVariationalBayes(VariationalBayes):
    """SVI: minibatch natural-gradient ascent on lambda."""

    # Minibatch streaming / sequence layouts not yet lifted to
    # process-local global batches (SURVEY.md section 7.3).
    SUPPORTS_PROCESS_LOCAL = False

    def _prepare(self, corpus: Corpus) -> None:
        self._gamma_np = None
        self._gammas_dev = None
        self._gamma_batches = None
        self._t = getattr(self, "_t", 0)  # global minibatch counter
        self._jit_minibatch = jax.jit(self._minibatch_step)
        self._jit_epoch_scan = jax.jit(self._epoch_scan)

    # -- one minibatch update (traced) ---------------------------------------------

    def _minibatch_step(self, lam, alpha, eta, key, batches, rho, scale):
        """Local E-step + natural-gradient lambda step + corpus-scaled
        stochastic bound estimate (Hoffman's estimator: the per-batch doc
        terms scaled by D/|B| plus the topic-side terms)."""
        gammas, sstats, token_score, theta_score, elog_sum = self._run_estep(
            batches, lam, alpha, key
        )
        lam_new = (1.0 - rho) * lam + rho * (eta[None, :] + scale * sstats)
        est = scale * (token_score + theta_score) + beta_elbo(lam_new, eta)
        return lam_new, est, elog_sum, gammas

    def _epoch_scan(self, lam, alpha, eta, key, stacked, rhos, scales):
        """Whole epoch in one lax.scan over stacked same-shape minibatches."""

        def body(carry, xs):
            lam = carry
            batches, rho, scale, i = xs
            sub = jax.random.fold_in(key, i)
            lam_new, est, elog_sum, gammas = self._minibatch_step(
                lam, alpha, eta, sub, batches, rho, scale
            )
            return lam_new, (est, elog_sum, gammas)

        n = rhos.shape[0]
        lam_final, (ests, elog_sums, gammas) = jax.lax.scan(
            body, lam, (stacked, rhos, scales, jnp.arange(n))
        )
        return lam_final, ests, elog_sums.sum(axis=0), gammas

    # -- one epoch -------------------------------------------------------------------

    def learning(self) -> float:
        """One epoch of minibatch updates; returns the mean per-batch
        corpus-scaled ELBO estimate (a stochastic bound estimate, not the
        exact batch ELBO)."""
        st = self.state
        cfg = self._config
        corpus = self._corpus
        D = corpus.num_docs
        key, sub = jax.random.split(st.key)
        epoch_seed = self._counter * 100003 + cfg.seed

        # Host-side batch construction (the streaming step).
        index_lists = corpus.minibatch_indices(cfg.batch_size, seed=epoch_seed)
        batch_lists: List[List[layouts.VBBatch]] = []
        scales: List[float] = []
        rhos: List[float] = []
        for idx in index_lists:
            # Dense minibatches share one [batch, V] shape, so dense
            # epochs collapse into a single lax.scan dispatch; ragged
            # minibatches keep per-batch bucketing — a uniform fixed-T
            # layout was measured SLOWER (padding waste beats dispatch
            # savings ~3:1 at wiki-shaped length distributions).
            bl = self._maybe_shard(
                layouts.build_vb_batches(
                    corpus, cfg, doc_indices=idx, pad_docs_to=cfg.batch_size
                )
                if corpus.num_types <= cfg.dense_vocab_threshold
                else layouts.build_vb_batches(corpus, cfg, doc_indices=idx)
            )
            batch_lists.append(bl)
            scales.append(D / max(1, len(idx)))
            rhos.append((cfg.tau0 + self._t) ** (-cfg.kappa))
            self._t += 1

        lam, alpha = st.lam, st.alpha
        structs = {
            str(jax.tree.structure(bl))
            + str([jax.tree.map(jnp.shape, b) for b in bl])
            for bl in batch_lists
        }
        if len(batch_lists) > 1 and len(structs) == 1 and self._mesh is None:
            # Uniform layout: fuse the epoch into one scan dispatch.
            stacked = jax.tree.map(
                lambda *xs: jnp.stack(xs), *batch_lists
            )
            lam, ests, elog_sum_epoch, gammas_stacked = self._jit_epoch_scan(
                lam, alpha, st.eta, sub, stacked,
                jnp.asarray(rhos, self._dtype),
                jnp.asarray(scales, self._dtype),
            )
            ests = list(np.asarray(ests, dtype=np.float64))
            gammas = [
                g
                for i in range(len(batch_lists))
                for g in jax.tree.map(lambda x: x[i], gammas_stacked)
            ]
        else:
            ests_dev = []
            elog_sum_epoch = jnp.zeros_like(alpha)
            gammas = []
            for bi, bl in enumerate(batch_lists):
                lam, est, elog_sum, gs = self._jit_minibatch(
                    lam, alpha, st.eta, jax.random.fold_in(sub, bi), bl,
                    jnp.asarray(rhos[bi], self._dtype),
                    jnp.asarray(scales[bi], self._dtype),
                )
                ests_dev.append(est)
                elog_sum_epoch = elog_sum_epoch + elog_sum
                gammas.extend(gs)
            ests = list(np.asarray(jnp.stack(ests_dev), dtype=np.float64))

        docs_seen = float(sum(len(idx) for idx in index_lists))
        alpha_new, eta_new = alpha, st.eta
        step_new = self._counter + 1
        interval = cfg.hyper_parameter_optimize_interval
        if interval > 0 and step_new % interval == 0:
            alpha_new = newton_dirichlet_mle(
                alpha, elog_sum_epoch, jnp.asarray(docs_seen)
            )
            eta_new = newton_dirichlet_mle(
                st.eta, _elog_lambda_sum(lam),
                jnp.asarray(cfg.number_of_topics),
            )

        self._set_gammas(gammas, [b for bl in batch_lists for b in bl])
        self._state = LDAState(
            lam=lam, alpha=alpha_new, eta=eta_new,
            step=st.step + 1, key=key,
        )
        self._step_host = step_new
        return float(np.mean(ests))

    def learning_many(self, n: int):
        return [self.learning() for _ in range(n)]

    # -- checkpoint extras ----------------------------------------------------------

    def _extra_state(self) -> dict:
        return {"t": np.asarray(self._t, dtype=np.int64)}

    def _load_extra_state(self, blobs: dict) -> None:
        if "t" in blobs:
            self._t = int(blobs["t"])
