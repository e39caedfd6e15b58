"""Batch mean-field variational Bayes engine.

TPU-native counterpart of the reference's ``class VariationalBayes``
(upstream:variational_bayes.py [UNVERIFIED]; SURVEY.md sections 2.1 row 4,
3.1, 8.1): E-step = batched exp-domain gamma fixed point
(``pylda_tpu.ops.estep``), M-step = lambda = eta + sufficient stats, ELBO
per iteration, Newton alpha/eta updates at the configured interval.

The public surface mirrors the reference: ``initialize``/``_initialize``,
``learning() -> elbo``, ``inference(test) -> (ll, gamma)``,
``export_beta``.
"""

from __future__ import annotations

import functools
from typing import List, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from pylda_tpu.corpus.corpus import Corpus, DenseBatch, RaggedBucket
from pylda_tpu.models import layouts
from pylda_tpu.models.base import Inferencer, LDAState
from pylda_tpu.ops.dirichlet import (
    beta_elbo,
    dirichlet_expectation,
    exp_dirichlet_expectation,
    theta_elbo,
)
from pylda_tpu.ops.estep import estep_dense, estep_ragged
from pylda_tpu.ops.hyper import newton_dirichlet_mle


def _gamma_init(key, shape, dtype, mode):
    if mode == "ones":
        return jnp.ones(shape, dtype)
    return jax.random.gamma(key, 100.0, shape, dtype=dtype) * 0.01


@functools.partial(
    jax.jit,
    static_argnames=(
        "inner_iterations", "convergence_threshold", "eps", "gamma_init_mode",
    ),
)
def _vb_dense_batch(
    counts, mask, lam, alpha, key,
    inner_iterations, convergence_threshold, eps, gamma_init_mode="gamma",
):
    """E-step + per-batch ELBO terms for one dense chunk (one jit round)."""
    exp_elog_beta = exp_dirichlet_expectation(lam)
    gamma0 = _gamma_init(
        key, (counts.shape[0], alpha.shape[0]), lam.dtype, gamma_init_mode
    )
    gamma, sstats, token_score, sweeps = estep_dense(
        counts, gamma0, exp_elog_beta, alpha,
        inner_iterations=inner_iterations,
        convergence_threshold=convergence_threshold,
        eps=eps,
    )
    theta_score = theta_elbo(gamma, alpha, mask)
    elog_sum = (dirichlet_expectation(gamma) * mask[:, None]).sum(axis=0)
    return gamma, sstats, token_score, theta_score, elog_sum, sweeps


@functools.partial(
    jax.jit,
    static_argnames=(
        "num_types", "inner_iterations", "convergence_threshold", "eps",
        "gamma_init_mode",
    ),
)
def _vb_ragged_batch(
    ids, cnts, mask, lam, alpha, key,
    num_types, inner_iterations, convergence_threshold, eps,
    gamma_init_mode="gamma",
):
    exp_elog_beta = exp_dirichlet_expectation(lam)
    gamma0 = _gamma_init(
        key, (ids.shape[0], alpha.shape[0]), lam.dtype, gamma_init_mode
    )
    gamma, sstats, token_score, sweeps = estep_ragged(
        ids, cnts, gamma0, exp_elog_beta, alpha,
        num_types=num_types,
        inner_iterations=inner_iterations,
        convergence_threshold=convergence_threshold,
        eps=eps,
    )
    theta_score = theta_elbo(gamma, alpha, mask)
    elog_sum = (dirichlet_expectation(gamma) * mask[:, None]).sum(axis=0)
    return gamma, sstats, token_score, theta_score, elog_sum, sweeps


@jax.jit
def _vb_mstep(eta, sstats):
    return eta[None, :] + sstats


@jax.jit
def _elog_lambda_sum(lam):
    return dirichlet_expectation(lam).sum(axis=0)


class VariationalBayes(Inferencer):
    """Batch VB over the full corpus each iteration."""

    def _build_batches(self, corpus: Corpus) -> List[layouts.VBBatch]:
        return self._maybe_shard(
            layouts.build_vb_batches(corpus, self._config)
        )

    def _prepare(self, corpus: Corpus) -> None:
        self._batches = self._build_batches(corpus)
        self._gamma_np: Optional[np.ndarray] = None

    # -- one full VB iteration ---------------------------------------------------

    def _run_estep(
        self, batches: List[layouts.VBBatch], lam, alpha, key
    ):
        """Run the E-step over every batch; returns device accumulators."""
        cfg = self._config
        sstats = None
        token_score = jnp.zeros((), dtype=self._dtype)
        theta_score = jnp.zeros((), dtype=self._dtype)
        elog_sum = jnp.zeros((cfg.number_of_topics,), dtype=self._dtype)
        gammas = []
        for i, b in enumerate(batches):
            sub = jax.random.fold_in(key, i)
            if isinstance(b, DenseBatch):
                g, ss, tok, th, el, _ = _vb_dense_batch(
                    b.counts, b.mask, lam, alpha, sub,
                    cfg.inner_iterations, cfg.convergence_threshold, cfg.eps,
                    cfg.gamma_init,
                )
            else:
                g, ss, tok, th, el, _ = _vb_ragged_batch(
                    b.ids, b.cnts, b.mask, lam, alpha, sub,
                    len(self._vocab), cfg.inner_iterations,
                    cfg.convergence_threshold, cfg.eps, cfg.gamma_init,
                )
            sstats = ss if sstats is None else sstats + ss
            token_score = token_score + tok
            theta_score = theta_score + th
            elog_sum = elog_sum + el
            gammas.append(g)
        return gammas, sstats, token_score, theta_score, elog_sum

    def learning(self) -> float:
        """One batch-VB iteration: E-step, bound, M-step, hyper updates.

        Returns the ELBO at (gamma*, lambda-used-in-E-step), which is
        monotone non-decreasing across iterations (coordinate ascent)."""
        st = self.state
        cfg = self._config
        key, sub = jax.random.split(st.key)
        gammas, sstats, token_score, theta_score, elog_sum = self._run_estep(
            self._batches, st.lam, st.alpha, sub
        )
        elbo = token_score + theta_score + beta_elbo(st.lam, st.eta)
        lam_new = _vb_mstep(st.eta, sstats)

        alpha_new, eta_new = st.alpha, st.eta
        step_new = int(st.step) + 1
        interval = cfg.hyper_parameter_optimize_interval
        if interval > 0 and step_new % interval == 0:
            alpha_new = newton_dirichlet_mle(
                st.alpha, elog_sum, jnp.asarray(self._corpus.num_docs)
            )
            eta_new = newton_dirichlet_mle(
                st.eta,
                _elog_lambda_sum(lam_new),
                jnp.asarray(cfg.number_of_topics),
            )

        self._gamma_np = layouts.assemble_gamma(
            self._batches,
            [np.asarray(g) for g in gammas],
            self._corpus.num_docs,
            np.asarray(st.alpha),
        )
        self._state = LDAState(
            lam=lam_new,
            alpha=alpha_new,
            eta=eta_new,
            step=jnp.int32(step_new),
            key=key,
        )
        return float(elbo)

    # -- held-out ------------------------------------------------------------------

    def inference(self, test_corpus: Corpus) -> Tuple[float, np.ndarray]:
        """E-step on held-out docs with lambda frozen (SURVEY.md 3.4);
        returns (doc-side bound, gamma in corpus order)."""
        st = self.state
        batches = self._build_batches(test_corpus)
        key = jax.random.fold_in(st.key, 0x7E57)
        gammas, _, token_score, theta_score, _ = self._run_estep(
            batches, st.lam, st.alpha, key
        )
        ll = float(token_score + theta_score)
        gamma = layouts.assemble_gamma(
            batches,
            [np.asarray(g) for g in gammas],
            test_corpus.num_docs,
            np.asarray(st.alpha),
        )
        return ll, gamma
