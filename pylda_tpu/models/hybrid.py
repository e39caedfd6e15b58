"""Hybrid VB/sampling engine (Mimno, Hoffman & Blei 2012).

Counterpart of the reference's ``class Hybrid`` (upstream:hybrid.py
[UNVERIFIED]; SURVEY.md sections 2.1 row 6, 3.3, 8.3): the global
word-topic state stays variational (lambda, same M-step and ELBO as VB),
but the per-document local step replaces the gamma/phi fixed point with
collapsed Gibbs sweeps over the document's tokens using exp(E[log beta])
as the frozen topic-word factor.  phi sufficient statistics are averaged
over ``number_of_samples`` kept sweeps after ``burn_in_sweeps`` discards.

TPU-native form: all documents of a bucket sweep in lockstep with batched
categorical draws (``pylda_tpu.ops.sampling``) — this is exactly the path
BASELINE.json:5 mandates for the sampling engines.
"""

from __future__ import annotations

from typing import List

import jax
import jax.numpy as jnp

from pylda_tpu.corpus.corpus import Corpus, SequenceBucket
from pylda_tpu.models.vb import VariationalBayes
from pylda_tpu.ops.dirichlet import dirichlet_expectation, theta_elbo
from pylda_tpu.ops.sampling import (
    random_assignments,
    sample_doc_topics,
    sequence_token_score,
)


class Hybrid(VariationalBayes):
    """VB global step + within-doc Gibbs local step."""

    SUPPORTS_PROCESS_LOCAL = True

    def _plan_dense_sstats(self, corpus: Corpus):
        # The local step is sampling-based: sufficient statistics come
        # from averaged z draws, not from a gamma fixed point, so the
        # VB dense-sstats shortcut does not apply.
        return None

    def _build_batches(self, corpus: Corpus) -> List[SequenceBucket]:
        cfg = self._config
        if (
            getattr(corpus, "process_local", False)
            and jax.process_count() > 1
        ):
            # Multi-host: per-host sequence buckets with negotiated
            # geometry, lifted to globally doc-sharded arrays.  The
            # sampled local step is per-row independent given the frozen
            # exp(E[log beta]), so the only collective stays the psum'd
            # sstats in the M-step (SURVEY.md section 2.2 DP row).
            from pylda_tpu.parallel.mesh import lift_process_local_buckets

            if self._mesh is None:
                raise ValueError(
                    "a process-sharded corpus requires a mesh (--mesh)"
                )
            return lift_process_local_buckets(
                corpus.to_sequence_buckets(
                    bucket_sizes=tuple(cfg.bucket_sizes),
                    doc_pad_multiple=1,
                ),
                cfg.bucket_sizes,
                cfg.doc_pad_multiple,
                self._mesh,
                corpus.global_doc_offset,
            )
        from pylda_tpu.models.layouts import effective_sequence_bucket_sizes

        return self._maybe_shard(
            corpus.to_sequence_buckets(
                bucket_sizes=effective_sequence_bucket_sizes(corpus, cfg),
                doc_pad_multiple=cfg.doc_pad_multiple,
            )
        )

    def _run_estep(
        self, batches, lam, alpha, key,
        dense_chunks=None, docs_mask=None, num_docs=None,
    ):
        """Sampled local step over every sequence bucket.

        Same return contract as the VB E-step: (gammas, sstats,
        token_score, theta_score, elog_sum)."""
        cfg = self._config
        K = cfg.number_of_topics
        V = len(self._vocab)
        elog_beta = dirichlet_expectation(lam)  # frozen within the iteration
        sstats = None
        token_score = jnp.zeros((), dtype=self._dtype)
        theta_score = jnp.zeros((), dtype=self._dtype)
        elog_sum = jnp.zeros((K,), dtype=self._dtype)
        gammas = []
        for i, b in enumerate(batches):
            sub = jax.random.fold_in(key, i)
            z0 = random_assignments(
                jax.random.fold_in(sub, 1), jnp.asarray(b.tokens), K
            )
            gamma_b, ss, _z, _ndk = sample_doc_topics(
                jnp.asarray(b.tokens),
                jnp.asarray(b.token_mask),
                elog_beta,
                alpha,
                z0,
                jax.random.fold_in(sub, 2),
                num_topics=K,
                num_types=V,
                burn_in=cfg.burn_in_sweeps,
                num_samples=cfg.number_of_samples,
                sampler=cfg.resolved_topic_sampler(),
                block_positions=cfg.sampler_block_positions,
            )
            elog_theta = dirichlet_expectation(gamma_b)
            token_score = token_score + sequence_token_score(
                jnp.asarray(b.tokens),
                jnp.asarray(b.token_mask),
                elog_theta,
                elog_beta,
            )
            theta_score = theta_score + theta_elbo(
                gamma_b, alpha, jnp.asarray(b.mask)
            )
            elog_sum = elog_sum + (
                elog_theta * jnp.asarray(b.mask)[:, None]
            ).sum(axis=0)
            sstats = ss if sstats is None else sstats + ss
            gammas.append(gamma_b)
        return gammas, sstats, token_score, theta_score, elog_sum
