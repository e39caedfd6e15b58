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
import numpy as np

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

    def _prepare(self, corpus: Corpus) -> None:
        super()._prepare(corpus)
        cfg = self._config
        self._z_hyb = None
        if cfg.hybrid_persistent_z:
            key = jax.random.fold_in(self.state.key, 0x2B1D)
            self._z_hyb = tuple(
                random_assignments(
                    jax.random.fold_in(key, i), jnp.asarray(b.tokens),
                    cfg.number_of_topics,
                )
                for i, b in enumerate(self._batches)
            )
            self._restore_chains()
            self._jit_iteration_z = jax.jit(
                self._iteration_z, static_argnames=("update_hypers",)
            )
            self._jit_scan_z = jax.jit(
                self._iterations_scan_z,
                static_argnames=("n", "hyper_interval"),
            )

    def _restore_chains(self) -> None:
        """Re-apply checkpointed persistent chains when the bucket
        layout matches (elastic resume re-places with each bucket's
        sharding; mismatched layouts fall back to the fresh random z —
        one extra burn-in transient, never an error)."""
        blobs = getattr(self, "_zh_restore", None)
        if not blobs:
            return
        keys = sorted(blobs, key=lambda s: int(s.split("_")[1]))
        if len(keys) != len(self._batches):
            return
        if any(
            blobs[k].shape != tuple(self._batches[i].tokens.shape)
            for i, k in enumerate(keys)
        ):
            return
        self._z_hyb = tuple(
            jax.device_put(blobs[k], self._batches[i].tokens.sharding)
            if hasattr(self._batches[i].tokens, "sharding")
            else jnp.asarray(blobs[k])
            for i, k in enumerate(keys)
        )

    def _extra_state(self) -> dict:
        d = super()._extra_state()
        if self._z_hyb is not None:
            from pylda_tpu.parallel.mesh import host_gather

            for i, z in enumerate(self._z_hyb):
                d[f"zh_{i}"] = host_gather(z)
        return d

    def _load_extra_state(self, blobs: dict) -> None:
        super()._load_extra_state(
            {k: v for k, v in blobs.items() if not k.startswith("zh_")}
        )
        self._zh_restore = {
            k: v for k, v in blobs.items() if k.startswith("zh_")
        }

    # -- persistent-chain training (hybrid_persistent_z) --------------------

    def _iteration_z(self, state, batches, zs, update_hypers: bool):
        """VB._iteration with the per-document topic assignments carried
        across iterations (warm chains; cold restarts re-bias the
        sampled statistics toward uniform every iteration)."""
        from pylda_tpu.models.base import LDAState
        from pylda_tpu.ops.dirichlet import beta_elbo
        from pylda_tpu.ops.hyper import newton_dirichlet_mle
        from pylda_tpu.models.vb import _elog_lambda_sum

        key, sub = jax.random.split(state.key)
        gammas, sstats, token_score, theta_score, elog_sum, z_new = (
            self._run_estep_z(batches, state.lam, state.alpha, sub, zs)
        )
        elbo = token_score + theta_score + beta_elbo(state.lam, state.eta)
        lam_new = state.eta[None, :] + sstats
        alpha_new, eta_new = state.alpha, state.eta
        if update_hypers:
            alpha_new = newton_dirichlet_mle(
                state.alpha, elog_sum,
                jnp.asarray(self._corpus.global_num_docs),
            )
            eta_new = newton_dirichlet_mle(
                state.eta, _elog_lambda_sum(lam_new),
                jnp.asarray(self._config.number_of_topics),
            )
        new_state = LDAState(
            lam=lam_new, alpha=alpha_new, eta=eta_new,
            step=state.step + 1, key=key,
        )
        return new_state, elbo, gammas, z_new

    def _iterations_scan_z(self, state, batches, zs, n: int,
                           hyper_interval: int):
        def body(carry, _):
            st, z = carry
            if hyper_interval > 0:
                do_up = (st.step + 1) % hyper_interval == 0

                def with_up(args):
                    s, zz = args
                    ns, e, _g, zn = self._iteration_z(
                        s, batches, zz, update_hypers=True
                    )
                    return ns, e, zn

                def without_up(args):
                    s, zz = args
                    ns, e, _g, zn = self._iteration_z(
                        s, batches, zz, update_hypers=False
                    )
                    return ns, e, zn

                new_st, elbo, z_new = jax.lax.cond(
                    do_up, with_up, without_up, (st, z)
                )
            else:
                new_st, elbo, _g, z_new = self._iteration_z(
                    st, batches, z, update_hypers=False
                )
            return (new_st, z_new), elbo

        (new_state, z_final), elbos = jax.lax.scan(
            body, (state, tuple(zs)), None, length=n
        )
        return new_state, z_final, elbos

    def learning(self) -> float:
        if self._z_hyb is None:
            return super().learning()
        st = self.state
        interval = self._config.hyper_parameter_optimize_interval
        update = interval > 0 and (self._counter + 1) % interval == 0
        new_state, elbo, gammas, z_new = self._jit_iteration_z(
            st, self._batches, self._z_hyb, update_hypers=update
        )
        self._state = new_state
        self._z_hyb = z_new
        self._step_host = self._counter + 1
        self._set_gammas(gammas, self._gamma_doc_ids_for(self._batches, None))
        return float(elbo)

    def learning_many(self, n: int):
        if self._z_hyb is None:
            return super().learning_many(n)
        if n <= 0:
            return []
        st = self.state
        new_state, z_final, elbos = self._jit_scan_z(
            st, self._batches, self._z_hyb, n=n,
            hyper_interval=self._config.hyper_parameter_optimize_interval,
        )
        self._state = new_state
        self._z_hyb = z_final
        self._step_host = self._counter + n
        self._set_gammas(None, None)  # lazy: .gamma re-runs the E-step
        return [float(x) for x in np.asarray(elbos)]

    def _run_estep_z(self, batches, lam, alpha, key, zs):
        """The sampled local step with EXPLICIT chain state; returns the
        VB E-step contract plus the advanced assignments."""
        return self._estep_impl(batches, lam, alpha, key, zs)

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
        dense_chunks=None, docs_mask=None, num_docs=None, gamma0s=None,
    ):
        """Sampled local step over every sequence bucket (cold-start
        chains — the held-out inference path and the
        hybrid_persistent_z=False training path).  ``gamma0s`` is part
        of the VB E-step contract but unused here: the sampled local
        step initialises topic ASSIGNMENTS, not gamma.

        Same return contract as the VB E-step: (gammas, sstats,
        token_score, theta_score, elog_sum)."""
        return self._estep_impl(batches, lam, alpha, key, None)[:5]

    def _estep_impl(self, batches, lam, alpha, key, zs):
        """Shared sampled local step; ``zs`` carries persistent chains
        (None = fresh random assignments per bucket).  Returns the VB
        E-step contract plus the advanced assignments."""
        cfg = self._config
        K = cfg.number_of_topics
        V = len(self._vocab)
        elog_beta = dirichlet_expectation(lam)  # frozen within the iteration
        sstats = None
        token_score = jnp.zeros((), dtype=self._dtype)
        theta_score = jnp.zeros((), dtype=self._dtype)
        elog_sum = jnp.zeros((K,), dtype=self._dtype)
        gammas = []
        z_out = []
        for i, b in enumerate(batches):
            sub = jax.random.fold_in(key, i)
            z0 = (
                zs[i]
                if zs is not None
                else random_assignments(
                    jax.random.fold_in(sub, 1), jnp.asarray(b.tokens), K
                )
            )
            gamma_b, ss, z_new, _ndk = sample_doc_topics(
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
            z_out.append(z_new)
        return gammas, sstats, token_score, theta_score, elog_sum, tuple(
            z_out
        )
