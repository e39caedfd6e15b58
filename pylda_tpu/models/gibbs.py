"""Collapsed Gibbs sampling engine.

Counterpart of the reference's ``class MonteCarlo`` (upstream:
monte_carlo.py [UNVERIFIED]; SURVEY.md sections 2.1 row 5, 3.2, 8.2):
persistent per-token topic assignments z, count tables (n_dk, n_kv, n_k),
one full sweep per ``learning()`` call, the Griffiths–Steyvers joint log
likelihood as the training objective, and Wallach slice-sampled
hyperparameter optimization every ``hyper_parameter_optimize_interval``
iterations.

TPU-native approximation (SURVEY.md section 7.1 "Gibbs sequentiality"):
the reference's chain is sequential across *all* tokens of the corpus; a
data-parallel device cannot honour cross-document sequential dependence.
We freeze the topic-word tables at sweep start (the Newman et al. 2009
AD-LDA scheme with one synchronisation per sweep), keep within-document
n_dk updates exact and sequential, and rebuild (n_kv, n_k) from z after
every sweep.  Parity with the reference chain is therefore statistical —
perplexity and top-word lists within Monte-Carlo tolerance
(BASELINE.json:5) — not sample-for-sample.

Dispatch discipline: one ``learning()`` call = one jitted dispatch (all
buckets swept + joint likelihood); ``learning_many(n)`` runs n sweeps in
a single ``lax.scan`` dispatch, chunked at hyperopt boundaries.
"""

from __future__ import annotations

import math
from typing import List, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.scipy.special import gammaln

from pylda_tpu.corpus.corpus import Corpus, SequenceBucket
from pylda_tpu.ops.dirichlet import gammaln_fast
from pylda_tpu.models.base import Inferencer, LDAState
from pylda_tpu.ops.sampling import (
    count_table,
    random_assignments,
    sample_doc_topics,
    sequence_token_score,
)


@jax.jit
def _log_phi_hat(n_kv, beta):
    """log[(n_kv + beta_v) / (n_k + sum beta)] (SURVEY.md section 3.5)."""
    n_k = n_kv.sum(axis=1, keepdims=True)
    return jnp.log(n_kv + beta[None, :]) - jnp.log(n_k + beta.sum())


def _topic_side_ll(n_kv, beta):
    """K[logG(sum b) - sum logG(b)] + sum_k[sum_v logG(n_kv+b) -
    logG(n_k + sum b)]  (SURVEY.md section 8.2).

    The [K, V] surface runs at the fast Stirling lgamma (<= ~3e-6
    absolute/element, ~1e-6 relative on the summed LL; f64 exact —
    ops/dirichlet.gammaln_fast); this is computed EVERY sweep for the
    per-iteration likelihood print."""
    K = n_kv.shape[0]
    n_k = n_kv.sum(axis=1)
    s = K * (gammaln(beta.sum()) - gammaln(beta).sum())
    s += gammaln_fast(n_kv + beta[None, :]).sum()
    s -= gammaln_fast(n_k + beta.sum()).sum()
    return s


def _doc_side_ll(ndk, mask, alpha):
    """D[logG(sum a) - sum logG(a)] + sum_d[...] with padded rows inert."""
    n_d = ndk.sum(axis=1)
    per_doc = (
        gammaln_fast(ndk + alpha[None, :]).sum(axis=1)
        - gammaln_fast(n_d + alpha.sum())
        + gammaln(alpha.sum())
        - gammaln(alpha).sum()
    )
    return (mask * per_doc).sum()


class MonteCarlo(Inferencer):
    """Collapsed Gibbs with per-sweep table synchronisation."""

    SUPPORTS_PROCESS_LOCAL = True

    def _prepare(self, corpus: Corpus) -> None:
        cfg = self._config
        if (
            getattr(corpus, "process_local", False)
            and jax.process_count() > 1
        ):
            # Multi-host AD-LDA: per-host sequence buckets (negotiated
            # geometry), doc-sharded z and n_dk; the per-sweep n_kv
            # rebuild is the single cross-host reduction (SURVEY.md
            # section 2.2 DP row).
            from pylda_tpu.parallel.mesh import lift_process_local_buckets

            if self._mesh is None:
                raise ValueError(
                    "a process-sharded corpus requires a mesh (--mesh)"
                )
            self._buckets = lift_process_local_buckets(
                corpus.to_sequence_buckets(
                    bucket_sizes=tuple(cfg.bucket_sizes),
                    doc_pad_multiple=1,
                ),
                cfg.bucket_sizes,
                cfg.doc_pad_multiple,
                self._mesh,
                corpus.global_doc_offset,
            )
        else:
            from pylda_tpu.models.layouts import (
                effective_sequence_bucket_sizes,
            )

            self._buckets = self._maybe_shard(
                corpus.to_sequence_buckets(
                    bucket_sizes=effective_sequence_bucket_sizes(
                        corpus, cfg
                    ),
                    doc_pad_multiple=cfg.doc_pad_multiple,
                )
            )
        K, V = cfg.number_of_topics, len(self._vocab)
        if cfg.gibbs_rebuild_interval > 1 and self._mesh is not None:
            import warnings

            warnings.warn(
                "gibbs_rebuild_interval > 1 is single-process only; "
                "running the exact per-sweep rebuild under the mesh",
                stacklevel=2,
            )
        key = jax.random.fold_in(self.state.key, 0x51BB5)
        self._z: List[jnp.ndarray] = []
        self._ndk: List[jnp.ndarray] = []
        n_kv = jnp.zeros((K, V), dtype=self._dtype)
        for i, b in enumerate(self._buckets):
            z = random_assignments(
                jax.random.fold_in(key, i), jnp.asarray(b.tokens), K
            )
            self._z.append(z)
            mask = jnp.asarray(b.token_mask)
            hot = jax.nn.one_hot(z, K, dtype=self._dtype) * mask[:, :, None]
            self._ndk.append(hot.sum(axis=1))
            n_kv = n_kv + count_table(
                jnp.asarray(b.tokens), mask, z, K, V, self._dtype
            )
        self._n_kv = n_kv
        # Checkpoint resume: re-apply persisted z / count tables if present.
        if self._prepare_from_restore():
            self._n_kv = jnp.asarray(self._z_restore["n_kv"])
        self._jit_sweep = jax.jit(self._sweep)
        self._jit_sweep_scan = jax.jit(
            self._sweep_scan, static_argnames=("n",)
        )
        self._jit_likelihood = jax.jit(self._likelihood)

    # -- traced sweep / likelihood -------------------------------------------------

    def _sample_buckets(
        self, alpha, key, log_tw, zs, buckets, accumulate: bool
    ):
        """One sweep of every bucket against a fixed factor — the
        bucket loop shared by the exact and rebuild-interval paths (so
        a sampler-call change cannot silently land in only one).
        Returns (z_out, ndk_out, counts_sum_or_None)."""
        cfg = self._config
        K, V = cfg.number_of_topics, len(self._vocab)
        counts_sum = None
        z_out, ndk_out = [], []
        for i, (b, z) in enumerate(zip(buckets, zs)):
            _gamma, counts, z_new, ndk = sample_doc_topics(
                b.tokens, b.token_mask, log_tw, alpha, z,
                jax.random.fold_in(key, i),
                num_topics=K, num_types=V, burn_in=0, num_samples=1,
                sampler=cfg.resolved_topic_sampler(),
                block_positions=cfg.sampler_block_positions,
                accumulate_counts=accumulate,
            )
            z_out.append(z_new)
            ndk_out.append(ndk)
            if accumulate:
                counts_sum = (
                    counts if counts_sum is None else counts_sum + counts
                )
        return tuple(z_out), tuple(ndk_out), counts_sum

    def _doc_ll_sum(self, ll, ndk_out, buckets, alpha):
        for b, ndk in zip(buckets, ndk_out):
            ll = ll + _doc_side_ll(ndk, b.mask, alpha)
        return ll

    def _sweep(self, alpha, eta, key, n_kv, zs, buckets):
        """One full AD-LDA sweep over every bucket + joint likelihood,
        as a pure function (single dispatch)."""
        log_tw = _log_phi_hat(n_kv, eta)
        z_out, ndk_out, n_kv_new = self._sample_buckets(
            alpha, key, log_tw, zs, buckets, accumulate=True
        )
        ll = self._doc_ll_sum(
            _topic_side_ll(n_kv_new, eta), ndk_out, buckets, alpha
        )
        return n_kv_new, z_out, ndk_out, ll

    def _sweep_scan(self, alpha, eta, key, n_kv, zs, buckets, n):
        # ndk rides in the carry (only the final sweep's tables are
        # needed) — stacking it as a scan output would hold an
        # O(n * D * K) history in HBM for nothing.
        ndk0 = tuple(jnp.zeros_like(ndk) for ndk in self._ndk)
        cfg = self._config
        R = cfg.gibbs_rebuild_interval
        if R <= 1 or self._mesh is not None:
            # Exact per-sweep table synchronisation (the reference's
            # AD-LDA granularity); also the only mode under a mesh
            # (collectives inside the rebuild conditional are not
            # exercised by the sharded tests).
            def body(carry, i):
                n_kv, zs, _ndk = carry
                n_kv_new, z_new, ndk_new, ll = self._sweep(
                    alpha, eta, jax.random.fold_in(key, i), n_kv, zs,
                    buckets,
                )
                return (n_kv_new, z_new, ndk_new), ll

            (n_kv, zs, ndk_last), lls = jax.lax.scan(
                body, (n_kv, tuple(zs), ndk0), jnp.arange(n)
            )
            return n_kv, zs, ndk_last, lls

        # R > 1: sample every sweep against the CARRIED factor, rebuild
        # the [K, V] table (62% of the sweep, per-index-bound) only on
        # every R-th sweep and on the final one — the same AD-LDA
        # approximation extended in time instead of space.  Tables are
        # exact at the returned state.  The factor AND the topic-side
        # LL ride the carry and refresh inside the rebuild cond, so the
        # skipped sweeps pay neither the scatter nor the [K, V]
        # log/lgamma surfaces (their reported LL is the latest table's
        # topic side + each sweep's fresh doc side).
        K, V = cfg.number_of_topics, len(self._vocab)
        log_tw0 = _log_phi_hat(n_kv, eta)
        ll_t0 = _topic_side_ll(n_kv, eta)

        def body(carry, i):
            n_kv, log_tw, ll_topic, zs_c, _ndk = carry
            sub = jax.random.fold_in(key, i)
            z_out, ndk_out, _none = self._sample_buckets(
                alpha, sub, log_tw, zs_c, buckets, accumulate=False
            )

            def rebuild(_):
                table = jnp.zeros_like(n_kv)
                for b, z_new in zip(buckets, z_out):
                    table = table + count_table(
                        b.tokens, b.token_mask, z_new, K, V, self._dtype
                    )
                return (
                    table, _log_phi_hat(table, eta),
                    _topic_side_ll(table, eta),
                )

            do = jnp.logical_or((i + 1) % R == 0, i == n - 1)
            n_kv_new, log_tw_new, ll_topic_new = jax.lax.cond(
                do, rebuild, lambda _: (n_kv, log_tw, ll_topic), None
            )
            ll = self._doc_ll_sum(ll_topic_new, ndk_out, buckets, alpha)
            return (n_kv_new, log_tw_new, ll_topic_new, z_out, ndk_out), ll

        (n_kv, _ltw, _llt, zs, ndk_last), lls = jax.lax.scan(
            body, (n_kv, log_tw0, ll_t0, tuple(zs), ndk0), jnp.arange(n)
        )
        return n_kv, zs, ndk_last, lls

    def _likelihood(self, alpha, beta, n_kv, ndks, masks):
        s = _topic_side_ll(n_kv, beta)
        for ndk, mask in zip(ndks, masks):
            s = s + _doc_side_ll(ndk, mask, alpha)
        return s

    # -- training -----------------------------------------------------------------

    def learning(self) -> float:
        """One full Gibbs sweep over the corpus; returns joint log p(w,z)."""
        st = self.state
        cfg = self._config
        key, sub = jax.random.split(st.key)
        self._n_kv, z_new, ndk_new, ll = self._jit_sweep(
            st.alpha, st.eta, sub, self._n_kv, tuple(self._z), self._buckets
        )
        self._z = list(z_new)
        self._ndk = list(ndk_new)

        step_new = self._counter + 1
        self._state = LDAState(
            lam=st.lam, alpha=st.alpha, eta=st.eta,
            step=st.step + 1, key=key,
        )
        self._step_host = step_new
        interval = cfg.hyper_parameter_optimize_interval
        if interval > 0 and step_new % interval == 0:
            self.optimize_hyperparameters(
                samples=cfg.slice_samples, step=cfg.slice_step
            )
            return self.compute_likelihood()
        return float(ll)

    def learning_many(self, n: int):
        """n sweeps; scan-fused between hyperopt boundaries."""
        cfg = self._config
        interval = cfg.hyper_parameter_optimize_interval
        out: List[float] = []
        remaining = n
        while remaining > 0:
            if interval > 0:
                to_boundary = interval - (self._counter % interval)
                chunk = min(remaining, to_boundary)
            else:
                chunk = remaining
            st = self.state
            key, sub = jax.random.split(st.key)
            self._n_kv, z_new, ndk_last, lls = self._jit_sweep_scan(
                st.alpha, st.eta, sub, self._n_kv, tuple(self._z),
                self._buckets, n=chunk,
            )
            self._z = list(z_new)
            self._ndk = list(ndk_last)
            self._state = LDAState(
                lam=st.lam, alpha=st.alpha, eta=st.eta,
                step=st.step + chunk, key=key,
            )
            self._step_host = self._counter + chunk
            vals = [float(x) for x in np.asarray(lls)]
            if interval > 0 and self._counter % interval == 0:
                self.optimize_hyperparameters(
                    samples=cfg.slice_samples, step=cfg.slice_step
                )
                vals[-1] = self.compute_likelihood()
            out.extend(vals)
            remaining -= chunk
        return out

    def compute_likelihood(
        self, alpha_scalar: float | None = None, beta_scalar: float | None = None
    ) -> float:
        """Griffiths–Steyvers joint log likelihood at the current counts."""
        st = self.state
        alpha = (
            st.alpha
            if alpha_scalar is None
            else jnp.full_like(st.alpha, alpha_scalar)
        )
        beta = (
            st.eta
            if beta_scalar is None
            else jnp.full_like(st.eta, beta_scalar)
        )
        masks = tuple(b.mask for b in self._buckets)
        return float(
            self._jit_likelihood(
                alpha, beta, self._n_kv, tuple(self._ndk), masks
            )
        )

    # -- per-phase timing (debug/observability surface) ---------------------------

    def phase_timings(self, repeats: int = 3) -> dict:
        """Sweep vs likelihood device wall times (ms), best of repeats."""
        import time as _time

        st = self.state
        key = jax.random.fold_in(st.key, 0x7131)
        out = {}

        def timed(name, fn, *a):
            r = fn(*a)
            jax.block_until_ready(r)
            best = float("inf")
            for _ in range(repeats):
                t0 = _time.perf_counter()
                r = fn(*a)
                jax.block_until_ready(r)
                best = min(best, _time.perf_counter() - t0)
            out[name] = round(best * 1e3, 3)
            return r

        timed(
            "gibbs_sweep_ms", self._jit_sweep,
            st.alpha, st.eta, key, self._n_kv, tuple(self._z), self._buckets,
        )
        timed(
            "joint_likelihood_ms", self._jit_likelihood,
            st.alpha, st.eta, self._n_kv, tuple(self._ndk),
            tuple(b.mask for b in self._buckets),
        )
        return out

    # -- Wallach slice sampler (SURVEY.md section 8.2) ----------------------------

    def optimize_hyperparameters(
        self, samples: int = 5, step: float = 3.0
    ) -> None:
        """Slice sampling on (log alpha, log beta) scalars; host-side
        control loop, device-side likelihood evaluation."""
        st = self.state
        rng = np.random.default_rng(int(jax.random.randint(
            jax.random.fold_in(st.key, 0x511CE), (), 0, 2**31 - 1
        )))
        x0 = np.array(
            [math.log(float(st.alpha.mean())), math.log(float(st.eta.mean()))]
        )
        for _ in range(samples):
            ll0 = self.compute_likelihood(math.exp(x0[0]), math.exp(x0[1]))
            log_u = ll0 + math.log(rng.random())
            lo = x0 - step * rng.random(2)
            hi = lo + step
            while True:
                x1 = lo + rng.random(2) * (hi - lo)
                ll1 = self.compute_likelihood(math.exp(x1[0]), math.exp(x1[1]))
                if ll1 > log_u:
                    x0 = x1
                    break
                lo = np.where(x1 < x0, x1, lo)
                hi = np.where(x1 >= x0, x1, hi)
        self._state = self._state._replace(
            alpha=jnp.full_like(st.alpha, math.exp(x0[0])),
            eta=jnp.full_like(st.eta, math.exp(x0[1])),
        )

    # -- topics / held-out ----------------------------------------------------------

    def topic_word_distribution(self) -> np.ndarray:
        """(n_kv + beta) / (n_k + sum beta) point estimate (SURVEY.md 3.5)."""
        st = self.state
        n_kv = np.asarray(self._n_kv, dtype=np.float64)
        beta = np.asarray(st.eta, dtype=np.float64)
        return (n_kv + beta[None, :]) / (
            n_kv.sum(axis=1, keepdims=True) + beta.sum()
        )

    def inference(self, test_corpus: Corpus) -> Tuple[float, np.ndarray]:
        """Sample test-doc topics against frozen topic counts, then score
        tokens with the point-estimate predictive p(w|d) = sum_k
        theta_hat phi_hat (documented convention; the reference's exact
        held-out recipe is [UNVERIFIED])."""
        st = self.state
        cfg = self._config
        K, V = cfg.number_of_topics, len(self._vocab)
        from pylda_tpu.parallel.mesh import host_gather

        log_tw = _log_phi_hat(self._n_kv, st.eta)
        from pylda_tpu.models.layouts import effective_sequence_bucket_sizes

        buckets = self._maybe_shard(
            test_corpus.to_sequence_buckets(
                bucket_sizes=effective_sequence_bucket_sizes(
                    test_corpus, cfg
                ),
                doc_pad_multiple=cfg.doc_pad_multiple,
            )
        )
        key = jax.random.fold_in(st.key, 0x7E57)
        ll = 0.0
        alpha_np = host_gather(st.alpha)
        gamma = np.tile(alpha_np[None, :], (test_corpus.num_docs, 1))
        for i, b in enumerate(buckets):
            sub = jax.random.fold_in(key, i)
            z0 = random_assignments(
                jax.random.fold_in(sub, 1), jnp.asarray(b.tokens), K
            )
            gamma_b, _ss, _z, ndk = sample_doc_topics(
                jnp.asarray(b.tokens),
                jnp.asarray(b.token_mask),
                log_tw,
                st.alpha,
                z0,
                jax.random.fold_in(sub, 2),
                num_topics=K,
                num_types=V,
                burn_in=cfg.burn_in_sweeps,
                num_samples=cfg.number_of_samples,
                sampler=cfg.resolved_topic_sampler(),
                block_positions=cfg.sampler_block_positions,
            )
            theta_hat = gamma_b / gamma_b.sum(axis=1, keepdims=True)
            ll += float(
                sequence_token_score(
                    jnp.asarray(b.tokens),
                    jnp.asarray(b.token_mask),
                    jnp.log(theta_hat),
                    log_tw,
                )
            )
            g_np = host_gather(gamma_b)
            doc_ids = host_gather(b.doc_ids)
            valid = doc_ids >= 0
            # Vectorised scatter-add: rows of one blocked document (shared
            # doc id) recombine additively, gamma_d = alpha + sum n_dk.
            np.add.at(
                gamma, doc_ids[valid], g_np[valid] - alpha_np[None, :]
            )
        return ll, gamma

    # -- checkpoint extras ------------------------------------------------------------

    @property
    def gamma(self):
        """Per-document doc-topic pseudo-counts [D, K] in corpus order:
        alpha + n_dk from the current count tables (the collapsed-Gibbs
        analog of the VB family's gamma — same surface, so
        ``--dump_gamma``/gamma exports work for the sampling engines
        too).  Blockwise-chunked long documents recombine additively
        through ``layouts.assemble_gamma``.  Collective when sharded
        (host_gather); call from every process."""
        if not getattr(self, "_ndk", None):
            return None
        from pylda_tpu.models import layouts
        from pylda_tpu.parallel.mesh import host_gather

        alpha_np = np.asarray(host_gather(self.state.alpha))
        return layouts.assemble_gamma(
            [np.asarray(host_gather(b.doc_ids)) for b in self._buckets],
            [alpha_np[None, :] + np.asarray(host_gather(n))
             for n in self._ndk],
            self._corpus.global_num_docs,
            alpha_np,
        )

    def _extra_state(self) -> dict:
        from pylda_tpu.parallel.mesh import host_gather

        d = {"n_kv": host_gather(self._n_kv)}
        for i, z in enumerate(self._z):
            d[f"z_{i}"] = host_gather(z)
            d[f"ndk_{i}"] = host_gather(self._ndk[i])
        return d

    def _load_extra_state(self, blobs: dict) -> None:
        if "n_kv" in blobs:
            self._n_kv = jnp.asarray(blobs["n_kv"])
            self._z_restore = blobs  # re-applied in _prepare if needed

    def _prepare_from_restore(self) -> bool:
        blobs = getattr(self, "_z_restore", None)
        if not blobs:
            return False
        zs = sorted(
            (k for k in blobs if k.startswith("z_")),
            key=lambda s: int(s.split("_")[1]),
        )
        if len(zs) != len(self._buckets):
            return False
        if any(
            blobs[k].shape != self._buckets[i].tokens.shape
            for i, k in enumerate(zs)
        ):
            return False
        # Re-place with each bucket's sharding (host_gather-ed full
        # arrays scatter back onto the current mesh — elastic resume).
        self._z = [
            jax.device_put(blobs[k], self._buckets[i].tokens.sharding)
            if hasattr(self._buckets[i].tokens, "sharding")
            else jnp.asarray(blobs[k])
            for i, k in enumerate(zs)
        ]
        self._ndk = [
            # tokens' P("data", None) spec applies to any 2-D row array.
            jax.device_put(
                blobs[f"ndk_{i}"], self._buckets[i].tokens.sharding
            )
            if hasattr(self._buckets[i].tokens, "sharding")
            else jnp.asarray(blobs[f"ndk_{i}"])
            for i in range(len(zs))
        ]
        return True
