"""Shared inferencer base.

The reference's ``class Inferencer`` (upstream:inferencer.py [UNVERIFIED],
SURVEY.md section 2.1 row 3) holds the iteration counter, topic counts,
alpha/eta vectors, vocabulary indexing, and export helpers; engines
subclass it.  We keep that public surface — ``learning()``,
``inference()``, ``export_beta()``, ``_counter`` — but the mutable NumPy
state becomes an immutable JAX pytree (``LDAState``) threaded through
jitted step functions, and checkpointing serialises that pytree instead of
pickling the object graph (SURVEY.md section 5 "Checkpoint / resume").
"""

from __future__ import annotations

import json
import os
from typing import NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from pylda_tpu.corpus.corpus import Corpus
from pylda_tpu.corpus.vocabulary import Vocabulary
from pylda_tpu.utils.config import LDAConfig


class LDAState(NamedTuple):
    """Global model state — the only cross-iteration device state.

    Deliberately tiny (K*V + K + V + scalars): this is what makes elastic
    resume on a different chip count trivial (SURVEY.md section 5 "Failure
    detection") — re-shard lam on load and go.
    """

    lam: jax.Array  # [K, V] word-topic variational Dirichlet
    alpha: jax.Array  # [K] doc-topic Dirichlet hyperparameter
    eta: jax.Array  # [V] word-topic Dirichlet hyperparameter
    step: jax.Array  # i32 iteration counter
    key: jax.Array  # PRNG key


class Inferencer:
    """Base class for all inference engines."""

    # Engines that can lift a process-local corpus (multi-host sharded
    # loading, SURVEY.md section 7.3) into globally-sharded batches set
    # this True; others must reject such corpora loudly rather than
    # silently training on different data per host.
    SUPPORTS_PROCESS_LOCAL = False

    def __init__(self, config: LDAConfig):
        self._config = config.validate()
        self._corpus: Optional[Corpus] = None
        self._vocab: Optional[Vocabulary] = None
        self._state: Optional[LDAState] = None
        self._mesh = None
        self._dtype = jnp.dtype(config.dtype)

    # -- reference-parity accessors --------------------------------------------

    @property
    def _counter(self) -> int:
        """Host-side mirror of state.step — reading the device scalar
        would cost a blocking transfer per call (expensive when dispatch
        latency is high)."""
        return getattr(self, "_step_host", 0)

    @property
    def _number_of_topics(self) -> int:
        return self._config.number_of_topics

    @property
    def _number_of_types(self) -> int:
        return 0 if self._vocab is None else len(self._vocab)

    @property
    def _number_of_documents(self) -> int:
        return 0 if self._corpus is None else self._corpus.num_docs

    @property
    def state(self) -> LDAState:
        assert self._state is not None, "call initialize() first"
        return self._state

    @property
    def config(self) -> LDAConfig:
        return self._config

    # -- lifecycle ----------------------------------------------------------------

    def initialize(
        self,
        corpus: Corpus,
        vocab: Optional[Vocabulary] = None,
        lam_init: Optional[np.ndarray] = None,
        mesh=None,
    ) -> None:
        """Build state + device batches (reference's ``_initialize``).

        ``mesh``: optional jax.sharding.Mesh — documents shard over its
        "data" axis and (if config.shard_vocab) lambda over "model"
        (SURVEY.md section 2.2; wiring in pylda_tpu.parallel.mesh)."""
        cfg = self._config
        self._corpus = corpus
        self._vocab = vocab if vocab is not None else corpus.vocab
        self._mesh = mesh
        if (
            getattr(corpus, "process_local", False)
            and jax.process_count() > 1
            and not self.SUPPORTS_PROCESS_LOCAL
        ):
            raise NotImplementedError(
                f"{type(self).__name__} does not support process-sharded "
                "corpora; load the full corpus on every host instead"
            )
        if mesh is not None and cfg.doc_pad_multiple % mesh.shape["data"]:
            raise ValueError(
                "doc_pad_multiple must be divisible by the data-axis size"
            )
        K = cfg.number_of_topics
        V = len(self._vocab)
        alpha = jnp.full((K,), cfg.resolved_alpha(), dtype=self._dtype)
        eta = jnp.full((V,), cfg.resolved_eta(V), dtype=self._dtype)
        key = jax.random.PRNGKey(cfg.seed)
        key, sub = jax.random.split(key)
        if lam_init is not None:
            lam = jnp.asarray(lam_init, dtype=self._dtype)
            assert lam.shape == (K, V)
        else:
            # Reference-style init: lambda ~ Gamma(100, 0.01) (SURVEY.md 3.1).
            lam = (
                jax.random.gamma(sub, 100.0, (K, V), dtype=self._dtype) * 0.01
            )
        self._state = LDAState(
            lam=lam,
            alpha=alpha,
            eta=eta,
            step=jnp.int32(0),
            key=key,
        )
        self._step_host = 0
        if mesh is not None:
            from pylda_tpu.parallel.mesh import shard_state

            self._state = shard_state(
                self._state, mesh, cfg.shard_vocab, cfg.shard_topics
            )
        self._prepare(corpus)

    # reference-compatible alias
    _initialize = initialize

    def _prepare(self, corpus: Corpus) -> None:
        """Engine-specific device batch construction."""
        raise NotImplementedError

    def _maybe_shard(self, batches):
        """Place host batches on device once at preparation time (shard
        over the mesh when given) so training iterations never re-upload
        the corpus."""
        if self._mesh is None:
            return [jax.device_put(b) for b in batches]  # pytree batches
        from pylda_tpu.parallel.mesh import shard_batch

        return [shard_batch(b, self._mesh) for b in batches]

    def learning(self) -> float:
        """One training iteration; returns the training objective."""
        raise NotImplementedError

    def learning_many(self, n: int):
        """n training iterations; returns the per-iteration objectives.
        Engines override this with fused on-device scans — the default
        just loops ``learning()``."""
        return [self.learning() for _ in range(n)]

    def inference(self, test_corpus: Corpus) -> Tuple[float, np.ndarray]:
        """Held-out evaluation with global state frozen; returns
        (log likelihood bound, per-doc gamma [D_test, K])."""
        raise NotImplementedError

    def phase_timings(self, repeats: int = 3) -> dict:
        """Per-phase device wall times in ms for one iteration (the
        reference printed per-phase clocks inside ``learning()``;
        SURVEY.md section 5 "Tracing / profiling").  Engines override;
        {} means the engine has no phase breakdown."""
        return {}

    def perplexity(self, test_corpus: Corpus) -> float:
        """Per-word held-out perplexity (SURVEY.md section 3.4), under
        the ENGINE'S NATIVE convention: the VB family scores tokens with
        E[log beta] (a variational lower bound), Gibbs with point
        estimates.  Numbers are therefore NOT comparable across engine
        families — use ``point_estimate_perplexity`` for that."""
        ll, _ = self.inference(test_corpus)
        return float(np.exp(-ll / max(1, test_corpus.num_tokens)))

    def point_estimate_perplexity(self, test_corpus: Corpus) -> float:
        """Convention-neutral held-out perplexity: p(w|d) = theta_hat @
        beta_hat with theta_hat from this engine's own inference gamma
        and beta_hat its topic-word POINT estimate (lambda/sum for the
        VB family — exp E[log beta] keeps the psi(small-count) collapse
        — and (n_kv+b)/(n_k+sum b) for Gibbs).

        Motivation (scripts/sampling_quality_study.py, config-3 shape):
        the native conventions differ by the Jensen gap of E[log beta]
        vs log E[beta] — ~1/(2*lam) nats per low-count word — which made
        hybrid look ~3x worse than Gibbs (23,042 vs 7,704) when the
        models were actually ~5% apart (8,124 vs 7,704) under this
        shared metric.  Cross-ENGINE quality comparisons must use this;
        reference-parity checks use ``perplexity``."""
        _ll, gamma = self.inference(test_corpus)
        theta = (gamma / gamma.sum(axis=1, keepdims=True)).astype(np.float64)
        if self._state is not None and getattr(self, "_n_kv", None) is None:
            from pylda_tpu.parallel.mesh import host_gather

            lam = host_gather(self.state.lam).astype(np.float64)
            beta = lam / lam.sum(axis=1, keepdims=True)
        else:
            beta = self.topic_word_distribution()
        # Sparse, document-blocked scoring: only the OBSERVED (doc, type)
        # pairs are evaluated — a dense [D, V] theta @ beta would cost
        # ~52 GB of host f64 at the config-5 study shapes.  Blocks are
        # bounded by observed entries so transient memory stays
        # ~entries_per_block x K.
        K = beta.shape[0]
        entries_budget = max(1, int(256e6 / (8 * K)))
        tot_ll = 0.0
        tot_n = 0
        d = 0
        D = test_corpus.num_docs
        while d < D:
            ids_l, cnts_l, rows_l = [], [], []
            entries = 0
            while d < D and (entries == 0 or entries < entries_budget):
                ids, cnts = test_corpus.doc_unique(d)
                ids_l.append(ids)
                cnts_l.append(cnts)
                rows_l.append(np.full((ids.size,), d, dtype=np.int64))
                entries += ids.size
                d += 1
            if not entries:
                continue
            all_ids = np.concatenate(ids_l)
            all_cnts = np.concatenate(cnts_l).astype(np.float64)
            rows = np.concatenate(rows_l)
            p = np.einsum(
                "ek,ek->e", theta[rows], beta[:, all_ids].T
            )
            tot_ll += float((all_cnts * np.log(p + 1e-30)).sum())
            tot_n += int(all_cnts.sum())
        return float(np.exp(-tot_ll / max(1, tot_n)))

    # -- topics --------------------------------------------------------------------

    def topic_word_distribution(self) -> np.ndarray:
        """Normalised topic-word matrix [K, V]: for the VB family this is
        exp(E[log beta_k] - logsumexp) — the reference's exp_beta parity
        surface (SURVEY.md section 3.5) — computed from lambda in float64
        on host.  (Per-topic type *ranking* is identical to the
        variational-mean estimator lambda/sum(lambda); the printed
        probabilities follow the reference's convention.)

        Collective when lambda is sharded across hosts (host_gather) —
        every process must call this together."""
        from scipy.special import psi

        from pylda_tpu.parallel.mesh import host_gather

        lam = host_gather(self.state.lam).astype(np.float64)
        elog = psi(lam) - psi(lam.sum(axis=1, keepdims=True))
        elog -= elog.max(axis=1, keepdims=True)  # stable exp-normalize
        e = np.exp(elog)
        return e / e.sum(axis=1, keepdims=True)

    def export_beta(self, path: str, top_k: int = 50) -> None:
        """Write the reference's exp_beta format (SURVEY.md section 3.5):
        per topic a ``==========\\t<k>\\t==========`` header, then the top
        ``top_k`` types by descending p(w|k), one per line.

        Call from EVERY process (the state gather is collective under
        cross-host sharding); only host 0 writes the file."""
        from pylda_tpu.utils.metrics import is_host_zero

        beta = self.topic_word_distribution()
        if not is_host_zero():
            return
        assert self._vocab is not None
        with open(path, "w", encoding="utf-8") as f:
            for k in range(beta.shape[0]):
                f.write(f"==========\t{k}\t==========\n")
                order = np.argsort(-beta[k])[:top_k]
                for v in order:
                    f.write(f"{self._vocab[int(v)]}\t{beta[k, v]:.10g}\n")

    # -- checkpoint / resume ---------------------------------------------------------

    def _extra_state(self) -> dict:
        """Engine-specific arrays to persist (e.g. Gibbs count tables)."""
        return {}

    def _load_extra_state(self, blobs: dict) -> None:
        pass

    def save(
        self,
        path: str,
        format: Optional[str] = None,
        async_write: bool = False,
    ) -> None:
        """Serialise (state pytree, vocab, config) — the sharding-aware
        analog of the reference's ``cPickle.dump(engine, model-<N>)``.

        ``format``: "npz" (default; one file) or "orbax" (a checkpoint
        DIRECTORY written via orbax/tensorstore — SURVEY.md section 5
        names it first); defaults to ``config.checkpoint_format``.
        ``load`` auto-detects the format from the path.

        ``async_write`` (npz only): the collective host-gather still
        happens on the calling thread (it must — every process
        participates), but the file write + atomic rename move to a
        background thread so periodic snapshots do not stall the train
        loop on disk IO (SURVEY.md section 5 "periodic async
        checkpoint").  A subsequent save/``wait_for_checkpoint`` joins
        the in-flight write first, so snapshots never interleave.

        Call from EVERY process (gathers are collective when state is
        sharded across hosts); only host 0 writes."""
        from pylda_tpu.parallel.mesh import host_gather
        from pylda_tpu.utils.metrics import is_host_zero

        self.wait_for_checkpoint()  # at most one in-flight write
        fmt = format or getattr(self._config, "checkpoint_format", "npz")
        st = self.state
        blobs = {
            "lam": host_gather(st.lam),
            "alpha": host_gather(st.alpha),
            "eta": host_gather(st.eta),
            "step": np.asarray(st.step),
            "key": np.asarray(st.key),
        }
        blobs.update(
            {f"extra_{k}": np.asarray(v)
             for k, v in self._extra_state().items()}
        )
        meta = {
            "config": {
                k: (list(v) if isinstance(v, tuple) else v)
                for k, v in vars(self._config).items()
            },
            "engine": type(self).__name__,
            "format_version": 1,
        }
        if not is_host_zero():
            return
        if fmt == "orbax":
            # Numeric arrays go through orbax/tensorstore; vocab +
            # config live in meta.json (string arrays are not a
            # tensorstore type).  State was host-gathered above, so the
            # write is single-controller; elastic resume re-shards on
            # load exactly as with npz.
            import orbax.checkpoint as ocp

            path = os.path.abspath(path)
            meta["vocab"] = list(self._vocab.types) if self._vocab else []
            os.makedirs(path, exist_ok=True)
            ckptr = ocp.PyTreeCheckpointer()
            ckptr.save(os.path.join(path, "state"), blobs, force=True)
            meta_tmp = os.path.join(path, f"meta.json.tmp.{os.getpid()}")
            with open(meta_tmp, "w") as f:
                json.dump(meta, f)
            os.replace(meta_tmp, os.path.join(path, "meta.json"))
            return
        blobs["vocab"] = np.asarray(
            self._vocab.types if self._vocab else []
        )
        blobs["meta_json"] = np.frombuffer(
            json.dumps(meta).encode(), dtype=np.uint8
        )
        path = os.path.abspath(path)
        os.makedirs(os.path.dirname(path), exist_ok=True)

        def _write():
            # Atomic publish: a crash/SIGKILL mid-write must never leave
            # a truncated model-<N> visible (resume picks the LATEST
            # snapshot, so a torn file would poison recovery — the exact
            # fault tests/test_fault_tolerance.py injects).
            tmp = f"{path}.tmp.{os.getpid()}"
            try:
                with open(tmp, "wb") as f:
                    np.savez(f, **blobs)
                os.replace(tmp, path)
            finally:
                if os.path.exists(tmp):
                    os.unlink(tmp)

        if async_write:
            import threading

            self._ckpt_thread = threading.Thread(target=_write, daemon=True)
            self._ckpt_thread.start()
        else:
            _write()

    def wait_for_checkpoint(self) -> None:
        """Join any in-flight async checkpoint write (no-op otherwise).
        Call before reading a just-saved snapshot or exiting."""
        t = getattr(self, "_ckpt_thread", None)
        if t is not None:
            t.join()
            self._ckpt_thread = None

    @staticmethod
    def load(
        path: str, corpus: Optional[Corpus] = None, mesh=None
    ) -> "Inferencer":
        """Restore an engine from a ``model-<N>`` checkpoint (npz file
        or orbax directory — auto-detected).

        If ``corpus`` is given the engine is fully re-initialised for
        continued training (pass ``mesh`` to resume sharded — elastic:
        the chip count may differ from the saving run); otherwise only
        inference/export are available.
        """
        from pylda_tpu import models as _models

        if os.path.isdir(path):
            import orbax.checkpoint as ocp

            with open(os.path.join(path, "meta.json")) as f:
                meta = json.load(f)
            ckptr = ocp.PyTreeCheckpointer()
            blobs = dict(
                ckptr.restore(os.path.join(os.path.abspath(path), "state"))
            )
            blobs["vocab"] = np.asarray(meta.pop("vocab", []))
        else:
            with open(path, "rb") as f:
                blobs = dict(np.load(f, allow_pickle=False))
            meta = json.loads(
                bytes(blobs.pop("meta_json").tobytes()).decode()
            )
        cfg_d = meta["config"]
        cfg_d["bucket_sizes"] = tuple(cfg_d.get("bucket_sizes") or ())
        if cfg_d.get("mesh_shape"):
            cfg_d["mesh_shape"] = tuple(cfg_d["mesh_shape"])
        # Version tolerance both ways: snapshots from OLDER builds miss
        # newly-added fields (dataclass defaults apply) and snapshots
        # from NEWER builds may carry unknown fields — drop those with
        # a warning instead of a TypeError.
        import dataclasses as _dc

        known = {f.name for f in _dc.fields(LDAConfig)}
        unknown = sorted(set(cfg_d) - known)
        if unknown:
            import warnings

            warnings.warn(
                f"checkpoint config has unknown fields {unknown} "
                "(saved by a newer build?) — ignoring them",
                stacklevel=2,
            )
            cfg_d = {k: v for k, v in cfg_d.items() if k in known}
        try:
            config = LDAConfig(**cfg_d)
            engine_cls = _models.ENGINES.get(config.inference_mode)
            if engine_cls is None:
                raise ValueError(
                    f"unknown inference_mode {config.inference_mode!r}"
                )
        except ValueError as e:
            # Unknown VALUES (not just fields) also mean a newer build:
            # say so instead of surfacing a bare validation error.
            raise ValueError(
                f"checkpoint {path!r} is not loadable by this build "
                f"({e}); it may have been saved by a newer version"
            ) from e
        engine = engine_cls(config)
        vocab = Vocabulary(str(t) for t in blobs.pop("vocab").tolist())
        engine._vocab = vocab
        engine._state = LDAState(
            lam=jnp.asarray(blobs["lam"]),
            alpha=jnp.asarray(blobs["alpha"]),
            eta=jnp.asarray(blobs["eta"]),
            step=jnp.int32(blobs["step"]),
            key=jnp.asarray(blobs["key"]),
        )
        engine._step_host = int(blobs["step"])
        engine._load_extra_state(
            {
                k[len("extra_") :]: v
                for k, v in blobs.items()
                if k.startswith("extra_")
            }
        )
        if corpus is not None:
            engine._corpus = corpus
            engine._mesh = mesh
            if (
                getattr(corpus, "process_local", False)
                and jax.process_count() > 1
                and not engine.SUPPORTS_PROCESS_LOCAL
            ):
                raise NotImplementedError(
                    f"{type(engine).__name__} does not support "
                    "process-sharded corpora"
                )
            if mesh is not None:
                if config.doc_pad_multiple % mesh.shape["data"]:
                    raise ValueError(
                        "doc_pad_multiple must be divisible by the "
                        "data-axis size"
                    )
                from pylda_tpu.parallel.mesh import shard_state

                # Elastic resume: re-shard the loaded (replicated) state
                # for the current mesh (SURVEY.md section 5).
                engine._state = shard_state(
                    engine._state, mesh, config.shard_vocab,
                    config.shard_topics,
                )
            engine._prepare(corpus)
        return engine
