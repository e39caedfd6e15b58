#!/usr/bin/env python
"""North-star benchmark (BASELINE.json:2): docs/sec/chip at K=100.

Runs the batched VB engine on the TPU (default platform) over a synthetic
20-News-shaped corpus (the real corpus is not downloadable here —
SURVEY.md section 7.3), and measures steady-state full-corpus iterations.

``vs_baseline`` is the speedup over the PyLDA-CPU stand-in: the float64
NumPy oracle with the reference's per-document-loop structure
(SURVEY.md section 6; target >= 100x per BASELINE.json:5), measured on a
subset of the same corpus on this host's CPU.

Deadline discipline (round-2 rework): this script MUST print exactly one
JSON line before any plausible driver timeout, even when the tunneled TPU
is hard-wedged (it hangs on trivial dispatch for minutes after killed
processes — observed repeatedly on this machine).  Mechanisms:

- a watchdog thread that, at ``BENCH_DEADLINE_SECONDS`` (default 420 s)
  minus a safety margin, emits a fallback line and ``os._exit``s — a
  wedged XLA dispatch cannot be interrupted any other way, and os._exit
  terminates even with hung runtime threads.  No pre-probe: a separate
  probe process was measured to false-negative right after another
  process releases the device (fresh-process init ranged 30 s to
  minutes), so the whole budget goes to the real measurement and the
  watchdog is the only escape hatch;
- ``BENCH_CACHE.json`` (committed): the last successful live result.
  When the device is unusable or time runs out, that result is re-emitted
  with ``"stale": true`` + a reason, so ``parsed: null`` is impossible;
- a persistent compile cache under the repo (survives across rounds and
  is pre-warmed whenever bench.py runs during a build session), so the
  driver's run does not pay the ~20-40 s/kernel remote cold compile.

Prints ONE JSON line:
  {"metric": ..., "value": N, "unit": "docs/s", "vs_baseline": N, ...}
"""

import json
import os
import sys
import threading
import time

import numpy as np

_REPO = os.path.dirname(os.path.abspath(__file__))
_CACHE_PATH = os.path.join(_REPO, "BENCH_CACHE.json")
_T0 = time.time()
_DEADLINE = float(os.environ.get("BENCH_DEADLINE_SECONDS", "420"))
_EMITTED = threading.Lock()  # first emitter wins; everyone else is a no-op
_emitted = False


def _emit(payload: dict) -> None:
    """Print the one JSON line (exactly once, whoever gets here first)."""
    global _emitted
    with _EMITTED:
        if _emitted:
            return
        _emitted = True
        payload.setdefault("wall_seconds", round(time.time() - _T0, 1))
        print(json.dumps(payload), flush=True)


def _load_cache() -> dict:
    try:
        with open(_CACHE_PATH) as f:
            return json.load(f)
    except Exception:
        return {}


def _save_cache(payload: dict) -> None:
    try:
        tmp = _CACHE_PATH + ".tmp"
        with open(tmp, "w") as f:
            json.dump(payload, f, indent=1)
        os.replace(tmp, _CACHE_PATH)
    except Exception:
        pass  # cache write failure must never break the bench


def _fallback(reason: str) -> dict:
    """Last-known-good result marked stale (never parsed: null)."""
    cache = _load_cache()
    if cache:
        cache.pop("wall_seconds", None)
        cache.update({"stale": True, "stale_reason": reason})
        return cache
    return {
        "metric": "docs/sec/chip, batch VB LDA K=100 V=10k",
        "value": 0.0,
        "unit": "docs/s",
        "vs_baseline": 0.0,
        "stale": True,
        "stale_reason": reason + " (and no BENCH_CACHE.json)",
    }


def _watchdog() -> None:
    margin = 15.0
    delay = max(5.0, _DEADLINE - margin - (time.time() - _T0))
    time.sleep(delay)
    _emit(_fallback(
        f"deadline {int(_DEADLINE)}s reached before a live measurement "
        "(TPU wedged or compile too slow)"
    ))
    sys.stdout.flush()
    os._exit(0)


def _remaining() -> float:
    return _DEADLINE - (time.time() - _T0)


def main() -> int:
    threading.Thread(target=_watchdog, daemon=True).start()

    import jax

    # NOTE: the env var JAX_COMPILATION_CACHE_DIR is useless here — the
    # machine's sitecustomize imports jax at interpreter startup, before
    # this line runs — so set the config keys directly (runtime-settable).
    jax.config.update(
        "jax_compilation_cache_dir", os.path.join(_REPO, ".jax_cache")
    )
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)

    from pylda_tpu.corpus.synthetic import synthetic_corpus
    from pylda_tpu.models import VariationalBayes
    from pylda_tpu.oracle import OracleVB
    from pylda_tpu.utils.config import LDAConfig

    K, V, D = 100, 10_000, 4096
    mean_len = 120.0
    corpus, _, _ = synthetic_corpus(
        num_docs=D,
        num_topics=K,
        num_types=V,
        mean_doc_length=mean_len,
        seed=0,
    )

    cfg = LDAConfig(
        number_of_topics=K,
        inference_mode="vb",
        inner_iterations=50,
        convergence_threshold=1e-5,
        seed=0,
    )
    eng = VariationalBayes(cfg)
    eng.initialize(corpus)
    # 128 fused iterations per dispatch: production training runs long
    # fused scans (that IS the design), and at n=16 the ~30 ms tunnel
    # dispatch tax alone is ~1.9 ms/pass of pure measurement artifact
    # (still ~0.47 ms/pass at n=64 against today's 6.4 ms pass).
    iters = 128
    eng.learning_many(iters)  # compile + warm (excluded; scan length is
    # a static shape, so warm with the same n as the timed call)
    t0 = time.time()
    elbos = eng.learning_many(iters)  # ONE fused device dispatch
    dt = (time.time() - t0) / iters
    elbo = elbos[-1]
    docs_per_sec = D / dt

    # PyLDA-CPU stand-in: per-document Python/NumPy loop, same config.
    # The CPU number is hardware-fixed, so reuse the cached measurement
    # when the remaining budget cannot fit a fresh one (~60-90 s).
    cache = _load_cache()
    baseline_docs_per_sec = cache.get("baseline_docs_per_sec", 0.0)
    baseline_src = "cached" if baseline_docs_per_sec else "none"
    if _remaining() > 150.0 or not baseline_docs_per_sec:
        sub_n = 256
        sub = corpus.subset(range(sub_n))
        ora = OracleVB(
            sub, num_topics=K, alpha=1.0 / K, eta=1.0 / V, seed=0,
            inner_iterations=50, convergence_threshold=1e-6,
        )
        ora.learning()  # warm
        best = float("inf")
        for _ in range(2):  # best-of-2: least-loaded host measurement
            t0 = time.time()
            ora.learning()
            best = min(best, time.time() - t0)
        baseline_docs_per_sec = sub_n / best
        baseline_src = "measured"

    # Roofline utilisation of the measured pass ("actually fast", not
    # just "faster than the CPU oracle"): measured ms vs the analytic
    # lower bound at the converged sweep counts (utils/roofline.py).
    mfu = 0.0
    try:
        if _remaining() > 30.0:
            from pylda_tpu.utils.roofline import pass_bound_ms

            bound = pass_bound_ms(eng)
            mfu = min(1.0, bound / (dt * 1e3)) if bound > 0 else 0.0
    except Exception:
        pass  # the utilisation annotation must never sink the headline

    # Pinned-denominator speedup: the CPU oracle number swings ~1.7x
    # with host load; vs_baseline_pinned uses the best CPU measurement
    # ever recorded (the hardest denominator), so round-over-round
    # speedup claims stay comparable.
    pinned = max(
        baseline_docs_per_sec,
        float(cache.get("baseline_docs_per_sec_pinned", 0.0)),
    )

    payload = {
        "metric": "docs/sec/chip, batch VB LDA K=100 V=10k",
        "value": round(docs_per_sec, 2),
        "unit": "docs/s",
        "vs_baseline": round(docs_per_sec / baseline_docs_per_sec, 2),
        "vs_baseline_pinned": round(docs_per_sec / pinned, 2),
        "baseline_docs_per_sec": round(baseline_docs_per_sec, 2),
        "baseline_docs_per_sec_pinned": round(pinned, 2),
        "baseline_source": baseline_src,
        "mfu": round(mfu, 4),
        "tokens_per_sec": round(corpus.num_tokens / dt, 1),
        "seconds_per_corpus_pass": round(dt, 4),
        "scan_length": iters,
        "elbo": round(float(elbo), 1),
        "device": str(jax.devices()[0]),
    }
    _save_cache(payload)
    _emit(payload)
    return 0


if __name__ == "__main__":
    sys.exit(main())
