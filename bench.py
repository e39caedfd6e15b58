#!/usr/bin/env python
"""North-star benchmark (BASELINE.json:2): docs/sec/chip at K=100.

Runs the batched VB engine on the TPU (default platform) over a synthetic
20-News-shaped corpus (the real corpus is not downloadable here —
SURVEY.md section 7.3), and measures steady-state full-corpus iterations.

``vs_baseline`` is the speedup over the PyLDA-CPU stand-in: the float64
NumPy oracle with the reference's per-document-loop structure
(SURVEY.md section 6; target >= 100x per BASELINE.json:5), measured on a
subset of the same corpus on this host's CPU.

Prints ONE JSON line:
  {"metric": ..., "value": N, "unit": "docs/s", "vs_baseline": N}
"""

import json
import os
import sys
import time

import numpy as np


def main() -> int:
    # The tunneled TPU occasionally wedges (hangs on trivial dispatch)
    # for a few minutes after killed processes; probe it in a subprocess
    # with a timeout and wait out a wedge rather than hanging the driver.
    import subprocess

    for attempt in range(3):
        try:
            probe = subprocess.run(
                [sys.executable, "-c",
                 "import jax, jax.numpy as jnp; print(float(jnp.ones(4).sum()))"],
                capture_output=True, timeout=600,
            )
            if probe.returncode == 0:
                break
            # Instant non-zero exit = real breakage, not a wedge; the
            # main path will surface the error — don't burn retries.
            break
        except subprocess.TimeoutExpired:
            if attempt < 2:
                time.sleep(240)  # wait out the wedge, then re-probe

    os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jax_bench_cache")
    import jax

    jax.config.update(
        "jax_persistent_cache_min_compile_time_secs", 0.0
    )

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
    iters = 16
    eng.learning_many(iters)  # compile + warm (excluded; scan length is
    # a static shape, so warm with the same n as the timed call)
    t0 = time.time()
    elbos = eng.learning_many(iters)  # ONE fused device dispatch
    dt = (time.time() - t0) / iters
    elbo = elbos[-1]
    docs_per_sec = D / dt

    # PyLDA-CPU stand-in: per-document Python/NumPy loop, same config.
    sub_n = 256
    sub = corpus.subset(range(sub_n))
    ora = OracleVB(
        sub, num_topics=K, alpha=1.0 / K, eta=1.0 / V, seed=0,
        inner_iterations=50, convergence_threshold=1e-6,
    )
    ora.learning()  # warm
    best = float("inf")
    for _ in range(3):  # best-of-3: least-loaded host measurement
        t0 = time.time()
        ora.learning()
        best = min(best, time.time() - t0)
    baseline_docs_per_sec = sub_n / best

    print(
        json.dumps(
            {
                "metric": "docs/sec/chip, batch VB LDA K=100 V=10k",
                "value": round(docs_per_sec, 2),
                "unit": "docs/s",
                "vs_baseline": round(docs_per_sec / baseline_docs_per_sec, 2),
                "baseline_docs_per_sec": round(baseline_docs_per_sec, 2),
                "tokens_per_sec": round(corpus.num_tokens / dt, 1),
                "seconds_per_corpus_pass": round(dt, 4),
                "elbo": round(float(elbo), 1),
                "device": str(jax.devices()[0]),
            }
        )
    )
    return 0


if __name__ == "__main__":
    sys.exit(main())
