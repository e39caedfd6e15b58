#!/usr/bin/env python
"""Sampling-engine quality at matched wall-clock (config-3 shape).

VERDICT r2 weak item 4: hybrid's held-out perplexity on config 3 was ~2x
Gibbs's (29,551 vs 15,385) with no study explaining it, so the hybrid
(burn_in, samples) defaults were uncalibrated.  This is the
sampling-engine counterpart of scripts/svi_scale_study.py: held-out
perplexity TRAJECTORIES vs cumulative device-seconds for

  - Gibbs (persistent z, collapsed tables) — the quality yardstick;
  - hybrid at several (burn_in_sweeps, number_of_samples) settings,
    with the per-iteration z cold-start it ships with.

Every engine runs until the same wall-clock budget is spent, evaluating
held-out perplexity every few iterations; the defaults are recalibrated
from the curves.

Usage: sampling_quality_study.py [budget_seconds] [K] [V] [D]
"""

import sys
import time

import jax
import numpy as np

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)

from pylda_tpu.corpus.synthetic import synthetic_corpus
from pylda_tpu.models import Hybrid, MonteCarlo
from pylda_tpu.utils.config import LDAConfig

BUDGET = float(sys.argv[1]) if len(sys.argv) > 1 else 20.0
K = int(sys.argv[2]) if len(sys.argv) > 2 else 100
V = int(sys.argv[3]) if len(sys.argv) > 3 else 10_000
D = int(sys.argv[4]) if len(sys.argv) > 4 else 8192

corpus, beta_true, _ = synthetic_corpus(
    num_docs=D, num_topics=K, num_types=V, mean_doc_length=120.0, seed=0
)
heldout, _, _ = synthetic_corpus(
    num_docs=1024, num_topics=K, num_types=V, mean_doc_length=120.0,
    seed=1, beta=beta_true,
)


def trajectory(label, engine, chunk=5):
    """(device_seconds, perplexity) points until BUDGET is spent.

    The clock EXCLUDES the held-out evaluations (they are instrumentation,
    not training) and excludes compile via a 1-iteration warmup."""
    engine.learning_many(chunk)  # compile-warm the fused scan shape
    spent = 0.0
    pts = []
    while spent < BUDGET:
        t0 = time.time()
        engine.learning_many(chunk)
        spent += time.time() - t0
        pts.append((round(spent, 2), round(engine.perplexity(heldout), 1)))
    print(f"{label}: " + " ".join(f"{s}s:{p}" for s, p in pts), flush=True)
    return pts


runs = [
    ("gibbs", dict(inference_mode="gibbs")),
    ("hybrid b5 s10 (default)", dict(
        inference_mode="hybrid", burn_in_sweeps=5, number_of_samples=10)),
    ("hybrid b2 s3", dict(
        inference_mode="hybrid", burn_in_sweeps=2, number_of_samples=3)),
    ("hybrid b10 s10", dict(
        inference_mode="hybrid", burn_in_sweeps=10, number_of_samples=10)),
    ("hybrid b20 s10", dict(
        inference_mode="hybrid", burn_in_sweeps=20, number_of_samples=10)),
]
finals = {}
for label, kw in runs:
    cfg = LDAConfig(number_of_topics=K, seed=0, **kw)
    eng = (MonteCarlo if kw["inference_mode"] == "gibbs" else Hybrid)(cfg)
    eng.initialize(corpus)
    pts = trajectory(label, eng)
    finals[label] = pts[-1][1]

best = min(finals, key=finals.get)
print("final perplexities:", finals, flush=True)
print("best:", best, flush=True)
