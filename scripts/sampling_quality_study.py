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

Usage: sampling_quality_study.py [budget_seconds] [K] [V] [D] [filters]

MEASURED (v5e, K=100 V=10k D=8192 train / 1024 held-out, 20 device-s
each, 2026-08-19) — the mystery is RESOLVED as a scoring-convention
artifact, not a model gap:

  setting                      native ppl    point-estimate ppl
  gibbs                        7703.6        7703.7
  gibbs eta.01                 8355.0        8355.2
  hybrid b5 s10 (default)      23041.5       8123.9
  hybrid pz b5 s10             22456.5       8491.9
  hybrid b2 s3                 24903.5       -
  hybrid b10 s10               21636.2       -
  hybrid b20 s10               20625.7       -

1. The VB family's native held-out score uses E[log beta] — a lower
   bound Jensen-penalised by ~1/(2 lam) nats per low-count word — while
   Gibbs scores with point estimates.  Under the SHARED point-estimate
   metric the 3x "gap" collapses to 5.5% (8124 vs 7704), which is the
   expected cost of hybrid's sampled local step.
2. The native-convention "divergence" over training (21.9k -> 23.0k)
   is the same artifact: as lambda sharpens, more entries go low-count
   and the Jensen penalty GROWS.  The point-estimate metric is stable.
3. Persistent chains (hybrid_persistent_z=True) flatten the native
   trajectory but are slightly worse on the real metric (8492 vs 8124)
   — chain-lambda autocorrelation.  Default stays False.
4. More burn-in monotonically improves the native number (b20 s10 =
   20.6k) but only by shrinking the same artifact; defaults b5 s10 are
   kept.
5. eta=0.01 (vs 1/V) does not help either engine on this corpus.

Library consequences: Inferencer.point_estimate_perplexity +
pylda-test --point_estimate; BENCH_SUITE config-3 quality rows must
compare engines on the point-estimate metric.
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


def point_perplexity(eng, corpus):
    """Convention-neutral held-out score (now a library surface:
    ``Inferencer.point_estimate_perplexity``).  The VB family's native
    score uses E[log beta] (a lower bound, Jensen-penalised by
    ~1/(2*lam) per low-count word) while Gibbs uses point estimates —
    comparing those two numbers across engines mixes model quality with
    scoring convention; this metric doesn't."""
    return eng.point_estimate_perplexity(corpus)


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
    ("hybrid b5 s10 (r2 default)", dict(
        inference_mode="hybrid", burn_in_sweeps=5, number_of_samples=10)),
    ("hybrid b2 s3", dict(
        inference_mode="hybrid", burn_in_sweeps=2, number_of_samples=3)),
    ("hybrid b10 s10", dict(
        inference_mode="hybrid", burn_in_sweeps=10, number_of_samples=10)),
    ("hybrid b20 s10", dict(
        inference_mode="hybrid", burn_in_sweeps=20, number_of_samples=10)),
    # Persistent chains: z carried across iterations, so burn-in
    # amortises over the run instead of restarting from uniform.
    ("hybrid pz b5 s10", dict(
        inference_mode="hybrid", burn_in_sweeps=5, number_of_samples=10,
        hybrid_persistent_z=True)),
    ("hybrid pz b1 s3", dict(
        inference_mode="hybrid", burn_in_sweeps=1, number_of_samples=3,
        hybrid_persistent_z=True)),
    # eta lock-out probe: with eta = 1/V = 1e-4, E[log beta] is ~-1e4
    # for zero-count words, freezing hard assignments; eta = 0.01
    # softens the factor.
    ("hybrid eta.01 b5 s10", dict(
        inference_mode="hybrid", burn_in_sweeps=5, number_of_samples=10,
        alpha_beta=0.01)),
    ("hybrid pz eta.01 b1 s3", dict(
        inference_mode="hybrid", burn_in_sweeps=1, number_of_samples=3,
        hybrid_persistent_z=True, alpha_beta=0.01)),
    ("gibbs eta.01", dict(inference_mode="gibbs", alpha_beta=0.01)),
]
if len(sys.argv) > 5:  # optional label filter (comma-separated substrings)
    pats = sys.argv[5].split(",")
    runs = [r for r in runs if any(p in r[0] for p in pats)]
finals = {}
points = {}
for label, kw in runs:
    cfg = LDAConfig(number_of_topics=K, seed=0, **kw)
    eng = (MonteCarlo if kw["inference_mode"] == "gibbs" else Hybrid)(cfg)
    eng.initialize(corpus)
    pts = trajectory(label, eng)
    finals[label] = pts[-1][1]
    points[label] = round(point_perplexity(eng, heldout), 1)
    print(f"{label}: native {finals[label]} / point-estimate "
          f"{points[label]}", flush=True)

best = min(finals, key=finals.get)
print("final perplexities (native convention):", finals, flush=True)
print("final perplexities (point estimate):", points, flush=True)
print("best:", best, flush=True)
