#!/usr/bin/env python
"""SVI vs batch VB at scale: held-out perplexity vs wall-clock.

VERDICT.md round-1 weak item 5: SVI's quality story on the tiny bundled
corpus is weak (basin selection from random init).  This study runs the
comparison SVI is FOR — a corpus large enough that one full batch-VB
pass is expensive relative to convergence from partial passes — and
records (wall_seconds, held-out perplexity) trajectories for both
engines from the same random init.  Results go to BENCH_SUITE.md.

Run on the real TPU: python scripts/svi_scale_study.py
"""

import json
import time

import jax
import numpy as np

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)

from pylda_tpu.corpus.synthetic import synthetic_corpus
from pylda_tpu.models import StochasticVariationalBayes, VariationalBayes
from pylda_tpu.utils.config import LDAConfig

K, V, D = 100, 10_000, 65_536
TEST_D = 2048
BUDGET_S = 40.0  # wall-clock per engine after warmup

corpus, beta_true, _ = synthetic_corpus(
    num_docs=D + TEST_D, num_topics=K, num_types=V,
    mean_doc_length=120.0, seed=0,
)
train = corpus.subset(range(D))
test = corpus.subset(range(D, D + TEST_D))
print(f"train: {train.num_docs} docs, {train.num_tokens} tokens")


def run(name, eng, step_fn, steps_per_tick):
    """step_fn() advances training; measure perplexity per tick."""
    eng.initialize(train)
    step_fn()  # compile/warm (excluded from the clock)
    eng.initialize(train)  # reset state post-warm
    traj = []
    t0 = time.time()
    while (time.time() - t0) < BUDGET_S:
        step_fn()
        dt = time.time() - t0
        t_eval = time.time()
        ppl = float(eng.perplexity(test))
        # Perplexity evaluation cost is excluded from the clock.
        t0 += time.time() - t_eval
        traj.append((round(dt, 2), round(ppl, 2)))
        print(f"  {name} t={dt:7.2f}s ppl={ppl:9.2f}", flush=True)
    return traj


results = {}

cfg_vb = LDAConfig(
    number_of_topics=K, inference_mode="vb", inner_iterations=50,
    convergence_threshold=1e-5, seed=0,
)
vb = VariationalBayes(cfg_vb)
results["vb"] = run("vb", vb, lambda: vb.learning_many(2), 2)

cfg_svi = LDAConfig(
    number_of_topics=K, inference_mode="svi", inner_iterations=50,
    convergence_threshold=1e-5, seed=0, batch_size=1024,
    kappa=0.7, tau0=64.0,
)
svi = StochasticVariationalBayes(cfg_svi)
results["svi"] = run("svi", svi, lambda: svi.learning(), 1)

print(json.dumps(results))
