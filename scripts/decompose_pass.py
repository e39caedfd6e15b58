#!/usr/bin/env python
"""Decompose the flagship pass via the fused scan path (the only honest
measurement on this tunneled setup): pass time vs fixed sweep count gives
per-sweep slope + fixed-cost intercept."""

import time

import jax

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)

from pylda_tpu.corpus.synthetic import synthetic_corpus
from pylda_tpu.models import VariationalBayes
from pylda_tpu.utils.config import LDAConfig

K, V, D = 100, 10_000, 4096
corpus, _, _ = synthetic_corpus(
    num_docs=D, num_topics=K, num_types=V, mean_doc_length=120.0, seed=0
)

N = 16
rows = []
for iters in (1, 5, 13, 25, 50):
    cfg = LDAConfig(
        number_of_topics=K, inference_mode="vb", inner_iterations=iters,
        convergence_threshold=0.0, seed=0,
    )
    eng = VariationalBayes(cfg)
    eng.initialize(corpus)
    eng.learning_many(N)  # compile + warm
    best = float("inf")
    for _ in range(3):
        t0 = time.time()
        eng.learning_many(N)
        best = min(best, (time.time() - t0) / N)
    print(f"iters={iters}: {best*1e3:.3f} ms/pass")
    rows.append((iters, best))

(x0, y0), (x1, y1) = rows[0], rows[-1]
slope = (y1 - y0) / (x1 - x0)
print(f"slope ~{slope*1e3:.4f} ms/sweep, intercept ~{(y0 - slope*x0)*1e3:.3f} ms fixed")

# default config (convergence active) for reference
cfg = LDAConfig(
    number_of_topics=K, inference_mode="vb", inner_iterations=50,
    convergence_threshold=1e-5, seed=0,
)
eng = VariationalBayes(cfg)
eng.initialize(corpus)
eng.learning_many(N)
best = float("inf")
for _ in range(3):
    t0 = time.time()
    eng.learning_many(N)
    best = min(best, (time.time() - t0) / N)
print(f"converging (thr=1e-5, cap=50): {best*1e3:.3f} ms/pass")
