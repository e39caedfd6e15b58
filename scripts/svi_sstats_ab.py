#!/usr/bin/env python
"""On-chip A/B grid: scatter vs dense minibatch sufficient statistics.

The round-4 dense-sstats plan for SVI minibatches
(``svi._plan_mb_dense_sstats``) replaces each minibatch's per-chunk
[V, K] segment-sum scatter with two MXU matmuls against gathered dense
count rows.  Measured at the two suite shapes it moved config 5
(K=1000, V=100k) +69% but cost config 4 (K=200, V=50k) −14% — the
scatter partial bytes scale with n_chunks·K·V while the dense path adds
matmul + gather + [B, V] phinorm traffic that scales with B·V(·K).
This grid locates the crossover so the "auto" gate can be calibrated
from measurements, the same method as the topic-sampler rule
(scripts/sampler_grid_ab.py).

Usage: python scripts/svi_sstats_ab.py [--cells "K,V,B;K,V,B;..."]
Prints one JSON line per (cell, mode) with epoch seconds.
"""

import argparse
import json
import os
import sys
import time

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jax_bench_cache")

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax  # noqa: E402

jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)

from pylda_tpu.corpus.synthetic import synthetic_corpus  # noqa: E402
from pylda_tpu.models import make_engine  # noqa: E402
from pylda_tpu.utils.config import LDAConfig  # noqa: E402

DEFAULT_CELLS = "200,50000,1024;500,50000,1024;200,100000,2048;500,100000,2048;1000,50000,1024;1000,100000,2048"


def time_epochs(eng, epochs=4, repeats=3):
    eng.learning_many(epochs)  # compile + warm at the measured length
    dt = float("inf")
    for _ in range(repeats):
        t0 = time.time()
        eng.learning_many(epochs)
        dt = min(dt, (time.time() - t0) / epochs)
    return dt


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--cells", default=DEFAULT_CELLS)
    ap.add_argument("--docs", type=int, default=8192)
    ap.add_argument("--mean_len", type=float, default=150.0)
    ap.add_argument("--epochs", type=int, default=4)
    args = ap.parse_args()

    for cell in args.cells.split(";"):
        K, V, B = (int(x) for x in cell.split(","))
        corpus, _, _ = synthetic_corpus(
            num_docs=args.docs, num_topics=K, num_types=V,
            mean_doc_length=args.mean_len, seed=4,
        )
        out = {"K": K, "V": V, "B": B}
        for mode in ("scatter", "dense"):
            cfg = LDAConfig(
                number_of_topics=K, inference_mode="svi", batch_size=B,
                tau0=64.0, kappa=0.7, seed=0, inner_iterations=30,
                sstats_mode=mode,
            )
            eng = make_engine(cfg)
            eng.initialize(corpus)
            if mode == "dense" and eng._mb_sstats is None:
                out[mode] = None  # budget-gated off at this shape
                continue
            out[mode] = round(time_epochs(eng, args.epochs), 4)
            del eng
        if out.get("scatter") and out.get("dense"):
            out["dense_speedup"] = round(out["scatter"] / out["dense"], 3)
        print(json.dumps(out), flush=True)


if __name__ == "__main__":
    main()
