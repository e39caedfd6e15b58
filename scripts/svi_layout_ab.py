#!/usr/bin/env python
"""A/B the ragged sweep factor layout (dtk vs kdt) at the config-5 shape.

Round-4 found the kdt layout 2-2.7x faster at K=50 (config 2) where XLA
lowers the K-contraction as multiply+reduce fusions; the per-op trace of
the config-5 epoch (K=1000) shows the sweep einsums at 6-11x the VPU
bound with K on the 128-lane axis (lane-axis reduction).  This measures
the full fused epoch at both layouts.

Usage: python scripts/svi_layout_ab.py [--config 5] [--layouts dtk,kdt]
"""

import argparse
import json
import os
import sys
import time

import jax

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pylda_tpu.corpus.synthetic import synthetic_corpus  # noqa: E402
from pylda_tpu.models import make_engine  # noqa: E402
from pylda_tpu.utils.config import LDAConfig  # noqa: E402
from pylda_tpu.ops import estep  # noqa: E402

SHAPES = {
    4: dict(num_docs=16_384, num_topics=200, num_types=50_000,
            mean_doc_length=150.0, seed=3, batch_size=1024, inner=50),
    5: dict(num_docs=8_192, num_topics=1000, num_types=100_000,
            mean_doc_length=150.0, seed=4, batch_size=2048, inner=30),
}


def measure(corpus, sh, layout, epochs=4, repeats=3):
    orig = estep._factor_layout
    estep._factor_layout = lambda k: layout
    jax.clear_caches()
    try:
        eng = make_engine(LDAConfig(
            number_of_topics=sh["num_topics"], inference_mode="svi",
            batch_size=sh["batch_size"], tau0=64.0, kappa=0.7, seed=0,
            inner_iterations=sh["inner"],
        ))
        eng.initialize(corpus)
        eng.learning_many(epochs)  # compile + warm
        dt = float("inf")
        for _ in range(repeats):
            t0 = time.time()
            eng.learning_many(epochs)
            dt = min(dt, (time.time() - t0) / epochs)
        return dt
    finally:
        estep._factor_layout = orig
        jax.clear_caches()


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--config", type=int, default=5, choices=(4, 5))
    ap.add_argument("--layouts", default="dtk,kdt")
    ap.add_argument("--epochs", type=int, default=4)
    args = ap.parse_args()
    sh = SHAPES[args.config]
    corpus, _, _ = synthetic_corpus(
        num_docs=sh["num_docs"], num_topics=sh["num_topics"],
        num_types=sh["num_types"], mean_doc_length=sh["mean_doc_length"],
        seed=sh["seed"],
    )
    out = {}
    for layout in args.layouts.split(","):
        dt = measure(corpus, sh, layout, epochs=args.epochs)
        out[layout] = {
            "epoch_seconds": round(dt, 4),
            "docs_per_sec": round(sh["num_docs"] / dt, 1),
        }
        print(json.dumps({layout: out[layout]}), flush=True)
    print(json.dumps({"config": args.config, "results": out}))


if __name__ == "__main__":
    main()
