#!/usr/bin/env python
"""Config-5 inner-sweep budget: quality vs epoch time (round 5).

bench_suite config 5 sets inner_iterations=30 and the measured sweep
counts sit at the cap (the bf16 stall exit rarely fires at K=1000 in
early epochs) — the sweep phase is ~40% of the epoch, so the cap is a
first-order throughput knob.  This measures held-out perplexity (both
conventions) and epoch time across caps at the exact suite shape to
locate the quality-neutral setting.

Usage: python scripts/svi_inner_sweeps_study.py [--inners 10,15,20,30,50]
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


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--inners", default="10,15,20,30,50")
    ap.add_argument("--epochs", type=int, default=16)
    args = ap.parse_args()

    corpus, beta_true, _ = synthetic_corpus(
        num_docs=8_192, num_topics=1000, num_types=100_000,
        mean_doc_length=150.0, seed=4,
    )
    test, _, _ = synthetic_corpus(
        num_docs=256, num_topics=1000, num_types=100_000,
        mean_doc_length=150.0, seed=104, beta=beta_true,
    )
    for inner in (int(x) for x in args.inners.split(",")):
        eng = make_engine(LDAConfig(
            number_of_topics=1000, inference_mode="svi", batch_size=2048,
            tau0=64.0, kappa=0.7, seed=0, inner_iterations=inner,
        ))
        eng.initialize(corpus)
        eng.learning_many(4)  # compile + warm
        t0 = time.time()
        eng.learning_many(4)
        dt = (time.time() - t0) / 4
        eng.learning_many(args.epochs - 8)
        print(json.dumps({
            "inner": inner,
            "epoch_s": round(dt, 4),
            "docs_per_sec": round(corpus.num_docs / dt, 1),
            "heldout_point_ppl": round(
                eng.point_estimate_perplexity(test), 2
            ),
            "heldout_native_ppl": round(eng.perplexity(test), 2),
        }), flush=True)
        del eng


if __name__ == "__main__":
    main()
