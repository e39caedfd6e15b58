#!/usr/bin/env python
"""Op-level device-trace attribution of an SVI epoch (config-5 shape).

Round-4 follow-up: BENCH_SUITE's config 5 (SVI K=1000 V=100k) reports
mfu 0.016 — the lowest row in the suite — and config 4 sits at 0.10.
The flagship per-op tracing method (scripts/profile_sweep.py, xplane
proto parsed directly) is the wall-timing-immune way to find out where
the epoch actually goes: E-step sweeps vs sstats vs the natural-gradient
lambda update vs [K,V] exp-psi vs gather/packing glue.

Usage: python scripts/profile_svi.py [--topics 1000 --types 100000 ...]
"""

import argparse
import os
import sys
import tempfile

import jax

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from scripts.profile_sweep import capture, xplane_op_table  # noqa: E402

from pylda_tpu.corpus.synthetic import synthetic_corpus  # noqa: E402
from pylda_tpu.models import make_engine  # noqa: E402
from pylda_tpu.utils.config import LDAConfig  # noqa: E402


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--topics", type=int, default=1000)
    ap.add_argument("--types", type=int, default=100_000)
    ap.add_argument("--docs", type=int, default=8192)
    ap.add_argument("--batch", type=int, default=2048)
    ap.add_argument("--inner", type=int, default=30)
    ap.add_argument("--mean_len", type=float, default=150.0)
    ap.add_argument("--epochs", type=int, default=2)
    ap.add_argument("--warm", type=int, default=4)
    args = ap.parse_args()

    corpus, _, _ = synthetic_corpus(
        num_docs=args.docs, num_topics=args.topics,
        num_types=args.types, mean_doc_length=args.mean_len, seed=4,
    )
    cfg = LDAConfig(
        number_of_topics=args.topics, inference_mode="svi",
        batch_size=args.batch, tau0=64.0, kappa=0.7, seed=0,
        inner_iterations=args.inner,
    )
    eng = make_engine(cfg)
    eng.initialize(corpus)
    if args.warm:
        eng.learning_many(args.warm)

    logdir = tempfile.mkdtemp(prefix="svitrace_", dir="/tmp")
    capture(eng, args.epochs, logdir)
    print(f"trace in {logdir}")

    import json

    table = xplane_op_table(logdir)
    print(json.dumps(table, indent=1, default=str)[:9000])


if __name__ == "__main__":
    main()
