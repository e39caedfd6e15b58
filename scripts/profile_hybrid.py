#!/usr/bin/env python
"""Per-op device trace of gibbs/hybrid iterations (VERDICT items 2/6).

Hybrid sits at ~58k docs/s (mfu 0.018) and Gibbs flat at ~295k for two
rounds with the n_kv rebuild at 63% of the sweep; neither has a per-op
decomposition at the config-3 shape.  Traces ``learning_many(n)`` and
prints the leaf-op table (scripts/xplane_leaves.py).

Usage: python scripts/profile_hybrid.py [--mode hybrid|gibbs] [--n 4]
"""

import argparse
import json
import os
import sys
import tempfile

import jax

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from scripts.xplane_leaves import leaf_table  # noqa: E402

from pylda_tpu.corpus.synthetic import synthetic_corpus  # noqa: E402
from pylda_tpu.models import make_engine  # noqa: E402
from pylda_tpu.utils.config import LDAConfig  # noqa: E402


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--mode", default="hybrid", choices=("hybrid", "gibbs"))
    ap.add_argument("--n", type=int, default=4)
    ap.add_argument("--warm", type=int, default=4)
    ap.add_argument("--top", type=int, default=25)
    args = ap.parse_args()

    corpus, _, _ = synthetic_corpus(
        num_docs=4096, num_topics=100, num_types=30_000,
        mean_doc_length=120.0, seed=2,
    )
    eng = make_engine(LDAConfig(
        number_of_topics=100, inference_mode=args.mode, seed=0,
        number_of_samples=5, burn_in_sweeps=3,
    ))
    eng.initialize(corpus)
    eng.learning_many(args.warm)
    logdir = tempfile.mkdtemp(prefix=f"{args.mode}trace_", dir="/tmp")
    with jax.profiler.trace(logdir):
        out = eng.learning_many(args.n)
    print(f"trace in {logdir}; objective {out[-1]:.1f}")
    table = leaf_table(logdir, args.top)
    table["ms_per_iteration_leafsum"] = round(
        table["leaf_busy_ms"] / args.n, 3
    )
    print(json.dumps(table, indent=1))


if __name__ == "__main__":
    main()
