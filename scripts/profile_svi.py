#!/usr/bin/env python
"""Per-op device trace of an SVI epoch (VERDICT round-4 item 1).

Config 5 (K=1000, V=100k, batch 2048) runs at mfu ~0.016 and has never
been traced: the per-op xplane method that moved the headline
(0.16 -> 0.253) and config 2 (4.56x) is pointed here at the BASELINE
multi-chip flagship's single-chip step.  Traces ``learning_many(n)``
(the production fused path) and prints the leaf-op table.

Usage: python scripts/profile_svi.py [--config 5|4] [--epochs 2]
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

SHAPES = {
    4: dict(num_docs=16_384, num_topics=200, num_types=50_000,
            mean_doc_length=150.0, seed=3, batch_size=1024,
            inner_iterations=50),
    5: dict(num_docs=8_192, num_topics=1000, num_types=100_000,
            mean_doc_length=150.0, seed=4, batch_size=2048,
            inner_iterations=30),
}


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--config", type=int, default=5, choices=(4, 5))
    ap.add_argument("--epochs", type=int, default=2)
    ap.add_argument("--warm", type=int, default=4,
                    help="untraced epochs first (steady-state sweep counts)")
    ap.add_argument("--top", type=int, default=25)
    ap.add_argument("--inner", type=int, default=0,
                    help="override inner_iterations")
    ap.add_argument("--sstats_mode", default=None)
    args = ap.parse_args()

    sh = dict(SHAPES[args.config])
    bs = sh.pop("batch_size")
    inner = args.inner or sh.pop("inner_iterations")
    sh.pop("inner_iterations", None)
    corpus, _, _ = synthetic_corpus(**sh)
    kw = dict(
        number_of_topics=sh["num_topics"], inference_mode="svi",
        batch_size=bs, tau0=64.0, kappa=0.7, seed=0,
        inner_iterations=inner,
    )
    if args.sstats_mode:
        kw["sstats_mode"] = args.sstats_mode
    eng = make_engine(LDAConfig(**kw))
    eng.initialize(corpus)

    eng.learning_many(args.warm)  # compile + warm into steady state
    logdir = tempfile.mkdtemp(prefix=f"svitrace_c{args.config}_", dir="/tmp")
    with jax.profiler.trace(logdir):
        eng.learning_many(args.epochs)
        jax.block_until_ready(eng.state.lam)
    print(f"trace in {logdir} ({args.epochs} epochs, "
          f"{corpus.num_docs} docs/epoch)")
    table = leaf_table(logdir, args.top)
    table["ms_per_epoch_leafsum"] = round(
        table["leaf_busy_ms"] / args.epochs, 3
    )
    print(json.dumps(table, indent=1))


if __name__ == "__main__":
    main()
