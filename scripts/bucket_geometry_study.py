#!/usr/bin/env python
"""Measure end-to-end pass time vs ragged bucket geometry (real TPU).

Sweep cost scales with total slots (rows x bucket width, padding
included).  The default geometry (64,128,...x2) measures 77.6% slot
occupancy on the flagship bench shape (D=4096, mean 120 tokens,
V=10k): most docs have ~100 uniques and land in the 128 bucket.  Finer
geometries push occupancy to 86-91%; this script checks whether the
end-to-end engine pass actually gets faster (more buckets = more
per-bucket glue + more sub-graphs, and sublane/lane padding can eat
the savings).

Methodology: fused learning_many through the engine, warm + timed
(per CLAUDE.md measurement discipline — never per-call wall timing).

Measured (v5e, 64-pass scan, 2026-08-17): default-pow2 10.77 ms/pass
(622,592 slots), hand fine-16 10.32 (529,408), auto-DP (112,128,144,160)
10.27 (531,456; 90.9% occupancy) — the planner matches the best
hand-tuned geometry and became the default (bucket_policy="auto").
"""

import json
import sys
import time

import jax


GEOMS = {
    "default-pow2": (64, 128, 256, 512, 1024, 2048),
    "fine-16": (48, 80, 96, 112, 128, 144, 160, 192, 256, 512, 1024, 2048),
    "auto-dp": None,  # planner output (models/layouts.plan_bucket_sizes)
}


def main() -> int:
    jax.config.update(
        "jax_compilation_cache_dir", "/root/repo/.jax_cache"
    )
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)

    from pylda_tpu.corpus.synthetic import synthetic_corpus
    from pylda_tpu.models import VariationalBayes
    from pylda_tpu.utils.config import LDAConfig

    K, V, D = 100, 10_000, 4096
    corpus, _, _ = synthetic_corpus(
        num_docs=D, num_topics=K, num_types=V,
        mean_doc_length=120.0, seed=0,
    )
    from pylda_tpu.models.layouts import plan_bucket_sizes

    iters = 64  # amortise the ~30 ms tunnel dispatch tax to <0.5 ms/pass
    results = {}
    for name, geom in GEOMS.items():
        if geom is None:
            geom = plan_bucket_sizes(
                [len(ids) for ids, _ in corpus._uniques]
            )
            print("auto-dp geometry:", geom, flush=True)
        cfg = LDAConfig(
            number_of_topics=K, inference_mode="vb",
            inner_iterations=50, convergence_threshold=1e-5,
            seed=0, bucket_sizes=geom, bucket_policy="fixed",
        )
        eng = VariationalBayes(cfg)
        eng.initialize(corpus)
        eng.learning_many(iters)  # compile + warm
        best = float("inf")
        for _ in range(3):
            t0 = time.time()
            elbos = eng.learning_many(iters)
            best = min(best, (time.time() - t0) / iters)
        bks = corpus.to_ragged_buckets(bucket_sizes=geom)
        slots = sum(b.ids.shape[0] * b.ids.shape[1] for b in bks)
        results[name] = {
            "ms_per_pass": round(best * 1e3, 2),
            "docs_per_sec": round(D / best, 0),
            "slots": slots,
            "buckets": {int(b.ids.shape[1]): int(b.ids.shape[0])
                        for b in bks},
            "elbo": round(float(elbos[-1]), 1),
        }
        print(name, json.dumps(results[name]), flush=True)
    return 0


if __name__ == "__main__":
    sys.exit(main())
