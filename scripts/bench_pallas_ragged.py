#!/usr/bin/env python
"""Measure the fused ragged Pallas gamma kernel vs the XLA ragged path
on the real chip, at the flagship shape and a sweep of bucket widths.

Three rows per shape:
  xla_sweeps     — ops/estep.estep_ragged_gamma (B re-read 2x/sweep)
  pallas_sweeps  — ops/pallas_ragged.pallas_estep_ragged_gamma
                   (B VMEM-resident across all sweeps)
  e2e            — full engine pass (hybrid dense-sstats), XLA vs Pallas

Run:  python scripts/bench_pallas_ragged.py [--quick]
"""

import argparse
import json
import os
import sys
import time

import numpy as np

_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, _REPO)


def best_of(fn, n=5):
    import jax

    jax.block_until_ready(fn())  # compile + warm
    best = float("inf")
    for _ in range(n):
        t0 = time.perf_counter()
        jax.block_until_ready(fn())
        best = min(best, time.perf_counter() - t0)
    return best


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--quick", action="store_true")
    ap.add_argument("--threshold", type=float, default=0.0,
                    help="convergence threshold (0 = fixed sweeps, the "
                    "apples-to-apples compute comparison)")
    ap.add_argument("--sweeps", type=int, default=50)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    jax.config.update(
        "jax_compilation_cache_dir", os.path.join(_REPO, ".jax_cache")
    )
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)

    from pylda_tpu.ops.dirichlet import exp_dirichlet_expectation
    from pylda_tpu.ops.estep import estep_ragged_gamma
    from pylda_tpu.ops.pallas_ragged import (
        pallas_estep_ragged_gamma,
        plan_pallas_ragged,
    )

    print(f"device: {jax.devices()[0]}", file=sys.stderr)
    rng = np.random.default_rng(0)
    K, V = 100, 10_000
    shapes = [(4096, 48)] if args.quick else [
        (4096, 32), (4096, 48), (4096, 64), (1024, 128), (256, 512),
    ]
    lam = jnp.asarray(rng.gamma(100.0, 0.01, (K, V)), jnp.float32)
    eeb = exp_dirichlet_expectation(lam)
    alpha = jnp.full((K,), 1.0 / K, jnp.float32)

    rows = []
    for D, T in shapes:
        ids = jnp.asarray(rng.integers(0, V, (D, T)), jnp.int32)
        cnts = jnp.asarray(rng.integers(1, 4, (D, T)), jnp.float32)
        g0 = jnp.asarray(rng.gamma(100.0, 0.01, (D, K)), jnp.float32)
        kw = dict(
            inner_iterations=args.sweeps,
            convergence_threshold=args.threshold,
        )
        t_x = best_of(lambda: estep_ragged_gamma(
            ids, cnts, g0, eeb, alpha, **kw)[0])
        for sdt in ("float32", "bfloat16"):
            plan = plan_pallas_ragged(D, T, K, sdt)
            if plan is None:
                continue
            t_p = best_of(lambda: pallas_estep_ragged_gamma(
                ids, cnts, g0, eeb, alpha, tile_d=plan[0],
                storage_dtype=plan[1], **kw)[0])
            rows.append({
                "D": D, "T": T, "storage": plan[1], "tile_d": plan[0],
                "xla_ms": round(t_x * 1e3, 3),
                "pallas_ms": round(t_p * 1e3, 3),
                "speedup": round(t_x / t_p, 3),
            })
            print(json.dumps(rows[-1]), flush=True)

    # End-to-end: flagship engine pass, hybrid path, XLA vs Pallas.
    from pylda_tpu.corpus.synthetic import synthetic_corpus
    from pylda_tpu.models import VariationalBayes
    from pylda_tpu.utils.config import LDAConfig

    corpus, _, _ = synthetic_corpus(
        num_docs=4096, num_topics=K, num_types=V,
        mean_doc_length=120.0, seed=0,
    )
    for pallas in ("never", "always"):
        cfg = LDAConfig(
            number_of_topics=K, inference_mode="vb",
            inner_iterations=50, convergence_threshold=1e-5, seed=0,
            use_pallas=pallas,
        )
        eng = VariationalBayes(cfg)
        eng.initialize(corpus)
        eng.learning_many(16)  # compile + converge toward steady state
        t0 = time.time()
        eng.learning_many(16)
        dt = (time.time() - t0) / 16
        print(json.dumps({
            "e2e_use_pallas": pallas,
            "ms_per_pass": round(dt * 1e3, 2),
            "docs_per_sec": round(4096 / dt, 0),
        }), flush=True)


if __name__ == "__main__":
    main()
