#!/usr/bin/env python
"""Measure the fused ragged Pallas gamma kernel vs the XLA ragged path
on the real chip, with SCAN-FUSED timing.

Per-call wall timing through the tunneled TPU is unusable: dispatch
costs ~30 ms and varies by 10x between repeats (the round-1 "fuse
before trusting any measurement" rule).  Every row here therefore runs
the op N times inside ONE ``lax.scan`` dispatch with the output gamma
feeding the next iteration's init (data dependence defeats CSE/DCE),
and reports total/N.

Rows:
  gather_only — B = eeb.T[ids] + reduction (the per-pass floor both
                paths share)
  xla         — ops/estep.estep_ragged_gamma
  pallas/*    — ops/pallas_ragged kernel at each viable (tile, storage)
  e2e/*       — full engine pass (hybrid dense-sstats), use_pallas
                never vs always

Run:  python scripts/bench_pallas_ragged.py [--quick] [--sweeps N]
"""

import argparse
import json
import os
import sys
import time

import numpy as np

_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, _REPO)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--quick", action="store_true")
    ap.add_argument("--sweeps", type=int, default=50)
    ap.add_argument("--scan_n", type=int, default=20)
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
        _vmem_need,
    )
    from pylda_tpu.utils import round_up

    print(f"device: {jax.devices()[0]}", file=sys.stderr)
    N = args.scan_n

    def time_scan(step, g0, reps=3):
        """step(gamma_init) -> gamma; N data-chained runs per dispatch."""

        @jax.jit
        def run(g):
            return jax.lax.scan(
                lambda c, _: (step(c), None), g, None, length=N
            )[0]

        jax.block_until_ready(run(g0))  # compile + warm
        best = float("inf")
        for _ in range(reps):
            t0 = time.perf_counter()
            jax.block_until_ready(run(g0))
            best = min(best, time.perf_counter() - t0)
        return best / N

    rng = np.random.default_rng(0)
    K, V = 100, 10_000
    # (3328, 128) and (704, 256) are the flagship corpus's actual
    # bucket shapes (synthetic 20-News-shaped, mean length 120).
    shapes = [(3328, 128)] if args.quick else [
        (3328, 128), (704, 256), (4096, 48), (256, 512),
    ]
    lam = jnp.asarray(rng.gamma(100.0, 0.01, (K, V)), jnp.float32)
    eeb = exp_dirichlet_expectation(lam)
    alpha = jnp.full((K,), 1.0 / K, jnp.float32)

    for D, T in shapes:
        ids = jnp.asarray(rng.integers(0, V, (D, T)), jnp.int32)
        cnts = jnp.asarray(rng.integers(1, 4, (D, T)), jnp.float32)
        g0 = jnp.asarray(rng.gamma(100.0, 0.01, (D, K)), jnp.float32)
        kw = dict(
            inner_iterations=args.sweeps, convergence_threshold=0.0
        )

        # Per-pass floor: the B gather both paths pay, chained via a
        # gamma-shaped reduction so the scan stays data-dependent.
        def gather_step(g):
            B = eeb.T[ids]
            return g + 0.0 * B.sum(axis=1)

        t_gather = time_scan(gather_step, g0)

        def xla_step(g):
            return estep_ragged_gamma(ids, cnts, g, eeb, alpha, **kw)[0]

        t_x = time_scan(xla_step, g0)
        row = {
            "D": D, "T": T, "sweeps": args.sweeps,
            "gather_ms": round(t_gather * 1e3, 3),
            "xla_ms": round(t_x * 1e3, 3),
        }
        print(json.dumps(row), flush=True)

        from pylda_tpu.ops.pallas_ragged import _RAGGED_VMEM_BUDGET

        Kp = round_up(K, 128)
        seen = set()
        for sdt in ("float32", "bfloat16"):
            itemsize = 2 if sdt == "bfloat16" else 4
            Tp = round_up(T, 16 if sdt == "bfloat16" else 8)
            for tile_d in (256, 128, 64, 32):
                if tile_d > D:
                    continue
                for tile_t in (Tp, 64, 32, 16):
                    if tile_t > Tp or Tp % tile_t:
                        continue
                    if _vmem_need(tile_d, Tp, Kp, itemsize, tile_t) \
                            >= _RAGGED_VMEM_BUDGET:
                        continue
                    key = (sdt, tile_d, tile_t)
                    if key in seen:
                        continue
                    seen.add(key)

                    def pal_step(g, tile_d=tile_d, tile_t=tile_t, sdt=sdt):
                        return pallas_estep_ragged_gamma(
                            ids, cnts, g, eeb, alpha, tile_d=tile_d,
                            tile_t=tile_t, storage_dtype=sdt, **kw)[0]

                    t_p = time_scan(pal_step, g0)
                    print(json.dumps({
                        "D": D, "T": T, "storage": sdt, "tile_d": tile_d,
                        "tile_t": tile_t,
                        "pallas_ms": round(t_p * 1e3, 3),
                        "speedup_vs_xla": round(t_x / t_p, 3),
                    }), flush=True)
                    break  # largest fitting tile_t per (sdt, tile_d)

    # End-to-end: flagship engine pass, hybrid path, XLA vs Pallas —
    # learning_many IS the fused measurement (one dispatch for 16
    # passes).
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
        best = float("inf")
        for _ in range(2):
            t0 = time.time()
            eng.learning_many(16)
            best = min(best, time.time() - t0)
        dt = best / 16
        print(json.dumps({
            "e2e_use_pallas": pallas,
            "ms_per_pass": round(dt * 1e3, 2),
            "docs_per_sec": round(4096 / dt, 0),
        }), flush=True)


if __name__ == "__main__":
    main()
