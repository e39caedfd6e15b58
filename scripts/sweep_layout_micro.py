#!/usr/bin/env python
"""Micro A/B of the ragged sweep contraction layouts (VERDICT item 7).

docs/performance.md asserts the phinorm einsum's 2x lane-reduction
asymmetry at the flagship shape (K=100) is one "XLA cannot avoid" —
but round 4 disproved a similar impossibility at K=50 by changing the
layout.  This measures the FULL sweep pair (phinorm + gamma update +
fast exp-psi, the real loop body) at the flagship bucket shape for
three per-slot factor layouts:

- dtk [D, T, K]: K on lanes; phinorm reduces over the LANE axis.
- kdt [K, D, T]: T on lanes; the K contraction is a major-axis sum.
- dkt [D, K, T]: T on lanes, K on sublanes; phinorm reduces over
  sublanes, the update over lanes (the asymmetry swaps phases).

Chained-scan timing with host fetch (wall/block_until_ready is garbage
through the tunnel).

Usage: python scripts/sweep_layout_micro.py [--d 3328 --t 128 --k 100]
"""

import argparse
import functools
import json
import os
import sys
import time

import numpy as np

import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pylda_tpu.ops.dirichlet import (  # noqa: E402
    exp_dirichlet_expectation_fast,
)

EINSUMS = {
    "dtk": ("dk,dtk->dt", "dt,dtk->dk", (0, 1, 2)),
    "kdt": ("dk,kdt->dt", "dt,kdt->dk", (2, 0, 1)),
    "dkt": ("dk,dkt->dt", "dt,dkt->dk", (0, 2, 1)),
}


def sweep_ms(layout, D, T, K, n=64, repeats=3, dtype=jnp.bfloat16):
    rng = np.random.default_rng(0)
    B0 = rng.gamma(1.0, 1.0, (D, T, K)).astype(np.float32)
    e_phi, e_upd, perm = EINSUMS[layout]
    B = jnp.asarray(np.transpose(B0, perm), dtype)
    cnts = jnp.asarray(rng.integers(1, 4, (D, T)).astype(np.float32))
    alpha = jnp.full((K,), 0.1, jnp.float32)
    g0 = jnp.asarray(rng.gamma(100.0, 0.01, (D, K)).astype(np.float32))

    @functools.partial(jax.jit, static_argnames=("n",))
    def run(g, n):
        def body(carry, i):
            gamma, et = carry
            phinorm = jnp.einsum(
                e_phi, et.astype(dtype), B,
                preferred_element_type=jnp.float32,
            ) + 1e-30
            gamma_new = alpha[None, :] + et * jnp.einsum(
                e_upd, (cnts / phinorm).astype(dtype), B,
                preferred_element_type=jnp.float32,
            )
            return (gamma_new, exp_dirichlet_expectation_fast(gamma_new)), None

        (gamma, _), _ = jax.lax.scan(
            body, (g, exp_dirichlet_expectation_fast(g)), jnp.arange(n)
        )
        return gamma.sum()

    float(run(g0, n))
    best = float("inf")
    for _ in range(repeats):
        t0 = time.time()
        float(run(g0, n))
        best = min(best, time.time() - t0)
    return best / n * 1e3


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--d", type=int, default=3328)
    ap.add_argument("--t", type=int, default=128)
    ap.add_argument("--k", type=int, default=100)
    ap.add_argument("--n", type=int, default=64)
    ap.add_argument("--layouts", default="dtk,kdt,dkt")
    args = ap.parse_args()
    slots = args.d * args.t
    vpu_bound_ms = 4 * slots * args.k / 7.7e12 * 1e3
    out = {"shape": [args.d, args.t, args.k],
           "vpu_bound_ms_per_sweep": round(vpu_bound_ms, 4)}
    for lay in args.layouts.split(","):
        ms = sweep_ms(lay, args.d, args.t, args.k, args.n)
        out[lay + "_ms_per_sweep"] = round(ms, 4)
        out[lay + "_x_bound"] = round(ms / vpu_bound_ms, 2)
        print(json.dumps({lay: out[lay + "_ms_per_sweep"]}), flush=True)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
