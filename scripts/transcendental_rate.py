#!/usr/bin/env python
"""Calibrate achievable VPU transcendental element rates on this chip.

The honest roofline (round-4 verdict item 3) needs bounds for the
lgamma-heavy phases (Griffiths–Steyvers joint likelihood, beta_elbo) and
the log/exp glue.  A generic "1 elem/cycle/lane" guess is ~50x off for
lgamma (a ~40-term rational+log composite), so the bound uses rates
MEASURED here: a lax.scan chains n dependent reductions over a [K, V]
block (the tunnel's dispatch tax makes per-call timing garbage), and the
rate is elems * n / wall.  ChipPeaks.lgamma_per_sec / log_per_sec carry
the rounded-UP results (a too-high rate makes the bound looser, never
mfu-flattering).

Usage: python scripts/transcendental_rate.py [--k 1000 --v 100000 --n 32]
"""

import argparse
import json
import os
import sys
import time

import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def rate(fn, x, n, repeats=3):
    import functools

    @functools.partial(jax.jit, static_argnames=("n",))
    def run(x, n):
        def body(acc, i):
            # data dependence via the accumulated scalar: no CSE/hoist
            return acc + fn(x + acc * 1e-20).sum(), None

        acc, _ = jax.lax.scan(body, jnp.float32(0.0), jnp.arange(n))
        return acc

    # float() host-fetches the scalar: on the tunneled backend
    # .block_until_ready() returns IMMEDIATELY (measured: a 3.2e9-lgamma
    # scan "finished" in 57 us), so only a value fetch gives honest wall
    # time.  Verify n-scaling before trusting any rate from this script.
    float(run(x, n))
    best = float("inf")
    for _ in range(repeats):
        t0 = time.time()
        float(run(x, n))
        best = min(best, time.time() - t0)
    return x.size * n / best


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--k", type=int, default=1000)
    ap.add_argument("--v", type=int, default=100_000)
    ap.add_argument("--n", type=int, default=32)
    args = ap.parse_args()
    x = jnp.asarray(
        jax.random.uniform(
            jax.random.PRNGKey(0), (args.k, args.v), minval=0.5, maxval=500.0
        )
    )
    out = {}
    for name, fn in (
        ("lgamma", jax.scipy.special.gammaln),
        ("log", jnp.log),
        ("exp", jnp.exp),
        ("digamma", jax.scipy.special.digamma),
    ):
        r = rate(fn, x, args.n)
        out[name + "_per_sec"] = float(f"{r:.3g}")
        print(json.dumps({name: out[name + "_per_sec"]}), flush=True)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
