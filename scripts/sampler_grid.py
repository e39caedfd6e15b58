#!/usr/bin/env python
"""(K x B x V) grid A/B calibrating the topic_sampler="auto" rule.

Round-3 verdict item 6: the old K<=384 cdf/gumbel switch was a constant
fit to one shape (D=4096/2048, V=10k).  The two cost models
(utils/roofline.py): the cdf prefix sum is a [D,K]x[K,K] matmul per
position — 2*K^2 MXU flops/slot — while gumbel draws K uniforms + logs
per slot on the VPU, with the per-draw fixed overhead amortised over
the B positions of a block.  Equating them:

    K*(B) = c_rng(B) * MXU_rate / (2 * VPU_rate),   c_rng(B) = c1 + c2/B

— the crossover is INDEPENDENT of D, L, and V (both sides scale with
slot count; the vocabulary never enters either sampler's inner cost),
and moves only with B through the RNG amortisation.  This grid measures
the crossover bracket at two V's and both block sizes to calibrate
(c1, c2) and validate the V-independence claim.

Usage: python scripts/sampler_grid.py [--fast]
"""

import argparse
import json
import time

import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)

from pylda_tpu.corpus.synthetic import synthetic_corpus
from pylda_tpu.models import MonteCarlo
from pylda_tpu.utils.config import LDAConfig


def time_scan(fn, n=20, reps=3):
    @jax.jit
    def chained(c0):
        def body(c, i):
            return c + 1e-12 * fn(c, i), ()
        out, _ = jax.lax.scan(body, c0, jnp.arange(n))
        return out

    jax.block_until_ready(chained(jnp.float32(0.0)))
    best = float("inf")
    for _ in range(reps):
        t0 = time.time()
        jax.block_until_ready(chained(jnp.float32(0.0)))
        best = min(best, (time.time() - t0) / n)
    return best * 1e3


def sweep_ms(corpus, K, B, sampler):
    cfg = LDAConfig(
        number_of_topics=K, inference_mode="gibbs", seed=0,
        topic_sampler=sampler, sampler_block_positions=B,
    )
    eng = MonteCarlo(cfg)
    eng.initialize(corpus)
    st = eng.state
    buckets = eng._buckets

    def full_sweep(c, i):
        n_kv, _zs, _ndks, ll = eng._sweep(
            st.alpha + c * 1e-20, st.eta, jax.random.fold_in(st.key, i),
            eng._n_kv, tuple(eng._z), buckets,
        )
        return ll + n_kv.sum()

    return time_scan(full_sweep)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--fast", action="store_true",
                    help="half the grid (one V)")
    args = ap.parse_args()
    Ks = (384, 448, 512)
    Bs = (1, 8)
    Vs = (10_000,) if args.fast else (10_000, 50_000)
    D = 2048
    corpora = {
        V: synthetic_corpus(
            num_docs=D, num_topics=100, num_types=V,
            mean_doc_length=120.0, seed=0,
        )[0]
        for V in Vs
    }
    rows = []
    for V in Vs:
        for B in Bs:
            for K in Ks:
                cell = {"K": K, "B": B, "V": V}
                for sampler in ("gumbel", "cdf"):
                    cell[sampler] = round(
                        sweep_ms(corpora[V], K, B, sampler), 3
                    )
                cell["cdf_speedup"] = round(cell["gumbel"] / cell["cdf"], 3)
                rows.append(cell)
                print(json.dumps(cell), flush=True)
    # Crossover per (V, B): linear interpolation of cdf_speedup == 1.
    for V in Vs:
        for B in Bs:
            sub = [r for r in rows if r["V"] == V and r["B"] == B]
            sub.sort(key=lambda r: r["K"])
            kstar = None
            for lo, hi in zip(sub, sub[1:]):
                a, b = lo["cdf_speedup"], hi["cdf_speedup"]
                if (a - 1.0) * (b - 1.0) <= 0 and a != b:
                    kstar = lo["K"] + (a - 1.0) / (a - b) * (
                        hi["K"] - lo["K"]
                    )
                    break
            print(json.dumps(
                {"V": V, "B": B, "crossover_K": None if kstar is None
                 else round(kstar)}
            ), flush=True)


if __name__ == "__main__":
    main()
