#!/usr/bin/env python
"""Gibbs step micro-variants A/B (flagship config-3 shape, B=8 blocks).

The blocked sweep is gather+matmul-bound (scripts/gibbs_block_ab.py).
This measures the two remaining independent levers via the module knobs
in ops/sampling.py:

  - CDF_PRECISION: the [B*D, K] x [K, K] prefix-sum matmul at HIGHEST
    (6-pass f32 emulation) vs HIGH (3-pass) vs DEFAULT;
  - TW_DTYPE: the per-position [B, D, K] factor gather at f32 vs bf16
    (halved gather traffic; values re-promote to f32 in the product).

Each variant also reports the 30-sweep joint LL (band agreement) and a
40-sweep held-out perplexity so a default flip carries quality numbers.

Usage: gibbs_step_opts.py [K] [V] [D]

MEASURED (v5e, K=100 V=10k D=4096, B=8 blocks, 30-sweep chained scan,
2026-08-19):

  variant              ms/sweep   LL@30      held-out ppl @40
  HIGHEST, f32 tw      7.501      -5550757   9279.9
  HIGH                 7.156      -5548896   9306.8
  DEFAULT              7.005      -5550351   9296.3
  HIGHEST + bf16 tw    7.476      -5548332   9313.1
  HIGH + bf16 tw       7.211      -5548296   9311.1

Decision: CDF_PRECISION = HIGH (4.8% with ~f32 fidelity; DEFAULT's
extra 2% costs bf16 rounding of every CDF product — a systematic
conditional distortion, not ulp noise).  TW_DTYPE stays None.
(An earlier run of this script measured five IDENTICAL rows — the
fn._clear_cache() invalidation does not work on partial-jitted
functions in this jax version; jax.clear_caches() does.)
"""

import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)

from pylda_tpu.corpus.synthetic import synthetic_corpus
from pylda_tpu.models import MonteCarlo
from pylda_tpu.ops import sampling
from pylda_tpu.utils.config import LDAConfig

K = int(sys.argv[1]) if len(sys.argv) > 1 else 100
V = int(sys.argv[2]) if len(sys.argv) > 2 else 10_000
D = int(sys.argv[3]) if len(sys.argv) > 3 else 4096
corpus, _, _ = synthetic_corpus(
    num_docs=D, num_topics=min(K, 100), num_types=V,
    mean_doc_length=120.0, seed=0,
)
heldout, _, _ = synthetic_corpus(
    num_docs=512, num_topics=min(K, 100), num_types=V,
    mean_doc_length=120.0, seed=1,
)


def time_scan(fn, n=30, reps=3):
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


VARIANTS = [
    ("baseline (HIGHEST, f32 tw)", jax.lax.Precision.HIGHEST, None),
    ("HIGH", jax.lax.Precision.HIGH, None),
    ("DEFAULT", jax.lax.Precision.DEFAULT, None),
    ("HIGHEST + bf16 tw", jax.lax.Precision.HIGHEST, jnp.bfloat16),
    ("HIGH + bf16 tw", jax.lax.Precision.HIGH, jnp.bfloat16),
]

for label, prec, twd in VARIANTS:
    sampling.CDF_PRECISION = prec
    sampling.TW_DTYPE = twd
    # NOTE: fn._clear_cache() on the partial-jitted function does NOT
    # invalidate its trace cache in this jax version (verified: the
    # unjitted __wrapped__ sees the knob, the jitted path kept serving
    # the old trace) — clear everything.
    jax.clear_caches()

    cfg = LDAConfig(number_of_topics=K, inference_mode="gibbs", seed=0)
    eng = MonteCarlo(cfg)
    eng.initialize(corpus)
    st = eng.state
    buckets = eng._buckets

    def full_sweep(c, i, eng=eng, st=st, buckets=buckets):
        n_kv, _zs, _ndks, ll = eng._sweep(
            st.alpha + c * 1e-20, st.eta, jax.random.fold_in(st.key, i),
            eng._n_kv, tuple(eng._z), buckets,
        )
        return ll + n_kv.sum()

    ms = time_scan(full_sweep)
    lls = eng.learning_many(30)
    eng.learning_many(10)
    pp = eng.perplexity(heldout)
    print(f"[{label}] sweep {ms:.3f} ms | LL@30 {lls[-1]:.0f} | "
          f"heldout@40 {pp:.1f}", flush=True)

sampling.CDF_PRECISION = jax.lax.Precision.HIGHEST
sampling.TW_DTYPE = None
jax.clear_caches()
