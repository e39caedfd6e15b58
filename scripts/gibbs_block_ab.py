#!/usr/bin/env python
"""On-chip A/B of multi-position block sampling (config-3 shape).

scripts/gibbs_decompose.py located the Gibbs sweep bound in the position
scan itself (~26 us/step at [4096, 100] per-step work — latency, not
flops), so the designed attack is FEWER, FATTER scan steps:
``sampler_block_positions=B`` samples B positions of every document per
step from one shared n_dk (leave-block-out; ops/sampling.py).  B=1 is
exact sequential within-doc Gibbs; B>1 is the within-document analog of
the per-sweep AD-LDA approximation.

Measures (input-perturbation scan chain; per-call wall timing through
the tunnel is garbage — CLAUDE.md):
  - full engine sweep ms at B in {1, 2, 4, 8, 16};
  - joint-LL trajectory at each B (same-band agreement required);
  - held-out perplexity after 40 sweeps at B=1 vs the winning B.

Usage: gibbs_block_ab.py [K] [V] [D] [comma-separated B list]

MEASURED (v5e, K=100 V=10k D=4096, cdf sampler, 30-sweep chained scan,
2026-08-19):

  B    ms/sweep        joint LL @30   held-out ppl @40 sweeps
  1    9.05 (1.00x)    -5551626       9325.5
  2    8.39 (1.08x)    -5553512       9346.6
  4    7.87 (1.15x)    -5552270       9335.7
  8    7.44 (1.22x)    -5550757       9285.0
  16   7.55 (1.20x)    -5549700       9349.7

The step is gather+matmul-bound, not latency-bound (B=2 costs ~1.9x a
B=1 step), so the win saturates at ~1.2x — real but far below the
latency-model prediction.  Joint-LL trajectories and held-out
perplexity are within the B=1 noise band at every B (B=8 is nominally
BEST on held-out).  Combined with the cdf-vs-gumbel sampler win
(scripts/sampler_ab.py: 10.87 -> 9.05 ms), shipping defaults move the
config-3 sweep 10.87 -> 7.44 ms = 1.46x over the round-2 suite row.

Decision: default sampler_block_positions=8.
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


BLOCKS = tuple(
    int(b) for b in (sys.argv[4].split(",") if len(sys.argv) > 4 else
                     ("1", "2", "4", "8", "16"))
)
results = {}
for bsz in BLOCKS:
    cfg = LDAConfig(
        number_of_topics=K, inference_mode="gibbs", seed=0,
        sampler_block_positions=bsz,
    )
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
    results[bsz] = ms
    rel = f" ({results[1] / ms:.2f}x)" if 1 in results else ""
    print(f"full sweep [B={bsz}]: {ms:.3f} ms{rel}", flush=True)

# Joint-LL trajectory band check (30 sweeps each).
for bsz in BLOCKS:
    cfg = LDAConfig(
        number_of_topics=K, inference_mode="gibbs", seed=0,
        sampler_block_positions=bsz,
    )
    eng = MonteCarlo(cfg)
    eng.initialize(corpus)
    lls = eng.learning_many(30)
    print(f"joint LL [B={bsz}]: first {lls[0]:.0f} last {lls[-1]:.0f}",
          flush=True)

# Held-out quality at matched sweep count.
for bsz in BLOCKS:
    cfg = LDAConfig(
        number_of_topics=K, inference_mode="gibbs", seed=0,
        sampler_block_positions=bsz,
    )
    eng = MonteCarlo(cfg)
    eng.initialize(corpus)
    eng.learning_many(40)
    pp = eng.perplexity(heldout)
    print(f"held-out perplexity [B={bsz}, 40 sweeps]: {pp:.1f}", flush=True)
