#!/usr/bin/env python
"""On-chip A/B of the position-scan categorical sampler (flagship shape).

scripts/gibbs_decompose.py showed the Gibbs sweep is position-scan-bound
(full sweep 10.9 ms vs 11.2 ms for the scan with a V=8 rebuild stand-in;
every rebuild variant is overlapped to ~free in-engine).  The per-position
cost under the gumbel formulation is one [D, K] threefry draw plus two
transcendental passes (log(ndk+alpha), log(-log u)).  The inverse-CDF
sampler (ops/sampling.sample_doc_topics sampler="cdf") replaces that with
(ndk+alpha)*phi[:,w] -> cumsum -> compare, and pregenerates ONE [L, D]
uniform tensor per sweep.

Measures in-engine full-sweep time (input-perturbation scan chain — per-
call wall timing through the tunnel is garbage, CLAUDE.md) for all three
samplers, plus a joint-likelihood trajectory cross-check (different
random streams, same distribution: trajectories must land in the same
band).

MEASURED (v5e, V=10k, 30-sweep chained scan, best of 3; 2026-08-19):

  K     D     gumbel      cdf            race
  100   4096  10.87 ms    9.05 (1.20x)   10.94 (0.99x)
  300   4096  28.37 ms    25.04 (1.13x)  25.36 (1.12x)
  512   4096  30.93 ms    31.30 (0.99x)  29.61 (1.04x)
  1000  2048  30.18 ms    40.76 (0.74x)  28.06 (1.08x)

The cdf prefix sum is a [D,K]x[K,K] matmul per position (O(K^2)), so it
inverts between K=300 and K=512 — topic_sampler="auto" resolves to cdf
at K <= 384 (utils/config.resolved_topic_sampler).  A later
re-measurement at the shipping B=8 position blocks moved the
above-crossover pick to GUMBEL: blocks amortise its per-position
threefry draw (K=1000, B=8: gumbel 25.9 ms, race 26.2, cdf 29.0).
Joint-LL trajectories agreed in-band at every K (e.g. K=100 final LL
-5551904 / -5551626 / -5550349 for gumbel/cdf/race).
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

# Usage: sampler_ab.py [K] [V] [D]
K = int(sys.argv[1]) if len(sys.argv) > 1 else 100
V = int(sys.argv[2]) if len(sys.argv) > 2 else 10_000
D = int(sys.argv[3]) if len(sys.argv) > 3 else 4096
corpus, _, _ = synthetic_corpus(
    num_docs=D, num_topics=min(K, 100), num_types=V,
    mean_doc_length=120.0, seed=0,
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


results = {}
for sampler in ("gumbel", "cdf", "race"):
    cfg = LDAConfig(
        number_of_topics=K, inference_mode="gibbs", seed=0,
        topic_sampler=sampler,
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
    results[sampler] = ms
    print(f"full sweep [{sampler}]: {ms:.3f} ms", flush=True)

for s in ("cdf", "race"):
    print(f"speedup [{s}]: {results['gumbel'] / results[s]:.2f}x", flush=True)

# Joint-LL trajectory cross-check: 30 sweeps each, compare the final
# likelihood (different chains; band agreement expected).
for sampler in ("gumbel", "cdf", "race"):
    cfg = LDAConfig(
        number_of_topics=K, inference_mode="gibbs", seed=0,
        topic_sampler=sampler,
    )
    eng = MonteCarlo(cfg)
    eng.initialize(corpus)
    lls = eng.learning_many(30)
    print(
        f"joint LL [{sampler}]: first {lls[0]:.0f} last {lls[-1]:.0f}",
        flush=True,
    )
