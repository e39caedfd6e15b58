#!/usr/bin/env python
"""Microbench: XLA ragged E-step vs the tiled Pallas dense kernel at the
flagship shape (D=4096, K=100, V=10000).  Run on the real TPU."""

import time

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)

from pylda_tpu.corpus.synthetic import synthetic_corpus
from pylda_tpu.ops.dirichlet import exp_dirichlet_expectation
from pylda_tpu.ops.estep import estep_dense, estep_ragged
from pylda_tpu.ops.pallas_estep import pallas_estep_dense, plan_pallas_estep

K, V, D = 100, 10_000, 4096
corpus, _, _ = synthetic_corpus(
    num_docs=D, num_topics=K, num_types=V, mean_doc_length=120.0, seed=0
)

rng = np.random.default_rng(0)
lam = jnp.asarray(rng.gamma(100.0, 0.01, (K, V)), jnp.float32)
eeb = exp_dirichlet_expectation(lam)
alpha = jnp.full((K,), 1.0 / K, jnp.float32)

bucket = corpus.to_ragged_buckets(doc_pad_multiple=8)
print("ragged buckets:", [(b.ids.shape) for b in bucket])
dense = corpus.to_dense()
print("dense counts:", dense.counts.shape)

g0_dense = jnp.ones((dense.counts.shape[0], K), jnp.float32)


def timeit(name, fn, n=20):
    r = fn()
    jax.block_until_ready(r)
    best = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        for _ in range(n):
            r = fn()
        jax.block_until_ready(r)
        best = min(best, (time.perf_counter() - t0) / n)
    print(f"{name}: {best*1e3:.3f} ms")
    return r, best


# --- XLA ragged (current default path) ---
def run_ragged():
    outs = []
    for b in bucket:
        g0 = jnp.ones((b.ids.shape[0], K), jnp.float32)
        outs.append(
            estep_ragged(
                jnp.asarray(b.ids), jnp.asarray(b.cnts), g0, eeb, alpha,
                num_types=V, inner_iterations=50,
                convergence_threshold=1e-5,
            )
        )
    return outs

r_rag, t_rag = timeit("xla_ragged", run_ragged)
score_rag = sum(float(o[2]) for o in r_rag)
sweeps = [int(o[3]) for o in r_rag]
print("  score:", score_rag, "sweeps:", sweeps)

# --- XLA dense ---
counts_f32 = jnp.asarray(dense.counts)
def run_xla_dense():
    return estep_dense(
        counts_f32, g0_dense, eeb, alpha, inner_iterations=50,
        convergence_threshold=1e-5,
    )

r_xd, t_xd = timeit("xla_dense", run_xla_dense)
print("  score:", float(r_xd[2]), "sweeps:", int(r_xd[3]))

# --- Pallas plans ---
print("auto plan:", plan_pallas_estep(D, K, V))
for tile_d, sdt in [(32, "float32"), (64, "bfloat16"), (128, "bfloat16")]:
    name = f"pallas_tile{tile_d}_{sdt}"
    try:
        def run_pallas(tile_d=tile_d, sdt=sdt):
            return pallas_estep_dense(
                counts_f32, g0_dense, eeb, alpha, inner_iterations=50,
                convergence_threshold=1e-5, tile_d=tile_d,
                storage_dtype=sdt,
            )
        r_p, t_p = timeit(name, run_pallas)
        print(
            f"  score: {float(r_p[2])}  "
            f"vs ragged: {t_rag/t_p:.2f}x  vs dense: {t_xd/t_p:.2f}x"
        )
    except Exception as e:
        print(f"  {name} FAILED: {type(e).__name__}: {str(e)[:300]}")
