#!/usr/bin/env python
"""On-chip decomposition of the Gibbs sweep cost (config-3 shape).

CLAUDE.md session-4 finding: the corpus-adaptive bucket geometry that
bought +25-30% for hybrid left Gibbs FLAT — hypothesis: the per-sweep
(n_kv, n_k) rebuild (one_hot [D*L, K] + unsorted segment_sum into V
rows, ops/sampling.assignment_counts) dominates, so slot occupancy
doesn't matter.  This script separates, with the input-perturbation scan
chain (per-call wall timing through the tunnel is garbage — CLAUDE.md
measurement discipline):

  a) full sweep            (position scan + rebuild + likelihood)
  b) position scan only    (sample_doc_topics with the [K, V] counts
                            accumulation sliced out via num_types=8 elided
                            rebuild — approximated by timing the same scan
                            with a [K, 8] rebuild)
  c) rebuild only          (assignment_counts on static z)
  d) rebuild variants      (combined-index scalar segsum; static
                            sort-by-word permutation + sorted segsum)

Decider for whether a rebuild rework is worth building into the engine.
"""

import time

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)

from pylda_tpu.corpus.synthetic import synthetic_corpus
from pylda_tpu.models import MonteCarlo
from pylda_tpu.utils.config import LDAConfig

K, V = 100, 10_000
corpus, _, _ = synthetic_corpus(
    num_docs=4096, num_topics=K, num_types=V, mean_doc_length=120.0, seed=0
)

cfg = LDAConfig(number_of_topics=K, inference_mode="gibbs", seed=0)
eng = MonteCarlo(cfg)
eng.initialize(corpus)
buckets = eng._buckets
print(
    "buckets:",
    [(tuple(b.tokens.shape)) for b in buckets],
    "tokens:", int(sum(np.asarray(b.token_mask).sum() for b in buckets)),
    flush=True,
)

st = eng.state


def time_scan(fn, n=30, reps=3):
    """fn(carry_scalar) -> new carry contribution; chained n times."""

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


# -- a) full engine sweep -----------------------------------------------------
def full_sweep(c, i):
    n_kv, _zs, _ndks, ll = eng._sweep(
        st.alpha + c * 1e-20, st.eta, jax.random.fold_in(st.key, i),
        eng._n_kv, tuple(eng._z), buckets,
    )
    return ll + n_kv.sum()


print(f"full sweep: {time_scan(full_sweep):.3f} ms", flush=True)

# -- c) rebuild only (current formulation) ------------------------------------
from pylda_tpu.ops.sampling import sample_doc_topics  # noqa: E402


def rebuild_onehot(c, i):
    tot = jnp.float32(0.0)
    for b, z in zip(buckets, eng._z):
        zz = z + (c * 0).astype(z.dtype)
        hot = jax.nn.one_hot(zz, K, dtype=jnp.float32) * jnp.asarray(
            b.token_mask
        )[:, :, None]
        n_kv = jax.ops.segment_sum(
            hot.reshape(-1, K), jnp.asarray(b.tokens).reshape(-1),
            num_segments=V,
        ).T
        tot = tot + n_kv.sum() + n_kv[0, 0]
    return tot


print(f"rebuild (one_hot+segsum): {time_scan(rebuild_onehot):.3f} ms",
      flush=True)


# -- d1) combined-index scalar segsum -----------------------------------------
def rebuild_combined(c, i):
    tot = jnp.float32(0.0)
    for b, z in zip(buckets, eng._z):
        zz = z + (c * 0).astype(z.dtype)
        idx = (jnp.asarray(b.tokens) * K + zz).reshape(-1)
        vals = jnp.asarray(b.token_mask).reshape(-1).astype(jnp.float32)
        flat = jax.ops.segment_sum(vals, idx, num_segments=K * V)
        n_kv = flat.reshape(V, K).T
        tot = tot + n_kv.sum() + n_kv[0, 0]
    return tot


print(f"rebuild (combined-index scalar segsum): "
      f"{time_scan(rebuild_combined):.3f} ms", flush=True)

# -- d2) static sort-by-word permutation + sorted segsum ----------------------
perms = []
sorted_words = []
for b in buckets:
    w = np.asarray(b.tokens).reshape(-1)
    p = np.argsort(w, kind="stable")
    perms.append(jnp.asarray(p))
    sorted_words.append(jnp.asarray(w[p]))


def rebuild_sorted(c, i):
    tot = jnp.float32(0.0)
    for b, z, p, ws in zip(buckets, eng._z, perms, sorted_words):
        zz = (z + (c * 0).astype(z.dtype)).reshape(-1)[p]
        m = jnp.asarray(b.token_mask).reshape(-1)[p]
        hot = jax.nn.one_hot(zz, K, dtype=jnp.float32) * m[:, None]
        n_kv = jax.ops.segment_sum(
            hot, ws, num_segments=V, indices_are_sorted=True
        ).T
        tot = tot + n_kv.sum() + n_kv[0, 0]
    return tot


print(f"rebuild (static perm + sorted segsum): "
      f"{time_scan(rebuild_sorted):.3f} ms", flush=True)


# -- b) position scan with tiny rebuild (V=8 stand-in) ------------------------
def scan_only(c, i):
    tot = jnp.float32(0.0)
    log_tw = jnp.zeros((K, V), jnp.float32)
    for j, (b, z) in enumerate(zip(buckets, eng._z)):
        g, counts, z_new, ndk = sample_doc_topics(
            b.tokens, b.token_mask, log_tw + c * 1e-20, st.alpha, z,
            jax.random.fold_in(st.key, i * 131 + j),
            num_topics=K, num_types=8,  # rebuild into 8 segments: ~free
            burn_in=0, num_samples=1,
        )
        tot = tot + ndk.sum() + counts[0, 0]
    return tot


print(f"position scan (V=8 rebuild stand-in): {time_scan(scan_only):.3f} ms",
      flush=True)

# parity of the variants
z0 = eng._z
ref = rebuild_onehot(jnp.float32(0.0), 0)
for name, fn in (("combined", rebuild_combined), ("sorted", rebuild_sorted)):
    alt = fn(jnp.float32(0.0), 0)
    print(f"parity {name}: rel {abs(float(ref - alt)) / abs(float(ref)):.2e}",
          flush=True)
