#!/usr/bin/env python
"""Pin down the 10.4 ms fixed per-pass cost: scan-timed variants of the
E-step internals (gamma init, gather+sweeps, sstats segsum, elbo terms)."""

import time
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)

from pylda_tpu.corpus.synthetic import synthetic_corpus
from pylda_tpu.ops.dirichlet import (
    beta_elbo, dirichlet_expectation, exp_dirichlet_expectation, theta_elbo,
)

K, V, D = 100, 10_000, 4096
corpus, _, _ = synthetic_corpus(
    num_docs=D, num_topics=K, num_types=V, mean_doc_length=120.0, seed=0
)
bucket = corpus.to_ragged_buckets(doc_pad_multiple=8)
ids = [jnp.asarray(b.ids) for b in bucket]
cnts = [jnp.asarray(b.cnts) for b in bucket]
masks = [jnp.asarray(b.mask) for b in bucket]
rng = np.random.default_rng(0)
lam0 = jnp.asarray(rng.gamma(100.0, 0.01, (K, V)), jnp.float32)
alpha = jnp.full((K,), 1.0 / K, jnp.float32)
eps = 1e-30

N = 32


def scan_time(name, step):
    """step(lam, key) -> lam-like carry contribution; scanned N times in
    one dispatch."""
    @jax.jit
    def run(lam):
        def body(carry, i):
            lam = carry
            out = step(lam, jax.random.fold_in(jax.random.PRNGKey(0), i))
            lam = lam + 1e-12 * out  # data-dep: no CSE across iterations
            return lam, ()
        lam, _ = jax.lax.scan(body, lam, jnp.arange(N))
        return lam
    r = run(lam0)
    jax.block_until_ready(r)
    best = float("inf")
    for _ in range(3):
        t0 = time.time()
        jax.block_until_ready(run(lam0))
        best = min(best, (time.time() - t0) / N)
    print(f"{name}: {best*1e3:.3f} ms")


def for_buckets(fn):
    def step(lam, key):
        acc = jnp.zeros_like(lam)
        for i in range(len(ids)):
            acc = acc + fn(lam, key, ids[i], cnts[i], masks[i])
        return acc
    return step


# 1. gamma random init only
def g_init(lam, key, b_ids, b_cnts, b_mask):
    g = jax.random.gamma(key, 100.0, (b_ids.shape[0], K), jnp.float32) * 0.01
    return jnp.zeros_like(lam) + g.sum() * 0.0 + 1e-30 * g[0, 0]
scan_time("gamma_random_init", for_buckets(g_init))

# 2. one sweep (gather-einsum pair), no sstats
def one_sweep(lam, key, b_ids, b_cnts, b_mask):
    eeb = exp_dirichlet_expectation(lam)
    B = eeb.T[b_ids]
    g = jnp.ones((b_ids.shape[0], K), jnp.float32)
    et = jnp.exp(dirichlet_expectation(g))
    ph = jnp.einsum("dk,dtk->dt", et, B) + eps
    gn = alpha[None, :] + et * jnp.einsum("dt,dtk->dk", b_cnts / ph, B)
    return jnp.zeros_like(lam) + gn.sum() * 1e-30
scan_time("gather_plus_1sweep", for_buckets(one_sweep))

# 3. sstats segsum only (U prebuilt shapes; includes U formation)
def sstats_only(lam, key, b_ids, b_cnts, b_mask):
    Dl, T = b_ids.shape
    et = jnp.ones((Dl, K), jnp.float32)
    ratio = b_cnts
    U = et[:, None, :] * ratio[:, :, None]
    A = jax.ops.segment_sum(
        U.reshape(Dl * T, K), b_ids.reshape(-1), num_segments=V
    )
    return exp_dirichlet_expectation(lam) * A.T
scan_time("sstats_U_segsum", for_buckets(sstats_only))

# 4. elbo terms + mstep glue
def glue(lam, key, b_ids, b_cnts, b_mask):
    g = jnp.ones((b_ids.shape[0], K), jnp.float32)
    th = theta_elbo(g, alpha, b_mask)
    el = (dirichlet_expectation(g) * b_mask[:, None]).sum(axis=0)
    be = beta_elbo(lam, jnp.full((V,), 0.01, jnp.float32))
    return jnp.zeros_like(lam) + (th + be) * 1e-30 + el[None, :1] * 0.0
scan_time("elbo_glue", for_buckets(glue))

# 5. exp_dirichlet_expectation(lam) alone (digamma over [K,V] x2/pass)
def eeb_only(lam, key, b_ids, b_cnts, b_mask):
    return exp_dirichlet_expectation(lam)
scan_time("eeb_digamma", for_buckets(eeb_only))
