#!/usr/bin/env python
"""Compare sstats (A-matrix) formulations on the real chip, scan-fused:

 a. row segment_sum of U [DT, K] by token id  (current)
 b. dense-R: flat scalar segment_sum of ratio into [D*V], reshape, then
    A = eTheta^T @ R on the MXU
 c. sorted-token layout: corpus-static permutation so ids are sorted;
    segment_sum(indices_are_sorted=True) of gathered U rows
"""

import time

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)

from pylda_tpu.corpus.synthetic import synthetic_corpus

K, V, D = 100, 10_000, 4096
corpus, _, _ = synthetic_corpus(
    num_docs=D, num_topics=K, num_types=V, mean_doc_length=120.0, seed=0
)
bucket = corpus.to_ragged_buckets(doc_pad_multiple=8)
ids = [jnp.asarray(b.ids) for b in bucket]
cnts = [jnp.asarray(b.cnts) for b in bucket]
rng = np.random.default_rng(0)
# stand-ins: eTheta per bucket, ratio = cnts (padded slots already 0)
ethetas = [
    jnp.asarray(rng.gamma(1.0, 1.0, (b.ids.shape[0], K)), jnp.float32)
    for b in bucket
]

# corpus-static sorted metadata for (c): one flat token list over buckets
flat_ids, flat_doc, flat_pos = [], [], []
row_base = 0
for b in bucket:
    Dl, T = b.ids.shape
    m = np.asarray(b.cnts) > 0
    r, t = np.nonzero(m)
    flat_ids.append(np.asarray(b.ids)[r, t])
    flat_doc.append(row_base + r)
    flat_pos.append((row_base * 0 + r) * 0)  # placeholder
    row_base += Dl
flat_ids = np.concatenate(flat_ids)
flat_doc = np.concatenate(flat_doc)
perm = np.argsort(flat_ids, kind="stable")
sort_ids = jnp.asarray(flat_ids[perm].astype(np.int32))
sort_doc = jnp.asarray(flat_doc[perm].astype(np.int32))
# per-token position within its bucket row — needed to fetch ratio; for
# the stand-in we use cnts directly indexed the same way:
print("tokens:", flat_ids.size)

N = 32


def scan_time(name, step):
    @jax.jit
    def run(x):
        def body(carry, i):
            out = step(carry, i)
            return carry + 1e-12 * out.sum(), ()
        c, _ = jax.lax.scan(body, x, jnp.arange(N))
        return c
    r = run(jnp.float32(0.0))
    jax.block_until_ready(r)
    best = float("inf")
    for _ in range(3):
        t0 = time.time()
        jax.block_until_ready(run(jnp.float32(0.0)))
        best = min(best, (time.time() - t0) / N)
    print(f"{name}: {best*1e3:.3f} ms")


def variant_a(carry, i):
    A = jnp.zeros((V, K), jnp.float32)
    for bi in range(len(ids)):
        Dl, T = ids[bi].shape
        et = ethetas[bi] + carry
        U = et[:, None, :] * cnts[bi][:, :, None]
        A = A + jax.ops.segment_sum(
            U.reshape(Dl * T, K), ids[bi].reshape(-1), num_segments=V
        )
    return A


def variant_b(carry, i):
    A = jnp.zeros((K, V), jnp.float32)
    for bi in range(len(ids)):
        Dl, T = ids[bi].shape
        et = ethetas[bi] + carry
        flat = (
            jax.lax.broadcasted_iota(jnp.int32, (Dl, T), 0) * V + ids[bi]
        ).reshape(-1)
        R = jax.ops.segment_sum(
            cnts[bi].reshape(-1), flat, num_segments=Dl * V
        ).reshape(Dl, V)
        A = A + jax.lax.dot_general(
            et, R, dimension_numbers=(((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
    return A


# (c): ratio stand-in = per-token count value in sorted order.  Gather the
# counts via (doc,pos)… the stand-in just uses ones; the cost we want is
# the eTheta row gather + sorted segsum.
all_eth = jnp.concatenate(ethetas, axis=0)
tok_val = jnp.ones((sort_ids.shape[0],), jnp.float32)


def variant_c(carry, i):
    U = (all_eth + carry)[sort_doc] * tok_val[:, None]
    return jax.ops.segment_sum(
        U, sort_ids, num_segments=V, indices_are_sorted=True
    )


# scan_time("a_row_segsum", variant_a)
# scan_time("b_denseR_matmul", variant_b)
# scan_time("c_sorted_segsum", variant_c)

# numeric cross-check (single call, f64-free)
# Aa = variant_a(jnp.float32(0.0), 0)
# Ab = variant_b(jnp.float32(0.0), 0)
# print("a vs b max rel err:",
#      float(jnp.abs(Aa.T - Ab).max() / jnp.abs(Aa).max()))


# (i) scatter-free dense sstats: A = eTheta^T @ (counts_dense / phinorm)
dense = corpus.to_dense()
counts_dense = jnp.asarray(dense.counts)  # [Dd, V] f32, row per doc
counts_bf16 = counts_dense.astype(jnp.bfloat16)
Dd = counts_dense.shape[0]
eth_d = jnp.asarray(rng.gamma(1.0, 1.0, (Dd, K)), jnp.float32)
eeb_d = jnp.asarray(rng.gamma(1.0, 1.0, (K, V)), jnp.float32)

def variant_i(carry, i):
    et = eth_d + carry
    phin = jnp.dot(
        et.astype(jnp.bfloat16), eeb_d.astype(jnp.bfloat16),
        preferred_element_type=jnp.float32,
    ) + 1e-30
    ratio = counts_bf16.astype(jnp.float32) / phin
    A = jax.lax.dot_general(
        et.astype(jnp.bfloat16), ratio.astype(jnp.bfloat16),
        dimension_numbers=(((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    return A  # [K, V]

def variant_i_f32(carry, i):
    et = eth_d + carry
    phin = jnp.dot(et, eeb_d, preferred_element_type=jnp.float32) + 1e-30
    ratio = counts_dense / phin
    A = jax.lax.dot_general(
        et, ratio, dimension_numbers=(((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    return A

scan_time("i_dense_matmul_bf16", variant_i)
scan_time("i_dense_matmul_f32", variant_i_f32)
