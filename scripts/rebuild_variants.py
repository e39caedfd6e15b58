#!/usr/bin/env python
"""On-chip microbench: n_kv rebuild variants (VERDICT round-4 item 2).

The Gibbs sweep's [K, V] count rebuild (one_hot(z) [S, K] + row
segment_sum into V bins) is ~63% of the sweep and flat for two rounds.
Variants measured here, all producing identical tables:

- ``rows``   (shipping): one_hot [S, K] + segment_sum over token ids.
- ``scalar``: combined bins sv = w*K + z, segment_sum of the scalar mask
  into a flat [V*K] table — no [S, K] one-hot materialisation, S scalar
  scatter-adds instead of S K-wide row scatter-adds.
- ``scalar_sorted``: same, over a STATIC argsort-by-token-id permutation
  of the slots (z gathered per call); bins are then grouped by word.
- ``matmul_tile``: scatter-free — slots statically sorted by token id
  and split into equal-size tiles; each tile's [S_t, K] one-hot is
  contracted against its [S_t, W_t] local word one-hot on the MXU.
  (Built only if the static tiling fits; this is the gather+matmul
  conversion of the scatter.)

Times via scan-chained calls with data dependence + host fetch (wall
timing through the tunnel is garbage; block_until_ready does NOT block).

Usage: python scripts/rebuild_variants.py [--docs 4096 --len 152 ...]
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


def make_data(D, L, K, V, seed=0):
    rng = np.random.default_rng(seed)
    # Zipf-ish token ids (the scatter pattern matters: real corpora hit
    # hot rows), full mask except a padded tail per doc.
    freq = 1.0 / np.arange(1, V + 1) ** 1.05
    freq /= freq.sum()
    tokens = rng.choice(V, size=(D, L), p=freq).astype(np.int32)
    mask = np.ones((D, L), np.float32)
    cut = rng.integers(L // 2, L, size=D)
    for d in range(D):
        mask[d, cut[d]:] = 0.0
        tokens[d, cut[d]:] = 0
    z = rng.integers(0, K, size=(D, L)).astype(np.int32)
    return jnp.asarray(tokens), jnp.asarray(mask), jnp.asarray(z)


def variant_rows(tokens, mask, K, V):
    def f(z):
        hot = jax.nn.one_hot(z, K, dtype=jnp.float32) * mask[:, :, None]
        return jax.ops.segment_sum(
            hot.reshape(-1, K), tokens.reshape(-1), num_segments=V
        ).T
    return f


def variant_scalar(tokens, mask, K, V):
    flat_w = tokens.reshape(-1)
    flat_m = mask.reshape(-1)

    def f(z):
        sv = flat_w * K + z.reshape(-1)
        return (
            jax.ops.segment_sum(flat_m, sv, num_segments=V * K)
            .reshape(V, K).T
        )
    return f


def variant_scalar_sorted(tokens, mask, K, V):
    flat_w = np.asarray(tokens).reshape(-1)
    perm = jnp.asarray(np.argsort(flat_w, kind="stable"))
    w_s = jnp.asarray(flat_w)[perm]
    m_s = mask.reshape(-1)[perm]

    def f(z):
        sv = w_s * K + z.reshape(-1)[perm]
        return (
            jax.ops.segment_sum(m_s, sv, num_segments=V * K)
            .reshape(V, K).T
        )
    return f


def variant_matmul_tile(tokens, mask, K, V, tile_slots=32768):
    """Static sort by token id; equal-slot tiles; per-tile one-hot
    matmul [K, S_t] x [S_t, W_t] -> columns of n_kv.  W_t (words per
    tile) varies; all tiles pad to the max word span so the contraction
    is one batched einsum."""
    flat_w = np.asarray(tokens).reshape(-1)
    flat_m = np.asarray(mask).reshape(-1)
    order = np.argsort(flat_w, kind="stable")
    S = flat_w.size
    n_tiles = -(-S // tile_slots)
    Sp = n_tiles * tile_slots
    pad = Sp - S
    w_sorted = np.concatenate([flat_w[order], np.full(pad, V - 1, np.int32)])
    m_sorted = np.concatenate([flat_m[order], np.zeros(pad, np.float32)])
    w_t = w_sorted.reshape(n_tiles, tile_slots)
    # word span per tile
    lo = w_t.min(axis=1)
    hi = w_t.max(axis=1)
    Wt = int((hi - lo + 1).max())
    Wt = -(-Wt // 128) * 128
    if Wt > 4096:
        return None, None  # a single hot word spans too many tiles? no —
        # a wide RARE-word tile; matmul flops would blow up.
    local = jnp.asarray(w_t - lo[:, None])  # [n_tiles, S_t] in [0, Wt)
    onehot_w = jax.nn.one_hot(local, Wt, dtype=jnp.bfloat16) * jnp.asarray(
        m_sorted.reshape(n_tiles, tile_slots)
    )[..., None].astype(jnp.bfloat16)
    ordj = jnp.asarray(order)
    lo_j = jnp.asarray(lo)

    def f(z):
        z_s = z.reshape(-1)[ordj]
        z_t = jnp.concatenate(
            [z_s, jnp.zeros(pad, jnp.int32)]
        ).reshape(n_tiles, tile_slots)
        hot_z = jax.nn.one_hot(z_t, K, dtype=jnp.bfloat16, axis=-1)
        # [n_tiles, K, Wt]
        per_tile = jnp.einsum(
            "tsk,tsw->tkw", hot_z, onehot_w,
            preferred_element_type=jnp.float32,
        )
        # scatter tiles' columns into [K, V]: tiny (n_tiles adds)
        out = jnp.zeros((K, V + Wt), jnp.float32)
        for t in range(per_tile.shape[0]):
            out = jax.lax.dynamic_update_slice(
                out,
                jax.lax.dynamic_slice(
                    out, (0, lo_j[t]), (K, Wt)
                ) + per_tile[t],
                (0, lo_j[t]),
            )
        return out[:, :V]
    meta = {"n_tiles": n_tiles, "Wt": Wt, "padded_slots": Sp}
    return f, meta


def time_fn(f, z, K, n=16, repeats=3):
    @functools.partial(jax.jit, static_argnames=("n",))
    def run(z, n):
        def body(acc, i):
            # genuinely different assignments per step (same cost
            # profile) — a loop-invariant call would be hoisted.
            t = f((z + i) % K)
            return acc + t.sum(), None
        acc, _ = jax.lax.scan(body, jnp.float32(0.0), jnp.arange(n))
        return acc

    float(run(z, n))
    best = float("inf")
    for _ in range(repeats):
        t0 = time.time()
        float(run(z, n))
        best = min(best, time.time() - t0)
    return best / n


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--docs", type=int, default=4096)
    ap.add_argument("--len", type=int, default=152, dest="length")
    ap.add_argument("--topics", type=int, default=100)
    ap.add_argument("--types", type=int, default=30_000)
    ap.add_argument("--n", type=int, default=16)
    ap.add_argument("--tile_slots", type=int, default=32768)
    args = ap.parse_args()
    K, V = args.topics, args.types
    tokens, mask, z = make_data(args.docs, args.length, K, V)
    ref = None
    out = {"slots": int(tokens.size)}
    fns = {
        "rows": variant_rows(tokens, mask, K, V),
        "scalar": variant_scalar(tokens, mask, K, V),
        "scalar_sorted": variant_scalar_sorted(tokens, mask, K, V),
    }
    mm, meta = variant_matmul_tile(tokens, mask, K, V, args.tile_slots)
    if mm is not None:
        fns["matmul_tile"] = mm
        out["matmul_meta"] = meta
    for name, f in fns.items():
        got = np.asarray(jax.jit(f)(z))
        if ref is None:
            ref = got
        else:
            err = np.abs(got - ref).max()
            out[name + "_max_err"] = float(err)
        out[name + "_ms"] = round(time_fn(f, z, K, args.n) * 1e3, 3)
        print(json.dumps({name: out[name + "_ms"]}), flush=True)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
