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


def plan_alias_cells(flat_w, flat_m, V, C=128, target_slots=1024):
    """Static slot -> (group, column) assignment for the alias-matmul
    rebuild.  Each group holds <= S_t slots; each (group, column) cell
    is owned by ONE word (hot words own many alias cells); groups are
    slot-balanced by first-fit-decreasing, so the per-group contraction
    is one uniform batched matmul.  Returns
    (perm [Q*S_t] slot index per padded position (S on pads),
     mask [Q*S_t], col [Q*S_t] in [0, C),
     cell_word [n_cells] sorted-owner word per cell, cell_of_pos) —
    all static numpy."""
    S = flat_w.size
    real = np.nonzero(flat_m > 0)[0]
    # order real slots by word so each word's slots are contiguous
    order = real[np.argsort(flat_w[real], kind="stable")]
    words, starts = np.unique(flat_w[order], return_index=True)
    ends = np.append(starts[1:], order.size)
    S_t = target_slots
    # chunks: (word, slot_start, slot_len) with len <= S_t
    chunks = []
    for w, s0, s1 in zip(words, starts, ends):
        for c0 in range(s0, s1, S_t):
            chunks.append((int(w), c0, min(S_t, s1 - c0)))
    chunks.sort(key=lambda c: -c[2])  # first-fit decreasing
    Q = max(-(-order.size // S_t), 1)
    free = [S_t] * Q
    cols_used = [0] * Q
    placed = []  # (q, word, slots)
    for w, c0, ln in chunks:
        q = -1
        for g in range(Q):
            if free[g] >= ln and cols_used[g] < C:
                q = g
                break
        if q < 0:
            free.append(S_t)
            cols_used.append(0)
            Q += 1
            q = Q - 1
        free[q] -= ln
        cols_used[q] += 1
        placed.append((q, w, order[c0 : c0 + ln]))
    perm = np.full((Q, S_t), S, np.int64)  # S = pad sentinel
    mask = np.zeros((Q, S_t), np.float32)
    col = np.zeros((Q, S_t), np.int32)
    fill = [0] * Q
    next_col = [0] * Q
    cells = []  # (q, c, word)
    for q, w, slots in placed:
        c = next_col[q]
        next_col[q] += 1
        o = fill[q]
        perm[q, o : o + slots.size] = slots
        mask[q, o : o + slots.size] = 1.0
        col[q, o : o + slots.size] = c
        fill[q] += slots.size
        cells.append((q, c, w))
    # cell table sorted by word for the sorted-segment un-alias
    cells.sort(key=lambda t: t[2])
    cell_qc = np.asarray([(q * C + c) for q, c, _w in cells], np.int32)
    cell_word = np.asarray([w for _q, _c, w in cells], np.int32)
    return perm, mask, col, cell_qc, cell_word, Q, S_t


def variant_alias_matmul(tokens, mask, K, V, C=128, target_slots=1024):
    flat_w = np.asarray(tokens).reshape(-1)
    flat_m = np.asarray(mask).reshape(-1)
    S = flat_w.size
    perm, pmask, col, cell_qc, cell_word, Q, S_t = plan_alias_cells(
        flat_w, flat_m, V, C, target_slots
    )
    # Shipped as jit ARGUMENTS, not closures: baked-in literals blow the
    # tunneled remote-compile body limit (HTTP 413 — same gotcha as
    # svi._mb_rows_args).
    consts = (
        jax.nn.one_hot(jnp.asarray(col), C, dtype=jnp.bfloat16)
        * jnp.asarray(pmask)[..., None].astype(jnp.bfloat16),  # [Q,S_t,C]
        jnp.asarray(np.minimum(perm, S - 1).reshape(-1)),
        jnp.asarray(pmask.reshape(Q, S_t)),
        jnp.asarray(cell_qc),
        jnp.asarray(cell_word),
    )

    def f(z, consts):
        hot_r, perm_j, pm_j, qc_j, wd_j = consts
        z_g = z.reshape(-1)[perm_j].reshape(Q, S_t)
        hot_z = jax.nn.one_hot(z_g, K, dtype=jnp.bfloat16) * pm_j[
            ..., None
        ].astype(jnp.bfloat16)
        G = jnp.einsum(
            "qsk,qsc->qkc", hot_z, hot_r,
            preferred_element_type=jnp.float32,
        )  # [Q, K, C]
        cells = G.transpose(0, 2, 1).reshape(Q * C, K)[qc_j]  # [n_cells, K]
        return jax.ops.segment_sum(
            cells, wd_j, num_segments=V, indices_are_sorted=True
        ).T

    meta = {"Q": Q, "S_t": S_t, "n_cells": int(cell_qc.size),
            "padded_slots": int(Q * S_t)}
    return f, meta, consts


def time_fn(f, z, K, consts=(), n=16, repeats=3):
    # ``consts`` are jit ARGUMENTS (large static tables baked as HLO
    # literals blow the tunneled remote-compile body limit, HTTP 413).
    @functools.partial(jax.jit, static_argnames=("n",))
    def run(z, consts, n):
        def body(acc, i):
            # genuinely different assignments per step (same cost
            # profile) — a loop-invariant call would be hoisted.
            t = f((z + i) % K, consts) if consts else f((z + i) % K)
            return acc + t.sum(), None
        acc, _ = jax.lax.scan(body, jnp.float32(0.0), jnp.arange(n))
        return acc

    float(run(z, consts, n))
    best = float("inf")
    for _ in range(repeats):
        t0 = time.time()
        float(run(z, consts, n))
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
    ap.add_argument("--alias_cells", default="1024,128",
                    help="semicolon list of S_t,C for the alias matmul")
    ap.add_argument("--skip", default="",
                    help="comma list of variants to skip")
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
    for sk in args.skip.split(","):
        fns.pop(sk, None)
    mm, meta = variant_matmul_tile(tokens, mask, K, V, args.tile_slots)
    if mm is not None:
        fns["matmul_tile"] = mm
        out["matmul_meta"] = meta
    for st_c in args.alias_cells.split(";"):
        st, c = (int(x) for x in st_c.split(","))
        am, ameta, aconsts = variant_alias_matmul(
            tokens, mask, K, V, C=c, target_slots=st
        )
        name = f"alias_matmul_{st}x{c}"
        fns[name] = (am, aconsts)
        out[name + "_meta"] = ameta
    for name, fv in fns.items():
        f, consts = fv if isinstance(fv, tuple) else (fv, ())
        got = np.asarray(
            jax.jit(f)(z, consts) if consts else jax.jit(f)(z)
        )
        if ref is None:
            ref = got
        else:
            err = np.abs(got - ref).max()
            out[name + "_max_err"] = float(err)
        out[name + "_ms"] = round(
            time_fn(f, z, K, consts, args.n) * 1e3, 3
        )
        print(json.dumps({name: out[name + "_ms"]}), flush=True)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
