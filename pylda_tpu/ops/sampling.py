"""Batched within-document Gibbs sampling (JAX/XLA).

The reference resamples token topics one at a time in Python
(upstream:monte_carlo.py / hybrid.py [UNVERIFIED]; SURVEY.md sections 3.2,
3.3).  Per-token sequential dependence *across documents* cannot be batched,
but the device-idiomatic formulation (SURVEY.md section 7.1;
BASELINE.json:5 "batched categorical draws on device") is:

- freeze the topic-word factor for the whole sweep (hybrid: exp E[log beta]
  from lambda, per Mimno/Hoffman/Blei 2012; Gibbs: the count-table point
  estimate frozen at sweep start, the Newman et al. 2009 AD-LDA-style
  approximation — documented, parity judged on perplexity/topics);
- every document then sweeps its own tokens independently: a ``lax.scan``
  over token positions, with all documents of a bucket advancing in
  lockstep and drawing one [D]-sized batched categorical per position.

Within a document the scan is exact sequential Gibbs: the doc-topic counts
n_dk are decremented/incremented per position inside the carry.
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp

# Sweep knobs, overridable by A/B scripts BEFORE tracing (use
# jax.clear_caches() after changing; they are read at trace time).
# Measured on the config-3 shape (scripts/gibbs_step_opts.py, v5e):
# the prefix-sum matmul at HIGH (3 bf16 passes, ~f32 fidelity) is 4.8%
# faster per sweep than HIGHEST (6 passes) with joint-LL/held-out in
# band; DEFAULT (single bf16 pass) buys only 2% more while rounding
# every product to bf16 — a systematic distortion of the conditional,
# not just ulp noise — so HIGH is the default.  A bf16 factor table
# (TW_DTYPE) measured no gain (the gather is not the bound).
CDF_PRECISION = jax.lax.Precision.HIGH
TW_DTYPE = None  # e.g. jnp.bfloat16 halves the per-position factor gather
# Sorted-segment n_kv rebuild: permute z by a (loop-invariant) argsort
# of the token ids so the per-sweep [K, V] count rebuild becomes a
# segment_sum with indices_are_sorted=True instead of a random scatter.
# The gibbs trace showed the rebuild at ~63% of the sweep (4.4 of
# 7.0 ms at config 3) — but MEASURED 2.7x SLOWER in-engine (24.8 vs
# 9.1 ms/sweep, identical LL): the per-sweep z/mask permute plus the
# sorted layout's relayouts cost more than indices_are_sorted saves on
# this scatter (same verdict as the round-2 sorted-permutation sstats).
# Kept as a knob for re-measurement on other toolchains; default off.
SORTED_COUNTS = False
# Scalar-binned n_kv rebuild: scatter the SCALAR mask into a flat
# [V*K] table at combined bins w*K + z instead of scattering [S, K]
# one-hot rows into V bins.  TPU scatter cost is per-INDEX (~7-10 ns;
# round-5 scripts/rebuild_variants.py: every layout trick — static
# sorted permutations, balanced alias-cell MXU matmuls — pays the same
# per-slot random-access toll on either its gather or its scatter), so
# same index count but ~100x less data moved: measured 7.4 -> 6.0 ms
# standalone at the config-3 shape, and it drops the [S, K] one-hot
# materialisation entirely.  Values are exact small integers in f32 —
# bit-identical tables.  Gated by the flat-table element budget (the
# [V*K] f32 temporary; at K=1000, V=100k it is the same 400 MB as n_kv
# itself).
SCALAR_COUNTS = True
SCALAR_COUNTS_MAX_ELEMS = 1 << 27
# Budget for the once-per-call pre-gathered per-slot factor block
# [LB, B, D, K] (see sample_doc_topics); above it the position steps
# gather fac_t[w_t] themselves.
PREGATHER_FACTOR_MAX_BYTES = 512 * 1024 * 1024


def count_table(tokens, token_mask, z, num_topics, num_types, dtype):
    """[K, V] assignment-count table for one bucket (the n_kv rebuild),
    honouring the SCALAR_COUNTS / SORTED_COUNTS variant knobs.  Exposed
    at module level so callers (``MonteCarlo._sweep_scan``'s
    every-R-sweeps rebuild) can invoke it INSIDE a ``lax.cond`` branch
    — computed unconditionally it could not be dead-code-eliminated on
    the skipped sweeps."""
    K, V = num_topics, num_types
    if (
        SCALAR_COUNTS
        and not SORTED_COUNTS
        and V * K <= SCALAR_COUNTS_MAX_ELEMS
        and V * K < 2**31
    ):
        sv = tokens.reshape(-1) * K + z.reshape(-1)
        flat = jax.ops.segment_sum(
            token_mask.reshape(-1).astype(dtype), sv, num_segments=V * K
        )
        return flat.reshape(V, K).T
    if SORTED_COUNTS:
        flat_ids = tokens.reshape(-1)
        perm = jnp.argsort(flat_ids)  # loop-invariant: hoisted
        zs = z.reshape(-1)[perm]
        ms = token_mask.reshape(-1)[perm]
        hot = jax.nn.one_hot(zs, K, dtype=dtype) * ms[:, None]
        return jax.ops.segment_sum(
            hot, flat_ids[perm], num_segments=V,
            indices_are_sorted=True,
        ).T
    hot = jax.nn.one_hot(z, K, dtype=dtype) * token_mask[:, :, None]
    flat = hot.reshape(-1, K)
    return jax.ops.segment_sum(
        flat, tokens.reshape(-1), num_segments=V
    ).T


@functools.partial(
    jax.jit,
    static_argnames=(
        "num_topics", "num_types", "burn_in", "num_samples", "sampler",
        "block_positions", "accumulate_counts",
    ),
)
def sample_doc_topics(
    tokens: jnp.ndarray,  # [D, L] int32 token ids (0 on padding)
    token_mask: jnp.ndarray,  # [D, L] float (0 on padding)
    log_topic_word: jnp.ndarray,  # [K, V] log-domain topic-word factor
    alpha: jnp.ndarray,  # [K]
    z_init: jnp.ndarray,  # [D, L] int32 initial assignments
    key: jnp.ndarray,
    num_topics: int,
    num_types: int,
    burn_in: int = 5,
    num_samples: int = 10,
    sampler: str = "cdf",
    block_positions: int = 1,
    accumulate_counts: bool = True,
) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Run burn_in + num_samples sweeps; average stats over kept sweeps.

    Returns (gamma_bar [D, K], sstats [K, V], z_final [D, L],
    ndk_final [D, K]) where gamma_bar = alpha + mean_kept(n_dk) and
    sstats[k, v] = mean_kept(#{tokens w=v assigned to k}).

    ``sampler`` picks the batched categorical draw (same distribution,
    different random stream — parity is statistical either way):

    - ``"cdf"`` (default): inverse-CDF in probability domain.
      p = (n_dk + alpha) * phi[:, w] needs no transcendentals, and the
      whole sweep's randomness is ONE [L, D] uniform tensor generated
      up front — the gumbel path burns a [D, K] threefry draw plus two
      transcendental passes per position, which decomposition measured
      as the dominant sweep cost (scripts/gibbs_decompose.py).  phi is
      per-word max-normalised so f32 exp cannot underflow a column.
    - ``"gumbel"``: log-domain jax.random.categorical per position
      (the original formulation; kept for A/B and as a fallback).
    - ``"race"`` (experimental): exponential races — z = argmax_k
      p_k/E_k with E ~ Exp(1).  One [L, D, K] draw + one batched
      transcendental pass up front; the position step is pure
      mul/argmax.  Measured ~even with gumbel at K=100 on a v5e
      (scripts/sampler_ab.py: 10.94 vs 10.87 ms/sweep) — exposed for
      A/B on other shapes.

    ``block_positions`` (B): sample B consecutive positions of every
    document per scan step from ONE shared n_dk state (all B old
    assignments removed first — leave-block-out).  B=1 is exact
    sequential within-doc Gibbs; B>1 is the within-document analog of
    the AD-LDA per-sweep approximation (the position scan is
    latency-bound on TPU — ~26 us/step at [4096, 100] per-step work —
    so fewer, fatter steps buy large sweep speedups;
    scripts/gibbs_block_ab.py quantifies both the speedup and the
    joint-likelihood band agreement).  Counts stay exactly conserved
    for any B.
    """
    D, L = tokens.shape
    K = num_topics
    dtype = log_topic_word.dtype

    B = max(1, min(int(block_positions), L))
    LB = -(-L // B)  # scan steps
    Lp = LB * B
    padL = Lp - L

    def _blocks(x_dl, fill=0):
        """[D, L] -> [LB, B, D] column blocks (inert padding)."""
        xc = x_dl.T
        if padL:
            xc = jnp.pad(
                xc, ((0, padL), (0, 0)), constant_values=fill
            )
        return xc.reshape(LB, B, D)

    tok_c = _blocks(tokens)  # [LB, B, D]
    mask_c = _blocks(token_mask)

    if sampler in ("cdf", "race"):
        # Per-word max-normalised probability-domain factor: a constant
        # per-column scale leaves the categorical unchanged but keeps
        # exp() representable in f32 even for hybrid's E[log beta].
        tw = jnp.exp(
            log_topic_word - log_topic_word.max(axis=0, keepdims=True)
        )  # [K, V]
        if TW_DTYPE is not None:
            tw = tw.astype(TW_DTYPE)
        fac_t = tw.T  # [V, K]
    else:
        fac_t = log_topic_word.T
    # Pre-gather the per-slot factor rows ONCE per call: the token ids
    # are loop-invariant across sweeps AND positions, so the per-step
    # fac_t[w_t] gathers re-pay the per-index random-access toll every
    # sweep (hybrid freezes the factor for burn_in+samples sweeps: the
    # round-5 trace measured ~9.5 ms/iteration of per-step gathers vs
    # ~1.9 ms for one bulk gather).  Gated by bytes (the [LB, B, D, K]
    # block rides the scan as xs — at K=1000 V=100k shapes it would be
    # GBs) and on multi-sweep calls: with one sweep per call (gibbs,
    # whose factor changes every sweep anyway) the bulk block's extra
    # write+read measured a wash-to-slight-loss.
    pregather = (
        burn_in + num_samples > 1
        and LB * B * D * K * jnp.dtype(fac_t.dtype).itemsize
        <= PREGATHER_FACTOR_MAX_BYTES
    )
    fac_c = fac_t[tok_c] if pregather else None  # [LB, B, D, K]
    if sampler == "cdf":
        # Inclusive prefix-sum as one MXU matmul: jnp.cumsum along the
        # lane (K) axis lowers to a shift cascade with relayouts that
        # measured SLOWER than the gumbel RNG it replaced; p @ tri is a
        # single [D,K]x[K,K] pass.
        tri = jnp.triu(jnp.ones((K, K), dtype=dtype))  # tri[k, j]=1, k<=j

    def ndk_of(z):
        return (jax.nn.one_hot(z, K, dtype=dtype) * token_mask[:, :, None]).sum(
            axis=1
        )

    def _unblock(z_cols):
        """[LB, B, D] scan output -> [D, L] (padding sliced off)."""
        return z_cols.reshape(Lp, D)[:L].T

    def _remove(ndk, z_t, m_t):
        """Leave-block-out: drop all B old assignments of the block."""
        hot = jax.nn.one_hot(z_t, K, dtype=dtype) * m_t[..., None]
        return ndk - hot.sum(axis=0), hot

    def _insert(ndk, z_new, m_t):
        hot = jax.nn.one_hot(z_new, K, dtype=dtype) * m_t[..., None]
        return ndk + hot.sum(axis=0)

    def one_sweep(z, ndk, sweep_key):
        if sampler == "cdf":
            # One batched RNG call for the entire sweep: [Lp, D] uniforms
            # vs one [D, K] threefry draw per position under gumbel.
            # minval=tiny keeps r = u * c_total strictly positive, so a
            # topic whose probability underflowed to exactly 0 (hybrid
            # E[log beta] on rare words can do this for topic 0) can
            # never be selected by the strict (c < r) comparison.
            u = jax.random.uniform(
                sweep_key, (LB, B, D), dtype=dtype,
                minval=jnp.finfo(dtype).tiny, maxval=1.0,
            )

            def pos_step(carry, xs):
                ndk = carry
                if pregather:
                    z_t, w_t, m_t, u_t, f_t = xs  # f_t [B, D, K]
                else:
                    z_t, w_t, m_t, u_t = xs  # each [B, D] (u_t [B, D])
                    f_t = tw.T[w_t]
                ndk, _ = _remove(ndk, z_t, m_t)
                p = (ndk[None] + alpha[None, None, :]) * f_t  # [B,D,K]
                # NOTE: each CDF entry is an independent dot product, so
                # unlike a sequential cumsum, adjacent entries round
                # independently and c is only monotone up to 1 ulp.  The
                # (c < r).sum() count can therefore be off by one for
                # draws landing exactly on an ulp boundary (probability
                # ~2^-24 per draw) — accepted: the K-1 clamp bounds the
                # top end and the assignment error is to an adjacent,
                # near-equal-mass boundary.
                c = jnp.dot(p, tri, precision=CDF_PRECISION)
                r = u_t[..., None] * c[..., -1:]
                z_new = jnp.minimum(
                    (c < r).sum(axis=-1), K - 1
                ).astype(z_t.dtype)
                z_new = jnp.where(m_t > 0, z_new, z_t)
                ndk = _insert(ndk, z_new, m_t)
                return ndk, z_new

            xs = (_blocks(z), tok_c, mask_c, u)
            ndk, z_cols = jax.lax.scan(
                pos_step, ndk, xs + (fac_c,) if pregather else xs
            )
            return _unblock(z_cols), ndk

        if sampler == "race":
            # Exponential races: z = argmax_k p_k / E_k with E ~ Exp(1)
            # samples the categorical.  All the sweep's noise is ONE
            # batched draw + one batched transcendental pass; the
            # position step is pure mul/argmax.
            u = jax.random.uniform(
                sweep_key, (LB, B, D, K), dtype=dtype,
                minval=jnp.finfo(dtype).tiny, maxval=1.0,
            )
            inv_e = -1.0 / jnp.log(u)  # 1/Exp(1) > 0

            def pos_step(carry, xs):
                ndk = carry
                if pregather:
                    z_t, w_t, m_t, e_t, f_t = xs
                else:
                    z_t, w_t, m_t, e_t = xs  # [B, D] x3, [B, D, K]
                    f_t = tw.T[w_t]
                ndk, _ = _remove(ndk, z_t, m_t)
                p = (ndk[None] + alpha[None, None, :]) * f_t  # [B,D,K]
                z_new = jnp.argmax(p * e_t, axis=-1).astype(z_t.dtype)
                z_new = jnp.where(m_t > 0, z_new, z_t)
                ndk = _insert(ndk, z_new, m_t)
                return ndk, z_new

            xs = (_blocks(z), tok_c, mask_c, inv_e)
            ndk, z_cols = jax.lax.scan(
                pos_step, ndk, xs + (fac_c,) if pregather else xs
            )
            return _unblock(z_cols), ndk

        keys = jax.random.split(sweep_key, LB)

        def pos_step(carry, xs):
            ndk = carry
            if pregather:
                z_t, w_t, m_t, k_t, f_t = xs
            else:
                z_t, w_t, m_t, k_t = xs  # [B, D] x3, key
                f_t = log_topic_word.T[w_t]
            ndk, _ = _remove(ndk, z_t, m_t)
            logits = (
                jnp.log(ndk[None] + alpha[None, None, :]) + f_t
            )  # [B, D, K]
            z_new = jax.random.categorical(k_t, logits, axis=-1).astype(
                z_t.dtype
            )
            z_new = jnp.where(m_t > 0, z_new, z_t)
            ndk = _insert(ndk, z_new, m_t)
            return ndk, z_new

        xs = (_blocks(z), tok_c, mask_c, keys)
        ndk, z_cols = jax.lax.scan(
            pos_step, ndk, xs + (fac_c,) if pregather else xs
        )
        return _unblock(z_cols), ndk

    def assignment_counts(z):
        """sstats contribution of one kept sweep: [K, V] counts."""
        return count_table(tokens, token_mask, z, K, num_types, dtype)

    def sweep_step(carry, s):
        z, ndk, acc_ndk, acc_kv = carry
        z, ndk = one_sweep(z, ndk, jax.random.fold_in(key, s))
        if burn_in > 0 and accumulate_counts:
            # Burn-in sweeps are discarded: branch AROUND the [K, V]
            # count accumulation instead of multiplying it by 0 — the
            # rebuild scatter is the dominant sweep phase (~3.7 ms at
            # the config-3 shape), and the round-5 hybrid trace showed
            # it paid on all burn_in + num_samples sweeps.
            def _acc(args):
                z_, ndk_, a_ndk, a_kv = args
                return a_ndk + ndk_, a_kv + assignment_counts(z_)

            acc_ndk, acc_kv = jax.lax.cond(
                s >= burn_in, _acc, lambda a: (a[2], a[3]),
                (z, ndk, acc_ndk, acc_kv),
            )
        elif accumulate_counts:
            acc_ndk = acc_ndk + ndk
            acc_kv = acc_kv + assignment_counts(z)
        # accumulate_counts=False (gibbs_rebuild_interval > 1): the
        # caller rebuilds the [K, V] table itself every R sweeps via
        # ``count_table``; the zero acc_kv is returned untouched and
        # dead-code-eliminated in the caller's trace.
        return (z, ndk, acc_ndk, acc_kv), None

    ndk0 = ndk_of(z_init)
    acc_ndk0 = jnp.zeros((D, K), dtype)
    acc_kv0 = jnp.zeros((K, num_types), dtype)
    (z, ndk, acc_ndk, acc_kv), _ = jax.lax.scan(
        sweep_step,
        (z_init, ndk0, acc_ndk0, acc_kv0),
        jnp.arange(burn_in + num_samples),
    )
    denom = jnp.asarray(max(1, num_samples), dtype)
    gamma_bar = alpha[None, :] + acc_ndk / denom
    sstats = acc_kv / denom
    return gamma_bar, sstats, z, ndk


@functools.partial(jax.jit, static_argnames=())
def sequence_token_score(
    tokens: jnp.ndarray,  # [D, L]
    token_mask: jnp.ndarray,  # [D, L]
    elog_theta: jnp.ndarray,  # [D, K]
    log_topic_word: jnp.ndarray,  # [K, V]
) -> jnp.ndarray:
    """sum_{d,t} mask * logsumexp_k(Elogtheta_dk + logbeta_k,w) — the
    token part of the bound on the sequence layout (matches the dense/
    ragged ``counts * log phinorm`` term)."""

    def pos_step(acc, xs):
        w_t, m_t = xs  # [D]
        lp = jax.nn.logsumexp(
            elog_theta + log_topic_word.T[w_t], axis=-1
        )  # [D]
        return acc + (m_t * lp).sum(), None

    acc, _ = jax.lax.scan(
        pos_step,
        jnp.zeros((), elog_theta.dtype),
        (tokens.T, token_mask.T),
    )
    return acc


@functools.partial(jax.jit, static_argnames=("num_topics",))
def random_assignments(
    key: jnp.ndarray, tokens: jnp.ndarray, num_topics: int
) -> jnp.ndarray:
    """Uniform-random initial z (reference init, SURVEY.md section 3.2)."""
    return jax.random.randint(key, tokens.shape, 0, num_topics, dtype=jnp.int32)
