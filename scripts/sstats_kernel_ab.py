#!/usr/bin/env python
"""On-chip A/B: XLA vs Pallas dense-sstats, standalone and in-engine.

Standalone phase timing uses the input-perturbation scan chain (the
0.0*out trick gets algebraically simplified and the loop body hoisted —
measured impossible 0.005 ms results; perturbing an INPUT per iteration
is the proven pattern from scripts/sstats_variants.py).  The in-engine
number is the decider (CLAUDE.md: standalone wins are not predictive).

MEASURED 2026-08-18 (TPU v5e, D=4096 V=10k K=100):
  standalone  xla f32 0.832 ms | pallas f32 auto 0.830 / (512,512)
  0.852 / (512,1024) 0.845 | xla bf16 0.854 | pallas bf16 auto 0.811 /
  (512,512) 0.812 / (512,1024) 0.778 ms.  On-chip parity EXACT
  (max rel 0.0).
  in-engine   xla 10.056 ms/pass (407.3k docs/s) | pallas 9.596 ms/pass
  (426.8k docs/s) -> +4.6% end-to-end.  Default flipped to
  sstats_kernel="auto" (pallas on TPU) on this evidence.
  First-call Mosaic warmup re-checked in a fresh process: 0.9 s with a
  warm .jax_cache — the ~80 s session-4 warmup was remote-helper-side
  state, not per-process.
"""

import time

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)

from pylda_tpu.ops.dirichlet import exp_dirichlet_expectation
from pylda_tpu.ops.estep import estep_dense_sstats
from pylda_tpu.ops.pallas_sstats import pallas_dense_sstats

D, V, K = 4096, 10_000, 100
rng = np.random.default_rng(0)
counts_np = rng.poisson(0.012, size=(D, V)).astype(np.float32)
et0 = exp_dirichlet_expectation(
    jnp.asarray(rng.gamma(100.0, 0.01, (D, K)), jnp.float32)
)
eeb = exp_dirichlet_expectation(
    jnp.asarray(rng.gamma(100.0, 0.01, (K, V)), jnp.float32)
)


def time_scan(fn, counts, n=50):
    @jax.jit
    def chained(carry0):
        def body(carry, _):
            _ss, tok = fn(counts, et0 + carry, eeb)
            return carry + 1e-12 * tok, ()
        out, _ = jax.lax.scan(body, carry0, None, length=n)
        return out

    jax.block_until_ready(chained(jnp.float32(0.0)))
    best = float("inf")
    for _ in range(3):
        t0 = time.time()
        jax.block_until_ready(chained(jnp.float32(0.0)))
        best = min(best, (time.time() - t0) / n)
    return best * 1e3


def standalone():
    for store in (jnp.float32, jnp.bfloat16):
        c = jnp.asarray(counts_np, dtype=store)
        ms = time_scan(lambda c_, e_, b_: estep_dense_sstats(c_, e_, b_), c)
        print(f"xla    store={store.__name__}: {ms:.3f} ms", flush=True)
        for td, tv in ((0, 0), (512, 512), (512, 1024)):
            ms = time_scan(
                lambda c_, e_, b_: pallas_dense_sstats(
                    c_, e_, b_, tile_d=td, tile_v=tv
                ),
                c,
            )
            label = f"({td},{tv})" if td else "(auto)"
            print(f"pallas store={store.__name__} tile={label}: {ms:.3f} ms",
                  flush=True)
    ss1, t1 = estep_dense_sstats(jnp.asarray(counts_np), et0, eeb)
    ss2, t2 = pallas_dense_sstats(jnp.asarray(counts_np), et0, eeb)
    rel = float(jnp.abs(ss1 - ss2).max() / jnp.abs(ss1).max())
    print(f"on-chip parity: max rel {rel:.2e}, scores {float(t1):.1f} "
          f"vs {float(t2):.1f}", flush=True)


def in_engine():
    from pylda_tpu.corpus.synthetic import synthetic_corpus
    from pylda_tpu.models import VariationalBayes
    from pylda_tpu.utils.config import LDAConfig

    corpus, _, _ = synthetic_corpus(
        num_docs=D, num_topics=K, num_types=V,
        mean_doc_length=120.0, seed=0,
    )
    n = 64
    for kernel in ("xla", "pallas"):
        cfg = LDAConfig(
            number_of_topics=K, inference_mode="vb", seed=0,
            inner_iterations=50, convergence_threshold=1e-5,
            sstats_kernel=kernel,
        )
        eng = VariationalBayes(cfg)
        eng.initialize(corpus)
        elbos = eng.learning_many(n)
        best = float("inf")
        for _ in range(3):
            t0 = time.time()
            elbos = eng.learning_many(n)
            best = min(best, (time.time() - t0) / n)
        print(f"engine sstats_kernel={kernel}: {best*1e3:.3f} ms/pass "
              f"({D/best:.0f} docs/s), elbo {float(elbos[-1]):.1f}",
              flush=True)


if __name__ == "__main__":
    standalone()
    in_engine()
