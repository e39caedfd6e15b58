#!/usr/bin/env python
"""Attribute the per-pass FIXED cost by in-engine ablation.

Measured (v5e, flagship shape, inner=1, 16-pass scan, 2026-08-18):
full 5.48-5.61 ms/pass; deltas — dense_sstats +0.83/+0.95, gamma
assembly +0.11/+0.13, whole fixed point (gather+loop+1 sweep) +1.08,
beta/theta ELBO and the K x V transcendentals ~0 (XLA overlaps them on
the VPU).  The unattributed remainder decomposed as (a) ~1.9 ms/pass of
tunnel dispatch tax at n=16 (amortised by benching at n=64) and (b) a
full EXTRA iteration per learning_many recomputing export gammas
(removed — .gamma is lazy now).


decompose_pass.py splits the pass into slope (ms/sweep) and intercept
(~5.5 ms at the flagship shape under the planned geometry).  This
script attributes the intercept by monkeypatching individual phases of
the fused iteration to no-ops and measuring the scan-fused delta —
the only attribution that respects XLA's cross-phase fusion (CLAUDE.md:
standalone sub-function timings are not predictive in either
direction).  Sweep count is pinned (inner=1, threshold=0) so ablations
cannot shift the while_loop exit and pollute the delta.
"""

import time

import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)

import pylda_tpu.models.vb as vbmod
from pylda_tpu.corpus.synthetic import synthetic_corpus
from pylda_tpu.models import VariationalBayes
from pylda_tpu.utils.config import LDAConfig

K, V, D = 100, 10_000, 4096
corpus, _, _ = synthetic_corpus(
    num_docs=D, num_topics=K, num_types=V, mean_doc_length=120.0, seed=0
)

N = 16
ORIG = {
    "beta_elbo": vbmod.beta_elbo,
    "theta_elbo": vbmod.theta_elbo,
    "estep_dense_sstats": vbmod.estep_dense_sstats,
    "exp_dirichlet_expectation": vbmod.exp_dirichlet_expectation,
    "_assemble_gamma_device": vbmod._assemble_gamma_device,
}

ABLATIONS = {
    "full": {},
    "no_beta_elbo": {"beta_elbo": lambda lam, eta: jnp.zeros((), lam.dtype)},
    "no_theta_elbo": {
        "theta_elbo": lambda g, a, m=None: jnp.zeros((), g.dtype)
    },
    "no_dense_sstats": {
        # keep shapes: sstats from a zeros-costing broadcast (lam-shaped)
        "estep_dense_sstats": lambda counts, et, eeb, eps=0.0,
        compute_dtype="float32": (
            jnp.zeros_like(eeb), jnp.zeros((), eeb.dtype)
        )
    },
    "cheap_elog_beta": {
        # replace psi(lam)-psi(sum) + exp with a plain normalize: keeps
        # the [K, V] production but drops the transcendentals
        "exp_dirichlet_expectation": lambda x: x / x.sum(-1, keepdims=True)
    },
    "no_assemble": {
        "_assemble_gamma_device": lambda rows, ids, alpha, num_docs: (
            rows[:num_docs]
        )
    },
    # Not a vbmod global: handled specially in run() — replaces the whole
    # per-bucket fixed point (B gather + while_loop + sweeps) with a
    # gamma0 passthrough.
    "no_fixed_point": {"__method__": True},
}


def run(patches):
    orig_method = VariationalBayes._ragged_gamma_fixed_point
    if patches.pop("__method__", None):
        VariationalBayes._ragged_gamma_fixed_point = (
            lambda self, b, gamma0, eeb, alpha: gamma0
        )
    for name, fn in patches.items():
        setattr(vbmod, name, fn)
    try:
        cfg = LDAConfig(
            number_of_topics=K, inference_mode="vb", inner_iterations=1,
            convergence_threshold=0.0, seed=0,
        )
        eng = VariationalBayes(cfg)
        eng.initialize(corpus)
        eng.learning_many(N)
        best = float("inf")
        for _ in range(3):
            t0 = time.time()
            eng.learning_many(N)
            best = min(best, (time.time() - t0) / N)
        return best * 1e3
    finally:
        for name, fn in ORIG.items():
            setattr(vbmod, name, fn)
        VariationalBayes._ragged_gamma_fixed_point = orig_method


base = None
for label, patches in ABLATIONS.items():
    ms = run(patches)
    if label == "full":
        base = ms
        print(f"{label}: {ms:.3f} ms/pass")
    else:
        print(f"{label}: {ms:.3f} ms/pass  (delta {base - ms:+.3f} ms)")
