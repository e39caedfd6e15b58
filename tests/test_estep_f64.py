"""Bit-level correctness of the JAX E-step against the float64 oracle.

Run in a subprocess because x64 is a process-global JAX flag and the rest
of the suite runs the production float32 path.  This is the strongest
equivalence evidence: with matching precision the batched XLA E-step and
the per-document oracle loop agree to ~1e-11 (pure rounding), proving the
exp-domain matmul formulation (SURVEY.md section 7.1) is the same math as
the per-doc fixed point of section 8.1.
"""

import subprocess
import sys

_SCRIPT = r"""
import os
os.environ["JAX_PLATFORMS"] = "cpu"
import jax
# The machine's sitecustomize pins jax_platforms to the tunneled TPU after
# env vars are read; override the config itself (see tests/conftest.py).
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)
import numpy as np, jax.numpy as jnp
from pylda_tpu.corpus import synthetic_corpus
from pylda_tpu.oracle import OracleVB
from pylda_tpu.ops.estep import estep_dense, estep_ragged
from pylda_tpu.ops.dirichlet import exp_dirichlet_expectation

corpus, _, _ = synthetic_corpus(
    num_docs=64, num_topics=5, num_types=120, mean_doc_length=40, seed=7)
rng = np.random.default_rng(42)
lam_init = rng.gamma(100.0, 0.01, size=(5, 120))
ora = OracleVB(corpus, num_topics=5, alpha=0.2, eta=0.01, seed=0,
               inner_iterations=100, convergence_threshold=1e-12,
               gamma_init="ones")
ora.lam = lam_init.copy()
g_o, ss_o, tok_o = ora.e_step()

lam = jnp.asarray(lam_init)
alpha = jnp.full((5,), 0.2)
eeb = exp_dirichlet_expectation(lam)

batch = corpus.to_dense()
g, ss, tok, _ = estep_dense(
    jnp.asarray(batch.counts, jnp.float64), jnp.ones((64, 5)), eeb, alpha,
    inner_iterations=100, convergence_threshold=1e-12, eps=1e-100)
assert np.abs(np.asarray(g) - g_o).max() < 1e-8
assert np.abs(np.asarray(ss) - ss_o).max() < 1e-8
assert abs(float(tok) - tok_o) < 1e-6
# Exact invariant: gamma rows sum to sum(alpha) + doc length.
doc_lens = np.array([d.size for d in corpus.docs], dtype=np.float64)
assert np.abs(np.asarray(g).sum(1) - (1.0 + doc_lens)).max() < 1e-6

buckets = corpus.to_ragged_buckets(bucket_sizes=(128,), doc_pad_multiple=64)
assert len(buckets) == 1
b = buckets[0]
g2, ss2, tok2, _ = estep_ragged(
    jnp.asarray(b.ids), jnp.asarray(b.cnts, jnp.float64),
    jnp.ones((b.ids.shape[0], 5)), eeb, alpha, num_types=120,
    inner_iterations=100, convergence_threshold=1e-12, eps=1e-100)
order = {int(d): r for r, d in enumerate(b.doc_ids) if d >= 0}
g2_np = np.asarray(g2)[[order[d] for d in range(64)]]
assert np.abs(g2_np - g_o).max() < 1e-8
assert np.abs(np.asarray(ss2) - ss_o).max() < 1e-8
assert abs(float(tok2) - tok_o) < 1e-6
print("OK")
"""


def test_estep_matches_oracle_in_f64():
    res = subprocess.run(
        [sys.executable, "-c", _SCRIPT],
        capture_output=True,
        text=True,
        timeout=500,
    )
    assert res.returncode == 0, res.stderr[-3000:]
    assert "OK" in res.stdout
