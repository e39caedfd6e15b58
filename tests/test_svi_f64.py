"""Bit-level correctness of the SVI engine against the float64 oracle.

The SVI analog of tests/test_estep_f64.py: with x64 enabled, matching
lambda init, pinned sweep counts (threshold=0), and the SAME minibatch
schedule (both sides call ``corpus.minibatch_indices`` with the
engine's ``counter * 100003 + seed`` epoch seed), the fused-epoch JAX
engine's lambda trajectory must match the per-document NumPy oracle to
rounding — proving the minibatch natural-gradient path is the same
math as SURVEY.md section 8.4, not just statistically close.
"""

import subprocess
import sys

_SCRIPT = r"""
import os
os.environ["JAX_PLATFORMS"] = "cpu"
import jax
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)
import numpy as np, jax.numpy as jnp
from pylda_tpu.corpus import synthetic_corpus
from pylda_tpu.oracle import OracleSVI
from pylda_tpu.models import StochasticVariationalBayes
from pylda_tpu.utils.config import LDAConfig

corpus, _, _ = synthetic_corpus(
    num_docs=96, num_topics=5, num_types=120, mean_doc_length=40, seed=7)
rng = np.random.default_rng(42)
lam0 = rng.gamma(100.0, 0.01, size=(5, 120))

SEED = 3
cfg = LDAConfig(
    number_of_topics=5, inference_mode="svi", seed=SEED,
    batch_size=32, tau0=16.0, kappa=0.7, alpha_alpha=0.2,
    alpha_beta=0.01, dtype="float64",
    gamma_init="ones", inner_iterations=40, convergence_threshold=0.0,
)
eng = StochasticVariationalBayes(cfg)
eng.initialize(corpus, lam_init=lam0.copy())
n_epochs = 3
ests_eng = eng.learning_many(n_epochs)

ora = OracleSVI(
    corpus, num_topics=5, alpha=0.2, eta=0.01, batch_size=32,
    tau0=16.0, kappa=0.7, seed=0, gamma_init="ones",
    inner_iterations=40, convergence_threshold=0.0,
)
ora.lam = lam0.copy()
ests_ora = [ora.learning(e * 100003 + SEED) for e in range(n_epochs)]

lam_eng = np.asarray(eng.state.lam, np.float64)
err = np.abs(lam_eng - ora.lam).max() / np.abs(ora.lam).max()
assert err < 1e-8, err
for a, b in zip(ests_eng, ests_ora):
    assert abs(a - b) < 1e-6 * abs(b), (ests_eng, ests_ora)
print("OK", err)
"""


def test_svi_matches_oracle_in_f64():
    res = subprocess.run(
        [sys.executable, "-c", _SCRIPT],
        capture_output=True,
        text=True,
        timeout=500,
    )
    assert res.returncode == 0, res.stderr[-3000:]
    assert "OK" in res.stdout
