"""Dirichlet expectation and ELBO building blocks (JAX).

The reference computes psi(x) - psi(sum x) per document inside a Python
loop (upstream:inferencer.py compute_dirichlet_expectation [UNVERIFIED],
SURVEY.md section 2.1 row 3).  Here these are batched jnp ops fused by XLA
into the E-step kernels.
"""

from __future__ import annotations

import jax.numpy as jnp
from jax.scipy.special import digamma, gammaln


def dirichlet_expectation(x: jnp.ndarray) -> jnp.ndarray:
    """E[log p] for p ~ Dir(x) along the last axis: psi(x) - psi(sum x)."""
    return digamma(x) - digamma(x.sum(axis=-1, keepdims=True))


def exp_dirichlet_expectation(x: jnp.ndarray) -> jnp.ndarray:
    """exp(E[log p]) — the quantity the exp-domain E-step multiplies."""
    return jnp.exp(dirichlet_expectation(x))


def theta_elbo(
    gamma: jnp.ndarray, alpha: jnp.ndarray, mask: jnp.ndarray
) -> jnp.ndarray:
    """Per-document theta terms of the bound, masked and summed.

    sum_d [ sum_k (alpha_k - gamma_dk) Elogtheta_dk + log B(gamma_d)
            - log B(alpha) ]  with log B(x) = sum gammaln(x) - gammaln(sum x)
    (SURVEY.md section 8.1).
    """
    elog = dirichlet_expectation(gamma)
    per_doc = (
        ((alpha[None, :] - gamma) * elog).sum(-1)
        + gammaln(gamma).sum(-1)
        - gammaln(gamma.sum(-1))
    )
    prior = gammaln(alpha.sum()) - gammaln(alpha).sum()
    return (mask * (per_doc + prior)).sum()


def beta_elbo(lam: jnp.ndarray, eta: jnp.ndarray) -> jnp.ndarray:
    """Topic-side terms of the bound (SURVEY.md section 8.1)."""
    elog = dirichlet_expectation(lam)
    s = ((eta[None, :] - lam) * elog).sum()
    s += gammaln(lam).sum() - gammaln(lam.sum(-1)).sum()
    s += lam.shape[0] * (gammaln(eta.sum()) - gammaln(eta).sum())
    return s
