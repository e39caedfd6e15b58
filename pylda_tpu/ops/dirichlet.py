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


def exp_dirichlet_expectation_fast(x: jnp.ndarray) -> jnp.ndarray:
    """exp(E[log p]) via a shifted asymptotic digamma — the E-step
    inner-loop form.

    The device trace (scripts/profile_sweep.py) showed the elementwise
    psi+exp fusion costing as much as the phinorm contraction itself
    (~38% of each sweep at the flagship shape): ``lax.digamma`` carries
    a reflection branch (tan, evaluated unconditionally under SIMD
    select) the E-step never needs (gamma > 0 always).  This form uses
    the 2-shift recurrence psi(x) = psi(x+2) - 1/x - 1/(x+1) with the
    asymptotic series psi(y) = ln y - 1/(2y) - 1/(12y^2) + 1/(120y^4)
    - 1/(252y^6), and the ln(x+2) term cancels into the exp, so the
    per-element cost is 3 divides + ~8 FMAs + 1 exp — no log, no tan,
    no branch.

    Accuracy: max |psi error| 1.2e-5 at x=1e-3 (smaller everywhere
    above); in float32 the end-to-end exp(E[log p]) error measures
    <2e-6 relative — below f32 rounding noise and an order of magnitude
    below the E-step's 1e-5 convergence threshold.  In float64 that
    error WOULD be visible (the f64 oracle-parity gate pins 1e-8), so
    f64 inputs fall back to the exact form.
    """
    if x.dtype == jnp.float64:
        return exp_dirichlet_expectation(x)

    def psi_parts(v):
        # psi(v) = ln(v + 2) + t(v)
        y = v + 2.0
        inv = 1.0 / y
        inv2 = inv * inv
        t = -0.5 * inv - inv2 * (
            1.0 / 12.0 - inv2 * (1.0 / 120.0 - inv2 * (1.0 / 252.0))
        )
        return y, t - 1.0 / v - 1.0 / (v + 1.0)

    y, t = psi_parts(x)
    s = x.sum(axis=-1, keepdims=True)
    ys, ts = psi_parts(s)
    # exp(psi(x) - psi(s)) = (x+2) * exp(t - ln(s+2) - ts); the per-row
    # log is O(rows), not O(rows*K).
    return y * jnp.exp(t - (jnp.log(ys) + ts))


def digamma_fast(x: jnp.ndarray) -> jnp.ndarray:
    """psi(x) for x > 0 via the same 2-shift asymptotic series as
    ``exp_dirichlet_expectation_fast`` (one log + ~10 FMAs per element
    — ~6x ``lax.digamma``'s measured 1.2e10 elems/s on v5e, which pays
    a reflection branch positive arguments never need).  |error| <=
    1.2e-5 absolute at x = 1e-3, smaller above; f64 falls back exact
    (the f64 oracle-parity gates pin 1e-8)."""
    if x.dtype == jnp.float64:
        return digamma(x)
    y = x + 2.0
    inv = 1.0 / y
    inv2 = inv * inv
    t = -0.5 * inv - inv2 * (
        1.0 / 12.0 - inv2 * (1.0 / 120.0 - inv2 * (1.0 / 252.0))
    )
    return jnp.log(y) + t - 1.0 / x - 1.0 / (x + 1.0)


def gammaln_fast(x: jnp.ndarray) -> jnp.ndarray:
    """log Gamma(x) for x > 0 via a 3-shift Stirling series (two logs +
    ~12 FMAs per element — ~4x ``lax.lgamma``'s measured 1.8e10
    elems/s on v5e): lnG(x) = lnG(x+3) - ln(x (x+1) (x+2)) with
    lnG(y) = (y-1/2) ln y - y + ln(2 pi)/2 + 1/(12y) - 1/(360y^3)
    + 1/(1260y^5) at y >= 3 (next omitted term < 3e-7 absolute).
    f64 falls back exact."""
    if x.dtype == jnp.float64:
        return gammaln(x)
    y = x + 3.0
    inv = 1.0 / y
    inv2 = inv * inv
    series = inv * (
        1.0 / 12.0 - inv2 * (1.0 / 360.0 - inv2 * (1.0 / 1260.0))
    )
    half_log_2pi = 0.9189385332046727
    stirling = (y - 0.5) * jnp.log(y) - y + half_log_2pi + series
    return stirling - jnp.log(x * (x + 1.0) * (x + 2.0))


def theta_elbo(
    gamma: jnp.ndarray, alpha: jnp.ndarray, mask: jnp.ndarray
) -> jnp.ndarray:
    """Per-document theta terms of the bound, masked and summed.

    sum_d [ sum_k (alpha_k - gamma_dk) Elogtheta_dk + log B(gamma_d)
            - log B(alpha) ]  with log B(x) = sum gammaln(x) - gammaln(sum x)
    (SURVEY.md section 8.1).
    """
    elog = digamma_fast(gamma) - digamma_fast(
        gamma.sum(axis=-1, keepdims=True)
    )
    per_doc = (
        ((alpha[None, :] - gamma) * elog).sum(-1)
        + gammaln_fast(gamma).sum(-1)
        - gammaln_fast(gamma.sum(-1))
    )
    prior = gammaln(alpha.sum()) - gammaln(alpha).sum()
    return (mask * (per_doc + prior)).sum()


def beta_elbo(lam: jnp.ndarray, eta: jnp.ndarray) -> jnp.ndarray:
    """Topic-side terms of the bound (SURVEY.md section 8.1).

    The [K, V] digamma + lgamma surfaces run at the fast shifted-series
    forms (f64 exact): at K=1000, V=100k the exact transcendentals were
    13.5 ms of the SVI epoch — ~8% — for a reported-bound term whose
    Monte-Carlo noise dwarfs the series' <= 3e-6 absolute error."""
    elog = digamma_fast(lam) - digamma_fast(
        lam.sum(axis=-1, keepdims=True)
    )
    s = ((eta[None, :] - lam) * elog).sum()
    s += gammaln_fast(lam).sum() - gammaln_fast(lam.sum(-1)).sum()
    s += lam.shape[0] * (gammaln(eta.sum()) - gammaln(eta).sum())
    return s
