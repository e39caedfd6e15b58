"""Hyperparameter updates.

Newton–Raphson maximum-likelihood update for a Dirichlet concentration
vector given expected sufficient statistics — the Blei lda-c linear-time
shared-Hessian (Sherman–Morrison) form with halving backtracking
(SURVEY.md section 8.1; upstream:variational_bayes.py update_alpha
[UNVERIFIED]).  Used for both alpha (given sum_d E[log theta_d]) and eta
(given sum_k E[log beta_k]).

The Wallach slice sampler for the Gibbs path lives in
``pylda_tpu.models.gibbs`` (host-side control loop, device-side likelihood).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.scipy.special import digamma

try:  # polygamma(1, x) == trigamma
    from jax.scipy.special import polygamma

    def _trigamma(x):
        return polygamma(1, x)

except ImportError:  # pragma: no cover

    def _trigamma(x, _h=1e-4):
        return (digamma(x + _h) - digamma(x - _h)) / (2 * _h)


@functools.partial(jax.jit, static_argnames=("iterations",))
def newton_dirichlet_mle(
    concentration: jnp.ndarray,  # [N] current alpha (or eta)
    elog_sum: jnp.ndarray,  # [N] sum over observations of E[log p]
    num_observations: jnp.ndarray,  # scalar: D for alpha, K for eta
    iterations: int = 100,
    tol: float = 1e-8,
) -> jnp.ndarray:
    """Maximise sum_obs E[log Dir(p_obs | a)] over a > 0.

    gradient  g_k = N (psi(sum a) - psi(a_k)) + elog_sum_k
    Hessian   H = diag(-N psi'(a_k)) + 11^T N psi'(sum a)
    Newton step solved in O(K) via Sherman–Morrison; step halved until all
    components stay positive (reference's decay backtracking).
    """
    n = num_observations.astype(concentration.dtype)

    def newton_body(carry):
        a, i, _delta = carry
        g = n * (digamma(a.sum()) - digamma(a)) + elog_sum
        h = -n * _trigamma(a)
        z = n * _trigamma(a.sum())
        c = (g / h).sum() / (1.0 / z + (1.0 / h).sum())
        step = (g - c) / h

        def bt_cond(decay):
            return jnp.logical_and(
                jnp.any(a - decay * step <= 0), decay > 1e-10
            )

        decay = jax.lax.while_loop(
            bt_cond, lambda d: d * 0.5, jnp.asarray(1.0, a.dtype)
        )
        a_new = a - decay * step
        # If backtracking bottomed out, keep the old value (step unusable).
        ok = jnp.all(a_new > 0)
        a_new = jnp.where(ok, a_new, a)
        delta = jnp.abs(a_new - a).max()
        return a_new, i + 1, delta

    def newton_cond(carry):
        _a, i, delta = carry
        return jnp.logical_and(i < iterations, delta > tol)

    a, _, _ = jax.lax.while_loop(
        newton_cond,
        newton_body,
        (concentration, jnp.int32(0), jnp.asarray(jnp.inf, concentration.dtype)),
    )
    return a
