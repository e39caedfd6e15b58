from pylda_tpu.ops.dirichlet import (
    dirichlet_expectation,
    exp_dirichlet_expectation,
    theta_elbo,
    beta_elbo,
)
from pylda_tpu.ops.estep import estep_dense, estep_ragged
from pylda_tpu.ops.hyper import newton_dirichlet_mle

__all__ = [
    "dirichlet_expectation",
    "exp_dirichlet_expectation",
    "theta_elbo",
    "beta_elbo",
    "estep_dense",
    "estep_ragged",
    "newton_dirichlet_mle",
]
