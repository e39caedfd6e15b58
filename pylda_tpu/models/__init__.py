from pylda_tpu.models.base import Inferencer, LDAState
from pylda_tpu.models.vb import VariationalBayes
from pylda_tpu.models.svi import StochasticVariationalBayes
from pylda_tpu.models.hybrid import Hybrid
from pylda_tpu.models.gibbs import MonteCarlo

# --inference_mode → engine class (reference engine selection,
# upstream:launch_train.py [UNVERIFIED]; SURVEY.md section 3.1).
ENGINES = {
    "vb": VariationalBayes,
    "svi": StochasticVariationalBayes,
    "hybrid": Hybrid,
    "gibbs": MonteCarlo,
}


def make_engine(config):
    return ENGINES[config.inference_mode](config)


__all__ = [
    "Inferencer",
    "LDAState",
    "VariationalBayes",
    "StochasticVariationalBayes",
    "Hybrid",
    "MonteCarlo",
    "ENGINES",
    "make_engine",
]
