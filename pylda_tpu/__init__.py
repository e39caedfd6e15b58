"""pylda_tpu — a TPU-native Latent Dirichlet Allocation framework.

A from-scratch JAX/XLA/Pallas re-design of the capabilities of kzhai/PyLDA
(see SURVEY.md for the reference blueprint): batch mean-field variational
Bayes, collapsed-Gibbs / hybrid sampling, stochastic (minibatch) variational
inference, alpha/eta hyperparameter optimization, held-out perplexity
evaluation, and PyLDA-compatible CLI flags and topic/checkpoint exports.

The reference (SURVEY.md section 1) is a single-process pure-Python-2
NumPy/SciPy package; everything accelerated or distributed here is new
capability designed TPU-first:

- The per-document digamma fixed-point E-step (SURVEY.md section 3.1, the
  ~95%-of-runtime hot loop) becomes batched dense/ragged matmul kernels on
  the MXU (``pylda_tpu.ops.estep``), with an optional fused Pallas kernel.
- Sampling paths become batched on-device categorical draws
  (``pylda_tpu.ops.sampling``).
- Documents shard across a ``("data", "model")`` device mesh; sufficient
  statistics and ELBO terms combine via psum collectives
  (``pylda_tpu.parallel``).
"""

from pylda_tpu.version import __version__

from pylda_tpu.utils.config import LDAConfig
from pylda_tpu.corpus.vocabulary import Vocabulary
from pylda_tpu.corpus.corpus import Corpus
from pylda_tpu.corpus.streaming import StreamingCorpus
from pylda_tpu.models import (
    Hybrid,
    Inferencer,
    MonteCarlo,
    StochasticVariationalBayes,
    VariationalBayes,
    make_engine,
)
from pylda_tpu.utils.coherence import engine_coherence

__all__ = [
    "__version__",
    "LDAConfig",
    "Vocabulary",
    "Corpus",
    "StreamingCorpus",
    "Inferencer",
    "VariationalBayes",
    "StochasticVariationalBayes",
    "Hybrid",
    "MonteCarlo",
    "make_engine",
    "engine_coherence",
]
