"""Synthetic LDA corpora.

Two uses (SURVEY.md sections 4.3 and 7.3 "No network in this environment"):

1. Topic-recovery tests: draw a corpus from a known LDA model and check the
   engines recover the planted topics.
2. Benchmark stand-ins for the reference's eval corpora (NIPS, 20-News,
   Wikipedia-100k) which cannot be downloaded here — generate corpora of
   matching shape (D, V, doc-length distribution).
"""

from __future__ import annotations

from typing import Optional, Tuple

import numpy as np

from pylda_tpu.corpus.corpus import Corpus
from pylda_tpu.corpus.vocabulary import Vocabulary


def synthetic_model(
    rng: np.random.Generator,
    num_topics: int,
    num_types: int,
    beta_concentration: float = 0.05,
) -> np.ndarray:
    """Draw topic-word distributions beta [K, V] from Dir(concentration)."""
    beta = rng.gamma(beta_concentration, 1.0, size=(num_topics, num_types))
    beta += 1e-12
    return beta / beta.sum(axis=1, keepdims=True)


def synthetic_corpus(
    num_docs: int,
    num_topics: int,
    num_types: int,
    mean_doc_length: float = 100.0,
    alpha: float = 0.1,
    beta_concentration: float = 0.05,
    seed: int = 0,
    beta: Optional[np.ndarray] = None,
    vocab: Optional[Vocabulary] = None,
) -> Tuple[Corpus, np.ndarray, np.ndarray]:
    """Sample a corpus from the LDA generative model.

    Returns (corpus, true_beta [K, V], true_theta [D, K]).
    """
    rng = np.random.default_rng(seed)
    if beta is None:
        beta = synthetic_model(rng, num_topics, num_types, beta_concentration)
    if vocab is None:
        width = len(str(num_types - 1))
        vocab = Vocabulary(f"w{v:0{width}d}" for v in range(num_types))
    theta = rng.dirichlet(np.full(num_topics, alpha), size=num_docs)
    docs = []
    for d in range(num_docs):
        n = max(1, rng.poisson(mean_doc_length))
        z = rng.choice(num_topics, size=n, p=theta[d])
        # Vectorised per-topic word draws.
        w = np.empty(n, dtype=np.int32)
        for k in np.unique(z):
            sel = z == k
            w[sel] = rng.choice(num_types, size=int(sel.sum()), p=beta[k])
        docs.append(w)
    return Corpus(docs, vocab), beta, theta
