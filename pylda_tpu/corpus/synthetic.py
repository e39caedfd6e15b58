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
    # Inverse-CDF sampling with CDFs built once: rng.choice(p=...) would
    # rebuild a V-length CDF per call, which is minutes of host time at
    # K=1000, V=100k corpus scale.
    lens = np.maximum(1, rng.poisson(mean_doc_length, size=num_docs))
    total = int(lens.sum())
    cum_theta = np.cumsum(theta, axis=1)
    z_all = np.empty(total, dtype=np.int32)
    offs = np.concatenate([[0], np.cumsum(lens)])
    for d in range(num_docs):
        z_all[offs[d] : offs[d + 1]] = np.searchsorted(
            cum_theta[d], rng.random(lens[d]), side="right"
        )
    np.clip(z_all, 0, num_topics - 1, out=z_all)
    cum_beta = np.cumsum(beta, axis=1)
    w_all = np.empty(total, dtype=np.int32)
    for k in np.unique(z_all):
        sel = np.nonzero(z_all == k)[0]
        w_all[sel] = np.searchsorted(
            cum_beta[k], rng.random(sel.size), side="right"
        )
    np.clip(w_all, 0, num_types - 1, out=w_all)
    docs = [w_all[offs[d] : offs[d + 1]] for d in range(num_docs)]
    return Corpus(docs, vocab), beta, theta
