"""Degenerate-input robustness across every engine family.

The reference never guards these (research code); a production framework
must not NaN or crash on them: empty documents mixed into a corpus,
K=1, K > V, duplicate-token documents, single-token documents, and
held-out evaluation on an all-empty (e.g. pure-OOV) test split.
"""

import numpy as np
import pytest

from pylda_tpu.corpus.corpus import Corpus
from pylda_tpu.corpus.vocabulary import Vocabulary
from pylda_tpu.models import make_engine
from pylda_tpu.utils.config import LDAConfig


@pytest.fixture(scope="module")
def ragged_corpus():
    vocab = Vocabulary(f"w{i}" for i in range(30))
    docs = [
        np.array([0, 1, 2, 1], np.int32),   # duplicate token
        np.array([], np.int32),             # empty doc
        np.array([5], np.int32),            # single token
        np.array([7] * 12, np.int32),       # one type, high count
        np.array([], np.int32),
        np.array([3, 4], np.int32),
    ]
    return Corpus(docs, vocab), vocab


@pytest.mark.parametrize("mode", ["vb", "svi", "gibbs", "hybrid"])
@pytest.mark.parametrize("K", [1, 3])
def test_engines_survive_degenerate_docs(ragged_corpus, mode, K):
    c, vocab = ragged_corpus
    eng = make_engine(LDAConfig(
        number_of_topics=K, inference_mode=mode, batch_size=4,
        doc_pad_multiple=2, bucket_sizes=(4, 16),
    ))
    eng.initialize(c, vocab)
    lls = eng.learning_many(3)
    assert all(np.isfinite(v) for v in lls), (mode, K, lls)
    pp = eng.perplexity(c)
    assert np.isfinite(pp) and pp > 0, (mode, K, pp)


def test_more_topics_than_types(ragged_corpus):
    c, vocab = ragged_corpus
    eng = make_engine(LDAConfig(number_of_topics=64))
    eng.initialize(c, vocab)
    assert np.isfinite(eng.learning())


def test_all_empty_heldout_split(ragged_corpus):
    """A test split whose documents are entirely OOV parses to empty
    docs; evaluation must return finite numbers (perplexity degenerates
    to ~1 with zero scored tokens), not divide by zero."""
    c, vocab = ragged_corpus
    eng = make_engine(LDAConfig(number_of_topics=3))
    eng.initialize(c, vocab)
    eng.learning_many(3)
    empty = Corpus([np.array([], np.int32)], vocab)
    ll, gamma = eng.inference(empty)
    assert np.isfinite(ll) and np.isfinite(gamma).all()
    assert np.isfinite(eng.perplexity(empty))
