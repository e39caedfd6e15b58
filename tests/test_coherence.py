"""UMass topic coherence (utils/coherence.py)."""

import numpy as np

from pylda_tpu.corpus.corpus import Corpus
from pylda_tpu.corpus.vocabulary import Vocabulary
from pylda_tpu.utils.coherence import (
    doc_frequency_table,
    engine_coherence,
    umass_coherence,
)


def _toy_corpus():
    vocab = Vocabulary(["a", "b", "c", "d", "e", "f"])
    lines = [
        "a b c",      # a,b,c co-occur
        "a b",        # a,b
        "a c",
        "d e f",      # disjoint theme
        "d e",
        "f d",
    ]
    return Corpus.from_lines(lines, vocab), vocab


def test_doc_frequency_table():
    corpus, _ = _toy_corpus()
    t = doc_frequency_table(corpus, [0, 3])  # a, d
    assert t.shape == (6, 2)
    assert t[:, 0].sum() == 3  # a in 3 docs
    assert t[:, 1].sum() == 3  # d in 3 docs


def test_coherent_topic_beats_incoherent():
    corpus, _ = _toy_corpus()
    coherent = [[0, 1, 2]]    # a, b, c — genuinely co-occurring
    mixed = [[0, 3, 5]]       # a, d, f — never co-occur
    c_good = umass_coherence(coherent, corpus)[0]
    c_bad = umass_coherence(mixed, corpus)[0]
    assert c_good > c_bad


def test_hand_computed_pair():
    corpus, _ = _toy_corpus()
    # D(a) = 3, D(b) = 2, D(a,b) = 2 (docs "a b c" and "a b").
    # topic (b, a): pair (m=a, l=b) -> log((D(a,b)+1)/D(b)) = log(3/2)
    assert np.isclose(umass_coherence([[1, 0]], corpus)[0], np.log(1.5))
    # topic (a, b): pair (m=b, l=a) -> log((D(a,b)+1)/D(a)) = log(3/3)
    assert umass_coherence([[0, 1]], corpus)[0] == 0.0


def test_engine_coherence_on_recovered_topics():
    """Planted-topic corpus: the trained model's coherence beats a
    random-permutation baseline of the same words."""
    from pylda_tpu.corpus.synthetic import synthetic_corpus
    from pylda_tpu.models import VariationalBayes
    from pylda_tpu.utils.config import LDAConfig

    corpus, _, _ = synthetic_corpus(
        num_docs=400, num_topics=5, num_types=200,
        mean_doc_length=60.0, seed=5,
    )
    eng = VariationalBayes(
        LDAConfig(number_of_topics=5, inference_mode="vb", seed=0)
    )
    eng.initialize(corpus)
    eng.learning_many(25)
    coh = engine_coherence(eng, corpus, top_n=8)
    assert len(coh["per_topic"]) == 5

    rng = np.random.default_rng(0)
    beta = np.asarray(eng.topic_word_distribution())
    top = np.argsort(-beta, axis=1)[:, :8]
    shuffled = top.copy().reshape(-1)
    rng.shuffle(shuffled)
    rand_scores = umass_coherence(
        [list(r) for r in shuffled.reshape(top.shape)], corpus
    )
    assert coh["mean"] > np.mean(rand_scores)
