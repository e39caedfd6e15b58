from pylda_tpu.corpus.vocabulary import Vocabulary
from pylda_tpu.corpus.corpus import (
    Corpus,
    DenseBatch,
    RaggedBucket,
    SequenceBucket,
)
from pylda_tpu.corpus.synthetic import synthetic_corpus

__all__ = [
    "Vocabulary",
    "Corpus",
    "DenseBatch",
    "RaggedBucket",
    "SequenceBucket",
    "synthetic_corpus",
]
