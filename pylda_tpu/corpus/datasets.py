"""Bundled example corpus + input-directory loading.

The reference ships a small example corpus tarball (AP / de-news style;
SURVEY.md section 2.1 row 9) and reads ``doc.dat`` / ``voc.dat`` from
``--input_directory`` (SURVEY.md section 3.1).  We keep the same on-disk
contract: ``doc.dat`` (train docs, one per line), ``voc.dat`` (one type per
line), optional ``test.dat`` (held-out docs).

Because this environment has no network access, the bundled corpus is
generated deterministically from themed English word lists — topics are
human-readable and recoverable, which the reference's README quickstart
(K=10, 50 iterations) relies on for eyeballing ``exp_beta`` output.
"""

from __future__ import annotations

import os
from typing import Optional, Tuple

import numpy as np

from pylda_tpu.corpus.corpus import Corpus
from pylda_tpu.corpus.vocabulary import Vocabulary

# Ten human-readable themes ("de-news" covered German politics/economy/sport
# newswire; these imitate that register).
_THEMES = {
    "politics": """government minister parliament election party coalition
        chancellor vote opposition policy debate reform cabinet president
        democracy campaign ballot legislation senate treaty""",
    "economy": """market economy growth inflation bank interest trade export
        import currency stocks investment profit budget deficit tax
        unemployment industry recession earnings""",
    "sport": """team match goal league season player coach championship
        tournament victory defeat score stadium football tennis olympic
        medal race final training""",
    "weather": """weather rain snow temperature storm wind sunshine forecast
        cloud flood drought degrees celsius cold warm frost thunder climate
        humidity pressure""",
    "crime": """police arrest crime court judge trial sentence prison
        investigation suspect murder theft evidence lawyer verdict charges
        detective robbery fraud witness""",
    "technology": """computer software internet technology research network
        digital system data engineer science laboratory innovation satellite
        telescope processor robot energy nuclear physics chemistry""",
    "health": """hospital doctor patient health medicine disease treatment
        vaccine surgery virus infection nurse therapy diagnosis epidemic
        clinic pharmacy cancer symptom recovery""",
    "culture": """music concert theater film festival artist museum exhibition
        opera orchestra painting novel author literature gallery premiere
        symphony ballet sculpture poetry""",
    "transport": """train railway airport flight traffic highway airline
        station passenger vehicle driver accident route bridge tunnel
        shipping harbor cargo bus bicycle""",
    "education": """school university student teacher education exam lecture
        professor degree classroom curriculum tuition scholarship graduate
        faculty semester research thesis library kindergarten""",
}

_FILLERS = """the a of in on and for with from after before during under
    over between about against new old first last next major minor local
    national international official report announced said week month year
    today yesterday""".split()


def make_denews_tiny(
    out_dir: str,
    num_train: int = 400,
    num_test: int = 100,
    mean_doc_length: float = 60.0,
    seed: int = 20260816,
) -> None:
    """Generate the bundled corpus into out_dir/{doc.dat,voc.dat,test.dat}."""
    rng = np.random.default_rng(seed)
    themes = {k: v.split() for k, v in _THEMES.items()}
    names = sorted(themes)
    os.makedirs(out_dir, exist_ok=True)

    def sample_doc() -> str:
        # 1-2 dominant themes + filler noise, newswire-style.
        n_themes = rng.integers(1, 3)
        chosen = rng.choice(len(names), size=n_themes, replace=False)
        weights = rng.dirichlet(np.full(n_themes, 0.6))
        n = max(8, rng.poisson(mean_doc_length))
        words = []
        for _ in range(n):
            if rng.random() < 0.25:
                words.append(_FILLERS[rng.integers(len(_FILLERS))])
            else:
                t = themes[names[chosen[rng.choice(n_themes, p=weights)]]]
                words.append(t[rng.integers(len(t))])
        return " ".join(words)

    with open(os.path.join(out_dir, "doc.dat"), "w", encoding="utf-8") as f:
        for _ in range(num_train):
            f.write(sample_doc() + "\n")
    with open(os.path.join(out_dir, "test.dat"), "w", encoding="utf-8") as f:
        for _ in range(num_test):
            f.write(sample_doc() + "\n")
    vocab = sorted(set(w for t in themes.values() for w in t) | set(_FILLERS))
    with open(os.path.join(out_dir, "voc.dat"), "w", encoding="utf-8") as f:
        for w in vocab:
            f.write(w + "\n")


def bundled_corpus_dir() -> str:
    """Path of the committed bundled corpus (generated if missing)."""
    here = os.path.dirname(os.path.dirname(os.path.dirname(__file__)))
    d = os.path.join(here, "data", "de-news-tiny")
    if not os.path.exists(os.path.join(d, "doc.dat")):
        make_denews_tiny(d)
    return d


def load_input_directory(
    input_directory: str,
    process_index: Optional[int] = None,
    process_count: Optional[int] = None,
    streaming: bool = False,
) -> Tuple[Corpus, Optional[Corpus], Vocabulary]:
    """Load the reference's input contract: doc.dat + voc.dat [+ test.dat].

    Mirrors upstream:launch_train.py's corpus loading (SURVEY.md section
    3.1 [UNVERIFIED]); if voc.dat is absent the vocabulary is built from the
    training documents (sorted for cross-host determinism).

    Multi-host input pipeline (SURVEY.md section 7.3): pass
    ``process_index``/``process_count`` and each host parses only its own
    CONTIGUOUS block of training documents — block p of P, matching the
    contiguous row blocks a data-axis ``NamedSharding`` assigns to host
    p's devices.  The returned corpus carries ``process_local=True`` and
    ``global_num_docs`` so engines scale per-document statistics
    correctly; the vocabulary and test split stay global.
    """
    doc_path = os.path.join(input_directory, "doc.dat")
    if not os.path.exists(doc_path):
        # Accept train.dat as an alternative name (SURVEY.md section 9 open
        # question 2).
        alt = os.path.join(input_directory, "train.dat")
        if os.path.exists(alt):
            doc_path = alt
        else:
            raise FileNotFoundError(f"no doc.dat/train.dat in {input_directory}")
    voc_path = os.path.join(input_directory, "voc.dat")
    if os.path.exists(voc_path):
        vocab = Vocabulary.from_file(voc_path)
    else:
        # Vocabulary must be identical on every host: streamed full pass
        # (token set only — no line buffering), sorted.
        with open(doc_path, "r", encoding="utf-8") as f:
            vocab = Vocabulary.from_corpus_lines(f)
    if streaming:
        # Disk-backed minibatch source: host RAM holds line offsets
        # only; documents parse on demand per minibatch (SVI path,
        # SURVEY.md section 7.2 step 1).
        from pylda_tpu.corpus.streaming import StreamingCorpus

        train = StreamingCorpus(
            doc_path, vocab,
            process_index=process_index, process_count=process_count,
        )
    elif process_index is None or process_count in (None, 1):
        train = Corpus.from_file(doc_path, vocab)
    else:
        # Stream: count lines (cheap pass), then buffer ONLY this host's
        # window — no host materialises the full corpus text.
        with open(doc_path, "r", encoding="utf-8") as f:
            total = sum(1 for _ in f)
        per = -(-total // process_count)  # ceil: uniform block size
        lo = min(process_index * per, total)
        hi = min(lo + per, total)
        import itertools

        with open(doc_path, "r", encoding="utf-8") as f:
            window = list(itertools.islice(f, lo, hi))
        train = Corpus.from_lines(window, vocab)
        train.process_local = True
        train.global_num_docs = total
        train.global_doc_offset = lo
    test = None
    test_path = os.path.join(input_directory, "test.dat")
    if os.path.exists(test_path):
        test = Corpus.from_file(test_path, vocab)
    return train, test, vocab
