"""Native (C) corpus tokenizer with a transparent pure-Python fallback.

``parse_lines(lines, vocab)`` matches the reference parser's semantics
(lowercase, whitespace split, out-of-vocabulary tokens dropped;
SURVEY.md section 2.1 row 7).  The C path handles ASCII corpora — the
practical case for the reference's datasets — in a single pass over raw
bytes; anything non-ASCII (where C lowercasing would diverge from
Python's Unicode lowercasing) routes to the Python path, as does any
environment where the extension failed to build.
"""

from __future__ import annotations

from typing import Iterable, List, Optional, Sequence

import numpy as np

try:  # built by setup.py; optional
    from pylda_tpu.native import _fastcorpus  # type: ignore

    HAVE_NATIVE = True
except ImportError:  # pragma: no cover - depends on build environment
    _fastcorpus = None
    HAVE_NATIVE = False


class NativeVocabTable:
    """A C hash table over the vocabulary, reusable across parses."""

    def __init__(self, types: Sequence[str]):
        self._capsule = _fastcorpus.build_vocab(list(types))

    def parse_bytes(self, data: bytes) -> List[np.ndarray]:
        ids_b, offs_b = _fastcorpus.parse(self._capsule, data)
        ids = np.frombuffer(ids_b, dtype=np.int32)
        offs = np.frombuffer(offs_b, dtype=np.int64)
        docs: List[np.ndarray] = []
        start = 0
        for end in offs:
            docs.append(ids[start:end].copy())
            start = int(end)
        return docs


def _python_parse(lines: Iterable[str], vocab) -> List[np.ndarray]:
    docs = []
    for line in lines:
        toks = line.lower().split()
        ids = [vocab.get(t) for t in toks]
        docs.append(np.asarray([i for i in ids if i >= 0], dtype=np.int32))
    return docs


def _stats_of_docs(docs: List[np.ndarray]):
    return (
        np.asarray([d.size for d in docs], np.int64),
        np.asarray(
            [np.unique(d).size if d.size else 0 for d in docs], np.int32
        ),
    )


def parse_stats(
    lines: Iterable[str],
    vocab,
    table: Optional[NativeVocabTable] = None,
):
    """(token_counts int64 [n_lines], unique_counts int32 [n_lines])
    without materialising per-document arrays.

    The streaming indexer's inner loop (corpus/streaming.py): on the
    native path the flat (ids, offsets) parse output is reduced with
    vectorised NumPy — unique types per document counted through the
    composite sort key doc*V + id — so no per-document Python executes."""
    if not HAVE_NATIVE:
        return _stats_of_docs(_python_parse(lines, vocab))
    if isinstance(lines, str):
        line_list = lines.splitlines()
    else:
        line_list = [l.rstrip("\r\n") for l in lines]
    text = "\n".join(line_list)
    if not text.isascii():
        return _stats_of_docs(_python_parse(line_list, vocab))
    if table is None:
        table = NativeVocabTable(vocab.types)
    ids_b, offs_b = _fastcorpus.parse(table._capsule, text.encode("ascii"))
    ids = np.frombuffer(ids_b, dtype=np.int32)
    ends = np.frombuffer(offs_b, dtype=np.int64)
    n = len(line_list)
    if len(ends) < n:  # "\n".join drops trailing empty lines; restore
        last = ends[-1] if len(ends) else 0
        ends = np.concatenate([ends, np.full(n - len(ends), last, np.int64)])
    starts = np.concatenate([np.zeros(1, np.int64), ends[:-1]])
    tok_counts = ends - starts
    V = len(vocab)
    doc_of = np.repeat(np.arange(n, dtype=np.int64), tok_counts)
    uniq_keys = np.unique(doc_of * np.int64(V) + ids.astype(np.int64))
    uniq_counts = np.bincount(
        uniq_keys // np.int64(V), minlength=n
    ).astype(np.int32)
    return tok_counts, uniq_counts


def parse_lines(
    lines: Iterable[str],
    vocab,
    table: Optional[NativeVocabTable] = None,
) -> List[np.ndarray]:
    """Tokenise documents to per-doc int32 id arrays.

    ``vocab`` is a pylda_tpu Vocabulary (``.get(tok) -> id or -1``,
    ``.types``).  ``table`` lets callers amortise the native hash-table
    build across many parse calls (the streaming loader does this).
    """
    if not HAVE_NATIVE:
        return _python_parse(lines, vocab)
    if isinstance(lines, str):
        line_list = lines.splitlines()
    else:
        # Normalise: strip any line terminators, one document per line.
        line_list = [l.rstrip("\r\n") for l in lines]
    text = "\n".join(line_list)
    if not text.isascii():
        return _python_parse(line_list, vocab)
    if table is None:
        table = NativeVocabTable(vocab.types)
    docs = table.parse_bytes(text.encode("ascii"))
    # "\n".join can't represent trailing empty lines distinctly; restore
    # them so document counts match the Python parser exactly.
    while len(docs) < len(line_list):
        docs.append(np.zeros((0,), np.int32))
    return docs
