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
