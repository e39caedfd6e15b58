"""Native C tokenizer: parity with the Python parser + performance sanity."""

import time

import numpy as np
import pytest

from pylda_tpu.corpus.corpus import Corpus
from pylda_tpu.corpus.vocabulary import Vocabulary
from pylda_tpu.native import (
    HAVE_NATIVE,
    NativeVocabTable,
    _python_parse,
    parse_lines,
)

needs_native = pytest.mark.skipif(
    not HAVE_NATIVE, reason="native extension not built"
)


@pytest.fixture
def vocab():
    return Vocabulary(["apple", "banana", "cherry", "date", "Egg"])


def test_parity_with_python(vocab):
    lines = [
        "Apple banana APPLE unknown cherry",
        "",
        "date date\tbanana  cherry",
        "zzz qqq",
        "egg Egg EGG",  # uppercase vocab entry never matches (ref quirk)
    ]
    got = parse_lines(lines, vocab)
    want = _python_parse(lines, vocab)
    assert len(got) == len(want)
    for g, w in zip(got, want):
        np.testing.assert_array_equal(g, w)


@needs_native
def test_native_table_reuse(vocab):
    table = NativeVocabTable(vocab.types)
    d1 = parse_lines(["apple cherry"], vocab, table=table)
    d2 = parse_lines(["banana"], vocab, table=table)
    np.testing.assert_array_equal(d1[0], [0, 2])
    np.testing.assert_array_equal(d2[0], [1])


def test_non_ascii_falls_back(vocab):
    lines = ["apple Straße banana"]
    got = parse_lines(lines, vocab)
    np.testing.assert_array_equal(got[0], [0, 1])


def test_corpus_from_lines_uses_parser(vocab):
    c = Corpus.from_lines(["apple banana", "cherry"], vocab)
    assert c.num_docs == 2
    np.testing.assert_array_equal(c.docs[0], [0, 1])
    np.testing.assert_array_equal(c.docs[1], [2])


@needs_native
def test_native_speedup_on_large_input():
    rng = np.random.default_rng(0)
    types = [f"word{i}" for i in range(20_000)]
    vocab = Vocabulary(types)
    words = np.array(types)
    lines = [
        " ".join(words[rng.integers(0, len(types), 80)]) for _ in range(2000)
    ]
    t0 = time.perf_counter()
    py = _python_parse(lines, vocab)
    t_py = time.perf_counter() - t0
    table = NativeVocabTable(vocab.types)
    t0 = time.perf_counter()
    nat = parse_lines(lines, vocab, table=table)
    t_nat = time.perf_counter() - t0
    for g, w in zip(nat, py):
        np.testing.assert_array_equal(g, w)
    # The native path must actually be faster (typically 5-20x).
    assert t_nat < t_py, (t_nat, t_py)


def test_trailing_blank_line_parity(vocab):
    """A trailing blank line must produce an empty doc on BOTH paths
    (the native text join cannot represent it; the wrapper restores it)."""
    lines = ["apple banana", ""]
    got = parse_lines(lines, vocab)
    want = _python_parse(lines, vocab)
    assert len(got) == len(want) == 2
    assert got[1].size == 0


@needs_native
def test_very_long_token_parity():
    """Tokens >= 256 bytes go through the heap path and still match."""
    long_tok = "x" * 300
    vocab = Vocabulary(["short", long_tok])
    lines = [f"short {long_tok} short"]
    got = parse_lines(lines, vocab)
    want = _python_parse(lines, vocab)
    np.testing.assert_array_equal(got[0], want[0])
    assert got[0].size == 3


def test_parse_stats_parity(vocab):
    """parse_stats (vectorised native reduction) must match the
    per-document Python statistics on OOV, empty, and repeat cases."""
    from pylda_tpu.native import _stats_of_docs, parse_stats

    lines = [
        "Apple banana APPLE unknown cherry",
        "",
        "date date\tbanana  cherry",
        "zzz qqq",
        "apple apple apple",
        "",
    ]
    toks, uniqs = parse_stats(lines, vocab)
    w_toks, w_uniqs = _stats_of_docs(_python_parse(lines, vocab))
    np.testing.assert_array_equal(toks, w_toks)
    np.testing.assert_array_equal(uniqs, w_uniqs)


@needs_native
def test_parse_stats_table_reuse(vocab):
    from pylda_tpu.native import parse_stats

    table = NativeVocabTable(vocab.types)
    t1, u1 = parse_stats(["apple cherry cherry"], vocab, table=table)
    t2, u2 = parse_stats(["banana"], vocab, table=table)
    np.testing.assert_array_equal(t1, [3])
    np.testing.assert_array_equal(u1, [2])
    np.testing.assert_array_equal(t2, [1])
    np.testing.assert_array_equal(u2, [1])
