"""Disk-backed streaming corpus for SVI (SURVEY.md section 7.2 steps 1
and 6: "host-side streaming iterator for SVI", "corpora larger than
HBM").

``Corpus`` materialises every document (token arrays + per-doc uniques)
in host RAM; fine for batch VB, wrong for the corpora SVI exists for.
``StreamingCorpus`` keeps only the byte offset of each line of
``doc.dat`` in memory (8 bytes/document — a 100M-doc corpus costs 800 MB
of offsets and zero document storage) and parses just the requested
documents when a minibatch layout is built, via the same native
tokenizer.  Host RAM therefore never holds the corpus: per-epoch cost is
one streamed re-parse of each minibatch, overlapping with device compute
in the SVI loop.

Duck-types the slice of the ``Corpus`` surface the SVI engine uses:
``num_docs / num_types / num_tokens / global_num_docs /
minibatch_indices / to_dense / to_ragged_buckets / subset``.

Multi-host: pass ``process_index``/``process_count`` and the instance
exposes only this host's contiguous document block (``process_local``,
``global_doc_offset``), matching ``load_input_directory``'s contract.
"""

from __future__ import annotations

import os
from typing import List, Optional, Sequence

import numpy as np

from pylda_tpu.corpus.corpus import Corpus, DenseBatch, RaggedBucket
from pylda_tpu.corpus.vocabulary import Vocabulary


class StreamingCorpus:
    """Offset-indexed view of a doc.dat file; documents parse on demand."""

    def __init__(
        self,
        path: str,
        vocab: Vocabulary,
        process_index: Optional[int] = None,
        process_count: Optional[int] = None,
    ):
        self.path = os.path.abspath(path)
        self.vocab = vocab
        offsets = [0]
        # Pass 1: byte offsets only (8 bytes/doc of RAM, no parsing).
        with open(self.path, "rb") as f:
            for line in f:
                offsets.append(offsets[-1] + len(line))
        self._offsets = np.asarray(offsets, dtype=np.int64)
        total = len(self._offsets) - 1
        self._total_docs = total
        self.process_local = False
        self.global_doc_offset = 0
        self._lo, self._hi = 0, total
        if process_index is not None and (process_count or 1) > 1:
            per = -(-total // process_count)
            self._lo = min(process_index * per, total)
            self._hi = min(self._lo + per, total)
            self.process_local = True
            self.global_doc_offset = self._lo
        # Pass 2: exact post-OOV token count + per-doc unique-type count
        # of THIS host's block (chunked parse keeps RAM bounded; token
        # semantics match Corpus.num_tokens — local under process
        # sharding).  The native tokenizer's flat output is reduced with
        # vectorised NumPy (pylda_tpu.native.parse_stats) and the vocab
        # hash table is built ONCE and reused across chunks.
        from pylda_tpu.native import (
            HAVE_NATIVE,
            NativeVocabTable,
            parse_stats,
        )

        table = NativeVocabTable(vocab.types) if HAVE_NATIVE else None
        tok_chunks: List[np.ndarray] = []
        uniq_chunks: List[np.ndarray] = []

        def _consume(lines: List[str]) -> None:
            toks, uniqs = parse_stats(lines, vocab, table=table)
            tok_chunks.append(toks)
            uniq_chunks.append(uniqs)

        with open(self.path, "rb") as f:
            f.seek(self._offsets[self._lo])
            chunk: List[str] = []
            for g in range(self._lo, self._hi):
                chunk.append(
                    f.read(
                        self._offsets[g + 1] - self._offsets[g]
                    ).decode("utf-8", errors="replace")
                )
                if len(chunk) >= 4096:
                    _consume(chunk)
                    chunk = []
            if chunk:
                _consume(chunk)
        self._local_tokens = int(
            sum(int(t.sum()) for t in tok_chunks)
        )
        # Per-doc unique counts (4 bytes/doc — within the streaming RAM
        # contract): feeds the SVI fixed-bucket capacity planner without
        # another corpus pass.
        self._unique_counts = (
            np.concatenate(uniq_chunks)
            if uniq_chunks
            else np.zeros((0,), np.int32)
        )

    # -- stats ----------------------------------------------------------------

    @property
    def num_docs(self) -> int:
        return self._hi - self._lo

    @property
    def global_num_docs(self) -> int:
        return self._total_docs

    @property
    def num_types(self) -> int:
        return len(self.vocab)

    @property
    def num_tokens(self) -> int:
        """This host's block token count (post-OOV), from the indexing
        pass — same semantics as ``Corpus.num_tokens`` under process
        sharding."""
        return self._local_tokens

    # -- on-demand parsing ------------------------------------------------------

    def _parse(self, doc_indices: Sequence[int]) -> Corpus:
        """Parse ONLY the requested documents (local indices)."""
        from pylda_tpu.native import parse_lines

        lines = []
        with open(self.path, "rb") as f:
            for i in doc_indices:
                g = self._lo + int(i)
                f.seek(self._offsets[g])
                lines.append(
                    f.read(self._offsets[g + 1] - self._offsets[g]).decode(
                        "utf-8", errors="replace"
                    )
                )
        return Corpus(parse_lines(lines, self.vocab), self.vocab)

    def _remap(self, batch, doc_indices):
        """Row doc_ids: position-in-minibatch -> LOCAL corpus index (the
        engines rebase process-local ids to global themselves)."""
        idx = np.asarray(doc_indices, dtype=np.int32)
        doc_ids = np.where(
            batch.doc_ids >= 0, idx[np.clip(batch.doc_ids, 0, None)], -1
        ).astype(np.int32)
        kw = {
            f: getattr(batch, f)
            for f in type(batch).__dataclass_fields__
        }
        kw["doc_ids"] = doc_ids
        return type(batch)(**kw)

    # -- Corpus-surface layout builders -----------------------------------------

    def to_dense(
        self,
        doc_indices: Optional[Sequence[int]] = None,
        pad_docs_to: Optional[int] = None,
    ) -> DenseBatch:
        idx = (
            np.arange(self.num_docs)
            if doc_indices is None
            else np.asarray(doc_indices, dtype=np.int64)
        )
        sub = self._parse(idx)
        return self._remap(sub.to_dense(pad_docs_to=pad_docs_to), idx)

    def ragged_row_histogram(self, bucket_sizes: Sequence[int]) -> dict:
        """Same contract as ``Corpus.ragged_row_histogram`` but from the
        per-doc unique counts collected during the indexing pass — no
        corpus re-read."""
        sizes = sorted(bucket_sizes)
        mx = sizes[-1]
        hist = {s: 0 for s in sizes}
        edges = np.asarray(sizes)
        small = self._unique_counts[self._unique_counts <= mx]
        which = edges[np.searchsorted(edges, small)]
        for s, c in zip(*np.unique(which, return_counts=True)):
            hist[int(s)] += int(c)
        big = self._unique_counts[self._unique_counts > mx]
        hist[mx] += int((-(-big // mx)).sum())
        return hist

    def to_ragged_buckets(
        self,
        bucket_sizes: Sequence[int] = (64, 128, 256, 512, 1024, 2048),
        doc_pad_multiple: int = 64,
        doc_indices: Optional[Sequence[int]] = None,
        bucket_capacities: Optional[dict] = None,
    ) -> List[RaggedBucket]:
        idx = (
            np.arange(self.num_docs)
            if doc_indices is None
            else np.asarray(doc_indices, dtype=np.int64)
        )
        sub = self._parse(idx)
        return [
            self._remap(b, idx)
            for b in sub.to_ragged_buckets(
                bucket_sizes=bucket_sizes,
                doc_pad_multiple=doc_pad_multiple,
                bucket_capacities=bucket_capacities,
            )
        ]

    # -- splits / minibatches ----------------------------------------------------

    def subset(self, doc_indices: Sequence[int]) -> Corpus:
        return self._parse(list(doc_indices))

    def minibatch_indices(
        self, batch_size: int, seed: int = 0
    ) -> List[np.ndarray]:
        rng = np.random.default_rng(seed)
        perm = rng.permutation(self.num_docs)
        return [
            perm[s : s + batch_size]
            for s in range(0, self.num_docs, batch_size)
        ]
