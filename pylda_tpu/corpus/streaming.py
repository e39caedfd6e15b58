"""Disk-backed streaming corpus for SVI (SURVEY.md section 7.2 steps 1
and 6: "host-side streaming iterator for SVI", "corpora larger than
HBM").

``Corpus`` materialises every document (token arrays + per-doc uniques)
in host RAM; fine for batch VB, wrong for the corpora SVI exists for.
``StreamingCorpus`` keeps only the byte offset of each line of
``doc.dat`` in memory (8 bytes/document — a 100M-doc corpus costs 800 MB
of offsets and zero document storage) and serves just the requested
documents when a minibatch layout is built.

Parsed-row sidecar (round-3 verdict item 3): "larger than RAM" does not
mean "re-tokenize forever".  The indexing pass already reads every
document once; it now also writes the parsed token-id stream to a
binary sidecar next to ``doc.dat`` (raw int32 token ids, raw int32/
float32 per-doc UNIQUE (ids, counts) BoW rows, int64 offsets for both,
and a validity fingerprint of the text file and vocabulary).  Epoch
construction then reads rows from the memmapped sidecar — bit-identical
by construction (they come from the same parse) — and injects the BoW
rows straight into ``Corpus`` so the per-doc ``np.unique`` is skipped
too: measured on the wiki shape, tokenisation was NOT the dominant
epoch-construction cost, the unique/counting pass was (an ids-only
sidecar v1 measured FLAT).  When the directory is unwritable (or
``row_cache="off"``), the original streamed re-parse path is used
unchanged.  A valid existing sidecar also skips the indexing re-parse
entirely on reopen.

Duck-types the slice of the ``Corpus`` surface the SVI engine uses:
``num_docs / num_types / num_tokens / global_num_docs /
minibatch_indices / to_dense / to_ragged_buckets / subset``.

Multi-host: pass ``process_index``/``process_count`` and the instance
exposes only this host's contiguous document block (``process_local``,
``global_doc_offset``), matching ``load_input_directory``'s contract.
"""

from __future__ import annotations

import hashlib
import json
import os
import tempfile
from typing import List, Optional, Sequence

import numpy as np

from pylda_tpu.corpus.corpus import Corpus, DenseBatch, RaggedBucket
from pylda_tpu.corpus.vocabulary import Vocabulary

_ROWCACHE_VERSION = 2


class StreamingCorpus:
    """Offset-indexed view of a doc.dat file; documents parse on demand
    (or read from the parsed-row sidecar — module docstring)."""

    def __init__(
        self,
        path: str,
        vocab: Vocabulary,
        process_index: Optional[int] = None,
        process_count: Optional[int] = None,
        row_cache: str = "auto",
    ):
        if row_cache not in ("auto", "off"):
            raise ValueError(f"unknown row_cache mode: {row_cache}")
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
        # sharding).  When the row sidecar is enabled, the same pass
        # also writes the parsed token-id stream; a VALID existing
        # sidecar skips the re-parse entirely.
        self._row_ids = None  # memmap int32 token stream (sidecar)
        self._row_offsets = None  # int64 [num_docs + 1]
        if row_cache == "auto" and self._load_rowcache():
            return
        self._index_scan(write_cache=(row_cache == "auto"))

    # -- indexing pass + sidecar --------------------------------------------

    def _index_scan(self, write_cache: bool) -> None:
        from pylda_tpu.native import (
            HAVE_NATIVE,
            NativeVocabTable,
            parse_lines,
        )

        table = NativeVocabTable(self.vocab.types) if HAVE_NATIVE else None
        uniq_chunks: List[np.ndarray] = []
        total_tokens = 0
        offsets: List[np.ndarray] = []
        tmp_f = tmp_uf = tmp_cf = None
        tmp_paths = []
        if write_cache:
            try:
                for _ in range(3):
                    fd, tp = tempfile.mkstemp(
                        prefix=os.path.basename(self.path) + ".rowcache.",
                        dir=os.path.dirname(self.path),
                    )
                    tmp_paths.append((fd, tp))
                tmp_f = os.fdopen(tmp_paths[0][0], "wb")
                tmp_uf = os.fdopen(tmp_paths[1][0], "wb")
                tmp_cf = os.fdopen(tmp_paths[2][0], "wb")
            except OSError:
                for fd, tp in tmp_paths:
                    try:
                        os.close(fd)
                        os.unlink(tp)
                    except OSError:
                        pass
                tmp_f = tmp_uf = tmp_cf = None  # plain re-parse mode
                tmp_paths = []

        def _consume(lines: List[str]) -> None:
            nonlocal total_tokens
            docs = parse_lines(lines, self.vocab, table=table)
            nuniq = np.empty((len(docs),), dtype=np.int32)
            for di, d in enumerate(docs):
                if d.size:
                    uids, ucnts = np.unique(d, return_counts=True)
                else:
                    uids = np.zeros((0,), np.int32)
                    ucnts = np.zeros((0,), np.int64)
                nuniq[di] = uids.size
                if tmp_f is not None:
                    tmp_f.write(
                        np.ascontiguousarray(d, dtype=np.int32).tobytes()
                    )
                    tmp_uf.write(
                        np.ascontiguousarray(uids, dtype=np.int32).tobytes()
                    )
                    tmp_cf.write(
                        np.ascontiguousarray(
                            ucnts, dtype=np.float32
                        ).tobytes()
                    )
            uniq_chunks.append(nuniq)
            lens = np.asarray([d.size for d in docs], dtype=np.int64)
            offsets.append(lens)
            total_tokens += int(lens.sum())

        try:
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
        except Exception:
            if tmp_f is not None:
                for fobj, (_, tp) in zip(
                    (tmp_f, tmp_uf, tmp_cf), tmp_paths
                ):
                    fobj.close()
                    os.unlink(tp)
            raise
        self._local_tokens = total_tokens
        # Per-doc unique counts (4 bytes/doc — within the streaming RAM
        # contract): feeds the SVI fixed-bucket capacity planner without
        # another corpus pass.
        self._unique_counts = (
            np.concatenate(uniq_chunks)
            if uniq_chunks
            else np.zeros((0,), np.int32)
        )
        row_offsets = np.zeros((self.num_docs + 1,), dtype=np.int64)
        if offsets:
            np.cumsum(np.concatenate(offsets), out=row_offsets[1:])
        if tmp_f is not None:
            try:
                tmp_f.close()
                tmp_uf.close()
                tmp_cf.close()
                self._publish_rowcache(
                    tmp_paths[0][1], tmp_paths[1][1], tmp_paths[2][1],
                    row_offsets,
                )
            except OSError:
                for _, tp in tmp_paths:
                    try:
                        os.unlink(tp)
                    except OSError:
                        pass

    def _rowcache_dir(self) -> str:
        return (
            f"{self.path}.rowcache.v{_ROWCACHE_VERSION}"
            f".{self._lo}-{self._hi}"
        )

    def _fingerprint(self) -> dict:
        st = os.stat(self.path)
        h = hashlib.sha1()
        for t in self.vocab.types:
            h.update(t.encode("utf-8"))
            h.update(b"\n")
        return {
            "version": _ROWCACHE_VERSION,
            "doc_dat_bytes": st.st_size,
            "doc_dat_mtime_ns": st.st_mtime_ns,
            "lo": self._lo,
            "hi": self._hi,
            "vocab_sha1": h.hexdigest(),
            "vocab_size": len(self.vocab),
        }

    def _publish_rowcache(
        self, ids_tmp: str, uids_tmp: str, ucnts_tmp: str, row_offsets
    ) -> None:
        """Atomic publish: assemble the sidecar in a tmp dir, then one
        os.rename (same discipline as checkpoint writes — a SIGKILL
        mid-write must never leave a half-valid cache)."""
        final = self._rowcache_dir()
        tmp_dir = tempfile.mkdtemp(
            prefix=os.path.basename(final) + ".",
            dir=os.path.dirname(self.path),
        )
        os.replace(ids_tmp, os.path.join(tmp_dir, "ids.bin"))
        os.replace(uids_tmp, os.path.join(tmp_dir, "uids.bin"))
        os.replace(ucnts_tmp, os.path.join(tmp_dir, "ucnts.bin"))
        np.save(os.path.join(tmp_dir, "offsets.npy"), row_offsets)
        uoff = np.zeros((self.num_docs + 1,), dtype=np.int64)
        np.cumsum(self._unique_counts, out=uoff[1:])
        np.save(os.path.join(tmp_dir, "uoffsets.npy"), uoff)
        np.save(os.path.join(tmp_dir, "uniq.npy"), self._unique_counts)
        with open(os.path.join(tmp_dir, "meta.json"), "w") as f:
            json.dump(self._fingerprint(), f)
        try:
            os.rename(tmp_dir, final)
        except OSError:
            # Lost a publish race (or target exists from a parallel
            # process): keep whichever sidecar won.
            import shutil

            shutil.rmtree(tmp_dir, ignore_errors=True)
        self._attach_rowcache(final)

    def _load_rowcache(self) -> bool:
        d = self._rowcache_dir()
        try:
            with open(os.path.join(d, "meta.json")) as f:
                meta = json.load(f)
            if meta != self._fingerprint():
                return False
            self._attach_rowcache(d)
        except (OSError, ValueError, KeyError):
            return False
        self._local_tokens = int(self._row_offsets[-1])
        self._unique_counts = np.load(os.path.join(d, "uniq.npy"))
        return True

    def _attach_rowcache(self, d: str) -> None:
        self._row_offsets = np.load(os.path.join(d, "offsets.npy"))
        n = int(self._row_offsets[-1])
        self._row_ids = np.memmap(
            os.path.join(d, "ids.bin"), dtype=np.int32, mode="r",
            shape=(n,),
        )
        self._uoffsets = np.load(os.path.join(d, "uoffsets.npy"))
        un = int(self._uoffsets[-1])
        self._uids = np.memmap(
            os.path.join(d, "uids.bin"), dtype=np.int32, mode="r",
            shape=(un,),
        )
        self._ucnts = np.memmap(
            os.path.join(d, "ucnts.bin"), dtype=np.float32, mode="r",
            shape=(un,),
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
        """Materialise ONLY the requested documents (local indices):
        token-id rows from the memmapped sidecar when one is attached
        (bit-identical to the parser — the sidecar was written from the
        same parse), else a streamed re-parse of just those lines."""
        if self._row_ids is not None:
            offs = self._row_offsets
            uoffs = self._uoffsets
            docs, uniques = [], []
            for i in doc_indices:
                i = int(i)
                docs.append(
                    np.array(
                        self._row_ids[offs[i]:offs[i + 1]], dtype=np.int32
                    )
                )
                uniques.append((
                    np.array(self._uids[uoffs[i]:uoffs[i + 1]]),
                    np.array(self._ucnts[uoffs[i]:uoffs[i + 1]]),
                ))
            return Corpus(docs, self.vocab, uniques=uniques)
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
