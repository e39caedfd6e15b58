#!/usr/bin/env python
"""Disk-backed vs in-RAM SVI epoch at the wiki shape (VERDICT item 5).

Round 4: disk-backed epoch 0.549 s (sidecar) vs 0.17 s in-RAM
device-rows — the residual was host bucket packing + ~50 MB/epoch
upload of static rows.  Round 5 routes under-budget streaming corpora
onto the device-rows path (rows uploaded once at init, epochs ship only
indices); this measures both sides end to end, including a cold-start
with the row sidecar present.

Usage: python scripts/streaming_epoch_bench.py [--docs 16384 ...]
"""

import argparse
import json
import os
import sys
import tempfile
import time

import jax

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pylda_tpu.corpus.streaming import StreamingCorpus  # noqa: E402
from pylda_tpu.corpus.synthetic import synthetic_corpus  # noqa: E402
from pylda_tpu.models import make_engine  # noqa: E402
from pylda_tpu.utils.config import LDAConfig  # noqa: E402


def time_epochs(eng, epochs=4, repeats=3):
    eng.learning_many(epochs)
    dt = float("inf")
    for _ in range(repeats):
        t0 = time.time()
        eng.learning_many(epochs)
        dt = min(dt, (time.time() - t0) / epochs)
    return dt


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--docs", type=int, default=16_384)
    ap.add_argument("--topics", type=int, default=200)
    ap.add_argument("--types", type=int, default=50_000)
    ap.add_argument("--mean_len", type=float, default=150.0)
    ap.add_argument("--batch", type=int, default=1024)
    ap.add_argument("--epochs", type=int, default=4)
    ap.add_argument("--force_host", action="store_true",
                    help="budget=0: measure the host-repack regime too")
    args = ap.parse_args()

    corpus, _, _ = synthetic_corpus(
        num_docs=args.docs, num_topics=args.topics, num_types=args.types,
        mean_doc_length=args.mean_len, seed=3,
    )
    d = tempfile.mkdtemp(prefix="stream_bench_", dir="/tmp")
    path = os.path.join(d, "doc.dat")
    with open(path, "w") as f:
        for doc in corpus.docs:
            f.write(" ".join(corpus.vocab[int(t)] for t in doc) + "\n")

    def build(corp, **cfg_kw):
        cfg = LDAConfig(
            number_of_topics=args.topics, inference_mode="svi",
            batch_size=args.batch, tau0=64.0, kappa=0.7, seed=0, **cfg_kw,
        )
        eng = make_engine(cfg)
        t0 = time.time()
        eng.initialize(corp, corpus.vocab)
        return eng, time.time() - t0

    out = {}
    eng, t_init = build(corpus)
    out["ram_device_rows"] = {
        "epoch_s": round(time_epochs(eng, args.epochs), 4),
        "init_s": round(t_init, 2),
        "path": "device" if eng._device_rows is not None else "host",
    }
    del eng

    s = StreamingCorpus(path, corpus.vocab)
    eng, t_init = build(s)
    out["stream"] = {
        "epoch_s": round(time_epochs(eng, args.epochs), 4),
        "init_s": round(t_init, 2),
        "path": "device" if eng._device_rows is not None else "host",
    }
    del eng

    # warm-sidecar reopen (the production restart case)
    s2 = StreamingCorpus(path, corpus.vocab)
    eng, t_init = build(s2)
    out["stream_warm_sidecar"] = {
        "epoch_s": round(time_epochs(eng, args.epochs), 4),
        "init_s": round(t_init, 2),
        "path": "device" if eng._device_rows is not None else "host",
    }
    del eng

    if args.force_host:
        s3 = StreamingCorpus(path, corpus.vocab)
        eng, t_init = build(s3, svi_device_rows_budget_mb=0)
        out["stream_host_repack"] = {
            "epoch_s": round(time_epochs(eng, args.epochs), 4),
            "init_s": round(t_init, 2),
            "path": "host",
        }
    out["ratio_stream_vs_ram"] = round(
        out["stream"]["epoch_s"] / out["ram_device_rows"]["epoch_s"], 3
    )
    print(json.dumps(out))


if __name__ == "__main__":
    main()
