#!/usr/bin/env python
"""Engine quality at convergence, at SHIPPING defaults (verdict item 7).

Refreshes BENCH_SUITE.md's round-1-vintage K=10 table: bundled corpus,
every engine at today's defaults (stall-aware E-step exit, B=8 block
sampling, K-adaptive sampler, pallas sstats on TPU), scored on the true
held-out split with BOTH conventions — the engine's native perplexity
and the convention-neutral point-estimate metric
(``Inferencer.point_estimate_perplexity``) that makes VB-family and
Gibbs-family numbers comparable (scripts/sampling_quality_study.py).
"""

import json

import jax

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)

from pylda_tpu.corpus.datasets import bundled_corpus_dir, load_input_directory
from pylda_tpu.models import make_engine
from pylda_tpu.oracle import OracleVB
from pylda_tpu.utils.config import LDAConfig

train, test, vocab = load_input_directory(bundled_corpus_dir())

SETUPS = {
    "vb": dict(inference_mode="vb", iters=80),
    "svi": dict(inference_mode="svi", batch_size=128, iters=80),
    "gibbs": dict(inference_mode="gibbs", iters=200),
    "hybrid": dict(inference_mode="hybrid", iters=80),
}

rows = []
ora = OracleVB(
    train, num_topics=10, alpha=0.1, eta=1.0 / len(vocab), seed=0
)
for _ in range(80):
    ora.learning()
rows.append({
    "engine": "oracle (f64 NumPy, reference math)",
    "native_ppl": round(ora.perplexity(test), 2),
    "point_ppl": None,
    "iters": 80,
})
for name, setup in SETUPS.items():
    setup = dict(setup)
    iters = setup.pop("iters")
    eng = make_engine(LDAConfig(number_of_topics=10, seed=0, **setup))
    eng.initialize(train, vocab)
    eng.learning_many(iters)
    rows.append({
        "engine": name,
        "native_ppl": round(eng.perplexity(test), 2),
        "point_ppl": round(eng.point_estimate_perplexity(test), 2),
        "iters": iters,
    })
for r in rows:
    print(json.dumps(r), flush=True)
