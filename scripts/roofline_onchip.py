#!/usr/bin/env python
"""On-chip roofline validation (flagship shape).

VERDICT r2 weak item 7: the roofline constants were asserted, never
cross-checked against measured phase times on the real chip.  This
script trains the flagship engine a few fused passes (realistic sweep
counts), then prints ``utils.roofline.roofline_report`` — measured
per-phase ms next to the analytic bound and the achieved fraction —
plus the pass-level bound behind bench.py's ``mfu`` field.

Usage: roofline_onchip.py [K] [V] [D]
"""

import sys

import jax

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)

from pylda_tpu.corpus.synthetic import synthetic_corpus
from pylda_tpu.models import VariationalBayes
from pylda_tpu.utils.config import LDAConfig
from pylda_tpu.utils.roofline import pass_bound_ms, roofline_report

K = int(sys.argv[1]) if len(sys.argv) > 1 else 100
V = int(sys.argv[2]) if len(sys.argv) > 2 else 10_000
D = int(sys.argv[3]) if len(sys.argv) > 3 else 4096

corpus, _, _ = synthetic_corpus(
    num_docs=D, num_topics=min(K, 100), num_types=V,
    mean_doc_length=120.0, seed=0,
)
eng = VariationalBayes(LDAConfig(number_of_topics=K, seed=0))
eng.initialize(corpus)
eng.learning_many(16)  # move to steady-state sweep counts

rep = roofline_report(eng)
for phase, row in rep.items():
    print(f"{phase}: {row}", flush=True)
print(f"pass_bound_ms: {pass_bound_ms(eng):.3f}", flush=True)
