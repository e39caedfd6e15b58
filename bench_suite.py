#!/usr/bin/env python
"""Benchmark suite: the five BASELINE.md evaluation configs.

The real corpora (NIPS, 20-Newsgroups, Wikipedia-100k) are not
downloadable in this environment (SURVEY.md section 7.3), so each config
runs on a synthetic corpus of matching shape (documents, vocabulary,
length distribution, topic count).  Config 1 uses the real bundled corpus
and additionally gates on perplexity parity with the float64 oracle.

Usage:
    python bench_suite.py             # all configs
    python bench_suite.py --config 3  # one config
Prints one JSON line per config.

(The driver-facing headline benchmark stays in bench.py.)
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

import numpy as np


def _engine(cfg_kwargs, corpus, vocab=None, mesh=None):
    from pylda_tpu.models import make_engine
    from pylda_tpu.utils.config import LDAConfig

    eng = make_engine(LDAConfig(**cfg_kwargs))
    eng.initialize(corpus, vocab, mesh=mesh)
    return eng


def _throughput(eng, corpus, iters, repeats=3):
    eng.learning_many(iters)  # compile + warm at the measured scan length
    dt = float("inf")  # best-of-N: occasional multi-x device hiccups
    for _ in range(repeats):
        t0 = time.time()
        objs = eng.learning_many(iters)
        dt = min(dt, (time.time() - t0) / iters)
    return corpus.num_docs / dt, objs[-1], dt


def _mfu(eng, seconds):
    """Roofline utilisation for the row (never sink a bench row)."""
    try:
        from pylda_tpu.utils.roofline import suite_mfu

        return suite_mfu(eng, seconds)
    except Exception:
        return None


def _epoch_time(eng, repeats=3, epochs=4):
    """Per-epoch time on the PRODUCTION path: the CLI trains via
    learning_many, which on the SVI device-rows path fuses multiple
    epochs into one dispatch (round 3) — so that is what gets timed."""
    eng.learning_many(epochs)  # compile + warm at the measured length
    dt, ests = float("inf"), [0.0]
    for _ in range(repeats):
        t0 = time.time()
        ests = eng.learning_many(epochs)
        dt = min(dt, (time.time() - t0) / epochs)
    return dt, ests[-1]


def config1(restarts: int = 5, iters: int = 60):
    """Batch VB, K=10, bundled corpus; perplexity parity vs f64 oracle.

    Parity protocol (unconditional): best-of-N restarts from INDEPENDENT
    random inits on both the engine and the oracle, gating on the
    best-bound runs — the non-convex bound has init-dependent local
    optima, and best-of-N compares the algorithms rather than the luck
    of one draw.  (The same-lambda-init gap is reported too: it isolates
    pure arithmetic agreement.)
    """
    from pylda_tpu.corpus.datasets import bundled_corpus_dir, load_input_directory
    from pylda_tpu.oracle import OracleVB

    train, test, vocab = load_input_directory(bundled_corpus_dir())
    engine_pps, oracle_pps = [], []
    eng = None
    for s in range(restarts):
        eng = _engine(
            dict(number_of_topics=10, inference_mode="vb", seed=s),
            train, vocab,
        )
        eng.learning_many(iters)
        engine_pps.append(eng.perplexity(test))
        ora = OracleVB(
            train, num_topics=10, alpha=0.1, eta=1.0 / len(vocab), seed=s
        )
        for _ in range(iters):
            ora.learning()
        oracle_pps.append(ora.perplexity(test))
    pe, po = min(engine_pps), min(oracle_pps)

    # Same-lambda-init arithmetic-parity check (secondary).
    ora = OracleVB(train, num_topics=10, alpha=0.1, eta=1.0 / len(vocab),
                   seed=0, gamma_init="ones")
    lam0 = ora.lam.copy()
    eng_si = _engine(
        dict(number_of_topics=10, inference_mode="vb", seed=0,
             gamma_init="ones"),
        train, vocab,
    )
    eng_si.initialize(train, vocab, lam_init=lam0)
    docs_sec, elbo, dt = _throughput(eng_si, train, 16)
    eng_si.learning_many(30)
    pe_si = eng_si.perplexity(test)
    for _ in range(62):
        ora.learning()
    po_si = ora.perplexity(test)
    return {
        "config": "1: batch VB K=10 bundled corpus",
        "docs_per_sec": round(docs_sec, 1),
        "docs_per_sec_note": "dispatch_bound_unstable (tiny corpus; the "
                             "load-bearing content of this row is the "
                             "parity gate)",
        "mfu": _mfu(eng_si, dt),
        "final_elbo": round(elbo, 1),
        "perplexity": round(pe, 3),
        "oracle_perplexity": round(po, 3),
        "perplexity_gap": round((pe - po) / po, 5),
        # Parity = not WORSE than the reference math by >1% (a better
        # best-of-N basin is a win, not a parity failure).
        "parity_within_1pct": bool(pe <= po * 1.01),
        "parity_protocol": f"best-of-{restarts} independent restarts, "
                           "gate: engine best <= oracle best * 1.01",
        "engine_restart_pps": [round(p, 3) for p in engine_pps],
        "oracle_restart_pps": [round(p, 3) for p in oracle_pps],
        "same_init_gap": round(abs(pe_si - po_si) / po_si, 5),
    }


def config2():
    """Batch VB + alpha/eta hyperopt, K=50, NIPS-shaped corpus."""
    from pylda_tpu.corpus.synthetic import synthetic_corpus

    corpus, _, _ = synthetic_corpus(
        num_docs=1536, num_topics=50, num_types=12_000,
        mean_doc_length=900.0, seed=1,
    )
    eng = _engine(
        dict(number_of_topics=50, inference_mode="vb",
             hyper_parameter_optimize_interval=5, seed=0),
        corpus,
    )
    docs_sec, elbo, dt = _throughput(eng, corpus, 10)
    alpha = np.asarray(eng.state.alpha)
    return {
        "config": "2: batch VB K=50 NIPS-shaped + hyperopt",
        "docs_per_sec": round(docs_sec, 1),
        "mfu": _mfu(eng, dt),
        "final_elbo": round(elbo, 1),
        "alpha_minmax": [round(float(alpha.min()), 5),
                         round(float(alpha.max()), 5)],
    }


def config3():
    """Collapsed Gibbs + hybrid, K=100, 20-Newsgroups-shaped corpus.

    Quality protocol (round-3 verdict item 2): scored on a TRUE
    held-out draw from the SAME planted beta (the
    scripts/sampling_quality_study.py pattern — the old
    ``corpus.subset(range(256))`` was 256 TRAINING documents, so any
    movement confounded memorization), and cross-engine comparisons use
    the convention-neutral point-estimate metric next to each engine's
    native one (the VB family's native score is an E[log beta] lower
    bound, Jensen-penalised per low-count word; Gibbs scores with point
    estimates — the study resolved the apparent 3x hybrid "gap" as
    exactly this).  Gate: hybrid point-estimate ppl <= 1.1x Gibbs."""
    from pylda_tpu.corpus.synthetic import synthetic_corpus

    corpus, beta_true, _ = synthetic_corpus(
        num_docs=4096, num_topics=100, num_types=30_000,
        mean_doc_length=120.0, seed=2,
    )
    test, _, _ = synthetic_corpus(
        num_docs=512, num_topics=100, num_types=30_000,
        mean_doc_length=120.0, seed=102, beta=beta_true,
    )
    out = {"config": "3: Gibbs/hybrid K=100 20news-shaped"}
    for mode in ("gibbs", "hybrid"):
        eng = _engine(
            dict(number_of_topics=100, inference_mode=mode, seed=0,
                 number_of_samples=5, burn_in_sweeps=3),
            corpus,
        )
        # 16 fused iterations per timed dispatch: at 4 the ~30 ms
        # tunnel dispatch tax inflated the per-sweep cost ~2x (round-5
        # device trace: the gibbs sweep is 7.1 ms busy with span ==
        # busy, while iters=4 wall said 13.9 ms — and the "r3 -> r4
        # regression" 307k -> 295k was this tax's run-to-run noise).
        docs_sec, obj, dt = _throughput(eng, corpus, 16)
        eng.learning_many(40)  # train to a meaningful state before eval
        out[f"{mode}_docs_per_sec"] = round(docs_sec, 1)
        out[f"{mode}_mfu"] = _mfu(eng, dt)
        out[f"{mode}_objective"] = round(obj, 1)
        out[f"{mode}_heldout_ppl_native"] = round(eng.perplexity(test), 2)
        out[f"{mode}_heldout_point_ppl"] = round(
            eng.point_estimate_perplexity(test), 2
        )
    out["hybrid_point_ppl_within_1p1x_gibbs"] = bool(
        out["hybrid_heldout_point_ppl"]
        <= 1.1 * out["gibbs_heldout_point_ppl"]
    )
    return out


def config4():
    """Stochastic VI, K=200, Wikipedia-100k-shaped stream, single host."""
    from pylda_tpu.corpus.synthetic import synthetic_corpus

    corpus, beta_true, _ = synthetic_corpus(
        num_docs=16_384, num_topics=200, num_types=50_000,
        mean_doc_length=150.0, seed=3,
    )
    test, _, _ = synthetic_corpus(
        num_docs=512, num_topics=200, num_types=50_000,
        mean_doc_length=150.0, seed=103, beta=beta_true,
    )
    eng = _engine(
        dict(number_of_topics=200, inference_mode="svi", batch_size=1024,
             tau0=64.0, kappa=0.7, seed=0),
        corpus,
    )
    dt, est = _epoch_time(eng)
    return {
        "config": "4: SVI K=200 V=50k wiki-shaped",
        "docs_per_sec": round(corpus.num_docs / dt, 1),
        "mfu": _mfu(eng, dt),
        "epoch_seconds": round(dt, 2),
        "elbo_estimate": round(est, 1),
        # ~16 epochs of training by this point (warm + timed runs).
        "heldout_ppl_native": round(eng.perplexity(test), 2),
        "heldout_point_ppl": round(eng.point_estimate_perplexity(test), 2),
    }


def config5():
    """Doc-sharded SVI, K=1000, V=100k: the multi-host HBM-pressure
    config.  Real pod slices are unavailable here; this measures the
    single-chip step at full state size (lambda is K x V = 400 MB) and
    the multi-chip path is validated by __graft_entry__.dryrun_multichip
    + tests/test_sharding.py on a simulated mesh."""
    from pylda_tpu.corpus.synthetic import synthetic_corpus

    corpus, beta_true, _ = synthetic_corpus(
        num_docs=8_192, num_topics=1000, num_types=100_000,
        mean_doc_length=150.0, seed=4,
    )
    test, _, _ = synthetic_corpus(
        num_docs=256, num_topics=1000, num_types=100_000,
        mean_doc_length=150.0, seed=104, beta=beta_true,
    )
    eng = _engine(
        dict(number_of_topics=1000, inference_mode="svi", batch_size=2048,
             tau0=64.0, kappa=0.7, seed=0, inner_iterations=30),
        corpus,
    )
    dt, est = _epoch_time(eng)
    return {
        "config": "5: SVI K=1000 V=100k (single-chip; sharding via dryrun)",
        "docs_per_sec": round(corpus.num_docs / dt, 1),
        "mfu": _mfu(eng, dt),
        "epoch_seconds": round(dt, 2),
        "elbo_estimate": round(est, 1),
        "heldout_ppl_native": round(eng.perplexity(test), 2),
        "heldout_point_ppl": round(eng.point_estimate_perplexity(test), 2),
        "lambda_bytes": 1000 * 100_000 * 4,
    }


CONFIGS = {1: config1, 2: config2, 3: config3, 4: config4, 5: config5}


def main() -> int:
    os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jax_bench_cache")
    import jax

    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)

    ap = argparse.ArgumentParser()
    ap.add_argument("--config", type=int, default=0, help="1-5; 0 = all")
    args = ap.parse_args()
    which = [args.config] if args.config else sorted(CONFIGS)
    for c in which:
        t0 = time.time()
        try:
            res = CONFIGS[c]()
            res["bench_wall_seconds"] = round(time.time() - t0, 1)
        except Exception as e:  # keep the suite going
            res = {"config": str(c), "error": f"{type(e).__name__}: {e}"}
        print(json.dumps(res), flush=True)
    return 0


if __name__ == "__main__":
    sys.exit(main())
