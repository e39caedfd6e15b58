"""Corpus-adaptive ragged bucket geometry (models/layouts.plan_bucket_sizes).

The planner minimises total device slots (rows x width, row-padding and
per-bucket overhead included) — the sweep phase of the ragged E-step
costs the same per padding slot as per real slot, so geometry == slots
(BENCH_SUITE.md, scripts/bucket_geometry_study.py).
"""

import itertools

import numpy as np
import pytest

from pylda_tpu.models.layouts import (
    effective_bucket_sizes,
    plan_bucket_sizes,
)
from pylda_tpu.utils import round_up
from pylda_tpu.utils.config import LDAConfig


def _cost(geom, uniques, row_pad=64, overhead=4096, cap=2048):
    geom = sorted(geom)
    rows = {w: 0 for w in geom}
    mx = geom[-1]
    for u in uniques:
        if u > cap:
            rows[mx] += -(-u // cap)
        else:
            rows[next(w for w in geom if u <= w)] += 1
    return sum(
        round_up(r, row_pad) * w + overhead
        for w, r in rows.items()
        if r > 0 or True
    )


def test_planner_covers_every_document():
    rng = np.random.default_rng(0)
    uniques = np.clip(rng.lognormal(4.0, 1.0, 500).astype(int), 1, 1800)
    geom = plan_bucket_sizes(uniques)
    assert max(geom) >= round_up(int(uniques.max()), 16)
    assert all(w % 16 == 0 for w in geom)
    assert geom == tuple(sorted(set(geom)))


def test_planner_beats_pow2_default_on_skewed_corpus():
    rng = np.random.default_rng(1)
    uniques = np.clip(rng.lognormal(4.5, 0.9, 20000).astype(int), 1, 5000)
    planned = plan_bucket_sizes(uniques)
    pow2 = (64, 128, 256, 512, 1024, 2048)
    assert _cost(planned, uniques) < _cost(pow2, uniques)


def test_planner_matches_brute_force_on_tiny_inputs():
    # Exhaustive check of the DP against all partitions of the aligned
    # candidate widths (n <= 5 distinct widths).
    rng = np.random.default_rng(2)
    for trial in range(5):
        uniques = rng.integers(1, 300, size=40)
        planned = plan_bucket_sizes(
            uniques, max_buckets=4, align=16, row_pad=8,
            bucket_overhead_slots=100,
        )
        cands = sorted({round_up(int(u), 16) for u in uniques})
        n = len(cands)
        best = None
        for b in range(1, min(4, n) + 1):
            # edges = any size-b subset of candidates that includes the max
            for combo in itertools.combinations(cands, b):
                if combo[-1] != cands[-1]:
                    continue
                c = _cost(combo, uniques, row_pad=8, overhead=100,
                          cap=2048)
                if best is None or c < best:
                    best = c
        assert _cost(planned, uniques, row_pad=8, overhead=100) == best


def test_minibatch_aware_plan_minimises_capacity_slots():
    """SVI geometry: the DP must price the per-bucket capacity formula
    (expected minibatch rows + 4 sigma, padded) — per-bucket overshoot
    multiplies across buckets, so the minibatch-optimal geometry is
    coarser than the corpus-optimal one."""
    rng = np.random.default_rng(4)
    uniques = np.clip(rng.normal(135, 18, 16384).astype(int), 30, 400)
    f = 1024 / 16384

    def mb_cost(geom):
        geom = sorted(geom)
        rows = {w: 0 for w in geom}
        for u in uniques:
            rows[next(w for w in geom if u <= w)] += 1
        tot = 0
        for w, r in rows.items():
            e = r * f
            tot += round_up(int(np.ceil(e + 4 * np.sqrt(max(e, 1.0)))),
                            64) * w + 4096
        return tot

    mb_plan = plan_bucket_sizes(uniques, minibatch_fraction=f)
    corpus_plan = plan_bucket_sizes(uniques)
    pow2 = (64, 128, 256, 512, 1024, 2048)
    assert len(mb_plan) <= len(corpus_plan)
    assert mb_cost(mb_plan) <= mb_cost(corpus_plan)
    assert mb_cost(mb_plan) < mb_cost(pow2)


def test_planner_chunks_oversized_docs_at_cap():
    geom = plan_bucket_sizes([5000, 10], cap=2048)
    assert max(geom) == 2048


def test_planner_degenerate_inputs():
    assert plan_bucket_sizes([]) == (16,)
    assert plan_bucket_sizes([0, 0]) == (16,)
    assert plan_bucket_sizes([1]) == (16,)


def test_effective_sizes_policy_and_overrides():
    from pylda_tpu.corpus.synthetic import synthetic_corpus

    corpus, _, _ = synthetic_corpus(
        num_docs=128, num_topics=5, num_types=500,
        mean_doc_length=30.0, seed=0,
    )
    default = LDAConfig.__dataclass_fields__["bucket_sizes"].default

    auto = LDAConfig(number_of_topics=5)
    planned = effective_bucket_sizes(corpus, auto)
    assert planned != default  # tiny docs -> much tighter geometry
    assert max(planned) <= 64
    # plan is cached on the corpus (O(D) walk happens once)
    assert effective_bucket_sizes(corpus, auto) is planned

    fixed = LDAConfig(number_of_topics=5, bucket_policy="fixed")
    assert effective_bucket_sizes(corpus, fixed) == default

    explicit = LDAConfig(number_of_topics=5, bucket_sizes=(32, 512))
    assert effective_bucket_sizes(corpus, explicit) == (32, 512)

    corpus.process_local = True
    assert effective_bucket_sizes(corpus, auto) == default


def test_streaming_corpus_plans_same_geometry_as_in_memory(tmp_path):
    """The streaming index's per-doc unique counts feed the planner, so
    a StreamingCorpus and the equivalent in-RAM Corpus plan IDENTICAL
    geometries (shape parity between the two input paths)."""
    from pylda_tpu.corpus.corpus import Corpus
    from pylda_tpu.corpus.streaming import StreamingCorpus
    from pylda_tpu.corpus.vocabulary import Vocabulary

    rng = np.random.default_rng(9)
    vocab = Vocabulary([f"w{i}" for i in range(300)])
    lines = [
        " ".join(
            f"w{rng.integers(0, 300)}"
            for _ in range(int(rng.lognormal(3.0, 0.7)) + 1)
        )
        for _ in range(200)
    ]
    mem = Corpus.from_lines(lines, vocab)
    path = str(tmp_path / "doc.dat")
    with open(path, "w") as f:
        f.write("\n".join(lines) + "\n")
    stream = StreamingCorpus(path, vocab)

    cfg = LDAConfig(number_of_topics=4)
    g_mem = effective_bucket_sizes(mem, cfg)
    g_stream = effective_bucket_sizes(stream, cfg)
    assert g_mem == g_stream
    default = LDAConfig.__dataclass_fields__["bucket_sizes"].default
    assert g_stream != default  # the planner actually engaged


def test_vb_auto_geometry_matches_fixed_quality():
    """Engine-level gate: the planned geometry is a layout change only —
    held-out perplexity must agree with the fixed pow2 geometry to well
    under the 1% parity budget (trajectories differ slightly because the
    per-bucket while_loop exit couples docs within a bucket)."""
    import jax

    from pylda_tpu.corpus.synthetic import synthetic_corpus
    from pylda_tpu.models import VariationalBayes

    corpus, _, _ = synthetic_corpus(
        num_docs=256, num_topics=8, num_types=300,
        mean_doc_length=40.0, seed=3,
    )
    test_corpus = corpus.subset(range(200, 256))
    train = corpus.subset(range(200))

    def run(**kw):
        cfg = LDAConfig(
            number_of_topics=8, inference_mode="vb", seed=0,
            inner_iterations=30, dense_vocab_threshold=8,  # force ragged
            **kw,
        )
        eng = VariationalBayes(cfg)
        eng.initialize(train)
        eng.learning_many(8)
        return eng.perplexity(test_corpus)

    p_fixed = run(bucket_policy="fixed")
    p_auto = run(bucket_policy="auto")
    assert p_auto == pytest.approx(p_fixed, rel=5e-3)


def test_sampling_auto_geometry_conserves_counts():
    """Sequence-layout planner: count-table invariants (SURVEY.md section 4
    item 2) hold under a planned geometry, including blockwise-chunked
    oversized docs, and held-out inference still runs."""
    import numpy as np

    from pylda_tpu.corpus.synthetic import synthetic_corpus
    from pylda_tpu.models import MonteCarlo
    from pylda_tpu.models.layouts import effective_sequence_bucket_sizes

    corpus, _, _ = synthetic_corpus(
        num_docs=96, num_topics=4, num_types=60,
        mean_doc_length=35.0, seed=7,
    )
    cfg = LDAConfig(
        number_of_topics=4, inference_mode="gibbs", seed=0,
        bucket_sizes=(64, 128, 256, 512, 1024, 2048),  # default
    )
    geom = effective_sequence_bucket_sizes(corpus, cfg)
    assert geom != tuple(cfg.bucket_sizes)  # planner engaged
    eng = MonteCarlo(cfg)
    eng.initialize(corpus)
    eng.learning()
    nkv = np.asarray(eng._n_kv)
    assert int(nkv.sum()) == corpus.num_tokens
    ndk_total = sum(int(np.asarray(n).sum()) for n in eng._ndk)
    assert ndk_total == corpus.num_tokens
    ll, gamma = eng.inference(corpus.subset(range(80, 96)))
    assert np.isfinite(ll)
    assert gamma.shape[0] == 16


def test_svi_capacities_from_expected_drop_promote_and_determinism():
    """The shared capacity formula behind both the single-process SVI
    geometry plan and the multi-host negotiation
    (mesh.negotiate_svi_ragged_geometry): buckets with expected rows
    below pad/2 drop and their mass promotes upward; the top size with
    mass is always kept; identical inputs give identical outputs (the
    cross-host agreement contract)."""
    from pylda_tpu.models.layouts import svi_capacities_from_expected

    sizes = [32, 64, 128, 256]
    # 64 has negligible mass -> drops, promotes into 128; 256 is empty
    # and above the top size with mass -> excluded entirely.
    expected = {32: 40.0, 64: 1.0, 128: 10.0, 256: 0.0}
    caps = svi_capacities_from_expected(sizes, expected, pad=16)
    assert set(caps) == {32, 128}
    # Capacity covers e + 4*sqrt(e), rounded to pad.
    assert caps[32] >= 40 + 4 * (40 ** 0.5)
    assert caps[32] % 16 == 0
    # The promoted mass (1.0) rides into the 128 bucket's expectation.
    assert caps[128] >= 11 + 4 * (11 ** 0.5) - 16
    # Determinism: same inputs, same plan (dict equality).
    assert caps == svi_capacities_from_expected(sizes, expected, pad=16)


def test_aligned_width_histogram_contract():
    """Fixed-length vector over aligned widths; oversized docs chunk
    into the last bin (one row per cap-sized chunk)."""
    import numpy as np

    from pylda_tpu.models.layouts import aligned_width_histogram

    uc = np.asarray([1, 16, 17, 250, 300])  # cap=128: 300 -> 3 chunks
    h = aligned_width_histogram(uc, align=16, cap=128)
    assert h.shape == (8,)
    assert h[0] == 2  # widths 1, 16
    assert h[1] == 1  # width 17 -> 32 bin
    assert h[-1] == 2 + 3  # 250 -> 2 chunks, 300 -> 3 chunks
    assert h.sum() == 2 + 1 + 5
