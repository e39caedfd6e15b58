"""Roofline cost model (SURVEY.md section 5 occupancy reporting)."""

import numpy as np

from pylda_tpu.corpus.synthetic import synthetic_corpus
from pylda_tpu.models import VariationalBayes
from pylda_tpu.utils.config import LDAConfig
from pylda_tpu.utils.roofline import (
    ChipPeaks,
    estep_cost_model,
    utilisation,
)


def _engine(**kw):
    corpus, _, _ = synthetic_corpus(
        num_docs=256, num_topics=8, num_types=600,
        mean_doc_length=40.0, seed=0,
    )
    kw.setdefault("dense_vocab_threshold", 8)
    cfg = LDAConfig(number_of_topics=8, inference_mode="vb", seed=0, **kw)
    eng = VariationalBayes(cfg)
    eng.initialize(corpus)
    return eng


def test_cost_model_phases_and_consistency():
    eng = _engine()
    model = estep_cost_model(eng)
    assert set(model) >= {"sweeps_per_sweep", "sstats", "elog_beta"}
    sw = model["sweeps_per_sweep"]
    # analytic cross-check: 2 contractions x 2 flops/MAC x slots x K
    slots = sum(b.ids.shape[0] * b.ids.shape[1] for b in eng._batches)
    assert sw["flops"] == 4 * slots * 8
    assert sw["bound_ms"] > 0 and sw["bound"] in ("mxu", "hbm")
    # sstats flops cover every padded chunk row against the full vocab
    ss = model["sstats"]
    rows = sum(c.counts.shape[0] for c in eng._sstats_plan["chunks"])
    assert ss["flops"] == 4 * rows * 600 * 8
    assert ss["docs"] == 256


def test_pallas_kernel_drops_phinorm_traffic():
    xla = estep_cost_model(_engine(sstats_kernel="xla"))["sstats"]
    pk = estep_cost_model(_engine(sstats_kernel="pallas"))["sstats"]
    assert pk["hbm_bytes"] < xla["hbm_bytes"]
    assert pk["flops"] == xla["flops"]


def test_ragged_sweep_is_vpu_bound_and_dtype_invariant():
    """The ragged fixed point is batched per-doc matvecs: VPU-bound,
    and bf16 buys nothing (measured: bf16 sweeps showed no gain —
    BENCH_SUITE.md), so the model must be dtype-invariant there."""
    f32 = estep_cost_model(_engine())["sweeps_per_sweep"]
    bf16 = estep_cost_model(
        _engine(compute_dtype="bfloat16")
    )["sweeps_per_sweep"]
    assert f32["bound"] in ("vpu", "hbm")
    assert bf16["bound_ms"] == f32["bound_ms"]
    assert bf16["flops"] == f32["flops"]


def test_dense_sweep_bf16_halves_traffic_and_doubles_mxu():
    """Dense layout sweeps ARE MXU matmuls: bf16 halves the streamed
    counts bytes and doubles the flops ceiling."""
    f32 = estep_cost_model(
        _engine(dense_vocab_threshold=4096)
    )["sweeps_per_sweep"]
    bf16 = estep_cost_model(
        _engine(dense_vocab_threshold=4096, compute_dtype="bfloat16")
    )["sweeps_per_sweep"]
    assert bf16["hbm_bytes"] == f32["hbm_bytes"] // 2
    assert bf16["flops"] == f32["flops"]


def test_measured_report_shape():
    """roofline_report pairs measured phase times with bounds and a
    clamped utilisation; sweep counts reflect convergence (<= cap)."""
    from pylda_tpu.utils.roofline import (
        measured_sweep_counts,
        pass_bound_ms,
        roofline_report,
    )

    eng = _engine()
    eng.learning_many(3)  # move toward convergence so counts drop
    counts = measured_sweep_counts(eng)
    assert len(counts) == len(eng._batches)
    assert all(1 <= c <= eng.config.inner_iterations for c in counts)
    bound = pass_bound_ms(eng)
    assert bound > 0
    rep = roofline_report(eng, repeats=1)
    assert rep["sweep_counts"] == counts or len(rep["sweep_counts"]) == len(
        counts
    )
    assert {"sweeps", "estep_full", "iteration"} <= set(rep)
    for phase in ("sweeps", "estep_full", "iteration"):
        row = rep[phase]
        assert set(row) == {"measured_ms", "bound_ms", "utilisation"}
        assert 0.0 <= row["utilisation"] <= 1.0
        assert row["bound_ms"] > 0 and row["measured_ms"] > 0


def test_utilisation_bounds():
    assert utilisation(2.0, 1.0) == 0.5
    assert utilisation(0.5, 1.0) == 1.0  # clamped at speed of light
    assert utilisation(0.0, 1.0) == 0.0
    assert np.isclose(
        utilisation(4.0, ChipPeaks().hbm_bytes * 0 + 1.0), 0.25
    )


def test_hybrid_sequence_layout_report():
    """The sampling engines' sequence layout has its own cost model
    (sampled local step; fixed burn_in+samples sweep counts) — the
    report must work rather than AttributeError on SequenceBucket."""
    from pylda_tpu.corpus.synthetic import synthetic_corpus
    from pylda_tpu.models import Hybrid
    from pylda_tpu.utils.roofline import (
        measured_sweep_counts,
        pass_bound_ms,
        roofline_report,
    )

    corpus, _, _ = synthetic_corpus(
        num_docs=64, num_topics=8, num_types=300, mean_doc_length=30,
        seed=0,
    )
    eng = Hybrid(LDAConfig(
        number_of_topics=8, inference_mode="hybrid", seed=0,
        bucket_sizes=(32, 64), number_of_samples=3, burn_in_sweeps=2,
    ))
    eng.initialize(corpus)
    counts = measured_sweep_counts(eng)
    assert counts == [5] * len(eng._batches)  # burn_in + samples, fixed
    model = estep_cost_model(eng)
    assert "sweeps_per_sweep" in model and model["sweeps_per_sweep"][
        "bound_ms"
    ] > 0
    assert pass_bound_ms(eng) > 0
    rep = roofline_report(eng, repeats=1)
    assert "iteration" in rep
    assert 0.0 <= rep["iteration"]["utilisation"] <= 1.0


def test_gibbs_bound_includes_dominant_phases():
    """The gibbs suite bound must price ALL phases of one learning()
    dispatch — the round-4 verdict flagged that omitting the n_kv
    rebuild (63% of the traced sweep) made mfu 0.011 meaningless."""
    from pylda_tpu.models import make_engine
    from pylda_tpu.utils.roofline import (
        ChipPeaks,
        gibbs_learning_phase_bounds,
        rebuild_bound_ms,
    )

    corpus, _, _ = synthetic_corpus(
        num_docs=96, num_topics=6, num_types=5000, mean_doc_length=25,
        seed=0,
    )
    eng = make_engine(LDAConfig(
        number_of_topics=6, inference_mode="gibbs", seed=0,
    ))
    eng.initialize(corpus)
    peaks = ChipPeaks()
    phases = gibbs_learning_phase_bounds(eng, peaks)
    assert set(phases) == {
        "sampling", "rebuild", "factor_refresh", "joint_ll"
    }
    assert all(v > 0 for v in phases.values()), phases
    # The rebuild floor: at least the [K, V] table write.
    assert phases["rebuild"] >= rebuild_bound_ms(0, 6, 5000, peaks)
    # The full bound strictly exceeds the sampling-only round-4 bound.
    assert sum(phases.values()) > phases["sampling"]


def test_svi_bound_includes_dominant_phases():
    """The SVI epoch bound must include sstats, the natural-gradient
    lambda step, the per-minibatch factor refresh, and beta_elbo — the
    round-4 bound was sweeps-only while these phases dominate the
    config-5 epoch."""
    from pylda_tpu.models import make_engine
    from pylda_tpu.utils.roofline import (
        ChipPeaks,
        _svi_epoch_bound_ms,
        svi_epoch_phase_bounds,
    )

    corpus, _, _ = synthetic_corpus(
        num_docs=96, num_topics=6, num_types=5000, mean_doc_length=25,
        seed=0,
    )
    eng = make_engine(LDAConfig(
        number_of_topics=6, inference_mode="svi", batch_size=32, seed=0,
    ))
    eng.initialize(corpus)
    peaks = ChipPeaks()
    phases = svi_epoch_phase_bounds(eng, peaks)
    assert {"sstats", "natural_gradient", "elog_beta", "beta_elbo"} <= set(
        phases
    )
    assert all(v > 0 for v in phases.values()), phases
    # 3 minibatches of 32 over 96 docs: the lambda-step traffic bound is
    # n_mb * 3 * K * V * 4 bytes exactly.
    expect = 3 * 3 * 6 * 5000 * 4 / peaks.hbm_bytes * 1e3
    assert abs(phases["natural_gradient"] - expect) / expect < 1e-6
    # The full epoch bound includes every phase on top of the sweeps.
    assert _svi_epoch_bound_ms(eng, peaks) > sum(phases.values())


def test_hybrid_bound_includes_kept_sweep_rebuilds():
    """pass_bound_ms on the hybrid sequence layout must include the
    per-kept-sweep [K, V] count accumulation (round-4 verdict item 3)."""
    from pylda_tpu.models import Hybrid
    from pylda_tpu.utils.roofline import (
        ChipPeaks,
        _batch_sweep_bound_ms,
        measured_sweep_counts,
        pass_bound_ms,
    )

    corpus, _, _ = synthetic_corpus(
        num_docs=64, num_topics=8, num_types=300, mean_doc_length=30,
        seed=0,
    )
    eng = Hybrid(LDAConfig(
        number_of_topics=8, inference_mode="hybrid", seed=0,
        bucket_sizes=(32, 64), number_of_samples=3, burn_in_sweeps=2,
    ))
    eng.initialize(corpus)
    peaks = ChipPeaks()
    sweeps_only = sum(
        _batch_sweep_bound_ms(b, eng._config, peaks) * s
        for b, s in zip(eng._batches, measured_sweep_counts(eng))
    )
    assert pass_bound_ms(eng, peaks) > sweeps_only


def test_suite_mfu_all_engine_kinds():
    """bench_suite's per-row mfu (round-3 verdict item 4): every engine
    kind produces a finite utilisation in (0, 1] from one measured
    duration — vb/hybrid via pass_bound_ms, gibbs via the one-sweep
    sequence bound, svi via the epoch bound over its minibatch lists."""
    from pylda_tpu.models import make_engine
    from pylda_tpu.utils.roofline import suite_mfu

    corpus, _, _ = synthetic_corpus(
        num_docs=96, num_topics=6, num_types=5000, mean_doc_length=25,
        seed=0,
    )
    for mode in ("vb", "svi", "gibbs", "hybrid"):
        eng = make_engine(LDAConfig(
            number_of_topics=6, inference_mode=mode, seed=0,
            batch_size=32, number_of_samples=2, burn_in_sweeps=1,
            inner_iterations=10,
        ))
        eng.initialize(corpus)
        eng.learning_many(2)
        mfu = suite_mfu(eng, measured_seconds=1e-4)
        assert mfu is not None and 0.0 < mfu <= 1.0, (mode, mfu)
