"""Stochastic VI engine (SURVEY.md section 8.4)."""

import numpy as np
import pytest

from pylda_tpu.corpus import synthetic_corpus
from pylda_tpu.models import StochasticVariationalBayes, VariationalBayes
from pylda_tpu.utils.config import LDAConfig


@pytest.fixture(scope="module")
def corpus():
    c, _, _ = synthetic_corpus(
        num_docs=200, num_topics=5, num_types=150, mean_doc_length=40, seed=4
    )
    return c


def _cfg(mode, **kw):
    base = dict(
        number_of_topics=5,
        inference_mode=mode,
        alpha_alpha=0.2,
        alpha_beta=0.02,
        inner_iterations=30,
        doc_pad_multiple=8,
        batch_size=64,
        tau0=16.0,
        kappa=0.7,
        seed=0,
    )
    base.update(kw)
    return LDAConfig(**base)


def test_svi_rho_schedule():
    cfg = _cfg("svi")
    eng = StochasticVariationalBayes(cfg)
    # rho_t = (tau0 + t)^-kappa decays and satisfies Robbins-Monro.
    rhos = [(cfg.tau0 + t) ** (-cfg.kappa) for t in range(100)]
    assert all(a > b for a, b in zip(rhos, rhos[1:]))
    assert rhos[0] < 1.0
    del eng


def test_svi_approaches_batch_vb(corpus):
    test = corpus.subset(range(20))
    vb = VariationalBayes(_cfg("vb"))
    vb.initialize(corpus)
    svi = StochasticVariationalBayes(_cfg("svi"))
    svi.initialize(corpus)
    for _ in range(10):
        vb.learning()
    for _ in range(10):
        svi.learning()
    pv, ps = vb.perplexity(test), svi.perplexity(test)
    # SVI after 10 epochs should be within 15% of batch VB.
    assert ps < pv * 1.15, (pv, ps)


def test_svi_kappa_validation():
    with pytest.raises(ValueError):
        _cfg("svi", kappa=0.4).validate()


def test_svi_minibatch_counter_advances(corpus):
    svi = StochasticVariationalBayes(_cfg("svi", batch_size=64))
    svi.initialize(corpus)
    svi.learning()
    # 200 docs / 64 per batch → 4 minibatches (last partial, padded).
    assert svi._t == 4
    svi.learning()
    assert svi._t == 8


def _write_text_corpus(corpus, path):
    with open(path, "w") as f:
        for d in corpus.docs:
            f.write(" ".join(f"w{t}" for t in d) + "\n")


def test_svi_fixed_geometry_shape_stable_and_equivalent(corpus):
    """Ragged SVI minibatches use a corpus-derived fixed bucket geometry
    (models/layouts.plan_svi_ragged_geometry) so every random minibatch
    compiles ONCE: shapes must be identical across epochs/subsets, and
    the math must match per-batch shapes exactly (a document's E-step is
    invariant to which bucket row holds it)."""
    from pylda_tpu.models import layouts

    cfg = _cfg("svi", dense_vocab_threshold=0, bucket_sizes=(32, 64, 128))
    caps = layouts.plan_svi_ragged_geometry(corpus, cfg, cfg.batch_size)
    assert caps, caps
    rng = np.random.default_rng(0)
    shapes = set()
    for _ in range(6):
        idx = rng.choice(corpus.num_docs, size=cfg.batch_size, replace=False)
        bl = corpus.to_ragged_buckets(
            bucket_sizes=cfg.bucket_sizes, doc_pad_multiple=8,
            doc_indices=idx, bucket_capacities=caps,
        )
        shapes.add(tuple(b.ids.shape for b in bl))
        got = sum(float(b.cnts.sum()) for b in bl)
        assert got == sum(corpus.docs[i].size for i in idx)
    assert len(shapes) == 1, shapes

    eng = StochasticVariationalBayes(cfg)
    eng.initialize(corpus)
    assert eng._svi_geometry
    ests = [eng.learning() for _ in range(2)]

    eng2 = StochasticVariationalBayes(_cfg(
        "svi", dense_vocab_threshold=0, bucket_sizes=(32, 64, 128)
    ))
    eng2.initialize(corpus)
    eng2._svi_geometry = None  # per-batch shapes (the fallback path)
    ests2 = [eng2.learning() for _ in range(2)]
    np.testing.assert_allclose(ests, ests2, rtol=1e-6)
    np.testing.assert_allclose(
        np.asarray(eng.state.lam), np.asarray(eng2.state.lam),
        rtol=1e-5, atol=1e-6,
    )


def test_svi_geometry_overflow_falls_back(corpus):
    """A pathological minibatch that overflows the planned capacities
    must still train (per-batch shapes for that batch), not crash."""
    cfg = _cfg("svi", dense_vocab_threshold=0, bucket_sizes=(32, 64, 128))
    eng = StochasticVariationalBayes(cfg)
    eng.initialize(corpus)
    # Starve the plan: capacity 8 rows everywhere guarantees overflow.
    eng._svi_geometry = {s: 8 for s in (32, 64, 128)}
    est = eng.learning()
    assert np.isfinite(est)


def test_streaming_svi_matches_in_memory(corpus, tmp_path):
    """Disk-backed minibatch source (SURVEY.md section 7.2 step 1):
    training from StreamingCorpus must match the in-memory Corpus run
    exactly — same minibatch indices, same layouts, same updates."""
    from pylda_tpu.corpus.streaming import StreamingCorpus
    from pylda_tpu.corpus.vocabulary import Vocabulary

    path = str(tmp_path / "doc.dat")
    _write_text_corpus(corpus, path)
    vocab = Vocabulary(f"w{i}" for i in range(corpus.num_types))

    stream = StreamingCorpus(path, vocab)
    assert stream.num_docs == corpus.num_docs
    assert stream.num_tokens == corpus.num_tokens  # exact post-OOV count

    runs = {}
    for name, c in (("mem", corpus), ("stream", stream)):
        eng = StochasticVariationalBayes(_cfg("svi", gamma_init="ones"))
        eng.initialize(c, vocab)
        ests = [eng.learning() for _ in range(3)]
        runs[name] = (np.asarray(eng.state.lam), ests, eng.gamma)
    np.testing.assert_array_equal(runs["mem"][0], runs["stream"][0])
    assert runs["mem"][1] == runs["stream"][1]
    np.testing.assert_array_equal(runs["mem"][2], runs["stream"][2])


def test_streaming_svi_ragged_layout(corpus, tmp_path):
    """Streaming + large-vocab ragged minibatches (V > threshold)."""
    from pylda_tpu.corpus.streaming import StreamingCorpus
    from pylda_tpu.corpus.vocabulary import Vocabulary

    path = str(tmp_path / "doc.dat")
    _write_text_corpus(corpus, path)
    vocab = Vocabulary(f"w{i}" for i in range(corpus.num_types))
    stream = StreamingCorpus(path, vocab)

    runs = {}
    for name, c in (("mem", corpus), ("stream", stream)):
        # sstats_mode="scatter" on BOTH sides: the disk-backed stream
        # cannot take the minibatch dense-sstats plan (rows not in RAM),
        # so bit-identity — this test's whole contract — is only defined
        # on the shared scatter path.  Dense-vs-scatter numerical parity
        # is pinned separately (test_svi_minibatch_dense_sstats_parity).
        eng = StochasticVariationalBayes(
            _cfg("svi", gamma_init="ones", dense_vocab_threshold=0,
                 bucket_sizes=(32, 64, 128), sstats_mode="scatter")
        )
        eng.initialize(c, vocab)
        ests = [eng.learning() for _ in range(2)]
        runs[name] = (np.asarray(eng.state.lam), ests)
    np.testing.assert_array_equal(runs["mem"][0], runs["stream"][0])
    assert runs["mem"][1] == runs["stream"][1]


def test_svi_minibatch_dense_sstats_parity(corpus):
    """The scatter-free minibatch sufficient statistics
    (``_plan_mb_dense_sstats``: gathered dense count rows x two MXU
    matmuls) are the same reduction as the in-bucket row scatter up to
    float summation order.  200 docs / batch 64 leaves a 8-doc final
    minibatch, exercising the -1-padded doc-selection rows end to end
    (gamma assembly included)."""
    runs = {}
    for mode in ("scatter", "auto"):
        eng = StochasticVariationalBayes(
            _cfg("svi", gamma_init="ones", dense_vocab_threshold=0,
                 bucket_sizes=(32, 64, 128), sstats_mode=mode)
        )
        eng.initialize(corpus)
        ests = [eng.learning() for _ in range(2)]
        ests += eng.learning_many(2)
        runs[mode] = (
            np.asarray(eng.state.lam), ests, np.asarray(eng.gamma)
        )
    assert runs["auto"][0].shape == runs["scatter"][0].shape
    np.testing.assert_allclose(
        runs["auto"][0], runs["scatter"][0], rtol=2e-4
    )
    np.testing.assert_allclose(
        runs["auto"][2], runs["scatter"][2], rtol=2e-3, atol=1e-4
    )
    np.testing.assert_allclose(
        np.asarray(runs["auto"][1]), np.asarray(runs["scatter"][1]),
        rtol=1e-4,
    )


def test_svi_minibatch_dense_sstats_sharded_matches(corpus):
    """The minibatch dense-sstats path UNDER A MESH must match the
    unsharded run: the docs_mask scatter over data-sharded doc_sel
    indices and the replicated row-chunk gathers run under GSPMD here
    (round-4 advisor: the sharded SVI tests used the dense layout where
    the plan is gated off, so this path was unverified sharded)."""
    from pylda_tpu.parallel.mesh import make_mesh

    def run(mesh):
        eng = StochasticVariationalBayes(
            _cfg("svi", gamma_init="ones", dense_vocab_threshold=0,
                 bucket_sizes=(32, 64, 128))
        )
        eng.initialize(corpus, mesh=mesh)
        assert eng._mb_sstats is not None  # the plan must be ACTIVE
        ests = eng.learning_many(3)
        return np.asarray(eng.state.lam), ests

    lam_ref, ests_ref = run(None)
    lam_sh, ests_sh = run(make_mesh(shape=(8, 1)))
    np.testing.assert_allclose(lam_ref, lam_sh, rtol=2e-4)
    for a, b in zip(ests_ref, ests_sh):
        assert abs(a - b) / abs(a) < 1e-3, (ests_ref, ests_sh)


def test_streaming_corpus_holds_no_documents(corpus, tmp_path):
    """The point of streaming: no per-document arrays are retained."""
    from pylda_tpu.corpus.streaming import StreamingCorpus
    from pylda_tpu.corpus.vocabulary import Vocabulary

    path = str(tmp_path / "doc.dat")
    _write_text_corpus(corpus, path)
    vocab = Vocabulary(f"w{i}" for i in range(corpus.num_types))
    stream = StreamingCorpus(path, vocab)
    assert not hasattr(stream, "docs")
    # RAM-resident index = one int64 offset per document (+1).
    assert stream._offsets.nbytes == 8 * (corpus.num_docs + 1)


def test_engine_svi_matches_oracle_svi():
    """Statistical parity for the SVI update rule: the fused-epoch TPU
    engine and the float64 per-document oracle reach comparable held-out
    perplexity from the same schedule (tau0, kappa, batch size)."""
    import numpy as np

    from pylda_tpu.corpus.synthetic import synthetic_corpus
    from pylda_tpu.models import StochasticVariationalBayes
    from pylda_tpu.oracle import OracleSVI
    from pylda_tpu.utils.config import LDAConfig

    corpus, _, _ = synthetic_corpus(
        num_docs=240, num_topics=4, num_types=150,
        mean_doc_length=35.0, seed=8,
    )
    train = corpus.subset(range(200))
    test = corpus.subset(range(200, 240))

    eng = StochasticVariationalBayes(LDAConfig(
        number_of_topics=4, inference_mode="svi", seed=0,
        batch_size=50, tau0=16.0, kappa=0.7, alpha_alpha=0.25,
    ))
    eng.initialize(train)
    for _ in range(8):
        eng.learning()

    ora = OracleSVI(train, num_topics=4, alpha=0.25, eta=1.0 / 150,
                    seed=0, batch_size=50, tau0=16.0, kappa=0.7)
    for _ in range(8):
        ora.learning()

    p_eng, p_ora = eng.perplexity(test), ora.perplexity(test)
    assert np.isfinite(p_eng) and np.isfinite(p_ora)
    assert abs(p_eng - p_ora) / p_ora < 0.15


def test_device_rows_path_matches_host_repack():
    """Device-resident minibatching (corpus rows on device once, epochs
    ship row indices, the fused scan gathers) must be BITWISE identical
    to the host repack path: same minibatch membership, same row order,
    same RNG stream.  svi_device_rows_budget_mb=0 forces the host path."""
    import numpy as np

    from pylda_tpu.corpus.synthetic import synthetic_corpus
    from pylda_tpu.models import StochasticVariationalBayes
    from pylda_tpu.utils.config import LDAConfig

    c, _, _ = synthetic_corpus(
        num_docs=256, num_topics=8, num_types=6000, mean_doc_length=60,
        seed=0,
    )
    lam0 = np.random.default_rng(9).gamma(100.0, 0.01, size=(8, 6000))

    def run(budget):
        cfg = LDAConfig(
            number_of_topics=8, inference_mode="svi", batch_size=64,
            tau0=16.0, kappa=0.7, inner_iterations=15, seed=0,
            gamma_init="ones", svi_device_rows_budget_mb=budget,
            hyper_parameter_optimize_interval=2,
        )
        e = StochasticVariationalBayes(cfg)
        e.initialize(c, lam_init=lam0.copy())
        active = e._device_rows is not None
        ests = [e.learning() for _ in range(3)]
        return (
            active, ests,
            float(np.asarray(e.state.lam, np.float64).sum()),
            float(e.gamma.sum()),
            float(np.asarray(e.state.alpha, np.float64).sum()),
        )

    act_a, ests_a, lam_a, g_a, al_a = run(2048)
    act_b, ests_b, lam_b, g_b, al_b = run(0)
    assert act_a and not act_b
    assert ests_a == ests_b
    assert lam_a == lam_b and al_a == al_b
    np.testing.assert_allclose(g_a, g_b, rtol=1e-6)


def test_device_rows_chunked_matches_host_repack():
    """With a tiny E-step memory budget the capacity block splits into
    several gather chunks; the layout must mirror build_vb_batches'
    split exactly (RNG-stream + convergence-granularity parity), so the
    two paths stay bitwise identical even when chunking kicks in."""
    import numpy as np

    from pylda_tpu.corpus.synthetic import synthetic_corpus
    from pylda_tpu.models import StochasticVariationalBayes
    from pylda_tpu.utils.config import LDAConfig

    c, _, _ = synthetic_corpus(
        num_docs=256, num_topics=8, num_types=6000, mean_doc_length=60,
        seed=0,
    )
    lam0 = np.random.default_rng(9).gamma(100.0, 0.01, size=(8, 6000))

    def run(budget):
        cfg = LDAConfig(
            number_of_topics=8, inference_mode="svi", batch_size=64,
            tau0=16.0, kappa=0.7, inner_iterations=15, seed=0,
            gamma_init="ones", svi_device_rows_budget_mb=budget,
            estep_memory_budget_mb=0, doc_pad_multiple=16,
        )
        e = StochasticVariationalBayes(cfg)
        e.initialize(c, lam_init=lam0.copy())
        if budget:
            _r, meta = e._device_rows
            assert any(len(m["chunk_sizes"]) > 1 for m in meta), meta
        ests = [e.learning() for _ in range(2)]
        return ests, float(np.asarray(e.state.lam, np.float64).sum())

    a = run(2048)
    b = run(0)
    assert a == b, (a, b)


def test_device_rows_dense_matches_host_repack():
    """Dense-layout device-resident minibatching ([D+1, V] matrix on
    device, epochs gather [batch, V] rows by index) is bitwise identical
    to the host per-epoch to_dense repack."""
    import numpy as np

    from pylda_tpu.corpus.synthetic import synthetic_corpus
    from pylda_tpu.models import StochasticVariationalBayes
    from pylda_tpu.utils.config import LDAConfig

    c, _, _ = synthetic_corpus(
        num_docs=250, num_topics=8, num_types=500, mean_doc_length=40,
        seed=0,
    )
    lam0 = np.random.default_rng(9).gamma(100.0, 0.01, size=(8, 500))

    def run(budget):
        cfg = LDAConfig(
            number_of_topics=8, inference_mode="svi", batch_size=64,
            tau0=16.0, kappa=0.7, inner_iterations=15, seed=0,
            gamma_init="ones", svi_device_rows_budget_mb=budget,
            hyper_parameter_optimize_interval=2,
        )
        e = StochasticVariationalBayes(cfg)
        e.initialize(c, lam_init=lam0.copy())
        act = e._device_rows is not None
        ests = [e.learning() for _ in range(3)]
        return (
            act, ests,
            float(np.asarray(e.state.lam, np.float64).sum()),
            float(e.gamma.sum()),
        )

    act_a, ests_a, lam_a, g_a = run(2048)
    act_b, ests_b, lam_b, g_b = run(0)
    assert act_a and not act_b
    assert ests_a == ests_b and lam_a == lam_b
    np.testing.assert_allclose(g_a, g_b, rtol=1e-6)


@pytest.mark.parametrize("num_types", [500, 6000])
def test_fused_learning_many_matches_sequential(num_types):
    """On the device-rows path learning_many(n) is ONE dispatch (outer
    epoch scan, inner minibatch scan, key chain split exactly like n
    sequential learning() calls): estimates and state must be bitwise
    identical to the sequential loop, on both layouts."""
    import numpy as np

    from pylda_tpu.corpus.synthetic import synthetic_corpus
    from pylda_tpu.models import StochasticVariationalBayes
    from pylda_tpu.utils.config import LDAConfig

    c, _, _ = synthetic_corpus(
        num_docs=250, num_topics=8, num_types=num_types,
        mean_doc_length=40, seed=0,
    )
    lam0 = np.random.default_rng(9).gamma(
        100.0, 0.01, size=(8, num_types)
    )

    def eng():
        cfg = LDAConfig(
            number_of_topics=8, inference_mode="svi", batch_size=64,
            tau0=16.0, kappa=0.7, inner_iterations=15, seed=0,
            gamma_init="ones", hyper_parameter_optimize_interval=2,
        )
        e = StochasticVariationalBayes(cfg)
        e.initialize(c, lam_init=lam0.copy())
        assert e._device_rows is not None
        return e

    a = eng()
    ests_seq = [a.learning() for _ in range(4)]
    b = eng()
    ests_fused = b.learning_many(4)
    assert ests_seq == ests_fused
    assert float(np.asarray(a.state.lam, np.float64).sum()) == float(
        np.asarray(b.state.lam, np.float64).sum()
    )
    assert float(np.asarray(a.state.alpha, np.float64).sum()) == float(
        np.asarray(b.state.alpha, np.float64).sum()
    )
    # The lazy gamma refresh covers every document at the final lambda.
    g = b.gamma
    assert g.shape == (250, 8) and np.isfinite(g).all()


def test_prefetch_learning_many_matches_sequential_streaming(tmp_path):
    """The host-repack learning_many pipelines epoch construction on a
    worker thread (streaming epochs are parse-dominated); results must
    stay bitwise identical to sequential learning() calls."""
    import os

    import numpy as np

    from pylda_tpu.corpus.streaming import StreamingCorpus
    from pylda_tpu.corpus.synthetic import synthetic_corpus
    from pylda_tpu.models import StochasticVariationalBayes
    from pylda_tpu.utils.config import LDAConfig

    c, _, _ = synthetic_corpus(
        num_docs=200, num_topics=8, num_types=6000, mean_doc_length=40,
        seed=0,
    )
    p = os.path.join(str(tmp_path), "doc.dat")
    with open(p, "w") as f:
        for d in c.docs:
            f.write(" ".join(c.vocab[int(t)] for t in d) + "\n")

    def eng():
        s = StreamingCorpus(p, c.vocab)
        cfg = LDAConfig(
            number_of_topics=8, inference_mode="svi", batch_size=64,
            tau0=16.0, kappa=0.7, inner_iterations=15, seed=0,
            gamma_init="ones",
            # Force the larger-than-HBM regime: under-budget streaming
            # corpora now take the device-rows path (round-4 verdict
            # item 5; test below), and this test is about the
            # host-repack prefetch pipeline.
            svi_device_rows_budget_mb=0,
        )
        e = StochasticVariationalBayes(cfg)
        e.initialize(s, c.vocab)
        assert e._device_rows is None  # host-repack path under test
        return e

    a = eng()
    seq = [a.learning() for _ in range(3)]
    b = eng()
    pre = b.learning_many(3)
    assert seq == pre
    assert float(np.asarray(a.state.lam, np.float64).sum()) == float(
        np.asarray(b.state.lam, np.float64).sum()
    )


def test_streaming_under_budget_takes_device_rows_bitwise(tmp_path):
    """A disk-backed corpus that fits svi_device_rows_budget_mb now
    trains on the device-resident rows path (round-4 verdict item 5:
    the host path re-packed and re-uploaded static rows every epoch,
    ~3x off the device bound).  The run must be BITWISE identical to
    the same corpus trained from RAM — identical minibatch schedule,
    key chain, and gathered layouts."""
    import os

    import numpy as np

    from pylda_tpu.corpus.streaming import StreamingCorpus
    from pylda_tpu.corpus.synthetic import synthetic_corpus
    from pylda_tpu.models import StochasticVariationalBayes
    from pylda_tpu.utils.config import LDAConfig

    c, _, _ = synthetic_corpus(
        num_docs=200, num_topics=8, num_types=6000, mean_doc_length=40,
        seed=0,
    )
    p = os.path.join(str(tmp_path), "doc.dat")
    with open(p, "w") as f:
        for d in c.docs:
            f.write(" ".join(c.vocab[int(t)] for t in d) + "\n")

    def run(corpus):
        cfg = LDAConfig(
            number_of_topics=8, inference_mode="svi", batch_size=64,
            tau0=16.0, kappa=0.7, inner_iterations=15, seed=0,
            gamma_init="ones",
        )
        e = StochasticVariationalBayes(cfg)
        e.initialize(corpus, c.vocab)
        assert e._device_rows is not None, type(corpus).__name__
        return e, e.learning_many(3)

    s = StreamingCorpus(p, c.vocab)
    a, ests_stream = run(s)
    b, ests_ram = run(c)
    assert ests_stream == ests_ram
    assert float(np.asarray(a.state.lam, np.float64).sum()) == float(
        np.asarray(b.state.lam, np.float64).sum()
    )
