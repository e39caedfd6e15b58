"""Distributed tests without a cluster (SURVEY.md section 4 item 4):
8 simulated CPU devices; sharded runs must match unsharded to tolerance."""

import numpy as np
import pytest

import jax

from pylda_tpu.corpus import synthetic_corpus
from pylda_tpu.models import (
    Hybrid,
    MonteCarlo,
    StochasticVariationalBayes,
    VariationalBayes,
)
from pylda_tpu.parallel.mesh import make_mesh, shard_batch
from pylda_tpu.utils.config import LDAConfig


pytestmark = pytest.mark.skipif(
    len(jax.devices()) < 8, reason="needs 8 simulated devices"
)


@pytest.fixture(scope="module")
def corpus():
    c, _, _ = synthetic_corpus(
        num_docs=64, num_topics=4, num_types=128, mean_doc_length=30, seed=5
    )
    return c


@pytest.fixture(scope="module")
def lam_init():
    rng = np.random.default_rng(9)
    return rng.gamma(100.0, 0.01, size=(4, 128))


def _cfg(**kw):
    base = dict(
        number_of_topics=4,
        alpha_alpha=0.2,
        alpha_beta=0.02,
        inner_iterations=30,
        doc_pad_multiple=8,
        seed=0,
        gamma_init="ones",
    )
    base.update(kw)
    return LDAConfig(**base)


def _run_vb(corpus, lam_init, mesh=None, **kw):
    eng = VariationalBayes(_cfg(**kw))
    eng.initialize(corpus, lam_init=lam_init, mesh=mesh)
    elbos = [eng.learning() for _ in range(2)]
    return eng, elbos


def test_data_parallel_matches_single_device(corpus, lam_init):
    """Doc sharding over 8 devices: psum'd sstats == unsharded sstats."""
    ref, ref_elbos = _run_vb(corpus, lam_init)
    mesh = make_mesh(shape=(8, 1))
    sh, sh_elbos = _run_vb(corpus, lam_init, mesh=mesh)
    for a, b in zip(ref_elbos, sh_elbos):
        assert abs(a - b) / abs(a) < 1e-4, (ref_elbos, sh_elbos)
    np.testing.assert_allclose(
        ref.topic_word_distribution(),
        sh.topic_word_distribution(),
        atol=3e-3,
    )


def test_vocab_sharded_lambda_matches(corpus, lam_init):
    """(4 data) x (2 model) mesh with lambda vocab-sharded (TP)."""
    ref, ref_elbos = _run_vb(corpus, lam_init)
    mesh = make_mesh(shape=(4, 2))
    sh, sh_elbos = _run_vb(
        corpus, lam_init, mesh=mesh, shard_vocab=True
    )
    for a, b in zip(ref_elbos, sh_elbos):
        assert abs(a - b) / abs(a) < 1e-4, (ref_elbos, sh_elbos)
    np.testing.assert_allclose(
        ref.topic_word_distribution(),
        sh.topic_word_distribution(),
        atol=3e-3,
    )


def test_topic_sharded_lambda_matches(corpus, lam_init):
    """(4 data) x (2 model) mesh with lambda topic-sharded (the EP
    analog: each model shard owns K/2 topics)."""
    ref, ref_elbos = _run_vb(corpus, lam_init)
    mesh = make_mesh(shape=(4, 2))
    sh, sh_elbos = _run_vb(
        corpus, lam_init, mesh=mesh, shard_topics=True
    )
    for a, b in zip(ref_elbos, sh_elbos):
        assert abs(a - b) / abs(a) < 1e-4, (ref_elbos, sh_elbos)
    np.testing.assert_allclose(
        ref.topic_word_distribution(),
        sh.topic_word_distribution(),
        atol=3e-3,
    )


def test_hybrid_sstats_data_parallel_matches():
    """Ragged layout (V > dense_vocab_threshold) with the hybrid
    dense-sstats path under a doc-sharded mesh: the dense chunks, the
    per-document gamma recombination (device segment_sum) and the psum'd
    sstats must together match the unsharded hybrid run."""
    big, _, _ = synthetic_corpus(
        num_docs=64, num_topics=4, num_types=5000, mean_doc_length=25,
        seed=13,
    )
    rng = np.random.default_rng(2)
    lam0 = rng.gamma(100.0, 0.01, size=(4, 5000))
    ref, ref_elbos = _run_vb(big, lam0, sstats_mode="auto")
    assert ref._sstats_plan is not None
    mesh = make_mesh(shape=(8, 1))
    sh, sh_elbos = _run_vb(big, lam0, mesh=mesh, sstats_mode="auto")
    assert sh._sstats_plan is not None
    for a, b in zip(ref_elbos, sh_elbos):
        assert abs(a - b) / abs(a) < 1e-4, (ref_elbos, sh_elbos)
    np.testing.assert_allclose(
        ref.topic_word_distribution(),
        sh.topic_word_distribution(),
        atol=3e-3,
    )


def test_replica_consistency_check(corpus, lam_init):
    """The cross-device determinism debug mode: replicated lambda must be
    bit-identical on every device after the psum'd M-step."""
    from pylda_tpu.parallel.mesh import (
        assert_replicas_consistent,
        replica_checksums,
    )

    mesh = make_mesh(shape=(8, 1))
    eng, _ = _run_vb(corpus, lam_init, mesh=mesh)
    sums = replica_checksums(eng.state)
    assert "lam" in sums and len(sums["lam"]) == 8
    assert_replicas_consistent(eng.state)


def test_sharded_batch_layout(corpus):
    mesh = make_mesh(shape=(8, 1))
    batch = corpus.to_dense(pad_docs_to=64)
    sb = shard_batch(batch, mesh)
    assert sb.counts.sharding.is_equivalent_to(
        jax.sharding.NamedSharding(
            mesh, jax.sharding.PartitionSpec("data", None)
        ),
        ndim=2,
    )
    # Each device holds 64/8 = 8 document rows.
    shard_shapes = {s.data.shape for s in sb.counts.addressable_shards}
    assert shard_shapes == {(8, corpus.num_types)}


def _run_svi(corpus, lam_init, mesh=None, **kw):
    eng = StochasticVariationalBayes(
        _cfg(inference_mode="svi", batch_size=16, tau0=16.0, kappa=0.7, **kw)
    )
    eng.initialize(corpus, lam_init=lam_init, mesh=mesh)
    ests = [eng.learning() for _ in range(3)]
    return eng, ests


def test_svi_doc_sharded_matches_single_device(corpus, lam_init):
    """Doc-sharded SVI (BASELINE config 5 path): the fused epoch scan
    under the mesh — minibatch docs sharded over "data", one psum'd
    sstats per natural-gradient step — must match the unsharded run
    (identical minibatch construction; only placement differs)."""
    ref, ref_ests = _run_svi(corpus, lam_init)
    mesh = make_mesh(shape=(8, 1))
    sh, sh_ests = _run_svi(corpus, lam_init, mesh=mesh)
    for a, b in zip(ref_ests, sh_ests):
        assert abs(a - b) / abs(a) < 1e-4, (ref_ests, sh_ests)
    np.testing.assert_allclose(
        np.asarray(ref.state.lam), np.asarray(sh.state.lam), rtol=2e-4
    )
    # gammas assemble identically in global doc order.
    np.testing.assert_allclose(ref.gamma, sh.gamma, rtol=2e-3, atol=1e-4)


def test_svi_vocab_sharded_matches(corpus, lam_init):
    """SVI with lambda vocab-sharded on "model" (the K=1000/V=100k
    HBM-pressure layout of BASELINE config 5) — at SHIPPING DEFAULTS,
    including the stall exit (round-4 verdict item 4).

    Vocab sharding reorders contraction reductions by ulps, which can
    flip a knife-edge row's exit sweep.  Threshold-converged rows
    FREEZE their gamma (ops/estep._exit_update), so they are immune to
    when the rest of the batch exits; a stall-edge flip can still give
    the remaining plateau rows one extra near-noise-floor sweep, which
    the statistical tolerance covers.  (An exact-parity variant at
    pinned sweeps lives below.)"""
    ref, ref_ests = _run_svi(corpus, lam_init)
    mesh = make_mesh(shape=(4, 2))
    sh, sh_ests = _run_svi(corpus, lam_init, mesh=mesh, shard_vocab=True)
    for a, b in zip(ref_ests, sh_ests):
        assert abs(a - b) / abs(a) < 1e-3, (ref_ests, sh_ests)
    np.testing.assert_allclose(
        np.asarray(ref.state.lam), np.asarray(sh.state.lam), rtol=5e-3,
        atol=1e-5,
    )


def test_svi_vocab_sharded_matches_pinned_sweeps(corpus, lam_init):
    """Exact-parity variant: threshold=0 pins the sweep count to the
    cap, so the vocab-sharded run must match the unsharded one to pure
    arithmetic reordering tolerance (no exit-timing freedom at all)."""
    kw = dict(convergence_threshold=0.0, inner_iterations=20)
    ref, ref_ests = _run_svi(corpus, lam_init, **kw)
    mesh = make_mesh(shape=(4, 2))
    sh, sh_ests = _run_svi(
        corpus, lam_init, mesh=mesh, shard_vocab=True, **kw
    )
    for a, b in zip(ref_ests, sh_ests):
        assert abs(a - b) / abs(a) < 1e-4, (ref_ests, sh_ests)
    np.testing.assert_allclose(
        np.asarray(ref.state.lam), np.asarray(sh.state.lam), rtol=2e-4
    )


def test_sampling_engines_run_sharded(corpus):
    """Hybrid + Gibbs one iteration on the mesh — sharded scan/categorical
    path compiles and returns finite objectives."""
    mesh = make_mesh(shape=(8, 1))
    for cls in (Hybrid, MonteCarlo):
        eng = cls(_cfg(bucket_sizes=(64, 128)))
        eng.initialize(corpus, mesh=mesh)
        ll = eng.learning()
        assert np.isfinite(ll)


def test_dryrun_multichip_entrypoint():
    import __graft_entry__ as ge

    ge.dryrun_multichip(8)
