"""Checkpoint round-trip: save → restore → continue must match a
continuous run (SURVEY.md section 4 item 5)."""

import numpy as np
import pytest

from pylda_tpu.corpus import synthetic_corpus
from pylda_tpu.models import Inferencer, make_engine
from pylda_tpu.utils.config import LDAConfig


@pytest.fixture(scope="module")
def corpus():
    c, _, _ = synthetic_corpus(
        num_docs=48, num_topics=4, num_types=100, mean_doc_length=30, seed=2
    )
    return c


def _cfg(mode, **kw):
    base = dict(
        number_of_topics=4,
        inference_mode=mode,
        alpha_alpha=0.2,
        alpha_beta=0.02,
        inner_iterations=20,
        doc_pad_multiple=8,
        batch_size=16,
        seed=3,
    )
    base.update(kw)
    return LDAConfig(**base)


@pytest.mark.parametrize("mode", ["vb", "svi", "hybrid", "gibbs"])
def test_resume_matches_continuous(mode, corpus, tmp_path):
    # Continuous: 4 iterations.
    cont = make_engine(_cfg(mode))
    cont.initialize(corpus)
    for _ in range(2):
        cont.learning()
    path = str(tmp_path / f"model-{mode}")
    cont.save(path)
    lls_cont = [cont.learning() for _ in range(2)]

    # Restore at iteration 2 and continue.
    res = Inferencer.load(path, corpus=corpus)
    assert type(res).__name__ == type(cont).__name__
    assert res._counter == 2
    lls_res = [res.learning() for _ in range(2)]

    for a, b in zip(lls_cont, lls_res):
        assert abs(a - b) / abs(a) < 1e-5, (mode, lls_cont, lls_res)
    np.testing.assert_allclose(
        np.asarray(cont.state.lam), np.asarray(res.state.lam),
        rtol=1e-5, atol=1e-5,
    )


def test_inference_only_restore(corpus, tmp_path):
    eng = make_engine(_cfg("vb"))
    eng.initialize(corpus)
    eng.learning()
    path = str(tmp_path / "model-1")
    eng.save(path)
    res = Inferencer.load(path)  # no corpus: inference/export only
    test = corpus.subset(range(8))
    p1 = eng.perplexity(test)
    p2 = res.perplexity(test)
    assert abs(p1 - p2) / p1 < 1e-6
    assert res._vocab.types == corpus.vocab.types


def test_elastic_reshard_restore(corpus, tmp_path):
    """Resume on a different device mesh (SURVEY.md section 5 'elastic
    reshaping'): global state is only K x V — re-shard on load."""
    import jax

    if len(jax.devices()) < 8:
        pytest.skip("needs 8 simulated devices")
    from pylda_tpu.parallel.mesh import make_mesh

    eng = make_engine(_cfg("vb"))
    eng.initialize(corpus)
    eng.learning()
    path = str(tmp_path / "model-m")
    eng.save(path)

    res = Inferencer.load(path)
    res._corpus = corpus
    res._mesh = make_mesh(shape=(8, 1))
    from pylda_tpu.parallel.mesh import shard_state

    res._state = shard_state(res.state, res._mesh, False)
    res._prepare(corpus)
    ll_sharded = res.learning()
    ll_single = eng.learning()
    assert abs(ll_sharded - ll_single) / abs(ll_single) < 1e-4


@pytest.mark.parametrize("mode", ["vb", "gibbs"])
def test_orbax_backend_round_trip(mode, corpus, tmp_path):
    """checkpoint_format="orbax" (SURVEY.md section 5): directory
    checkpoint via orbax/tensorstore; load auto-detects the format and
    resuming matches the continuous run exactly — including engine
    extras (Gibbs z / count tables)."""
    cont = make_engine(_cfg(mode, checkpoint_format="orbax"))
    cont.initialize(corpus)
    for _ in range(2):
        cont.learning()
    path = str(tmp_path / f"model-orbax-{mode}")
    cont.save(path)
    import os

    assert os.path.isdir(path)  # directory checkpoint, not a file
    lls_cont = [cont.learning() for _ in range(2)]

    res = Inferencer.load(path, corpus=corpus)
    assert type(res).__name__ == type(cont).__name__
    assert res._counter == 2
    lls_res = [res.learning() for _ in range(2)]
    np.testing.assert_allclose(lls_res, lls_cont, rtol=1e-6)
    if mode == "vb":
        np.testing.assert_array_equal(
            np.asarray(res.state.lam), np.asarray(cont.state.lam)
        )


def test_orbax_inference_only_restore(corpus, tmp_path):
    eng = make_engine(_cfg("vb"))
    eng.initialize(corpus)
    eng.learning()
    path = str(tmp_path / "model-orbax-infer")
    eng.save(path, format="orbax")
    res = Inferencer.load(path)
    ll, gamma = res.inference(corpus)
    assert np.isfinite(ll) and gamma.shape == (corpus.num_docs, 4)


def test_async_checkpoint_round_trip(tmp_path):
    """async_write moves the npz write off-thread; a subsequent save
    joins the in-flight one, and wait_for_checkpoint makes the file
    safe to read. Restored state must match a synchronous save."""
    import numpy as np

    from pylda_tpu.corpus.synthetic import synthetic_corpus
    from pylda_tpu.models import VariationalBayes
    from pylda_tpu.models.base import Inferencer
    from pylda_tpu.utils.config import LDAConfig

    corpus, _, _ = synthetic_corpus(
        num_docs=96, num_topics=4, num_types=200,
        mean_doc_length=25.0, seed=2,
    )
    eng = VariationalBayes(LDAConfig(number_of_topics=4, seed=0))
    eng.initialize(corpus)
    eng.learning_many(3)

    p_async = str(tmp_path / "model-async")
    p_sync = str(tmp_path / "model-sync")
    eng.save(p_async, async_write=True)
    eng.save(p_sync)  # joins the async write first — no interleaving
    eng.wait_for_checkpoint()

    a = Inferencer.load(p_async)
    s = Inferencer.load(p_sync)
    np.testing.assert_array_equal(
        np.asarray(a.state.lam), np.asarray(s.state.lam)
    )
    assert int(a.state.step) == int(s.state.step) == 3

    # back-to-back async saves serialise cleanly
    for i in range(3):
        eng.learning()
        eng.save(str(tmp_path / f"model-{i}"), async_write=True)
    eng.wait_for_checkpoint()
    last = Inferencer.load(str(tmp_path / "model-2"))
    assert int(last.state.step) == 6


def test_load_tolerates_unknown_config_fields(tmp_path):
    """A snapshot saved by a NEWER build may carry config fields this
    build does not know; load drops them with a warning instead of a
    TypeError (older-build snapshots already work via dataclass
    defaults)."""
    import json
    import os
    import warnings

    import numpy as np

    from pylda_tpu.corpus.synthetic import synthetic_corpus
    from pylda_tpu.models import make_engine
    from pylda_tpu.models.base import Inferencer
    from pylda_tpu.utils.config import LDAConfig

    c, _, _ = synthetic_corpus(
        num_docs=40, num_topics=3, num_types=100, mean_doc_length=20,
        seed=0,
    )
    eng = make_engine(LDAConfig(number_of_topics=3))
    eng.initialize(c)
    eng.learning_many(2)
    p = str(tmp_path / "model-2")
    eng.save(p)
    blobs = dict(np.load(p, allow_pickle=False))
    meta = json.loads(bytes(blobs["meta_json"].tobytes()).decode())
    meta["config"]["future_flag_from_v99"] = True
    blobs["meta_json"] = np.frombuffer(
        json.dumps(meta).encode(), dtype=np.uint8
    )
    np.savez(p + ".new", **blobs)
    os.replace(p + ".new.npz", p)
    with warnings.catch_warnings(record=True) as w:
        warnings.simplefilter("always")
        eng2 = Inferencer.load(p, corpus=c)
        assert any("unknown fields" in str(x.message) for x in w)
    assert np.isfinite(eng2.perplexity(c))


def test_load_reports_newer_build_for_unknown_values(tmp_path):
    """Unknown config VALUES (e.g. a future inference_mode) also mean a
    newer build: load raises a message saying so rather than a bare
    KeyError/ValueError."""
    import json
    import os

    import numpy as np
    import pytest

    from pylda_tpu.corpus.synthetic import synthetic_corpus
    from pylda_tpu.models import make_engine
    from pylda_tpu.models.base import Inferencer
    from pylda_tpu.utils.config import LDAConfig

    c, _, _ = synthetic_corpus(
        num_docs=40, num_topics=3, num_types=100, mean_doc_length=20,
        seed=0,
    )
    eng = make_engine(LDAConfig(number_of_topics=3))
    eng.initialize(c)
    eng.learning_many(1)
    p = str(tmp_path / "model-1")
    eng.save(p)
    blobs = dict(np.load(p, allow_pickle=False))
    meta = json.loads(bytes(blobs["meta_json"].tobytes()).decode())
    meta["config"]["inference_mode"] = "ctm_from_v99"
    blobs["meta_json"] = np.frombuffer(
        json.dumps(meta).encode(), dtype=np.uint8
    )
    np.savez(p + ".new", **blobs)
    os.replace(p + ".new.npz", p)
    with pytest.raises(ValueError, match="newer version"):
        Inferencer.load(p)
