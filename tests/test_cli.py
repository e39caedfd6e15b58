"""End-to-end CLI tests: the reference's launch_train/launch_test contract."""

import glob
import os

import numpy as np
import pytest

from pylda_tpu.cli.test import main as run_launch_test
from pylda_tpu.cli.train import build_parser, config_from_args, main as train_main
from pylda_tpu.corpus.datasets import make_denews_tiny


@pytest.fixture(scope="module")
def corpus_dir(tmp_path_factory):
    d = tmp_path_factory.mktemp("corpus")
    make_denews_tiny(str(d), num_train=120, num_test=30, mean_doc_length=30)
    return str(d)


def test_reference_flags_accepted():
    args = build_parser().parse_args([
        "--input_directory=/x",
        "--output_directory=/y",
        "--number_of_topics=25",
        "--training_iterations=7",
        "--alpha_alpha=0.3",
        "--alpha_beta=0.01",
        "--snapshot_interval=3",
        "--inference_mode=1",
        "--hyper_parameter_optimize_interval=5",
    ])
    cfg = config_from_args(args)
    assert cfg.number_of_topics == 25
    assert cfg.inference_mode == "gibbs"  # reference int encoding
    assert cfg.alpha_alpha == 0.3
    assert cfg.training_iterations == 7


def test_unset_hypers_default_to_reference_values():
    args = build_parser().parse_args([
        "--input_directory=/x", "--output_directory=/y",
        "--number_of_topics=20",
    ])
    cfg = config_from_args(args)
    assert cfg.alpha_alpha is None and cfg.resolved_alpha() == 1.0 / 20
    assert cfg.resolved_eta(100) == 1.0 / 100


def test_train_then_test_cli(corpus_dir, tmp_path):
    out = str(tmp_path / "out")
    rc = train_main([
        f"--input_directory={corpus_dir}",
        f"--output_directory={out}",
        "--number_of_topics=5",
        "--training_iterations=4",
        "--snapshot_interval=2",
        "--inner_iterations=20",
        "--seed=1",
        "--dump_gamma",
    ])
    assert rc == 0
    runs = glob.glob(os.path.join(out, "*", "*"))
    assert len(runs) == 1
    run = runs[0]
    # Config encoded into the run dir name (reference contract).
    assert "-lda-I4-S2-K5-" in run and run.endswith("-imvb")
    for f in ["exp_beta-2", "exp_beta-4", "model-2", "model-4",
              "gamma-2", "gamma-4", "metrics.jsonl"]:
        assert os.path.exists(os.path.join(run, f)), f

    # exp_beta format: header lines + word\tprob lines, descending prob.
    lines = open(os.path.join(run, "exp_beta-4")).read().splitlines()
    assert lines[0] == "==========\t0\t=========="
    probs = []
    for ln in lines[1:]:
        if ln.startswith("=========="):
            break
        w, p = ln.split("\t")
        probs.append(float(p))
    assert probs == sorted(probs, reverse=True) and len(probs) == 50

    # launch_test surface: restore + held-out perplexity + gamma dump.
    rc = run_launch_test([
        f"--model={os.path.join(run, 'model-4')}",
        f"--input_directory={corpus_dir}",
        f"--output_file={tmp_path / 'gamma.out'}",
    ])
    assert rc == 0
    gamma = np.loadtxt(tmp_path / "gamma.out")
    assert gamma.shape == (30, 5)
    assert (gamma > 0).all()


def test_infer_cli_serving(corpus_dir, tmp_path):
    """pylda-infer: model -> topic mixtures for new documents."""
    from pylda_tpu.cli.infer import main as infer_main

    out = str(tmp_path / "out_infer")
    train_main([
        f"--input_directory={corpus_dir}",
        f"--output_directory={out}",
        "--number_of_topics=5",
        "--training_iterations=3",
        "--snapshot_interval=3",
        "--inner_iterations=15",
        "--seed=1",
    ])
    model = glob.glob(os.path.join(out, "*", "*", "model-3"))[0]
    docs = tmp_path / "new_docs.txt"
    docs.write_text("government election vote\nrain snow storm weather\n")
    result = tmp_path / "mixtures.tsv"
    rc = infer_main([
        f"--model={model}", f"--input={docs}", f"--output={result}",
        "--top_topics=3",
    ])
    assert rc == 0
    lines = result.read_text().strip().splitlines()
    assert len(lines) == 2
    for ln in lines:
        pairs = [p.split(":") for p in ln.split("\t")]
        assert len(pairs) == 3
        probs = [float(p[1]) for p in pairs]
        assert all(0 <= p <= 1 for p in probs)
        assert probs == sorted(probs, reverse=True)
    # --full emits a normalised K-row per doc
    rc = infer_main([
        f"--model={model}", f"--input={docs}", f"--output={result}", "--full",
    ])
    theta = np.loadtxt(result)
    assert theta.shape == (2, 5)
    np.testing.assert_allclose(theta.sum(axis=1), 1.0, rtol=1e-4)


def test_learning_many_matches_learning_loop(corpus_dir, tmp_path):
    """learning_many(n) must be iteration-for-iteration equivalent to n
    learning() calls (same hyperopt schedule, same RNG stream)."""
    from pylda_tpu.corpus.datasets import load_input_directory
    from pylda_tpu.models import VariationalBayes
    from pylda_tpu.utils.config import LDAConfig

    train, _, vocab = load_input_directory(corpus_dir)
    kw = dict(
        number_of_topics=5, inference_mode="vb", inner_iterations=15,
        hyper_parameter_optimize_interval=2, seed=3, gamma_init="ones",
    )
    a = VariationalBayes(LDAConfig(**kw))
    a.initialize(train, vocab)
    ll_loop = [a.learning() for _ in range(4)]
    b = VariationalBayes(LDAConfig(**kw))
    b.initialize(train, vocab)
    ll_scan = b.learning_many(4)
    for x, y in zip(ll_loop, ll_scan):
        assert abs(x - y) < 1e-3 * abs(x), (ll_loop, ll_scan)
    np.testing.assert_allclose(
        np.asarray(a.state.alpha), np.asarray(b.state.alpha), rtol=1e-5
    )


def test_train_cli_gibbs_with_hyperopt(corpus_dir, tmp_path):
    out = str(tmp_path / "out_gibbs")
    rc = train_main([
        f"--input_directory={corpus_dir}",
        f"--output_directory={out}",
        "--number_of_topics=5",
        "--training_iterations=3",
        "--snapshot_interval=3",
        "--inference_mode=gibbs",
        "--hyper_parameter_optimize_interval=2",
        "--seed=1",
    ])
    assert rc == 0
    runs = glob.glob(os.path.join(out, "*", "*-imgibbs"))
    assert len(runs) == 1


def test_train_cli_tensorboard(corpus_dir, tmp_path):
    out = str(tmp_path / "out_tb")
    tb = str(tmp_path / "tb")
    rc = train_main([
        f"--input_directory={corpus_dir}",
        f"--output_directory={out}",
        "--number_of_topics=5",
        "--training_iterations=2",
        "--snapshot_interval=2",
        "--inner_iterations=10",
        f"--tensorboard_dir={tb}",
    ])
    assert rc == 0
    assert any(
        "tfevents" in f for f in os.listdir(tb)
    ), os.listdir(tb)


def test_train_cli_resume(corpus_dir, tmp_path):
    out = str(tmp_path / "out_resume")
    train_main([
        f"--input_directory={corpus_dir}",
        f"--output_directory={out}",
        "--number_of_topics=5",
        "--training_iterations=2",
        "--snapshot_interval=2",
        "--inner_iterations=20",
        "--seed=1",
    ])
    model = glob.glob(os.path.join(out, "*", "*", "model-2"))[0]
    rc = train_main([
        f"--input_directory={corpus_dir}",
        f"--output_directory={out}",
        "--number_of_topics=5",
        "--training_iterations=4",
        "--snapshot_interval=2",
        "--inner_iterations=20",
        f"--resume={model}",
    ])
    assert rc == 0
    # The resumed run continues from iteration 2 → produces model-4.
    assert glob.glob(os.path.join(out, "*", "*", "model-4"))


def test_new_layout_and_eval_flags(corpus_dir, tmp_path, capsys):
    """Session-4 surfaces: --bucket_policy/--bucket_sizes plumb into the
    config, --roofline logs the cost model, pylda-test --coherence logs
    the metric."""
    import json

    args = build_parser().parse_args([
        f"--input_directory={corpus_dir}",
        "--output_directory=/tmp/x",
        "--number_of_topics=5",
        "--bucket_policy=fixed",
        "--bucket_sizes=32,64,256",
        "--sstats_kernel=pallas",
    ])
    cfg = config_from_args(args)
    assert cfg.bucket_policy == "fixed"
    assert cfg.bucket_sizes == (32, 64, 256)
    assert cfg.sstats_kernel == "pallas"

    out = str(tmp_path / "out")
    rc = train_main([
        f"--input_directory={corpus_dir}",
        f"--output_directory={out}",
        "--number_of_topics=5",
        "--training_iterations=2",
        "--inner_iterations=10",
        "--dense_vocab_threshold=8",  # ragged path so roofline has phases
        "--roofline",
        "--seed=1",
    ])
    assert rc == 0
    run = glob.glob(os.path.join(out, "*", "*"))[0]
    events = [json.loads(l) for l in open(os.path.join(run, "metrics.jsonl"))]
    roof = [e for e in events if e.get("event") == "roofline"]
    assert {e["phase"] for e in roof} >= {"sweeps_per_sweep", "elog_beta"}
    assert all(e["bound_ms"] >= 0 for e in roof)

    capsys.readouterr()
    rc = run_launch_test([
        f"--model={os.path.join(run, 'model-2')}",
        f"--input_directory={corpus_dir}",
        f"--output_file={tmp_path / 'g.out'}",
        "--coherence",
    ])
    assert rc == 0
    stdout = capsys.readouterr().out
    coh_lines = [l for l in stdout.splitlines()
                 if "event=coherence" in l]
    assert coh_lines and "mean_umass=" in coh_lines[-1]
