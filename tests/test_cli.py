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
    ])
    assert rc == 0
    runs = glob.glob(os.path.join(out, "*", "*"))
    assert len(runs) == 1
    run = runs[0]
    # Config encoded into the run dir name (reference contract).
    assert "-lda-I4-S2-K5-" in run and run.endswith("-imvb")
    for f in ["exp_beta-2", "exp_beta-4", "model-2", "model-4",
              "metrics.jsonl"]:
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
