"""Fault injection: SIGKILL a training run mid-flight, resume, finish.

SURVEY.md section 5 "Failure detection / elastic recovery": the recovery
story is checkpoint-based restart.  This test hard-kills a real training
process (no cleanup, no atexit) after its first snapshot lands, then
resumes from the snapshot in a fresh process and verifies training
completes with the full set of artifacts.
"""

import glob
import os
import subprocess
import sys
import textwrap
import time


_TRAIN = textwrap.dedent("""
import sys
# Child processes don't inherit conftest's platform override — force CPU
# the same way (the machine's sitecustomize pins jax to the tunneled TPU
# after env vars are read; see tests/conftest.py).
import jax
jax.config.update("jax_platforms", "cpu")
from pylda_tpu.cli.train import main
sys.exit(main([
    "--input_directory=" + sys.argv[1],
    "--output_directory=" + sys.argv[2],
    "--number_of_topics=5",
    "--training_iterations=200",
    "--snapshot_interval=2",
    "--inner_iterations=10",
    "--seed=1",
]))
""")


def test_kill_and_resume(tmp_path):
    from pylda_tpu.corpus.datasets import make_denews_tiny

    corpus_dir = str(tmp_path / "corpus")
    make_denews_tiny(corpus_dir, num_train=80, num_test=20,
                     mean_doc_length=25)
    out = str(tmp_path / "out")

    # Start training (200 iterations — far more than we let it finish).
    proc = subprocess.Popen(
        [sys.executable, "-c", _TRAIN, corpus_dir, out],
        stdout=subprocess.PIPE, stderr=subprocess.STDOUT, text=True,
    )
    # Wait for the first snapshot, then SIGKILL (no graceful shutdown).
    deadline = time.time() + 240
    snapshot = None
    while time.time() < deadline:
        found = glob.glob(os.path.join(out, "*", "*", "model-*"))
        if found:
            snapshot = found
            break
        if proc.poll() is not None:
            raise AssertionError(
                "training exited early:\n" + proc.stdout.read()[-2000:]
            )
        time.sleep(0.5)
    assert snapshot, "no snapshot appeared before the deadline"
    proc.kill()
    proc.wait()

    latest = max(
        glob.glob(os.path.join(out, "*", "*", "model-*")),
        key=lambda p: int(p.rsplit("-", 1)[1]),
    )
    n = int(latest.rsplit("-", 1)[1])

    # Resume in a fresh process for a short, finishable run.
    from pylda_tpu.cli.train import main as train_main

    rc = train_main([
        f"--input_directory={corpus_dir}",
        f"--output_directory={out}",
        "--number_of_topics=5",
        f"--training_iterations={n + 2}",
        "--snapshot_interval=2",
        "--inner_iterations=10",
        f"--resume={latest}",
    ])
    assert rc == 0
    assert glob.glob(os.path.join(out, "*", "*", f"model-{n + 2}"))
    assert glob.glob(os.path.join(out, "*", "*", f"exp_beta-{n + 2}"))
