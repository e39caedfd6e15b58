"""Two-process jax.distributed training test (SURVEY.md section 4 item 4).

Spawns 2 OS processes that bootstrap via jax.distributed.initialize over
localhost (Gloo), form one global 4-device ("data", "model") mesh (2 local
CPU devices per process), and run real doc-sharded VB training — the same
program text a multi-host TPU pod runs, with the psum'd sufficient stats
crossing the process boundary.  Asserts both ranks agree bitwise on the
replicated lambda and that the result matches a single-process run.
"""

import subprocess
import sys
import textwrap

_WORKER = textwrap.dedent("""
import os, sys
rank = int(sys.argv[1])
port = sys.argv[2]
os.environ["JAX_PLATFORMS"] = "cpu"
os.environ["XLA_FLAGS"] = "--xla_force_host_platform_device_count=2"
import jax
jax.config.update("jax_platforms", "cpu")
jax.distributed.initialize(
    coordinator_address=f"localhost:{port}", num_processes=2, process_id=rank
)
import numpy as np
from pylda_tpu.corpus.synthetic import synthetic_corpus
from pylda_tpu.models import VariationalBayes
from pylda_tpu.parallel.mesh import make_mesh
from pylda_tpu.utils.config import LDAConfig

corpus, _, _ = synthetic_corpus(
    num_docs=64, num_topics=4, num_types=128, mean_doc_length=30, seed=5
)
lam0 = np.random.default_rng(9).gamma(100.0, 0.01, size=(4, 128))
cfg = LDAConfig(
    number_of_topics=4, alpha_alpha=0.2, alpha_beta=0.02,
    inner_iterations=30, doc_pad_multiple=8, seed=0, gamma_init="ones",
)
eng = VariationalBayes(cfg)
eng.initialize(corpus, lam_init=lam0, mesh=make_mesh(shape=(4, 1)))
elbos = [eng.learning() for _ in range(2)]
lam_sum = float(np.asarray(eng.state.lam, dtype=np.float64).sum())
print(f"RESULT rank={rank} elbo0={elbos[0]:.6f} elbo1={elbos[1]:.6f} "
      f"lam={lam_sum:.6f}", flush=True)
""")


_SHARDED_WORKER = textwrap.dedent("""
import os, sys
rank = int(sys.argv[1]); port = sys.argv[2]; corpus_dir = sys.argv[3]
os.environ["XLA_FLAGS"] = "--xla_force_host_platform_device_count=2"
import jax
jax.config.update("jax_platforms", "cpu")
jax.distributed.initialize(
    coordinator_address=f"localhost:{port}", num_processes=2, process_id=rank
)
import numpy as np
from pylda_tpu.corpus.datasets import load_input_directory
from pylda_tpu.models import VariationalBayes
from pylda_tpu.parallel.mesh import make_mesh
from pylda_tpu.utils.config import LDAConfig

train, test, vocab = load_input_directory(
    corpus_dir, process_index=rank, process_count=2
)
assert train.process_local and train.global_num_docs == 120, (
    train.num_docs, train.global_num_docs)
assert train.num_docs == 60
cfg = LDAConfig(
    number_of_topics=5, inner_iterations=20, doc_pad_multiple=4, seed=0,
    gamma_init="ones",
)
eng = VariationalBayes(cfg)
eng.initialize(train, vocab, mesh=make_mesh(shape=(4, 1)))
elbos = [eng.learning() for _ in range(3)]
lam_sum = float(np.asarray(eng.state.lam, dtype=np.float64).sum())
pp = eng.perplexity(test)
# Cross-host gamma assembly: global doc order, every host collectively.
gamma = eng.gamma
assert gamma.shape == (120, 5), gamma.shape
gsum = float(gamma.sum())
print(f"RESULT rank={rank} elbo={elbos[-1]:.4f} lam={lam_sum:.4f} "
      f"pp={pp:.4f} gsum={gsum:.4f}", flush=True)
""")


_RAGGED_WORKER = textwrap.dedent("""
import os, sys
rank = int(sys.argv[1]); port = sys.argv[2]; corpus_dir = sys.argv[3]
os.environ["XLA_FLAGS"] = "--xla_force_host_platform_device_count=2"
import jax
jax.config.update("jax_platforms", "cpu")
jax.distributed.initialize(
    coordinator_address=f"localhost:{port}", num_processes=2, process_id=rank
)
import numpy as np
from pylda_tpu.corpus.datasets import load_input_directory
from pylda_tpu.models import VariationalBayes
from pylda_tpu.parallel.mesh import make_mesh
from pylda_tpu.utils.config import LDAConfig

train, test, vocab = load_input_directory(
    corpus_dir, process_index=rank, process_count=2
)
assert train.process_local and len(vocab) > 4096, len(vocab)
cfg = LDAConfig(
    number_of_topics=5, inner_iterations=20, doc_pad_multiple=4, seed=0,
    gamma_init="ones", bucket_sizes=(64, 128),
)
eng = VariationalBayes(cfg)
eng.initialize(train, vocab, mesh=make_mesh(shape=(4, 1)))
elbos = [eng.learning() for _ in range(2)]
lam_sum = float(np.asarray(eng.state.lam, dtype=np.float64).sum())
gsum = float(eng.gamma.sum())
print(f"RESULT rank={rank} elbo={elbos[-1]:.4f} lam={lam_sum:.4f} "
      f"gsum={gsum:.4f}", flush=True)
""")


def _write_synthetic_text_corpus(corpus_dir, num_docs=48, num_types=5000,
                                 seed=11):
    """doc.dat/voc.dat with V > dense_vocab_threshold and doc sizes
    spanning two buckets, plus one oversized doc (chunked rows)."""
    import os

    import numpy as np

    os.makedirs(corpus_dir, exist_ok=True)
    rng = np.random.default_rng(seed)
    with open(os.path.join(corpus_dir, "voc.dat"), "w") as f:
        for v in range(num_types):
            f.write(f"w{v}\n")
    with open(os.path.join(corpus_dir, "doc.dat"), "w") as f:
        for d in range(num_docs):
            if d == 3:
                n_unique = 300  # oversized: > largest bucket (128)
            elif d % 2:
                n_unique = int(rng.integers(70, 120))
            else:
                n_unique = int(rng.integers(10, 50))
            ids = rng.choice(num_types, size=n_unique, replace=False)
            toks = np.repeat(ids, rng.integers(1, 4, size=n_unique))
            f.write(" ".join(f"w{t}" for t in toks) + "\n")


def test_two_process_ragged_sharded_input_matches_full_load(tmp_path):
    """The large-vocabulary multi-host input pipeline: negotiated bucket
    geometry across hosts (allgathered histograms), lifted global ragged
    buckets.  Must match a single-process full-load run — the ELBO and
    the M-step are sums over documents, invariant to row placement."""
    from pylda_tpu.corpus.datasets import load_input_directory
    from pylda_tpu.models import VariationalBayes
    from pylda_tpu.utils.config import LDAConfig

    import numpy as np

    corpus_dir = str(tmp_path / "corpus")
    _write_synthetic_text_corpus(corpus_dir)

    port = "12503"
    procs = [
        subprocess.Popen(
            [sys.executable, "-c", _RAGGED_WORKER, str(r), port, corpus_dir],
            stdout=subprocess.PIPE, stderr=subprocess.STDOUT, text=True,
        )
        for r in range(2)
    ]
    results = {}
    for r, p in enumerate(procs):
        out, _ = p.communicate(timeout=600)
        assert p.returncode == 0, out[-3000:]
        line = [l for l in out.splitlines() if l.startswith("RESULT")][0]
        results[r] = dict(kv.split("=") for kv in line.split()[1:])
    assert results[0]["lam"] == results[1]["lam"], results

    train, test, vocab = load_input_directory(corpus_dir)
    cfg = LDAConfig(
        number_of_topics=5, inner_iterations=20, doc_pad_multiple=4, seed=0,
        gamma_init="ones", bucket_sizes=(64, 128),
        # Process-local input always runs the scatter sstats (each host
        # lacks the global dense matrix), so the full-load reference must
        # too: with chunked long docs the hybrid dense-sstats path uses
        # per-DOCUMENT gamma for sstats/theta-ELBO and legitimately
        # diverges from the per-row scatter bound after one iteration.
        sstats_mode="scatter",
    )
    eng = VariationalBayes(cfg)
    eng.initialize(train, vocab)
    ref = [eng.learning() for _ in range(2)]
    assert abs(ref[-1] - float(results[0]["elbo"])) < 1e-3 * abs(ref[-1]), (
        ref, results)
    ref_gsum = float(eng.gamma.sum())
    assert abs(ref_gsum - float(results[0]["gsum"])) < 1e-3 * abs(ref_gsum), (
        ref_gsum, results)


_SAMPLING_WORKER = textwrap.dedent("""
import os, sys
rank = int(sys.argv[1]); port = sys.argv[2]; corpus_dir = sys.argv[3]
os.environ["XLA_FLAGS"] = "--xla_force_host_platform_device_count=2"
import jax
jax.config.update("jax_platforms", "cpu")
jax.distributed.initialize(
    coordinator_address=f"localhost:{port}", num_processes=2, process_id=rank
)
import numpy as np
from jax.experimental import multihost_utils
from pylda_tpu.corpus.datasets import load_input_directory
from pylda_tpu.models import Hybrid, MonteCarlo
from pylda_tpu.parallel.mesh import make_mesh, host_gather
from pylda_tpu.utils.config import LDAConfig

train, test, vocab = load_input_directory(
    corpus_dir, process_index=rank, process_count=2
)
global_tokens = int(multihost_utils.process_allgather(
    jax.numpy.asarray(train.num_tokens)).sum())
mesh = make_mesh(shape=(4, 1))

cfg = LDAConfig(
    number_of_topics=5, doc_pad_multiple=4, seed=0,
    bucket_sizes=(32, 64), number_of_samples=2, burn_in_sweeps=1,
    inference_mode="gibbs",
)
gib = MonteCarlo(cfg)
gib.initialize(train, vocab, mesh=mesh)
lls = [gib.learning() for _ in range(2)]
n_kv = host_gather(gib._n_kv)
pp = gib.perplexity(test)

hyb = Hybrid(LDAConfig(
    number_of_topics=5, doc_pad_multiple=4, seed=0,
    bucket_sizes=(32, 64), number_of_samples=2, burn_in_sweeps=1,
    inference_mode="hybrid",
))
hyb.initialize(train, vocab, mesh=mesh)
elbos = [hyb.learning() for _ in range(2)]
hlam = float(np.asarray(host_gather(hyb.state.lam), dtype=np.float64).sum())

print(f"RESULT rank={rank} gtok={global_tokens} nkv={n_kv.sum():.1f} "
      f"nkvck={float(np.abs(n_kv).sum()):.4f} ll={lls[-1]:.2f} "
      f"pp={pp:.3f} helbo={elbos[-1]:.2f} hlam={hlam:.4f}", flush=True)
""")


def test_two_process_sampling_engines_conserve_counts(tmp_path):
    """Multi-host Gibbs + hybrid (SURVEY.md section 2.2 DP row): each
    host holds its doc block; the per-sweep n_kv rebuild crosses the
    process boundary.  Gate: global count-table conservation (sum n_kv
    == corpus tokens), bitwise rank agreement, finite objectives."""
    from pylda_tpu.corpus.datasets import make_denews_tiny

    corpus_dir = str(tmp_path / "corpus")
    make_denews_tiny(corpus_dir, num_train=120, num_test=30,
                     mean_doc_length=25)
    port = "12509"
    procs = [
        subprocess.Popen(
            [sys.executable, "-c", _SAMPLING_WORKER, str(r), port,
             corpus_dir],
            stdout=subprocess.PIPE, stderr=subprocess.STDOUT, text=True,
        )
        for r in range(2)
    ]
    results = {}
    for r, p in enumerate(procs):
        out, _ = p.communicate(timeout=600)
        assert p.returncode == 0, out[-3000:]
        line = [l for l in out.splitlines() if l.startswith("RESULT")][0]
        results[r] = dict(kv.split("=") for kv in line.split()[1:])
    # Count conservation across 2 hosts: no token lost or duplicated.
    assert float(results[0]["nkv"]) == float(results[0]["gtok"]), results
    # Ranks agree bitwise on tables, objectives, and the hybrid lambda.
    for k in ("nkvck", "ll", "pp", "helbo", "hlam"):
        assert results[0][k] == results[1][k], (k, results)
    import math

    assert math.isfinite(float(results[0]["ll"]))
    assert math.isfinite(float(results[0]["helbo"]))


_SVI_WORKER = textwrap.dedent("""
import os, sys
rank = int(sys.argv[1]); port = sys.argv[2]; corpus_dir = sys.argv[3]
os.environ["XLA_FLAGS"] = "--xla_force_host_platform_device_count=2"
import jax
jax.config.update("jax_platforms", "cpu")
jax.distributed.initialize(
    coordinator_address=f"localhost:{port}", num_processes=2, process_id=rank
)
import numpy as np
from pylda_tpu.corpus.datasets import load_input_directory
from pylda_tpu.models import StochasticVariationalBayes
from pylda_tpu.parallel.mesh import make_mesh
from pylda_tpu.utils.config import LDAConfig

train, test, vocab = load_input_directory(
    corpus_dir, process_index=rank, process_count=2
)
lam0 = np.random.default_rng(9).gamma(100.0, 0.01, size=(5, len(vocab)))
cfg = LDAConfig(
    number_of_topics=5, inference_mode="svi", batch_size=32, tau0=16.0,
    kappa=0.7, inner_iterations=20, doc_pad_multiple=4, seed=0,
    gamma_init="ones",
)
eng = StochasticVariationalBayes(cfg)
eng.initialize(train, vocab, lam_init=lam0, mesh=make_mesh(shape=(4, 1)))
ests = [eng.learning() for _ in range(2)]
lam_sum = float(np.asarray(eng.state.lam, dtype=np.float64).sum())
gamma = eng.gamma
gsum = float(gamma.sum())
pp = eng.perplexity(test)
print(f"RESULT rank={rank} est0={ests[0]:.4f} est1={ests[1]:.4f} "
      f"lam={lam_sum:.4f} gsum={gsum:.4f} pp={pp:.4f}", flush=True)
""")


def test_two_process_svi_matches_emulated_reference(tmp_path):
    """Doc-sharded multi-host SVI (BASELINE config 5): 2 processes, each
    streaming only its own doc block, fused epoch scan over the global
    mesh.  Both ranks must agree bitwise, and the run must match an
    in-process reference that feeds the SAME global minibatch sequence
    (reconstructed from the deterministic per-host permutations) through
    the unsharded epoch scan."""
    import jax
    import numpy as np

    from pylda_tpu.corpus.corpus import DenseBatch
    from pylda_tpu.corpus.datasets import (
        load_input_directory,
        make_denews_tiny,
    )
    from pylda_tpu.models import StochasticVariationalBayes
    from pylda_tpu.utils.config import LDAConfig

    corpus_dir = str(tmp_path / "corpus")
    make_denews_tiny(corpus_dir, num_train=120, num_test=30,
                     mean_doc_length=25)

    port = "12497"
    procs = [
        subprocess.Popen(
            [sys.executable, "-c", _SVI_WORKER, str(r), port, corpus_dir],
            stdout=subprocess.PIPE, stderr=subprocess.STDOUT, text=True,
        )
        for r in range(2)
    ]
    results = {}
    for r, p in enumerate(procs):
        out, _ = p.communicate(timeout=600)
        assert p.returncode == 0, out[-3000:]
        line = [l for l in out.splitlines() if l.startswith("RESULT")][0]
        results[r] = dict(kv.split("=") for kv in line.split()[1:])
    # Cross-host determinism: replicated lambda + assembled gamma agree.
    assert results[0]["lam"] == results[1]["lam"], results
    assert results[0]["gsum"] == results[1]["gsum"], results

    # In-process reference: identical global minibatches, unsharded.
    train, test, vocab = load_input_directory(corpus_dir)
    lam0 = np.random.default_rng(9).gamma(100.0, 0.01, size=(5, len(vocab)))
    cfg = LDAConfig(
        number_of_topics=5, inference_mode="svi", batch_size=32, tau0=16.0,
        kappa=0.7, inner_iterations=20, doc_pad_multiple=4, seed=0,
        gamma_init="ones",
    )
    eng = StochasticVariationalBayes(cfg)
    eng.initialize(train, vocab, lam_init=lam0)
    # Reconstruct the 2-host epoch construction: P=2, per=60,
    # rows_per_proc = 4 devices / 2 procs = 2, b_local = 16, 4 batches.
    P, total, per, b_local = 2, 120, 60, 16
    st = eng.state
    t = 0
    ref_ests = []
    for epoch in range(2):
        key, sub = jax.random.split(st.key)
        epoch_seed = epoch * 100003 + 0
        perms = {
            p: np.random.default_rng((epoch_seed, p)).permutation(per)
            for p in range(P)
        }
        fields = {"counts": [], "mask": [], "doc_ids": []}
        rhos, scales = [], []
        for i in range(4):
            blocks = [
                train.to_dense(
                    doc_indices=perms[p][i * b_local:(i + 1) * b_local]
                    + p * per,
                    pad_docs_to=b_local,
                )
                for p in range(P)
            ]
            for f in fields:
                fields[f].append(
                    np.concatenate([getattr(b, f) for b in blocks])
                )
            rhos.append((16.0 + t) ** (-0.7))
            docs_in = sum(
                min(b_local, max(0, per - i * b_local)) for _ in range(P)
            )
            scales.append(total / docs_in)
            t += 1
        stacked = DenseBatch(
            **{f: np.stack(v) for f, v in fields.items()}
        )
        lam_new, ests, _elog, _g = eng._jit_epoch_scan(
            st.lam, st.alpha, st.eta, sub, [jax.device_put(stacked)],
            None,  # docsels: dense-sstats plan is off process-local
            np.asarray(rhos, np.float32), np.asarray(scales, np.float32),
        )
        ref_ests.extend(float(x) for x in np.asarray(ests))
        st = st._replace(lam=lam_new, key=key)
    ref_lam = float(np.asarray(st.lam, dtype=np.float64).sum())
    got_lam = float(results[0]["lam"])
    assert abs(ref_lam - got_lam) < 1e-4 * abs(ref_lam), (ref_lam, got_lam)
    # Epoch-mean estimates agree (2 epochs of 4 batches each).
    got = [float(results[0]["est0"]), float(results[0]["est1"])]
    ref = [
        float(np.mean(ref_ests[:4])), float(np.mean(ref_ests[4:]))
    ]
    for a, b in zip(ref, got):
        assert abs(a - b) < 1e-3 * abs(a), (ref, got)


_SVI_RAGGED_WORKER = textwrap.dedent("""
import os, sys
rank = int(sys.argv[1]); port = sys.argv[2]; corpus_dir = sys.argv[3]
streaming = sys.argv[4] == "streaming"
os.environ["XLA_FLAGS"] = "--xla_force_host_platform_device_count=2"
import jax
jax.config.update("jax_platforms", "cpu")
jax.distributed.initialize(
    coordinator_address=f"localhost:{port}", num_processes=2, process_id=rank
)
import numpy as np
from pylda_tpu.corpus.datasets import load_input_directory
from pylda_tpu.models import StochasticVariationalBayes
from pylda_tpu.parallel.mesh import make_mesh
from pylda_tpu.utils.config import LDAConfig

train, test, vocab = load_input_directory(
    corpus_dir, process_index=rank, process_count=2, streaming=streaming
)
assert train.process_local and len(vocab) > 4096, len(vocab)
lam0 = np.random.default_rng(9).gamma(100.0, 0.01, size=(5, len(vocab)))
cfg = LDAConfig(
    number_of_topics=5, inference_mode="svi", batch_size=32, tau0=16.0,
    kappa=0.7, inner_iterations=20, doc_pad_multiple=4, seed=0,
    gamma_init="ones", bucket_sizes=(64, 128),
)
eng = StochasticVariationalBayes(cfg)
eng.initialize(train, vocab, lam_init=lam0, mesh=make_mesh(shape=(4, 1)))
caps = ",".join(f"{k}:{v}" for k, v in sorted(eng._svi_geometry.items()))
ests = [eng.learning() for _ in range(2)]
lam_sum = float(np.asarray(eng.state.lam, dtype=np.float64).sum())
gamma = eng.gamma
gsum = float(gamma.sum())

# Fused multi-epoch parity (round-3 verdict item 5): learning_many(2)
# on the process-local path = ONE collective dispatch via the stacked
# outer-epoch scan, with the key chain split exactly like the two
# sequential learning() calls above.
eng2 = StochasticVariationalBayes(cfg)
eng2.initialize(train, vocab, lam_init=lam0, mesh=make_mesh(shape=(4, 1)))
ests_f = eng2.learning_many(2)
lam_f = float(np.asarray(eng2.state.lam, dtype=np.float64).sum())
gsum_f = float(eng2.gamma.sum())
fused_lam_match = int(lam_f == lam_sum)
fused_est_match = int(
    all(abs(a - b) < 1e-9 * abs(a) for a, b in zip(ests, ests_f))
)
fused_gsum_match = int(abs(gsum_f - gsum) < 1e-6 * abs(gsum))
print(f"RESULT rank={rank} est0={ests[0]:.4f} est1={ests[1]:.4f} "
      f"lam={lam_sum:.4f} gsum={gsum:.4f} caps={caps} "
      f"fused_lam={fused_lam_match} fused_est={fused_est_match} "
      f"fused_gsum={fused_gsum_match}", flush=True)
""")


def _run_svi_ragged_workers(corpus_dir, port, mode):
    procs = [
        subprocess.Popen(
            [sys.executable, "-c", _SVI_RAGGED_WORKER, str(r), port,
             corpus_dir, mode],
            stdout=subprocess.PIPE, stderr=subprocess.STDOUT, text=True,
        )
        for r in range(2)
    ]
    results = {}
    for r, p in enumerate(procs):
        out, _ = p.communicate(timeout=600)
        assert p.returncode == 0, out[-3000:]
        line = [l for l in out.splitlines() if l.startswith("RESULT")][0]
        results[r] = dict(kv.split("=") for kv in line.split()[1:])
    return results


def _svi_ragged_reference(corpus_dir, n_epochs=2):
    """In-process emulation of the 2-host ragged SVI run: the SAME
    negotiated capacities, per-host permutations, bucket packing, and
    global row concatenation, driven through the unsharded epoch scan."""
    import jax
    import numpy as np

    from pylda_tpu.corpus.datasets import load_input_directory
    from pylda_tpu.models import StochasticVariationalBayes, layouts
    from pylda_tpu.utils.config import LDAConfig

    train, test, vocab = load_input_directory(corpus_dir)
    total = train.num_docs
    P = 2
    per = -(-total // P)
    b_local = 16  # ceil(batch_size=32 / P)
    n_batches = -(-per // b_local)
    local_counts = [max(0, min(per, total - p * per)) for p in range(P)]
    sizes = [64, 128]
    # Negotiated capacities: per-host expected rows, elementwise max.
    e = np.zeros((P, len(sizes)))
    for p in range(P):
        sub = train.subset(range(p * per, p * per + local_counts[p]))
        h = sub.ragged_row_histogram(sizes)
        f = min(1.0, b_local / max(1, local_counts[p]))
        e[p] = [h[s] * f for s in sizes]
    caps = layouts.svi_capacities_from_expected(
        sizes, dict(zip(sizes, e.max(axis=0))), pad=4
    )

    lam0 = np.random.default_rng(9).gamma(100.0, 0.01, size=(5, len(vocab)))
    cfg = LDAConfig(
        number_of_topics=5, inference_mode="svi", batch_size=32, tau0=16.0,
        kappa=0.7, inner_iterations=20, doc_pad_multiple=4, seed=0,
        gamma_init="ones", bucket_sizes=(64, 128),
    )
    eng = StochasticVariationalBayes(cfg)
    eng.initialize(train, vocab, lam_init=lam0)
    st = eng.state
    t = 0
    ests_all, gsum = [], None
    for epoch in range(n_epochs):
        key, sub_key = jax.random.split(st.key)
        epoch_seed = epoch * 100003 + 0
        perms = {
            p: np.random.default_rng((epoch_seed, p)).permutation(
                local_counts[p]
            )
            for p in range(P)
        }
        batch_lists, rhos, scales = [], [], []
        for i in range(n_batches):
            per_host = []
            for p in range(P):
                selp = perms[p][i * b_local : (i + 1) * b_local] + p * per
                per_host.append(
                    train.to_ragged_buckets(
                        bucket_sizes=sorted(caps), doc_pad_multiple=4,
                        doc_indices=selp, bucket_capacities=caps,
                    )
                )
            # Global bucket rows = concatenation of the host blocks —
            # exactly what make_array_from_process_local_data builds.
            batch_lists.append(
                [
                    type(bs[0])(
                        **{
                            f: np.concatenate(
                                [np.asarray(getattr(b, f)) for b in bs]
                            )
                            for f in type(bs[0]).__dataclass_fields__
                        }
                    )
                    for bs in zip(*per_host)
                ]
            )
            docs_in = sum(
                min(b_local, max(0, c - i * b_local)) for c in local_counts
            )
            scales.append(total / max(1, docs_in))
            rhos.append((16.0 + t) ** (-0.7))
            t += 1
        stacked = jax.tree.map(
            lambda *xs: np.stack([np.asarray(x) for x in xs]), *batch_lists
        )
        stacked = [jax.device_put(b) for b in stacked]
        lam_new, ests, _elog, gammas = eng._jit_epoch_scan(
            st.lam, st.alpha, st.eta, sub_key, stacked,
            None,  # docsels: dense-sstats plan is off process-local
            np.asarray(rhos, np.float32), np.asarray(scales, np.float32),
        )
        ests_all.append(float(np.mean(np.asarray(ests, dtype=np.float64))))
        st = st._replace(lam=lam_new, key=key)
        gamma = layouts.assemble_gamma(
            [
                np.asarray(b.doc_ids[i])
                for i in range(n_batches)
                for b in stacked
            ],
            [
                np.asarray(g[i])
                for i in range(n_batches)
                for g in gammas
            ],
            total,
            np.asarray(st.alpha),
        )
        gsum = float(gamma.sum())
    caps_str = ",".join(f"{k}:{v}" for k, v in sorted(caps.items()))
    lam_sum = float(np.asarray(st.lam, dtype=np.float64).sum())
    return ests_all, lam_sum, gsum, caps_str


def test_two_process_svi_ragged_matches_emulated_reference(tmp_path):
    """Process-sharded SVI on the RAGGED layout (BASELINE config 5's
    literal shape: doc-sharded SVI at V > dense threshold, each host
    streaming only its block): 2 processes negotiate one fixed bucket
    geometry, run fused sharded epoch scans, and must agree bitwise AND
    match an in-process emulation of the identical global minibatch
    sequence through the unsharded epoch scan."""
    corpus_dir = str(tmp_path / "corpus")
    _write_synthetic_text_corpus(corpus_dir)

    results = _run_svi_ragged_workers(corpus_dir, "12517", "memory")
    assert results[0]["lam"] == results[1]["lam"], results
    assert results[0]["gsum"] == results[1]["gsum"], results
    assert results[0]["caps"] == results[1]["caps"], results
    # Fused multi-epoch scan (one collective dispatch) == sequential
    # learning() calls, on both hosts (round-3 verdict item 5).
    for r in (0, 1):
        assert results[r]["fused_lam"] == "1", results
        assert results[r]["fused_est"] == "1", results
        assert results[r]["fused_gsum"] == "1", results

    ref_ests, ref_lam, ref_gsum, ref_caps = _svi_ragged_reference(corpus_dir)
    assert results[0]["caps"] == ref_caps, (results[0]["caps"], ref_caps)
    got_lam = float(results[0]["lam"])
    assert abs(ref_lam - got_lam) < 1e-4 * abs(ref_lam), (ref_lam, got_lam)
    got_gsum = float(results[0]["gsum"])
    assert abs(ref_gsum - got_gsum) < 1e-3 * abs(ref_gsum), (
        ref_gsum, got_gsum)
    for a, b in zip(
        ref_ests, [float(results[0]["est0"]), float(results[0]["est1"])]
    ):
        assert abs(a - b) < 1e-3 * abs(a), (ref_ests, results)


def test_two_process_svi_streaming_matches_memory(tmp_path):
    """The StreamingCorpus process-local SVI epoch (config 5's input
    pipeline: disk-backed offsets, documents parsed per minibatch) must
    reproduce the in-RAM process-local run exactly — same negotiated
    geometry, same minibatch sequence, same lambda."""
    corpus_dir = str(tmp_path / "corpus")
    _write_synthetic_text_corpus(corpus_dir)

    mem = _run_svi_ragged_workers(corpus_dir, "12521", "memory")
    stream = _run_svi_ragged_workers(corpus_dir, "12523", "streaming")
    for k in ("lam", "gsum", "caps", "est0", "est1"):
        assert mem[0][k] == stream[0][k], (k, mem, stream)


def test_two_process_sharded_input_matches_full_load(tmp_path):
    """Each host parses only its half of doc.dat; training must match a
    single-process full-corpus run (same math, psum'd stats)."""
    from pylda_tpu.corpus.datasets import (
        load_input_directory,
        make_denews_tiny,
    )
    from pylda_tpu.models import VariationalBayes
    from pylda_tpu.utils.config import LDAConfig

    corpus_dir = str(tmp_path / "corpus")
    make_denews_tiny(corpus_dir, num_train=120, num_test=30,
                     mean_doc_length=25)

    port = "12493"
    procs = [
        subprocess.Popen(
            [sys.executable, "-c", _SHARDED_WORKER, str(r), port, corpus_dir],
            stdout=subprocess.PIPE, stderr=subprocess.STDOUT, text=True,
        )
        for r in range(2)
    ]
    results = {}
    for r, p in enumerate(procs):
        out, _ = p.communicate(timeout=600)
        assert p.returncode == 0, out[-3000:]
        line = [l for l in out.splitlines() if l.startswith("RESULT")][0]
        results[r] = dict(kv.split("=") for kv in line.split()[1:])
    assert results[0]["lam"] == results[1]["lam"], results

    # Single-process reference on the SAME full corpus, padded to the
    # same global row count (2 hosts x 60 rows -> same batch layout).
    train, test, vocab = load_input_directory(corpus_dir)
    cfg = LDAConfig(
        number_of_topics=5, inner_iterations=20, doc_pad_multiple=4, seed=0,
        gamma_init="ones",
    )
    eng = VariationalBayes(cfg)
    eng.initialize(train, vocab)
    ref = [eng.learning() for _ in range(3)]
    ref_pp = eng.perplexity(test)
    assert abs(ref[-1] - float(results[0]["elbo"])) < 1e-3 * abs(ref[-1]), (
        ref, results)
    assert abs(ref_pp - float(results[0]["pp"])) < 1e-2 * ref_pp
    # gamma assembled in GLOBAL document order matches the full-load run.
    ref_gsum = float(eng.gamma.sum())
    assert abs(ref_gsum - float(results[0]["gsum"])) < 1e-3 * ref_gsum, (
        ref_gsum, results)


def test_two_process_training_matches_single():
    port = "12489"
    procs = [
        subprocess.Popen(
            [sys.executable, "-c", _WORKER, str(r), port],
            stdout=subprocess.PIPE, stderr=subprocess.STDOUT, text=True,
        )
        for r in range(2)
    ]
    outs = []
    for p in procs:
        out, _ = p.communicate(timeout=600)
        assert p.returncode == 0, out[-3000:]
        outs.append(out)
    results = {}
    for r, out in enumerate(outs):
        line = [l for l in out.splitlines() if l.startswith("RESULT")][0]
        results[r] = dict(
            kv.split("=") for kv in line.split()[1:]
        )
    # Both ranks see identical replicated state (cross-host determinism).
    assert results[0]["elbo0"] == results[1]["elbo0"], results
    assert results[0]["elbo1"] == results[1]["elbo1"], results
    assert results[0]["lam"] == results[1]["lam"], results

    # And the 2-process result matches an in-process single-mesh run of
    # the identical configuration.
    import numpy as np

    from pylda_tpu.corpus.synthetic import synthetic_corpus
    from pylda_tpu.models import VariationalBayes
    from pylda_tpu.utils.config import LDAConfig

    corpus, _, _ = synthetic_corpus(
        num_docs=64, num_topics=4, num_types=128, mean_doc_length=30, seed=5
    )
    lam0 = np.random.default_rng(9).gamma(100.0, 0.01, size=(4, 128))
    cfg = LDAConfig(
        number_of_topics=4, alpha_alpha=0.2, alpha_beta=0.02,
        inner_iterations=30, doc_pad_multiple=8, seed=0, gamma_init="ones",
    )
    eng = VariationalBayes(cfg)
    eng.initialize(corpus, lam_init=lam0)
    ref = [eng.learning() for _ in range(2)]
    assert abs(ref[0] - float(results[0]["elbo0"])) < 1e-3 * abs(ref[0])
    assert abs(ref[1] - float(results[0]["elbo1"])) < 1e-3 * abs(ref[1])
