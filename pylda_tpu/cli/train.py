"""Training launcher — the reference's ``launch_train.py`` surface.

Accepts the reference's flag names verbatim (SURVEY.md section 5 "Config /
flag system"): --input_directory, --output_directory, --number_of_topics,
--training_iterations, --alpha_alpha, --alpha_beta, --snapshot_interval,
--inference_mode, --hyper_parameter_optimize_interval; reference run
scripts work unchanged.  New TPU-era flags (mesh, SVI schedule, precision,
profiling) are additive.

Behaviour mirrors upstream:launch_train.py [UNVERIFIED] (SURVEY.md section
3.1): load doc.dat/voc.dat, create a timestamped output subdirectory whose
name encodes the config, loop ``engine.learning()`` printing per-iteration
wall time + log-likelihood, snapshot ``exp_beta-<i>`` and ``model-<i>``
every snapshot_interval, final model at the end.
"""

from __future__ import annotations

import argparse
import datetime
import os
import time
from typing import List, Optional

from pylda_tpu.corpus.datasets import load_input_directory
from pylda_tpu.utils.config import LDAConfig
from pylda_tpu.utils.metrics import MetricsLogger, is_host_zero

# Reference --inference_mode was possibly an integer selector (SURVEY.md
# section 9 open question 1); accept both spellings.
_MODE_ALIASES = {
    "0": "vb", "vb": "vb", "variational": "vb", "variational_bayes": "vb",
    "1": "gibbs", "gibbs": "gibbs", "mc": "gibbs", "monte_carlo": "gibbs",
    "2": "hybrid", "hybrid": "hybrid",
    "3": "svi", "svi": "svi", "online": "svi", "stochastic": "svi",
}


def build_parser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(
        prog="pylda-train",
        description="TPU-native LDA training (PyLDA-compatible flags)",
    )
    # -- reference flags --
    p.add_argument("--input_directory", required=True)
    p.add_argument("--output_directory", required=True)
    p.add_argument("--number_of_topics", type=int, required=True)
    p.add_argument("--training_iterations", type=int, default=50)
    p.add_argument("--alpha_alpha", type=float, default=-1.0,
                   help="doc-topic Dirichlet; <=0 means 1/K (reference default)")
    p.add_argument("--alpha_beta", type=float, default=-1.0,
                   help="topic-word Dirichlet; <=0 means 1/V (reference default)")
    p.add_argument("--snapshot_interval", type=int, default=10)
    p.add_argument("--hyper_parameter_optimize_interval", type=int, default=0)
    p.add_argument("--inference_mode", default="vb",
                   help="vb|gibbs|hybrid|svi (or reference ints 0/1/2)")
    # -- engine knobs --
    p.add_argument("--inner_iterations", type=int, default=50)
    p.add_argument("--convergence_threshold", type=float, default=1e-5)
    p.add_argument("--number_of_samples", type=int, default=10)
    p.add_argument("--burn_in_sweeps", type=int, default=5)
    # -- SVI --
    p.add_argument("--batch_size", type=int, default=256)
    p.add_argument("--tau0", type=float, default=64.0)
    p.add_argument("--kappa", type=float, default=0.7)
    # -- layout / parallelism --
    p.add_argument("--dense_vocab_threshold", type=int, default=4096)
    p.add_argument("--bucket_policy", default="auto",
                   choices=["auto", "fixed"],
                   help="ragged-layout bucket geometry: 'auto' plans a "
                        "corpus-adaptive slot-minimising geometry from "
                        "the unique-type histogram; 'fixed' (and any "
                        "explicit --bucket_sizes) uses the configured "
                        "boundaries")
    p.add_argument("--bucket_sizes", default=None,
                   help="comma-separated ragged bucket boundaries "
                        "(e.g. 64,128,256,2048); implies a fixed "
                        "geometry")
    p.add_argument("--sstats_mode", default="auto",
                   choices=["auto", "scatter", "dense"],
                   help="ragged-layout sufficient statistics: 'auto' uses "
                        "the scatter-free dense-matmul form when the "
                        "corpus-static dense counts fit the HBM budget "
                        "(~1.4x faster end-to-end on v5e); 'scatter' "
                        "forces the in-bucket segment-sum")
    p.add_argument("--sstats_dense_total_budget_mb", type=int, default=4096,
                   help="HBM budget for the dense sstats counts matrix; "
                        "above it 'auto' falls back to scatter")
    p.add_argument("--sstats_kernel", default="auto",
                   choices=["auto", "xla", "pallas"],
                   help="dense-sstats backend: 'pallas' fuses the "
                        "phinorm->ratio->sstats chain in VMEM "
                        "(ops/pallas_sstats.py); 'auto' = pallas on "
                        "TPU, xla on CPU")
    p.add_argument("--topic_sampler", default="auto",
                   choices=["auto", "cdf", "gumbel", "race"],
                   help="batched categorical draw in the Gibbs/hybrid "
                        "position scan: 'auto' picks by K (inverse-CDF "
                        "below the measured K~400 crossover, log-domain "
                        "gumbel above it — scripts/sampler_ab.py); "
                        "'cdf', 'gumbel' (original formulation), "
                        "'race' (exponential races) force one")
    p.add_argument("--sampler_block_positions", type=int, default=None,
                   help="positions sampled per within-doc scan step "
                        "(Gibbs/hybrid): 1 = exact sequential; B > 1 = "
                        "leave-block-out approximation, large sweep "
                        "speedups on TPU (default: the config default)")
    p.add_argument("--gibbs_rebuild_interval", type=int, default=None,
                   help="Gibbs: rebuild the [K,V] count table every R "
                        "fused sweeps (1 = exact per-sweep AD-LDA sync; "
                        "R=2 measured 1.33x on a v5e with the same "
                        "joint-LL plateau — staleness slows early "
                        "mixing only; single-process scan path, "
                        "ignored with a warning under --mesh; "
                        "default: the config default)")
    p.add_argument("--slice_samples", type=int, default=None,
                   help="Wallach slice-sampler draws per hyperopt call "
                        "(Gibbs; default: the config default)")
    p.add_argument("--slice_step", type=float, default=None,
                   help="slice-sampler initial bracket step in log "
                        "space (default: the config default)")
    p.add_argument("--hybrid_persistent_z", action="store_true",
                   help="hybrid: carry per-doc topic assignments across "
                        "iterations (measured slightly worse on the "
                        "point-estimate metric; default off)")
    p.add_argument("--doc_pad_multiple", type=int, default=None,
                   help="row-count alignment for batch layouts "
                        "(default: the config default)")
    p.add_argument("--estep_stall_patience", type=int, default=None,
                   help="sweeps without 1%% best-change improvement "
                        "before a row counts as stalled; 0 disables "
                        "(default: the config default)")
    p.add_argument("--estep_memory_budget_mb", type=int, default=None,
                   help="cap on per-chunk E-step work arrays "
                        "(default: the config default)")
    p.add_argument("--sstats_dense_budget_mb", type=int, default=None,
                   help="per-chunk budget for the dense sstats counts "
                        "matrix (default: the config default)")
    p.add_argument("--svi_device_rows_budget_mb", type=int, default=None,
                   help="device-resident corpus rows budget for SVI; 0 "
                        "forces the host-repack streaming path "
                        "(default: the config default)")
    p.add_argument("--use_pallas", default=None,
                   choices=["never", "always"],
                   help="route dense/ragged E-steps through the fused "
                        "Pallas kernels (measured default: never)")
    p.add_argument("--mesh", default=None,
                   help="data,model mesh shape, e.g. 8,1 or 4,2")
    p.add_argument("--shard_vocab", action="store_true")
    p.add_argument("--shard_topics", action="store_true",
                   help="shard lambda's topic axis over the model mesh "
                        "axis (exclusive with --shard_vocab)")
    p.add_argument("--coordinator_address", default=None,
                   help="multi-host: ip:port of process 0")
    p.add_argument("--num_processes", type=int, default=None)
    p.add_argument("--process_id", type=int, default=None)
    p.add_argument("--process_sharded_input", action="store_true",
                   help="multi-host: each host parses only its contiguous "
                        "block of doc.dat (dense layout, VB engine)")
    p.add_argument("--streaming_input", action="store_true",
                   help="SVI: disk-backed minibatch source — host RAM "
                        "holds line offsets only; docs parse on demand "
                        "per minibatch (corpora larger than host RAM)")
    # -- misc --
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--dtype", default="float32")
    p.add_argument("--compute_dtype", default="float32",
                   choices=["float32", "bfloat16"],
                   help="bfloat16 = mixed-precision E-step contractions "
                        "(bf16 inputs, f32 accumulation)")
    p.add_argument("--gamma_init", default=None,
                   choices=["gamma", "normal", "ones"],
                   help="per-E-step cold-start init (default: the "
                        "config default, ones)")
    p.add_argument("--checkpoint_format", default="npz",
                   choices=["npz", "orbax"],
                   help="model-<N> snapshots as one npz file (default) or "
                        "an orbax/tensorstore checkpoint directory")
    p.add_argument("--profile_dir", default=None,
                   help="capture a jax.profiler trace into this directory")
    p.add_argument("--phase_timing", action="store_true",
                   help="measure per-phase device times (e-step per "
                        "batch, m-step, bound, hyper updates) once after "
                        "training and log them to metrics.jsonl")
    p.add_argument("--coherence", action="store_true",
                   help="log mean UMass topic coherence (scored on the "
                        "training corpus) at every snapshot interval")
    p.add_argument("--async_checkpoint", action="store_true",
                   help="write periodic model-<N> snapshots from a "
                        "background thread (the collective host-gather "
                        "stays synchronous; only the disk IO moves off "
                        "the train loop)")
    p.add_argument("--roofline", action="store_true",
                   help="log the analytic per-phase FLOP/HBM cost model "
                        "and roofline-bound times (v5e peaks) to "
                        "metrics.jsonl at startup")
    p.add_argument("--tensorboard_dir", default=None,
                   help="write per-iteration scalars (log likelihood, "
                        "docs/sec, held-out perplexity) as TensorBoard "
                        "events into this directory")
    p.add_argument("--resume", default=None,
                   help="path to a model-<N> checkpoint to resume from")
    p.add_argument("--dump_gamma", action="store_true",
                   help="also write per-document gamma-<N> at snapshots "
                        "(SURVEY.md section 9 open question 3)")
    return p


def config_from_args(args) -> LDAConfig:
    mode = _MODE_ALIASES.get(str(args.inference_mode).lower())
    if mode is None:
        raise SystemExit(f"unknown --inference_mode: {args.inference_mode}")
    return LDAConfig(
        number_of_topics=args.number_of_topics,
        alpha_alpha=None if args.alpha_alpha <= 0 else args.alpha_alpha,
        alpha_beta=None if args.alpha_beta <= 0 else args.alpha_beta,
        training_iterations=args.training_iterations,
        snapshot_interval=args.snapshot_interval,
        hyper_parameter_optimize_interval=(
            args.hyper_parameter_optimize_interval
        ),
        inference_mode=mode,
        inner_iterations=args.inner_iterations,
        convergence_threshold=args.convergence_threshold,
        number_of_samples=args.number_of_samples,
        burn_in_sweeps=args.burn_in_sweeps,
        batch_size=args.batch_size,
        tau0=args.tau0,
        kappa=args.kappa,
        dense_vocab_threshold=args.dense_vocab_threshold,
        bucket_policy=args.bucket_policy,
        **(
            {"bucket_sizes": tuple(
                int(x) for x in args.bucket_sizes.split(","))}
            if args.bucket_sizes else {}
        ),
        sstats_mode=args.sstats_mode,
        sstats_dense_total_budget_mb=args.sstats_dense_total_budget_mb,
        sstats_kernel=args.sstats_kernel,
        topic_sampler=args.topic_sampler,
        **(
            {"sampler_block_positions": args.sampler_block_positions}
            if args.sampler_block_positions is not None
            else {}
        ),
        **(
            {"gibbs_rebuild_interval": args.gibbs_rebuild_interval}
            if args.gibbs_rebuild_interval is not None
            else {}
        ),
        **{
            k: getattr(args, k)
            for k in (
                "slice_samples", "slice_step", "doc_pad_multiple",
                "estep_stall_patience", "estep_memory_budget_mb",
                "sstats_dense_budget_mb", "svi_device_rows_budget_mb",
                "use_pallas",
            )
            if getattr(args, k) is not None
        },
        **({"hybrid_persistent_z": True} if args.hybrid_persistent_z
           else {}),
        mesh_shape=(
            tuple(int(x) for x in args.mesh.split(",")) if args.mesh else None
        ),
        shard_vocab=args.shard_vocab,
        shard_topics=args.shard_topics,
        seed=args.seed,
        dtype=args.dtype,
        compute_dtype=args.compute_dtype,
        **(
            {"gamma_init": args.gamma_init}
            if args.gamma_init is not None
            else {}
        ),
        checkpoint_format=args.checkpoint_format,
    ).validate()


def output_run_directory(args, config: LDAConfig) -> str:
    """Reference-style run dir: <out>/<corpus>/<timestamp>-lda-I..-S..-K..
    -aa..-ab..-im.. (config is readable from the path; SURVEY.md 2.1 row 1).
    """
    corpus_name = os.path.basename(os.path.normpath(args.input_directory))
    ts = datetime.datetime.now().strftime("%y%m%d-%H%M%S")
    aa = config.alpha_alpha if config.alpha_alpha else config.resolved_alpha()
    ab = config.alpha_beta if config.alpha_beta else 0.0
    suffix = (
        f"{ts}-lda-I{config.training_iterations}"
        f"-S{config.snapshot_interval}-K{config.number_of_topics}"
        f"-aa{aa:g}-ab{ab:g}-im{config.inference_mode}"
    )
    return os.path.join(args.output_directory, corpus_name, suffix)


def main(argv: Optional[List[str]] = None) -> int:
    args = build_parser().parse_args(argv)
    config = config_from_args(args)

    from pylda_tpu.parallel.mesh import init_distributed, make_mesh

    init_distributed(
        args.coordinator_address, args.num_processes, args.process_id
    )
    mesh = None
    if config.mesh_shape is not None:
        mesh = make_mesh(shape=config.mesh_shape)

    if args.streaming_input and config.inference_mode != "svi":
        raise SystemExit("--streaming_input requires --inference_mode=svi")
    if args.process_sharded_input:
        import jax

        train, test, vocab = load_input_directory(
            args.input_directory,
            process_index=jax.process_index(),
            process_count=jax.process_count(),
            streaming=args.streaming_input,
        )
    else:
        train, test, vocab = load_input_directory(
            args.input_directory, streaming=args.streaming_input
        )
    run_dir = output_run_directory(args, config)
    if is_host_zero():
        os.makedirs(run_dir, exist_ok=True)
    metrics = MetricsLogger(run_dir)
    # In process-sharded mode each host holds 1/P of the docs; report
    # corpus-wide counts (token total via a cross-host sum).
    global_docs = train.global_num_docs
    global_tokens = train.num_tokens
    if getattr(train, "process_local", False):
        import jax
        from jax.experimental import multihost_utils

        global_tokens = int(
            multihost_utils.process_allgather(
                jax.numpy.asarray(train.num_tokens)
            ).sum()
        )
    metrics.log(
        event="start",
        corpus=args.input_directory,
        documents=global_docs,
        types=len(vocab),
        tokens=global_tokens,
        mode=config.inference_mode,
        K=config.number_of_topics,
        mesh=str(config.mesh_shape),
    )

    from pylda_tpu.models import Inferencer, make_engine

    if args.resume:
        engine = Inferencer.load(args.resume, corpus=train, mesh=mesh)
        start_iter = engine._counter
        metrics.log(event="resume", checkpoint=args.resume, iteration=start_iter)
    else:
        engine = make_engine(config)
        engine.initialize(train, vocab, mesh=mesh)
        start_iter = 0

    if args.roofline and hasattr(engine, "_batches"):
        from pylda_tpu.utils.roofline import estep_cost_model

        for phase, row in estep_cost_model(engine).items():
            metrics.log(event="roofline", phase=phase, **{
                k: (round(v, 4) if isinstance(v, float) else v)
                for k, v in row.items()
            })

    tb_writer = None
    if args.tensorboard_dir and is_host_zero():
        try:
            from flax.metrics import tensorboard as _tb

            tb_writer = _tb.SummaryWriter(args.tensorboard_dir)
        except Exception as e:  # optional dependency path
            metrics.log(event="tensorboard_unavailable", error=str(e))

    if args.profile_dir:
        import jax

        jax.profiler.start_trace(args.profile_dir)

    # Iterations run in fused on-device chunks (learning_many) between
    # snapshot boundaries — one dispatch per chunk instead of one per
    # iteration, which is the dominant cost when dispatch latency is high.
    it = start_iter
    while it < config.training_iterations:
        snap = config.snapshot_interval
        to_snap = (
            snap - (it % snap) if snap > 0 else config.training_iterations - it
        )
        chunk = min(to_snap, config.training_iterations - it)
        t0 = time.time()
        lls = engine.learning_many(chunk)
        dt = (time.time() - t0) / max(1, len(lls))
        for j, ll in enumerate(lls):
            metrics.log(
                event="iteration",
                iteration=it + j + 1,
                seconds=round(dt, 3),
                log_likelihood=ll,
                docs_per_sec=round(global_docs / max(dt, 1e-9), 2),
            )
            if tb_writer is not None:
                tb_writer.scalar("train/log_likelihood", ll, it + j + 1)
                tb_writer.scalar(
                    "train/docs_per_sec",
                    global_docs / max(dt, 1e-9), it + j + 1,
                )
        it += chunk
        # Snapshot work runs on EVERY host — export_beta/save/gamma
        # gather sharded state collectively and write from host 0 only;
        # perplexity's frozen-lambda E-step is likewise collective.
        if snap > 0 and it % snap == 0:
            engine.export_beta(
                os.path.join(run_dir, f"exp_beta-{it}"), top_k=50
            )
            engine.save(os.path.join(run_dir, f"model-{it}"),
                        async_write=args.async_checkpoint)
            if args.coherence and getattr(train, "_uniques", None) is not None:
                from pylda_tpu.utils.coherence import engine_coherence

                coh = engine_coherence(engine, train)
                metrics.log(event="coherence", iteration=it,
                            mean_umass=round(coh["mean"], 4),
                            top_n=coh["top_n"])
            if args.dump_gamma and getattr(engine, "gamma", None) is not None:
                if is_host_zero():
                    import numpy as np

                    np.savetxt(
                        os.path.join(run_dir, f"gamma-{it}"),
                        engine.gamma, fmt="%.8g", delimiter="\t",
                    )
            if test is not None:
                pp = engine.perplexity(test)
                metrics.log(
                    event="heldout", iteration=it, perplexity=round(pp, 4)
                )
                if tb_writer is not None and is_host_zero():
                    tb_writer.scalar("eval/perplexity", pp, it)

    if args.profile_dir:
        import jax

        jax.profiler.stop_trace()

    if args.phase_timing:
        times = engine.phase_timings()
        if times:
            metrics.log(event="phase_timing", **times)

    if args.roofline and hasattr(engine, "_batches"):
        # Post-training occupancy: MEASURED per-phase times next to
        # their roofline bounds at the converged sweep counts (the
        # pre-training block above logged the analytic model only).
        from pylda_tpu.utils.roofline import roofline_report

        try:
            for phase, r in roofline_report(engine).items():
                if phase == "sweep_counts":
                    metrics.log(event="roofline_measured",
                                phase=phase, counts=r)
                else:
                    metrics.log(event="roofline_measured", phase=phase, **r)
        except Exception as e:  # never sink a finished run on a report
            metrics.log(event="roofline_measured_failed", error=str(e))

    n = config.training_iterations
    # Every host participates (collective gathers/evals); host 0 writes.
    engine.export_beta(os.path.join(run_dir, f"exp_beta-{n}"), top_k=50)
    engine.save(os.path.join(run_dir, f"model-{n}"))
    engine.wait_for_checkpoint()
    if test is not None:
        metrics.log(
            event="final",
            perplexity=round(engine.perplexity(test), 4),
            run_dir=run_dir,
        )
    if tb_writer is not None:
        tb_writer.flush()
        tb_writer.close()
    metrics.close()
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
