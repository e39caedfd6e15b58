"""Configuration for the TPU-native LDA engines.

The reference configures everything through ``optparse`` flags on its two
launchers (SURVEY.md section 5 "Config / flag system",
upstream:launch_train.py [UNVERIFIED]).  We keep the exact same flag names on
our CLI (see ``pylda_tpu.cli``) and centralise them in one dataclass, plus
the new TPU-specific knobs (mesh shape, minibatch size, SVI schedule,
precision, bucketing policy) that have no reference counterpart.
"""

from __future__ import annotations

import dataclasses
from typing import Optional, Tuple


@dataclasses.dataclass
class LDAConfig:
    """All knobs for corpus layout, inference engine, and training loop.

    Reference-parity fields keep the reference's flag names verbatim
    (``number_of_topics``, ``alpha_alpha``, ``alpha_beta``,
    ``training_iterations``, ``snapshot_interval``, ``inference_mode``,
    ``hyper_parameter_optimize_interval``) so reference run scripts map
    one-to-one.
    """

    # ----- model (reference flags) -----
    number_of_topics: int = 10
    # Dirichlet hyperparameters.  The reference uses a negative sentinel for
    # "unset" and then defaults alpha_alpha = 1/K, alpha_beta = 1/V
    # (SURVEY.md section 5).  ``None`` or a negative value means "use the
    # default".
    alpha_alpha: Optional[float] = None
    alpha_beta: Optional[float] = None

    # ----- training loop (reference flags) -----
    training_iterations: int = 50
    snapshot_interval: int = 10
    # 0 or negative disables hyperparameter optimization (reference default
    # behaviour is off unless the interval flag is passed [UNVERIFIED]).
    hyper_parameter_optimize_interval: int = 0

    # Engine selection: "vb" | "gibbs" | "hybrid" | "svi".  The reference's
    # --inference_mode selects among VariationalBayes / MonteCarlo / Hybrid
    # (SURVEY.md section 2.1 rows 4-6); "svi" is our minibatch extension
    # mandated by BASELINE.json:10-11.
    inference_mode: str = "vb"

    # ----- E-step fixed point (SURVEY.md section 8.1) -----
    # The reference iterates each document's gamma/phi fixed point up to
    # ~50 times with a per-document early exit at mean|dgamma| < 1e-6
    # (SURVEY.md section 3.1).  On TPU we run a batched while_loop with a
    # convergence criterion over the whole batch (max over docs of
    # mean|dgamma|); parity is judged on perplexity, not iteration counts
    # (SURVEY.md section 7.3).
    inner_iterations: int = 50
    convergence_threshold: float = 1e-5
    # Per-document gamma initialisation for the local fixed point.
    # "ones" (default) = deterministic all-ones: the init is a COLD
    # START re-drawn fresh for every E-step (and every SVI minibatch);
    # symmetry is already broken by the random lambda, and the random
    # draw's only measurable effect was its own cost — the reference's
    # Gamma(100, 0.01) rejection sampler measured +37% on the config-4
    # SVI epoch vs its N(1, 0.1) CLT surrogate ("normal"), and the
    # surrogate's remaining threefry draw another +14%; held-out
    # perplexity across configs 4/5 was within +-0.6% (both directions)
    # between all three.  "gamma" = the exact reference-style draw
    # (SURVEY.md 3.1); "normal" = the cheap stochastic surrogate.
    gamma_init: str = "ones"

    # ----- sampling engines (SURVEY.md sections 8.2, 8.3) -----
    number_of_samples: int = 10  # kept sweeps averaged into phi-stats (hybrid)
    burn_in_sweeps: int = 5

    # Batched categorical draw inside the within-doc position scan
    # (ops/sampling.sample_doc_topics): "cdf" = probability-domain
    # inverse-CDF (one [L, D] uniform tensor per sweep, no per-position
    # transcendentals — the position scan is the measured Gibbs sweep
    # bottleneck, scripts/gibbs_decompose.py); "gumbel" = log-domain
    # jax.random.categorical per position (original formulation, kept
    # for A/B); "race" = exponential races (one [L, D, K] draw up
    # front, mul/argmax per position).  Same distribution, different
    # random streams.  "auto" decides from the two cost models
    # (utils/roofline.py): cdf's prefix sum is a [D,K]x[K,K] matmul per
    # position — 2*K^2 MXU flops/slot — while gumbel draws K uniforms +
    # logs per slot on the VPU with the per-draw fixed overhead
    # amortised over the B positions of a block.  Equating them gives a
    # crossover K*(B) = c1 + c2/B that is INDEPENDENT of D, L, and V
    # (both sides scale with slot count; V enters neither inner loop).
    # Calibrated on-chip over a (K x B x V) grid
    # (scripts/sampler_grid.py, v5e, 22 cells, K in 384..1000, B in
    # {1,8}, V in {10k,50k}): cdf_speedup crosses 1.0 at K ~ 850 (B=1)
    # and K ~ 700 (B=8); the V=50k ratios match V=10k within noise,
    # confirming V-independence.  Fit: K* = 680 + 170/B.
    topic_sampler: str = "auto"

    def resolved_topic_sampler(self) -> str:
        """Concrete sampler for topic_sampler="auto": inverse-CDF up to
        the calibrated crossover K*(B) = 680 + 170/B (measured grid —
        see the topic_sampler comment), log-domain gumbel above it (the
        exact formulation, and fastest at large K)."""
        if self.topic_sampler != "auto":
            return self.topic_sampler
        k_star = 680.0 + 170.0 / max(1, self.sampler_block_positions)
        return "cdf" if self.number_of_topics <= k_star else "gumbel"

    # Positions sampled per within-document scan step (Gibbs/hybrid).
    # 1 = exact sequential within-doc Gibbs.  B > 1 samples B positions
    # of each document from one shared n_dk (leave-block-out) — the
    # within-document analog of the per-sweep AD-LDA approximation.
    # Counts stay exactly conserved for any B.  Measured on the config-3
    # shape (scripts/gibbs_block_ab.py, v5e): B=8 is 1.22x the B=1
    # sweep with joint-LL and held-out perplexity inside the B=1 noise
    # band (9285 vs 9326 after 40 sweeps — nominally better).
    sampler_block_positions: int = 8

    # Gibbs only: rebuild the [K, V] topic-word count table (and its
    # sampling factor) every R fused sweeps instead of every sweep.
    # R = 1 (default) is the exact per-sweep AD-LDA synchronisation the
    # reference path models.  R > 1 extends the same approximation in
    # TIME (the factor is R-1 sweeps stale, exactly as AD-LDA's
    # per-worker factor is one sweep stale in SPACE); tables are exact
    # again at every rebuild boundary, at the end of every
    # learning_many chunk, and for every likelihood/hyperopt/export
    # surface.  The rebuild scatter is per-index-bound at ~62% of the
    # sweep (round-5 trace), so R=2 is ~1.4x throughput; measured
    # quality at config 3: see BENCH_SUITE round 5.  Single-process
    # scan path only (ignored under a mesh and by learning()).
    gibbs_rebuild_interval: int = 1

    # Hybrid only: carry each document's topic assignments z across
    # training iterations (warm chains) instead of re-drawing random z
    # every iteration.  Measured at matched wall-clock on the config-3
    # shape (scripts/sampling_quality_study.py): warm chains stabilise
    # the NATIVE (E[log beta]-bound) perplexity trajectory but are
    # slightly WORSE on the convention-neutral point-estimate metric
    # (8492 vs 8124 cold-start; Gibbs 7704) — the apparent cold-start
    # "divergence" was the scoring convention's Jensen penalty growing
    # as lambda sharpens, not a model regression.  Default stays False
    # (the Mimno 2012 cold-start scheme); chains checkpoint/restore
    # when enabled.
    hybrid_persistent_z: bool = False

    # ----- Wallach slice sampler (Gibbs hyperopt; SURVEY.md section 8.2) ---
    slice_samples: int = 5
    slice_step: float = 3.0

    # ----- SVI (SURVEY.md section 8.4) -----
    batch_size: int = 256
    tau0: float = 64.0
    kappa: float = 0.7

    # ----- data layout (TPU-specific; SURVEY.md section 7.3 "Raggedness") --
    # Below this vocabulary size the corpus is materialised as a dense
    # doc-term count matrix (pure matmul E-step on the MXU); above it we use
    # length-bucketed padded (ids, counts) with segment-sum scatter.
    dense_vocab_threshold: int = 4096
    # Token-axis bucket boundaries for the ragged layout; docs are padded up
    # to the smallest bucket that fits their unique-type count.  Multiples of
    # 128 keep the lane dimension aligned (pallas_guide.md "Tiling").
    bucket_sizes: Tuple[int, ...] = (64, 128, 256, 512, 1024, 2048)
    # "auto" (default): plan a corpus-adaptive slot-minimising geometry
    # from the unique-type histogram (models/layouts.plan_bucket_sizes;
    # measured 77.6% -> 91%+ slot occupancy on the flagship bench shape)
    # whenever bucket_sizes is left at its default and the corpus is
    # in-RAM and not process-sharded; "fixed" always uses bucket_sizes.
    # An explicitly non-default bucket_sizes always wins (it is the
    # user's geometry, and process-local hosts must agree on keys).
    bucket_policy: str = "auto"
    # Pad the document axis of every bucket to a multiple of this to bound
    # the number of distinct compiled shapes.
    doc_pad_multiple: int = 64
    # Sufficient-statistics strategy for the ragged (large-vocab) layout:
    # "auto" computes sstats + token score against a corpus-static dense
    # counts matrix (two MXU matmuls; ~4x faster than any TPU scatter
    # variant — ops/estep.estep_dense_sstats) whenever the feasibility
    # gates pass (budget / single-process); "scatter" keeps the row
    # segment-sum inside each bucket (the only option for multi-host
    # process-local input); "dense" is an explicit alias for the matmul
    # form (same gates — it exists so A/Bs can name the path).  On the
    # SVI minibatch path dense-when-feasible is measurement-backed
    # across a 6-cell grid (scripts/svi_sstats_ab.py, round 5, after
    # the vocab-pre-split fix): dense 1.23-1.81x faster than scatter at
    # every (K, V, B) in {200,500,1000} x {50k,100k} x {1024,2048} —
    # the round-4 config-4 regression was the per-minibatch full-corpus
    # repack, not the matmul form.
    sstats_mode: str = "auto"
    # Per-chunk budget for the dense sstats counts matrix; docs are
    # chunked so each [rows, V] f32 chunk stays under this (bounds the
    # [rows, V] phinorm temporary of each estep_dense_sstats call).
    sstats_dense_budget_mb: int = 512
    # Stall-aware convergence for the batched gamma fixed point
    # (ops/estep._ragged_sweep_loop docstring has the full measured
    # story).  A row is done when mean|dgamma| < convergence_threshold
    # (the reference's per-document test) OR when it has gone this many
    # consecutive sweeps without improving its best change by >= 1% —
    # i.e. it sits at the bf16-rounded map's noise floor, where XLA's
    # TPU dot demotion leaves ~40% of rows limit-cycling at ~3e-3 once
    # lambda sharpens, and extra sweeps buy nothing (measured: the
    # 1e-5 threshold NEVER fires at steady state without this, so
    # every row paid the full 50-sweep cap while p50 of rows was done
    # by sweep ~11).  0 disables (pure threshold/cap semantics).
    estep_stall_patience: int = 6
    # E-step batch memory budget: rows per chunk are capped so the
    # [rows, T, K] (ragged) / [rows, V] (dense) work arrays stay under
    # this.  Shared by the host repack (models/layouts.build_vb_batches)
    # and the SVI device-gather path so their chunk layouts — hence RNG
    # streams and convergence granularity — match exactly.
    estep_memory_budget_mb: int = 512
    # TOTAL budget for the corpus-static dense counts matrix: every
    # chunk is device-resident for the whole run, so "auto" falls back
    # to the scatter path when num_docs * V * 4 bytes exceeds this.
    sstats_dense_total_budget_mb: int = 4096

    # SVI device-resident minibatching (single-process ragged layout):
    # the corpus's ragged rows live on device once, and each epoch ships
    # only tiny per-minibatch ROW-INDEX arrays — the fused epoch scan
    # gathers its minibatch buckets on device.  Replaces the per-epoch
    # host repack (~0.25 s/epoch at the config-4 shape) and the per-epoch
    # corpus re-upload (~50 MB through a tunnel) with ~100 KB of
    # indices.  Disk-backed (StreamingCorpus) input qualifies too: its
    # rows materialise once at init (via the memmapped row sidecar when
    # present) and epochs never touch the disk again.  Auto-disabled
    # when the rows exceed this budget (the corpora-larger-than-HBM
    # regime the host-repack streaming path exists for) and for
    # process-local corpora (each host re-parses its block).
    svi_device_rows_budget_mb: int = 2048

    # Backend for the scatter-free dense sufficient statistics
    # (sstats_mode="auto" path): "xla" = ops/estep.estep_dense_sstats
    # (two MXU matmuls through a materialised [D, V] phinorm), "pallas" =
    # ops/pallas_sstats.pallas_dense_sstats (phinorm tiled through VMEM,
    # never written to HBM).  Same reduction either way (exact on-chip
    # parity, scripts/sstats_kernel_ab.py); "auto" resolves to pallas on
    # a TPU backend and xla elsewhere (interpret-mode Pallas on CPU is
    # correct but slow).  Measured in-engine at the flagship shape
    # (round 5, at the 6 ms pass): 6.10 ms/pass pallas vs 7.00 xla
    # (+14.8% — the kernel's fixed saving is a larger fraction of the
    # much faster pass than the round-2 +4.6%).
    sstats_kernel: str = "auto"

    def resolved_sstats_kernel(self, backend: str) -> str:
        """Concrete kernel for sstats_mode="auto" dense sufficient
        statistics on the given jax.default_backend()."""
        if self.sstats_kernel != "auto":
            return self.sstats_kernel
        return "xla" if backend == "cpu" else "pallas"

    # ----- kernels -----
    # "never" | "always": route dense-batch E-steps through the fused
    # Pallas VMEM-resident kernel (ops/pallas_estep.py).  Experimental:
    # correctness-tested (matches the XLA path within f32 fixed-point
    # noise), but on the current toolchain Mosaic scheduling loses to
    # XLA's fusion at most shapes, so the default stays "never".
    use_pallas: str = "never"

    # ----- numerics -----
    dtype: str = "float32"
    # Mixed precision for the E-step contractions: "bfloat16" casts the
    # matmul/gather INPUTS to bf16 (halving the dominant HBM traffic and
    # engaging the MXU's native dtype) while every accumulator, gamma,
    # and all state stay float32.  Parity gate: perplexity (tests).
    compute_dtype: str = "float32"
    # Floor added to phi normalisers before division/log; the f32 analog of
    # the reference-style 1e-100 f64 guard (SURVEY.md section 7.3 "f32 vs
    # f64").
    eps: float = 1e-30

    # ----- parallelism (no reference counterpart; BASELINE.json:5,11) -----
    # Mesh shape as (data, model).  None → (n_devices, 1).
    mesh_shape: Optional[Tuple[int, int]] = None
    # Shard lambda's vocab axis over the "model" mesh axis (tensor
    # parallelism for K*V at K=1000, V=100k; SURVEY.md section 2.2).
    shard_vocab: bool = False
    # Shard lambda's topic axis instead (the expert-parallelism analog:
    # each shard owns K/P topics; SURVEY.md section 2.2 "EP").  Exclusive
    # with shard_vocab.
    shard_topics: bool = False

    # ----- checkpointing -----
    # "npz" (single file) or "orbax" (directory via orbax/tensorstore;
    # SURVEY.md section 5 "Checkpoint / resume").  load() auto-detects.
    checkpoint_format: str = "npz"

    # ----- misc -----
    seed: int = 0

    def resolved_alpha(self) -> float:
        a = self.alpha_alpha
        if a is None or a <= 0:
            return 1.0 / self.number_of_topics
        return float(a)

    def resolved_eta(self, num_types: int) -> float:
        b = self.alpha_beta
        if b is None or b <= 0:
            return 1.0 / num_types
        return float(b)

    def validate(self) -> "LDAConfig":
        if self.number_of_topics <= 0:
            raise ValueError("number_of_topics must be positive")
        if self.inference_mode not in ("vb", "gibbs", "hybrid", "svi"):
            raise ValueError(f"unknown inference_mode: {self.inference_mode}")
        if self.inner_iterations <= 0:
            raise ValueError("inner_iterations must be positive")
        if not 0.5 < self.kappa <= 1.0:
            raise ValueError("kappa must be in (0.5, 1] for SVI convergence")
        if self.compute_dtype not in ("float32", "bfloat16"):
            raise ValueError(f"unknown compute_dtype: {self.compute_dtype}")
        if self.gamma_init not in ("gamma", "normal", "ones"):
            raise ValueError(f"unknown gamma_init: {self.gamma_init}")
        if self.checkpoint_format not in ("npz", "orbax"):
            raise ValueError(
                f"unknown checkpoint_format: {self.checkpoint_format}"
            )
        if self.use_pallas not in ("never", "always"):
            raise ValueError(f"unknown use_pallas: {self.use_pallas}")
        if self.sstats_mode not in ("auto", "scatter", "dense"):
            raise ValueError(f"unknown sstats_mode: {self.sstats_mode}")
        if self.sstats_kernel not in ("auto", "xla", "pallas"):
            raise ValueError(f"unknown sstats_kernel: {self.sstats_kernel}")
        if self.topic_sampler not in ("auto", "cdf", "gumbel", "race"):
            raise ValueError(f"unknown topic_sampler: {self.topic_sampler}")
        if self.sampler_block_positions < 1:
            raise ValueError("sampler_block_positions must be >= 1")
        if self.gibbs_rebuild_interval < 1:
            raise ValueError("gibbs_rebuild_interval must be >= 1")
        if self.estep_stall_patience < 0:
            raise ValueError("estep_stall_patience must be >= 0")
        if self.bucket_policy not in ("auto", "fixed"):
            raise ValueError(f"unknown bucket_policy: {self.bucket_policy}")
        if not self.bucket_sizes or any(b <= 0 for b in self.bucket_sizes):
            raise ValueError("bucket_sizes must be positive and non-empty")
        if self.shard_vocab and self.shard_topics:
            raise ValueError("shard_vocab and shard_topics are exclusive")
        return self
