"""Device mesh, shardings, and multi-host bootstrap — the entire comm layer.

The reference has NO distributed layer of any kind — one process, one
NumPy heap (SURVEY.md sections 1, 2.2).  The TPU-native communication
backend is the XLA runtime itself: we lay out a ``("data", "model")`` mesh,
annotate arrays with ``NamedSharding``, and ``jit`` emits the psum /
all-gather collectives over ICI/DCN (BASELINE.json:5,11; SURVEY.md section
5 "Distributed communication backend").  There is deliberately no NCCL/MPI
analog — this file is the whole backend.

Layout (SURVEY.md section 2.2):
- data parallelism  = document sharding: counts/ids/cnts/mask split on
  axis "data"; each shard computes partial sufficient statistics; the
  M-step contraction expEtheta.T @ ratio reduces over the doc axis, so
  GSPMD inserts exactly one psum per E-step — the only collective in the
  training step.
- tensor parallelism = vocabulary sharding of lambda (K x V) on axis
  "model" for configs where lambda (+ its digamma/exp workspaces)
  pressures HBM (K=1000, V=100k, BASELINE.json:11).
- pipeline parallelism: N/A for LDA (no layer stack) — consciously out of
  scope, documented here per SURVEY.md section 2.2.
"""

from __future__ import annotations

from typing import Optional, Tuple

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from pylda_tpu.corpus.corpus import DenseBatch, RaggedBucket, SequenceBucket


def init_distributed(
    coordinator_address: Optional[str] = None,
    num_processes: Optional[int] = None,
    process_id: Optional[int] = None,
) -> None:
    """Multi-host bootstrap (jax.distributed).  No-op when single-process
    args are absent; each host then reads only its own document shard
    (SURVEY.md section 7.3 "Multi-host input pipeline")."""
    if coordinator_address is not None:
        jax.distributed.initialize(
            coordinator_address=coordinator_address,
            num_processes=num_processes,
            process_id=process_id,
        )


def make_mesh(
    shape: Optional[Tuple[int, int]] = None,
    axis_names: Tuple[str, str] = ("data", "model"),
    devices=None,
) -> Mesh:
    """Build the 2-D device mesh.  Default: all devices on "data"."""
    devices = np.asarray(devices if devices is not None else jax.devices())
    n = devices.size
    if shape is None:
        shape = (n, 1)
    if shape[0] * shape[1] != n:
        raise ValueError(f"mesh shape {shape} != {n} devices")
    return Mesh(devices.reshape(shape), axis_names)


# -- sharding specs ---------------------------------------------------------------


def batch_shardings(mesh: Mesh, batch) -> dict:
    """PartitionSpec per field: documents split over "data", token/vocab
    axes replicated (the E-step reduces over docs, not tokens)."""
    if isinstance(batch, DenseBatch):
        return {
            "counts": P("data", None),
            "mask": P("data"),
            "doc_ids": P("data"),
        }
    if isinstance(batch, RaggedBucket):
        return {
            "ids": P("data", None),
            "cnts": P("data", None),
            "mask": P("data"),
            "doc_ids": P("data"),
        }
    if isinstance(batch, SequenceBucket):
        return {
            "tokens": P("data", None),
            "token_mask": P("data", None),
            "mask": P("data"),
            "doc_ids": P("data"),
        }
    raise TypeError(type(batch))


def state_shardings(
    mesh: Mesh, shard_vocab: bool = False, shard_topics: bool = False
) -> dict:
    """lambda replicated by default; vocab-sharded on "model" when the
    K x V state pressures HBM (SURVEY.md section 2.2 "TP"), or
    topic-sharded on "model" (the expert-parallelism analog: each shard
    owns K/P topics; SURVEY.md section 2.2 "EP").  The two are mutually
    exclusive ways to split the same matrix."""
    if shard_vocab and shard_topics:
        raise ValueError("shard_vocab and shard_topics are exclusive")
    if shard_vocab:
        lam_spec, eta_spec, alpha_spec = P(None, "model"), P("model"), P()
    elif shard_topics:
        lam_spec, eta_spec, alpha_spec = P("model", None), P(), P("model")
    else:
        lam_spec, eta_spec, alpha_spec = P(), P(), P()
    return {
        "lam": lam_spec,
        "alpha": alpha_spec,
        "eta": eta_spec,
        "step": P(),
        "key": P(),
    }


# -- placement helpers --------------------------------------------------------------


def shard_batch(batch, mesh: Mesh):
    """device_put a host batch with document sharding; returns the same
    batch type holding sharded jax.Arrays.  The document axis must divide
    by the "data" axis size (guaranteed by doc_pad_multiple=64 covering
    meshes up to 64-way data parallel)."""
    specs = batch_shardings(mesh, batch)
    put = {
        f: jax.device_put(getattr(batch, f), NamedSharding(mesh, spec))
        for f, spec in specs.items()
    }
    return type(batch)(**put)


def shard_state(
    state, mesh: Mesh, shard_vocab: bool = False, shard_topics: bool = False
):
    """device_put an LDAState with the global-state layout."""
    specs = state_shardings(mesh, shard_vocab, shard_topics)
    return type(state)(
        **{
            f: jax.device_put(getattr(state, f), NamedSharding(mesh, specs[f]))
            for f in state._fields
        }
    )


def host_gather(x) -> np.ndarray:
    """Bring a (possibly cross-process sharded) array to this host.

    np.asarray works only on fully-addressable arrays; multi-host shards
    go through an allgather (jax.experimental.multihost_utils)."""
    if not hasattr(x, "is_fully_addressable") or x.is_fully_addressable:
        return np.asarray(x)
    from jax.experimental import multihost_utils

    return np.asarray(multihost_utils.process_allgather(x, tiled=True))


def validate_process_aligned(mesh: Mesh) -> None:
    """The loader hands host p the p-th contiguous doc block, so the
    mesh's data axis must be process-aligned: every data-row of the
    device grid lives in ONE process, and process ids are
    non-decreasing along the axis.  A model axis spanning processes
    would make replicas of the same global rows receive DIFFERENT
    hosts' documents — silently corrupt."""
    grid = mesh.devices.reshape(mesh.shape["data"], -1)
    row_procs = []
    for row in grid:
        procs = {d.process_index for d in row}
        if len(procs) != 1:
            raise ValueError(
                "process-sharded input requires the mesh model axis to "
                "stay within a process (one process per data-row); got "
                f"processes {sorted(procs)} in one row"
            )
        row_procs.append(next(iter(procs)))
    if row_procs != sorted(row_procs):
        raise ValueError(
            "process-sharded input requires process ids non-decreasing "
            f"along the data axis; got {row_procs}"
        )


def lift_process_local_batch(batch, mesh: Mesh):
    """Assemble a globally-sharded batch from per-process LOCAL data.

    The multi-host input pipeline (SURVEY.md section 7.3): each host
    parses only its contiguous document block and pads it to the uniform
    per-host row count; this lifts those local arrays into one global
    jax.Array per field via ``jax.make_array_from_process_local_data``
    with the standard document sharding — no host ever materialises the
    full corpus.  All hosts must pass identically-shaped locals (the
    loader's ceil-block split guarantees it)."""
    specs = batch_shardings(mesh, batch)
    nproc = jax.process_count()
    validate_process_aligned(mesh)

    def lift(field, spec):
        local = np.asarray(getattr(batch, field))
        global_shape = (local.shape[0] * nproc,) + local.shape[1:]
        return jax.make_array_from_process_local_data(
            NamedSharding(mesh, spec), local, global_shape
        )

    return type(batch)(**{f: lift(f, s) for f, s in specs.items()})


def lift_process_local_buckets(
    local_buckets,
    bucket_sizes,
    doc_pad_multiple: int,
    mesh: Mesh,
    global_doc_offset: int,
):
    """Negotiate UNIFORM bucket geometry across hosts and lift.

    Each host's corpus block yields different per-width row counts (and
    possibly missing widths entirely), but
    ``make_array_from_process_local_data`` needs identically-shaped
    locals on every host.  Protocol (SURVEY.md section 7.3 "Multi-host
    input pipeline"): allgather the rows-per-width histogram, take the
    elementwise max, pad every host's buckets to that row count (padding
    rows are inert: zero counts/mask, doc id -1), re-base doc ids to
    GLOBAL indices, and lift each bucket with document sharding.

    Works for any registered batch dataclass whose first 2-D field's
    second dim is the bucket width (RaggedBucket, SequenceBucket).
    ``local_buckets`` must be built UNPADDED (doc_pad_multiple=1)."""
    from jax.experimental import multihost_utils

    def width_of(b):
        for f in b.__dataclass_fields__:
            v = getattr(b, f)
            if v.ndim == 2:
                return v.shape[1]
        raise TypeError(f"no 2-D field on {type(b).__name__}")

    local = {width_of(b): b for b in local_buckets}
    widths = sorted(set(bucket_sizes))
    hist = np.asarray(
        [local[w].mask.shape[0] if w in local else 0 for w in widths],
        dtype=np.int32,
    )
    all_hist = np.asarray(
        multihost_utils.process_allgather(hist)
    ).reshape(jax.process_count(), len(widths))
    max_rows = all_hist.max(axis=0)
    out = []
    for w, rows in zip(widths, max_rows):
        if rows == 0:
            continue
        rows = -(-int(rows) // doc_pad_multiple) * doc_pad_multiple
        b = local.get(w)
        cls = type(b) if b is not None else type(local_buckets[0])
        fields = {}
        for f, spec in cls.__dataclass_fields__.items():
            if b is not None:
                src = getattr(b, f)
                shape = (rows,) + src.shape[1:]
                dtype = src.dtype
            else:
                tmpl = getattr(local_buckets[0], f)
                shape = (rows,) + (
                    (w,) if tmpl.ndim == 2 else ()
                )
                dtype = tmpl.dtype
            arr = (
                np.full(shape, -1, dtype=dtype)
                if f == "doc_ids"
                else np.zeros(shape, dtype=dtype)
            )
            if b is not None:
                n = getattr(b, f).shape[0]
                arr[:n] = getattr(b, f)
                if f == "doc_ids":
                    arr[:n] = np.where(
                        getattr(b, f) >= 0,
                        getattr(b, f) + global_doc_offset,
                        -1,
                    )
            fields[f] = arr
        out.append(lift_process_local_batch(cls(**fields), mesh))
    return out


def negotiate_svi_ragged_geometry(corpus, config, b_local: int):
    """Cross-host SVI fixed bucket geometry for PROCESS-LOCAL ragged
    corpora (BASELINE config 5: doc-sharded SVI at V=100k, multi-host).

    Every host streams only its own contiguous doc block, but the fused
    epoch scan needs IDENTICAL minibatch bucket shapes on every host
    (``make_array_from_process_local_data`` lifts same-shape locals).
    Protocol, in the ``lift_process_local_buckets`` mould:

    1. Bucket WIDTHS: with ``bucket_policy="auto"`` (and the default
       ``bucket_sizes``), allgather-SUM the per-host aligned-width row
       histograms and run the slot-minimising DP on the GLOBAL histogram
       under the minibatch capacity cost model — every host plans from
       identical inputs, so the widths agree.  Otherwise the configured
       fixed widths are used (already identical).
    2. Bucket CAPACITIES: each host's expected per-minibatch rows per
       width is ``local_hist[w] * (b_local / local_docs)``; allgather
       and take the elementwise MAX (capacities must cover the
       worst-placed host), then apply the shared +4-sigma capacity
       formula (``layouts.svi_capacities_from_expected``).

    Returns {width: row capacity} or None when the corpus exposes no
    per-doc unique counts.  Collective — call from every process."""
    from jax.experimental import multihost_utils

    from pylda_tpu.models import layouts
    from pylda_tpu.utils.config import LDAConfig

    pad = config.doc_pad_multiple
    uc = layouts.unique_counts_of(corpus)
    if uc is None:
        return None
    fixed = tuple(config.bucket_sizes)
    cap = max(fixed)
    P = jax.process_count()
    use_auto = (
        getattr(config, "bucket_policy", "fixed") == "auto"
        and fixed == LDAConfig.__dataclass_fields__["bucket_sizes"].default
    )
    if use_auto:
        align = 16
        local_vec = layouts.aligned_width_histogram(uc, align=align, cap=cap)
        global_vec = (
            np.asarray(multihost_utils.process_allgather(local_vec))
            .reshape(P, -1)
            .sum(axis=0)
        )
        width_rows = {
            align * (i + 1): int(r)
            for i, r in enumerate(global_vec)
            if r > 0
        }
        f_global = min(
            1.0, (b_local * P) / max(1, corpus.global_num_docs)
        )
        sizes = layouts.plan_bucket_sizes(
            [], cap=cap, row_pad=pad,
            minibatch_fraction=f_global, width_rows=width_rows,
        )
    else:
        sizes = fixed
    sizes = sorted(int(s) for s in sizes)
    hist_local = corpus.ragged_row_histogram(sizes)
    f_local = min(1.0, b_local / corpus.num_docs) if corpus.num_docs else 0.0
    e_local = np.asarray(
        [hist_local[s] * f_local for s in sizes], dtype=np.float64
    )
    e_max = (
        np.asarray(multihost_utils.process_allgather(e_local))
        .reshape(P, len(sizes))
        .max(axis=0)
    )
    return layouts.svi_capacities_from_expected(
        sizes, dict(zip(sizes, e_max)), pad
    )


def shard_stacked_batch(
    batch, mesh: Mesh, process_local: bool = False, stack_axes: int = 1
):
    """Place a host batch whose fields carry ``stack_axes`` LEADING
    STACK AXES — [n_batches, rows, ...] for an epoch of same-shape
    minibatches stacked for a fused ``lax.scan`` (stack_axes=1), or
    [n_epochs, n_batches, rows, ...] for the fused multi-epoch scan
    (stack_axes=2) — with document sharding on the rows axis.

    ``process_local=True``: the rows axis holds only this process's
    documents; fields are lifted to global arrays of ``rows * P`` via
    ``jax.make_array_from_process_local_data`` (the SVI multi-host input
    pipeline — each host streams only its own doc shard, SURVEY.md
    section 7.3 / BASELINE.json:11)."""
    specs = batch_shardings(mesh, batch)
    if process_local:
        validate_process_aligned(mesh)
    nproc = jax.process_count()
    out = {}
    for f, spec in specs.items():
        sspec = P(*((None,) * stack_axes + tuple(spec)))
        local = np.asarray(getattr(batch, f))
        if process_local:
            gshape = (
                local.shape[:stack_axes]
                + (local.shape[stack_axes] * nproc,)
                + local.shape[stack_axes + 1:]
            )
            out[f] = jax.make_array_from_process_local_data(
                NamedSharding(mesh, sspec), local, gshape
            )
        else:
            out[f] = jax.device_put(local, NamedSharding(mesh, sspec))
    return type(batch)(**out)


# -- debug: cross-device replica consistency ------------------------------------


def replica_checksums(state) -> dict:
    """Per-device checksum of every replicated state array — the
    cross-host determinism debug mode of SURVEY.md section 5 ("race
    detection"): after each psum'd M-step, replicated lambda must be
    bit-identical on every device.  Returns {field: [per-device sums]};
    assert each list has one unique value."""
    out = {}
    for f in state._fields:
        arr = getattr(state, f)
        if not hasattr(arr, "addressable_shards"):
            continue
        shards = arr.addressable_shards
        if not shards or any(s.data is None for s in shards):
            continue
        sums = [float(np.asarray(s.data, dtype=np.float64).sum())
                for s in shards]
        out[f] = sums
    return out


def assert_replicas_consistent(state) -> None:
    """Raise if any replicated array differs across its device copies."""
    for f, sums in replica_checksums(state).items():
        arr = getattr(state, f)
        if getattr(arr.sharding, "is_fully_replicated", False):
            if len(set(sums)) > 1:
                raise AssertionError(
                    f"replica divergence in state.{f}: {sums}"
                )
