from pylda_tpu.parallel.mesh import (
    make_mesh,
    batch_shardings,
    state_shardings,
    shard_batch,
    shard_state,
    init_distributed,
)

__all__ = [
    "make_mesh",
    "batch_shardings",
    "state_shardings",
    "shard_batch",
    "shard_state",
    "init_distributed",
]
