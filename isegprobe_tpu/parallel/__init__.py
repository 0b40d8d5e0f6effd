"""Device mesh + sharding rules."""

from isegprobe_tpu.parallel.mesh import (
    batch_sharding,
    make_mesh,
    process_is_master,
    replicate,
    replicated,
    shard_batch,
)

__all__ = [
    "batch_sharding",
    "make_mesh",
    "process_is_master",
    "replicate",
    "replicated",
    "shard_batch",
]
