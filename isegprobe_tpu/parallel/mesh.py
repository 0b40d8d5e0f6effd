"""Device mesh + sharding rules — the TPU-native replacement for the
reference's NCCL/DDP story (reference: core/utils/distributed.py:8-78,
core/utils/exp.py:33-36; SURVEY.md §2.12).

One `jax.sharding.Mesh` over ICI with a `data` axis carries the reference's
only parallelism (DDP). Gradients are all-reduced by XLA-inserted collectives
when the jitted train step consumes a batch sharded on `data` against
replicated parameters — there is no hand-written communication layer. A
`model` axis is reserved so tensor parallelism can attach without API changes
(the reference's ViT-S is far too small to need it).
"""

from __future__ import annotations

from typing import Optional, Sequence

import jax
import numpy as np
from jax.experimental import mesh_utils
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def maybe_init_distributed() -> bool:
    """Multi-process launch gate — the analogue of the reference's
    ``torch.distributed.init_process_group`` at CLI startup
    (core/utils/exp.py:33-36), rebuilt on JAX's distributed runtime.

    Called by train.py/evaluate.py before any device use. Initializes when a
    coordinator is configured, so single-process runs pay nothing:

      * ``ISEG_COORDINATOR=host:port`` + ``ISEG_NUM_PROCESSES`` +
        ``ISEG_PROCESS_ID`` — explicit launch (one command per host, same
        coordinator; the JAX analogue of torchrun's env:// rendezvous).
      * ``ISEG_DISTRIBUTED=auto`` — TPU-pod auto-detection: on Cloud TPU
        ``jax.distributed.initialize()`` reads the pod metadata itself.

    After init, ``jax.devices()`` spans every host (ICI+DCN), meshes built by
    ``make_mesh`` are global, and rank identity comes from
    ``jax.process_index()`` (see docs/SCALING.md for the launch recipe).
    Returns True iff the distributed runtime was initialized.
    """
    import os

    coord = os.environ.get("ISEG_COORDINATOR")
    if coord:
        jax.distributed.initialize(
            coordinator_address=coord,
            num_processes=int(os.environ["ISEG_NUM_PROCESSES"]),
            process_id=int(os.environ["ISEG_PROCESS_ID"]),
        )
        return True
    if os.environ.get("ISEG_DISTRIBUTED", "").lower() == "auto":
        jax.distributed.initialize()
        return True
    return False


def make_mesh(
    n_devices: Optional[int] = None,
    axis_names: Sequence[str] = ("data", "model"),
    model_parallel: int = 1,
) -> Mesh:
    """Mesh over the first `n_devices` devices: (data, model) axes with the
    model axis defaulting to 1 (pure data parallelism)."""
    devices = jax.devices()
    if n_devices is None:
        n_devices = len(devices)
    shape = (n_devices // model_parallel, model_parallel)
    dev_array = mesh_utils.create_device_mesh(shape, devices[:n_devices])
    return Mesh(dev_array, axis_names)


def batch_sharding(mesh: Mesh) -> NamedSharding:
    """Batch axis over `data`, everything else replicated."""
    return NamedSharding(mesh, P("data"))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def shard_batch(batch, mesh: Mesh):
    """Place a host batch dict onto the mesh, sharded along the leading axis."""
    sharding = batch_sharding(mesh)
    return jax.tree.map(lambda x: jax.device_put(np.asarray(x), sharding), batch)


def put_global_batch(batch, mesh: Mesh, multiprocess: bool = None):
    """Batch placement that is correct in BOTH launch modes.

    Single-process: plain ``device_put`` of the full batch onto the ``data``
    axis. Multi-process (after ``maybe_init_distributed``): every process
    holds only its rank-strided shard (loader striding), so the global array
    is assembled from process-local pieces via
    ``jax.make_array_from_process_local_data`` — the effective global batch is
    batch_size x process_count, matching the reference's per-GPU DDP batch
    semantics (core/training/trainer.py:102-134). ``multiprocess`` is
    overridable so the multi-host path is unit-testable in one process."""
    if multiprocess is None:
        multiprocess = jax.process_count() > 1
    sharding = batch_sharding(mesh)
    if multiprocess:
        return jax.tree.map(
            lambda x: jax.make_array_from_process_local_data(
                sharding, np.asarray(x)),
            batch,
        )
    return jax.tree.map(
        lambda x: jax.device_put(np.asarray(x), sharding), batch)


def replicate(tree, mesh: Mesh):
    sharding = replicated(mesh)
    return jax.tree.map(lambda x: jax.device_put(x, sharding), tree)


def process_is_master() -> bool:
    """'rank 0' in the reference's DDP world (distributed.py:8-12)."""
    return jax.process_index() == 0


def reduce_loss_dict(loss_dict: dict) -> dict:
    """Average scalar losses across processes for logging — the psum-based
    equivalent of the reference's dist.reduce (distributed.py:31-53).
    No-op in a single-process world, like the reference at world_size 1."""
    if jax.process_count() == 1:
        return loss_dict
    from jax.experimental.multihost_utils import process_allgather

    gathered = process_allgather(
        {k: np.asarray(v, dtype=np.float32) for k, v in loss_dict.items()}
    )
    return {k: np.mean(v) for k, v in gathered.items()}
