"""Tensor-parallel sharding rules for the unified ViT.

The reference has no weight sharding at all (its ViT-S is 21M params —
SURVEY.md §2.12); this module makes the mesh's reserved ``model`` axis real so
bigger probed backbones (ViT-L/g) drop in without code changes. The rules are
the Megatron pattern expressed purely as `NamedSharding`s — no hand-written
collectives; GSPMD inserts the all-reduces:

- attention qkv / mlp fc1 kernels: output features sharded (column parallel)
- attention proj / mlp fc2 kernels: input features sharded (row parallel)
- biases follow their kernel's output sharding; everything else replicated

Because every transformer block is column→row paired, activations stay
sharded through the pair and one psum per pair reassembles them — the
standard TP communication pattern, emitted by XLA from these annotations.
"""

from __future__ import annotations

import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

# leaf-path suffixes -> PartitionSpec for a 2D kernel [in, out]
_COLUMN_PARALLEL = ("attn/qkv/kernel", "mlp/fc1/kernel")
_ROW_PARALLEL = ("attn/proj/kernel", "mlp/fc2/kernel")
_COLUMN_BIAS = ("attn/qkv/bias", "mlp/fc1/bias")


def _spec_for(path: str, ndim: int) -> P:
    if ndim == 2:
        if path.endswith(_COLUMN_PARALLEL):
            return P(None, "model")
        if path.endswith(_ROW_PARALLEL):
            return P("model", None)
    if ndim == 1 and path.endswith(_COLUMN_BIAS):
        return P("model")
    return P()


def vit_param_shardings(params, mesh: Mesh):
    """A NamedSharding pytree for a params tree containing ViT blocks.

    Any leaf whose path does not match a transformer-block kernel stays
    replicated, so the same function shards a whole iSegProbeModel tree
    (backbone TP, everything else DP-replicated).
    """
    flat = jax.tree_util.tree_flatten_with_path(params)[0]

    def name(path):
        return "/".join(
            getattr(k, "key", getattr(k, "name", str(k))) for k in path
        )

    specs = {name(p): _spec_for(name(p), v.ndim) for p, v in flat}

    def to_sharding(path, leaf):
        del leaf
        return NamedSharding(mesh, specs[name(path)])

    return jax.tree_util.tree_map_with_path(to_sharding, params)


def shard_params_tp(params, mesh: Mesh):
    """Place a params tree on the mesh under the TP rules."""
    return jax.tree.map(
        jax.device_put, params, vit_param_shardings(params, mesh)
    )
