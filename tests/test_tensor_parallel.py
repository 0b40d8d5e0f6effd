"""Tensor-parallel (model-axis) sharding of the ViT: Megatron-pattern param
shardings must reproduce the replicated forward exactly while actually
distributing the weights (SURVEY.md §2.12 'model axis attaches later')."""

import jax
import jax.numpy as jnp
import numpy as np

from isegprobe_tpu.models.vit import ViT, ViTConfig
from isegprobe_tpu.parallel.mesh import make_mesh
from isegprobe_tpu.parallel.tp import shard_params_tp, vit_param_shardings


def test_tp_forward_matches_replicated():
    assert jax.device_count() == 8
    mesh = make_mesh(axis_names=("data", "model"), model_parallel=4)

    cfg = ViTConfig(patch_size=14, embed_dim=64, depth=2, num_heads=4,
                    layerscale=True, pretrain_grid=(4, 4), attn_impl="jnp")
    model = ViT(cfg)
    x = np.random.default_rng(0).standard_normal((2, 56, 56, 3),
                                                 dtype=np.float32)
    params = model.init(jax.random.PRNGKey(0), jnp.asarray(x))["params"]

    want = jax.jit(
        lambda p, a: model.apply({"params": p}, a)["patch_tokens"]
    )(params, jnp.asarray(x))

    tp_params = shard_params_tp(params, mesh)
    # qkv kernels are genuinely distributed over the model axis
    qkv = tp_params["blocks_0"]["attn"]["qkv"]["kernel"]
    assert "model" in str(qkv.sharding.spec)
    shard_shapes = {s.data.shape for s in qkv.addressable_shards}
    assert all(sh[1] == qkv.shape[1] // 4 for sh in shard_shapes), (
        "qkv kernel is not split 4-way over the model axis"
    )

    got = jax.jit(
        lambda p, a: model.apply({"params": p}, a)["patch_tokens"]
    )(tp_params, jnp.asarray(x))
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=1e-5, atol=1e-5)


def test_tp_sharding_rules_cover_probe_tree():
    mesh = make_mesh(axis_names=("data", "model"), model_parallel=2)
    # a mixed tree: ViT-block kernels shard, anything else stays replicated
    params = {
        "backbone": {"model": {"blocks_3": {
            "attn": {"qkv": {"kernel": jnp.ones((8, 24)),
                             "bias": jnp.ones((24,))},
                     "proj": {"kernel": jnp.ones((8, 8)),
                              "bias": jnp.ones((8,))}},
            "mlp": {"fc1": {"kernel": jnp.ones((8, 32))},
                    "fc2": {"kernel": jnp.ones((32, 8))}},
        }}},
        "head": {"classifier": {"kernel": jnp.ones((8, 1))}},
    }
    sh = vit_param_shardings(params, mesh)
    blk = sh["backbone"]["model"]["blocks_3"]
    assert str(blk["attn"]["qkv"]["kernel"].spec) == "PartitionSpec(None, 'model')"
    assert str(blk["attn"]["proj"]["kernel"].spec) == "PartitionSpec('model', None)"
    assert str(blk["mlp"]["fc1"]["kernel"].spec) == "PartitionSpec(None, 'model')"
    assert str(blk["mlp"]["fc2"]["kernel"].spec) == "PartitionSpec('model', None)"
    assert str(blk["attn"]["qkv"]["bias"].spec) == "PartitionSpec('model',)"
    assert str(sh["head"]["classifier"]["kernel"].spec) == "PartitionSpec()"
