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


def test_tp_train_step_matches_dp(tmp_path):
    """The FULL compiled train step on a 2D (data=4, model=2) mesh — sharded
    ViT-block params, on-device click simulation, optimizer update — must
    produce the same updated trainable params and loss as the DP-only step
    on the same batch/rng (VERDICT r4 #6: the SCALING.md model-axis claim as
    executable evidence, not prose)."""
    import types

    from isegprobe_tpu.models.probe_model import iSegProbeModel
    from isegprobe_tpu.parallel.mesh import put_global_batch
    from isegprobe_tpu.training.losses import NormalizedFocalLossSigmoid
    from isegprobe_tpu.training.metrics import AdaptiveIoU
    from isegprobe_tpu.training.trainer import iSegTrainer

    assert jax.device_count() == 8

    class _DS:
        def __init__(self, n=8, hw=28):
            rng = np.random.default_rng(0)
            self.items = []
            for _ in range(n):
                img = rng.random((hw, hw, 3), dtype=np.float32)
                mask = np.zeros((hw, hw, 1), dtype=np.float32)
                mask[8:20, 6:20] = 1
                pts = np.full((6, 3), -1.0, dtype=np.float32)
                pts[0] = [12, 10, 0]
                self.items.append(
                    {"images": img, "points": pts, "instances": mask})

        def __len__(self):
            return len(self.items)

        def __getitem__(self, i):
            return self.items[i]

        def get_samples_number(self):
            return len(self.items)

    def cfg(sub):
        p = tmp_path / sub
        return types.SimpleNamespace(
            dataloader=types.SimpleNamespace(batch_size=8, val_batch_size=8,
                                             workers=0),
            training=types.SimpleNamespace(start_epoch=0, weights=None),
            CHECKPOINTS_PATH=str(p), LOGS_PATH=None,
        )

    model = iSegProbeModel(
        backbone_cfg=dict(type="dinov2",
                          params=dict(feats_injection_mode="before_backbone")),
        embed_coords_cfg=dict(
            type="patchEmbed",
            params=dict(img_size=(28, 28), patch_size=(14, 14),
                        embed_dim=384)),
        head_cfg=dict(type="convhead",
                      params=dict(in_channels=384, num_layers=1,
                                  num_classes=1)),
        upsampler_cfg=dict(type="identity", params=dict()),
        save_cfg=dict(embed_coords=True, backbone=False, upsampler=False,
                      head=True),
        use_disks=True, norm_radius=5, with_prev_mask=True, attn_impl="jnp",
    )

    def make_trainer(mesh, sub):
        return iSegTrainer(
            model, cfg(sub),
            loss_cfg={"instance_loss":
                      NormalizedFocalLossSigmoid(alpha=0.5, gamma=2),
                      "instance_loss_weight": 1.0},
            trainset=_DS(), valset=_DS(), mesh=mesh,
            optimizer="adam", optimizer_params={"lr": 1e-3},
            metrics=[AdaptiveIoU()], max_interactive_points=3,
            max_num_next_clicks=2, seed=5,
        )

    dp = make_trainer(make_mesh(axis_names=("data", "model")), "dp")
    tp = make_trainer(
        make_mesh(axis_names=("data", "model"), model_parallel=2), "tp")
    assert dict(tp.mesh.shape) == {"data": 4, "model": 2}

    # the frozen ViT-block kernels are genuinely distributed on the TP mesh
    qkv = tp.params["frozen"]["backbone"]["model"]["blocks_0"]["attn"][
        "qkv"]["kernel"]
    assert "model" in str(qkv.sharding.spec)
    assert all(s.data.shape[1] == qkv.shape[1] // 2
               for s in qkv.addressable_shards), "qkv not split over model"

    batch_np = next(iter(dp.train_data))
    rng = jax.random.PRNGKey(9)

    def one_step(tr):
        batch = put_global_batch(batch_np, tr.mesh)
        params, opt_state, loss, *rest = tr._train_step(
            tr.params, tr.opt_state, batch, rng, 2, 0.4, 0.025,
            click_trees=())
        return jax.device_get(params), float(loss)

    p_dp, loss_dp = one_step(dp)
    p_tp, loss_tp = one_step(tp)

    np.testing.assert_allclose(loss_tp, loss_dp, rtol=1e-5)
    flat_dp = jax.tree_util.tree_flatten_with_path(p_dp["trainable"])[0]
    flat_tp = jax.tree_util.tree_flatten_with_path(p_tp["trainable"])[0]
    assert len(flat_dp) == len(flat_tp)
    for (path, a), (_, b) in zip(flat_dp, flat_tp):
        # tolerance: the TP step reassociates the sharded contractions and
        # psums (f32 rounding ~1e-7 on grads), which Adam's g/(sqrt(v)+eps)
        # normalization amplifies on near-zero-variance entries — observed
        # ≤1e-5 absolute on a 1e-3-lr step (1% of the update magnitude)
        np.testing.assert_allclose(
            np.asarray(b), np.asarray(a), rtol=1e-3, atol=5e-5,
            err_msg=f"updated param diverges at {path}")


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
