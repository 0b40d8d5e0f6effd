"""Trainer on a virtual 8-device CPU mesh: sharded compiled step, frozen-param
semantics, on-device click simulation, checkpoint round-trip."""

import types

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from isegprobe_tpu.models.probe_model import iSegProbeModel
from isegprobe_tpu.training.losses import NormalizedFocalLossSigmoid
from isegprobe_tpu.training.metrics import AdaptiveIoU
from isegprobe_tpu.training.trainer import get_next_points_device, iSegTrainer


class TinyDataset:
    """Fixed-size synthetic samples shaped like the SBD training pipeline."""

    def __init__(self, n=16, hw=28, n_points=3):
        self.n, self.hw, self.n_points = n, hw, n_points
        self.rng = np.random.default_rng(0)
        self.items = []
        for i in range(n):
            img = self.rng.random((hw, hw, 3), dtype=np.float32)
            mask = np.zeros((hw, hw, 1), dtype=np.float32)
            mask[8 : 8 + 12, 6 : 6 + 14] = 1
            points = np.full((2 * n_points, 3), -1.0, dtype=np.float32)
            points[0] = [12, 10, 0]
            self.items.append({"images": img, "points": points, "instances": mask})

    def __len__(self):
        return self.n

    def __getitem__(self, i):
        return self.items[i]

    def get_samples_number(self):
        return self.n


def _cfg(tmp_path):
    return types.SimpleNamespace(
        dataloader=types.SimpleNamespace(batch_size=8, val_batch_size=8, workers=2),
        training=types.SimpleNamespace(start_epoch=0, weights=None),
        CHECKPOINTS_PATH=str(tmp_path / "ckpts"),
        LOGS_PATH=None,
    )


@pytest.fixture(scope="module")
def model():
    return iSegProbeModel(
        backbone_cfg=dict(type="dinov2",
                          params=dict(feats_injection_mode="before_backbone")),
        embed_coords_cfg=dict(
            type="patchEmbed",
            params=dict(img_size=(28, 28), patch_size=(14, 14), embed_dim=384),
        ),
        head_cfg=dict(type="convhead",
                      params=dict(in_channels=384, num_layers=1, num_classes=1)),
        upsampler_cfg=dict(type="identity", params=dict()),
        save_cfg=dict(embed_coords=True, backbone=False, upsampler=False, head=True),
        use_disks=True,
        norm_radius=5,
        with_prev_mask=True,
        attn_impl="jnp",
    )


def test_training_epoch_updates_trainable_only(model, tmp_path):
    assert jax.device_count() == 8, "conftest must provide the 8-device CPU mesh"
    ds = TinyDataset()
    trainer = iSegTrainer(
        model,
        _cfg(tmp_path),
        loss_cfg={"instance_loss": NormalizedFocalLossSigmoid(alpha=0.5, gamma=2),
                  "instance_loss_weight": 1.0},
        trainset=ds,
        valset=TinyDataset(n=8),
        optimizer="adam",
        optimizer_params={"lr": 1e-3},
        metrics=[AdaptiveIoU()],
        max_num_next_clicks=2,
        prev_mask_drop_prob=0.3,
        seed=7,
    )

    before = jax.device_get(trainer.params)
    trainer.run(num_epochs=1, validation=True)
    after = jax.device_get(trainer.params)

    # frozen backbone identical, trainable head changed
    np.testing.assert_array_equal(
        jax.tree.leaves(before["frozen"])[0], jax.tree.leaves(after["frozen"])[0]
    )
    head_before = jax.tree.leaves(before["trainable"]["head"])
    head_after = jax.tree.leaves(after["trainable"]["head"])
    assert any(
        not np.array_equal(b, a) for b, a in zip(head_before, head_after)
    ), "head params did not update"
    assert trainer.train_metrics[0].get_epoch_value() >= 0

    # checkpoint round-trip with save_cfg filtering
    from isegprobe_tpu.utils.serialization import build_model, load_checkpoint

    params, config, extra = load_checkpoint(
        tmp_path / "ckpts" / "last_checkpoint.ckpt"
    )
    assert "backbone" not in params and "head" in params
    rebuilt = build_model(config)
    assert rebuilt.backbone_cfg["type"] == "dinov2"


def test_get_next_points_device_places_click_in_error_region():
    h = w = 32
    gt = np.zeros((2, h, w, 1), np.float32)
    gt[:, 4:20, 4:20] = 1
    prob = np.zeros((2, h, w, 1), np.float32)  # all-FN prediction
    points = np.full((2, 8, 3), -1.0, np.float32)

    new_pts = np.asarray(
        get_next_points_device(
            jnp.asarray(prob), jnp.asarray(gt), jnp.asarray(points),
            jnp.asarray(1), jax.random.PRNGKey(0),
        )
    )
    n = 4  # num_points = 8 // 2
    for b in range(2):
        y, x, idx = new_pts[b, n - 1]
        assert idx == 1.0
        assert gt[b, int(y), int(x), 0] == 1.0, "positive click must be inside FN"
    # other rows untouched
    assert (new_pts[:, : n - 1] == -1).all()


def test_trainer_click_models_simulation(model, tmp_path):
    """Iteration k of the click simulation runs click_models[k]
    (reference: trainer.py:173-175,410-415)."""
    import numpy as _np

    loss_cfg = {"instance_loss": NormalizedFocalLossSigmoid(alpha=0.5, gamma=2),
                "instance_loss_weight": 1.0}
    ds = TinyDataset()
    base = iSegTrainer(
        model, _cfg(tmp_path), loss_cfg, ds, ds,
        max_interactive_points=3, max_num_next_clicks=2, seed=0,
    )
    # a divergent eval model: random head params from another seed
    img = jnp.zeros((1, 28, 28, 4), jnp.float32)
    pts = jnp.full((1, 6, 3), -1.0, jnp.float32)
    other = model.init(jax.random.PRNGKey(99), img, pts)["params"]
    ens = iSegTrainer(
        model, _cfg(tmp_path), loss_cfg, ds, ds,
        max_interactive_points=3, max_num_next_clicks=2, seed=0,
        click_models=[{"head": other["head"]}],
    )
    assert len(ens._click_trees) == 1

    batch = ens._prep_batch(next(iter(ens.train_data)))
    rng = jax.random.PRNGKey(0)
    *_, (stats_e, _), _vis = ens._val_step(
        ens.params, ens.opt_state, batch, rng, 2, 0.4,
        click_trees=ens._click_trees,
    )
    *_, (stats_b, _), _visb = base._val_step(
        base.params, base.opt_state, batch, rng, 2, 0.4,
    )
    # different eval models pick different corrective clicks -> the final
    # forward (same weights) sees different point tensors
    assert _np.isfinite(_np.asarray(stats_e)).all()
    assert not _np.allclose(_np.asarray(stats_e), _np.asarray(stats_b))


def test_resume_from_checkpoint_continues_training(model, tmp_path):
    """Checkpoint -> fresh trainer with training.weights -> parameters load
    and training continues from them (reference: trainer.py:550-570)."""
    loss_cfg = {"instance_loss": NormalizedFocalLossSigmoid(alpha=0.5, gamma=2),
                "instance_loss_weight": 1.0}
    ds = TinyDataset()

    first = iSegTrainer(model, _cfg(tmp_path), loss_cfg, ds, ds,
                        optimizer="adam", optimizer_params={"lr": 1e-3},
                        seed=3)
    first.training(0)
    saved = jax.device_get(first.params)["trainable"]

    cfg2 = _cfg(tmp_path)
    cfg2.training.weights = str(tmp_path / "ckpts" / "last_checkpoint.ckpt")
    resumed = iSegTrainer(model, cfg2, loss_cfg, ds, ds,
                          optimizer="adam", optimizer_params={"lr": 1e-3},
                          seed=3)
    loaded = jax.device_get(resumed.params)["trainable"]
    for a, b in zip(jax.tree.leaves(saved["head"]),
                    jax.tree.leaves(loaded["head"])):
        np.testing.assert_array_equal(a, b)

    resumed.training(1)  # must keep training from the restored weights
    after = jax.device_get(resumed.params)["trainable"]
    assert any(
        not np.array_equal(a, b)
        for a, b in zip(jax.tree.leaves(loaded["head"]),
                        jax.tree.leaves(after["head"]))
    )


def test_mixed_precision_bf16_training(tmp_path):
    """training_params.dtype=bfloat16: modules compute in bf16, params stay
    f32 master weights, loss reduces in f32, and the head still learns."""
    import jax.numpy as jnp

    bf16_model = iSegProbeModel(
        backbone_cfg=dict(type="dinov2",
                          params=dict(feats_injection_mode="before_backbone")),
        embed_coords_cfg=dict(
            type="patchEmbed",
            params=dict(img_size=(28, 28), patch_size=(14, 14), embed_dim=384),
        ),
        head_cfg=dict(type="convhead",
                      params=dict(in_channels=384, num_layers=1,
                                  num_classes=1)),
        upsampler_cfg=dict(type="identity", params=dict()),
        save_cfg=dict(embed_coords=True, backbone=False, upsampler=False,
                      head=True),
        use_disks=True,
        norm_radius=5,
        with_prev_mask=True,
        attn_impl="jnp",
        dtype=jnp.bfloat16,
    )
    ds = TinyDataset()
    trainer = iSegTrainer(
        bf16_model, _cfg(tmp_path),
        loss_cfg={"instance_loss": NormalizedFocalLossSigmoid(alpha=0.5,
                                                              gamma=2),
                  "instance_loss_weight": 1.0},
        trainset=ds, valset=TinyDataset(n=8),
        optimizer="adam", optimizer_params={"lr": 1e-3},
        max_num_next_clicks=2, seed=7,
    )
    # master weights are f32 even though compute dtype is bf16
    for leaf in jax.tree.leaves(jax.device_get(trainer.params)["trainable"]):
        assert leaf.dtype == np.float32, f"param dtype {leaf.dtype}"

    before = jax.device_get(trainer.params)["trainable"]
    trainer.training(0)
    after = jax.device_get(trainer.params)["trainable"]
    assert all(np.isfinite(loss) for loss in trainer.epoch_losses)
    assert any(
        not np.array_equal(b, a)
        for b, a in zip(jax.tree.leaves(before["head"]),
                        jax.tree.leaves(after["head"]))
    ), "head params did not update under bf16"
    for leaf in jax.tree.leaves(after):
        assert leaf.dtype == np.float32


def test_training_dtype_knob_maps_to_model_dtype(tmp_path):
    import types as _t

    import jax.numpy as jnp

    from models.common import init_model_from_modules_cfg

    modules_cfg = dict(
        backbone=dict(type="dinov2",
                      params=dict(feats_injection_mode="before_backbone")),
        embed_coords=dict(type="patchEmbed",
                          params=dict(img_size=(28, 28), patch_size=(14, 14),
                                      embed_dim=384)),
        head=dict(type="convhead",
                  params=dict(in_channels=384, num_layers=1, num_classes=1)),
        upsampler=dict(type="identity", params=dict()),
        neck=None,
        save=dict(embed_coords=True, backbone=False, upsampler=False,
                  head=True),
        architecture="backbone_upsampler_head",
    )

    class _Cfg(dict):
        def __getattr__(self, k):
            return self[k]

    cfg = _Cfg(training_params=_Cfg(dtype="bfloat16"))
    model = init_model_from_modules_cfg(modules_cfg, cfg)
    assert model.dtype == jnp.bfloat16
    cfg_f32 = _Cfg(training_params=_Cfg())
    assert init_model_from_modules_cfg(modules_cfg, cfg_f32).dtype == jnp.float32
    import pytest as _pytest

    with _pytest.raises(ValueError):
        init_model_from_modules_cfg(
            modules_cfg, _Cfg(training_params=_Cfg(dtype="float16")))


def test_layerwise_decay_optimizer_scales_backbone_updates():
    """make_layerwise_decay_optimizer applies layer_decay^(D+1-layer) to
    backbone blocks and leaves non-backbone params unscaled (reference:
    core/training/optimizer.py:38-56, core/utils/lr_decay.py:15-87)."""
    import optax

    from isegprobe_tpu.training.optim import make_layerwise_decay_optimizer

    params = {
        "backbone": {
            "patch_embed": {"w": jnp.ones((2,))},
            "blocks_0": {"w": jnp.ones((2,))},
            "blocks_1": {"w": jnp.ones((2,))},
        },
        "head": {"w": jnp.ones((2,))},
    }
    tx = make_layerwise_decay_optimizer(
        "sgd", 1.0, params, num_layers=2, layer_decay=0.5,
        trainable_prefixes=("backbone", "head"), momentum=0.0,
    )
    state = tx.init(params)
    grads = jax.tree.map(jnp.ones_like, params)
    updates, _ = tx.update(grads, state, params)

    head = float(updates["head"]["w"][0])
    pe = float(updates["backbone"]["patch_embed"]["w"][0])
    b0 = float(updates["backbone"]["blocks_0"]["w"][0])
    b1 = float(updates["backbone"]["blocks_1"]["w"][0])
    # scales: layer ids pe=0, blocks_0=1, blocks_1=2; decay^(3-id)
    assert abs(pe / head - 0.5**3) < 1e-6
    assert abs(b0 / head - 0.5**2) < 1e-6
    assert abs(b1 / head - 0.5**1) < 1e-6


def test_trainer_layerwise_decay_flag_wires_and_noops_when_frozen(
        model, tmp_path):
    """layerwise_decay=True must construct (not silently ignore) the decay
    optimizer; with the default frozen backbone it is an honest no-op."""
    trainer = iSegTrainer(
        model,
        _cfg(tmp_path),
        loss_cfg={"instance_loss": NormalizedFocalLossSigmoid(alpha=0.5,
                                                              gamma=2),
                  "instance_loss_weight": 1.0},
        trainset=TinyDataset(),
        valset=TinyDataset(n=8),
        optimizer="adam",
        optimizer_params={"lr": 1e-3},
        layerwise_decay=True,
        seed=3,
    )
    # one step runs through the chained optimizer without error
    trainer.run(num_epochs=1, validation=False)
