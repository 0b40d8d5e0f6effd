"""End-to-end learning demonstration at test scale (RUN_SLOW=1).

Trains a tiny probe (near-identity random DINOv2 trunk, trainable click
encoder + conv head) on procedural shape scenes through the REAL pipeline —
iSegBaseDataset augmentation, MultiPointSampler click synthesis, iSegTrainer's
compiled sharded step with on-device click simulation — then scores NoC/mIoU
through the device evaluator on held-out scenes.  A trained head must beat the
random-init head decisively.

The full-size counterpart (flagship DINOv2-S/14 config, 40 epochs on a real
TPU chip, NoC@90 6.2 trained vs 20.0 random) is recorded in BASELINE.md; this
test keeps the same claim continuously verified on the CPU mesh.

Reference capability: core/training/trainer.py:180-311 +
core/inference/utils.py:174-246 (training until NoC tables come out).
"""

import os
import types

import numpy as np
import pytest

if not os.environ.get("RUN_SLOW"):
    pytest.skip("learning demo is RUN_SLOW=1 only", allow_module_level=True)

import dataclasses  # noqa: E402

import jax  # noqa: E402

from isegprobe_tpu.data import transforms as T  # noqa: E402
from isegprobe_tpu.data.datasets import SyntheticShapesDataset  # noqa: E402
from isegprobe_tpu.data.points_sampler import MultiPointSampler  # noqa: E402
from isegprobe_tpu.inference.device_eval import (  # noqa: E402
    evaluate_dataset_device,
    make_device_evaluator,
)
from isegprobe_tpu.inference.metrics import (  # noqa: E402
    compute_noc_metric,
    miou_at_k,
)
from isegprobe_tpu.models.probe_model import iSegProbeModel  # noqa: E402
from isegprobe_tpu.training.losses import (  # noqa: E402
    NormalizedFocalLossSigmoid,
)
from isegprobe_tpu.training.trainer import iSegTrainer  # noqa: E402

HW = 56


def _tiny_model():
    from isegprobe_tpu.models.featurizers import dinov2 as dinov2_mod
    from isegprobe_tpu.models.featurizers.dinov2 import DINOV2_ARCHS

    dinov2_mod.DINOV2_ARCHS["dinov2_tiny_learn"] = dataclasses.replace(
        DINOV2_ARCHS["dinov2_vits14"], embed_dim=96, depth=2, num_heads=4
    )
    return iSegProbeModel(
        backbone_cfg=dict(type="dinov2",
                          params=dict(arch="dinov2_tiny_learn",
                                      feats_injection_mode="before_backbone")),
        embed_coords_cfg=dict(
            type="patchEmbed",
            params=dict(img_size=(HW, HW), patch_size=(14, 14), embed_dim=96),
        ),
        head_cfg=dict(type="convhead",
                      params=dict(in_channels=96, num_layers=2, num_classes=1)),
        upsampler_cfg=dict(type="identity", params=dict()),
        save_cfg=dict(embed_coords=True, backbone=False, upsampler=False,
                      head=True),
        use_disks=True, norm_radius=5, with_prev_mask=True, attn_impl="jnp",
    )


def _dataset(seed, n):
    return SyntheticShapesDataset(
        n_samples=n, image_size=(HW, HW), max_shapes=1, seed=seed,
        augmentator=T.Compose([T.PadIfNeeded(HW, HW), T.RandomCrop(HW, HW)]),
        min_object_area=40,
        points_sampler=MultiPointSampler(max_num_points=4, prob_gamma=0.8,
                                         first_click_center=True),
        epoch_len=n,
    )


def _noc_miou(model, params, seed):
    run = make_device_evaluator(model, target_size=(HW, HW), max_clicks=8,
                                net_clicks_limit=8, pred_thr=0.49,
                                target_iou=0.50, with_flip=False)
    evalset = SyntheticShapesDataset(n_samples=12, image_size=(HW, HW),
                                     max_shapes=1, seed=seed,
                                     min_instance_area=120)
    ious = evaluate_dataset_device(run, params, evalset)
    noc, _, _ = compute_noc_metric(ious, iou_thrs=[0.50], max_clicks=8)
    return noc[0], float(miou_at_k(ious, 8)[-1])


def test_trained_head_beats_random_init(tmp_path):
    cfg = types.SimpleNamespace(
        dataloader=types.SimpleNamespace(batch_size=8, val_batch_size=8,
                                         workers=2),
        training=types.SimpleNamespace(start_epoch=0, weights=None),
        CHECKPOINTS_PATH=str(tmp_path / "ckpts"),
        LOGS_PATH=None,
    )
    model = _tiny_model()
    loss_cfg = {"instance_loss": NormalizedFocalLossSigmoid(alpha=0.5, gamma=2),
                "instance_loss_weight": 1.0}
    trainer = iSegTrainer(
        model, cfg, loss_cfg, _dataset(1, 64), _dataset(2, 8),
        optimizer="adam", optimizer_params={"lr": 2e-3},
        checkpoint_interval=100, image_dump_interval=-1,
        max_interactive_points=4, max_num_next_clicks=1, seed=0,
    )

    random_params = {**jax.device_get(trainer.params)["trainable"],
                     **jax.device_get(trainer.params)["frozen"]}
    noc_rand, miou_rand = _noc_miou(model, random_params, seed=777)

    for epoch in range(8):
        trainer.training(epoch)

    trained_params = trainer.full_params()
    noc_trained, miou_trained = _noc_miou(model, trained_params, seed=777)

    print(f"NoC@50: random {noc_rand:.2f} -> trained {noc_trained:.2f}; "
          f"mIoU@8: {miou_rand:.3f} -> {miou_trained:.3f}")
    assert miou_trained > miou_rand + 0.15, (
        f"no learning: mIoU {miou_rand:.3f} -> {miou_trained:.3f}"
    )
    assert noc_trained < noc_rand - 2.0, (
        f"no NoC improvement: {noc_rand:.2f} -> {noc_trained:.2f}"
    )
