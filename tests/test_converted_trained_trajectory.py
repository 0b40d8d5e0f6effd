"""Converted-TRAINED-weights trajectory identity (VERDICT r3 #2, r4 #5).

The strongest offline stand-in for real-checkpoint parity: train the torch
reference's trainable parts via its OWN ``iSegTrainer`` (reference:
core/training/trainer.py:377-477) for a small budget on a synthetic fixture,
save with the reference's OWN checkpoint writer (core/utils/misc.py:36-68 —
``get_state_dict_to_save`` save_cfg filtering + the @serialize config with
{'type','value','specified'} wrappers, core/utils/serialization.py:19-36),
convert with ``convert_reference_checkpoint``, and assert this framework
reproduces the IDENTICAL per-click IoU trajectory and NoC from those exact
optimizer-produced weights (f32, fixed ZoomIn + flip, the experiment
protocol).

Three architecture legs (r4 #5 asked for the converters real checkpoints
would exercise beyond the flagship):

* ``flagship`` — DINOv2-S early injection + identity upsampler;
* ``loftup``  — the LoftUp learned upsampler loaded from a RAW torch
  checkpoint through the reference's key surgery on its side
  (loftup/loftup.py:152-177) and through ``load_upsampler_params``/
  ``convert_loftup_raw`` on ours;
* ``maskclip`` — the MaskCLIP backbone (packed in_proj attention), with the
  visual weights round-tripped through fp16 before training — the dtype
  real CLIP checkpoints ship in — so ``convert_clip_visual``'s fp16
  handling is on the identity path.

Unlike test_trained_outcome_parity (independent trainings, outcome bands),
this is an equality claim: given the same trained weights, the two eval
stacks must walk the same clicks to the same IoUs.
"""

import types
from pathlib import Path

import numpy as np
import pytest

from tests.reference_oracle import setup_reference_training

HAS_REF = setup_reference_training()
if not HAS_REF:
    pytest.skip("reference tree unavailable", allow_module_level=True)

import torch  # noqa: E402

from isegprobe_tpu.data.datasets.synthetic import render_scene  # noqa: E402
from isegprobe_tpu.utils.config import EDict  # noqa: E402

CROP = 112
EPOCHS = 2
N_TRAIN, TRAIN_SEED = 16, 31
N_EVAL, EVAL_SEED, EVAL_MIN_AREA = 6, 77, 300
MAX_CLICKS = 8  # enough clicks to exercise the ZoomIn/prev-mask state loop
# the loftup leg runs at a smaller crop: the torch LoftUp cross-attention is
# quadratic-ish in pixels (CPU minutes at 1122) and the converter/key-surgery
# coverage is crop-independent
LOFTUP_CROP = 56

# tiny CLIP dims for the maskclip leg (the reference pins model_name
# 'ViT-B/16'; both sides' arch tables are patched to these dims so the
# CONVERTER path — packed in_proj, ln_pre/ln_post, value trick — is the real
# one at CPU-testable scale)
TINY_CLIP = dict(patch_size=16, width=128, layers=2, heads=2, output_dim=64,
                 pretrain_grid=14)


def _scene_objects(index, seed, min_area, crop=CROP):
    rng = np.random.default_rng(seed * 1_000_003 + index)
    n_shapes = int(rng.integers(1, 4))
    image, labels = render_scene(rng, (crop, crop), n_shapes)
    present = [i for i in range(1, n_shapes + 1)
               if (labels == i).sum() >= max(1, min_area)]
    return image, labels, present


def _ref_dataset(n, seed, min_area=80, crop=CROP, **kwargs):
    from core.data.base_dataset import iSegBaseDataset as RefBaseDataset
    from core.data.data_sample import DSample as RefDSample

    class RefSyntheticDataset(RefBaseDataset):
        def __init__(self, **kw):
            super().__init__(**kw)
            self.dataset_samples = list(range(n))

        def get_sample(self, index):
            image, labels, present = _scene_objects(index, seed, min_area,
                                                    crop)
            return RefDSample(image, labels, objects_ids=present,
                              sample_id=index)

    return RefSyntheticDataset(**kwargs)


def _make_raw_loftup_ckpt(tmp_path) -> Path:
    """A RAW (pre-surgery) LoftUp checkpoint in the on-disk layout the LoftUp
    training code writes: ChannelNorm under ``model.1.``, the upsampler under
    ``upsampler.`` (reference loader: loftup/loftup.py:152-177)."""
    from core.model.upsamplers.loftup.layers import ChannelNorm
    from core.model.upsamplers.loftup.loftup import (
        LoftUp,
        UpsamplerwithChannelNorm,
    )

    torch.manual_seed(11)
    tm = UpsamplerwithChannelNorm(
        LoftUp(384, lr_pe_type="sine", lr_size=16), ChannelNorm(384)).eval()
    for m in tm.modules():
        if isinstance(m, torch.nn.BatchNorm2d):
            m.running_mean.normal_(0, 0.5)
            m.running_var.uniform_(0.5, 2.0)
    sd = {}
    for k, v in tm.state_dict().items():
        if k.startswith("channelnorm."):
            sd["model.1." + k.removeprefix("channelnorm.")] = v
        else:
            sd[k] = v  # already 'upsampler.*'
    path = Path(tmp_path) / "loftup_raw.pth"
    torch.save({"state_dict": sd}, path)
    return path


def _patch_tiny_clip(monkeypatch):
    """Route BOTH stacks' 'ViT-B/16' to the tiny CLIP: the reference's
    clip.load (which would download, clip.py:118) builds a random tiny CLIP
    with fp16-round-tripped visual weights; our CLIP_ARCHS entry mirrors the
    dims."""
    from core.model.featurizers.maskclip import clip as ref_clip
    from core.model.featurizers.maskclip.model import CLIP

    from isegprobe_tpu.models.featurizers import maskclip as our_maskclip

    torch.manual_seed(7)
    tiny = CLIP(embed_dim=TINY_CLIP["output_dim"], image_resolution=224,
                vision_layers=TINY_CLIP["layers"],
                vision_width=TINY_CLIP["width"],
                vision_patch_size=TINY_CLIP["patch_size"], context_length=16,
                vocab_size=64, transformer_width=32, transformer_heads=2,
                transformer_layers=1).eval()
    # fp16 round-trip: real CLIP checkpoints ship half weights
    # (reference model.py convert_weights); rounding BEFORE training makes
    # the torch eval and our fp16-dict conversion see identical values
    vis_sd = {k: v.half().float() for k, v in tiny.visual.state_dict().items()}
    tiny.visual.load_state_dict(vis_sd)

    monkeypatch.setattr(ref_clip, "load",
                        lambda name, **kw: (tiny, None))
    monkeypatch.setitem(our_maskclip.CLIP_ARCHS, "ViT-B/16", dict(TINY_CLIP))
    return tiny


ARCHS = {
    "flagship": dict(
        backbone_cfg=dict(
            type="dinov2",
            params=dict(feats_injection_mode="before_backbone")),
        embed_dim=384, head_in=384, upsampler=dict(type="identity",
                                                   params=dict()),
    ),
    "loftup": dict(
        backbone_cfg=dict(
            type="dinov2",
            params=dict(feats_injection_mode="before_backbone")),
        embed_dim=384, head_in=384, upsampler="loftup",  # built per-run
    ),
    "maskclip": dict(
        backbone_cfg=dict(
            type="mask_clip",
            params=dict(model_name="ViT-B/16",
                        feats_injection_mode="before_backbone")),
        embed_dim=TINY_CLIP["width"], head_in=TINY_CLIP["output_dim"],
        upsampler=dict(type="identity", params=dict()),
        patch=TINY_CLIP["patch_size"],
    ),
}


def _train_and_save_torch(tmp_path, arch):
    """Reference-trained checkpoint through the reference's own save path."""
    import core.training.trainer as ref_trainer_mod
    from core.data.points_sampler import MultiPointSampler as RefMPS
    from core.model.iseg_probe_model import iSegProbeModel as TorchProbeModel
    from core.training.losses import NormalizedFocalLossSigmoid as RefNFL
    from core.training.metrics import AdaptiveIoU as RefAdaptiveIoU
    from core.utils.misc import save_checkpoint as ref_save_checkpoint
    from core.utils.model_builder import ModelBuilder

    spec = ARCHS[arch]
    crop = LOFTUP_CROP if arch == "loftup" else CROP
    upsampler_cfg = spec["upsampler"]
    if upsampler_cfg == "loftup":
        raw = _make_raw_loftup_ckpt(tmp_path)
        upsampler_cfg = dict(type="loftup",
                             params=dict(upsampler_path=str(raw), n_dim=384))
    patch = spec.get("patch", 14)

    torch.manual_seed(3)
    torch.set_num_threads(8)
    model = TorchProbeModel(
        backbone_cfg=dict(spec["backbone_cfg"]),
        embed_coords_cfg=dict(
            type="patchEmbed",
            params=dict(img_size=(crop, crop), patch_size=(patch, patch),
                        embed_dim=spec["embed_dim"])),
        head_cfg=dict(type="convhead",
                      params=dict(in_channels=spec["head_in"], num_layers=2,
                                  num_classes=1)),
        upsampler_cfg=upsampler_cfg,
        # the flagship experiment's save filter (reference:
        # models/sbd/dinov2/patch-embed_noup.py:65-70)
        save_cfg=dict(embed_coords=True, backbone=False, upsampler=False,
                      head=True),
        architecture="backbone_upsampler_head",
        model_builder=ModelBuilder(),
        use_disks=True, norm_radius=5, with_prev_mask=True,
    )

    trainset = _ref_dataset(
        N_TRAIN, TRAIN_SEED, crop=crop,
        points_sampler=RefMPS(4, prob_gamma=0.8, merge_objects_prob=0.15,
                              max_num_merged_objects=2),
        min_object_area=80, keep_background_prob=0.01,
    )
    valset = _ref_dataset(8, TRAIN_SEED + 1, crop=crop,
                          points_sampler=RefMPS(4, prob_gamma=0.8),
                          min_object_area=80)
    out = Path(tmp_path) / "ref_run"
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
        optimizer="adam", optimizer_params={"lr": 2e-4},
        image_dump_interval=-1, checkpoint_interval=10_000,
        metrics=[RefAdaptiveIoU()],
        max_interactive_points=4, max_num_next_clicks=3, seed=0,
    )
    for epoch in range(EPOCHS):
        trainer.training(epoch)

    ref_save_checkpoint(trainer.net.eval(), out / "ckpts", verbose=False)
    return out / "ckpts" / "last_checkpoint.pth", trainer.net.eval()


def _eval_torch(model, crop=CROP, min_area=EVAL_MIN_AREA):
    from core.inference.evaluation import evaluate_dataset as ref_eval
    from core.inference.predictors import get_predictor as ref_get_predictor

    predictor = ref_get_predictor(
        model, "NoBRS", torch.device("cpu"), prob_thresh=0.49,
        with_flip=True,
        zoom_in_params={"skip_clicks": -1, "target_size": (crop, crop)},
    )
    evalset = _ref_dataset(N_EVAL, EVAL_SEED, min_area=min_area, crop=crop)
    ious, _ = ref_eval(evalset, predictor, max_iou_thr=0.90, pred_thr=0.49,
                       max_clicks=MAX_CLICKS)
    return ious


def _eval_ours_from_checkpoint(ckpt_path, torch_model, arch, crop=CROP,
                               min_area=EVAL_MIN_AREA):
    """Load the CONVERTED reference checkpoint and evaluate: checkpoint ->
    convert_reference_checkpoint -> build_model(config) -> merge over fresh
    init -> transplant the SAME frozen trunk (offline stand-in for the
    torch.hub reload the reference does at eval,
    core/inference/utils.py:37-83); the loftup leg additionally loads the
    frozen upsampler from the config's upsampler_path — the RAW torch
    checkpoint — through load_upsampler_params' key surgery."""
    import jax

    from isegprobe_tpu.data.datasets import SyntheticShapesDataset
    from isegprobe_tpu.inference.evaluation import evaluate_dataset
    from isegprobe_tpu.inference.predictor import TPUPredictor
    from isegprobe_tpu.models.convert import (
        convert_clip_visual,
        convert_reference_checkpoint,
        convert_vit,
        load_upsampler_params,
    )
    from isegprobe_tpu.utils.serialization import (
        build_model,
        merge_params,
    )

    ckpt = torch.load(ckpt_path, map_location="cpu", weights_only=False)
    # the genuine format round-trips: @serialize wrappers + filtered sd
    assert set(ckpt) == {"state_dict", "config"}
    assert all(k.startswith(("embed_coords.", "head."))
               for k in ckpt["state_dict"]), "save_cfg filter not applied"
    conv = convert_reference_checkpoint(ckpt)
    cfg_params = conv["config"]["params"]
    assert cfg_params["backbone_cfg"]["type"] == \
        ARCHS[arch]["backbone_cfg"]["type"], (
            "serialize wrappers must unwrap to plain config values")

    model = build_model(conv["config"], attn_impl="jnp")
    image = np.zeros((1, crop, crop, 4), dtype=np.float32)
    points = np.full((1, 8, 3), -1.0, dtype=np.float32)
    full = model.init(jax.random.PRNGKey(0), image, points)["params"]
    params = merge_params(full, conv["params"])
    # frozen trunk: same weights the torch eval uses (zero egress stand-in)
    if arch == "maskclip":
        # the fp16 state dict — the dtype real CLIP checkpoints ship
        params["backbone"]["model"] = convert_clip_visual(
            {k: v.half()
             for k, v in torch_model.backbone.model.visual.state_dict().items()},
            layers=TINY_CLIP["layers"])
    else:
        params["backbone"]["model"] = convert_vit(
            {k: v for k, v in torch_model.backbone.model.state_dict().items()},
            depth=12, layerscale=True)
    # frozen upsampler from upsampler_path (loftup leg): raw torch ckpt ->
    # key surgery -> convert — the path evaluate.py takes for real weights
    up_loaded = load_upsampler_params(cfg_params.get("upsampler_cfg"))
    if arch == "loftup":
        assert up_loaded is not None, "upsampler_path did not load"
    if up_loaded is not None:
        params["upsampler"] = merge_params(params["upsampler"], up_loaded)

    predictor = TPUPredictor(model, params, target_size=(crop, crop),
                             with_flip=True, net_clicks_limit=MAX_CLICKS)
    evalset = SyntheticShapesDataset(n_samples=N_EVAL,
                                     image_size=(crop, crop), seed=EVAL_SEED,
                                     min_instance_area=min_area)
    ious, _ = evaluate_dataset(evalset, predictor, max_iou_thr=0.90,
                               pred_thr=0.49, max_clicks=MAX_CLICKS)
    return ious


@pytest.mark.parametrize("arch", ["flagship", "loftup", "maskclip"])
def test_converted_trained_weights_trajectory_identity(tmp_path, monkeypatch,
                                                       arch):
    from isegprobe_tpu.inference.metrics import compute_noc_metric

    if arch == "maskclip":
        _patch_tiny_clip(monkeypatch)
    crop = LOFTUP_CROP if arch == "loftup" else CROP
    # min eval-object area scales with the crop area
    min_area = EVAL_MIN_AREA * crop * crop // (CROP * CROP)

    ckpt_path, torch_model = _train_and_save_torch(tmp_path, arch)
    torch_ious = _eval_torch(torch_model, crop, min_area)
    our_ious = _eval_ours_from_checkpoint(ckpt_path, torch_model, arch, crop,
                                          min_area)

    assert len(torch_ious) == len(our_ious)
    for i, (ti, oi) in enumerate(zip(torch_ious, our_ious)):
        ti, oi = np.asarray(ti), np.asarray(oi)
        # identical click counts (same early-stop decisions)...
        assert len(ti) == len(oi), (
            f"sample {i}: click counts diverge ({len(ti)} vs {len(oi)})")
        # ...and the same IoU after every click (thresholded masks agree up
        # to border pixels where f32 vs XLA-fused rounding can flip a prob
        # that sits exactly at the threshold)
        np.testing.assert_allclose(oi, ti, atol=5e-3, err_msg=(
            f"sample {i}: per-click IoU trajectory diverges"))

    noc_t, _, over_t = compute_noc_metric(torch_ious,
                                          iou_thrs=[0.8, 0.85, 0.9],
                                          max_clicks=MAX_CLICKS)
    noc_o, _, over_o = compute_noc_metric(our_ious,
                                          iou_thrs=[0.8, 0.85, 0.9],
                                          max_clicks=MAX_CLICKS)
    np.testing.assert_array_equal(noc_o, noc_t)
    np.testing.assert_array_equal(over_o, over_t)
    print(f"[{arch}] converted-trained-weights NoC@80/85/90 identical: "
          f"{noc_o[0]:.2f}/{noc_o[1]:.2f}/{noc_o[2]:.2f}")
