"""Golden per-click parity: the reference torch pipeline (BasePredictor +
fixed-ZoomIn + flip TTA + clicker) vs our compiled TPUPredictor, on the same
random-init weights. This is the NoC-parity test (SURVEY.md §7 hard part #1):
click sequences must match exactly and probability maps closely."""

import numpy as np
import pytest

from tests.reference_oracle import setup_reference

if not setup_reference():
    pytest.skip("reference tree unavailable", allow_module_level=True)

import torch  # noqa: E402
import torch.nn as tnn  # noqa: E402

SIZE = 112  # ZoomIn target (divisible by 14)


def _make_torch_model():
    """Reference-style iSegProbeModel: DINOv2 trunk + PatchEmbed click encoder
    + 1-layer ConvSegHead, early injection (mirrors the flagship config)."""
    from core.model.featurizers.DINOv2 import DinoVisionTransformer
    from core.model.featurizers.utils import PatchEmbed
    from core.model.iseg_base_model import iSegBaseModel

    class TorchProbe(iSegBaseModel):
        def __init__(self):
            super().__init__(use_disks=True, norm_radius=5, with_prev_mask=True)
            self.backbone = DinoVisionTransformer(
                img_size=518, patch_size=14, embed_dim=64, depth=2,
                num_heads=4, init_values=1.0,
            )
            self.embed_coords = PatchEmbed(
                img_size=(SIZE, SIZE), patch_size=(14, 14), in_chans=3,
                embed_dim=64,
            )
            self.conv = tnn.Conv2d(64, 64, 3, padding=1)
            self.classifier = tnn.Conv2d(64, 1, 1)

        def backbone_forward(self, image, coord_features=None):
            b, _, h, w = image.shape
            gh, gw = h // 14, w // 14
            tokens = self.backbone.patch_embed(image)
            tokens = tokens + self.embed_coords(coord_features)
            x = torch.cat(
                (self.backbone.cls_token.expand(b, -1, -1), tokens), dim=1
            )
            x = x + self.backbone.interpolate_pos_encoding(x, h, w)
            for blk in self.backbone.blocks:
                x = blk(x)
            feats = self.backbone.norm(x)[:, 1:]
            feats = feats.reshape(b, gh, gw, -1).permute(0, 3, 1, 2)
            out = self.classifier(torch.relu(self.conv(feats)))
            return {"instances": out, "instances_aux": None}

    m = TorchProbe()
    g = torch.Generator().manual_seed(7)
    sd = m.state_dict()
    for k, v in sd.items():
        sd[k] = torch.randn(v.shape, generator=g) * 0.05
    m.load_state_dict(sd)
    return m.eval()


def _convert(tm):
    from isegprobe_tpu.models.convert import _conv_patch, convert_vit

    sd = tm.state_dict()
    backbone = {"model": convert_vit(
        {k.removeprefix("backbone."): v for k, v in sd.items()
         if k.startswith("backbone.")},
        depth=2, layerscale=True,
    )}
    return {
        "backbone": backbone,
        "embed_coords": {"proj": _conv_patch(sd, "embed_coords.proj")},
        "head": {
            "convs_0": _conv_patch(sd, "conv"),
            "classifier": _conv_patch(sd, "classifier"),
        },
    }


def _make_jax_model():
    import dataclasses

    import flax.linen as nn
    import jax.numpy as jnp

    from isegprobe_tpu.models.featurizers.dinov2 import DINOV2_ARCHS
    from isegprobe_tpu.models.probe_model import iSegProbeModel
    from isegprobe_tpu.models.vit import ViT

    # a tiny dinov2 arch entry so the registry path is exercised
    from isegprobe_tpu.models.featurizers import dinov2 as dinov2_mod

    dinov2_mod.DINOV2_ARCHS["dinov2_tiny_test"] = dataclasses.replace(
        DINOV2_ARCHS["dinov2_vits14"], embed_dim=64, depth=2, num_heads=4
    )
    return iSegProbeModel(
        backbone_cfg=dict(type="dinov2",
                          params=dict(arch="dinov2_tiny_test",
                                      feats_injection_mode="before_backbone")),
        embed_coords_cfg=dict(
            type="patchEmbed",
            params=dict(img_size=(SIZE, SIZE), patch_size=(14, 14),
                        embed_dim=64),
        ),
        head_cfg=dict(type="convhead",
                      params=dict(in_channels=64, num_layers=1, num_classes=1)),
        upsampler_cfg=dict(type="identity", params=dict()),
        use_disks=True,
        norm_radius=5,
        with_prev_mask=True,
        attn_impl="jnp",
    )


def _synthetic():
    rng = np.random.default_rng(3)
    img = (rng.random((90, 100, 3)) * 70).astype(np.uint8)
    gt = np.zeros((90, 100), dtype=np.int32)
    gt[25:65, 30:80] = 1
    img[gt == 1] = [190, 170, 80]
    return img, gt


def test_per_click_pipeline_parity():
    from core.inference.clicker import Clicker as TorchClicker
    from core.inference.predictors import get_predictor as torch_get_predictor

    from isegprobe_tpu.inference.clicker import Clicker
    from isegprobe_tpu.inference.predictor import TPUPredictor

    tm = _make_torch_model()
    params = _convert(tm)
    jm = _make_jax_model()

    img, gt = _synthetic()

    torch_predictor = torch_get_predictor(
        tm, "NoBRS", torch.device("cpu"), prob_thresh=0.49, with_flip=True,
        zoom_in_params={"skip_clicks": -1, "target_size": (SIZE, SIZE)},
        predictor_params={"net_clicks_limit": 5},
    )
    jax_predictor = TPUPredictor(
        jm, params, target_size=(SIZE, SIZE), skip_clicks=-1, with_flip=True,
        net_clicks_limit=5,
    )

    timg = img.astype(np.float32) / 255.0
    with torch.no_grad():
        torch_predictor.set_input_image(
            torch.from_numpy(np.moveaxis(timg, -1, 0).copy())
        )
    jax_predictor.set_input_image(img)

    t_clicker = TorchClicker(gt_mask=gt)
    j_clicker = Clicker(gt_mask=gt)
    t_mask = np.zeros_like(gt, dtype=bool)
    j_mask = np.zeros_like(gt, dtype=bool)

    for click_i in range(3):
        t_clicker.make_next_click(t_mask)
        j_clicker.make_next_click(j_mask)
        tc, jc = t_clicker.clicks_list[-1], j_clicker.clicks_list[-1]
        assert (tc.is_positive, tuple(tc.coords)) == (
            jc.is_positive, tuple(jc.coords),
        ), f"click {click_i} diverged: {tc.coords} vs {jc.coords}"

        with torch.no_grad():
            t_probs = torch_predictor.get_prediction(t_clicker)
        j_probs = jax_predictor.get_prediction(j_clicker)

        assert t_probs.shape == j_probs.shape
        np.testing.assert_allclose(j_probs, t_probs, rtol=5e-3, atol=2e-3)
        t_mask = t_probs > 0.49
        j_mask = j_probs > 0.49
        agree = (t_mask == j_mask).mean()
        assert agree > 0.999, f"mask agreement {agree} at click {click_i}"
