"""Full-experiment-scale golden parity vs the torch reference (slow).

The fast suite pins parity at toy scale (depth 2-3, dim 64); this file re-runs
it at the shapes the experiments actually use — DINOv2-S/14 (384/12/6) at
448², CLIP-B/16 (768/12/12) at 224², and a full 20-click predictor trajectory
at the fixed-448 ZoomIn protocol — where bf16 matmul defaults, the +0.1
pos-embed interpolation offset, and f32 accumulation error actually bite.

Tolerance derivation (both sides run f32 with HIGHEST matmul precision):
one K-wide dot product accumulates ~sqrt(K)·eps_f32 relative error
(K=384 -> ~2.4e-6, K=768 -> ~3.4e-6); a 12-block ViT chains ~25 matmuls but
LayerNorm renormalizes scale between them, so end-to-end absolute error on
O(1) activations stays below ~1e-4. We assert 5e-4 abs / 1e-3 rel (4x
headroom) and 2e-3 on post-sigmoid probabilities.

Gated behind RUN_SLOW=1 (several minutes of torch-CPU forwards):

    RUN_SLOW=1 python -m pytest tests/test_fullscale_parity.py -v
"""

import os

import numpy as np
import pytest

from tests.reference_oracle import setup_reference

if not os.environ.get("RUN_SLOW"):
    pytest.skip("full-scale parity is RUN_SLOW=1 only", allow_module_level=True)
if not setup_reference():
    pytest.skip("reference tree unavailable", allow_module_level=True)

import jax.numpy as jnp  # noqa: E402
import torch  # noqa: E402
import torch.nn as tnn  # noqa: E402

SIZE = 448  # experiment eval resolution (fixed448 protocol)

ACT_TOL = dict(rtol=1e-3, atol=5e-4)
PROB_TOL = dict(rtol=5e-3, atol=2e-3)


def _randomize(module, seed, scale=0.02):
    sd = module.state_dict()
    g = torch.Generator().manual_seed(seed)
    for k, v in sd.items():
        sd[k] = torch.randn(v.shape, generator=g) * scale
    module.load_state_dict(sd)
    return module.eval()


# ---------------------------------------------------------------- DINOv2-S/14


def test_dinov2_vits14_448_parity():
    from core.model.featurizers.DINOv2 import DinoVisionTransformer

    from isegprobe_tpu.models.convert import convert_vit
    from isegprobe_tpu.models.vit import ViT, ViTConfig

    tm = _randomize(
        DinoVisionTransformer(img_size=518, patch_size=14, embed_dim=384,
                              depth=12, num_heads=6, init_values=1e-5),
        seed=11,
    )
    jm = ViT(ViTConfig(patch_size=14, embed_dim=384, depth=12, num_heads=6,
                       layerscale=True, pretrain_grid=(37, 37),
                       interpolate_offset=0.1, attn_impl="jnp"))
    params = convert_vit(tm.state_dict(), depth=12, layerscale=True)

    rng = np.random.default_rng(0)
    x = rng.standard_normal((1, SIZE, SIZE, 3), dtype=np.float32)
    with torch.no_grad():
        want = tm.forward_features(
            torch.from_numpy(np.moveaxis(x, -1, 1).copy())
        )["x_norm_patchtokens"].numpy()
    got = np.asarray(
        jm.apply({"params": params}, jnp.asarray(x))["patch_tokens"]
    )
    err = np.abs(got - want).max()
    print(f"dinov2-s/14 @448 max abs err: {err:.2e}")
    np.testing.assert_allclose(got, want, **ACT_TOL)


# ---------------------------------------------------------------- CLIP-B/16


def test_clip_vitb16_224_parity():
    from core.model.featurizers.maskclip.model import VisionTransformer

    from isegprobe_tpu.models.convert import convert_clip_visual
    from isegprobe_tpu.models.featurizers.maskclip import CLIPVisionTransformer

    tm = _randomize(
        VisionTransformer(input_resolution=224, patch_size=16, width=768,
                          layers=12, heads=12, output_dim=512),
        seed=13,
    )
    jm = CLIPVisionTransformer(patch_size=16, width=768, layers=12, heads=12,
                               output_dim=512, pretrain_grid=14,
                               attn_impl="jnp")
    params = convert_clip_visual(tm.state_dict(), layers=12)

    rng = np.random.default_rng(1)
    x = rng.standard_normal((1, 224, 224, 3), dtype=np.float32)
    with torch.no_grad():
        want = tm(torch.from_numpy(np.moveaxis(x, -1, 1).copy()),
                  patch_output=True).numpy()
    got = np.asarray(jm.apply({"params": params}, jnp.asarray(x)))
    err = np.abs(got - want).max()
    print(f"clip-b/16 @224 max abs err: {err:.2e}")
    np.testing.assert_allclose(got, want, **ACT_TOL)


# ------------------------------------------------- flagship 20-click trajectory


def _make_torch_probe():
    """Full-size flagship: DINOv2-S/14 trunk + PatchEmbed click encoder +
    2-layer ConvSegHead, early injection, at the fixed-448 eval protocol."""
    from core.model.featurizers.DINOv2 import DinoVisionTransformer
    from core.model.featurizers.utils import PatchEmbed
    from core.model.iseg_base_model import iSegBaseModel

    class TorchProbe(iSegBaseModel):
        def __init__(self):
            super().__init__(use_disks=True, norm_radius=5,
                             with_prev_mask=True)
            self.backbone = DinoVisionTransformer(
                img_size=518, patch_size=14, embed_dim=384, depth=12,
                num_heads=6, init_values=1e-5,
            )
            self.embed_coords = PatchEmbed(
                img_size=(SIZE, SIZE), patch_size=(14, 14), in_chans=3,
                embed_dim=384,
            )
            self.conv0 = tnn.Conv2d(384, 384, 3, padding=1)
            self.conv1 = tnn.Conv2d(384, 384, 3, padding=1)
            self.classifier = tnn.Conv2d(384, 1, 1)

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
            h1 = torch.relu(self.conv0(feats))
            h2 = torch.relu(self.conv1(h1))
            return {"instances": self.classifier(h2), "instances_aux": None}

    return _randomize(TorchProbe(), seed=7, scale=0.05)


def _convert_probe(tm):
    from isegprobe_tpu.models.convert import _conv_patch, convert_vit

    sd = tm.state_dict()
    backbone = {"model": convert_vit(
        {k.removeprefix("backbone."): v for k, v in sd.items()
         if k.startswith("backbone.")},
        depth=12, layerscale=True,
    )}
    return {
        "backbone": backbone,
        "embed_coords": {"proj": _conv_patch(sd, "embed_coords.proj")},
        "head": {
            "convs_0": _conv_patch(sd, "conv0"),
            "convs_1": _conv_patch(sd, "conv1"),
            "classifier": _conv_patch(sd, "classifier"),
        },
    }


def _make_jax_probe():
    from isegprobe_tpu.models.probe_model import iSegProbeModel

    return iSegProbeModel(
        backbone_cfg=dict(type="dinov2",
                          params=dict(feats_injection_mode="before_backbone")),
        embed_coords_cfg=dict(
            type="patchEmbed",
            params=dict(img_size=(SIZE, SIZE), patch_size=(14, 14),
                        embed_dim=384),
        ),
        head_cfg=dict(type="convhead",
                      params=dict(in_channels=384, num_layers=2,
                                  num_classes=1)),
        upsampler_cfg=dict(type="identity", params=dict()),
        use_disks=True, norm_radius=5, with_prev_mask=True, attn_impl="jnp",
    )


def _scene():
    """DAVIS-ish frame: one textured object over a noisy background."""
    rng = np.random.default_rng(42)
    img = (rng.random((360, 480, 3)) * 80).astype(np.uint8)
    gt = np.zeros((360, 480), np.int32)
    yy, xx = np.mgrid[:360, :480]
    gt[((yy - 180) / 95.0) ** 2 + ((xx - 250) / 130.0) ** 2 <= 1.0] = 1
    img[gt == 1] = (np.asarray([175, 160, 90])
                    + rng.normal(0, 12, (int((gt == 1).sum()), 3))).clip(
        0, 255
    ).astype(np.uint8)
    return img, gt


def test_full_scale_20_click_trajectory():
    from core.inference.clicker import Clicker as TorchClicker
    from core.inference.predictors import get_predictor as torch_get_predictor

    from isegprobe_tpu.inference.clicker import Clicker
    from isegprobe_tpu.inference.predictor import TPUPredictor

    tm = _make_torch_probe()
    params = _convert_probe(tm)
    jm = _make_jax_probe()
    img, gt = _scene()

    n_clicks = 20
    torch_predictor = torch_get_predictor(
        tm, "NoBRS", torch.device("cpu"), prob_thresh=0.49, with_flip=True,
        zoom_in_params={"skip_clicks": -1, "target_size": (SIZE, SIZE)},
        predictor_params={"net_clicks_limit": n_clicks},
    )
    jax_predictor = TPUPredictor(
        jm, params, target_size=(SIZE, SIZE), skip_clicks=-1, with_flip=True,
        net_clicks_limit=n_clicks,
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

    max_prob_err = 0.0
    for click_i in range(n_clicks):
        t_clicker.make_next_click(t_mask)
        j_clicker.make_next_click(j_mask)
        tc, jc = t_clicker.clicks_list[-1], j_clicker.clicks_list[-1]
        assert (tc.is_positive, tuple(tc.coords)) == (
            jc.is_positive, tuple(jc.coords),
        ), f"click {click_i} diverged: {tc.coords} vs {jc.coords}"

        with torch.no_grad():
            t_probs = torch_predictor.get_prediction(t_clicker)
        j_probs = jax_predictor.get_prediction(j_clicker)

        max_prob_err = max(max_prob_err,
                           float(np.abs(j_probs - t_probs).max()))
        np.testing.assert_allclose(j_probs, t_probs, **PROB_TOL)
        t_mask = t_probs > 0.49
        j_mask = j_probs > 0.49
        agree = (t_mask == j_mask).mean()
        assert agree > 0.999, f"mask agreement {agree} at click {click_i}"
    print(f"20-click trajectory @448: max |Δprob| = {max_prob_err:.2e}")
