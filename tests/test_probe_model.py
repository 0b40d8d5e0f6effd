"""End-to-end probe-model forward: shapes, injection modes, save filtering."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from isegprobe_tpu.models.probe_model import filter_state_dict, iSegProbeModel


def _tiny_model(injection="before_backbone", upsampler="identity",
                with_prev_mask=True):
    # Full-size DINOv2-S/14 config but tiny image keeps the test fast.
    return iSegProbeModel(
        backbone_cfg=dict(type="dinov2",
                          params=dict(feats_injection_mode=injection)),
        embed_coords_cfg=dict(
            type="patchEmbed",
            params=dict(img_size=(56, 56), patch_size=(14, 14), embed_dim=384),
        ),
        head_cfg=dict(type="convhead",
                      params=dict(in_channels=384, num_layers=2, num_classes=1)),
        upsampler_cfg=dict(type=upsampler, params=dict()),
        save_cfg=dict(embed_coords=True, backbone=False, upsampler=False, head=True),
        use_disks=True,
        norm_radius=5,
        with_prev_mask=with_prev_mask,
        attn_impl="jnp",
    )


def _inputs(b=1, hw=56, n=3, with_prev=True):
    rng = np.random.default_rng(0)
    c = 4 if with_prev else 3
    image = rng.random((b, hw, hw, c), dtype=np.float32)
    points = np.full((b, 2 * n, 3), -1.0, dtype=np.float32)
    points[:, 0] = [10, 20, 0]
    return jnp.asarray(image), jnp.asarray(points)


@pytest.mark.parametrize("injection", ["before_backbone", "after_backbone"])
def test_forward_shapes(injection):
    model = _tiny_model(injection)
    image, points = _inputs()
    params = model.init(jax.random.PRNGKey(0), image, points)["params"]
    out = model.apply({"params": params}, image, points)
    assert out["instances"].shape == (1, 56, 56, 1)
    assert np.isfinite(np.asarray(out["instances"])).all()


def test_bilinear_upsampler_path():
    model = _tiny_model(upsampler="bilinear")
    image, points = _inputs()
    params = model.init(jax.random.PRNGKey(0), image, points)["params"]
    out = model.apply({"params": params}, image, points)
    assert out["instances"].shape == (1, 56, 56, 1)


def test_lowres_highres_feats():
    model = _tiny_model()
    image, points = _inputs()
    params = model.init(jax.random.PRNGKey(0), image, points)["params"]
    _, feats = model.apply(
        {"params": params}, image, points, method=model.get_lowres_highres_feats
    )
    assert feats["LowRes"].shape == (1, 4, 4, 384)
    assert feats["HighRes"].shape == (1, 56, 56, 384)  # identity -> resized


def test_save_cfg_filters_frozen_modules():
    model = _tiny_model()
    image, points = _inputs()
    params = model.init(jax.random.PRNGKey(0), image, points)["params"]
    saved = filter_state_dict(
        params, dict(embed_coords=True, backbone=False, upsampler=False, head=True)
    )
    assert "backbone" not in saved
    assert "head" in saved and "embed_coords" in saved

    # exclude-list form
    saved2 = filter_state_dict(
        params, {"backbone": False, "head": {"save": True, "exclude": ["convs_1"]}}
    )
    assert "convs_1" not in saved2.get("head", {})
    assert "classifier" in saved2["head"]
