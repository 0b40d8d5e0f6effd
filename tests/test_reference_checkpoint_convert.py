"""Reference-checkpoint conversion: torch head/embed weights -> our params,
numerically verified through the head forward."""

import jax.numpy as jnp
import numpy as np
import pytest
import torch
import torch.nn as tnn

from isegprobe_tpu.models.convert import convert_reference_checkpoint
from isegprobe_tpu.models.heads import ConvSegHead
from isegprobe_tpu.models.vit import PatchEmbed


def _fake_reference_checkpoint():
    """A torch state dict shaped like the reference's trained modules
    (embed_coords PatchEmbed + mmcv-style ConvSegHead)."""
    g = torch.Generator().manual_seed(0)
    sd = {
        "embed_coords.proj.weight": torch.randn(384, 3, 14, 14, generator=g) * 0.02,
        "embed_coords.proj.bias": torch.randn(384, generator=g) * 0.02,
        "head.convs.0.conv.weight": torch.randn(384, 384, 3, 3, generator=g) * 0.02,
        "head.convs.0.conv.bias": torch.randn(384, generator=g) * 0.02,
        "head.convs.1.conv.weight": torch.randn(384, 384, 3, 3, generator=g) * 0.02,
        "head.convs.1.conv.bias": torch.randn(384, generator=g) * 0.02,
        "head.classifier.weight": torch.randn(1, 384, 1, 1, generator=g) * 0.02,
        "head.classifier.bias": torch.randn(1, generator=g) * 0.02,
    }
    config = {
        "class": "core.model.iseg_probe_model.iSegProbeModel",
        "params": {
            "backbone_cfg": {"type": "dinov2",
                             "params": {"feats_injection_mode": "before_backbone"}},
            "head_cfg": {"type": "convhead",
                         "params": {"in_channels": 384, "num_layers": 2,
                                    "num_classes": 1}},
            "embed_coords_cfg": {"type": "patchEmbed",
                                 "params": {"img_size": (224, 224),
                                            "patch_size": (14, 14),
                                            "embed_dim": 384}},
            "upsampler_cfg": {"type": "identity", "params": {}},
            "architecture": "backbone_upsampler_head",
            "use_disks": True,
            "norm_radius": 5,
            "with_prev_mask": True,
        },
    }
    return {"state_dict": sd, "config": config}


def test_convert_reference_checkpoint_head_forward_parity():
    ckpt = _fake_reference_checkpoint()
    out = convert_reference_checkpoint(ckpt)
    assert out["config"]["class"].endswith("iSegProbeModel")
    assert out["config"]["params"]["backbone_cfg"]["type"] == "dinov2"

    rng = np.random.default_rng(0)
    feats = rng.standard_normal((1, 8, 8, 384), dtype=np.float32)

    # torch head forward (conv3x3+relu x2 + 1x1 classifier)
    sd = ckpt["state_dict"]
    t = torch.from_numpy(np.moveaxis(feats, -1, 1).copy())
    with torch.no_grad():
        x = torch.relu(tnn.functional.conv2d(
            t, sd["head.convs.0.conv.weight"], sd["head.convs.0.conv.bias"],
            padding=1))
        x = torch.relu(tnn.functional.conv2d(
            x, sd["head.convs.1.conv.weight"], sd["head.convs.1.conv.bias"],
            padding=1))
        want = tnn.functional.conv2d(
            x, sd["head.classifier.weight"], sd["head.classifier.bias"]
        ).numpy()

    head = ConvSegHead(in_channels=384, num_layers=2, num_classes=1)
    got = np.asarray(
        head.apply({"params": out["params"]["head"]}, jnp.asarray(feats))
    )
    np.testing.assert_allclose(np.moveaxis(got, -1, 1), want, rtol=1e-4,
                               atol=1e-5)

    # embed-coords patch embed parity
    clicks = rng.standard_normal((1, 28, 28, 3), dtype=np.float32)
    pe = PatchEmbed(patch_size=14, embed_dim=384)
    got_tokens = np.asarray(
        pe.apply({"params": out["params"]["embed_coords"]}, jnp.asarray(clicks))
    )
    with torch.no_grad():
        want_tokens = tnn.functional.conv2d(
            torch.from_numpy(np.moveaxis(clicks, -1, 1).copy()),
            sd["embed_coords.proj.weight"], sd["embed_coords.proj.bias"],
            stride=14,
        )
        want_tokens = want_tokens.flatten(2).transpose(1, 2).numpy()
    np.testing.assert_allclose(got_tokens, want_tokens, rtol=1e-4, atol=1e-5)
