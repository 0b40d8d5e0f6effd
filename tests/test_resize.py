"""Resize parity vs torch.nn.functional.interpolate (the reference's primitive)."""

import jax.numpy as jnp
import numpy as np
import pytest
import torch
import torch.nn.functional as F

from isegprobe_tpu.ops import resize


def _torch_resize(x_nhwc, size, mode, align_corners, scales=None):
    t = torch.from_numpy(np.moveaxis(x_nhwc, -1, 1).copy())
    kwargs = {}
    if mode != "nearest":
        kwargs["align_corners"] = align_corners
    if scales is not None:
        out = F.interpolate(t, scale_factor=scales, mode=mode,
                            recompute_scale_factor=False, **kwargs)
    else:
        out = F.interpolate(t, size=size, mode=mode, **kwargs)
    return np.moveaxis(out.numpy(), 1, -1)


CASES = [
    ("bilinear", True, (7, 11), (23, 17)),
    ("bilinear", True, (32, 32), (448, 448)),   # the eval upsample path
    ("bilinear", False, (7, 11), (23, 17)),
    ("bilinear", False, (20, 30), (9, 13)),     # downsample
    ("bilinear", True, (20, 30), (9, 13)),
    ("bicubic", False, (7, 11), (23, 17)),
    ("bicubic", True, (7, 11), (23, 17)),
    ("bicubic", False, (16, 16), (31, 31)),
    ("nearest", False, (7, 11), (23, 17)),
    ("nearest", False, (20, 30), (9, 13)),
]


@pytest.mark.parametrize("mode,align_corners,in_hw,out_hw", CASES)
def test_resize_matches_torch(mode, align_corners, in_hw, out_hw):
    rng = np.random.default_rng(0)
    x = rng.standard_normal((2, *in_hw, 3), dtype=np.float32)
    got = np.asarray(resize(jnp.asarray(x), out_hw, mode, align_corners))
    want = _torch_resize(x, out_hw, mode, align_corners)
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=5e-5)


def test_resize_scale_factor_semantics():
    """Bicubic with explicit scale_factor — the DINOv2 pos-embed '+0.1' path
    (reference: core/model/featurizers/DINOv2.py:213-222)."""
    rng = np.random.default_rng(1)
    n = 16
    w0, h0 = 28 + 0.1, 20 + 0.1
    x = rng.standard_normal((1, n, n, 8), dtype=np.float32)
    scales = (w0 / n, h0 / n)
    out_hw = (int(n * scales[0]), int(n * scales[1]))
    got = np.asarray(
        resize(jnp.asarray(x), out_hw, "bicubic", align_corners=False, scales=scales)
    )
    want = _torch_resize(x, None, "bicubic", False, scales=scales)
    assert got.shape == want.shape == (1, 28, 20, 8)
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-4)


def test_identity_passthrough():
    x = jnp.ones((1, 8, 8, 2))
    assert resize(x, (8, 8), "bilinear", True) is x
