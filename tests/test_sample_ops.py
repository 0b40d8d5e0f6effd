"""Dynamic crop-resize / inverse-paste parity with the reference's torch ops."""

import jax.numpy as jnp
import numpy as np
import torch
import torch.nn.functional as F

from isegprobe_tpu.ops.sample import crop_resize, inverse_paste


def _torch_crop_resize(img_nhwc, roi, out_hw):
    rmin, rmax, cmin, cmax = roi
    t = torch.from_numpy(np.moveaxis(img_nhwc, -1, 1).copy())
    crop = t[:, :, rmin : rmax + 1, cmin : cmax + 1]
    out = F.interpolate(crop, size=out_hw, mode="bilinear", align_corners=True)
    return np.moveaxis(out.numpy(), 1, -1)


def _torch_inverse_paste(probs_nhwc, roi, full_hw):
    rmin, rmax, cmin, cmax = roi
    t = torch.from_numpy(np.moveaxis(probs_nhwc, -1, 1).copy())
    resized = F.interpolate(t, size=(rmax - rmin + 1, cmax - cmin + 1),
                            mode="bilinear", align_corners=True)
    full = torch.zeros(t.shape[0], t.shape[1], *full_hw)
    full[:, :, rmin : rmax + 1, cmin : cmax + 1] = resized
    return np.moveaxis(full.numpy(), 1, -1)


def test_crop_resize_matches_torch():
    rng = np.random.default_rng(0)
    img = rng.standard_normal((1, 60, 75, 3), dtype=np.float32)
    for roi in [(5, 40, 10, 70), (0, 59, 0, 74), (20, 22, 30, 33)]:
        got = np.asarray(
            crop_resize(jnp.asarray(img), jnp.asarray(roi, dtype=jnp.int32), (28, 28))
        )
        want = _torch_crop_resize(img, roi, (28, 28))
        np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-5)


def test_inverse_paste_matches_torch():
    rng = np.random.default_rng(1)
    probs = rng.random((1, 28, 28, 1), dtype=np.float32)
    full = np.zeros((1, 60, 75, 1), dtype=np.float32)
    for roi in [(5, 40, 10, 70), (0, 59, 0, 74), (20, 47, 30, 58)]:
        got = np.asarray(
            inverse_paste(jnp.asarray(probs), jnp.asarray(roi, dtype=jnp.int32),
                          jnp.asarray(full))
        )
        want = _torch_inverse_paste(probs, roi, (60, 75))
        np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-5)


def test_roundtrip_identity_roi():
    """Full-image ROI: crop+resize to the same size then paste is identity."""
    rng = np.random.default_rng(2)
    img = rng.random((1, 32, 32, 1), dtype=np.float32)
    roi = jnp.asarray((0, 31, 0, 31), dtype=jnp.int32)
    crop = crop_resize(jnp.asarray(img), roi, (32, 32))
    np.testing.assert_allclose(np.asarray(crop), img, atol=1e-6)
    pasted = inverse_paste(crop, roi, jnp.asarray(img))
    np.testing.assert_allclose(np.asarray(pasted), img, atol=1e-6)
