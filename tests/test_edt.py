"""EDT parity: native C++ vs OpenCV vs device JAX, plus clicker decision rule."""

import cv2
import jax.numpy as jnp
import numpy as np
import pytest

from isegprobe_tpu.ops.edt import (
    click_dist_maps_host,
    edt_l2sq,
    edt_l2sq_device,
    next_click_from_error,
)
from isegprobe_tpu.ops.native_lib import get_native_lib


def _random_mask(rng, h, w, p=0.6):
    return (rng.random((h, w)) < p).astype(np.uint8)


def test_native_lib_builds():
    assert get_native_lib() is not None, "native C++ kernel failed to build"


@pytest.mark.parametrize("shape", [(20, 31), (64, 64), (97, 45)])
def test_host_edt_matches_cv2(shape):
    rng = np.random.default_rng(7)
    for _ in range(5):
        m = _random_mask(rng, *shape)
        want = cv2.distanceTransform(m, cv2.DIST_L2, 0) ** 2
        got = edt_l2sq(m)
        np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-3)


def test_host_edt_no_zeros():
    m = np.ones((8, 8), dtype=np.uint8)
    got = edt_l2sq(m)
    assert (got > 1e10).all()


@pytest.mark.parametrize("shape", [(20, 31), (64, 64), (33, 129)])
def test_device_edt_matches_host(shape):
    rng = np.random.default_rng(3)
    for _ in range(3):
        m = _random_mask(rng, *shape)
        want = edt_l2sq(m)
        got = np.asarray(edt_l2sq_device(jnp.asarray(m)))
        np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-5)


def test_device_edt_batched_and_padded():
    rng = np.random.default_rng(5)
    masks = np.stack([_random_mask(rng, 32, 32) for _ in range(4)])
    got = np.asarray(edt_l2sq_device(jnp.asarray(masks), pad_border=True))
    for i in range(4):
        padded = np.pad(masks[i], 1)
        want = edt_l2sq(padded)[1:-1, 1:-1]
        np.testing.assert_allclose(got[i], want, rtol=1e-5, atol=1e-5)


def _reference_next_click(gt, pred, not_clicked):
    """Transcription of the reference clicker (core/inference/clicker.py:58-91)."""
    fn = np.logical_and(gt, ~pred)
    fp = np.logical_and(~gt, pred)
    fn = np.pad(fn, 1).astype(np.uint8)
    fp = np.pad(fp, 1).astype(np.uint8)
    fn_dt = cv2.distanceTransform(fn, cv2.DIST_L2, 0)[1:-1, 1:-1] * not_clicked
    fp_dt = cv2.distanceTransform(fp, cv2.DIST_L2, 0)[1:-1, 1:-1] * not_clicked
    is_pos = fn_dt.max() > fp_dt.max()
    dt = fn_dt if is_pos else fp_dt
    ys, xs = np.where(dt == dt.max())
    return is_pos, ys[0], xs[0]


def test_next_click_decision_parity_with_cv2():
    rng = np.random.default_rng(11)
    agree = 0
    total = 20
    for _ in range(total):
        h, w = 48, 57
        gt = np.zeros((h, w), bool)
        r0, c0 = rng.integers(5, 25, 2)
        gt[r0 : r0 + rng.integers(8, 20), c0 : c0 + rng.integers(8, 20)] = True
        pred = np.zeros_like(gt)
        r1, c1 = rng.integers(5, 25, 2)
        pred[r1 : r1 + rng.integers(8, 20), c1 : c1 + rng.integers(8, 20)] = True
        not_clicked = np.ones((h, w), bool)
        want = _reference_next_click(gt, pred, not_clicked)
        got = next_click_from_error(
            jnp.asarray(gt), jnp.asarray(pred), jnp.asarray(not_clicked)
        )
        got = (bool(got[0]), int(got[1]), int(got[2]))
        if got == (bool(want[0]), int(want[1]), int(want[2])):
            agree += 1
    assert agree == total, f"only {agree}/{total} clicks agree with the cv2 path"


def test_click_dist_maps_host():
    pts = np.array([[5.0, 7.0, 0.0], [-1, -1, -1], [10.0, 3.0, 1.0], [-1, -1, -1]],
                   dtype=np.float32)
    out = click_dist_maps_host(pts, 16, 16, 1.0)
    assert out.shape == (2, 16, 16)
    assert out[0, 5, 7] == 0.0
    assert out[1, 10, 3] == 0.0
    assert out[0, 5, 8] == 1.0
    assert out[1, 10, 5] == 4.0
