"""Click-encoding parity vs a naive numpy oracle of the reference DistMaps math."""

import jax.numpy as jnp
import numpy as np
import pytest

from isegprobe_tpu.ops import encode_clicks


def _oracle(points, h, w, norm_radius, spatial_scale, use_disks):
    """Direct numpy transcription of the reference math (core/model/ops.py:20-77)."""
    b, p, _ = points.shape
    n = p // 2
    out = np.zeros((b, h, w, 2), dtype=np.float32)
    rr, cc = np.meshgrid(np.arange(h), np.arange(w), indexing="ij")
    denom = 1.0 if use_disks else norm_radius * spatial_scale
    for bi in range(b):
        for gi in range(2):
            d2 = np.full((h, w), 1e6, dtype=np.float64)
            for ni in range(n):
                y, x, _ = points[bi, gi * n + ni]
                if max(y, x) < 0:
                    continue
                dy = (rr - y * spatial_scale) / denom
                dx = (cc - x * spatial_scale) / denom
                d2 = np.minimum(d2, dy * dy + dx * dx)
            if use_disks:
                out[bi, :, :, gi] = (d2 <= (norm_radius * spatial_scale) ** 2).astype(
                    np.float32
                )
            else:
                out[bi, :, :, gi] = np.tanh(2.0 * np.sqrt(d2))
    return out


@pytest.mark.parametrize("use_disks", [True, False])
@pytest.mark.parametrize("spatial_scale", [1.0, 0.5])
def test_encode_clicks_matches_oracle(use_disks, spatial_scale):
    rng = np.random.default_rng(42)
    b, n, h, w = 2, 5, 33, 41
    points = np.full((b, 2 * n, 3), -1.0, dtype=np.float32)
    for bi in range(b):
        for k in range(rng.integers(1, n + 1)):
            points[bi, k] = [rng.integers(0, h), rng.integers(0, w), k]
        for k in range(rng.integers(0, n + 1)):
            points[bi, n + k] = [rng.integers(0, h), rng.integers(0, w), n + k]

    got = np.asarray(
        encode_clicks(jnp.asarray(points), h, w, 5.0, spatial_scale, use_disks)
    )
    want = _oracle(points, h, w, 5.0, spatial_scale, use_disks)
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-4)


def test_all_invalid_points_give_empty_disks():
    points = np.full((1, 8, 3), -1.0, dtype=np.float32)
    got = np.asarray(encode_clicks(jnp.asarray(points), 16, 16, 5.0))
    assert got.sum() == 0.0


def test_single_click_disk_geometry():
    points = np.full((1, 2, 3), -1.0, dtype=np.float32)
    points[0, 0] = [8.0, 8.0, 0.0]
    got = np.asarray(encode_clicks(jnp.asarray(points), 17, 17, norm_radius=2.0))
    # center pixel and 4-neighbors inside radius-2 disk; corners outside
    assert got[0, 8, 8, 0] == 1.0
    assert got[0, 8, 10, 0] == 1.0
    assert got[0, 11, 8, 0] == 0.0
    assert got[0, :, :, 1].sum() == 0.0
