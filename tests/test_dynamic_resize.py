"""Dynamic-extent resize vs the static torch-exact matrices (ops/resize.py).

The adaptive-ZoomIn compiled path computes on a fixed canvas with a traced
valid rect; its interpolation must agree with the static matrices (which are
themselves golden-tested against torch.nn.functional.interpolate) for every
(in_len, out_len) it can reach."""

import jax.numpy as jnp
import numpy as np
import pytest

from isegprobe_tpu.ops.dynamic_resize import (
    dyn_matrix,
    dyn_resize_2d,
    round_half_even_div,
)
from isegprobe_tpu.ops.resize import resize, resize_matrix


@pytest.mark.parametrize("mode,align", [("bilinear", True),
                                        ("bicubic", False)])
@pytest.mark.parametrize("in_len,out_len", [(37, 16), (37, 43), (12, 29),
                                            (29, 12), (5, 5), (1, 7)])
def test_dyn_matrix_matches_static(mode, align, in_len, out_len):
    scale = None
    if not align:
        # the DINOv2 pos-embed trick: explicit scale (gh + 0.1) / gh0
        scale = (out_len + 0.1) / in_len
    want = resize_matrix(in_len, out_len, mode, align, scale)
    got = np.asarray(dyn_matrix(
        in_len + 5, out_len + 7, jnp.asarray(in_len), jnp.asarray(out_len),
        mode, align, None if scale is None else jnp.asarray(scale)))
    np.testing.assert_allclose(got[:out_len, :in_len], want,
                               rtol=1e-5, atol=1e-5)
    # taps never reach beyond the valid input columns
    assert np.abs(got[:out_len, in_len:]).max() == 0.0


def test_round_half_even_div_matches_python_round():
    rng = np.random.default_rng(0)
    for _ in range(500):
        h = int(rng.integers(1, 1200))
        m = int(rng.integers(h, 1201))
        t = int(rng.integers(100, 700))
        want = int(round(h * (t / m)))  # the host/reference float64 path
        got = int(round_half_even_div(jnp.asarray(h * t), jnp.asarray(m)))
        assert got == want, (h, m, t, got, want)
    # exact .5 ties round to even in both
    assert int(round_half_even_div(jnp.asarray(5), jnp.asarray(2))) == 2
    assert int(round_half_even_div(jnp.asarray(7), jnp.asarray(2))) == 4


def test_dyn_resize_2d_matches_static_resize():
    rng = np.random.default_rng(3)
    x = rng.standard_normal((2, 21, 17, 3), dtype=np.float32)
    want = np.asarray(resize(jnp.asarray(x), (34, 9), "bilinear",
                             align_corners=True))
    canvas = np.zeros((2, 25, 20, 3), np.float32)
    canvas[:, :21, :17] = x
    got = np.asarray(dyn_resize_2d(
        jnp.asarray(canvas), (jnp.asarray(21), jnp.asarray(17)),
        (jnp.asarray(34), jnp.asarray(9)), (40, 15)))
    np.testing.assert_allclose(got[:, :34, :9], want, rtol=1e-4, atol=1e-5)
