"""Image resizing with exact PyTorch coordinate semantics, built for the MXU.

The reference relies pervasively on ``torch.nn.functional.interpolate`` with
``mode='bilinear', align_corners=True`` (reference: core/model/iseg_base_model.py:75-80,
core/inference/transforms/zoom_in.py:113-118) as well as bicubic with implicit
scale factors for positional-embedding interpolation (reference:
core/model/featurizers/DINOv2.py:213-222). NoC parity is brittle to these
conventions, so we reproduce them exactly.

TPU-first design: instead of gather-based interpolation (bad for XLA tiling),
a separable resize is expressed as two small dense matmuls:

    out = W_rows @ img @ W_cols^T

where ``W_rows: [H_out, H_in]`` and ``W_cols: [W_out, W_in]`` are interpolation
matrices with 2 (bilinear) or 4 (bicubic) non-zeros per row. Shapes are static
under jit, the matrices constant-fold, and the contraction maps onto the MXU.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

__all__ = ["resize", "resize_matrix"]

_CUBIC_A = -0.75  # PyTorch / OpenCV cubic convolution constant


def _source_coords(
    in_size: int, out_size: int, align_corners: bool, scale: float | None
) -> np.ndarray:
    """Map output pixel indices to (fractional) input coordinates, torch-style."""
    i = np.arange(out_size, dtype=np.float64)
    if align_corners:
        if out_size == 1:
            return np.zeros(out_size, dtype=np.float64)
        return i * (in_size - 1) / (out_size - 1)
    s = scale if scale is not None else out_size / in_size
    return (i + 0.5) / s - 0.5


def _cubic_weights(t: np.ndarray) -> np.ndarray:
    """Cubic convolution weights for taps at offsets [-1, 0, 1, 2] from floor(src)."""
    a = _CUBIC_A
    # distances of the 4 taps from the sample point
    d = np.stack([t + 1.0, t, 1.0 - t, 2.0 - t], axis=-1)
    ad = np.abs(d)
    near = (a + 2.0) * ad**3 - (a + 3.0) * ad**2 + 1.0
    far = a * ad**3 - 5.0 * a * ad**2 + 8.0 * a * ad - 4.0 * a
    return np.where(ad <= 1.0, near, far)


@functools.lru_cache(maxsize=256)
def _resize_matrix_cached(
    in_size: int,
    out_size: int,
    mode: str,
    align_corners: bool,
    scale: float | None,
) -> np.ndarray:
    m = np.zeros((out_size, in_size), dtype=np.float64)
    rows = np.arange(out_size)

    if mode == "nearest":
        # torch legacy 'nearest': src = floorf(i * scale) computed in FLOAT32
        # (ATen nearest_neighbor_compute_source_index) — float64 arithmetic
        # diverges on exact-boundary rows (e.g. in=2,out=98 maps row 49 to 0
        # instead of torch's 1), so emulate the f32 rounding bit-for-bit
        scale32 = np.float32(in_size) / np.float32(out_size)
        idx = np.minimum(
            np.floor(rows.astype(np.float32) * scale32).astype(np.int64),
            in_size - 1)
        m[rows, idx] = 1.0
        return m.astype(np.float32)

    src = _source_coords(in_size, out_size, align_corners, scale)

    if mode in ("bilinear", "linear"):
        if not align_corners:
            src = np.maximum(src, 0.0)  # torch clamps negative source coords
        i0 = np.clip(np.floor(src).astype(np.int64), 0, in_size - 1)
        i1 = np.minimum(i0 + 1, in_size - 1)
        w1 = np.clip(src - i0, 0.0, 1.0)
        np.add.at(m, (rows, i0), 1.0 - w1)
        np.add.at(m, (rows, i1), w1)
        return m.astype(np.float32)

    if mode == "bicubic":
        f = np.floor(src)
        t = src - f
        w = _cubic_weights(t)  # [out, 4]
        for k in range(4):
            idx = np.clip(f.astype(np.int64) + (k - 1), 0, in_size - 1)
            np.add.at(m, (rows, idx), w[:, k])
        return m.astype(np.float32)

    raise ValueError(f"Unknown resize mode: {mode}")


def resize_matrix(
    in_size: int,
    out_size: int,
    mode: str = "bilinear",
    align_corners: bool = False,
    scale: float | None = None,
) -> np.ndarray:
    """Return the [out_size, in_size] 1-D interpolation matrix (numpy, float32).

    ``scale``: explicit scale factor (torch's ``scale_factor=`` semantics where the
    coordinate transform uses the given scale rather than out/in). Only meaningful
    with ``align_corners=False``.
    """
    return _resize_matrix_cached(in_size, out_size, mode, align_corners, scale)


def resize(
    x: jnp.ndarray,
    size: tuple[int, int],
    mode: str = "bilinear",
    align_corners: bool = False,
    scales: tuple[float, float] | None = None,
) -> jnp.ndarray:
    """Resize the spatial dims of an ``[..., H, W, C]`` array to ``size=(H', W')``.

    Matches ``torch.nn.functional.interpolate`` numerics for modes
    'nearest' | 'bilinear' | 'bicubic', including ``align_corners`` handling and
    explicit ``scale_factor`` coordinate transforms (via ``scales``).
    """
    h_in, w_in = x.shape[-3], x.shape[-2]
    h_out, w_out = size
    if (h_in, w_in) == (h_out, w_out) and mode != "bicubic":
        return x

    sh, sw = scales if scales is not None else (None, None)
    wr = jnp.asarray(resize_matrix(h_in, h_out, mode, align_corners, sh))
    wc = jnp.asarray(resize_matrix(w_in, w_out, mode, align_corners, sw))

    orig_dtype = x.dtype
    xf = x.astype(jnp.float32)
    # HIGHEST precision: the default TPU matmul truncates inputs to bf16, which
    # breaks bit-level parity with the reference's interpolation.
    hi = jax.lax.Precision.HIGHEST
    y = jnp.einsum("oh,...hwc->...owc", wr, xf, precision=hi)
    y = jnp.einsum("pw,...owc->...opc", wc, y, precision=hi)
    return y.astype(orig_dtype)
