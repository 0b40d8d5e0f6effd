"""Dynamic-ROI crop-resize and inverse paste, jit-compatible.

The reference's ZoomIn transform crops the image to a per-click object ROI,
resizes to a fixed target (448×448 in all experiments), and inversely pastes
the predicted probability map back into the full frame (reference:
core/inference/transforms/zoom_in.py:95-130, 216-240). The crop bounds change
every click — a dynamic shape. We keep shapes static by expressing both
directions as bilinear *sampling* at dynamically-computed fractional
coordinates (gathers with static output shapes), so the whole per-click
pipeline stays inside one compiled XLA program.

Numerics match torch's align_corners=True interpolation exactly:
crop-resize out[i] samples at rmin + i·(rh−1)/(oh−1); inverse paste at
full-frame row y samples the prob map at (y−rmin)·(oh−1)/(rh−1), zero outside
the ROI.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp


def _sample_axis(x: jnp.ndarray, coords: jnp.ndarray, axis: int,
                 lo, hi) -> jnp.ndarray:
    """Linearly interpolate x along `axis` at fractional `coords`, clamping
    the two taps to [lo, hi] (the valid crop range).

    Expressed as multiplication by a dynamically-built 2-tap interpolation
    matrix: gathers along the lane-tiled axis are slow on TPU, while a
    [out, in] matmul rides the MXU; with exactly two weighted taps per row
    the result is bit-identical to the gather-lerp form."""
    c0 = jnp.clip(jnp.floor(coords), lo, hi)
    c1 = jnp.clip(c0 + 1, lo, hi)
    w = jnp.clip(coords - c0, 0.0, 1.0)

    n = x.shape[axis]
    src = jnp.arange(n, dtype=jnp.float32)[None, :]
    interp = (1.0 - w)[:, None] * (src == c0[:, None]) + w[:, None] * (
        src == c1[:, None]
    )  # [out, n] with <=2 nonzeros per row
    out = jnp.tensordot(interp, x, axes=([1], [axis]))
    return jnp.moveaxis(out, 0, axis)


@functools.partial(jax.jit, static_argnames=("out_hw",))
def crop_resize(img: jnp.ndarray, roi: jnp.ndarray, out_hw: tuple[int, int]):
    """Crop img [B, H, W, C] to the inclusive ROI (rmin, rmax, cmin, cmax)
    (int32 [4]) and resize to out_hw with align_corners=True bilinear."""
    oh, ow = out_hw
    rmin, rmax, cmin, cmax = [roi[i].astype(jnp.float32) for i in range(4)]
    ys = rmin + jnp.arange(oh, dtype=jnp.float32) * jnp.where(
        oh > 1, (rmax - rmin) / (oh - 1), 0.0
    )
    xs = cmin + jnp.arange(ow, dtype=jnp.float32) * jnp.where(
        ow > 1, (cmax - cmin) / (ow - 1), 0.0
    )
    x = img.astype(jnp.float32)
    x = _sample_axis(x, ys, 1, rmin, rmax)
    x = _sample_axis(x, xs, 2, cmin, cmax)
    return x


@jax.jit
def inverse_paste(probs: jnp.ndarray, roi: jnp.ndarray, out: jnp.ndarray):
    """Resize probs [B, oh, ow, C] to the ROI size and paste into a zeroed
    full-frame buffer shaped like `out` [B, H, W, C]."""
    b, oh, ow, c = probs.shape
    h, w = out.shape[1], out.shape[2]
    rmin, rmax, cmin, cmax = [roi[i].astype(jnp.float32) for i in range(4)]
    rh = rmax - rmin + 1.0
    rw = cmax - cmin + 1.0

    y = jnp.arange(h, dtype=jnp.float32)
    x = jnp.arange(w, dtype=jnp.float32)
    sy = jnp.where(rh > 1, (y - rmin) * (oh - 1) / jnp.maximum(rh - 1, 1.0), 0.0)
    sx = jnp.where(rw > 1, (x - cmin) * (ow - 1) / jnp.maximum(rw - 1, 1.0), 0.0)

    p = probs.astype(jnp.float32)
    p = _sample_axis(p, sy, 1, 0.0, oh - 1)
    p = _sample_axis(p, sx, 2, 0.0, ow - 1)

    valid = (
        (y[:, None] >= rmin) & (y[:, None] <= rmax)
        & (x[None, :] >= cmin) & (x[None, :] <= cmax)
    )
    return jnp.where(valid[None, :, :, None], p, 0.0).astype(out.dtype)


def crop_resize_dyn(img: jnp.ndarray, roi: jnp.ndarray, out_hw,
                    canvas_hw: tuple[int, int]) -> jnp.ndarray:
    """Crop ``img`` [B, H, W, C] to the inclusive ROI and resize to a
    TRACED (oh, ow) extent, laid out top-left on a static canvas
    [B, canvas_h, canvas_w, C] (zeros beyond the valid rect).

    The adaptive-ZoomIn analogue of :func:`crop_resize`
    (reference: zoom_in.py get_roi_image_nd — align_corners=True, output
    size round(h*s), data-dependent). When (oh, ow) equals the ROI size the
    sampling coordinates are exactly integral, so the no-transform case is
    a bit-exact copy."""
    ch, cw = canvas_hw
    oh = jnp.asarray(out_hw[0], jnp.float32)
    ow = jnp.asarray(out_hw[1], jnp.float32)
    rmin, rmax, cmin, cmax = [roi[i].astype(jnp.float32) for i in range(4)]
    ys = rmin + jnp.arange(ch, dtype=jnp.float32) * jnp.where(
        oh > 1, (rmax - rmin) / jnp.maximum(oh - 1, 1.0), 0.0)
    xs = cmin + jnp.arange(cw, dtype=jnp.float32) * jnp.where(
        ow > 1, (cmax - cmin) / jnp.maximum(ow - 1, 1.0), 0.0)
    x = img.astype(jnp.float32)
    x = _sample_axis(x, ys, 1, rmin, rmax)
    x = _sample_axis(x, xs, 2, cmin, cmax)
    valid = ((jnp.arange(ch, dtype=jnp.float32)[:, None] < oh)
             & (jnp.arange(cw, dtype=jnp.float32)[None, :] < ow))
    return x * valid[None, :, :, None]


def inverse_paste_dyn(probs: jnp.ndarray, src_hw, roi: jnp.ndarray,
                      out: jnp.ndarray) -> jnp.ndarray:
    """Resize the TRACED (sh, sw) valid rect of ``probs`` [B, Hc, Wc, C] to
    the ROI size and paste into a zeroed buffer shaped like ``out``
    [B, H, W, C] — :func:`inverse_paste` with a dynamic source extent
    (the adaptive ZoomIn's crop output size is data-dependent)."""
    h, w = out.shape[1], out.shape[2]
    sh = jnp.asarray(src_hw[0], jnp.float32)
    sw = jnp.asarray(src_hw[1], jnp.float32)
    rmin, rmax, cmin, cmax = [roi[i].astype(jnp.float32) for i in range(4)]
    rh = rmax - rmin + 1.0
    rw = cmax - cmin + 1.0

    y = jnp.arange(h, dtype=jnp.float32)
    x = jnp.arange(w, dtype=jnp.float32)
    sy = jnp.where(rh > 1, (y - rmin) * (sh - 1) / jnp.maximum(rh - 1, 1.0),
                   0.0)
    sx = jnp.where(rw > 1, (x - cmin) * (sw - 1) / jnp.maximum(rw - 1, 1.0),
                   0.0)

    p = probs.astype(jnp.float32)
    p = _sample_axis(p, sy, 1, 0.0, sh - 1)
    p = _sample_axis(p, sx, 2, 0.0, sw - 1)

    valid = (
        (y[:, None] >= rmin) & (y[:, None] <= rmax)
        & (x[None, :] >= cmin) & (x[None, :] <= cmax)
    )
    return jnp.where(valid[None, :, :, None], p, 0.0).astype(out.dtype)
