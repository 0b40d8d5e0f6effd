"""Resizes whose OUTPUT (or input) extent is a traced value, not a shape.

The RITM adaptive ZoomIn (reference: core/inference/transforms/zoom_in.py:
196-253, ``get_roi_image_nd`` with a scalar ``target_size``) produces
data-dependent crop sizes: (round(h*s), round(w*s)) with s = T/max(h,w).
XLA needs static shapes, so the compiled adaptive evaluator computes on a
fixed canvas whose top-left (vh, vw) rect is valid (``vh``/``vw`` traced
scalars) — these helpers build the exact-torch-semantics interpolation for
that representation:

  * ``dyn_matrix`` — a [out_cap, in_cap] interpolation matrix for a traced
    output length (rows >= out_len are garbage, mask them), replicating
    ops/resize.py's torch coordinate conventions with traced sizes;
  * ``round_half_even_div`` — integer-exact round(p/q) with banker's
    rounding, matching the host's float64 ``round(h * (T / m))`` for every
    reachable (h, T, m) (p = h*T <= ~1.2e6 is f64-exact; true .5 ties are
    exactly representable, so the float and rational paths agree).

All weights are computed in f32 from integer-valued traced scalars; the
coordinate math matches ops/resize.py's float64 static path bit-for-bit for
the integer sizes used here (products stay < 2^24).
"""

from __future__ import annotations

import jax.numpy as jnp

_CUBIC_A = -0.75  # PyTorch / OpenCV cubic convolution constant


def round_half_even_div(p: jnp.ndarray, q: jnp.ndarray) -> jnp.ndarray:
    """round(p / q) with banker's rounding; p, q positive int32 scalars."""
    p = p.astype(jnp.int32)
    q = q.astype(jnp.int32)
    t = 2 * p
    n = (t + q) // (2 * q)  # half-up
    tie = (t % (2 * q)) == q
    return jnp.where(tie & (n % 2 == 1), n - 1, n)


def _cubic_weights(t: jnp.ndarray) -> jnp.ndarray:
    a = _CUBIC_A
    d = jnp.stack([t + 1.0, t, 1.0 - t, 2.0 - t], axis=-1)
    ad = jnp.abs(d)
    near = (a + 2.0) * ad**3 - (a + 3.0) * ad**2 + 1.0
    far = a * ad**3 - 5.0 * a * ad**2 + 8.0 * a * ad - 4.0 * a
    return jnp.where(ad <= 1.0, near, far)


def _scatter_taps(src, weights, in_cap, in_len, tap_offsets):
    """Dense [out_cap, in_cap] matrix from per-row source coords + tap
    weights, taps clamped to [0, in_len-1] (torch edge clamping)."""
    cols = jnp.arange(in_cap)
    f = jnp.floor(src).astype(jnp.int32)
    m = jnp.zeros((src.shape[0], in_cap), jnp.float32)
    for k, off in enumerate(tap_offsets):
        idx = jnp.clip(f + off, 0, in_len - 1)
        m = m + (cols[None, :] == idx[:, None]) * weights[..., k][:, None]
    return m


def dyn_matrix(
    in_cap: int,
    out_cap: int,
    in_len,
    out_len,
    mode: str = "bilinear",
    align_corners: bool = True,
    scale=None,
) -> jnp.ndarray:
    """[out_cap, in_cap] interpolation matrix for traced lengths.

    ``in_len`` / ``out_len``: traced int scalars (<= the static caps);
    ``scale``: optional traced scale factor (torch ``scale_factor``
    semantics, align_corners=False only). Rows >= out_len and columns >=
    in_len carry garbage/zero — callers mask the valid rect.
    """
    i = jnp.arange(out_cap, dtype=jnp.float32)
    in_len_f = jnp.asarray(in_len, jnp.float32)
    out_len_f = jnp.asarray(out_len, jnp.float32)

    if align_corners:
        src = i * jnp.where(out_len_f > 1,
                            (in_len_f - 1) / jnp.maximum(out_len_f - 1, 1), 0.0)
    else:
        s = (jnp.asarray(scale, jnp.float32) if scale is not None
             else out_len_f / in_len_f)
        src = (i + 0.5) / s - 0.5

    if mode in ("bilinear", "linear"):
        if not align_corners:
            src = jnp.maximum(src, 0.0)  # torch clamps negative coords
        i0 = jnp.clip(jnp.floor(src), 0, in_len_f - 1)
        w1 = jnp.clip(src - i0, 0.0, 1.0)
        weights = jnp.stack([1.0 - w1, w1], axis=-1)
        return _scatter_taps(i0, weights, in_cap, in_len, (0, 1))

    if mode == "bicubic":
        f = jnp.floor(src)
        t = src - f
        return _scatter_taps(src, _cubic_weights(t), in_cap, in_len,
                             (-1, 0, 1, 2))

    raise ValueError(f"Unknown resize mode: {mode}")


def dyn_resize_2d(
    x: jnp.ndarray,
    in_hw,
    out_hw,
    out_cap_hw: tuple[int, int],
    mode: str = "bilinear",
    align_corners: bool = True,
    scales=None,
) -> jnp.ndarray:
    """Separable dynamic resize of ``x [..., Hc, Wc, C]`` whose valid rect is
    ``in_hw`` (traced) -> output canvas [..., out_cap_h, out_cap_w, C] with
    valid rect ``out_hw`` (traced). Garbage outside the output valid rect."""
    hc, wc = x.shape[-3], x.shape[-2]
    oh_cap, ow_cap = out_cap_hw
    mr = dyn_matrix(hc, oh_cap, in_hw[0], out_hw[0], mode, align_corners,
                    None if scales is None else scales[0])
    mc = dyn_matrix(wc, ow_cap, in_hw[1], out_hw[1], mode, align_corners,
                    None if scales is None else scales[1])
    x = x.astype(jnp.float32)
    x = jnp.einsum("oh,...hwc->...owc", mr, x)
    return jnp.einsum("ow,...hwc->...hoc", mc, x)


def dyn_resize_2d_batched(
    x: jnp.ndarray,
    in_hw: jnp.ndarray,
    out_hw: jnp.ndarray,
    out_cap_hw: tuple[int, int],
    mode: str = "bilinear",
    align_corners: bool = True,
) -> jnp.ndarray:
    """Per-sample dynamic resize: x [B, Hc, Wc, C] with per-sample valid
    rects ``in_hw`` [B, 2] -> [B, out_cap_h, out_cap_w, C] with valid rects
    ``out_hw`` [B, 2]."""
    import jax

    def one(xi, ihw, ohw):
        return dyn_resize_2d(xi, (ihw[0], ihw[1]), (ohw[0], ohw[1]),
                             out_cap_hw, mode, align_corners)

    return jax.vmap(one)(x, jnp.asarray(in_hw), jnp.asarray(out_hw))
