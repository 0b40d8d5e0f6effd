"""Click encoding: per-click disk / normalized-distance maps, fully on device.

Reproduces the math of the reference's ``DistMaps`` op (reference:
core/model/ops.py:20-77): for each of the two click groups (positive = first N
rows of the points tensor, negative = last N), compute the minimum squared
distance from every pixel to any valid click in the group, then either
threshold into a binary disk of radius ``norm_radius`` (``use_disks=True``, the
mode used by all experiments) or soft-encode as ``tanh(2*sqrt(d2)/R)``.

Points tensor convention (shared with the reference,
core/inference/predictors/base_predictor.py:194-225): ``[B, 2N, 3]`` float rows
of ``(y, x, click_index)`` with ``(-1, -1, -1)`` padding — a point is invalid
iff ``max(y, x) < 0``. The fixed-size padded layout is exactly the static-shape
discipline jit needs, so the whole encoding lives inside the compiled step.

TPU notes: the O(N*H*W) distance computation is pure VPU work; we scan over the
click dimension with an ``[B, 2, H, W]`` running minimum so peak memory stays
O(B*H*W) regardless of N, and XLA fuses the grid/broadcast arithmetic.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

__all__ = ["encode_clicks"]

_INVALID_D2 = 1.0e6


def encode_clicks(
    points: jnp.ndarray,
    height: int,
    width: int,
    norm_radius: float = 5.0,
    spatial_scale: float = 1.0,
    use_disks: bool = True,
    dtype: jnp.dtype = jnp.float32,
) -> jnp.ndarray:
    """Encode padded clicks into 2-channel maps.

    Args:
        points: ``[B, 2N, 3]`` array of (y, x, index); first N positive clicks,
            last N negative; invalid rows padded with negatives.
        height, width: output spatial size (static).
        norm_radius: disk radius (pixels) or distance normalizer.
        spatial_scale: multiplied into click coordinates before the distance
            computation (reference: core/model/ops.py:55).
        use_disks: binary disks if True, else tanh-encoded distances.

    Returns:
        ``[B, height, width, 2]`` float map, channel 0 = positive clicks,
        channel 1 = negative clicks.
    """
    b, p, _ = points.shape
    n = p // 2
    pts = points.astype(jnp.float32).reshape(b, 2, n, 3)

    ys = pts[..., 0] * spatial_scale  # [B, 2, N]
    xs = pts[..., 1] * spatial_scale
    invalid = jnp.maximum(pts[..., 0], pts[..., 1]) < 0  # [B, 2, N]

    denom = 1.0 if use_disks else norm_radius * spatial_scale
    rows = jnp.arange(height, dtype=jnp.float32)[:, None]  # [H, 1]
    cols = jnp.arange(width, dtype=jnp.float32)[None, :]  # [1, W]

    def step(carry, inputs):
        y, x, inv = inputs  # each [B, 2]
        dy = (rows[None, None] - y[..., None, None]) / denom  # [B, 2, H, W]
        dx = (cols[None, None] - x[..., None, None]) / denom
        d2 = dy * dy + dx * dx
        d2 = jnp.where(inv[..., None, None], _INVALID_D2, d2)
        return jnp.minimum(carry, d2), None

    init = jnp.full((b, 2, height, width), _INVALID_D2, dtype=jnp.float32)
    scan_inputs = (
        jnp.moveaxis(ys, -1, 0),  # [N, B, 2]
        jnp.moveaxis(xs, -1, 0),
        jnp.moveaxis(invalid, -1, 0),
    )
    # full unroll: N fused min-updates in ONE kernel. A rolled scan writes the
    # [B, 2, H, W] carry to HBM every step (~77 MB/step at batched-eval
    # scale); unrolled, XLA keeps the running minimum in registers and the
    # whole encoding costs one output write.
    d2, _ = jax.lax.scan(step, init, scan_inputs, unroll=n)

    if use_disks:
        out = (d2 <= (norm_radius * spatial_scale) ** 2).astype(dtype)
    else:
        out = jnp.tanh(2.0 * jnp.sqrt(d2)).astype(dtype)

    return jnp.moveaxis(out, 1, -1)  # [B, H, W, 2]
