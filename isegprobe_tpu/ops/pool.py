"""Adaptive pooling with exact torch semantics, as masked matrix reductions.

torch's ``adaptive_{max,avg}_pool2d`` windows span indices
[floor(i*in/out), ceil((i+1)*in/out)); the reference relies on both
(core/model/upsamplers/LiFT.py:112, FeatUp's JBUStack guidance pyramid).
Like ops.resize, the (static-shape) window structure is encoded in small
matrices that constant-fold under jit.
"""

from __future__ import annotations

import functools

import jax.numpy as jnp
import numpy as np


@functools.lru_cache(maxsize=128)
def _window_matrix(in_size: int, out_size: int) -> np.ndarray:
    """Boolean [out, in] membership matrix of adaptive pooling windows."""
    m = np.zeros((out_size, in_size), dtype=bool)
    for i in range(out_size):
        start = (i * in_size) // out_size
        end = -(-(i + 1) * in_size // out_size)  # ceil
        m[i, start:end] = True
    return m


def _pool_axis(x: jnp.ndarray, out_size: int, axis: int, mode: str) -> jnp.ndarray:
    in_size = x.shape[axis]
    if in_size == out_size:
        return x
    w = _window_matrix(in_size, out_size)
    x = jnp.moveaxis(x, axis, -1)  # [..., in]
    mask = jnp.asarray(w)  # [out, in]
    if mode == "max":
        big = jnp.asarray(-jnp.inf, dtype=x.dtype)
        vals = jnp.where(mask, x[..., None, :], big)  # [..., out, in]
        out = jnp.max(vals, axis=-1)
    elif mode == "avg":
        weights = jnp.asarray(w / w.sum(axis=1, keepdims=True), dtype=jnp.float32)
        out = jnp.einsum("oi,...i->...o", weights, x.astype(jnp.float32)).astype(
            x.dtype
        )
    else:
        raise ValueError(mode)
    return jnp.moveaxis(out, -1, axis)


def adaptive_pool(x: jnp.ndarray, out_hw: tuple[int, int], mode: str) -> jnp.ndarray:
    """Adaptive max/avg pool of the spatial dims of an [..., H, W, C] array."""
    x = _pool_axis(x, out_hw[0], -3, mode)
    return _pool_axis(x, out_hw[1], -2, mode)
