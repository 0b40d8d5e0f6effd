"""Non-learnable upsamplers (reference: core/model/upsamplers/basic_upsamplers.py).

Interface shared by every upsampler: ``__call__(source, guidance)`` where
``source`` is a low-res feature map [B, h, w, C] and ``guidance`` the input
image [B, H, W, 3]; the result is resized toward the guidance resolution
(reference: core/model/upsamplers/__init__.py:6-11).
"""

from __future__ import annotations

from typing import Any

import flax.linen as nn
import jax.numpy as jnp

from isegprobe_tpu.ops.resize import resize


class IdentityUpsampler(nn.Module):
    def __call__(self, source: jnp.ndarray, guidance: jnp.ndarray) -> jnp.ndarray:
        return source


class NearestUpsampler(nn.Module):
    def __call__(self, source: jnp.ndarray, guidance: jnp.ndarray) -> jnp.ndarray:
        h, w = guidance.shape[1], guidance.shape[2]
        return resize(source, (h, w), "nearest")


class BilinearUpsampler(nn.Module):
    def __call__(self, source: jnp.ndarray, guidance: jnp.ndarray) -> jnp.ndarray:
        h, w = guidance.shape[1], guidance.shape[2]
        return resize(source, (h, w), "bilinear", align_corners=True)


class BicubicUpsampler(nn.Module):
    def __call__(self, source: jnp.ndarray, guidance: jnp.ndarray) -> jnp.ndarray:
        h, w = guidance.shape[1], guidance.shape[2]
        return resize(source, (h, w), "bicubic", align_corners=False)
