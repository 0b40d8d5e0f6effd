"""SimpleViT (lucidrains-style) — the trainable click encoder used for late
injection (reference: core/model/featurizers/simple_ViT.py:96-155).

Differences from the frozen trunks: linear patchify (LN-Dense-LN), fixed 2-D
sincos position embedding, no cls token, attention with unbiased packed qkv and
an inner dimension decoupled from the model dim.
"""

from __future__ import annotations

from typing import Any

import flax.linen as nn
import jax
import jax.numpy as jnp

from isegprobe_tpu.ops.attention import mha
from isegprobe_tpu.models.vit import posemb_sincos_2d
from isegprobe_tpu.models.vit import mm_precision


def _pair(t):
    return tuple(t) if isinstance(t, (tuple, list)) else (t, t)


class _SimpleAttention(nn.Module):
    dim: int
    heads: int
    dim_head: int
    dtype: Any = jnp.float32
    attn_impl: str = "auto"

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        inner = self.heads * self.dim_head
        x = nn.LayerNorm(dtype=self.dtype, name="norm")(x)
        qkv = nn.Dense(inner * 3, use_bias=False, dtype=self.dtype,
                       precision=mm_precision(self.dtype), name="to_qkv")(x)
        b, n, _ = qkv.shape
        qkv = qkv.reshape(b, n, 3, self.heads, self.dim_head)
        out = mha(qkv[:, :, 0], qkv[:, :, 1], qkv[:, :, 2],
                  scale=self.dim_head**-0.5, impl=self.attn_impl)
        out = out.reshape(b, n, inner)
        return nn.Dense(self.dim, use_bias=False, dtype=self.dtype,
                        precision=mm_precision(self.dtype), name="to_out")(out)


class _SimpleFeedForward(nn.Module):
    dim: int
    hidden_dim: int
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        x = nn.LayerNorm(dtype=self.dtype, name="norm")(x)
        x = nn.Dense(self.hidden_dim, dtype=self.dtype,
                     precision=mm_precision(self.dtype), name="fc1")(x)
        x = jax.nn.gelu(x, approximate=False)
        return nn.Dense(self.dim, dtype=self.dtype,
                        precision=mm_precision(self.dtype), name="fc2")(x)


class SimpleViTFeaturizer(nn.Module):
    image_size: Any = 224
    patch_size: Any = 16
    dim: int = 384
    depth: int = 6
    heads: int = 8
    mlp_dim: int = 768
    channels: int = 3
    dim_head: int = 64
    dtype: Any = jnp.float32
    attn_impl: str = "auto"

    @nn.compact
    def __call__(self, img: jnp.ndarray) -> jnp.ndarray:
        """img: [B, H, W, C] -> tokens [B, N, dim]."""
        ph, pw = _pair(self.patch_size)
        b, h, w, c = img.shape
        gh, gw = h // ph, w // pw
        # patchify: [B, gh, ph, gw, pw, C] -> [B, N, ph*pw*C]; feature order
        # matches the reference's einops '(p1 p2 c)' layout given NHWC input.
        x = img.reshape(b, gh, ph, gw, pw, c)
        x = x.transpose(0, 1, 3, 2, 4, 5).reshape(b, gh * gw, ph * pw * c)
        x = nn.LayerNorm(dtype=self.dtype, name="patch_norm1")(x)
        x = nn.Dense(self.dim, dtype=self.dtype,
                     precision=mm_precision(self.dtype), name="patch_proj")(x)
        x = nn.LayerNorm(dtype=self.dtype, name="patch_norm2")(x)

        pe = jnp.asarray(posemb_sincos_2d(gh, gw, self.dim))
        x = x + pe.astype(x.dtype)

        for i in range(self.depth):
            x = x + _SimpleAttention(self.dim, self.heads, self.dim_head,
                                     self.dtype, self.attn_impl,
                                     name=f"attn_{i}")(x)
            x = x + _SimpleFeedForward(self.dim, self.mlp_dim, self.dtype,
                                       name=f"ff_{i}")(x)
        return nn.LayerNorm(dtype=self.dtype, name="final_norm")(x)
