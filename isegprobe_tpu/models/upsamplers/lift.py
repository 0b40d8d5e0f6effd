"""LiFT feature upsampler (reference: core/model/upsamplers/LiFT.py:47-146;
paper 2403.14625): a small conv decoder that doubles the feature resolution
guided by two strided conv stacks over the image.

The reference always loads LiFT frozen from a checkpoint
(core/model/upsamplers/LiFT.py:125-136), so BatchNorm runs in inference mode;
we model it as a FrozenBatchNorm whose running statistics are parameters
(filled by the checkpoint converter; identity-normalization at random init).
"""

from __future__ import annotations

from typing import Any

import flax.linen as nn
import jax
import jax.numpy as jnp

from isegprobe_tpu.ops.pool import adaptive_pool
from isegprobe_tpu.models.vit import mm_precision


class FrozenBatchNorm(nn.Module):
    """Inference-mode BatchNorm: y = (x - mean) / sqrt(var + eps) * scale + bias."""

    features: int
    eps: float = 1e-5

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        scale = self.param("scale", nn.initializers.ones, (self.features,))
        bias = self.param("bias", nn.initializers.zeros, (self.features,))
        mean = self.param("mean", nn.initializers.zeros, (self.features,))
        var = self.param("var", nn.initializers.ones, (self.features,))
        return (x - mean) * jnp.reciprocal(jnp.sqrt(var + self.eps)) * scale + bias


class ConvTranspose2x2(nn.Module):
    """Stride-2 2x2 transposed conv with exact torch ConvTranspose2d semantics:
    out[2i+u, 2j+v] = Σ_c x[i,j,c]·W[u,v,c,f] + b — four 1x1 convs interleaved,
    which keeps the computation on the MXU with no halo logic."""

    features: int
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        cin = x.shape[-1]
        w = self.param(
            "kernel", nn.initializers.lecun_normal(), (2, 2, cin, self.features)
        )
        bias = self.param("bias", nn.initializers.zeros, (self.features,))
        y = jnp.einsum("bhwc,uvcf->bhuwvf", x.astype(jnp.float32),
                       w.astype(jnp.float32),
                       precision=jax.lax.Precision.HIGHEST)
        b, h, _, w_, _, f = y.shape
        y = y.reshape(b, 2 * h, 2 * w_, f)
        return (y + bias).astype(self.dtype)


class _ConvBNRelu(nn.Module):
    features: int
    stride: int = 1
    use_bias: bool = True
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        x = nn.Conv(self.features, (3, 3), strides=self.stride, padding=1,
                    use_bias=self.use_bias, dtype=self.dtype, name="conv")(x)
        x = FrozenBatchNorm(self.features, name="bn")(x)
        return nn.relu(x)


class _DoubleConv(nn.Module):
    features: int
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        x = _ConvBNRelu(self.features, use_bias=False, dtype=self.dtype, name="c1")(x)
        return _ConvBNRelu(self.features, use_bias=False, dtype=self.dtype,
                           name="c2")(x)


class LiFTUpsampler(nn.Module):
    """__call__(source [B,h,w,C], guidance [B,H,W,3]) -> [B,2h,2w,C]."""

    n_dim: int = 384
    patch: int = 14
    lift_path: str | None = None  # checkpoint path; loading is done externally
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, source: jnp.ndarray, guidance: jnp.ndarray) -> jnp.ndarray:
        c = self.n_dim
        h, w = source.shape[1], source.shape[2]

        # two strided conv stacks over the image (LiFT.py:70-94)
        g1 = _ConvBNRelu(32, stride=2, dtype=self.dtype, name="image_convs_1a")(guidance)
        g1 = _ConvBNRelu(32, stride=2, dtype=self.dtype, name="image_convs_1b")(g1)
        g1 = adaptive_pool(g1, (h * 2, w * 2), "max")
        g2 = _ConvBNRelu(32, stride=2, dtype=self.dtype, name="image_convs_2")(g1)

        x = jnp.concatenate([source, g2.astype(source.dtype)], axis=-1)  # C+32

        # Up: transpose-conv x2, concat g1, double conv (LiFT.py:30-44)
        x = ConvTranspose2x2((c + 32) // 2, dtype=self.dtype,
                             name="up_transpose")(x)
        x = jnp.concatenate([x, g1.astype(x.dtype)], axis=-1)
        x = _DoubleConv(c // 2, dtype=self.dtype, name="up_conv")(x)

        return nn.Conv(c, (1, 1), dtype=self.dtype,
                       precision=mm_precision(self.dtype), name="outc")(x)
