"""Segmentation heads (reference: core/model/heads/conv_heads.py:10-73).

The reference builds these from mmcv ConvModule with default configs — i.e.
conv (with bias) + ReLU, no norm — followed by a 1x1 conv classifier
(core/model/heads/base_head.py:15). All tensors NHWC.
"""

from __future__ import annotations

from typing import Any

import flax.linen as nn
import jax.numpy as jnp
from isegprobe_tpu.models.vit import mm_precision


class SimpleClassifierHead(nn.Module):
    """'linear': a single 1x1 conv classifier."""

    in_channels: int
    num_classes: int = 1
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        return nn.Conv(self.num_classes, (1, 1), dtype=self.dtype,
                       precision=mm_precision(self.dtype), name="classifier")(x)


class SimpleConvSegHead(nn.Module):
    """'simple_conv': N 1x1 conv+ReLU layers, then the classifier."""

    in_channels: int
    num_layers: int
    num_classes: int = 1
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        for i in range(self.num_layers):
            x = nn.Conv(self.in_channels, (1, 1), dtype=self.dtype,
                        precision=mm_precision(self.dtype),
                        name=f"convs_{i}")(x)
            x = nn.relu(x)
        return nn.Conv(self.num_classes, (1, 1), dtype=self.dtype,
                       precision=mm_precision(self.dtype), name="classifier")(x)


class ConvSegHead(nn.Module):
    """'convhead': N 3x3 conv+ReLU layers, then the classifier — the head used
    by all reference experiments (models/sbd/dinov2/patch-embed_noup.py:51-58)."""

    in_channels: int
    num_layers: int
    num_classes: int = 1
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        for i in range(self.num_layers):
            x = nn.Conv(self.in_channels, (3, 3), padding=1, dtype=self.dtype,
                        precision=mm_precision(self.dtype),
                        name=f"convs_{i}")(x)
            x = nn.relu(x)
        return nn.Conv(self.num_classes, (1, 1), dtype=self.dtype,
                       precision=mm_precision(self.dtype), name="classifier")(x)


HEAD_REGISTRY = {
    "linear": SimpleClassifierHead,
    "simple_conv": SimpleConvSegHead,
    "convhead": ConvSegHead,
}
