"""Segmentation heads (reference: core/model/heads/conv_heads.py:10-73).

The reference builds these from mmcv ConvModule with default configs — i.e.
conv (with bias) + ReLU, no norm — followed by a 1x1 conv classifier
(core/model/heads/base_head.py:15). All tensors NHWC.

Each head also exposes a row-banded evaluation contract used to fuse the
head into the LoftUp upsampler's horizontal-slab loop (the HR feature map
never materializes in HBM — models/upsamplers/loftup.py):

  * ``tail_halo`` — extra input rows needed on each side of a slab (one per
    3x3 conv layer; 0 for pointwise heads).
  * ``banded(x, in_frame)`` — apply the head to a slab ``x`` of
    ``out_rows + 2*tail_halo`` rows. ``in_frame[r]`` is 1 where row r lies
    inside the real frame; out-of-frame rows are zeroed before every conv,
    reproducing the monolithic head's zero padding at the frame edge
    exactly (the width axis keeps its native zero padding).
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

    tail_halo = 0

    def setup(self):
        self.classifier = nn.Conv(self.num_classes, (1, 1), dtype=self.dtype,
                                  precision=mm_precision(self.dtype))

    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        return self.classifier(x)

    def banded(self, x: jnp.ndarray, in_frame: jnp.ndarray) -> jnp.ndarray:
        return self.classifier(x)

    def masked(self, x: jnp.ndarray, valid_hw: jnp.ndarray) -> jnp.ndarray:
        return self.classifier(x)  # pointwise


class SimpleConvSegHead(nn.Module):
    """'simple_conv': N 1x1 conv+ReLU layers, then the classifier."""

    in_channels: int
    num_layers: int
    num_classes: int = 1
    dtype: Any = jnp.float32

    tail_halo = 0

    def setup(self):
        self.convs = [
            nn.Conv(self.in_channels, (1, 1), dtype=self.dtype,
                    precision=mm_precision(self.dtype))
            for _ in range(self.num_layers)
        ]
        self.classifier = nn.Conv(self.num_classes, (1, 1), dtype=self.dtype,
                                  precision=mm_precision(self.dtype))

    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        for conv in self.convs:
            x = nn.relu(conv(x))
        return self.classifier(x)

    def banded(self, x: jnp.ndarray, in_frame: jnp.ndarray) -> jnp.ndarray:
        return self(x)  # pointwise: rows are independent, halo-free

    def masked(self, x: jnp.ndarray, valid_hw: jnp.ndarray) -> jnp.ndarray:
        return self(x)  # pointwise


class ConvSegHead(nn.Module):
    """'convhead': N 3x3 conv+ReLU layers, then the classifier — the head used
    by all reference experiments (models/sbd/dinov2/patch-embed_noup.py:51-58)."""

    in_channels: int
    num_layers: int
    num_classes: int = 1
    dtype: Any = jnp.float32

    def setup(self):
        self.convs = [
            nn.Conv(self.in_channels, (3, 3), padding=1, dtype=self.dtype,
                    precision=mm_precision(self.dtype))
            for _ in range(self.num_layers)
        ]
        self.classifier = nn.Conv(self.num_classes, (1, 1), dtype=self.dtype,
                                  precision=mm_precision(self.dtype))

    @property
    def tail_halo(self) -> int:
        return self.num_layers

    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        for conv in self.convs:
            x = nn.relu(conv(x))
        return self.classifier(x)

    def masked(self, x: jnp.ndarray, valid_hw: jnp.ndarray) -> jnp.ndarray:
        """Adaptive-canvas head: x [B, H, W, C] with per-sample traced valid
        rects ``valid_hw`` [B, 2]. Out-of-rect values are zeroed before
        every 3x3 conv so each conv sees the zero padding a true (vh, vw)
        input would have at its frame edge — valid-rect outputs are exact
        (inference/adaptive_eval.py)."""
        ii = jnp.arange(x.shape[1])
        jj = jnp.arange(x.shape[2])
        m = ((ii[None, :, None] < valid_hw[:, 0, None, None])
             & (jj[None, None, :] < valid_hw[:, 1, None, None]))
        m = m[..., None].astype(x.dtype)
        x = x * m
        for conv in self.convs:
            x = nn.relu(conv(x)) * m
        return self.classifier(x)

    def banded(self, x: jnp.ndarray, in_frame: jnp.ndarray) -> jnp.ndarray:
        """x: [B, rows, W, C] with ``num_layers`` halo rows each side.

        Each 3x3 conv consumes one halo row per side; rows that lie outside
        the real frame are re-zeroed before every conv so the frame-edge
        zero padding of the monolithic path is reproduced bit-exactly
        (relu(0) = 0, so zeroing after the relu is equivalent)."""
        mask = in_frame.astype(x.dtype)
        x = x * mask[None, :, None, None]
        for conv in self.convs:
            x = nn.relu(conv(x))[:, 1:-1]
            mask = mask[1:-1]
            x = x * mask[None, :, None, None]
        return self.classifier(x)


HEAD_REGISTRY = {
    "linear": SimpleClassifierHead,
    "simple_conv": SimpleConvSegHead,
    "convhead": ConvSegHead,
}
