"""Training losses (reference: core/training/losses.py:11-268), all jnp and
ignore-label aware. Tensors are NHWC ([B, H, W, 1] predictions/labels).

Losses are pure functions returning per-sample values [B]; the reference's
EMA logging state inside NormalizedFocalLossSigmoid (_k_sum/_m_max,
losses.py:67-84) is returned as aux metrics instead of hidden mutable state.
"""

from __future__ import annotations

import dataclasses
from typing import Dict, Tuple

import jax
import jax.numpy as jnp

_SPATIAL = (1, 2, 3)  # non-batch axes of [B, H, W, 1]


@dataclasses.dataclass(frozen=True)
class NormalizedFocalLossSigmoid:
    """Focal loss with batch-normalized modulation — the loss used by every
    reference experiment (models/defaults.py:24; losses.py:11-113)."""

    alpha: float = 0.25
    gamma: float = 2.0
    max_mult: float = -1
    eps: float = 1e-12
    from_sigmoid: bool = False
    detach_delimeter: bool = True
    weight: float = 1.0
    size_average: bool = True
    ignore_label: int = -1

    def __call__(self, pred, label) -> Tuple[jnp.ndarray, Dict]:
        one_hot = label > 0.5
        sample_weight = (label != self.ignore_label).astype(pred.dtype)

        if not self.from_sigmoid:
            pred = jax.nn.sigmoid(pred)

        alpha = jnp.where(one_hot, self.alpha * sample_weight,
                          (1 - self.alpha) * sample_weight)
        pt = jnp.where(sample_weight > 0, 1.0 - jnp.abs(label - pred),
                       jnp.ones_like(pred))
        beta = (1 - pt) ** self.gamma

        sw_sum = jnp.sum(sample_weight, axis=(-3, -2), keepdims=True)
        beta_sum = jnp.sum(beta, axis=(-3, -2), keepdims=True)
        mult = sw_sum / (beta_sum + self.eps)
        if self.detach_delimeter:
            mult = jax.lax.stop_gradient(mult)
        beta = beta * mult
        if self.max_mult > 0:
            beta = jnp.minimum(beta, self.max_mult)

        loss = -alpha * beta * jnp.log(jnp.minimum(pt + self.eps, 1.0))
        loss = self.weight * (loss * sample_weight)

        if self.size_average:
            bsum = jnp.sum(sample_weight, axis=_SPATIAL)
            loss = jnp.sum(loss, axis=_SPATIAL) / (bsum + self.eps)
        else:
            loss = jnp.sum(loss, axis=_SPATIAL)

        aux = {
            "nfl_k": jnp.mean(mult),
            "nfl_m_max": jnp.mean(jnp.max(beta.reshape(beta.shape[0], -1), axis=1)),
        }
        return loss, aux


@dataclasses.dataclass(frozen=True)
class FocalLoss:
    """(reference: losses.py:116-185)"""

    alpha: float = 0.25
    gamma: float = 2.0
    from_logits: bool = False
    eps: float = 1e-9
    size_average: bool = True
    scale: float = 1.0
    weight: float = 1.0
    ignore_label: int = -1

    def __call__(self, pred, label):
        one_hot = label > 0.5
        sample_weight = (label != self.ignore_label).astype(pred.dtype)
        if not self.from_logits:
            pred = jax.nn.sigmoid(pred)
        alpha = jnp.where(one_hot, self.alpha * sample_weight,
                          (1 - self.alpha) * sample_weight)
        pt = jnp.where(sample_weight > 0, 1.0 - jnp.abs(label - pred),
                       jnp.ones_like(pred))
        beta = (1 - pt) ** self.gamma
        loss = -alpha * beta * jnp.log(jnp.minimum(pt + self.eps, 1.0))
        loss = self.weight * (loss * sample_weight)
        if self.size_average:
            tsum = jnp.sum(sample_weight, axis=_SPATIAL)
            loss = jnp.sum(loss, axis=_SPATIAL) / (tsum + self.eps)
        else:
            loss = jnp.sum(loss, axis=_SPATIAL)
        return self.scale * loss, {}


@dataclasses.dataclass(frozen=True)
class SoftIoU:
    """(reference: losses.py:188-205)"""

    from_sigmoid: bool = False
    ignore_label: int = -1

    def __call__(self, pred, label):
        label = label.reshape(pred.shape)
        sample_weight = (label != self.ignore_label).astype(pred.dtype)
        if not self.from_sigmoid:
            pred = jax.nn.sigmoid(pred)
        loss = 1.0 - jnp.sum(pred * label * sample_weight, axis=_SPATIAL) / (
            jnp.sum(jnp.maximum(pred, label) * sample_weight, axis=_SPATIAL) + 1e-8
        )
        return loss, {}


@dataclasses.dataclass(frozen=True)
class SigmoidBinaryCrossEntropyLoss:
    """(reference: losses.py:208-233)"""

    from_sigmoid: bool = False
    weight: float = 1.0
    ignore_label: int = -1

    def __call__(self, pred, label):
        label = label.reshape(pred.shape)
        sample_weight = (label != self.ignore_label).astype(pred.dtype)
        label = jnp.where(sample_weight > 0, label, jnp.zeros_like(label))
        if not self.from_sigmoid:
            loss = (
                jax.nn.relu(pred) - pred * label + jax.nn.softplus(-jnp.abs(pred))
            )
        else:
            eps = 1e-12
            loss = -(
                jnp.log(pred + eps) * label + jnp.log(1.0 - pred + eps) * (1.0 - label)
            )
        loss = self.weight * (loss * sample_weight)
        return jnp.mean(loss, axis=_SPATIAL), {}


@dataclasses.dataclass(frozen=True)
class BinaryDiceLoss:
    """(reference: losses.py:236-268); expects channel-last class scores."""

    def __call__(self, pred, label):
        b = pred.shape[0]
        input_label = jnp.argmax(pred, axis=-1).astype(pred.dtype)
        input_pred = jnp.max(pred, axis=-1) * input_label
        input_pred = input_pred.reshape(b, -1)
        target_label = label.astype(pred.dtype).reshape(b, -1)
        intersect = jnp.sum(input_pred * target_label, axis=1)
        input_area = jnp.sum(input_pred * input_pred, axis=1)
        target_area = jnp.sum(target_label * target_label, axis=1)
        eps = 1e-6
        batch_loss = 1.0 - (2.0 * intersect + eps) / (
            input_area + target_area + eps
        )
        return jnp.mean(batch_loss)[None], {}


LOSS_REGISTRY = {
    "NormalizedFocalLossSigmoid": NormalizedFocalLossSigmoid,
    "FocalLoss": FocalLoss,
    "SoftIoU": SoftIoU,
    "SigmoidBinaryCrossEntropyLoss": SigmoidBinaryCrossEntropyLoss,
    "BinaryDiceLoss": BinaryDiceLoss,
}
