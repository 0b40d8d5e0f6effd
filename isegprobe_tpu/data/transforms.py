"""Training-time augmentations (reference: models/defaults.py:39-73 uses
albumentations; core/data/transforms.py:21-63 adds UniformRandomResize).

albumentations is not a dependency of this framework, so the pipeline is
implemented directly on numpy/cv2 with the same stochastic semantics: each
transform edits (image, layered mask) jointly, masks with nearest-neighbor
resampling and constant-zero borders.
"""

from __future__ import annotations

import random
from typing import List, Optional, Sequence, Tuple

import cv2
import numpy as np

Pair = Tuple[np.ndarray, np.ndarray]


class Transform:
    def __init__(self, p: float = 1.0) -> None:
        self.p = p

    def __call__(self, image: np.ndarray, mask: np.ndarray) -> Pair:
        if random.random() < self.p:
            return self.apply(image, mask)
        return image, mask

    def apply(self, image, mask) -> Pair:
        raise NotImplementedError


class Compose:
    def __init__(self, transforms: Sequence[Transform], p: float = 1.0) -> None:
        self.transforms = list(transforms)
        self.p = p

    def __call__(self, image=None, mask=None, **_) -> dict:
        if random.random() < self.p:
            for t in self.transforms:
                image, mask = t(image, mask)
        return {"image": image, "mask": mask}


def _resize_pair(image, mask, h, w) -> Pair:
    image = cv2.resize(image, (w, h), interpolation=cv2.INTER_LINEAR)
    mask = cv2.resize(mask, (w, h), interpolation=cv2.INTER_NEAREST)
    if mask.ndim == 2:
        mask = mask[:, :, None]
    return image, mask


class UniformRandomResize(Transform):
    """(reference: core/data/transforms.py:21-63)"""

    def __init__(self, scale_range=(0.9, 1.1), p: float = 1.0) -> None:
        super().__init__(p)
        self.scale_range = scale_range

    def apply(self, image, mask) -> Pair:
        scale = random.uniform(*self.scale_range)
        h = int(round(image.shape[0] * scale))
        w = int(round(image.shape[1] * scale))
        return _resize_pair(image, mask, h, w)


class Flip(Transform):
    """albumentations A.Flip: horizontal, vertical or both, equiprobable."""

    def __init__(self, p: float = 0.5) -> None:
        super().__init__(p)

    def apply(self, image, mask) -> Pair:
        d = random.choice([-1, 0, 1])
        image = cv2.flip(image, d)
        mask = cv2.flip(mask, d)
        if mask.ndim == 2:
            mask = mask[:, :, None]
        return image, mask


class HorizontalFlip(Transform):
    def __init__(self, p: float = 0.5) -> None:
        super().__init__(p)

    def apply(self, image, mask) -> Pair:
        return np.ascontiguousarray(image[:, ::-1]), np.ascontiguousarray(
            mask[:, ::-1]
        )


class RandomRotate90(Transform):
    def __init__(self, p: float = 0.5) -> None:
        super().__init__(p)

    def apply(self, image, mask) -> Pair:
        k = random.randint(0, 3)
        return np.ascontiguousarray(np.rot90(image, k)), np.ascontiguousarray(
            np.rot90(mask, k)
        )


class ShiftScaleRotate(Transform):
    """Constant-zero border affine jitter (A.ShiftScaleRotate semantics)."""

    def __init__(self, shift_limit=0.0625, scale_limit=0.1, rotate_limit=45,
                 p: float = 0.5) -> None:
        super().__init__(p)
        self.shift_limit = self._pair(shift_limit)
        self.scale_limit = self._pair(scale_limit)
        self.rotate_limit = self._pair(rotate_limit)

    @staticmethod
    def _pair(v):
        return tuple(v) if isinstance(v, (tuple, list)) else (-v, v)

    def apply(self, image, mask) -> Pair:
        h, w = image.shape[:2]
        angle = random.uniform(*self.rotate_limit)
        scale = 1.0 + random.uniform(*self.scale_limit)
        dx = random.uniform(*self.shift_limit) * w
        dy = random.uniform(*self.shift_limit) * h
        m = cv2.getRotationMatrix2D((w / 2, h / 2), angle, scale)
        m[0, 2] += dx
        m[1, 2] += dy
        image = cv2.warpAffine(image, m, (w, h), flags=cv2.INTER_LINEAR,
                               borderMode=cv2.BORDER_CONSTANT, borderValue=0)
        mask = cv2.warpAffine(mask, m, (w, h), flags=cv2.INTER_NEAREST,
                              borderMode=cv2.BORDER_CONSTANT, borderValue=0)
        if mask.ndim == 2:
            mask = mask[:, :, None]
        return image, mask


class PadIfNeeded(Transform):
    """Center-pad to a minimum size with zeros (A.PadIfNeeded semantics)."""

    def __init__(self, min_height: int, min_width: int, p: float = 1.0) -> None:
        super().__init__(p)
        self.min_height = min_height
        self.min_width = min_width

    def apply(self, image, mask) -> Pair:
        h, w = image.shape[:2]
        pt = max(0, (self.min_height - h) // 2)
        pb = max(0, self.min_height - h - pt)
        pl = max(0, (self.min_width - w) // 2)
        pr = max(0, self.min_width - w - pl)
        if pt or pb or pl or pr:
            image = np.pad(image, ((pt, pb), (pl, pr), (0, 0)))
            mask = np.pad(mask, ((pt, pb), (pl, pr), (0, 0)))
        return image, mask


class RandomCrop(Transform):
    def __init__(self, height: int, width: int, p: float = 1.0) -> None:
        super().__init__(p)
        self.height = height
        self.width = width

    def apply(self, image, mask) -> Pair:
        h, w = image.shape[:2]
        top = random.randint(0, max(0, h - self.height))
        left = random.randint(0, max(0, w - self.width))
        return (
            image[top : top + self.height, left : left + self.width],
            mask[top : top + self.height, left : left + self.width],
        )


class RandomBrightnessContrast(Transform):
    """img' = clip(img*alpha + beta*255) for uint8 inputs."""

    def __init__(self, brightness_limit=(-0.2, 0.2), contrast_limit=(-0.2, 0.2),
                 p: float = 0.5) -> None:
        super().__init__(p)
        self.brightness_limit = self._pair(brightness_limit)
        self.contrast_limit = self._pair(contrast_limit)

    @staticmethod
    def _pair(v):
        return tuple(v) if isinstance(v, (tuple, list)) else (-v, v)

    def apply(self, image, mask) -> Pair:
        alpha = 1.0 + random.uniform(*self.contrast_limit)
        beta = random.uniform(*self.brightness_limit)
        out = image.astype(np.float32) * alpha + beta * 255.0
        return np.clip(out, 0, 255).astype(image.dtype), mask


class RGBShift(Transform):
    def __init__(self, r_shift_limit=20, g_shift_limit=20, b_shift_limit=20,
                 p: float = 0.5) -> None:
        super().__init__(p)
        self.limits = [self._pair(v) for v in
                       (r_shift_limit, g_shift_limit, b_shift_limit)]

    @staticmethod
    def _pair(v):
        return tuple(v) if isinstance(v, (tuple, list)) else (-v, v)

    def apply(self, image, mask) -> Pair:
        shift = np.array([random.uniform(*lim) for lim in self.limits],
                         dtype=np.float32)
        out = image.astype(np.float32) + shift
        return np.clip(out, 0, 255).astype(image.dtype), mask
