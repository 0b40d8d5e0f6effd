"""Procedural synthetic-shapes dataset for end-to-end learning demonstrations.

The environment has no egress, so no real benchmark images or pretrained
weights can be fetched; this dataset renders deterministic scenes on the fly
instead of reading files.  Each index seeds its own PRNG and draws 1-3 filled
shapes (ellipse / rotated box / convex polygon) in colors well separated from
a smoothly shaded, lightly textured background.  Shapes are large enough that
a stride-14 probe upsampled bilinearly can reach IoU >= 0.9.

Used by:
- the trainer (as an ``iSegBaseDataset``: augmentation + click synthesis),
- the NoC eval harness (``get_sample`` -> ``DSample`` protocol), and
- ``tests/test_learning.py`` (tiny-scale trained-vs-random NoC check).

The reference proves capability with NoC tables from trained models
(reference: core/inference/utils.py:174-246); this dataset is what makes that
demonstration reproducible offline.
"""

from __future__ import annotations

from typing import Tuple

import cv2
import numpy as np

from isegprobe_tpu.data.base_dataset import iSegBaseDataset
from isegprobe_tpu.data.sample import DSample


def _shaded_background(rng: np.random.Generator, hw: Tuple[int, int]) -> np.ndarray:
    """Smooth two-direction color ramp with mild blurred noise."""
    h, w = hw
    base = rng.uniform(50, 200, size=3)
    slope = rng.uniform(-50, 50, size=(2, 3))
    yy = np.linspace(-0.5, 0.5, h)[:, None, None]
    xx = np.linspace(-0.5, 0.5, w)[None, :, None]
    img = base + slope[0] * yy + slope[1] * xx
    noise = rng.normal(0, 1, size=(h // 4, w // 4, 3))
    noise = cv2.resize(noise, (w, h), interpolation=cv2.INTER_LINEAR)
    return img + 6.0 * noise


def _pick_color(rng: np.random.Generator, taken, min_dist: float = 70.0):
    """A color at least `min_dist` (L2) from every color already in the scene."""
    for _ in range(64):
        c = rng.uniform(20, 235, size=3)
        if all(np.linalg.norm(c - t) >= min_dist for t in taken):
            return c
    return c  # pathological draw; accept the collision


def _stamp_shape(rng: np.random.Generator, canvas: np.ndarray) -> np.ndarray:
    """Draw one filled shape into a fresh byte mask (1 = inside)."""
    h, w = canvas.shape[:2]
    stamp = np.zeros((h, w), np.uint8)
    cy = int(rng.uniform(0.25, 0.75) * h)
    cx = int(rng.uniform(0.25, 0.75) * w)
    # half-extent ~ 14%..30% of the short side keeps areas >= ~2000 px @224
    r0 = int(rng.uniform(0.14, 0.30) * min(h, w))
    r1 = int(r0 * rng.uniform(0.6, 1.0))
    angle = rng.uniform(0, 180)

    kind = rng.integers(3)
    if kind == 0:
        cv2.ellipse(stamp, (cx, cy), (r0, r1), angle, 0, 360, 1, -1)
    elif kind == 1:
        box = cv2.boxPoints(((cx, cy), (2 * r0, 2 * r1), angle))
        cv2.fillPoly(stamp, [box.astype(np.int32)], 1)
    else:
        # convex blob: hull of points scattered on a wobbly ring
        n = int(rng.integers(5, 9))
        theta = np.sort(rng.uniform(0, 2 * np.pi, n))
        rad = rng.uniform(0.6, 1.0, n)
        pts = np.stack(
            [cx + r0 * rad * np.cos(theta), cy + r1 * rad * np.sin(theta)], axis=1
        ).astype(np.int32)
        cv2.fillPoly(stamp, [cv2.convexHull(pts)[:, 0, :]], 1)
    return stamp


def render_scene(rng: np.random.Generator, hw: Tuple[int, int],
                 n_shapes: int) -> Tuple[np.ndarray, np.ndarray]:
    """One (image uint8 [H,W,3], instance mask int32 [H,W]) scene."""
    img = _shaded_background(rng, hw)
    labels = np.zeros(hw, np.int32)
    colors = [img.reshape(-1, 3).mean(axis=0)]
    for i in range(n_shapes):
        color = _pick_color(rng, colors)
        colors.append(color)
        inside = _stamp_shape(rng, img).astype(bool)
        shade = 1.0 + 0.1 * rng.normal(0, 1, size=hw)[..., None]
        img = np.where(inside[..., None], color * shade, img)
        labels[inside] = i + 1  # later shapes occlude earlier ones
    img += rng.normal(0, 2.0, size=img.shape)
    return np.clip(img, 0, 255).astype(np.uint8), labels


class SyntheticShapesDataset(iSegBaseDataset):
    """Deterministic on-the-fly shape scenes (no files, no egress)."""

    def __init__(
        self,
        n_samples: int = 200,
        image_size: Tuple[int, int] = (224, 224),
        min_shapes: int = 1,
        max_shapes: int = 3,
        seed: int = 17,
        min_instance_area: int = 0,
        **kwargs,
    ) -> None:
        super().__init__(**kwargs)
        self.image_size = tuple(image_size)
        self.min_shapes = min_shapes
        self.max_shapes = max_shapes
        self.seed = seed
        self.min_instance_area = min_instance_area
        self.dataset_samples = list(range(n_samples))

    def get_sample(self, index: int) -> DSample:
        rng = np.random.default_rng(self.seed * 1_000_003 + index)
        n_shapes = int(rng.integers(self.min_shapes, self.max_shapes + 1))
        image, labels = render_scene(rng, self.image_size, n_shapes)
        # occlusion can shrink earlier shapes; tiny slivers are not a
        # meaningful NoC target, so eval configs set a floor
        present = [
            i for i in range(1, n_shapes + 1)
            if (labels == i).sum() >= max(1, self.min_instance_area)
        ]
        return DSample(image, labels, objects_ids=present, sample_id=index)
