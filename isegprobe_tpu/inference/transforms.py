"""Invertible evaluation-time transforms, host-side numpy
(reference: core/inference/transforms/*).

These objects implement the reference's transform-chain protocol
(transform / inv_transform / get_state / set_state / reset) over NHWC numpy
arrays. The production path compiles ZoomIn + flip directly into the
predictor's click step (inference/predictor.py); this module provides the same
components as composable objects — including the tiled ``Crops`` TTA the
compiled path does not cover — for API parity and the generic predictor.
"""

from __future__ import annotations

import math
from typing import List, Optional, Tuple

import jax.numpy as jnp
import numpy as np

from isegprobe_tpu.inference.clicker import Click
from isegprobe_tpu.ops.resize import resize
from isegprobe_tpu.utils.misc import (
    clamp_bbox,
    expand_bbox,
    get_bbox_from_mask,
    get_bbox_iou,
)


def _resize_np(x: np.ndarray, size, mode="bilinear", align_corners=True):
    return np.asarray(resize(jnp.asarray(x), size, mode, align_corners))


class BaseTransform:
    def __init__(self) -> None:
        self.image_changed = False

    def transform(self, image_nd, clicks_lists):
        raise NotImplementedError

    def inv_transform(self, prob_map):
        raise NotImplementedError

    def reset(self):
        raise NotImplementedError

    def get_state(self):
        raise NotImplementedError

    def set_state(self, state):
        raise NotImplementedError


class SigmoidForPred(BaseTransform):
    def transform(self, image_nd, clicks_lists):
        return image_nd, clicks_lists

    def inv_transform(self, prob_map):
        return 1.0 / (1.0 + np.exp(-prob_map))

    def reset(self):
        pass

    def get_state(self):
        return None

    def set_state(self, state):
        pass


class AddHorizontalFlip(BaseTransform):
    """Batch-doubling flip TTA; inverse averages the pair
    (reference: transforms/flip.py:12-45). Operates on [B, H, W, C]."""

    def transform(self, image_nd, clicks_lists):
        image_nd = np.concatenate([image_nd, image_nd[:, :, ::-1]], axis=0)
        image_width = image_nd.shape[2]
        flipped = [
            [c.copy(coords=(c.coords[0], image_width - c.coords[1] - 1))
             for c in clicks_list]
            for clicks_list in clicks_lists
        ]
        return image_nd, clicks_lists + flipped

    def inv_transform(self, prob_map):
        assert prob_map.shape[0] % 2 == 0
        num_maps = prob_map.shape[0] // 2
        return 0.5 * (prob_map[:num_maps] + prob_map[num_maps:, :, ::-1])

    def reset(self):
        pass

    def get_state(self):
        return None

    def set_state(self, state):
        pass


class ZoomIn(BaseTransform):
    """Crop to the predicted-object ROI, resize to target, remap clicks;
    inverse pastes the prob map back (reference: transforms/zoom_in.py:13-253).
    """

    def __init__(self, target_size=400, skip_clicks=1, expansion_ratio=1.4,
                 min_crop_size=200, recompute_thresh_iou=0.5,
                 prob_thresh=0.50) -> None:
        super().__init__()
        self.target_size = target_size
        self.min_crop_size = min_crop_size
        self.skip_clicks = skip_clicks
        self.expansion_ratio = expansion_ratio
        self.recompute_thresh_iou = recompute_thresh_iou
        self.prob_thresh = prob_thresh
        self.reset()

    def transform(self, image_nd, clicks_lists):
        assert image_nd.shape[0] == 1 and len(clicks_lists) == 1
        self.image_changed = False
        clicks_list = clicks_lists[0]
        if len(clicks_list) <= self.skip_clicks:
            return image_nd, clicks_lists

        self._input_image_shape = image_nd.shape
        h, w = image_nd.shape[1:3]

        current_object_roi = None
        if self._prev_probs is not None:
            current_pred_mask = (self._prev_probs > self.prob_thresh)[0, :, :, 0]
            if current_pred_mask.sum() > 0:
                current_object_roi = get_object_roi(
                    current_pred_mask, clicks_list,
                    self.expansion_ratio, self.min_crop_size,
                )
        if current_object_roi is None:
            if self.skip_clicks >= 0:
                return image_nd, clicks_lists
            current_object_roi = (0, h - 1, 0, w - 1)

        update = self._object_roi is None
        if not update and not check_object_roi(self._object_roi, clicks_list):
            update = True
        if not update and (
            get_bbox_iou(current_object_roi, self._object_roi)
            < self.recompute_thresh_iou
        ):
            update = True
        if update:
            self._object_roi = current_object_roi
            self.image_changed = True

        self._roi_image = get_roi_image_nd(image_nd, self._object_roi,
                                           self.target_size)
        return self._roi_image, [self._transform_clicks(clicks_list)]

    def inv_transform(self, prob_map):
        if self._object_roi is None:
            self._prev_probs = prob_map
            return prob_map
        rmin, rmax, cmin, cmax = self._object_roi
        prob_map = _resize_np(prob_map, (rmax - rmin + 1, cmax - cmin + 1))
        if self._prev_probs is not None:
            new_prob_map = np.zeros_like(self._prev_probs, dtype=prob_map.dtype)
            new_prob_map[:, rmin : rmax + 1, cmin : cmax + 1] = prob_map
        else:
            new_prob_map = prob_map
        self._prev_probs = new_prob_map
        return new_prob_map

    def check_possible_recalculation(self) -> bool:
        if (self._prev_probs is None or self._object_roi is not None
                or self.skip_clicks > 0):
            return False
        pred_mask = (self._prev_probs > self.prob_thresh)[0, :, :, 0]
        if pred_mask.sum() > 0:
            possible_object_roi = get_object_roi(
                pred_mask, [], self.expansion_ratio, self.min_crop_size
            )
            image_roi = (0, self._input_image_shape[1] - 1,
                         0, self._input_image_shape[2] - 1)
            if get_bbox_iou(possible_object_roi, image_roi) < 0.50:
                return True
        return False

    def get_state(self):
        return (self._input_image_shape, self._object_roi, self._prev_probs,
                self._roi_image, self.image_changed)

    def set_state(self, state):
        (self._input_image_shape, self._object_roi, self._prev_probs,
         self._roi_image, self.image_changed) = state

    def reset(self):
        self._input_image_shape = None
        self._object_roi = None
        self._prev_probs = None
        self._roi_image = None
        self.image_changed = False

    def _transform_clicks(self, clicks_list):
        if self._object_roi is None:
            return clicks_list
        rmin, rmax, cmin, cmax = self._object_roi
        crop_height, crop_width = self._roi_image.shape[1:3]
        out = []
        for click in clicks_list:
            new_r = crop_height * (click.coords[0] - rmin) / (rmax - rmin + 1)
            new_c = crop_width * (click.coords[1] - cmin) / (cmax - cmin + 1)
            out.append(click.copy(coords=(new_r, new_c)))
        return out


class LimitLongestSide(ZoomIn):
    """(reference: transforms/limit_longest_side.py:12-32)"""

    def __init__(self, max_size: int = 800):
        super().__init__(target_size=max_size, skip_clicks=0)

    def transform(self, image_nd, clicks_lists):
        assert image_nd.shape[0] == 1 and len(clicks_lists) == 1
        image_max_size = max(image_nd.shape[1:3])
        self.image_changed = False
        if image_max_size <= self.target_size:
            return image_nd, clicks_lists
        self._object_roi = (0, image_nd.shape[1] - 1, 0, image_nd.shape[2] - 1)
        self._roi_image = get_roi_image_nd(image_nd, self._object_roi,
                                           self.target_size)
        self.image_changed = True
        return self._roi_image, [self._transform_clicks(clicks_lists[0])]


class Crops(BaseTransform):
    """Tiled sliding-window crops with count-averaged stitching
    (reference: transforms/crops.py:14-117)."""

    def __init__(self, crop_size=(320, 480), min_overlap: float = 0.2) -> None:
        super().__init__()
        self.crop_height, self.crop_width = crop_size
        self.min_overlap = min_overlap
        self.x_offsets = None
        self.y_offsets = None
        self._counts = None

    def transform(self, image_nd, clicks_lists):
        assert image_nd.shape[0] == 1 and len(clicks_lists) == 1
        image_height, image_width = image_nd.shape[1:3]
        self._counts = None
        if image_height < self.crop_height or image_width < self.crop_width:
            return image_nd, clicks_lists

        self.x_offsets = get_offsets(image_width, self.crop_width,
                                     self.min_overlap)
        self.y_offsets = get_offsets(image_height, self.crop_height,
                                     self.min_overlap)
        self._counts = np.zeros((image_height, image_width), dtype=np.float32)

        image_crops = []
        for dy in self.y_offsets:
            for dx in self.x_offsets:
                self._counts[dy : dy + self.crop_height,
                             dx : dx + self.crop_width] += 1
                image_crops.append(
                    image_nd[:, dy : dy + self.crop_height,
                             dx : dx + self.crop_width]
                )
        image_crops = np.concatenate(image_crops, axis=0)

        clicks_list = clicks_lists[0]
        new_lists = []
        for dy in self.y_offsets:
            for dx in self.x_offsets:
                new_lists.append(
                    [c.copy(coords=(c.coords[0] - dy, c.coords[1] - dx))
                     for c in clicks_list]
                )
        return image_crops, new_lists

    def inv_transform(self, prob_map):
        if self._counts is None:
            return prob_map
        new_prob_map = np.zeros(
            (1, *self._counts.shape, prob_map.shape[-1]), dtype=prob_map.dtype
        )
        crop_indx = 0
        for dy in self.y_offsets:
            for dx in self.x_offsets:
                new_prob_map[0, dy : dy + self.crop_height,
                             dx : dx + self.crop_width] += prob_map[crop_indx]
                crop_indx += 1
        return new_prob_map / self._counts[None, :, :, None]

    def get_state(self):
        return self.x_offsets, self.y_offsets, self._counts

    def set_state(self, state):
        self.x_offsets, self.y_offsets, self._counts = state

    def reset(self):
        self.x_offsets = None
        self.y_offsets = None
        self._counts = None


def get_object_roi(pred_mask, clicks_list, expansion_ratio, min_crop_size):
    """(reference: zoom_in.py:196-213)"""
    pred_mask = pred_mask.copy()
    for click in clicks_list:
        if click.is_positive:
            pred_mask[int(click.coords[0]), int(click.coords[1])] = 1
    bbox = get_bbox_from_mask(pred_mask)
    bbox = expand_bbox(bbox, expansion_ratio, min_crop_size)
    h, w = pred_mask.shape
    return clamp_bbox(bbox, 0, h - 1, 0, w - 1)


def get_roi_image_nd(image_nd, object_roi, target_size):
    """(reference: zoom_in.py:216-240); image_nd is [1, H, W, C]."""
    rmin, rmax, cmin, cmax = object_roi
    height = rmax - rmin + 1
    width = cmax - cmin + 1
    if isinstance(target_size, tuple):
        new_height, new_width = target_size
    else:
        scale = target_size / max(height, width)
        new_height = int(round(height * scale))
        new_width = int(round(width * scale))
    roi = image_nd[:, rmin : rmax + 1, cmin : cmax + 1]
    return _resize_np(roi, (new_height, new_width))


def check_object_roi(object_roi, clicks_list) -> bool:
    """(reference: zoom_in.py:243-253)"""
    for click in clicks_list:
        if click.is_positive:
            if click.coords[0] < object_roi[0] or click.coords[0] >= object_roi[1]:
                return False
            if click.coords[1] < object_roi[2] or click.coords[1] >= object_roi[3]:
                return False
    return True


def get_offsets(length: int, crop_size: int,
                min_overlap_ratio: float = 0.2) -> List[int]:
    """(reference: crops.py:97-117)"""
    if length == crop_size:
        return [0]
    n = (length / crop_size - min_overlap_ratio) / (1 - min_overlap_ratio)
    n = math.ceil(n)
    overlap_ratio = (n - length / crop_size) / (n - 1)
    overlap_width = int(crop_size * overlap_ratio)
    offsets = [0]
    for _ in range(1, n):
        new_offset = offsets[-1] + crop_size - overlap_width
        if new_offset + crop_size > length:
            new_offset = length - crop_size
        offsets.append(new_offset)
    return offsets
