"""TPU predictor: the reference's per-click pipeline as one compiled program.

The reference BasePredictor + transform chain (reference:
core/inference/predictors/base_predictor.py:67-108, transforms/zoom_in.py,
flip.py, base_transform.py) performs per click: concat prev-mask channel →
ZoomIn crop+resize → (optional) horizontal-flip batch doubling → model forward
→ resize → inverse flip (logit average) → sigmoid → inverse ZoomIn paste —
with 4+ host↔device round-trips. Here the entire chain is a single jitted
function over a padded full-frame image (SURVEY.md §7 design delta #1):

    click_step(params, image_pad, roi, points) -> full-frame probs

Only the ROI selection logic (a handful of scalar bbox ops that depend on the
thresholded previous mask, reference: zoom_in.py:59-97, 196-253) stays on the
host, where the mask is needed anyway for the clicker protocol.

Static shapes: images are zero-padded to 64-pixel buckets (one compile per
bucket), clicks to a fixed ``net_clicks_limit`` budget with (−1,−1,−1) rows —
the same padding convention the reference uses (base_predictor.py:194-225).
"""

from __future__ import annotations

import functools
from typing import Dict, List, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from isegprobe_tpu.inference.clicker import Click, Clicker
from isegprobe_tpu.ops.sample import crop_resize, inverse_paste
from isegprobe_tpu.utils.misc import (
    clamp_bbox,
    expand_bbox,
    get_bbox_from_mask,
    get_bbox_iou,
    stamped,
)

Bbox = Tuple[int, int, int, int]


def _bucket(n: int, step: int = 64) -> int:
    return -(-n // step) * step


def _pack_clicks_row(points: np.ndarray, bi: int, clicks: List[Click],
                     n: int, dy: float = 0.0, dx: float = 0.0) -> None:
    """Fill ``points[bi]`` (a ``[2n, 3]`` row pre-filled with −1 sentinels)
    from a click list: positives in ``[0:n]``, negatives in ``[n:2n]``,
    coords shifted by ``(−dy, −dx)`` — THE padding convention shared by every
    predictor (reference: base_predictor.py:194-225)."""
    pi = ni = 0
    for click in clicks[:n]:
        row = (click.coords[0] - dy, click.coords[1] - dx, click.indx)
        if click.is_positive:
            points[bi, pi] = row
            pi += 1
        else:
            points[bi, n + ni] = row
            ni += 1


class TPUPredictor:
    """Stateful per-image predictor with a fully-compiled click step."""

    def __init__(
        self,
        model,
        params,
        target_size: Tuple[int, int] = (448, 448),
        skip_clicks: int = -1,
        expansion_ratio: float = 1.4,
        min_crop_size: int = 200,
        recompute_thresh_iou: float = 0.5,
        prob_thresh: float = 0.50,
        net_clicks_limit: int = 20,
        with_flip: bool = True,
        optimize_after_n_clicks: int = 1,  # parity with predictor_params
        click_models: Optional[List] = None,
    ) -> None:
        self.model = model
        self.params = params
        self.target_size = tuple(target_size)
        self.skip_clicks = skip_clicks
        self.expansion_ratio = expansion_ratio
        self.min_crop_size = min_crop_size
        self.recompute_thresh_iou = recompute_thresh_iou
        self.prob_thresh = prob_thresh
        self.net_clicks_limit = net_clicks_limit
        self.with_flip = with_flip
        self.with_prev_mask = getattr(model, "with_prev_mask", False)

        self.original_image = None  # device array [1, Hp, Wp, 3]
        self.image_hw: Tuple[int, int] = (0, 0)
        self.pad_hw: Tuple[int, int] = (0, 0)
        self.prev_prediction: Optional[np.ndarray] = None  # host [H, W]
        self._prev_probs_dev = None  # device [1, Hp, Wp, 1] (avoids re-upload)
        self._object_roi: Optional[Bbox] = None
        self._roi_version = 0  # bumped when the ROI changes (cache invalidation)

        # click-wise model ensemble (reference: base_predictor.py:38-44,72-81):
        # slot k serves predictions once the click count reaches k+1; the last
        # slot serves all later clicks. Entries are (model, params) pairs or
        # bare params pytrees reusing the base model.
        self._slots: List[Tuple] = [(model, params)]
        if click_models:
            self._slots = [
                cm if isinstance(cm, tuple) else (model, cm)
                for cm in click_models
            ]
        self._compiled: Dict[int, Tuple] = {}
        self._active_slot = -1
        self._activate_slot(0)
        self._trunk_cache = None  # (roi_version, trunk arrays)

    def _activate_slot(self, idx: int) -> None:
        if idx == self._active_slot:
            return
        self.model, self.params = self._slots[idx]
        self.with_prev_mask = getattr(self.model, "with_prev_mask", False)
        if idx not in self._compiled:
            model = self.model
            bcfg = getattr(model, "backbone_cfg", None) or {}
            cache_backbone = (
                (bcfg.get("params") or {}).get("feats_injection_mode")
                == "after_backbone"
            )
            # salt: config baked as traced constants (same shapes, different
            # program — the axon cache can't tell them apart by name alone)
            salt = (repr(model), self.target_size, self.skip_clicks,
                    self.expansion_ratio, self.min_crop_size,
                    self.recompute_thresh_iou, self.prob_thresh,
                    self.net_clicks_limit, self.with_flip)
            self._compiled[idx] = (
                jax.jit(stamped(functools.partial(self._click_step_fn, model),
                                salt)),
                jax.jit(stamped(functools.partial(self._trunk_step_fn, model),
                                salt)),
                jax.jit(
                    stamped(functools.partial(self._cached_click_step_fn,
                                              model), salt)
                ),
                cache_backbone,
            )
        (self._step, self._trunk_fn, self._cached_step,
         self.cache_backbone) = self._compiled[idx]
        self._active_slot = idx
        self._trunk_cache = None  # features come from a different net now

    # ------------------------------------------------------------------
    # compiled step
    # ------------------------------------------------------------------

    def _click_step_fn(self, model, params, image_pad, prev_pad, roi, points):
        """image_pad [1,Hp,Wp,3] f32 in [0,1]; prev_pad [1,Hp,Wp,1];
        roi int32 [4]; points [1, 2N, 3] full-frame coords."""
        crop, pts, valid = self._crop_and_points(image_pad, prev_pad, roi,
                                                 points)
        if self.with_flip:
            crop2, pts2 = self._flip_pair(crop, pts, valid)
            logits = model.apply({"params": params}, crop2, pts2)["instances"]
            logits = 0.5 * (logits[:1] + logits[1:, :, ::-1])
        else:
            logits = model.apply({"params": params}, crop, pts)["instances"]

        probs = jax.nn.sigmoid(logits)
        return inverse_paste(probs, roi, prev_pad)

    def _crop_and_points(self, image_pad, prev_pad, roi, points):
        """Shared crop + click-remap prologue of the click step
        (reference: zoom_in.py:181-193)."""
        oh, ow = self.target_size
        inp = image_pad
        if self.with_prev_mask:
            inp = jnp.concatenate([image_pad, prev_pad], axis=-1)
        crop = crop_resize(inp, roi, (oh, ow))

        rmin, rmax, cmin, cmax = [roi[i].astype(jnp.float32) for i in range(4)]
        rh = rmax - rmin + 1.0
        rw = cmax - cmin + 1.0
        yxi = points.astype(jnp.float32)
        valid = jnp.max(yxi[..., :2], axis=-1) >= 0
        new_y = oh * (yxi[..., 0] - rmin) / rh
        new_x = ow * (yxi[..., 1] - cmin) / rw
        pts = jnp.stack([new_y, new_x, yxi[..., 2]], axis=-1)
        pts = jnp.where(valid[..., None], pts, -1.0)
        return crop, pts, valid

    def _flip_pair(self, crop, pts, valid):
        """Batch-double with a width flip; flipped click x' = W - x - 1
        (reference: transforms/flip.py:12-45). THE flip convention shared by
        the plain and cached-trunk click steps."""
        ow = self.target_size[1]
        crop2 = jnp.concatenate([crop, crop[:, :, ::-1]], axis=0)
        fx = ow - pts[..., 1] - 1.0
        pts_f = jnp.stack([pts[..., 0], fx, pts[..., 2]], axis=-1)
        pts_f = jnp.where(valid[..., None], pts_f, -1.0)
        return crop2, jnp.concatenate([pts, pts_f], axis=0)

    def _trunk_step_fn(self, model, params, image_pad, prev_pad, roi):
        """Backbone trunk on the ROI crop (and its flip), click-independent."""
        oh, ow = self.target_size
        inp = image_pad
        if self.with_prev_mask:
            inp = jnp.concatenate([image_pad, prev_pad], axis=-1)
        crop = crop_resize(inp, roi, (oh, ow))
        if self.with_flip:
            crop = jnp.concatenate([crop, crop[:, :, ::-1]], axis=0)
        return model.apply({"params": params}, crop,
                           method=model.compute_backbone_trunk)

    def _cached_click_step_fn(self, model, params, image_pad, prev_pad, roi,
                              points, trunk):
        crop, pts, valid = self._crop_and_points(image_pad, prev_pad, roi,
                                                 points)
        if self.with_flip:
            crop2, pts2 = self._flip_pair(crop, pts, valid)
            logits = model.apply(
                {"params": params}, crop2, pts2, trunk,
                method=model.forward_with_cached_trunk,
            )["instances"]
            logits = 0.5 * (logits[:1] + logits[1:, :, ::-1])
        else:
            logits = model.apply(
                {"params": params}, crop, pts, trunk,
                method=model.forward_with_cached_trunk,
            )["instances"]
        probs = jax.nn.sigmoid(logits)
        return inverse_paste(probs, roi, prev_pad)

    # ------------------------------------------------------------------
    # host-side protocol
    # ------------------------------------------------------------------

    def set_input_image(self, image: np.ndarray) -> None:
        """image: [H, W, 3] uint8 or float in [0, 1]."""
        if image.dtype == np.uint8:
            image = image.astype(np.float32) / 255.0
        h, w = image.shape[:2]
        hp, wp = _bucket(h), _bucket(w)
        pad = np.zeros((1, hp, wp, 3), dtype=np.float32)
        pad[0, :h, :w] = image
        self.original_image = jnp.asarray(pad)
        self.image_hw = (h, w)
        self.pad_hw = (hp, wp)
        self.prev_prediction = np.zeros((h, w), dtype=np.float32)
        self._prev_probs_dev = jnp.zeros((1, hp, wp, 1), dtype=jnp.float32)
        self._object_roi = None
        self._roi_version += 1

    def _compute_roi(self, clicks_list: List[Click]) -> Bbox:
        """ZoomIn ROI state machine (reference: zoom_in.py:51-97)."""
        h, w = self.image_hw
        full: Bbox = (0, h - 1, 0, w - 1)
        if len(clicks_list) <= max(self.skip_clicks, 0) and self.skip_clicks >= 0:
            return full

        current = None
        pred_mask = self.prev_prediction > self.prob_thresh
        if pred_mask.any():
            pm = pred_mask.copy()
            for click in clicks_list:
                if click.is_positive:
                    pm[int(click.coords[0]), int(click.coords[1])] = True
            bbox = get_bbox_from_mask(pm)
            bbox = expand_bbox(bbox, self.expansion_ratio, self.min_crop_size)
            current = clamp_bbox(bbox, 0, h - 1, 0, w - 1)

        if current is None:
            if self.skip_clicks >= 0:
                return full
            current = full

        update = self._object_roi is None
        if not update and not _clicks_inside(self._object_roi, clicks_list):
            update = True
        if not update and (
            get_bbox_iou(current, self._object_roi) < self.recompute_thresh_iou
        ):
            update = True
        if update:
            self._object_roi = current
            self._roi_version += 1
        return self._object_roi

    def get_points_nd(self, clicks_list: List[Click]) -> np.ndarray:
        """Pad clicks into the fixed [1, 2N, 3] buffer, positives first
        (reference: base_predictor.py:194-225)."""
        n = self.net_clicks_limit
        points = np.full((1, 2 * n, 3), -1.0, dtype=np.float32)
        _pack_clicks_row(points, 0, clicks_list, n)
        return points

    def get_prediction(self, clicker: Clicker, prev_mask=None) -> np.ndarray:
        clicks_list = clicker.get_clicks()
        if len(self._slots) > 1:
            # click k is served by ensemble member min(k, last)
            # (reference: base_predictor.py:72-81)
            offset = getattr(clicker, "click_indx_offset", 0)
            self._activate_slot(
                min(offset + len(clicks_list), len(self._slots)) - 1
            )
        # the ROI machine sees the FULL click list (the reference passes the
        # untruncated list to its transform chain, base_predictor.py:88);
        # only the model's point tensor truncates to net_clicks_limit
        # (get_points_nd, base_predictor.py:204-209)
        roi = self._compute_roi(clicks_list)
        points = self.get_points_nd(clicks_list)

        h, w = self.image_hw
        hp, wp = self.pad_hw
        if prev_mask is None:
            # the previous step's output already lives on device — no re-upload
            prev_dev = self._prev_probs_dev
        else:
            prev_pad = np.zeros((1, hp, wp, 1), dtype=np.float32)
            prev_pad[0, :h, :w, 0] = np.asarray(prev_mask).reshape(h, w)
            prev_dev = jnp.asarray(prev_pad)

        roi_arr = jnp.asarray(np.asarray(roi, dtype=np.int32))
        if self.cache_backbone:
            # keyed by (state epoch, ROI VALUE): _compute_roi's skip_clicks
            # early-exits return the full frame without bumping the version,
            # so a version-only key would reuse an object-ROI trunk for
            # full-frame geometry (garbage probabilities)
            key = (self._roi_version, tuple(int(v) for v in roi))
            if self._trunk_cache is None or self._trunk_cache[0] != key:
                trunk = self._trunk_fn(self.params, self.original_image,
                                       prev_dev, roi_arr)
                self._trunk_cache = (key, trunk)
            probs_pad = self._cached_step(
                self.params, self.original_image, prev_dev, roi_arr,
                jnp.asarray(points), self._trunk_cache[1],
            )
        else:
            probs_pad = self._step(
                self.params,
                self.original_image,
                prev_dev,
                roi_arr,
                jnp.asarray(points),
            )
        self._prev_probs_dev = probs_pad
        probs = np.asarray(probs_pad)[0, :h, :w, 0]
        self.prev_prediction = probs
        return probs

    def get_lowres_highres_feats(self, clicker: Clicker):
        """Feature-probe path (reference: base_predictor.py:110-147)."""
        clicks_list = clicker.get_clicks()
        roi = self._compute_roi(clicks_list)
        points = self.get_points_nd(clicks_list)
        h, w = self.image_hw
        hp, wp = self.pad_hw
        prev_pad = np.zeros((1, hp, wp, 1), dtype=np.float32)
        prev_pad[0, :h, :w, 0] = self.prev_prediction

        oh, ow = self.target_size
        inp = self.original_image
        if self.with_prev_mask:
            inp = jnp.concatenate([inp, jnp.asarray(prev_pad)], axis=-1)
        roi_arr = jnp.asarray(np.asarray(roi, dtype=np.int32))
        crop = crop_resize(inp, roi_arr, (oh, ow))

        rmin, rmax, cmin, cmax = roi
        pts = points.copy()
        valid = pts[..., :2].max(-1) >= 0
        pts[..., 0] = np.where(valid, oh * (pts[..., 0] - rmin) / (rmax - rmin + 1), -1)
        pts[..., 1] = np.where(valid, ow * (pts[..., 1] - cmin) / (cmax - cmin + 1), -1)

        return self.model.apply(
            {"params": self.params},
            crop,
            jnp.asarray(pts),
            method=self.model.get_lowres_highres_feats,
        )

    # -- state protocol for the demo's undo (reference: base_predictor.py:227-235)

    def get_states(self) -> Dict:
        return {
            "object_roi": self._object_roi,
            "prev_prediction": None
            if self.prev_prediction is None
            else self.prev_prediction.copy(),
        }

    def set_states(self, states: Dict) -> None:
        self._object_roi = states["object_roi"]
        self.prev_prediction = states["prev_prediction"]
        self._roi_version += 1
        if self.prev_prediction is not None and self.pad_hw != (0, 0):
            h, w = self.image_hw
            hp, wp = self.pad_hw
            prev_pad = np.zeros((1, hp, wp, 1), dtype=np.float32)
            prev_pad[0, :h, :w, 0] = self.prev_prediction
            self._prev_probs_dev = jnp.asarray(prev_pad)


def _clicks_inside(object_roi: Bbox, clicks_list: List[Click]) -> bool:
    """reference: zoom_in.py:243-253 (note the half-open upper bound)."""
    for click in clicks_list:
        if click.is_positive:
            if not (object_roi[0] <= click.coords[0] < object_roi[1]):
                return False
            if not (object_roi[2] <= click.coords[1] < object_roi[3]):
                return False
    return True


class TransformChainPredictor:
    """Generic host-protocol predictor over an arbitrary invertible transform
    chain (reference: core/inference/predictors/base_predictor.py:67-108 +
    transforms/base_transform.py).

    Where :class:`TPUPredictor` compiles its fixed ZoomIn+flip pipeline into
    one program, this variant applies the composable transform objects
    (inference/transforms.py — ZoomIn, AddHorizontalFlip, LimitLongestSide,
    Crops, SigmoidForPred) on the host and runs one compiled forward per crop
    batch — the path for protocols the fused predictor does not cover (e.g.
    tiled Crops evaluation of very large frames).
    """

    def __init__(self, model, params, transforms: Optional[List] = None,
                 net_clicks_limit: int = 20) -> None:
        self.model = model
        self.params = params
        self.transforms = transforms or []
        self.net_clicks_limit = net_clicks_limit
        self.with_prev_mask = getattr(model, "with_prev_mask", False)
        self.original_image: Optional[np.ndarray] = None
        self.prev_prediction: Optional[np.ndarray] = None
        self._forward = jax.jit(stamped(
            lambda p, x, pts: model.apply({"params": p}, x, pts)["instances"],
            repr(model),
        ))

    def set_input_image(self, image: np.ndarray) -> None:
        if image.dtype == np.uint8:
            image = image.astype(np.float32) / 255.0
        self.original_image = image[None]  # [1, H, W, 3]
        self.prev_prediction = np.zeros((1, *image.shape[:2], 1), np.float32)
        for t in self.transforms:
            t.reset()

    def _points_nd(self, clicks_lists: List[List[Click]]) -> np.ndarray:
        n = self.net_clicks_limit
        points = np.full((len(clicks_lists), 2 * n, 3), -1.0, dtype=np.float32)
        for bi, clicks in enumerate(clicks_lists):
            _pack_clicks_row(points, bi, clicks, n)
        return points

    def get_prediction(self, clicker: Clicker, prev_mask=None) -> np.ndarray:
        clicks_list = clicker.get_clicks()
        x = self.original_image
        if self.with_prev_mask:
            prev = self.prev_prediction if prev_mask is None else prev_mask
            x = np.concatenate([x, np.asarray(prev, np.float32)], axis=-1)

        # thread one click list per batch element through the chain; fan-out
        # transforms (Crops, flip) grow both together (ref base_predictor:99)
        clicks_lists = [clicks_list]
        x = np.asarray(x)
        for t in self.transforms:
            x, clicks_lists = t.transform(x, clicks_lists)
            x = np.asarray(x)

        points = self._points_nd(clicks_lists)
        logits = np.asarray(self._forward(self.params, jnp.asarray(x),
                                          jnp.asarray(points)))
        prediction = logits
        for t in reversed(self.transforms):
            prediction = t.inv_transform(prediction)

        probs = np.asarray(prediction)[0, :, :, 0]
        self.prev_prediction = np.asarray(prediction[:1], np.float32)
        return probs

    # demo/undo state protocol
    def get_states(self) -> Dict:
        return {
            "transform_states": [t.get_state() for t in self.transforms],
            "prev_prediction": None if self.prev_prediction is None
            else self.prev_prediction.copy(),
        }

    def set_states(self, states: Dict) -> None:
        for t, s in zip(self.transforms, states["transform_states"]):
            t.set_state(s)
        self.prev_prediction = states["prev_prediction"]


class CropsPredictor:
    """Tiled sliding-window TTA with the whole per-click pipeline compiled
    into ONE device program (reference: core/inference/transforms/crops.py:
    14-117 run through base_predictor.py:67-108, which slices / stitches in
    numpy and dispatches per transform stage).

    Per click: static-offset tiling of the (image ⊕ prev-mask) frame,
    optional flip-TTA batch doubling, model forward over all tiles, logit
    flip-averaging, sigmoid, and count-averaged stitching back to the full
    frame — all inside one jitted function with shapes fixed per (H, W).
    Only the per-tile click shifting (a few numpy adds over ≤20 clicks)
    stays on host, where the clicker lives anyway.

    Offsets, tile counts and the stitch-divisor image replicate the host
    ``transforms.Crops`` exactly (same ``get_offsets``), so trajectories
    match ``TransformChainPredictor([Crops, SigmoidForPred, Flip])`` —
    pinned by tests/test_eval_transforms.py."""

    def __init__(self, model, params, crop_size=(320, 480),
                 min_overlap: float = 0.2, with_flip: bool = True,
                 net_clicks_limit: int = 20) -> None:
        self.model = model
        self.params = params
        self.crop_height, self.crop_width = crop_size
        self.min_overlap = min_overlap
        self.with_flip = with_flip
        self.net_clicks_limit = net_clicks_limit
        self.with_prev_mask = getattr(model, "with_prev_mask", False)
        self.original_image: Optional[np.ndarray] = None
        self.prev_prediction: Optional[np.ndarray] = None
        self._offsets: List[Tuple[int, int]] = []
        self._step = None
        # one compiled program per frame geometry, reused across images
        # (a fixed-size dataset compiles exactly once)
        self._step_cache: Dict[Tuple, object] = {}

    def set_input_image(self, image: np.ndarray) -> None:
        from isegprobe_tpu.inference.transforms import get_offsets

        if image.dtype == np.uint8:
            image = image.astype(np.float32) / 255.0
        h, w = image.shape[:2]
        self.original_image = np.asarray(image, np.float32)
        self.prev_prediction = np.zeros((h, w, 1), np.float32)
        if h < self.crop_height or w < self.crop_width:
            # reference Crops: images smaller than the tile run untiled
            ch, cw, y_off, x_off = h, w, [0], [0]
        else:
            ch, cw = self.crop_height, self.crop_width
            y_off = get_offsets(h, ch, self.min_overlap)
            x_off = get_offsets(w, cw, self.min_overlap)
        self._offsets = [(dy, dx) for dy in y_off for dx in x_off]
        # the compiled step bakes the offset positions (which depend on
        # min_overlap, not just the geometry) — key by them too, or a
        # min_overlap change between images reuses a step whose baked tiles
        # disagree with the host-side click shifting
        key = (h, w, ch, cw, tuple(self._offsets))
        if key not in self._step_cache:
            counts = np.zeros((h, w), np.float32)
            for dy, dx in self._offsets:
                counts[dy:dy + ch, dx:dx + cw] += 1.0
            self._step_cache[key] = jax.jit(stamped(
                functools.partial(self._compiled_step, tuple(self._offsets),
                                  (ch, cw), jnp.asarray(counts)),
                # the tile offsets are baked constants: two min_overlap
                # settings can tile the same geometry into the same COUNT of
                # tiles (identical shapes) at different positions — salt the
                # positions themselves, not just the geometry
                (repr(self.model), "crops", h, w, ch, cw, self.with_flip,
                 self.net_clicks_limit, tuple(self._offsets)),
            ))
        self._step = self._step_cache[key]

    def _compiled_step(self, offsets, tile_hw, counts, params, img_prev,
                       points):
        """One click: tile → (flip) → forward → merge → stitch. Static
        offsets are baked into the program (one compile per frame size)."""
        ch, cw = tile_hw
        tiles = jnp.stack(
            [jax.lax.slice(img_prev, (dy, dx, 0),
                           (dy + ch, dx + cw, img_prev.shape[-1]))
             for dy, dx in offsets])              # [T, ch, cw, C]
        t = len(offsets)
        if self.with_flip:
            real = points[..., 2:3] >= 0
            flipped = jnp.where(
                real,
                jnp.stack([points[..., 0], cw - 1 - points[..., 1],
                           points[..., 2]], axis=-1),
                points)
            tiles = jnp.concatenate([tiles, tiles[:, :, ::-1]], axis=0)
            points = jnp.concatenate([points, flipped], axis=0)
        logits = self.model.apply({"params": params}, tiles,
                                  points)["instances"]
        logits = logits.astype(jnp.float32)
        if self.with_flip:
            logits = 0.5 * (logits[:t] + logits[t:, :, ::-1])
        probs = jax.nn.sigmoid(logits)[..., 0]     # [T, ch, cw]
        out = jnp.zeros(counts.shape, jnp.float32)
        for i, (dy, dx) in enumerate(offsets):
            out = out.at[dy:dy + ch, dx:dx + cw].add(probs[i])
        return out / counts

    def _points_nd(self, clicks_list: List[Click]) -> np.ndarray:
        """Per-tile padded click tensors, coords shifted into tile frames
        (reference: crops.py:60-75 + base_predictor.py:194-225)."""
        n = self.net_clicks_limit
        t = len(self._offsets)
        points = np.full((t, 2 * n, 3), -1.0, dtype=np.float32)
        for ti, (dy, dx) in enumerate(self._offsets):
            _pack_clicks_row(points, ti, clicks_list, n, dy=dy, dx=dx)
        return points

    def get_prediction(self, clicker: Clicker, prev_mask=None) -> np.ndarray:
        clicks_list = clicker.get_clicks()
        x = self.original_image
        if self.with_prev_mask:
            prev = self.prev_prediction if prev_mask is None else np.asarray(
                prev_mask, np.float32).reshape(*x.shape[:2], 1)
            x = np.concatenate([x, prev], axis=-1)
        probs = np.asarray(self._step(
            self.params, jnp.asarray(x),
            jnp.asarray(self._points_nd(clicks_list))))
        self.prev_prediction = probs[..., None].astype(np.float32)
        return probs

    # demo/undo state protocol (transform state is static per image)
    def get_states(self) -> Dict:
        return {"prev_prediction": None if self.prev_prediction is None
                else self.prev_prediction.copy()}

    def set_states(self, states: Dict) -> None:
        self.prev_prediction = states["prev_prediction"]
