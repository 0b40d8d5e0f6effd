"""Fully-compiled RITM adaptive-ZoomIn NoC evaluation (VERDICT r3 #6).

The reference's ``eval_ritm`` + ``eval_mode=cvpr`` protocol (reference:
core/inference/utils.py:292-295 -> transforms/zoom_in.py with a SCALAR
target, skip_clicks=1) crops to the predicted-object ROI and resizes it to
``(round(h*s), round(w*s))`` with ``s = T/max(h, w)`` — data-dependent model
input shapes that round 3 could only serve through the host per-click path
(one compiled program per shape). This module compiles the WHOLE protocol
anyway, the static-shape way:

  * the model runs on a fixed canvas whose top-left per-lane traced
    (vh, vw) rect is valid (``iSegProbeModel.forward_masked`` — masked
    attention, dynamic pos-embed interpolation, masked head convs; exact
    vs the true-size forward, tests/test_adaptive_eval.py);
  * crop/resize/click-remap/inverse-paste use dynamic-extent sampling
    (ops/sample.py crop_resize_dyn / inverse_paste_dyn) with
    integer-exact size rounding (ops/dynamic_resize.round_half_even_div,
    banker's ties like the host float64 round);
  * the ZoomIn state machine replicates the host transform EXACTLY —
    including its quirk that a click with no candidate ROI (clicks <=
    skip_clicks, or an empty prediction) feeds the model the full-frame
    image but the inverse STILL pastes through a previously-set
    ``_object_roi`` (reference zoom_in.py:59-75 + 106-130; host twin
    inference/transforms.py:117-168).

Per-lane trajectories are pinned against the host clicker + predictor +
ZoomIn path in tests/test_adaptive_eval.py.
"""

from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np

from isegprobe_tpu.inference.device_eval import (
    _bbox_from_mask,
    _bbox_iou,
    _expand_clamp,
)
from isegprobe_tpu.ops.dynamic_resize import round_half_even_div
from isegprobe_tpu.ops.edt import next_click_from_error
from isegprobe_tpu.ops.sample import crop_resize_dyn, inverse_paste_dyn
from isegprobe_tpu.utils.misc import stamped


def _ceil_to(x: int, m: int) -> int:
    return -(-x // m) * m


def _backbone_patch(model) -> int:
    """Patch size from the (unbound) model config — the canvas must tile it."""
    bcfg = getattr(model, "backbone_cfg", {}) or {}
    btype = str(bcfg.get("type", "dinov2")).lower()
    bparams = bcfg.get("params") or {}
    if btype == "vit":
        return int(bparams.get("patch_size", 16))
    if btype == "mask_clip":
        from isegprobe_tpu.models.featurizers.maskclip import CLIP_ARCHS

        return int(CLIP_ARCHS[bparams.get("model_name",
                                          "ViT-B/16")]["patch_size"])
    return 14  # dinov2 family


def make_adaptive_evaluator(
    model,
    target_size: int = 400,
    frame_hw: Tuple[int, int] = (448, 448),
    max_clicks: int = 20,
    net_clicks_limit: int = 20,
    pred_thr: float = 0.49,
    target_iou: float = 0.90,
    min_clicks: int = 1,
    with_flip: bool = True,
    skip_clicks: int = 1,
    roi_prob_thresh: float = 0.50,
    expansion_ratio: float = 1.4,
    min_crop_size: int = 200,
    recompute_thresh_iou: float = 0.5,
    batch_size: int = 1,
    group_api: bool = False,
):
    """Build a jitted ``run(params, images, gts, valid_hws)`` for the
    adaptive protocol. ``target_size``: the SCALAR RITM target (600 for
    DAVIS, else 400 — reference utils.py:292-295). ``frame_hw``: the static
    padded frame shape the caller ships ([B, hp, wp, 3] uint8/f32). The
    model canvas is ``ceil14(max(frame, target))`` per axis. Returns
    (ious [B, max_clicks], n [B]).

    ``group_api``: windowed continuous batching — the adaptive protocol
    through the same on-device job queue as the fixed-mode evaluator
    (device_eval.make_windowed_group_evaluator): finished lanes refill from
    staged job frames instead of idling until the batch's slowest sample,
    with lane state carried across window dispatches. Returns a
    ``_GroupEvaluator`` for ``evaluate_dataset_group``.
    """
    if skip_clicks < 0:
        raise NotImplementedError(
            "skip_clicks < 0 is the fixed-crop protocol — use "
            "make_device_evaluator")
    if group_api and batch_size <= 1:
        raise ValueError("group_api requires batch_size > 1")
    hp, wp = frame_hw
    patch = _backbone_patch(model)
    ch = _ceil_to(max(hp, target_size), patch)
    cw = _ceil_to(max(wp, target_size), patch)
    nmax = net_clicks_limit
    with_prev = getattr(model, "with_prev_mask", False)
    nflip = 2 if with_flip else 1
    tgt = jnp.asarray(target_size, jnp.int32)

    cfg_salt = (
        "adaptive", repr(model), target_size, frame_hw, max_clicks,
        net_clicks_limit, pred_thr, target_iou, min_clicks, with_flip,
        skip_clicks, roi_prob_thresh, expansion_ratio, min_crop_size,
        recompute_thresh_iou, batch_size,
    )

    def _norm_img(image_hw3):
        if jnp.issubdtype(image_hw3.dtype, jnp.integer):
            return image_hw3.astype(jnp.float32) / 255.0
        return image_hw3

    def _in_valid(hh, ww, valid_hw):
        rr = jnp.arange(hh)[:, None]
        cc = jnp.arange(ww)[None, :]
        return (rr < valid_hw[0]) & (cc < valid_hw[1])

    def _init_lane(image_hw3, gt_pad, valid_hw):
        gt = gt_pad == 1
        not_ignore = (gt_pad != -1) & _in_valid(hp, wp, valid_hw)
        full_roi = jnp.asarray([0, 0, 0, 0], jnp.int32).at[1].set(
            valid_hw[0] - 1).at[3].set(valid_hw[1] - 1)
        return dict(
            image=image_hw3, gt=gt, not_ignore=not_ignore,
            valid_hw=valid_hw, full_roi=full_roi,
            prev=jnp.zeros((hp, wp, 1), jnp.float32),
            not_clicked=jnp.ones((hp, wp), jnp.bool_),
            pos_pts=jnp.full((nmax, 3), -1.0, jnp.float32),
            neg_pts=jnp.full((nmax, 3), -1.0, jnp.float32),
            n_pos=jnp.asarray(0, jnp.int32),
            n_neg=jnp.asarray(0, jnp.int32),
            pos_mask=jnp.zeros((hp, wp), jnp.bool_),
            pos_ymin=jnp.asarray(jnp.inf, jnp.float32),
            pos_ymax=jnp.asarray(-jnp.inf, jnp.float32),
            pos_xmin=jnp.asarray(jnp.inf, jnp.float32),
            pos_xmax=jnp.asarray(-jnp.inf, jnp.float32),
            roi=full_roi,
            roi_set=jnp.asarray(False),
            ious=jnp.zeros((max_clicks,), jnp.float32),
            n=jnp.asarray(0, jnp.int32),
            done=jnp.asarray(False),
        )

    def _lane_select(st):
        """Clicker + bookkeeping + the ADAPTIVE ZoomIn state machine.

        Returns (updates, points, geom) where geom carries the per-lane
        crop decision: (crop_roi, out_hw, paste_roi, applied)."""
        h_valid = st["valid_hw"][0].astype(jnp.float32)
        w_valid = st["valid_hw"][1].astype(jnp.float32)
        prev2d = st["prev"][:, :, 0]
        pred_mask = prev2d > pred_thr

        is_pos, cy, cx = next_click_from_error(
            st["gt"], pred_mask, st["not_clicked"], st["not_ignore"]
        )
        cyf = cy.astype(jnp.float32)
        cxf = cx.astype(jnp.float32)
        idx = (st["n"]).astype(jnp.float32)
        keep = st["n"] < nmax
        pos_pts = jnp.where(
            is_pos & keep,
            st["pos_pts"].at[st["n_pos"]].set(jnp.stack([cyf, cxf, idx])),
            st["pos_pts"],
        )
        neg_pts = jnp.where(
            is_pos | ~keep,
            st["neg_pts"],
            st["neg_pts"].at[st["n_neg"]].set(jnp.stack([cyf, cxf, idx])),
        )
        n_pos = st["n_pos"] + (is_pos & keep).astype(jnp.int32)
        n_neg = st["n_neg"] + ((~is_pos) & keep).astype(jnp.int32)
        not_clicked = st["not_clicked"].at[cy, cx].set(False)
        pos_mask = st["pos_mask"].at[cy, cx].max(is_pos)
        pos_ymin = jnp.where(is_pos, jnp.minimum(st["pos_ymin"], cyf),
                             st["pos_ymin"])
        pos_ymax = jnp.where(is_pos, jnp.maximum(st["pos_ymax"], cyf),
                             st["pos_ymax"])
        pos_xmin = jnp.where(is_pos, jnp.minimum(st["pos_xmin"], cxf),
                             st["pos_xmin"])
        pos_xmax = jnp.where(is_pos, jnp.maximum(st["pos_xmax"], cxf),
                             st["pos_xmax"])

        # --- adaptive ZoomIn decision (reference zoom_in.py:59-97) -------
        # prev prediction exists only after click 1 (prev_probs None before).
        # The candidate mask uses the ZoomIn transform's OWN prob_thresh
        # (0.50 default), distinct from the clicker/stopping pred_thr.
        has_prev = st["n"] > 0
        roi_mask_cand = ((prev2d > roi_prob_thresh)
                         & _in_valid(hp, wp, st["valid_hw"]))
        has_mask = has_prev & jnp.any(roi_mask_cand)
        roi_mask = roi_mask_cand | pos_mask
        cand = _expand_clamp(_bbox_from_mask(roi_mask), expansion_ratio,
                             min_crop_size, h_valid, w_valid)
        cand = jnp.stack(cand).astype(jnp.int32)

        n_clicks_total = st["n"] + 1  # list length INCLUDING this click
        applied = (n_clicks_total > skip_clicks) & has_mask

        cur = st["roi"].astype(jnp.float32)
        has_pos = jnp.isfinite(pos_ymin)
        clicks_inside = (
            (pos_ymin >= cur[0]) & (pos_ymax < cur[1])
            & (pos_xmin >= cur[2]) & (pos_xmax < cur[3])
        ) | ~has_pos
        iou_ok = _bbox_iou(cand.astype(jnp.float32), cur) >= recompute_thresh_iou
        update = applied & (
            (~st["roi_set"]) | (~clicks_inside) | (~iou_ok))
        roi = jnp.where(update, cand, st["roi"])
        roi_set = st["roi_set"] | applied

        # --- crop geometry ----------------------------------------------
        # applied: crop _object_roi, resize to round(rh*s), round(rw*s),
        #          s = T/max(rh, rw) (reference get_roi_image_nd:228-243)
        # not applied: the model sees the full valid frame at native size
        crop_roi = jnp.where(applied, roi, st["full_roi"])
        rh = crop_roi[1] - crop_roi[0] + 1
        rw = crop_roi[3] - crop_roi[2] + 1
        m = jnp.maximum(rh, rw)
        nh = jnp.where(applied, round_half_even_div(rh * tgt, m),
                       st["valid_hw"][0])
        nw = jnp.where(applied, round_half_even_div(rw * tgt, m),
                       st["valid_hw"][1])
        out_hw = jnp.stack([nh, nw])
        # the reference QUIRK: inverse always pastes through _object_roi
        # once set — even on a click whose forward was full-frame
        paste_roi = jnp.where(roi_set, roi, st["full_roi"])

        points = jnp.concatenate([pos_pts, neg_pts], axis=0)
        sel = dict(
            pos_pts=pos_pts, neg_pts=neg_pts, n_pos=n_pos, n_neg=n_neg,
            not_clicked=not_clicked, pos_mask=pos_mask,
            pos_ymin=pos_ymin, pos_ymax=pos_ymax,
            pos_xmin=pos_xmin, pos_xmax=pos_xmax,
            roi=roi, roi_set=roi_set,
        )
        geom = dict(crop_roi=crop_roi, out_hw=out_hw, paste_roi=paste_roi,
                    applied=applied)
        return sel, points, geom

    def _remap_points(points, crop_roi, out_hw, applied):
        """reference _transform_clicks (zoom_in.py:200-210) — only when a
        transform is applied this click."""
        rminf = crop_roi[0].astype(jnp.float32)
        cminf = crop_roi[2].astype(jnp.float32)
        rh = (crop_roi[1] - crop_roi[0] + 1).astype(jnp.float32)
        rw = (crop_roi[3] - crop_roi[2] + 1).astype(jnp.float32)
        nh = out_hw[0].astype(jnp.float32)
        nw = out_hw[1].astype(jnp.float32)
        yxi = points.astype(jnp.float32)
        valid = jnp.max(yxi[..., :2], axis=-1) >= 0
        mapped = jnp.stack(
            [nh * (yxi[..., 0] - rminf) / rh,
             nw * (yxi[..., 1] - cminf) / rw,
             yxi[..., 2]], axis=-1)
        pts = jnp.where(applied, mapped, yxi)
        return jnp.where(valid[..., None], pts, -1.0), valid

    def _lane_crop_pts(image, prev, geom, points):
        """[nflip, ch, cw, C] canvas crops + remapped (and flipped) points."""
        crop_roi, out_hw = geom["crop_roi"], geom["out_hw"]
        crop = crop_resize_dyn(_norm_img(image)[None], crop_roi, out_hw,
                               (ch, cw))[0]
        if with_prev:
            crop = jnp.concatenate(
                [crop, crop_resize_dyn(prev[None], crop_roi, out_hw,
                                       (ch, cw))[0]], axis=-1)
        pts, valid = _remap_points(points, crop_roi, out_hw, geom["applied"])
        nw = out_hw[1]
        if with_flip:
            # flip within the valid rect: mirror the canvas then roll the
            # valid columns back to the left edge
            flipped = jnp.roll(crop[:, ::-1], nw - cw, axis=1)
            crop2 = jnp.stack([crop, flipped], axis=0)
            fx = nw.astype(jnp.float32) - pts[..., 1] - 1.0
            pts_f = jnp.where(
                valid[..., None],
                jnp.stack([pts[..., 0], fx, pts[..., 2]], axis=-1),
                -1.0,
            )
            return crop2, jnp.stack([pts, pts_f], axis=0)
        return crop[None], pts[None]

    def _merge_flip(logits, b, out_hws):
        logits = logits.reshape(b, nflip, ch, cw, 1)
        if with_flip:
            def unflip(l, nw):
                return jnp.roll(l, cw - nw, axis=1)[:, ::-1]
            l0 = logits[:, 0]
            l1 = jax.vmap(unflip)(logits[:, 1], out_hws[:, 1])
            logits = 0.5 * (l0 + l1)
        else:
            logits = logits[:, 0]
        return jax.nn.sigmoid(logits)

    def _batched_forward(params, crops, ptss, out_hws):
        b = crops.shape[0]
        vhw = jnp.repeat(out_hws, nflip, axis=0)
        logits = model.apply(
            {"params": params},
            crops.reshape(b * nflip, ch, cw, crops.shape[-1]),
            ptss.reshape(b * nflip, 2 * nmax, 3),
            vhw,
            method=type(model).forward_masked,
        )["instances"]
        return _merge_flip(logits, b, out_hws)

    def _lane_finish(st, geom, probs_lane):
        prev = inverse_paste_dyn(probs_lane[None], geom["out_hw"],
                                 geom["paste_roi"], st["prev"][None])[0]
        new_mask = prev[:, :, 0] > pred_thr
        inter = jnp.sum(new_mask & st["gt"] & st["not_ignore"])
        union = jnp.sum((new_mask | st["gt"]) & st["not_ignore"])
        iou = inter / jnp.maximum(union, 1)
        ious = st["ious"].at[st["n"]].set(iou)
        return dict(
            prev=prev, ious=ious, n=st["n"] + 1,
            done=(iou >= target_iou) & (st["n"] + 1 >= min_clicks),
        )

    def _cond(st):
        return jnp.any((~st["done"]) & (st["n"] < max_clicks))

    def _body(params, st):
        active = (~st["done"]) & (st["n"] < max_clicks)
        sel, points, geom = jax.vmap(_lane_select)(st)
        crops, ptss = jax.vmap(_lane_crop_pts)(
            st["image"], st["prev"], geom, points)
        probs = _batched_forward(params, crops, ptss, geom["out_hw"])
        fin = jax.vmap(_lane_finish)(st, geom, probs)
        new = {**st, **sel, **fin}
        out = dict(new)
        for k in ("ious", "n", "done"):
            v, old = new[k], st[k]
            mask = active.reshape((-1,) + (1,) * (v.ndim - 1))
            out[k] = jnp.where(mask, v, old)
        return out

    def run_adaptive(params, images, gts, valid_hws):
        st = jax.vmap(_init_lane)(images, gts, valid_hws)
        st = jax.lax.while_loop(_cond, lambda s: _body(params, s), st)
        return st["ious"], st["n"]

    if group_api:
        from isegprobe_tpu.inference.device_eval import (
            make_windowed_group_evaluator,
        )

        def _init_state(params, imgs, gts, hws):
            del params  # the adaptive protocol caches nothing at init
            return jax.vmap(_init_lane)(imgs, gts, hws)

        return make_windowed_group_evaluator(
            init_state=_init_state,
            init_lane=_init_lane,
            body_fn=_body,
            cond_fn=_cond,
            batch_size=batch_size,
            max_clicks=max_clicks,
            cfg_salt=cfg_salt + ("group",),
        )

    if batch_size == 1:
        def run_one(params, image, gt_pad, valid_hw):
            ious, n = run_adaptive(
                params, image[None], gt_pad[None], valid_hw[None])
            return ious[0], n[0]

        return jax.jit(stamped(run_one, cfg_salt))
    return jax.jit(stamped(run_adaptive, cfg_salt))


def make_adaptive_runner(model, target_size: int, batch_size: int = 1,
                         **protocol_kw):
    """Shape-lazy adaptive evaluator: pads arrive in per-sample (or
    per-chunk) bucketed frame shapes, and the canvas geometry is baked per
    shape — build one compiled evaluator per distinct padded frame, cached.
    Drop-in ``run_fn`` for ``evaluate_dataset_device``."""
    cache: dict = {}

    def run(params, images, gts, hws):
        if images.ndim == 3:
            frame = (images.shape[0], images.shape[1])
        else:
            frame = (images.shape[1], images.shape[2])
        if frame not in cache:
            cache[frame] = make_adaptive_evaluator(
                model, target_size=target_size, frame_hw=frame,
                batch_size=batch_size, **protocol_kw)
        return cache[frame](params, images, gts, hws)

    return run


class _LazyAdaptiveGroup:
    """Shape-lazy windowed-group adaptive evaluator: one compiled group
    evaluator per distinct padded frame shape (the canvas geometry is baked
    per shape), drop-in ``ev`` for ``evaluate_dataset_group`` — every job
    group the host driver forms is same-shape by construction."""

    def __init__(self, model, target_size: int, batch_size: int,
                 protocol_kw: dict):
        self._model = model
        self._target = target_size
        self._kw = dict(protocol_kw)
        self._cache: dict = {}
        self.batch_size = batch_size
        self.max_clicks = int(self._kw.get("max_clicks", 20))

    def _for(self, frame):
        if frame not in self._cache:
            self._cache[frame] = make_adaptive_evaluator(
                self._model, target_size=self._target, frame_hw=frame,
                batch_size=self.batch_size, group_api=True, **self._kw)
        return self._cache[frame]

    def init(self, params, imgs, gts, hws):
        return self._for(tuple(imgs.shape[1:3])).init(params, imgs, gts, hws)

    def run(self, params, st, q, imgs, gts, hws, n_valid, win_base):
        return self._for(tuple(imgs.shape[1:3])).run(
            params, st, q, imgs, gts, hws, n_valid, win_base)


def make_adaptive_group_runner(model, target_size: int, batch_size: int,
                               **protocol_kw):
    """Windowed continuous batching for the adaptive RITM protocol (the
    fixed-mode ``device_refill=true`` counterpart)."""
    return _LazyAdaptiveGroup(model, target_size, batch_size, protocol_kw)
