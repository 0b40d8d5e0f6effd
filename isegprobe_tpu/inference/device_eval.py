"""Fully on-device NoC evaluation: the whole ≤20-click loop as ONE compiled
program per sample (or per batch of samples).

The host protocol (inference/evaluation.py + predictor.py) dispatches one
device program per click and round-trips the probability map for the clicker
and the ZoomIn ROI logic. This module moves everything inside a single
``lax.while_loop`` — clicker EDT (ops/edt.py device kernels), ROI state
machine, crop/forward/flip/paste, IoU and the stopping rule — so per-click
cost collapses to pure compute and the host pays one dispatch + one scalar
sync per SAMPLE (or batch).

Structure: the loop state carries a leading sample axis. Per-lane protocol
steps (clicker, ROI machine, paste, IoU) are ``vmap``-ed over lanes, while the
model forward runs once per click at batch level on the flattened
``[B·flip, H, W, C]`` crop stack — big MXU matmuls instead of per-sample
dispatches. Lanes that hit ``target_iou`` are masked out (their state stops
updating) and the loop exits when every lane is done.

Trunk caching (the north-star restructuring, BASELINE.json): with
late-injection configs (``feats_injection_mode == 'after_backbone'``) the
frozen backbone depends only on the ROI crop — not on clicks or the previous
mask — so successive clicks reuse the cached trunk features and only re-run
the click encoder + upsampler + head (``probe_model.forward_with_cached_trunk``,
parity-tested in tests/test_backbone_cache.py). The recompute decision is a
*batch-level scalar* (``any active lane's ROI changed``) so ``lax.cond``
genuinely skips the backbone: a per-lane cond under ``vmap`` would lower to a
``select`` that executes both branches every click. ROI changes become rare
after the first ~3 clicks, so most clicks skip the trunk entirely — the
reference recomputes the full network every click
(core/inference/predictors/base_predictor.py:67-108).

Protocol equivalence with the reference is by construction: the same decision
rules on the same quantities (see next_click_from_error's decision-parity test
and test_device_eval.py's trajectory-parity tests vs the host path).
"""

from __future__ import annotations

from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from isegprobe_tpu.ops.edt import next_click_from_error
from isegprobe_tpu.ops.sample import crop_resize, inverse_paste
from isegprobe_tpu.utils.misc import stamped


class _GroupEvaluator:
    """Handle for the on-device continuous-batching eval API
    (``make_device_evaluator(..., group_api=True)``), windowed staging
    (round 5 — replaces the round-4 per-chunk ``group_max_jobs`` drain):

    * ``init(params, win_imgs, win_gts, win_hws)`` builds an all-parked lane
      state from the first staged window;
    * ``run(params, st, q, win_imgs, win_gts, win_hws, n_valid, win_base)``
      advances the whole protocol until every job is done OR a lane needs a
      job beyond the staged window — lane state carries ACROSS dispatches,
      so a window switch costs one dispatch boundary, not a straggler drain.
      ``st`` is donated (the big lane buffers alias in place); ``q`` is not
      (the host paces uploads by fetching a scalar from a previous ``q``).
    """

    def __init__(self, run, batch_size, max_clicks, init):
        self.run = run
        self.batch_size = batch_size
        self.max_clicks = max_clicks
        self.init = init


def make_windowed_group_evaluator(
    *,
    init_state,
    init_lane,
    body_fn,
    cond_fn,
    batch_size: int,
    max_clicks: int,
    cfg_salt,
    poison_trunk: bool = False,
):
    """Windowed continuous batching (round 5, VERDICT r4 #4), generic over a
    protocol: the compiled program stages only a WINDOW of job frames —
    bounded HBM by construction (the full-78-job LoftUp staging faulted the
    TPU worker, BASELINE.md) — and the host chains dispatches with the LANE
    STATE CARRIED ACROSS them: when the on-device queue wants a job beyond
    the window, the program raises ``want_refill`` and returns at the next
    click boundary; the next dispatch (its window already uploaded behind
    the running compute) resumes every mid-protocol lane exactly where it
    paused. No straggler drain at window boundaries.

    Protocol closures: ``init_state(params, imgs, gts, hws) -> st`` (batch
    lane state), ``init_lane(img, gt, hw) -> lane state`` (vmapped for
    refills), ``body_fn(params, st) -> st`` (one click for every active
    lane), ``cond_fn(st) -> bool`` (any lane still active).
    ``poison_trunk``: reset refilled lanes' cached-trunk ROI so the next
    click recomputes the trunk (the fixed-mode late-injection cache).
    Used by both the fixed-ZoomIn evaluator (make_device_evaluator
    group_api) and the adaptive RITM evaluator (adaptive_eval group_api).
    """

    def _jobs_in(st, q, want, win_imgs, win_gts, win_hws, n_valid, win_base):
        """Hand out jobs from the staged window to lanes in ``want`` (lane
        order). A lane whose next job lies beyond the window parks (job_id
        stays at the scratch row) and raises ``want_refill``."""
        W = win_imgs.shape[0]
        cand = q["next_job"] + jnp.cumsum(want.astype(jnp.int32)) - 1
        in_sweep = cand < n_valid
        take = want & in_sweep & (cand < win_base + W)
        rel = jnp.clip(cand - win_base, 0, W - 1)
        fresh = jax.vmap(init_lane)(
            jnp.take(win_imgs, rel, axis=0),
            jnp.take(win_gts, rel, axis=0),
            jnp.take(win_hws, rel, axis=0),
        )
        out = dict(st)
        for k, v in fresh.items():
            mask = take.reshape((-1,) + (1,) * (v.ndim - 1))
            out[k] = jnp.where(mask, v, st[k])
        if poison_trunk:
            # poison refilled lanes' cached-trunk ROI so the next click's
            # batch-global predicate recomputes the trunk
            out["trunk_roi"] = jnp.where(take[:, None], -1, out["trunk_roi"])
        q2 = dict(
            q,
            job_id=jnp.where(take, cand, q["job_id"]),
            next_job=q["next_job"] + jnp.sum(take.astype(jnp.int32)),
            want_refill=q["want_refill"] | jnp.any(want & in_sweep & ~take),
        )
        return out, q2

    def run_window(params, st, q, win_imgs, win_gts, win_hws, n_valid,
                   win_base):
        sent = q["out_ious"].shape[0] - 1  # scratch row for idle writes

        def body(carry):
            st, q = carry
            new = body_fn(params, st)
            active = (~st["done"]) & (st["n"] < max_clicks)
            fin = active & (new["done"] | (new["n"] >= max_clicks))
            # results out: finished lanes write their job's row; the rest
            # target the scratch row (duplicate writes collide only there,
            # harmlessly)
            tgt = jnp.where(fin, q["job_id"], sent)
            q2 = dict(
                q,
                out_ious=q["out_ious"].at[tgt].set(new["ious"]),
                out_n=q["out_n"].at[tgt].set(new["n"]),
                job_id=jnp.where(fin, sent, q["job_id"]),
            )
            # The job hand-out is UNCONDITIONAL — a lax.cond around the
            # harvest + the banded-LoftUp slab graph reproducibly FAULTED
            # the TPU worker (round-4 bisection, BASELINE.md;
            # scripts/repro_group_fault.py).
            return _jobs_in(new, q2, fin, win_imgs, win_gts, win_hws,
                            n_valid, win_base)

        def cond(carry):
            st, q = carry
            return cond_fn(st) & ~q["want_refill"]

        # prologue: reset the refill latch, then fill parked lanes from the
        # fresh window — covers both the chain start (init parks every lane)
        # and a mid-sweep window switch
        q = dict(q, want_refill=jnp.zeros((), jnp.bool_))
        sent_arr = jnp.asarray(sent, q["job_id"].dtype)
        st, q = _jobs_in(st, q, q["job_id"] == sent_arr, win_imgs, win_gts,
                         win_hws, n_valid, win_base)
        return jax.lax.while_loop(cond, body, (st, q))

    def init_group(params, win_imgs, win_gts, win_hws):
        b = batch_size
        st = init_state(params, win_imgs[:b], win_gts[:b], win_hws[:b])
        # every lane starts parked; run_window's prologue hands out jobs
        # (with trunk_roi poison, the first click recomputes the trunk)
        st["done"] = jnp.ones((b,), jnp.bool_)
        return st

    return _GroupEvaluator(
        run=jax.jit(stamped(run_window, cfg_salt + ("window",)),
                    donate_argnums=(1,)),
        batch_size=batch_size,
        max_clicks=max_clicks,
        init=jax.jit(stamped(init_group, cfg_salt + ("window-init",))),
    )


def _bbox_from_mask(mask: jnp.ndarray):
    """Inclusive bbox of a non-empty [H, W] bool mask (f32 scalars)."""
    h, w = mask.shape
    rows = jnp.any(mask, axis=1)
    cols = jnp.any(mask, axis=0)
    ridx = jnp.arange(h, dtype=jnp.float32)
    cidx = jnp.arange(w, dtype=jnp.float32)
    rmin = jnp.min(jnp.where(rows, ridx, h))
    rmax = jnp.max(jnp.where(rows, ridx, -1.0))
    cmin = jnp.min(jnp.where(cols, cidx, w))
    cmax = jnp.max(jnp.where(cols, cidx, -1.0))
    return rmin, rmax, cmin, cmax


def _expand_clamp(bbox, expansion_ratio, min_crop_size, h_valid, w_valid):
    """reference: core/utils/misc.py:80-106 (round = numpy half-even = jnp)."""
    rmin, rmax, cmin, cmax = bbox
    rcenter = 0.5 * (rmin + rmax)
    ccenter = 0.5 * (cmin + cmax)
    height = jnp.maximum(expansion_ratio * (rmax - rmin + 1), min_crop_size)
    width = jnp.maximum(expansion_ratio * (cmax - cmin + 1), min_crop_size)
    nrmin = jnp.round(rcenter - 0.5 * height)
    nrmax = jnp.round(rcenter + 0.5 * height)
    ncmin = jnp.round(ccenter - 0.5 * width)
    ncmax = jnp.round(ccenter + 0.5 * width)
    return (
        jnp.maximum(0.0, nrmin),
        jnp.minimum(h_valid - 1.0, nrmax),
        jnp.maximum(0.0, ncmin),
        jnp.minimum(w_valid - 1.0, ncmax),
    )


def _segments_iou(a0, a1, b0, b1):
    inter = jnp.maximum(0.0, jnp.minimum(a1, b1) - jnp.maximum(a0, b0) + 1)
    union = jnp.maximum(1e-6, jnp.maximum(a1, b1) - jnp.minimum(a0, b0) + 1)
    return inter / union


def _bbox_iou(b1, b2):
    return _segments_iou(b1[0], b1[1], b2[0], b2[1]) * _segments_iou(
        b1[2], b1[3], b2[2], b2[3]
    )


def make_device_evaluator(
    model,
    target_size: Tuple[int, int] = (448, 448),
    max_clicks: int = 20,
    net_clicks_limit: int = 20,
    pred_thr: float = 0.49,
    target_iou: float = 0.90,
    min_clicks: int = 1,
    with_flip: bool = True,
    roi_prob_thresh: float = 0.50,
    expansion_ratio: float = 1.4,
    min_crop_size: int = 200,
    recompute_thresh_iou: float = 0.5,
    batch_size: int = 1,
    mesh=None,
    trunk_cache: str = "auto",
    group_api: bool = False,
):
    """Build a jitted ``run(params, image_pad, gt_pad, valid_hw)`` evaluating
    samples entirely on device. Returns (ious [max_clicks], n_clicks).

    ``batch_size > 1`` runs the whole click protocol over a leading sample
    axis: finished lanes are masked, and every per-click forward becomes one
    batch-(flip·B) compiled program — small 448² ViT matmuls batched up onto
    the MXU instead of dispatched per sample. Shapes then gain a leading B:
    image [B,hp,wp,3], gt [B,hp,wp], valid_hw [B,2] ->
    (ious [B,max_clicks], n [B]).

    ``mesh`` (with ``batch_size > 1``) shards the sample axis over the mesh's
    ``data`` axis — dataset NoC evaluation scales across chips the same way
    training does (SURVEY.md §2.12), with zero cross-device communication in
    the loop body: every lane's click protocol is independent, so GSPMD
    partitions the whole while_loop per device and the only syncs are the
    global loop condition and the (cached-trunk) recompute predicate.
    ``batch_size`` must be divisible by the data-axis size; params are
    replicated.

    ``trunk_cache``: ``'auto'`` enables frozen-trunk caching when the
    backbone's injection mode makes the trunk click-independent
    (``after_backbone``); ``'on'`` forces it (errors on other modes);
    ``'off'`` disables it.
    """
    oh, ow = target_size
    nmax = net_clicks_limit
    with_prev = getattr(model, "with_prev_mask", False)
    nflip = 2 if with_flip else 1

    injection = (model.backbone_cfg.get("params") or {}).get(
        "feats_injection_mode", "no_injection"
    )
    if trunk_cache == "on" and injection != "after_backbone":
        raise ValueError(
            f"trunk_cache='on' requires feats_injection_mode='after_backbone' "
            f"(the trunk must be click-independent); got {injection!r}"
        )
    use_cache = (
        trunk_cache == "on"
        or (trunk_cache == "auto" and injection == "after_backbone")
    )
    if group_api and batch_size <= 1:
        raise ValueError("group_api requires batch_size > 1")
    if group_api and mesh is not None:
        raise ValueError("group_api is single-chip (the on-device job queue "
                         "is a global scalar); use the lockstep evaluator "
                         "with mesh instead")

    # Program-name salt: protocol thresholds and the model config are BAKED
    # constants — two evaluators differing only in e.g. target_iou produce
    # identical names and input shapes, which the axon executable cache
    # cannot tell apart (utils/misc.py: stamped).
    cfg_salt = (
        repr(model), target_size, max_clicks, net_clicks_limit, pred_thr,
        target_iou, min_clicks, with_flip, roi_prob_thresh, expansion_ratio,
        min_crop_size, recompute_thresh_iou, batch_size, use_cache,
        group_api,
        # mesh-sharded and unsharded evaluators take identically-shaped
        # inputs and differ only in in_shardings — salt the mesh layout
        None if mesh is None else (tuple(mesh.axis_names),
                                   tuple(mesh.devices.shape)),
    )

    # ---- per-lane protocol pieces (vmapped over the sample axis) ----------

    def _norm_img(image_hw3):
        """Normalize at READ time: the loop state keeps the image in its
        original dtype (uint8 for every real dataset), so each click's
        full-frame crop read pulls 1 byte/px from HBM instead of 4 — XLA
        fuses the convert+/255 into the crop matmul's operand read. The
        values reaching the interpolation are bit-identical to storing the
        normalized f32 frame (f32(u8)/255 is the same f32 either way)."""
        if jnp.issubdtype(image_hw3.dtype, jnp.integer):
            return image_hw3.astype(jnp.float32) / 255.0
        return image_hw3

    def _in_valid_mask(hp, wp, valid_hw):
        rr = jnp.arange(hp)[:, None]
        cc = jnp.arange(wp)[None, :]
        return (rr < valid_hw[0]) & (cc < valid_hw[1])

    def _init_lane(image_hw3, gt_pad, valid_hw):
        hp, wp = image_hw3.shape[0], image_hw3.shape[1]

        gt = gt_pad == 1
        # ignore everything outside the valid extent; in_valid itself is two
        # fused iota-compares — recomputed per use, never stored full-frame
        not_ignore = (gt_pad != -1) & _in_valid_mask(hp, wp, valid_hw)

        full_roi = jnp.asarray([0, 0, 0, 0], jnp.int32).at[1].set(
            valid_hw[0] - 1
        ).at[3].set(valid_hw[1] - 1)

        return dict(
            # loop-invariant lane context
            image=image_hw3,
            gt=gt,
            not_ignore=not_ignore,
            valid_hw=valid_hw,
            full_roi=full_roi,
            # mutable protocol state
            prev=jnp.zeros((hp, wp, 1), jnp.float32),
            not_clicked=jnp.ones((hp, wp), jnp.bool_),
            pos_pts=jnp.full((nmax, 3), -1.0, jnp.float32),
            neg_pts=jnp.full((nmax, 3), -1.0, jnp.float32),
            n_pos=jnp.asarray(0, jnp.int32),
            n_neg=jnp.asarray(0, jnp.int32),
            # ALL positive clicks ever made (ZoomIn sees the untruncated
            # list, reference base_predictor.py:88 / zoom_in.py:203-207)
            pos_mask=jnp.zeros((hp, wp), jnp.bool_),
            # running extremes of positive clicks for check_object_roi
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
        """One lane's clicker + bookkeeping + ZoomIn ROI update."""
        hp, wp = st["gt"].shape
        h_valid = st["valid_hw"][0].astype(jnp.float32)
        w_valid = st["valid_hw"][1].astype(jnp.float32)
        prev2d = st["prev"][:, :, 0]
        pred_mask = prev2d > pred_thr

        # --- clicker (reference: clicker.py:58-91) -------------------
        is_pos, cy, cx = next_click_from_error(
            st["gt"], pred_mask, st["not_clicked"], st["not_ignore"]
        )
        cyf = cy.astype(jnp.float32)
        cxf = cx.astype(jnp.float32)
        idx = (st["n"]).astype(jnp.float32)

        # MODEL-side net-clicks truncation (reference: get_points_nd,
        # base_predictor.py:204-209 — the point tensor keeps the first
        # net_clicks_limit clicks chronologically). Only the point buffers
        # gate on the click index; an ungated .at[] write would CLAMP at a
        # full buffer and overwrite the newest kept click instead. The
        # ZoomIn ROI machine below sees the UNTRUNCATED click history (the
        # reference hands apply_transforms the full list,
        # base_predictor.py:88).
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

        # full-history positive-click record for the ROI machine: one-pixel
        # update per click (cheaper than re-scattering the point buffer, and
        # unlike it, never truncated)
        pos_mask = st["pos_mask"].at[cy, cx].max(is_pos)
        pos_ymin = jnp.where(is_pos, jnp.minimum(st["pos_ymin"], cyf),
                             st["pos_ymin"])
        pos_ymax = jnp.where(is_pos, jnp.maximum(st["pos_ymax"], cyf),
                             st["pos_ymax"])
        pos_xmin = jnp.where(is_pos, jnp.minimum(st["pos_xmin"], cxf),
                             st["pos_xmin"])
        pos_xmax = jnp.where(is_pos, jnp.maximum(st["pos_xmax"], cxf),
                             st["pos_xmax"])

        # --- ZoomIn ROI state machine (reference: zoom_in.py:51-97) ---
        # a candidate ROI exists only when the PREDICTED mask is non-empty
        # (zoom_in.py:65-73); positive clicks are then added into the mask
        # before the bbox (zoom_in.py:203-207)
        roi_mask_pred = (prev2d > roi_prob_thresh) & _in_valid_mask(
            hp, wp, st["valid_hw"])
        has_mask = jnp.any(roi_mask_pred)
        roi_mask = roi_mask_pred | pos_mask

        cand = _expand_clamp(_bbox_from_mask(roi_mask), expansion_ratio,
                             min_crop_size, h_valid, w_valid)
        cand = jnp.stack(cand).astype(jnp.int32)
        cand = jnp.where(has_mask, cand, st["full_roi"])

        cur = st["roi"].astype(jnp.float32)
        has_pos = jnp.isfinite(pos_ymin)  # any positive click ever
        clicks_inside = (
            (pos_ymin >= cur[0]) & (pos_ymax < cur[1])
            & (pos_xmin >= cur[2]) & (pos_xmax < cur[3])
        ) | ~has_pos
        iou_ok = _bbox_iou(cand.astype(jnp.float32), cur) >= recompute_thresh_iou
        update = (~st["roi_set"]) | (~clicks_inside) | (~iou_ok)
        roi = jnp.where(update, cand, st["roi"])

        points = jnp.concatenate([pos_pts, neg_pts], axis=0)
        return dict(
            pos_pts=pos_pts, neg_pts=neg_pts, n_pos=n_pos, n_neg=n_neg,
            not_clicked=not_clicked, pos_mask=pos_mask,
            pos_ymin=pos_ymin, pos_ymax=pos_ymax,
            pos_xmin=pos_xmin, pos_xmax=pos_xmax,
            roi=roi, roi_set=jnp.asarray(True),
        ), points

    def _roi_points(roi, points):
        """Transform full-frame clicks into ROI-crop coordinates."""
        rminf = roi[0].astype(jnp.float32)
        cminf = roi[2].astype(jnp.float32)
        rh = (roi[1] - roi[0] + 1).astype(jnp.float32)
        rw = (roi[3] - roi[2] + 1).astype(jnp.float32)
        yxi = points.astype(jnp.float32)
        valid = jnp.max(yxi[..., :2], axis=-1) >= 0
        pts = jnp.stack(
            [oh * (yxi[..., 0] - rminf) / rh,
             ow * (yxi[..., 1] - cminf) / rw,
             yxi[..., 2]],
            axis=-1,
        )
        return jnp.where(valid[..., None], pts, -1.0), valid

    def _lane_crop_pts(image, prev, roi, points):
        """Model inputs for one lane: [nflip, oh, ow, C] crop + points.

        Image and prev-mask crop separately and concat at 448² — cropping a
        pre-concatenated [hp, wp, 4] frame would materialize a full-frame f32
        copy per lane per click and force the image read up to f32 width;
        per-channel linear interpolation makes the split bit-identical."""
        crop = crop_resize(_norm_img(image)[None], roi, (oh, ow))[0]
        if with_prev:
            crop = jnp.concatenate(
                [crop, crop_resize(prev[None], roi, (oh, ow))[0]], axis=-1)
        pts, valid = _roi_points(roi, points)
        if with_flip:
            crop = jnp.stack([crop, crop[:, ::-1]], axis=0)
            fx = ow - pts[..., 1] - 1.0
            pts_f = jnp.where(
                valid[..., None],
                jnp.stack([pts[..., 0], fx, pts[..., 2]], axis=-1),
                -1.0,
            )
            pts = jnp.stack([pts, pts_f], axis=0)
        else:
            crop = crop[None]
            pts = pts[None]
        return crop, pts

    def _lane_trunk_crop(image, roi):
        """Image-only ROI crop feeding the click-independent trunk."""
        crop = crop_resize(_norm_img(image)[None], roi, (oh, ow))[0]
        if with_flip:
            return jnp.stack([crop, crop[:, ::-1]], axis=0)
        return crop[None]

    def _lane_finish(st, roi, probs_lane):
        prev = inverse_paste(probs_lane[None], roi, st["prev"][None])[0]
        new_mask = prev[:, :, 0] > pred_thr
        inter = jnp.sum(new_mask & st["gt"] & st["not_ignore"])
        union = jnp.sum((new_mask | st["gt"]) & st["not_ignore"])
        iou = inter / jnp.maximum(union, 1)
        ious = st["ious"].at[st["n"]].set(iou)
        return dict(
            prev=prev, ious=ious, n=st["n"] + 1,
            # the reference's stopping rule gates early exit on a minimum
            # click count (evaluation.py:85 / our host evaluation.py:51)
            done=(iou >= target_iou) & (st["n"] + 1 >= min_clicks),
        )

    # ---- batch-level model stages -----------------------------------------

    def _merge_flip(logits, b):
        logits = logits.reshape(b, nflip, oh, ow, 1)
        if with_flip:
            logits = 0.5 * (logits[:, 0] + logits[:, 1, :, ::-1])
        else:
            logits = logits[:, 0]
        return jax.nn.sigmoid(logits)

    def _batched_forward(params, crops, ptss):
        b = crops.shape[0]
        logits = model.apply(
            {"params": params},
            crops.reshape(b * nflip, oh, ow, crops.shape[-1]),
            ptss.reshape(b * nflip, 2 * nmax, 3),
        )["instances"]
        return _merge_flip(logits, b)

    def _batched_trunk(params, images, rois):
        crops = jax.vmap(_lane_trunk_crop)(images, rois)
        b = crops.shape[0]
        trunk = model.apply(
            {"params": params},
            crops.reshape(b * nflip, oh, ow, 3),
            method=type(model).compute_backbone_trunk,
        )
        return trunk.reshape(b, nflip, *trunk.shape[1:])

    def _batched_forward_cached(params, crops, ptss, trunk):
        b = crops.shape[0]
        logits = model.apply(
            {"params": params},
            crops.reshape(b * nflip, oh, ow, crops.shape[-1]),
            ptss.reshape(b * nflip, 2 * nmax, 3),
            trunk.reshape(b * nflip, *trunk.shape[2:]),
            method=type(model).forward_with_cached_trunk,
        )["instances"]
        return _merge_flip(logits, b)

    # ---- the compiled protocol loop ---------------------------------------

    def _init_state(params, images, gts, valid_hws):
        st = jax.vmap(_init_lane)(images, gts, valid_hws)
        if use_cache:
            # serves click 1: the first ROI candidate with an empty prediction
            # is the full frame, which this trunk was computed for
            st["trunk"] = _batched_trunk(params, st["image"], st["roi"])
            st["trunk_roi"] = st["roi"]
        return st

    def _cond(st):
        return jnp.any((~st["done"]) & (st["n"] < max_clicks))

    def _body(params, st):
        active = (~st["done"]) & (st["n"] < max_clicks)
        sel, points = jax.vmap(_lane_select)(st)
        crops, ptss = jax.vmap(_lane_crop_pts)(
            st["image"], st["prev"], sel["roi"], points
        )
        if use_cache:
            changed = jnp.any(
                jnp.any(sel["roi"] != st["trunk_roi"], axis=-1) & active
            )
            trunk, trunk_roi = jax.lax.cond(
                changed,
                lambda: (_batched_trunk(params, st["image"], sel["roi"]),
                         sel["roi"]),
                lambda: (st["trunk"], st["trunk_roi"]),
            )
            probs = _batched_forward_cached(params, crops, ptss, trunk)
        else:
            probs = _batched_forward(params, crops, ptss)
        fin = jax.vmap(_lane_finish)(st, sel["roi"], probs)

        new = {**st, **sel, **fin}
        if use_cache:
            new["trunk"], new["trunk_roi"] = trunk, trunk_roi
        # Finished lanes freeze — but only the OUTPUTS need the freeze:
        # ious/n are the results, and done/n drive the loop condition.
        # The rest of a finished lane's state (prev, not_clicked, click
        # lists, ROI, cached trunk) may keep evolving harmlessly: nothing
        # it influences can reach a frozen lane's ious/n again, and the
        # trunk-recompute predicate is already masked by ``active``.
        # Freezing everything costs a whole-frame select per state array
        # per click (5 fewer selects in the compiled loop body; measured
        # ~0.7 ms/click less pad/copy traffic in the batch-8 trace,
        # docs/PERF.md).
        out = dict(new)
        for k in ("ious", "n", "done"):
            v, old = new[k], st[k]
            mask = active.reshape((-1,) + (1,) * (v.ndim - 1))
            out[k] = jnp.where(mask, v, old)
        return out

    def run_batched(params, images, gts, valid_hws):
        st = _init_state(params, images, gts, valid_hws)
        st = jax.lax.while_loop(_cond, lambda s: _body(params, s), st)
        return st["ious"], st["n"]

    # ---- on-device continuous batching (job queue inside the loop) --------
    # A host-driven lane-refill API existed through round 3 but measured
    # 0.98x lockstep on the real workload (BENCH_r03: per-chunk tunnel
    # round-trips + wasted intra-chunk lane-clicks ate the straggler win) —
    # deleted in round 4 in favor of this path, where the WHOLE job group
    # ships to HBM up front and the compiled loop
    # itself refills lanes: each click, lanes that just finished write their
    # results into a per-job output buffer and pull the next job from an
    # on-device counter — one dispatch per GROUP, zero host syncs, and a
    # lane idles at most the final drain. Per-sample trajectories are
    # identical to the lockstep/per-sample paths (lanes are
    # protocol-independent; tests/test_group_eval.py).

    if group_api:
        return make_windowed_group_evaluator(
            init_state=_init_state,
            init_lane=_init_lane,
            body_fn=_body,
            cond_fn=_cond,
            batch_size=batch_size,
            max_clicks=max_clicks,
            cfg_salt=cfg_salt,
            poison_trunk=use_cache,
        )

    if batch_size == 1:
        def run_one(params, image, gt_pad, valid_hw):
            ious, n = run_batched(
                params, image[None], gt_pad[None], valid_hw[None]
            )
            return ious[0], n[0]

        return jax.jit(stamped(run_one, cfg_salt))
    if mesh is None:
        return jax.jit(stamped(run_batched, cfg_salt))

    from jax.sharding import NamedSharding, PartitionSpec as P

    n_data = mesh.shape["data"]
    if batch_size % n_data:
        raise ValueError(
            f"batch_size {batch_size} not divisible by data axis {n_data}")
    shard = NamedSharding(mesh, P("data"))
    rep = NamedSharding(mesh, P())
    return jax.jit(
        stamped(run_batched, cfg_salt),
        in_shardings=(rep, shard, shard, shard),
        out_shardings=(shard, shard),
    )


def _pad_job(image: np.ndarray, gt_mask: np.ndarray, bucket: int):
    h, w = image.shape[:2]
    hp = -(-h // bucket) * bucket
    wp = -(-w // bucket) * bucket
    # ship uint8 when possible; the compiled loop normalizes on device
    image_pad = np.zeros((hp, wp, 3), image.dtype
                         if image.dtype == np.uint8 else np.float32)
    image_pad[:h, :w] = image
    gt_dtype = np.int8 if (gt_mask.min() >= -128 and gt_mask.max() <= 127) \
        else np.int32
    gt_pad = np.zeros((hp, wp), gt_dtype)
    gt_pad[:h, :w] = gt_mask
    return image_pad, gt_pad, np.asarray([h, w], np.int32)


def _build_jobs(dataset, bucket: int):
    """Walk the dataset into padded jobs, grouped by padded frame shape
    (lanes of one compiled state must share a static shape)."""
    jobs = []
    for index in range(len(dataset)):
        sample = dataset.get_sample(index)
        for object_id in sample.objects_ids:
            jobs.append(_pad_job(sample.image, sample.gt_mask(object_id),
                                 bucket))
    by_shape = {}
    for order_idx, (img, gt, hw) in enumerate(jobs):
        by_shape.setdefault(img.shape, []).append((order_idx, img, gt, hw))
    return jobs, by_shape


def submit_sample_device(
    run_fn, params, image: np.ndarray, gt_mask: np.ndarray, bucket: int = 64
):
    """Asynchronously dispatch one sample's full click loop; returns device
    handles (ious_dev, n_dev) that sync lazily — lets the host pipeline the
    next sample's dispatch behind the current one's compute."""
    image_pad, gt_pad, valid_hw = _pad_job(image, gt_mask, bucket)
    return run_fn(params, jnp.asarray(image_pad), jnp.asarray(gt_pad),
                  jnp.asarray(valid_hw))


def collect_sample_device(handles) -> np.ndarray:
    ious, n = handles
    return np.asarray(ious)[: int(n)]


def evaluate_sample_device(
    run_fn, params, image: np.ndarray, gt_mask: np.ndarray, bucket: int = 64
):
    """Host wrapper: pad to the bucket, run the compiled loop, crop outputs."""
    return collect_sample_device(
        submit_sample_device(run_fn, params, image, gt_mask, bucket)
    )


def evaluate_dataset_device(run_fn, params, dataset, depth: int = 2,
                            batch_size: int = 1, bucket: int = 64,
                            sample_times: Optional[list] = None):
    """Dataset evaluation through the compiled click loop.

    ``batch_size == 1``: pipelined per-sample dispatch (keep ``depth`` samples
    in flight).  ``batch_size > 1`` (requires a ``make_device_evaluator``
    built with the same batch_size): jobs are grouped by padded bucket shape,
    chunked into batches (last chunk zero-padded and discarded after), and the
    whole protocol runs per batch in one dispatch.  Results always come back
    in dataset order.  ``sample_times`` (a list) collects one honest wall-time
    entry per sample: submit→completion of the dispatch group the sample
    rode in — the real latency a user of the batched evaluator observes.
    NOTE: with pipelining (``depth`` > 1) this INCLUDES time queued behind
    earlier in-flight chunks' device compute (up to ~depth× a lone chunk's
    wall); it is an end-to-end latency figure, not a per-chunk compute time —
    don't compare it against unpipelined walls.
    """
    from collections import deque
    from time import time as _time

    if batch_size <= 1:
        pending: deque = deque()
        all_ious = []
        t_submit: deque = deque()
        for index in range(len(dataset)):
            sample = dataset.get_sample(index)
            for object_id in sample.objects_ids:
                pending.append(
                    submit_sample_device(run_fn, params, sample.image,
                                         sample.gt_mask(object_id), bucket)
                )
                t_submit.append(_time())
                if len(pending) >= depth:
                    all_ious.append(collect_sample_device(pending.popleft()))
                    if sample_times is not None:
                        sample_times.append(_time() - t_submit.popleft())
        while pending:
            all_ious.append(collect_sample_device(pending.popleft()))
            if sample_times is not None:
                sample_times.append(_time() - t_submit.popleft())
        return all_ious

    # ---- batched path: bucket-group -> chunk -> one dispatch per chunk ----
    jobs, by_shape = _build_jobs(dataset, bucket)
    results = [None] * len(jobs)
    chunks = []
    for group in by_shape.values():
        for lo in range(0, len(group), batch_size):
            chunk = group[lo:lo + batch_size]
            while len(chunk) < batch_size:  # zero-pad the tail chunk
                chunk.append(chunk[-1])
            chunks.append(chunk)

    def _drain(entry):
        chunk, handles, t_submit = entry
        ious_b, n_b = jax.device_get(handles)
        wall = _time() - t_submit
        seen = set()
        for lane, (order_idx, *_rest) in enumerate(chunk):
            if order_idx in seen:  # tail padding duplicates the last job
                continue
            seen.add(order_idx)
            results[order_idx] = ious_b[lane][: int(n_b[lane])]
            if sample_times is not None:
                sample_times.append(wall)

    # keep `depth` chunk programs in flight: jax dispatch is async, so chunk
    # i+1's host->device upload and dispatch overlap chunk i's compute (the
    # upload is the dominant fixed cost on a tunnel-attached chip)
    pending: deque = deque()
    for chunk in chunks:
        imgs = jnp.asarray(np.stack([c[1] for c in chunk]))
        gts = jnp.asarray(np.stack([c[2] for c in chunk]))
        hws = jnp.asarray(np.stack([c[3] for c in chunk]))
        pending.append((chunk, run_fn(params, imgs, gts, hws), _time()))
        if len(pending) >= max(1, depth):
            _drain(pending.popleft())
    while pending:
        _drain(pending.popleft())
    return results


def evaluate_dataset_group(ev, params, dataset, bucket: int = 64,
                           sample_times: Optional[list] = None,
                           stats: Optional[dict] = None,
                           depth: int = 2, job_bucket: int = 0,
                           max_jobs_per_dispatch: int = 0,
                           devices: Optional[list] = None):
    """On-device continuous-batching dataset evaluation
    (``group_api=True`` evaluator).

    Windowed staging (round 5): each same-shape job group runs as a CHAIN of
    dispatches over a sliding window of ``max_jobs_per_dispatch`` staged
    frames (default 32, floored at ``batch_size``) — bounded HBM by
    construction (the full-78-job LoftUp staging faulted the TPU worker,
    BASELINE.md) — with the LANE STATE carried across dispatches: a window
    switch pauses mid-protocol lanes at a click boundary and the next
    dispatch resumes them, so unlike the round-4 ``group_max_jobs`` chunking
    there is NO straggler drain per chunk; the only drain left is the final
    one when fewer jobs than lanes remain. Window i+1's frames upload while
    window i computes (the host paces itself two windows deep by fetching a
    queue scalar), so staging is double-buffered.

    OUT-buffer rows are padded up to the next power of two (floored at
    ``job_bucket``, default ``2*batch_size``) so a dataset sweep produces
    few distinct compile signatures; the window size is a second signature
    dimension (one compile per distinct (frame-shape, window)).
    Chains are pipelined ``depth`` deep across shape groups — group i+1
    dispatches while group i drains. ``sample_times`` records each sample's
    group-chain wall (chain start→chain completion), the latency a user of
    this path observes.

    ``devices`` (a list of ``jax.Device``) scales the sweep across chips the
    embarrassingly-parallel way: each shape group's jobs are dealt
    round-robin into one sub-queue per device, and every device runs its own
    job-queue program against a local replica of the params — no mesh, no
    collectives, no cross-chip sync at all (contrast the lockstep
    ``mesh=...`` evaluator, which shards one program's lane axis). Dealing
    round-robin keeps sub-queue lengths within 1 job so they share one
    compiled (frame-shape, J_pad) signature."""
    from collections import deque
    from time import time as _time

    jobs, by_shape = _build_jobs(dataset, bucket)
    results = [None] * len(jobs)
    b = ev.batch_size
    jb = job_bucket or 2 * b
    window = max(b, max_jobs_per_dispatch or 32)
    n_dispatch = 0

    devices = list(devices) if devices else [None]
    if len(devices) == 1:
        # single device: default placement — identical scheduling, and some
        # remote backends (the axon tunnel) hang on committed-device dispatch
        devices = [None]
    # params replicas materialize lazily: a sweep whose groups never reach
    # device k must not park an unused full-parameter copy in its HBM
    params_by_dev = {}

    def _params_for(dev):
        if dev not in params_by_dev:
            params_by_dev[dev] = (
                params if dev is None else jax.device_put(params, dev))
        return params_by_dev[dev]

    def _put(x, d):
        # hand numpy straight to device_put: jnp.asarray would stage the
        # full frame stack on the DEFAULT device first and copy again
        return jnp.asarray(x) if d is None else jax.device_put(x, d)

    def _run_chain(dev, subgroup):
        """Dispatch one job group's whole windowed chain (no final sync);
        returns the entry _drain later harvests."""
        nonlocal n_dispatch
        n = len(subgroup)
        W = max(b, min(window, n))
        npad = max(b, jb)  # out-buffer pow2 bucketing (compile signatures)
        while npad < n:
            npad *= 2
        p = _params_for(dev)

        def put_window(lo):
            win = subgroup[lo:lo + W]
            win = win + [win[-1]] * (W - len(win))
            return (_put(np.stack([j[1] for j in win]), dev),
                    _put(np.stack([j[2] for j in win]), dev),
                    _put(np.stack([j[3] for j in win]), dev))

        t0 = _time()
        imgs, gts, hws = put_window(0)
        st = ev.init(p, imgs, gts, hws)
        q = dict(
            job_id=_put(np.full((b,), npad, np.int32), dev),
            next_job=_put(np.asarray(0, np.int32), dev),
            out_ious=_put(np.zeros((npad + 1, ev.max_clicks), np.float32),
                          dev),
            out_n=_put(np.zeros((npad + 1,), np.int32), dev),
            want_refill=_put(np.asarray(False), dev),
        )
        nv = _put(np.asarray(n, np.int32), dev)
        paces: deque = deque()
        for lo in range(0, n, W):
            if lo:
                imgs, gts, hws = put_window(lo)
            st, q = ev.run(p, st, q, imgs, gts, hws, nv,
                           _put(np.asarray(lo, np.int32), dev))
            n_dispatch += 1
            paces.append(q["next_job"])
            # double-buffered staging: before uploading window i+1, force
            # window i-1's program to have finished (int() is a host fetch —
            # block_until_ready does not reliably block on this backend), so
            # at most two windows' frames are in flight per chain
            if len(paces) > 2:
                int(paces.popleft())
        return (subgroup, q, t0)

    def _drain(entry):
        subgroup, q, t0 = entry
        ious_j = np.asarray(q["out_ious"])
        n_j = np.asarray(q["out_n"])
        wall = _time() - t0
        for row, (order_idx, *_rest) in enumerate(subgroup):
            results[order_idx] = ious_j[row][: int(n_j[row])]
            if sample_times is not None:
                sample_times.append(wall)

    # one in-flight queue per device: the cap must bound HBM PER CHIP, and a
    # global count would let one device accumulate every group while the
    # rest idle
    pending = {di: deque() for di in range(len(devices))}
    base = 0  # rotates so consecutive small groups land on different chips
    for group in by_shape.values():
        n_dev = min(len(devices), max(1, -(-len(group) // b)))
        for di in range(n_dev):
            subgroup = group[di::n_dev]
            if not subgroup:
                continue
            dev_idx = (base + di) % len(devices)
            pending[dev_idx].append(_run_chain(devices[dev_idx], subgroup))
            if len(pending[dev_idx]) >= max(1, depth):
                _drain(pending[dev_idx].popleft())
        base = (base + n_dev) % len(devices)
    for dq in pending.values():
        while dq:
            _drain(dq.popleft())
    if stats is not None:
        stats.update(
            dispatches=n_dispatch, batch_size=b, devices=len(devices),
            window=window, useful_clicks=sum(
                len(a) for a in results if a is not None),
        )
    return results
