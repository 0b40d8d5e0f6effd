"""Fully on-device NoC evaluation: the whole ≤20-click loop as ONE compiled
program per sample.

The host protocol (inference/evaluation.py + predictor.py) dispatches one
device program per click and round-trips the probability map for the clicker
and the ZoomIn ROI logic. This module moves everything inside a single
``lax.while_loop`` — clicker EDT (ops/edt.py device kernels), ROI state
machine, crop/forward/flip/paste, IoU and the stopping rule — so per-click
cost collapses to pure compute and the host pays one dispatch + one scalar
sync per SAMPLE.

Protocol equivalence with the reference is by construction: the same decision
rules on the same quantities (see next_click_from_error's decision-parity test
and test_device_eval.py's trajectory-parity test vs the host path).
"""

from __future__ import annotations

from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from isegprobe_tpu.ops.edt import next_click_from_error
from isegprobe_tpu.ops.sample import crop_resize, inverse_paste


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
    with_flip: bool = True,
    roi_prob_thresh: float = 0.50,
    expansion_ratio: float = 1.4,
    min_crop_size: int = 200,
    recompute_thresh_iou: float = 0.5,
    batch_size: int = 1,
    mesh=None,
):
    """Build a jitted ``run(params, image_pad, gt_pad, valid_hw)`` evaluating
    one sample entirely on device. Returns (ious [max_clicks], n_clicks).

    ``batch_size > 1`` vmaps the whole click protocol over a leading sample
    axis: the while_loop batching rule masks finished lanes automatically, and
    every per-click forward becomes one batch-(2·)B compiled program — small
    448² ViT matmuls batched up onto the MXU instead of dispatched per sample.
    Shapes then gain a leading B: image [B,hp,wp,3], gt [B,hp,wp],
    valid_hw [B,2] -> (ious [B,max_clicks], n [B]).

    ``mesh`` (with ``batch_size > 1``) shards the sample axis over the mesh's
    ``data`` axis — dataset NoC evaluation scales across chips the same way
    training does (SURVEY.md §2.12), with zero cross-device communication in
    the loop body: every lane's click protocol is independent, so GSPMD
    partitions the whole while_loop per device and the only sync is the
    global loop condition. ``batch_size`` must be divisible by the data-axis
    size; params are replicated."""
    oh, ow = target_size
    nmax = net_clicks_limit
    with_prev = getattr(model, "with_prev_mask", False)

    def forward(params, image_pad, prev, roi, points):
        inp = image_pad
        if with_prev:
            inp = jnp.concatenate([image_pad, prev], axis=-1)
        crop = crop_resize(inp, roi, (oh, ow))

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
        pts = jnp.where(valid[..., None], pts, -1.0)

        if with_flip:
            crop2 = jnp.concatenate([crop, crop[:, :, ::-1]], axis=0)
            fx = ow - pts[..., 1] - 1.0
            pts_f = jnp.where(
                valid[..., None],
                jnp.stack([pts[..., 0], fx, pts[..., 2]], axis=-1),
                -1.0,
            )
            pts2 = jnp.concatenate([pts, pts_f], axis=0)
            logits = model.apply({"params": params}, crop2, pts2)["instances"]
            logits = 0.5 * (logits[:1] + logits[1:, :, ::-1])
        else:
            logits = model.apply({"params": params}, crop, pts)["instances"]
        return jax.nn.sigmoid(logits)

    def run_single(params, image_hw3, gt_pad, valid_hw):
        # uint8 images normalize on device — the host uploads 4x fewer bytes
        # per sample (the tunnel transfer dominates single-sample dispatch)
        if jnp.issubdtype(image_hw3.dtype, jnp.integer):
            image_hw3 = image_hw3.astype(jnp.float32) / 255.0
        image_pad = image_hw3[None]
        hp, wp = image_pad.shape[1], image_pad.shape[2]
        h_valid = valid_hw[0].astype(jnp.float32)
        w_valid = valid_hw[1].astype(jnp.float32)

        gt = gt_pad == 1
        not_ignore = gt_pad != -1
        # ignore everything outside the valid extent
        rr = jnp.arange(hp)[:, None]
        cc = jnp.arange(wp)[None, :]
        in_valid = (rr < valid_hw[0]) & (cc < valid_hw[1])
        not_ignore = not_ignore & in_valid

        full_roi = jnp.asarray([0, 0, 0, 0], jnp.int32).at[1].set(
            valid_hw[0] - 1
        ).at[3].set(valid_hw[1] - 1)

        state = dict(
            prev=jnp.zeros((1, hp, wp, 1), jnp.float32),
            not_clicked=jnp.ones((hp, wp), jnp.bool_),
            pos_pts=jnp.full((nmax, 3), -1.0, jnp.float32),
            neg_pts=jnp.full((nmax, 3), -1.0, jnp.float32),
            n_pos=jnp.asarray(0, jnp.int32),
            n_neg=jnp.asarray(0, jnp.int32),
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

        def cond(state):
            return (~state["done"]) & (state["n"] < max_clicks)

        def body(state):
            prev2d = state["prev"][0, :, :, 0]
            pred_mask = prev2d > pred_thr

            # --- clicker (reference: clicker.py:58-91) -------------------
            is_pos, cy, cx = next_click_from_error(
                gt, pred_mask, state["not_clicked"], not_ignore
            )
            cyf = cy.astype(jnp.float32)
            cxf = cx.astype(jnp.float32)
            idx = (state["n"]).astype(jnp.float32)

            pos_pts = jnp.where(
                is_pos,
                state["pos_pts"].at[state["n_pos"]].set(
                    jnp.stack([cyf, cxf, idx])
                ),
                state["pos_pts"],
            )
            neg_pts = jnp.where(
                is_pos,
                state["neg_pts"],
                state["neg_pts"].at[state["n_neg"]].set(
                    jnp.stack([cyf, cxf, idx])
                ),
            )
            n_pos = state["n_pos"] + is_pos.astype(jnp.int32)
            n_neg = state["n_neg"] + (~is_pos).astype(jnp.int32)
            not_clicked = state["not_clicked"].at[cy, cx].set(False)

            pos_ymin = jnp.where(is_pos, jnp.minimum(state["pos_ymin"], cyf),
                                 state["pos_ymin"])
            pos_ymax = jnp.where(is_pos, jnp.maximum(state["pos_ymax"], cyf),
                                 state["pos_ymax"])
            pos_xmin = jnp.where(is_pos, jnp.minimum(state["pos_xmin"], cxf),
                                 state["pos_xmin"])
            pos_xmax = jnp.where(is_pos, jnp.maximum(state["pos_xmax"], cxf),
                                 state["pos_xmax"])

            # --- ZoomIn ROI state machine (reference: zoom_in.py:51-97) ---
            # a candidate ROI exists only when the PREDICTED mask is non-empty
            # (zoom_in.py:65-73); positive clicks are then added into the mask
            # before the bbox (zoom_in.py:203-207)
            roi_mask_pred = (prev2d > roi_prob_thresh) & in_valid
            has_mask = jnp.any(roi_mask_pred)
            pos_click_mask = jnp.zeros((hp, wp), jnp.bool_).at[
                pos_pts[:, 0].astype(jnp.int32).clip(0, hp - 1),
                pos_pts[:, 1].astype(jnp.int32).clip(0, wp - 1),
            ].max(pos_pts[:, 0] >= 0)
            roi_mask = roi_mask_pred | pos_click_mask

            cand = _expand_clamp(_bbox_from_mask(roi_mask), expansion_ratio,
                                 min_crop_size, h_valid, w_valid)
            cand = jnp.stack(cand).astype(jnp.int32)
            cand = jnp.where(has_mask, cand, full_roi)

            cur = state["roi"].astype(jnp.float32)
            clicks_inside = (
                (pos_ymin >= cur[0]) & (pos_ymax < cur[1])
                & (pos_xmin >= cur[2]) & (pos_xmax < cur[3])
            ) | (n_pos == 0)
            iou_ok = _bbox_iou(cand.astype(jnp.float32), cur) >= recompute_thresh_iou
            update = (~state["roi_set"]) | (~clicks_inside) | (~iou_ok)
            roi = jnp.where(update, cand, state["roi"])

            # --- forward + paste -----------------------------------------
            points = jnp.concatenate([pos_pts, neg_pts], axis=0)[None]
            probs = forward(params, image_pad, state["prev"], roi, points)
            prev = inverse_paste(probs, roi, state["prev"])

            # --- IoU + stop (reference: evaluation.py:61-86) --------------
            new_mask = prev[0, :, :, 0] > pred_thr
            inter = jnp.sum(new_mask & gt & not_ignore)
            union = jnp.sum((new_mask | gt) & not_ignore)
            iou = inter / jnp.maximum(union, 1)

            ious = state["ious"].at[state["n"]].set(iou)
            n = state["n"] + 1
            done = iou >= target_iou

            return dict(
                prev=prev, not_clicked=not_clicked,
                pos_pts=pos_pts, neg_pts=neg_pts, n_pos=n_pos, n_neg=n_neg,
                pos_ymin=pos_ymin, pos_ymax=pos_ymax,
                pos_xmin=pos_xmin, pos_xmax=pos_xmax,
                roi=roi, roi_set=jnp.asarray(True),
                ious=ious, n=n, done=done,
            )

        state = jax.lax.while_loop(cond, body, state)
        return state["ious"], state["n"]

    if batch_size == 1:
        return jax.jit(run_single)
    if mesh is None:
        return jax.jit(jax.vmap(run_single, in_axes=(None, 0, 0, 0)))

    from jax.sharding import NamedSharding, PartitionSpec as P

    n_data = mesh.shape["data"]
    if batch_size % n_data:
        raise ValueError(
            f"batch_size {batch_size} not divisible by data axis {n_data}")
    shard = NamedSharding(mesh, P("data"))
    rep = NamedSharding(mesh, P())
    return jax.jit(
        jax.vmap(run_single, in_axes=(None, 0, 0, 0)),
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
    entry per sample: the wall time of the dispatch group the sample completed
    in — the real latency a user of the batched evaluator observes.
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
    jobs = []  # (order_idx, image_pad, gt_pad, valid_hw)
    for index in range(len(dataset)):
        sample = dataset.get_sample(index)
        for object_id in sample.objects_ids:
            jobs.append(_pad_job(sample.image, sample.gt_mask(object_id),
                                 bucket))
    by_shape = {}
    for order_idx, (img, gt, hw) in enumerate(jobs):
        by_shape.setdefault(img.shape, []).append((order_idx, img, gt, hw))

    results = [None] * len(jobs)
    for group in by_shape.values():
        for lo in range(0, len(group), batch_size):
            chunk = group[lo:lo + batch_size]
            n_real = len(chunk)
            while len(chunk) < batch_size:  # zero-pad the tail chunk
                chunk.append(chunk[-1])
            imgs = jnp.asarray(np.stack([c[1] for c in chunk]))
            gts = jnp.asarray(np.stack([c[2] for c in chunk]))
            hws = jnp.asarray(np.stack([c[3] for c in chunk]))
            t0 = _time()
            ious_b, n_b = jax.device_get(run_fn(params, imgs, gts, hws))
            wall = _time() - t0
            for lane in range(n_real):
                order_idx = chunk[lane][0]
                results[order_idx] = ious_b[lane][: int(n_b[lane])]
                if sample_times is not None:
                    sample_times.append(wall)
    return results
