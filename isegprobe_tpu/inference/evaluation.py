"""NoC evaluation driver (reference: core/inference/evaluation.py:22-88)."""

from __future__ import annotations

from copy import deepcopy
from time import time
from typing import Callable, List, Optional, Tuple

import numpy as np

from isegprobe_tpu.inference.clicker import Click, Clicker


def evaluate_sample(
    image: np.ndarray,
    gt_mask: np.ndarray,
    predictor,
    max_iou_thr: float,
    pred_thr: float = 0.49,
    min_clicks: int = 1,
    max_clicks: int = 20,
    sample_id: Optional[int] = None,
    callback: Optional[Callable] = None,
    feats_callback: Optional[Callable] = None,
) -> Tuple[List[Click], np.ndarray, np.ndarray]:
    """Simulate a user on one object: click on the largest error until the IoU
    target is reached (or max_clicks spent). Returns (clicks, per-click IoUs,
    final probs)."""
    clicker = Clicker(gt_mask=gt_mask)
    pred_mask = np.zeros_like(gt_mask, dtype=bool)
    ious_list = []
    pred_probs = None

    predictor.set_input_image(image)
    for click_indx in range(max_clicks):
        clicker.make_next_click(pred_mask)

        if feats_callback is not None:
            _, feats = predictor.get_lowres_highres_feats(deepcopy(clicker))
            feats_callback(image, feats, sample_id, click_indx, clicker.clicks_list)

        pred_probs = predictor.get_prediction(clicker)
        pred_mask = pred_probs > pred_thr

        if callback is not None:
            callback(image, gt_mask, pred_probs, sample_id, click_indx,
                     clicker.clicks_list)

        iou = get_iou(gt_mask, pred_mask)
        ious_list.append(iou)
        if iou >= max_iou_thr and click_indx + 1 >= min_clicks:
            break

    return clicker.clicks_list, np.array(ious_list, dtype=np.float32), pred_probs


def evaluate_dataset(
    dataset, predictor, latencies: Optional[list] = None, **kwargs
) -> Tuple[List[np.ndarray], float]:
    """Run the per-sample NoC loop over a dataset. Pass ``latencies=[]`` to
    collect per-click wall times (the SPC histogram — SURVEY.md §5 calls for
    p50/p95 since latency is a headline metric)."""
    all_ious = []
    start_time = time()
    for index in range(len(dataset)):
        sample = dataset.get_sample(index)
        for object_id in sample.objects_ids:
            t0 = time()
            _, sample_ious, _ = evaluate_sample(
                sample.image, sample.gt_mask(object_id), predictor,
                sample_id=index, **kwargs,
            )
            if latencies is not None:
                latencies.append((time() - t0) / max(1, len(sample_ious)))
            all_ious.append(sample_ious)
    return all_ious, time() - start_time


def latency_percentiles(latencies: list) -> dict:
    arr = np.asarray(latencies)
    return {
        "p50_ms": float(np.percentile(arr, 50) * 1e3),
        "p95_ms": float(np.percentile(arr, 95) * 1e3),
        "mean_ms": float(arr.mean() * 1e3),
    }


def get_iou(gt_mask: np.ndarray, pred_mask: np.ndarray, ignore_label: int = -1) -> float:
    """(reference: core/inference/utils.py:107-120)"""
    not_ignore = gt_mask != ignore_label
    obj = gt_mask == 1
    intersection = np.logical_and(np.logical_and(pred_mask, obj), not_ignore).sum()
    union = np.logical_and(np.logical_or(pred_mask, obj), not_ignore).sum()
    return intersection / union
