"""Training metrics (reference: core/training/metrics.py:10-135).

The batch IoU computation is a pure jnp function usable inside the compiled
train step; the EMA-threshold adaptation stays host-side (tiny scalar state).
"""

from __future__ import annotations



import jax.numpy as jnp
import numpy as np


def compute_iou(pred_mask, gt_mask, ignore_mask=None, keep_ignore: bool = False):
    """Per-sample IoU over NHWC bool masks (reference: metrics.py:105-135)."""
    pred_mask = np.asarray(pred_mask)
    gt_mask = np.asarray(gt_mask)
    if ignore_mask is not None:
        pred_mask = np.where(np.asarray(ignore_mask), False, pred_mask)

    axes = tuple(range(1, gt_mask.ndim))
    union = np.mean(pred_mask | gt_mask, axis=axes)
    intersection = np.mean(pred_mask & gt_mask, axis=axes)
    nonzero = union > 0
    iou = intersection[nonzero] / union[nonzero]
    if not keep_ignore:
        return iou
    result = np.full_like(intersection, -1.0)
    result[nonzero] = iou
    return result


def device_iou_stats(logits, gt, thresh, step, ignore_label=-1):
    """Batch IoU at {thresh-step, thresh, thresh+step}, computed inside the
    compiled train step so only 4 scalars cross to the host (the reference
    pulls full logits to the CPU every batch, metrics.py:55-78).

    Returns (ious [3], valid) — valid is False when every gt mask is empty
    (the reference skips the update then)."""
    import jax

    pred = jax.nn.sigmoid(logits)
    gt_mask = gt > 0.5
    ignore = gt == ignore_label
    axes = tuple(range(1, gt.ndim))
    valid = jnp.any(jnp.sum(gt_mask, axis=axes) > 0)

    def iou_at(t):
        pm = (pred > t) & ~ignore
        union = jnp.mean((pm | gt_mask).astype(jnp.float32), axis=axes)
        inter = jnp.mean((pm & gt_mask).astype(jnp.float32), axis=axes)
        nonzero = union > 0
        per = jnp.where(nonzero, inter / jnp.maximum(union, 1e-12), 0.0)
        return jnp.sum(per) / jnp.maximum(jnp.sum(nonzero), 1)

    ious = jnp.stack([iou_at(thresh - step), iou_at(thresh), iou_at(thresh + step)])
    return ious, valid


class TrainMetric:
    def __init__(self, pred_outputs, gt_outputs):
        self.pred_outputs = pred_outputs
        self.gt_outputs = gt_outputs

    def update(self, *args, **kwargs):
        raise NotImplementedError

    def get_epoch_value(self):
        raise NotImplementedError

    def reset_epoch_stats(self):
        raise NotImplementedError

    def log_states(self, sw, tag_prefix, global_step):
        pass

    @property
    def name(self):
        return type(self).__name__


class AdaptiveIoU(TrainMetric):
    """IoU with an EMA-adapted binarization threshold
    (reference: metrics.py:32-102)."""

    def __init__(
        self,
        init_thresh: float = 0.4,
        thresh_step: float = 0.025,
        thresh_beta: float = 0.99,
        iou_beta: float = 0.9,
        ignore_label: int = -1,
        from_logits: bool = True,
        pred_output: str = "instances",
        gt_output: str = "instances",
    ) -> None:
        super().__init__(pred_outputs=(pred_output,), gt_outputs=(gt_output,))
        self._ignore_label = ignore_label
        self._from_logits = from_logits
        self._iou_thresh = init_thresh
        self._thresh_step = thresh_step
        self._thresh_beta = thresh_beta
        self._iou_beta = iou_beta
        self._ema_iou = 0.0
        self._epoch_iou_sum = 0.0
        self._epoch_batch_count = 0

    def update(self, pred, gt) -> None:
        pred = np.asarray(pred)
        gt = np.asarray(gt)
        gt_mask = gt > 0.5
        if self._from_logits:
            pred = 1.0 / (1.0 + np.exp(-pred))

        axes = tuple(range(1, gt_mask.ndim))
        if np.all(gt_mask.sum(axis=axes) == 0):
            return

        ignore_mask = gt == self._ignore_label
        max_iou = compute_iou(pred > self._iou_thresh, gt_mask, ignore_mask).mean()
        best_thresh = self._iou_thresh
        for t in (best_thresh - self._thresh_step, best_thresh + self._thresh_step):
            temp_iou = compute_iou(pred > t, gt_mask, ignore_mask).mean()
            if temp_iou > max_iou:
                max_iou = temp_iou
                best_thresh = t

        self._iou_thresh = (
            self._thresh_beta * self._iou_thresh + (1 - self._thresh_beta) * best_thresh
        )
        self._ema_iou = self._iou_beta * self._ema_iou + (1 - self._iou_beta) * max_iou
        self._epoch_iou_sum += max_iou
        self._epoch_batch_count += 1

    def update_from_stats(self, ious, valid: bool) -> None:
        """Device-computed variant of :meth:`update`: ious are the batch IoUs
        at (thresh-step, thresh, thresh+step) from :func:`device_iou_stats`."""
        if not valid:
            return
        lo, mid, hi = (float(x) for x in ious)
        max_iou, best_thresh = mid, self._iou_thresh
        if lo > max_iou:
            max_iou, best_thresh = lo, self._iou_thresh - self._thresh_step
        if hi > max_iou:
            max_iou, best_thresh = hi, self._iou_thresh + self._thresh_step
        self._iou_thresh = (
            self._thresh_beta * self._iou_thresh + (1 - self._thresh_beta) * best_thresh
        )
        self._ema_iou = self._iou_beta * self._ema_iou + (1 - self._iou_beta) * max_iou
        self._epoch_iou_sum += max_iou
        self._epoch_batch_count += 1

    def get_epoch_value(self) -> float:
        if self._epoch_batch_count > 0:
            return self._epoch_iou_sum / self._epoch_batch_count
        return 0.0

    def reset_epoch_stats(self) -> None:
        self._epoch_iou_sum = 0.0
        self._epoch_batch_count = 0

    def log_states(self, sw, tag_prefix, global_step) -> None:
        sw.add_scalar(tag=tag_prefix + "_ema_iou", value=self._ema_iou,
                      global_step=global_step)
        sw.add_scalar(tag=tag_prefix + "_iou_thresh", value=self._iou_thresh,
                      global_step=global_step)

    @property
    def iou_thresh(self) -> float:
        return self._iou_thresh
