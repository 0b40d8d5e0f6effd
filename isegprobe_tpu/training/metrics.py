"""Training metrics (behavior spec: reference core/training/metrics.py:10-135).

TPU-first split: the per-batch IoU triplet is computed *inside* the compiled
train step (``device_iou_stats`` — 4 scalars cross to the host, where the
reference pulls full logits to the CPU every batch), while the EMA threshold
adaptation is a tiny host-side state machine shared by both the host and
device update paths.
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np


def compute_iou(pred_mask, gt_mask, ignore_mask=None, keep_ignore: bool = False):
    """Per-sample IoU over NHWC bool masks (ref metrics.py:105-135).
    Samples with an empty union are dropped (or returned as -1)."""
    pred_mask = np.asarray(pred_mask)
    gt_mask = np.asarray(gt_mask)
    if ignore_mask is not None:
        pred_mask = pred_mask & ~np.asarray(ignore_mask)

    per_sample_axes = tuple(range(1, gt_mask.ndim))
    union = np.mean(pred_mask | gt_mask, axis=per_sample_axes)
    inter = np.mean(pred_mask & gt_mask, axis=per_sample_axes)
    defined = union > 0
    if not keep_ignore:
        return inter[defined] / union[defined]
    out = np.full(union.shape, -1.0)
    np.divide(inter, union, out=out, where=defined)
    return out


def device_iou_stats(logits, gt, thresh, step, ignore_label=-1):
    """Batch-mean IoU at thresholds (t-step, t, t+step), jit-safe.

    Returns (ious [3], valid); valid is False when every gt mask in the batch
    is empty (the reference skips the metric update then)."""
    import jax

    prob = jax.nn.sigmoid(logits)
    gt_mask = gt > 0.5
    scoreable = gt != ignore_label
    axes = tuple(range(1, gt.ndim))
    valid = jnp.any(jnp.sum(gt_mask, axis=axes) > 0)

    def iou_at(t):
        pm = (prob > t) & scoreable
        union = jnp.mean((pm | gt_mask).astype(jnp.float32), axis=axes)
        inter = jnp.mean((pm & gt_mask).astype(jnp.float32), axis=axes)
        defined = union > 0
        per = jnp.where(defined, inter / jnp.maximum(union, 1e-12), 0.0)
        return jnp.sum(per) / jnp.maximum(jnp.sum(defined), 1)

    triplet = jnp.stack([iou_at(thresh - step), iou_at(thresh),
                         iou_at(thresh + step)])
    return triplet, valid


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
    """IoU whose binarization threshold follows an EMA of the per-batch best
    among {t-step, t, t+step} (ref metrics.py:32-102).

    Both update paths — host arrays (``update``) and the jit-computed triplet
    (``update_from_stats``) — feed the same ``_absorb`` state transition.
    """

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

    # -- state transition shared by both update paths ------------------------

    def _absorb(self, iou_triplet) -> None:
        """iou_triplet: batch IoUs at (t-step, t, t+step) for the current t."""
        lo, mid, hi = (float(v) for v in iou_triplet)
        offsets = (-self._thresh_step, 0.0, self._thresh_step)
        best = int(np.argmax([lo, mid, hi]))
        # strict improvement required to move off the center (ref :60-68)
        if (lo, mid, hi)[best] <= mid:
            best = 1
        max_iou = (lo, mid, hi)[best]
        target_thresh = self._iou_thresh + offsets[best]

        b_t, b_i = self._thresh_beta, self._iou_beta
        self._iou_thresh = b_t * self._iou_thresh + (1 - b_t) * target_thresh
        self._ema_iou = b_i * self._ema_iou + (1 - b_i) * max_iou
        self._epoch_iou_sum += max_iou
        self._epoch_batch_count += 1

    def update(self, pred, gt) -> None:
        pred = np.asarray(pred)
        gt = np.asarray(gt)
        gt_mask = gt > 0.5
        if not gt_mask.any():
            return
        if self._from_logits:
            pred = 1.0 / (1.0 + np.exp(-pred))
        ignore = gt == self._ignore_label
        triplet = [
            compute_iou(pred > t, gt_mask, ignore).mean()
            for t in (self._iou_thresh - self._thresh_step, self._iou_thresh,
                      self._iou_thresh + self._thresh_step)
        ]
        self._absorb(triplet)

    def update_from_stats(self, ious, valid: bool) -> None:
        """Device-path update: ious from :func:`device_iou_stats`."""
        if valid:
            self._absorb(ious)

    def get_epoch_value(self) -> float:
        if self._epoch_batch_count == 0:
            return 0.0
        return self._epoch_iou_sum / self._epoch_batch_count

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

    @property
    def thresh_step(self) -> float:
        return self._thresh_step
