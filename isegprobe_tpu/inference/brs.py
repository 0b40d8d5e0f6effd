"""Backpropagating Refinement Scheme (BRS) predictors
(reference: core/inference/predictors/brs_predictors.py, brs_optimizers.py,
brs_losses.py — marked "not part of the original evaluation",
brs_predictors.py:1-2).

Per click, BRS optimizes a small set of auxiliary variables with L-BFGS so the
prediction satisfies the clicks: Feature-BRS scales/biases the frozen backbone
features before the upsampler+head (the probe model's natural insertion
point), Input-BRS adds a trainable offset to the click maps. The loss gradient
comes from one jitted value-and-grad program; scipy's L-BFGS drives the host
loop (reference uses the same split, brs_predictors.py:162).
"""

from __future__ import annotations

import functools
from typing import Callable, Dict, List, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from scipy.optimize import fmin_l_bfgs_b

from isegprobe_tpu.inference.clicker import Click
from isegprobe_tpu.inference.predictor import TPUPredictor
from isegprobe_tpu.ops.resize import resize
from isegprobe_tpu.training.metrics import compute_iou


def brs_mask_loss(result, pos_mask, neg_mask, eps: float = 1e-5):
    """Click-consistency loss (reference: brs_losses.py:10-32).
    result/pos/neg: [B, H, W, 1]."""
    pos_diff = (1.0 - result) * pos_mask
    pos_target = jnp.sum(pos_diff**2) / (jnp.sum(pos_mask) + eps)
    neg_diff = result * neg_mask
    neg_target = jnp.sum(neg_diff**2) / (jnp.sum(neg_mask) + eps)
    loss = pos_target + neg_target
    return loss, jnp.max(jnp.abs(pos_diff)), jnp.max(jnp.abs(neg_diff))


class OracleMaskLoss:
    """BCE against the ground-truth mask instead of click consistency — the
    oracle-analysis BRS objective (reference: brs_losses.py:35-68).

    Call ``set_gt_mask`` per sample; when attached to a predictor (the factory
    sets ``self.predictor``), the GT is cropped to the current ZoomIn ROI and
    resized to the prediction before the BCE. Returns fmax values of 1.0 so
    the click-satisfaction early stop never triggers; convergence is handled
    by the optimizer's oracle plateau check instead.
    """

    def __init__(self) -> None:
        self.gt_mask = None  # [H, W] float
        self.predictor = None
        self.history: list = []

    def set_gt_mask(self, gt_mask) -> None:
        self.gt_mask = np.asarray(gt_mask, dtype=np.float32)
        self.history = []

    def __call__(self, result, pos_mask, neg_mask, eps: float = 1e-6):
        from isegprobe_tpu.ops.resize import resize

        del pos_mask, neg_mask
        gt = self.gt_mask
        roi = getattr(self.predictor, "_object_roi", None) if self.predictor \
            else None
        if roi is not None:
            r1, r2, c1, c2 = roi[:4]
            gt = gt[r1 : r2 + 1, c1 : c2 + 1]
        gt_j = resize(jnp.asarray(gt)[None, :, :, None], result.shape[1:3],
                      "bilinear", align_corners=True)
        if result.shape[0] == 2 * gt_j.shape[0]:  # flip-TTA batch doubling
            gt_j = jnp.concatenate([gt_j, gt_j[:, :, ::-1]], axis=0)
        p = jnp.clip(result, eps, 1.0 - eps)
        bce = -jnp.mean(gt_j * jnp.log(p) + (1.0 - gt_j) * jnp.log(1.0 - p))
        return bce, jnp.asarray(1.0), jnp.asarray(1.0)


class BaseOptimizer:
    """scipy-facing functor with early stop on click satisfaction and IoU
    plateau (reference: brs_optimizers.py:13-97). ``loss_fn`` swaps the
    click-consistency objective (default) for e.g. :class:`OracleMaskLoss`."""

    def __init__(
        self,
        optimizer_params: Dict,
        prob_thresh: float = 0.49,
        reg_weight: float = 1e-3,
        min_iou_diff: float = 0.01,
        with_flip: bool = False,
        flip_average: bool = False,
        loss_fn=None,
        **kwargs,
    ) -> None:
        self.optimizer_params = optimizer_params
        self.prob_thresh = prob_thresh
        self.reg_weight = reg_weight
        self.min_iou_diff = min_iou_diff
        self.with_flip = with_flip
        self.flip_average = flip_average
        self.loss_fn = loss_fn
        self.best_prediction = None
        self._value_and_grad = None
        self._vg_key = None  # logits_fn the cached value-and-grad was built on
        self._opt_shape = None
        self._best_loss = None
        self._click_args = None
        self._last_mask = None

    def init_click(self, logits_fn: Callable, pos_mask, neg_mask,
                   shape=None, aux=()) -> None:
        """``logits_fn(aux, *opt_vars)`` must be a STABLE callable (same
        object every click) — everything that varies per click rides in
        ``aux``/the masks, so the jitted value-and-grad is traced ONCE per
        predictor instead of recompiling the full backbone graph every click.
        """
        self.best_prediction = None
        self._click_args = (aux, jnp.asarray(pos_mask), jnp.asarray(neg_mask))
        self._opt_shape = shape
        self._last_mask = None
        self._best_loss = None

        if self.loss_fn is None and self._vg_key is logits_fn:
            return  # cached value-and-grad still valid

        def objective(x, aux, pos_mask_j, neg_mask_j):
            opt_vars, reg_loss = self.unpack_opt_params(x)
            logits = logits_fn(aux, *opt_vars)
            result = jax.nn.sigmoid(logits)
            if self.with_flip and self.flip_average:
                half = result.shape[0] // 2
                result = 0.5 * (result[:half] + result[half:, :, ::-1])
                pos_mask_j = pos_mask_j[:half]
                neg_mask_j = neg_mask_j[:half]
            loss_fn = self.loss_fn or brs_mask_loss
            loss, f_max_pos, f_max_neg = loss_fn(result, pos_mask_j,
                                                 neg_mask_j)
            return loss + reg_loss, (logits, result, f_max_pos, f_max_neg)

        self._value_and_grad = jax.jit(jax.value_and_grad(objective, has_aux=True))
        # OracleMaskLoss reads host state (gt crop, current ROI) at trace
        # time, so its objective must retrace every click — never cache it
        self._vg_key = logits_fn if self.loss_fn is None else None

    def __call__(self, x: np.ndarray):
        (loss, (logits, result, f_max_pos, f_max_neg)), grad = (
            self._value_and_grad(jnp.asarray(x, dtype=jnp.float32),
                                 *self._click_args)
        )
        f_val = float(loss)
        if self.best_prediction is None or f_val < self._best_loss:
            self.best_prediction = np.asarray(logits)
            self._best_loss = f_val

        if isinstance(self.loss_fn, OracleMaskLoss):
            # oracle plateau stop (reference: brs_losses.py:63-66)
            hist = self.loss_fn.history
            hist.append(f_val)
            if len(hist) > 5 and abs(hist[-5] - hist[-1]) < 1e-5:
                return [f_val, np.zeros_like(x)]

        if float(f_max_pos) < (1 - self.prob_thresh) and float(
            f_max_neg
        ) < self.prob_thresh:
            return [f_val, np.zeros_like(x)]

        current_mask = np.asarray(result) > self.prob_thresh
        if self._last_mask is not None and self.min_iou_diff > 0:
            diff_iou = compute_iou(current_mask, self._last_mask)
            if len(diff_iou) > 0 and diff_iou.mean() > 1 - self.min_iou_diff:
                return [f_val, np.zeros_like(x)]
        self._last_mask = current_mask

        return [f_val, np.asarray(grad, dtype=np.float64).ravel()]

    def unpack_opt_params(self, opt_params):
        raise NotImplementedError


class ScaleBiasOptimizer(BaseOptimizer):
    """(reference: brs_optimizers.py:114-135)"""

    def __init__(self, *args, scale_act: Optional[str] = None,
                 reg_bias_weight: float = 10.0, **kwargs) -> None:
        super().__init__(*args, **kwargs)
        self.scale_act = scale_act
        self.reg_bias_weight = reg_bias_weight

    def unpack_opt_params(self, opt_params):
        scale, bias = jnp.split(opt_params, 2)
        reg_loss = self.reg_weight * (
            jnp.sum(scale**2) + self.reg_bias_weight * jnp.sum(bias**2)
        )
        if self.scale_act == "tanh":
            scale = jnp.tanh(scale)
        elif self.scale_act == "sin":
            scale = jnp.sin(scale)
        return (1 + scale, bias), reg_loss


class InputOptimizer(BaseOptimizer):
    """(reference: brs_optimizers.py:100-111)"""

    def unpack_opt_params(self, opt_params):
        opt_params = opt_params.reshape(self._opt_shape)
        reg_loss = self.reg_weight * jnp.sum(opt_params**2)
        return (opt_params,), reg_loss


class _BRSPredictorBase(TPUPredictor):
    def __init__(self, model, params, opt_functor: BaseOptimizer,
                 optimize_after_n_clicks: int = 1, **kwargs) -> None:
        super().__init__(model, params, **kwargs)
        self.opt_functor = opt_functor
        self.optimize_after_n_clicks = optimize_after_n_clicks
        self.opt_data = None
        # ONE stable logits callable per predictor: its identity keys the
        # optimizer's cached value-and-grad (per-click state rides in aux)
        self._stable_logits_fn = functools.partial(type(self)._brs_logits,
                                                   self)
        self._feats_fn = None

    def _brs_logits(self, aux, *opt_vars):
        raise NotImplementedError

    def set_input_image(self, image) -> None:
        super().set_input_image(image)
        self.opt_data = None

    @staticmethod
    def _clicks_maps(clicks_list: List[Click], hw, radius: int = 1):
        """Binary click disks in crop coordinates
        (reference: brs_predictors.py:39-65)."""
        pos = np.zeros((1, *hw, 1), dtype=np.float32)
        neg = np.zeros((1, *hw, 1), dtype=np.float32)
        for click in clicks_list:
            y, x = int(round(click.coords[0])), int(round(click.coords[1]))
            y1, x1 = max(0, y - radius), max(0, x - radius)
            y2, x2 = y + radius + 1, x + radius + 1
            if click.is_positive:
                pos[0, y1:y2, x1:x2, 0] = 1
            else:
                neg[0, y1:y2, x1:x2, 0] = 1
        return pos, neg

    def _crop_clicks(self, clicks_list, roi):
        rmin, rmax, cmin, cmax = roi
        oh, ow = self.target_size
        out = []
        for c in clicks_list:
            ny = oh * (c.coords[0] - rmin) / (rmax - rmin + 1)
            nx = ow * (c.coords[1] - cmin) / (cmax - cmin + 1)
            out.append(c.copy(coords=(ny, nx)))
        return out

    def get_states(self):
        states = super().get_states()
        states["opt_data"] = None if self.opt_data is None else self.opt_data.copy()
        return states

    def set_states(self, states):
        super().set_states(states)
        self.opt_data = states.get("opt_data")


class FeatureBRSPredictor(_BRSPredictorBase):
    """Optimize per-channel scale/bias on the frozen backbone features before
    the upsampler+head (the probe model's 'after_backbone' insertion; the
    reference inserts at DeepLab-specific points, brs_predictors.py:78-214)."""

    insertion_mode = "after_backbone"

    def _brs_logits(self, aux, scale, bias):
        params, feats, image_norm = aux
        model = self.model
        oh, ow = self.target_size
        # dataclass attr (setup-defined upsampler_type is apply-scoped)
        upsampler_type = (model.upsampler_cfg or {"type": "bilinear"})["type"]
        f = feats * scale.reshape(1, 1, 1, -1) + bias.reshape(1, 1, 1, -1)
        up = model.apply({"params": params}, f, image_norm,
                         method=lambda m, f_, i: m.upsampler(f_, i))
        if upsampler_type != "identity" and up.shape[1:3] != (oh, ow):
            up = resize(up, (oh, ow), "bilinear", align_corners=True)
        logits = model.apply({"params": params}, up,
                             method=lambda m, u: m.head(u))
        return resize(logits, (oh, ow), "bilinear", align_corners=True)

    def get_prediction(self, clicker, prev_mask=None) -> np.ndarray:
        clicks_list = clicker.get_clicks()
        roi = self._compute_roi(clicks_list)
        points = self.get_points_nd(clicks_list)
        oh, ow = self.target_size
        h, w = self.image_hw

        # crop + backbone features (cached across the L-BFGS loop)
        inp = self.original_image
        if self.with_prev_mask:
            hp, wp = self.pad_hw
            prev_pad = np.zeros((1, hp, wp, 1), dtype=np.float32)
            prev = self.prev_prediction if prev_mask is None else prev_mask
            prev_pad[0, :h, :w, 0] = prev
            inp = jnp.concatenate([inp, jnp.asarray(prev_pad)], axis=-1)

        from isegprobe_tpu.ops.sample import crop_resize

        crop = crop_resize(inp, jnp.asarray(np.asarray(roi, np.int32)), (oh, ow))
        crop_clicks = self._crop_clicks(clicks_list, roi)
        pts = self.get_points_nd(crop_clicks)

        model, params = self.model, self.params

        if self._feats_fn is None:
            def fwd(params, crop, pts):
                image, prev = model.apply({"params": params}, crop,
                                          method=model.prepare_input)
                coord = model.apply({"params": params}, image, prev, pts,
                                    method=model.get_coord_features)
                tokens = model.apply({"params": params}, coord,
                                     method=lambda m, c: m.embed_coords(c))
                feats = model.apply({"params": params}, image, tokens,
                                    method=lambda m, i, t: m.backbone(i, t))
                return feats, image

            # jitted ONCE: everything variable flows through the arguments
            self._feats_fn = jax.jit(fwd)

        feats, image_norm = self._feats_fn(params, crop, jnp.asarray(pts))
        num_channels = feats.shape[-1]
        if self.opt_data is None or self.opt_data.size != 2 * num_channels:
            self.opt_data = np.zeros(2 * num_channels, dtype=np.float32)

        aux = (params, feats, image_norm)
        pos_mask, neg_mask = self._clicks_maps(crop_clicks, (oh, ow))
        self.opt_functor.init_click(self._stable_logits_fn, pos_mask,
                                    neg_mask, aux=aux)

        if len(clicks_list) > self.optimize_after_n_clicks:
            opt_result = fmin_l_bfgs_b(
                func=self.opt_functor, x0=self.opt_data.astype(np.float64),
                **self.opt_functor.optimizer_params,
            )
            self.opt_data = opt_result[0].astype(np.float32)

        if self.opt_functor.best_prediction is not None:
            logits = jnp.asarray(self.opt_functor.best_prediction)
        else:
            opt_vars, _ = self.opt_functor.unpack_opt_params(
                jnp.asarray(self.opt_data)
            )
            logits = self._stable_logits_fn(aux, *opt_vars)

        probs448 = jax.nn.sigmoid(logits)
        from isegprobe_tpu.ops.sample import inverse_paste

        hp, wp = self.pad_hw
        full = inverse_paste(probs448, jnp.asarray(np.asarray(roi, np.int32)),
                             jnp.zeros((1, hp, wp, 1), jnp.float32))
        probs = np.asarray(full)[0, :h, :w, 0]
        self.prev_prediction = probs
        self._prev_probs_dev = full
        return probs


class InputBRSPredictor(_BRSPredictorBase):
    """Optimize an additive offset on the click maps ('dmaps' mode) or the
    normalized input image ('rgb' mode)
    (reference: brs_predictors.py:356-451)."""

    def __init__(self, *args, optimize_target: str = "dmaps", **kwargs):
        super().__init__(*args, **kwargs)
        self.optimize_target = optimize_target

    def _brs_logits(self, aux, offset):
        params, crop, pts = aux
        model = self.model
        oh, ow = self.target_size
        image, prev = model.apply({"params": params}, crop,
                                  method=model.prepare_input)
        if self.optimize_target == "rgb":
            image = image + offset
        coord = model.apply({"params": params}, image, prev, pts,
                            method=model.get_coord_features)
        if self.optimize_target == "dmaps":
            coord = coord + offset
        out = model.apply({"params": params}, image, coord,
                          method=model.backbone_forward)
        return resize(out["instances"], (oh, ow), "bilinear",
                      align_corners=True)

    def get_prediction(self, clicker, prev_mask=None) -> np.ndarray:
        clicks_list = clicker.get_clicks()
        roi = self._compute_roi(clicks_list)
        oh, ow = self.target_size
        h, w = self.image_hw

        inp = self.original_image
        if self.with_prev_mask:
            hp, wp = self.pad_hw
            prev_pad = np.zeros((1, hp, wp, 1), dtype=np.float32)
            prev = self.prev_prediction if prev_mask is None else prev_mask
            prev_pad[0, :h, :w, 0] = prev
            inp = jnp.concatenate([inp, jnp.asarray(prev_pad)], axis=-1)

        from isegprobe_tpu.ops.sample import crop_resize, inverse_paste

        crop = crop_resize(inp, jnp.asarray(np.asarray(roi, np.int32)), (oh, ow))
        crop_clicks = self._crop_clicks(clicks_list, roi)
        pts = jnp.asarray(self.get_points_nd(crop_clicks))

        model, params = self.model, self.params
        if self.optimize_target == "dmaps":
            opt_shape = (1, oh, ow, 3 if self.with_prev_mask else 2)
        else:
            opt_shape = (1, oh, ow, 3)
        if self.opt_data is None or self.opt_data.size != int(np.prod(opt_shape)):
            self.opt_data = np.zeros(int(np.prod(opt_shape)), dtype=np.float32)
        self.opt_functor._opt_shape = opt_shape

        aux = (params, crop, pts)
        pos_mask, neg_mask = self._clicks_maps(crop_clicks, (oh, ow))
        self.opt_functor.init_click(self._stable_logits_fn, pos_mask, neg_mask,
                                    shape=opt_shape, aux=aux)

        if len(clicks_list) > self.optimize_after_n_clicks:
            opt_result = fmin_l_bfgs_b(
                func=self.opt_functor, x0=self.opt_data.astype(np.float64),
                **self.opt_functor.optimizer_params,
            )
            self.opt_data = opt_result[0].astype(np.float32)

        if self.opt_functor.best_prediction is not None:
            logits = jnp.asarray(self.opt_functor.best_prediction)
        else:
            opt_vars, _ = self.opt_functor.unpack_opt_params(
                jnp.asarray(self.opt_data)
            )
            logits = self._stable_logits_fn(aux, *opt_vars)

        probs448 = jax.nn.sigmoid(logits)
        hp, wp = self.pad_hw
        full = inverse_paste(probs448, jnp.asarray(np.asarray(roi, np.int32)),
                             jnp.zeros((1, hp, wp, 1), jnp.float32))
        probs = np.asarray(full)[0, :h, :w, 0]
        self.prev_prediction = probs
        self._prev_probs_dev = full
        return probs


def get_predictor(
    model,
    params,
    brs_mode: str = "NoBRS",
    prob_thresh: float = 0.49,
    with_flip: bool = True,
    zoom_in_params: Optional[Dict] = None,
    predictor_params: Optional[Dict] = None,
    brs_opt_func_params: Optional[Dict] = None,
    lbfgs_params: Optional[Dict] = None,
):
    """Predictor factory (reference: core/inference/predictors/__init__.py:15-119).

    ``model`` may be a tuple ``(base_model, click_models)`` to request a
    click-wise ensemble (reference: base_predictor.py:38-44) — NoBRS only."""
    click_models = None
    if isinstance(model, tuple):
        model, click_models = model
        assert brs_mode == "NoBRS", "click-model ensembles require NoBRS"
    lbfgs_params_ = {"m": 20, "factr": 0, "pgtol": 1e-8, "maxfun": 20}
    if lbfgs_params is not None:
        lbfgs_params_.update(lbfgs_params)
    lbfgs_params_["maxiter"] = 2 * lbfgs_params_["maxfun"]

    predictor_params_ = {"optimize_after_n_clicks": 1}
    if predictor_params is not None:
        predictor_params_.update(predictor_params)
    brs_opt_func_params = brs_opt_func_params or {}

    if zoom_in_params:
        known = {"target_size", "skip_clicks", "expansion_ratio",
                 "min_crop_size", "recompute_thresh_iou", "prob_thresh"}
        unknown = set(zoom_in_params) - known
        if unknown:
            raise ValueError(f"Unknown zoom_in_params keys: {sorted(unknown)}")
        zoom_kwargs = dict(zoom_in_params)
        zoom_kwargs.setdefault("target_size", (448, 448))
    else:
        # no ZoomIn: disable the object-adaptive ROI machine (the frame is
        # still resized to the predictor's fixed target size — the compiled
        # click step needs static shapes; the reference runs native-res
        # instead, a documented delta in docs/PARITY.md)
        zoom_kwargs = {"skip_clicks": 10**9}

    if brs_mode == "NoBRS":
        predictor_params_.pop("optimize_after_n_clicks", None)
        if isinstance(zoom_kwargs.get("target_size"), int):
            # SCALAR RITM target (eval_ritm + cvpr, reference
            # utils.py:292-295): aspect-preserving adaptive crops produce
            # data-dependent shapes — serve through the host transform-chain
            # predictor (one compiled forward per crop shape); the compiled
            # whole-protocol path is inference/adaptive_eval.py
            if click_models:
                raise NotImplementedError(
                    "click-model ensembles + scalar adaptive ZoomIn")
            from isegprobe_tpu.inference.predictor import (
                TransformChainPredictor,
            )
            from isegprobe_tpu.inference.transforms import (
                AddHorizontalFlip,
                SigmoidForPred,
                ZoomIn,
            )

            chain = [ZoomIn(**zoom_kwargs)]
            if with_flip:
                chain.append(AddHorizontalFlip())
            chain.append(SigmoidForPred())
            return TransformChainPredictor(
                model, params, transforms=chain,
                net_clicks_limit=predictor_params_.get(
                    "net_clicks_limit", 20),
            )
        return TPUPredictor(model, params, with_flip=with_flip,
                            click_models=click_models, **zoom_kwargs,
                            **predictor_params_)

    if brs_mode.startswith("f-BRS"):
        opt_functor = ScaleBiasOptimizer(
            prob_thresh=prob_thresh,
            with_flip=with_flip,
            optimizer_params=lbfgs_params_,
            scale_act={"f-BRS-A": None, "f-BRS-B": "tanh",
                       "f-BRS-C": "sin"}.get(brs_mode, None),
            **brs_opt_func_params,
        )
        predictor = FeatureBRSPredictor(model, params, opt_functor,
                                        with_flip=False, **zoom_kwargs,
                                        **predictor_params_)
        if isinstance(opt_functor.loss_fn, OracleMaskLoss):
            opt_functor.loss_fn.predictor = predictor
        return predictor

    if brs_mode in ("RGB-BRS", "DistMap-BRS"):
        opt_functor = InputOptimizer(
            prob_thresh=prob_thresh,
            with_flip=with_flip,
            optimizer_params=lbfgs_params_,
            **brs_opt_func_params,
        )
        predictor = InputBRSPredictor(
            model, params, opt_functor,
            optimize_target="rgb" if brs_mode == "RGB-BRS" else "dmaps",
            with_flip=False, **zoom_kwargs, **predictor_params_,
        )
        if isinstance(opt_functor.loss_fn, OracleMaskLoss):
            opt_functor.loss_fn.predictor = predictor
        return predictor

    raise ValueError(f"Unsupported BRS mode: {brs_mode}")
