"""BRS predictors: f-BRS scale/bias and input-BRS optimization smoke tests."""

import jax
import numpy as np
import pytest

from isegprobe_tpu.inference.brs import brs_mask_loss, get_predictor
from isegprobe_tpu.inference.clicker import Click, Clicker
from isegprobe_tpu.models.probe_model import iSegProbeModel

import jax.numpy as jnp


@pytest.fixture(scope="module")
def model_and_params():
    model = iSegProbeModel(
        backbone_cfg=dict(type="dinov2",
                          params=dict(feats_injection_mode="before_backbone")),
        embed_coords_cfg=dict(
            type="patchEmbed",
            params=dict(img_size=(56, 56), patch_size=(14, 14), embed_dim=384),
        ),
        head_cfg=dict(type="convhead",
                      params=dict(in_channels=384, num_layers=1, num_classes=1)),
        upsampler_cfg=dict(type="identity", params=dict()),
        use_disks=True,
        norm_radius=5,
        with_prev_mask=True,
        attn_impl="jnp",
    )
    image = np.zeros((1, 56, 56, 4), dtype=np.float32)
    points = np.full((1, 4, 3), -1.0, dtype=np.float32)
    params = model.init(jax.random.PRNGKey(0), image, points)["params"]
    return model, params


def _image():
    rng = np.random.default_rng(0)
    img = (rng.random((60, 70, 3)) * 60).astype(np.uint8)
    img[20:45, 25:55] = [200, 180, 90]
    return img


def test_brs_mask_loss_basics():
    result = jnp.zeros((1, 8, 8, 1))
    pos = jnp.zeros((1, 8, 8, 1)).at[0, 2, 2, 0].set(1.0)
    neg = jnp.zeros((1, 8, 8, 1)).at[0, 6, 6, 0].set(1.0)
    loss, fpos, fneg = brs_mask_loss(result, pos, neg)
    # result=0 violates the positive click fully, satisfies the negative
    assert float(fpos) == 1.0 and float(fneg) == 0.0
    assert float(loss) == pytest.approx(1.0, abs=1e-4)


@pytest.mark.parametrize("mode", ["f-BRS-B", "DistMap-BRS"])
def test_brs_predictor_runs(model_and_params, mode):
    model, params = model_and_params
    predictor = get_predictor(
        model, params, brs_mode=mode, with_flip=False,
        zoom_in_params={"target_size": (56, 56), "skip_clicks": -1},
        lbfgs_params={"maxfun": 2},
    )
    img = _image()
    predictor.set_input_image(img)
    clicker = Clicker(gt_mask=(np.zeros(img.shape[:2], np.int32)))
    clicker.add_click(Click(is_positive=True, coords=(30, 40)))
    probs1 = predictor.get_prediction(clicker)
    assert probs1.shape == img.shape[:2]
    clicker.add_click(Click(is_positive=False, coords=(5, 5)))
    probs2 = predictor.get_prediction(clicker)  # optimization kicks in
    assert np.isfinite(probs2).all()
    assert predictor.opt_data is not None


def test_nobrs_factory(model_and_params):
    model, params = model_and_params
    predictor = get_predictor(
        model, params, brs_mode="NoBRS", with_flip=True,
        zoom_in_params={"target_size": (56, 56), "skip_clicks": -1},
    )
    from isegprobe_tpu.inference.predictor import TPUPredictor

    assert isinstance(predictor, TPUPredictor)


def test_oracle_mask_loss_brs(model_and_params):
    """Oracle-analysis BRS: optimizing BCE against the GT mask must push the
    prediction toward the GT (reference: brs_losses.py:35-68)."""
    from isegprobe_tpu.inference.brs import OracleMaskLoss, get_predictor
    from isegprobe_tpu.inference.clicker import Click, Clicker
    from isegprobe_tpu.inference.evaluation import get_iou

    model, params = model_and_params
    rng = np.random.default_rng(0)
    img = (rng.random((56, 56, 3)) * 70).astype(np.uint8)
    gt = np.zeros((56, 56), np.int32)
    gt[14:42, 10:46] = 1
    img[gt == 1] = [185, 175, 85]

    oracle = OracleMaskLoss()
    pred_plain = get_predictor(
        model, params, brs_mode="f-BRS-B", prob_thresh=0.49, with_flip=False,
        zoom_in_params={"skip_clicks": -1, "target_size": (56, 56)},
        predictor_params={"net_clicks_limit": 4},
    )
    pred_oracle = get_predictor(
        model, params, brs_mode="f-BRS-B", prob_thresh=0.49, with_flip=False,
        zoom_in_params={"skip_clicks": -1, "target_size": (56, 56)},
        predictor_params={"net_clicks_limit": 4},
        brs_opt_func_params={"loss_fn": oracle},
    )
    assert oracle.predictor is pred_oracle
    oracle.set_gt_mask(gt.astype(np.float32))

    ious = {}
    for name, pred in (("plain", pred_plain), ("oracle", pred_oracle)):
        pred.set_input_image(img)
        clicker = Clicker(gt_mask=gt)
        clicker.add_click(Click(is_positive=True, coords=(28, 28)))
        pred.get_prediction(clicker)
        # BRS kicks in after optimize_after_n_clicks (=1) clicks
        clicker.add_click(Click(is_positive=False, coords=(4, 4)))
        probs = pred.get_prediction(clicker)
        ious[name] = get_iou(gt, probs > 0.49)
    # the oracle objective directly optimizes agreement with GT
    assert ious["oracle"] >= ious["plain"] - 1e-6
    assert len(oracle.history) > 0, "oracle loss never evaluated"


@pytest.mark.parametrize("mode", ["f-BRS-B", "DistMap-BRS"])
def test_brs_value_and_grad_traced_once(model_and_params, mode):
    """The L-BFGS objective must be jitted ONCE per predictor: per-click state
    (features, masks, clicks) rides through the jit arguments, so successive
    clicks reuse the compiled value-and-grad instead of retracing the full
    backbone graph each click (the reference pays a fresh autograd graph per
    L-BFGS call, brs_predictors.py:162 — this is where the rebuild wins)."""
    model, params = model_and_params
    predictor = get_predictor(
        model, params, brs_mode=mode, with_flip=False,
        zoom_in_params={"target_size": (56, 56), "skip_clicks": -1},
        lbfgs_params={"maxfun": 2},
    )
    img = _image()
    predictor.set_input_image(img)
    clicker = Clicker(gt_mask=np.zeros(img.shape[:2], np.int32))
    clicker.add_click(Click(is_positive=True, coords=(30, 40)))
    predictor.get_prediction(clicker)
    vg_first = predictor.opt_functor._value_and_grad
    assert predictor.opt_functor._vg_key is predictor._stable_logits_fn

    for coords, pos in (((5, 5), False), ((35, 45), True)):
        clicker.add_click(Click(is_positive=pos, coords=coords))
        predictor.get_prediction(clicker)
        # same jitted callable => same XLA program cache, no retrace
        assert predictor.opt_functor._value_and_grad is vg_first
