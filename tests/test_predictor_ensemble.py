"""Click-wise model ensembles in TPUPredictor
(reference: core/inference/predictors/base_predictor.py:38-44,72-81)."""

import jax
import numpy as np
import pytest

from isegprobe_tpu.inference.clicker import Click, Clicker
from isegprobe_tpu.inference.predictor import TPUPredictor
from isegprobe_tpu.models.probe_model import iSegProbeModel


@pytest.fixture(scope="module")
def model_and_two_params():
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
        use_disks=True, norm_radius=5, with_prev_mask=True, attn_impl="jnp",
    )
    image = np.zeros((1, 56, 56, 4), dtype=np.float32)
    points = np.full((1, 4, 3), -1.0, dtype=np.float32)
    params_a = model.init(jax.random.PRNGKey(0), image, points)["params"]
    params_b = model.init(jax.random.PRNGKey(7), image, points)["params"]
    return model, params_a, params_b


def _drive(predictor, img, clicks):
    predictor.set_input_image(img)
    clicker = Clicker()
    preds = []
    for y, x, pos in clicks:
        clicker.add_click(Click(is_positive=pos, coords=(y, x)))
        preds.append(predictor.get_prediction(clicker).copy())
    return preds


def test_ensemble_switches_member_by_click_count(model_and_two_params):
    model, pa, pb = model_and_two_params
    rng = np.random.default_rng(0)
    img = (rng.random((56, 56, 3)) * 255).astype(np.uint8)
    clicks = [(20, 20, True), (40, 40, False)]

    kw = dict(target_size=(56, 56), with_flip=False, net_clicks_limit=4)
    plain_a = _drive(TPUPredictor(model, pa, **kw), img, clicks)
    ens = TPUPredictor(model, pa, click_models=[pa, pb], **kw)
    ens_preds = _drive(ens, img, clicks)

    # click 1 served by member 0 == plain params_a
    np.testing.assert_allclose(ens_preds[0], plain_a[0], atol=1e-6)
    # click 2 switched to member 1
    assert ens._active_slot == 1
    assert not np.allclose(ens_preds[1], plain_a[1], atol=1e-4)


def test_ensemble_of_identical_members_is_neutral(model_and_two_params):
    model, pa, _ = model_and_two_params
    rng = np.random.default_rng(1)
    img = (rng.random((56, 56, 3)) * 255).astype(np.uint8)
    clicks = [(15, 30, True), (45, 10, False), (28, 28, True)]

    kw = dict(target_size=(56, 56), with_flip=False, net_clicks_limit=4)
    plain = _drive(TPUPredictor(model, pa, **kw), img, clicks)
    ens = _drive(TPUPredictor(model, pa, click_models=[pa, pa, pa], **kw),
                 img, clicks)
    for p, e in zip(plain, ens):
        np.testing.assert_allclose(e, p, atol=1e-6)
