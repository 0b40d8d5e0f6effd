"""Late-injection backbone caching: cached predictor == uncached predictor."""

import jax
import numpy as np
import pytest

from isegprobe_tpu.inference.clicker import Clicker
from isegprobe_tpu.inference.predictor import TPUPredictor
from isegprobe_tpu.models.probe_model import iSegProbeModel


@pytest.fixture(scope="module")
def model_and_params():
    model = iSegProbeModel(
        backbone_cfg=dict(type="dinov2",
                          params=dict(feats_injection_mode="after_backbone")),
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


def _scene():
    rng = np.random.default_rng(4)
    img = (rng.random((70, 80, 3)) * 70).astype(np.uint8)
    gt = np.zeros((70, 80), np.int32)
    gt[20:55, 25:65] = 1
    img[gt == 1] = [180, 170, 90]
    return img, gt


def test_cached_equals_uncached(model_and_params):
    model, params = model_and_params
    img, gt = _scene()

    cached = TPUPredictor(model, params, target_size=(56, 56), with_flip=True,
                          net_clicks_limit=4)
    assert cached.cache_backbone, "after_backbone model should enable caching"
    uncached = TPUPredictor(model, params, target_size=(56, 56),
                            with_flip=True, net_clicks_limit=4)
    uncached.cache_backbone = False

    for predictor in (cached, uncached):
        predictor.set_input_image(img)
    c1 = Clicker(gt_mask=gt)
    c2 = Clicker(gt_mask=gt)
    m1 = np.zeros_like(gt, dtype=bool)
    m2 = np.zeros_like(gt, dtype=bool)
    for _ in range(3):
        c1.make_next_click(m1)
        c2.make_next_click(m2)
        p1 = cached.get_prediction(c1)
        p2 = uncached.get_prediction(c2)
        np.testing.assert_allclose(p1, p2, rtol=1e-5, atol=1e-5)
        m1 = p1 > 0.49
        m2 = p2 > 0.49
