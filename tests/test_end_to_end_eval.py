"""End-to-end NoC evaluation slice on a synthetic mini-dataset: clicker +
fixed-ZoomIn predictor + compiled click step + metrics (SURVEY.md §7 stage 4).
"""

import numpy as np
import pytest

from isegprobe_tpu.data.sample import DSample
from isegprobe_tpu.inference.evaluation import evaluate_dataset, evaluate_sample
from isegprobe_tpu.inference.metrics import (
    compute_noc_metric,
    get_results_table,
    get_time_metrics,
    miou_at_k,
)
from isegprobe_tpu.inference.predictor import TPUPredictor
from isegprobe_tpu.models.probe_model import iSegProbeModel


class SyntheticDataset:
    """Three images, each with one bright rectangular object on dark noise."""

    def __init__(self, n=2, hw=(100, 120)):
        self.samples = []
        rng = np.random.default_rng(0)
        for i in range(n):
            h, w = hw
            img = (rng.random((h, w, 3)) * 60).astype(np.uint8)
            mask = np.zeros((h, w), dtype=np.int32)
            r0, c0 = 20 + 10 * i, 30 + 5 * i
            mask[r0 : r0 + 40, c0 : c0 + 50] = 1
            img[mask == 1] = [200, 180, 90]
            self.samples.append(DSample(img, mask, objects_ids=[1], sample_id=i))

    def __len__(self):
        return len(self.samples)

    def get_sample(self, i):
        return self.samples[i]


@pytest.fixture(scope="module")
def predictor():
    import jax

    model = iSegProbeModel(
        backbone_cfg=dict(type="dinov2",
                          params=dict(feats_injection_mode="before_backbone")),
        embed_coords_cfg=dict(
            type="patchEmbed",
            params=dict(img_size=(112, 112), patch_size=(14, 14), embed_dim=384),
        ),
        head_cfg=dict(type="convhead",
                      params=dict(in_channels=384, num_layers=2, num_classes=1)),
        upsampler_cfg=dict(type="identity", params=dict()),
        use_disks=True,
        norm_radius=5,
        with_prev_mask=True,
        attn_impl="jnp",
    )
    image = np.zeros((1, 112, 112, 4), dtype=np.float32)
    points = np.full((1, 4, 3), -1.0, dtype=np.float32)
    params = model.init(jax.random.PRNGKey(0), image, points)["params"]
    return TPUPredictor(model, params, target_size=(112, 112), with_flip=True,
                        net_clicks_limit=5)


def test_evaluate_sample_protocol(predictor):
    ds = SyntheticDataset(n=1)
    sample = ds.get_sample(0)
    gt = sample.gt_mask(sample.objects_ids[0])

    clicks, ious, probs = evaluate_sample(
        sample.image, gt, predictor, max_iou_thr=0.99, max_clicks=3
    )
    # first simulated click must be positive and at the deepest object point
    assert clicks[0].is_positive
    y, x = clicks[0].coords
    assert gt[int(y), int(x)] == 1
    assert probs.shape == gt.shape
    assert 1 <= len(ious) <= 3
    assert np.isfinite(probs).all()
    # clicks never repeat a pixel
    assert len({c.coords for c in clicks}) == len(clicks)


def test_evaluate_dataset_and_metrics(predictor):
    ds = SyntheticDataset(n=2)
    all_ious, elapsed = evaluate_dataset(
        ds, predictor, max_iou_thr=0.99, max_clicks=2
    )
    assert len(all_ious) == 2
    noc, noc_std, over_max = compute_noc_metric(all_ious, [0.8, 0.85, 0.9], 2)
    assert len(noc) == 3
    spc, spi = get_time_metrics(all_ious, elapsed)
    assert spc > 0 and spi > 0
    table = get_results_table(noc, over_max, "NoBRS", "Synthetic", spc, elapsed,
                              n_clicks=2, model_name="random-init")
    assert "NoC@80%" in table and "Synthetic" in table
    miou = miou_at_k(all_ious, 2)
    assert miou.shape == (2,)


def test_determinism(predictor):
    ds = SyntheticDataset(n=1)
    sample = ds.get_sample(0)
    gt = sample.gt_mask(sample.objects_ids[0])
    _, ious1, p1 = evaluate_sample(sample.image, gt, predictor, 0.99, max_clicks=2)
    _, ious2, p2 = evaluate_sample(sample.image, gt, predictor, 0.99, max_clicks=2)
    np.testing.assert_array_equal(ious1, ious2)
    np.testing.assert_array_equal(p1, p2)
