"""On-device NoC loop vs the host clicker+predictor protocol: IoU trajectories
must match on the same model/weights."""

import jax
import numpy as np
import pytest

from isegprobe_tpu.inference.device_eval import (
    evaluate_sample_device,
    make_device_evaluator,
)
from isegprobe_tpu.inference.evaluation import evaluate_sample
from isegprobe_tpu.inference.predictor import TPUPredictor
from isegprobe_tpu.models.probe_model import iSegProbeModel


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


def _scene(seed):
    rng = np.random.default_rng(seed)
    img = (rng.random((60, 70, 3)) * 70).astype(np.uint8)
    gt = np.zeros((60, 70), np.int32)
    gt[15:45, 20:60] = 1
    img[gt == 1] = [185, 175, 85]
    return img, gt


@pytest.mark.parametrize("seed", [0, 5])
def test_device_loop_matches_host_protocol(model_and_params, seed):
    model, params = model_and_params
    img, gt = _scene(seed)
    max_clicks = 4

    host_pred = TPUPredictor(model, params, target_size=(56, 56),
                             with_flip=True, net_clicks_limit=max_clicks)
    _, host_ious, _ = evaluate_sample(
        img, gt, host_pred, max_iou_thr=0.95, pred_thr=0.49,
        max_clicks=max_clicks,
    )

    run = make_device_evaluator(
        model, target_size=(56, 56), max_clicks=max_clicks,
        net_clicks_limit=max_clicks, pred_thr=0.49, target_iou=0.95,
        with_flip=True,
    )
    dev_ious = evaluate_sample_device(run, params, img, gt)

    assert len(dev_ious) == len(host_ious), (
        f"click counts diverge: host {len(host_ious)} vs device {len(dev_ious)}"
    )
    np.testing.assert_allclose(dev_ious, host_ious, rtol=1e-3, atol=1e-3)


def test_device_loop_honors_min_clicks(model_and_params):
    """The reference gates early stopping on a minimum click count
    (evaluation.py:85); the compiled loop must do the same."""
    model, params = model_and_params
    img, gt = _scene(0)
    min_clicks, max_clicks = 3, 5
    # target_iou=0 -> the stop condition holds from click 1; only the
    # min-click gate keeps both protocols clicking
    host_pred = TPUPredictor(model, params, target_size=(56, 56),
                             with_flip=True, net_clicks_limit=max_clicks)
    _, host_ious, _ = evaluate_sample(
        img, gt, host_pred, max_iou_thr=0.0, pred_thr=0.49,
        max_clicks=max_clicks, min_clicks=min_clicks,
    )
    run = make_device_evaluator(
        model, target_size=(56, 56), max_clicks=max_clicks,
        net_clicks_limit=max_clicks, pred_thr=0.49, target_iou=0.0,
        min_clicks=min_clicks, with_flip=True,
    )
    dev_ious = evaluate_sample_device(run, params, img, gt)
    assert len(host_ious) == len(dev_ious) == min_clicks
    np.testing.assert_allclose(dev_ious, host_ious, rtol=1e-3, atol=1e-3)


def test_device_loop_net_clicks_limit_truncation(model_and_params):
    """clicks_limit < n_clicks: the reference keeps only the FIRST
    net_clicks_limit clicks chronologically (for the model AND ZoomIn) while
    the clicker keeps clicking — both our paths must reproduce that, not
    clamp-overwrite the newest kept click."""
    model, params = model_and_params
    img, gt = _scene(5)
    max_clicks, limit = 4, 2

    host_pred = TPUPredictor(model, params, target_size=(56, 56),
                             with_flip=True, net_clicks_limit=limit)
    _, host_ious, _ = evaluate_sample(
        img, gt, host_pred, max_iou_thr=0.99, pred_thr=0.49,
        max_clicks=max_clicks,
    )
    run = make_device_evaluator(
        model, target_size=(56, 56), max_clicks=max_clicks,
        net_clicks_limit=limit, pred_thr=0.49, target_iou=0.99,
        with_flip=True,
    )
    dev_ious = evaluate_sample_device(run, params, img, gt)
    assert len(dev_ious) == len(host_ious)
    np.testing.assert_allclose(dev_ious, host_ious, rtol=1e-3, atol=1e-3)


def test_batched_device_loop_matches_single(model_and_params):
    """vmap'd whole-protocol evaluator must reproduce the single-sample
    trajectories exactly, including early-stopped lanes (done-masking)."""
    from isegprobe_tpu.inference.device_eval import evaluate_dataset_device

    model, params = model_and_params
    max_clicks = 4
    common = dict(target_size=(56, 56), max_clicks=max_clicks,
                  net_clicks_limit=max_clicks, pred_thr=0.49, target_iou=0.80,
                  with_flip=True)
    run1 = make_device_evaluator(model, **common)
    runB = make_device_evaluator(model, batch_size=3, **common)

    class _DS:
        def __init__(self, seeds):
            self.seeds = seeds

        def __len__(self):
            return len(self.seeds)

        def get_sample(self, i):
            class S:
                pass

            img, gt = _scene(self.seeds[i])
            s = S()
            s.image, s.objects_ids = img, [1]
            s.gt_mask = lambda _oid, g=gt: g
            return s

    ds = _DS([0, 3, 5, 7, 11])  # 5 jobs -> one full batch + padded tail
    singles = evaluate_dataset_device(run1, params, ds)
    times: list = []
    batched = evaluate_dataset_device(runB, params, ds, batch_size=3,
                                      sample_times=times)
    assert len(batched) == len(singles) == 5
    assert len(times) == 5 and all(t > 0 for t in times)
    for a, b in zip(singles, batched):
        assert len(a) == len(b), "batched lane stopped at a different click"
        np.testing.assert_allclose(a, b, rtol=1e-4, atol=1e-4)


@pytest.fixture(scope="module")
def late_model_and_params():
    """after_backbone injection: the frozen trunk is click-independent, so the
    device loop caches it across clicks (recompute only on ROI change)."""
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


def test_cached_trunk_loop_matches_uncached_and_host(late_model_and_params):
    """Trunk-cached device loop (the default for late injection) must
    reproduce both the uncached device loop and the host protocol."""
    model, params = late_model_and_params
    max_clicks = 4
    common = dict(target_size=(56, 56), max_clicks=max_clicks,
                  net_clicks_limit=max_clicks, pred_thr=0.49, target_iou=0.95,
                  with_flip=True)

    run_auto = make_device_evaluator(model, **common)  # auto -> cached
    run_off = make_device_evaluator(model, trunk_cache="off", **common)

    for seed in (0, 5):
        img, gt = _scene(seed)
        cached = evaluate_sample_device(run_auto, params, img, gt)
        uncached = evaluate_sample_device(run_off, params, img, gt)
        assert len(cached) == len(uncached), (
            f"seed {seed}: cached loop stopped at a different click")
        np.testing.assert_allclose(cached, uncached, rtol=1e-4, atol=1e-4)

        host_pred = TPUPredictor(model, params, target_size=(56, 56),
                                 with_flip=True, net_clicks_limit=max_clicks)
        _, host_ious, _ = evaluate_sample(
            img, gt, host_pred, max_iou_thr=0.95, pred_thr=0.49,
            max_clicks=max_clicks,
        )
        assert len(cached) == len(host_ious)
        np.testing.assert_allclose(cached, host_ious, rtol=1e-3, atol=1e-3)

    with pytest.raises(ValueError):
        # early injection cannot force the cache on: trunk depends on clicks
        make_device_evaluator(
            iSegProbeModel(
                backbone_cfg=dict(
                    type="dinov2",
                    params=dict(feats_injection_mode="before_backbone")),
                embed_coords_cfg=dict(
                    type="patchEmbed",
                    params=dict(img_size=(56, 56), patch_size=(14, 14),
                                embed_dim=384)),
                head_cfg=dict(type="convhead",
                              params=dict(in_channels=384, num_layers=1,
                                          num_classes=1)),
            ),
            trunk_cache="on", **common)


def test_cached_trunk_batched_matches_single(late_model_and_params):
    """Batched cached loop: the batch-level recompute predicate (any active
    lane's ROI changed) must preserve every lane's exact trajectory."""
    from isegprobe_tpu.inference.device_eval import evaluate_dataset_device

    model, params = late_model_and_params
    max_clicks = 4
    common = dict(target_size=(56, 56), max_clicks=max_clicks,
                  net_clicks_limit=max_clicks, pred_thr=0.49, target_iou=0.80,
                  with_flip=True)
    run1 = make_device_evaluator(model, **common)
    runB = make_device_evaluator(model, batch_size=3, **common)

    class _DS:
        def __init__(self, seeds):
            self.seeds = seeds

        def __len__(self):
            return len(self.seeds)

        def get_sample(self, i):
            class S:
                pass

            img, gt = _scene(self.seeds[i])
            s = S()
            s.image, s.objects_ids = img, [1]
            s.gt_mask = lambda _oid, g=gt: g
            return s

    ds = _DS([0, 3, 5, 7])
    singles = evaluate_dataset_device(run1, params, ds)
    batched = evaluate_dataset_device(runB, params, ds, batch_size=3)
    assert len(batched) == len(singles) == 4
    for a, b in zip(singles, batched):
        assert len(a) == len(b), "batched lane stopped at a different click"
        np.testing.assert_allclose(a, b, rtol=1e-4, atol=1e-4)


def test_mesh_sharded_device_loop_matches_single(model_and_params):
    """Dataset eval sharded over the 8-device mesh (sample axis on `data`)
    must reproduce the unsharded batched trajectories — NoC evaluation scales
    across chips with zero in-loop communication."""
    from isegprobe_tpu.inference.device_eval import evaluate_dataset_device
    from isegprobe_tpu.parallel.mesh import make_mesh

    model, params = model_and_params
    assert len(jax.devices()) == 8, "suite must run on the virtual 8-dev mesh"
    mesh = make_mesh()
    max_clicks = 3
    common = dict(target_size=(56, 56), max_clicks=max_clicks,
                  net_clicks_limit=max_clicks, pred_thr=0.49, target_iou=0.80,
                  with_flip=True)
    run1 = make_device_evaluator(model, **common)
    runM = make_device_evaluator(model, batch_size=8, mesh=mesh, **common)

    class _DS:
        def __init__(self, seeds):
            self.seeds = seeds

        def __len__(self):
            return len(self.seeds)

        def get_sample(self, i):
            class S:
                pass

            img, gt = _scene(self.seeds[i])
            s = S()
            s.image, s.objects_ids = img, [1]
            s.gt_mask = lambda _oid, g=gt: g
            return s

    ds = _DS(list(range(10)))  # one full batch of 8 + padded tail of 2
    singles = evaluate_dataset_device(run1, params, ds)
    sharded = evaluate_dataset_device(runM, params, ds, batch_size=8)
    assert len(sharded) == len(singles) == 10
    for a, b in zip(singles, sharded):
        assert len(a) == len(b), "sharded lane stopped at a different click"
        np.testing.assert_allclose(a, b, rtol=1e-4, atol=1e-4)

    with pytest.raises(ValueError):
        make_device_evaluator(model, batch_size=3, mesh=mesh, **common)
