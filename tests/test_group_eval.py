"""On-device continuous batching (group_api: job queue inside the compiled
loop) vs the lockstep and per-sample device paths: per-sample IoU trajectories
must be identical — the on-device refill changes throughput, never results.
Lanes are protocol-independent; the job queue only re-times WHEN a lane's
protocol runs, not what it computes."""

import jax
import numpy as np
import pytest

from isegprobe_tpu.inference.device_eval import (
    evaluate_dataset_device,
    evaluate_dataset_group,
    make_device_evaluator,
)
from isegprobe_tpu.models.probe_model import iSegProbeModel


def _make_model(injection):
    model = iSegProbeModel(
        backbone_cfg=dict(type="dinov2",
                          params=dict(feats_injection_mode=injection)),
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


@pytest.mark.parametrize("injection", ["before_backbone", "after_backbone"])
def test_group_matches_lockstep_trajectories(injection):
    """7 jobs through 3 lanes with on-device refill: every sample's trajectory
    and stopping click must equal the lockstep batched path's (itself pinned
    to the single-sample and host paths in test_device_eval.py). Covers
    mid-loop refills, job padding (7 -> J_pad), the final drain with idle
    lanes, and (after_backbone) the poisoned-trunk recompute on refill."""
    model, params = _make_model(injection)
    max_clicks = 4
    common = dict(target_size=(56, 56), max_clicks=max_clicks,
                  net_clicks_limit=max_clicks, pred_thr=0.49, target_iou=0.80,
                  with_flip=True)
    runB = make_device_evaluator(model, batch_size=3, **common)
    ev = make_device_evaluator(model, batch_size=3, group_api=True, **common)

    ds = _DS([0, 3, 5, 7, 11, 2, 9])
    lockstep = evaluate_dataset_device(runB, params, ds, batch_size=3)
    times: list = []
    stats: dict = {}
    group = evaluate_dataset_group(ev, params, ds, sample_times=times,
                                   stats=stats)

    assert len(group) == len(lockstep) == 7
    assert len(times) == 7 and all(t > 0 for t in times)
    assert stats["dispatches"] == 1  # the whole group is one device program
    assert stats["useful_clicks"] == sum(len(a) for a in lockstep)
    for a, b in zip(lockstep, group):
        assert len(a) == len(b), "group lane stopped at a different click"
        np.testing.assert_allclose(b, a, rtol=1e-4, atol=1e-4)

    # window smaller than the job count: mid-protocol lanes pause at the
    # window boundary and resume next dispatch — including (after_backbone)
    # a refilled lane's poisoned-trunk recompute landing in a LATER window's
    # program than the one that refilled it
    stats_w: dict = {}
    group_w = evaluate_dataset_group(ev, params, ds, stats=stats_w,
                                     max_jobs_per_dispatch=3)
    assert stats_w["dispatches"] == 3  # ceil(7/3) windows, one chain
    for a, b in zip(lockstep, group_w):
        assert len(a) == len(b), "windowed lane stopped at a different click"
        np.testing.assert_allclose(b, a, rtol=1e-4, atol=1e-4)


def test_group_smaller_than_batch():
    """A group smaller than the lane count exercises idle-from-start lanes
    (n_valid < batch) plus J padding up to batch_size."""
    model, params = _make_model("before_backbone")
    max_clicks = 3
    common = dict(target_size=(56, 56), max_clicks=max_clicks,
                  net_clicks_limit=max_clicks, pred_thr=0.49, target_iou=0.80,
                  with_flip=True)
    run1 = make_device_evaluator(model, **common)
    ev = make_device_evaluator(model, batch_size=4, group_api=True, **common)

    ds = _DS([0, 5])
    singles = evaluate_dataset_device(run1, params, ds)
    group = evaluate_dataset_group(ev, params, ds)
    assert len(group) == len(singles) == 2
    for a, b in zip(singles, group):
        assert len(a) == len(b)
        np.testing.assert_allclose(b, a, rtol=1e-4, atol=1e-4)


def test_group_multi_device_matches_single():
    """Per-device job queues (devices=...): jobs dealt round-robin across
    every visible device, each running its own queue program against a local
    params replica — trajectories must match the single-device group path
    exactly (zero cross-device communication, so this IS the multi-chip
    dataset-sweep story for the queue path)."""
    n_dev = len(jax.devices())
    if n_dev < 2:
        pytest.skip("needs the multi-device CPU mesh")
    model, params = _make_model("before_backbone")
    max_clicks = 4
    common = dict(target_size=(56, 56), max_clicks=max_clicks,
                  net_clicks_limit=max_clicks, pred_thr=0.49, target_iou=0.80,
                  with_flip=True)
    ev = make_device_evaluator(model, batch_size=2, group_api=True, **common)

    ds = _DS([0, 3, 5, 7, 11, 2, 9, 4, 8])
    single = evaluate_dataset_group(ev, params, ds)
    stats: dict = {}
    multi = evaluate_dataset_group(ev, params, ds, devices=jax.devices(),
                                   stats=stats)
    assert stats["devices"] == n_dev
    assert stats["dispatches"] > 1  # the group actually split across devices
    assert len(multi) == len(single) == 9
    for a, b in zip(single, multi):
        assert len(a) == len(b)
        np.testing.assert_allclose(b, a, rtol=1e-4, atol=1e-4)


def test_group_api_validation():
    model, params = _make_model("before_backbone")
    with pytest.raises(ValueError, match="batch_size"):
        make_device_evaluator(model, target_size=(56, 56), group_api=True)
    from isegprobe_tpu.parallel.mesh import make_mesh

    with pytest.raises(ValueError, match="mesh"):
        make_device_evaluator(model, target_size=(56, 56), batch_size=4,
                              group_api=True, mesh=make_mesh())


def test_group_loftup_and_max_jobs_split():
    """The LoftUp (banded coordinate cross-attention) family through the
    job queue, with AND without the ``max_jobs_per_dispatch`` staging cap
    (the round-4 HBM workaround for 448² serving): trajectories must match
    the lockstep path exactly in both configurations."""
    model = iSegProbeModel(
        backbone_cfg=dict(type="dinov2",
                          params=dict(feats_injection_mode="before_backbone")),
        embed_coords_cfg=dict(
            type="patchEmbed",
            params=dict(img_size=(56, 56), patch_size=(14, 14),
                        embed_dim=384)),
        head_cfg=dict(type="convhead",
                      params=dict(in_channels=384, num_layers=1,
                                  num_classes=1)),
        upsampler_cfg=dict(type="loftup", params=dict(
            n_dim=384, query_chunk_rows=16, query_chunk_min_pixels=0,
            attn_impl="jnp")),
        use_disks=True, norm_radius=5, with_prev_mask=True, attn_impl="jnp",
    )
    image = np.zeros((1, 56, 56, 4), dtype=np.float32)
    points = np.full((1, 4, 3), -1.0, dtype=np.float32)
    params = model.init(jax.random.PRNGKey(1), image, points)["params"]

    ds = _DS(list(range(5)))
    common = dict(target_size=(56, 56), max_clicks=4, net_clicks_limit=4,
                  pred_thr=0.49, target_iou=0.95, with_flip=True)
    lock = make_device_evaluator(model, batch_size=2, **common)
    group = make_device_evaluator(model, batch_size=2, group_api=True,
                                  **common)

    want = evaluate_dataset_device(lock, params, ds, batch_size=2)
    got = evaluate_dataset_group(group, params, ds)
    got_split = evaluate_dataset_group(group, params, ds,
                                       max_jobs_per_dispatch=2)
    assert len(want) == len(got) == len(got_split) == 5
    for i in range(5):
        np.testing.assert_allclose(got[i], want[i], atol=1e-5,
                                   err_msg=f"group sample {i}")
        np.testing.assert_allclose(got_split[i], want[i], atol=1e-5,
                                   err_msg=f"split sample {i}")
