"""Data layer: click synthesis, augmentations, sample hierarchy, loader."""

import numpy as np
import pytest

from isegprobe_tpu.data import transforms as T
from isegprobe_tpu.data.base_dataset import iSegBaseDataset
from isegprobe_tpu.data.loader import DataLoader
from isegprobe_tpu.data.points_sampler import MultiPointSampler, generate_probs
from isegprobe_tpu.data.sample import DSample


def _sample(hw=(64, 72)):
    rng = np.random.default_rng(0)
    img = (rng.random((*hw, 3)) * 255).astype(np.uint8)
    mask = np.zeros(hw, dtype=np.int32)
    mask[10:40, 15:50] = 1
    mask[45:60, 50:70] = 2
    return DSample(img, mask, objects_ids=[1, 2], sample_id=0)


def test_generate_probs_normalized():
    p = generate_probs(24, 0.7)
    assert p.shape == (24,)
    np.testing.assert_allclose(p.sum(), 1.0)
    assert (np.diff(p) <= 0).all()  # geometric decay


def test_point_sampler_produces_valid_points():
    np.random.seed(0)
    import random

    random.seed(0)
    sampler = MultiPointSampler(max_num_points=12, prob_gamma=0.8,
                                merge_objects_prob=0.15,
                                max_num_merged_objects=2)
    sample = _sample()
    sampler.sample_object(sample)
    points = np.array(sampler.sample_points())
    assert points.shape == (24, 3)
    mask = sampler.selected_mask[0]
    h, w = mask.shape
    valid = points[points[:, 2] >= 0]
    assert len(valid) >= 1
    # positive points (first half) must land on the selected object
    for y, x, idx in points[:12]:
        if idx < 0:
            continue
        assert 0 <= y < h and 0 <= x < w
    # gt mask is one (or merged) object(s)
    assert mask.max() == 1.0


def test_point_sampler_empty_sample():
    sampler = MultiPointSampler(max_num_points=6)
    img = np.zeros((32, 32, 3), np.uint8)
    empty = DSample(img, np.zeros((32, 32), np.int32), objects_ids=[])
    sampler.sample_object(empty)
    points = np.array(sampler.sample_points())
    assert points.shape == (12, 3)
    assert sampler.selected_mask.sum() == 0


def test_augmentations_preserve_mask_alignment():
    import random

    random.seed(1)
    np.random.seed(1)
    aug = T.Compose([
        T.UniformRandomResize((0.75, 1.25)),
        T.Flip(p=1.0),
        T.RandomRotate90(p=1.0),
        T.ShiftScaleRotate(shift_limit=0.03, scale_limit=0,
                           rotate_limit=(-3, 3), p=1.0),
        T.PadIfNeeded(48, 48),
        T.RandomCrop(48, 48),
        T.RandomBrightnessContrast(p=1.0),
        T.RGBShift(p=1.0),
    ])
    sample = _sample()
    sample.augment(aug)
    assert sample.image.shape[:2] == (48, 48)
    assert sample._encoded_masks.shape[:2] == (48, 48)
    # re-augmentation resets first (no drift)
    sample.augment(aug)
    assert sample.image.shape[:2] == (48, 48)


def test_dataset_and_loader_roundtrip():
    import random

    random.seed(2)
    np.random.seed(2)

    class _DS(iSegBaseDataset):
        def __init__(self, **kw):
            super().__init__(**kw)
            self.dataset_samples = list(range(8))

        def get_sample(self, index):
            return _sample()

    ds = _DS(
        augmentator=T.Compose([T.PadIfNeeded(64, 72), T.RandomCrop(64, 72)]),
        points_sampler=MultiPointSampler(max_num_points=6),
        min_object_area=10,
    )
    item = ds[0]
    assert item["images"].shape == (64, 72, 3)
    assert item["points"].shape == (12, 3)
    assert item["instances"].shape == (64, 72, 1)

    loader = DataLoader(ds, batch_size=4, shuffle=True, num_workers=2, seed=0)
    batches = list(loader)
    assert len(batches) == 2
    assert batches[0]["images"].shape == (4, 64, 72, 3)


def test_threaded_getitem_click_mask_consistency():
    """One MultiPointSampler is shared across the thread-mode loader's
    workers; the locked critical section in __getitem__ must keep each item's
    clicks paired with its own image/mask (a race pairs one sample's image
    with another's plan). Scenes differ per index so a cross-pairing puts
    positive clicks off the item's own object."""
    from concurrent.futures import ThreadPoolExecutor

    class _DS(iSegBaseDataset):
        def __init__(self, **kw):
            super().__init__(**kw)
            self.dataset_samples = list(range(32))

        def get_sample(self, index):
            hw = (64, 72)
            img = np.full((*hw, 3), index, dtype=np.uint8)
            mask = np.zeros(hw, dtype=np.int32)
            # per-index object location: 8 distinct disjoint rectangles
            r, c = divmod(index % 8, 4)
            mask[4 + 28 * r : 24 + 28 * r, 2 + 18 * c : 14 + 18 * c] = 1
            return DSample(img, mask, objects_ids=[1], sample_id=index)

    ds = _DS(points_sampler=MultiPointSampler(max_num_points=6))

    def check(i):
        item = ds[i]
        inst = item["instances"][..., 0]
        for y, x, idx in item["points"][:6]:
            if idx < 0:
                continue
            assert inst[int(y), int(x)] > 0, (
                f"item {i}: positive click ({y},{x}) off its own object")
        return True

    with ThreadPoolExecutor(max_workers=8) as pool:
        for _ in range(4):
            assert all(pool.map(check, range(32)))


class _IndexDS:
    """Top-level so process workers can unpickle it."""

    def __init__(self, n=11):
        self.n = n

    def __len__(self):
        return self.n

    def __getitem__(self, index):
        return {"x": np.asarray([index], dtype=np.int64)}


def test_loader_process_workers_and_tail_batch():
    """Process-worker mode (dataloader.mp) must deliver the same items in the
    same order as thread mode, and drop_last=False must yield the partial
    tail batch."""
    kw = dict(batch_size=4, shuffle=True, drop_last=False, num_workers=2,
              seed=7)
    thr = DataLoader(_IndexDS(), use_processes=False, **kw)
    prc = DataLoader(_IndexDS(), use_processes=True, **kw)
    got_t = list(thr)
    got_p = list(prc)
    prc.shutdown()
    assert [b["x"].shape[0] for b in got_t] == [4, 4, 3]  # tail kept
    for bt, bp in zip(got_t, got_p):
        np.testing.assert_array_equal(bt["x"], bp["x"])


def test_compose_datasets():
    from isegprobe_tpu.data.compose_dataset import (
        ComposeDataset,
        ProportionalComposeDataset,
    )

    class _DS(iSegBaseDataset):
        def __init__(self, n):
            super().__init__()
            self.dataset_samples = list(range(n))

        def get_sample(self, index):
            return _sample()

    comp = ComposeDataset([_DS(3), _DS(5)])
    assert comp.get_samples_number() == 8
    assert isinstance(comp.get_sample(6), DSample)

    prop = ProportionalComposeDataset([_DS(3), _DS(5)], ratios=[0.3, 0.7])
    assert isinstance(prop.get_sample(0), DSample)


def test_multihost_rank_striding():
    """Rank-strided sharding semantics (reference DistributedSampler contract,
    core/utils/distributed.py:56-63): disjoint per-rank shards that cover the
    permutation, identical across ranks for a given epoch, re-permuted by
    set_epoch."""

    class _DS(iSegBaseDataset):
        def __init__(self):
            super().__init__()
            self.dataset_samples = list(range(37))

        def __getitem__(self, index):
            return {"x": np.asarray([index], dtype=np.int64)}

    world = 4
    loaders = [
        DataLoader(_DS(), batch_size=2, shuffle=True, num_workers=1, seed=5,
                   rank=r, world=world)
        for r in range(world)
    ]
    for ld in loaders:
        ld.set_epoch(3)
        assert len(ld) == (37 // world) // 2

    shards = [[int(b["x"][i, 0]) for b in ld for i in range(b["x"].shape[0])]
              for ld in loaders]
    flat = [i for s in shards for i in s]
    assert len(flat) == len(set(flat)), "rank shards overlap"
    # per-rank batch accounting: every rank sees the same number of batches
    assert len({len(s) for s in shards}) == 1

    # same epoch -> same shard; different epoch -> different permutation
    loaders[0].set_epoch(3)
    again = [int(b["x"][i, 0]) for b in loaders[0] for i in range(2)]
    assert again == shards[0]
    loaders[0].set_epoch(4)
    other = [int(b["x"][i, 0]) for b in loaders[0] for i in range(2)]
    assert other != shards[0]


def test_dsample_with_negative_ignore_labels():
    """GrabCut-style masks carry -1 ignore regions; area accounting must
    ignore them instead of crashing (bincount rejects negatives)."""
    img = np.zeros((32, 32, 3), np.uint8)
    mask = np.zeros((32, 32), np.int32)
    mask[5:20, 5:20] = 1
    mask[0:3, 0:3] = -1
    s = DSample(img, mask, objects_ids=[1], ignore_ids=[-1])
    assert s.objects_ids == [0]  # internal node id for the single object
    assert s.nodes[0].area == 15 * 15
    gt = s.gt_mask(0)
    assert (gt == -1).sum() == 9 and (gt == 1).sum() == 15 * 15
