"""Multi-process launch semantics, pinned in one process.

The real multi-host rendezvous needs N hosts (and this environment's JAX
shim blocks loopback multi-process CPU), so these tests pin every
rank-dependent decision the launch path makes: the env-var init gate
(parallel/mesh.maybe_init_distributed), rank-strided loading + per-process
batch accounting, the process-local global-batch assembly, and rank-0-only
checkpoint writes. docs/SCALING.md documents the launch recipe these
semantics add up to. (reference analogue: core/utils/exp.py:33-36 +
core/utils/distributed.py:8-78)
"""

import types

import jax
import numpy as np
import pytest

from isegprobe_tpu.data.loader import DataLoader
from isegprobe_tpu.parallel.mesh import (
    make_mesh,
    maybe_init_distributed,
    put_global_batch,
    shard_batch,
)


def test_init_gate_noop_without_env(monkeypatch):
    for var in ("ISEG_COORDINATOR", "ISEG_NUM_PROCESSES", "ISEG_PROCESS_ID",
                "ISEG_DISTRIBUTED"):
        monkeypatch.delenv(var, raising=False)
    called = []
    monkeypatch.setattr(jax.distributed, "initialize",
                        lambda *a, **k: called.append((a, k)))
    assert maybe_init_distributed() is False
    assert not called, "initialize must not run without a coordinator env"


def test_init_gate_explicit_coordinator(monkeypatch):
    monkeypatch.setenv("ISEG_COORDINATOR", "10.0.0.7:8476")
    monkeypatch.setenv("ISEG_NUM_PROCESSES", "4")
    monkeypatch.setenv("ISEG_PROCESS_ID", "2")
    called = []
    monkeypatch.setattr(jax.distributed, "initialize",
                        lambda **k: called.append(k))
    assert maybe_init_distributed() is True
    assert called == [dict(coordinator_address="10.0.0.7:8476",
                           num_processes=4, process_id=2)]


def test_init_gate_auto(monkeypatch):
    monkeypatch.delenv("ISEG_COORDINATOR", raising=False)
    monkeypatch.setenv("ISEG_DISTRIBUTED", "auto")
    called = []
    monkeypatch.setattr(jax.distributed, "initialize",
                        lambda **k: called.append(k))
    assert maybe_init_distributed() is True
    assert called == [{}], "auto mode defers detection to jax itself"


class _CountingDataset:
    def __init__(self, n):
        self.n = n

    def __len__(self):
        return self.n

    def __getitem__(self, i):
        return {"index": np.asarray([i], np.int64)}


def test_loader_rank_striding_partitions_batches():
    """Two ranks: disjoint index shards, identical per-(seed, epoch) shuffle,
    per-process step count = total // world — the DistributedSampler
    contract the trainer's batch accounting relies on."""
    n, bs = 32, 4
    loaders = [
        DataLoader(_CountingDataset(n), batch_size=bs, shuffle=True,
                   num_workers=1, seed=3, rank=r, world=2)
        for r in (0, 1)
    ]
    assert len(loaders[0]) == len(loaders[1]) == n // 2 // bs

    seen = [set(), set()]
    for r, loader in enumerate(loaders):
        for batch in loader:
            assert batch["index"].shape == (bs, 1)
            seen[r].update(int(v) for v in batch["index"].ravel())
    assert seen[0] & seen[1] == set(), "ranks must load disjoint shards"
    assert seen[0] | seen[1] == set(range(n)), "shards must cover the dataset"


def test_put_global_batch_multiprocess_path_matches_device_put():
    """The multi-host assembly path (make_array_from_process_local_data) must
    produce the same global array as plain device_put in a 1-process world —
    pinning that the trainer's multi-process branch is sound."""
    mesh = make_mesh()
    batch = {
        "images": np.random.default_rng(0).random((8, 6, 6, 3), np.float32),
        "points": np.full((8, 4, 3), -1.0, np.float32),
    }
    single = shard_batch(batch, mesh)
    multi = put_global_batch(batch, mesh, multiprocess=True)
    for k in batch:
        assert multi[k].shape == single[k].shape
        assert multi[k].sharding.is_equivalent_to(single[k].sharding,
                                                  multi[k].ndim)
        np.testing.assert_array_equal(np.asarray(multi[k]),
                                      np.asarray(single[k]))


def test_non_master_skips_checkpoint_writes(tmp_path):
    """Rank-0-only checkpointing: a non-master trainer must finish an epoch
    without writing any checkpoint; flipping master on writes it."""
    from isegprobe_tpu.models.probe_model import iSegProbeModel
    from isegprobe_tpu.training.losses import NormalizedFocalLossSigmoid
    from isegprobe_tpu.training.trainer import iSegTrainer
    from tests.test_trainer import TinyDataset

    model = iSegProbeModel(
        backbone_cfg=dict(type="dinov2",
                          params=dict(feats_injection_mode="before_backbone")),
        embed_coords_cfg=dict(
            type="patchEmbed",
            params=dict(img_size=(28, 28), patch_size=(14, 14), embed_dim=384),
        ),
        head_cfg=dict(type="convhead",
                      params=dict(in_channels=384, num_layers=1, num_classes=1)),
        upsampler_cfg=dict(type="identity", params=dict()),
        use_disks=True,
        norm_radius=5,
        with_prev_mask=True,
        attn_impl="jnp",
    )
    cfg = types.SimpleNamespace(
        dataloader=types.SimpleNamespace(batch_size=8, val_batch_size=8,
                                         workers=1),
        training=types.SimpleNamespace(start_epoch=0, weights=None),
        CHECKPOINTS_PATH=str(tmp_path / "ckpts"),
        LOGS_PATH=None,
    )
    trainer = iSegTrainer(
        model, cfg,
        loss_cfg={"instance_loss":
                  NormalizedFocalLossSigmoid(alpha=0.5, gamma=2),
                  "instance_loss_weight": 1.0},
        trainset=TinyDataset(n=8), valset=TinyDataset(n=8),
        optimizer_params={"lr": 1e-4}, max_num_next_clicks=0,
        image_dump_interval=-1,
    )
    trainer.is_master = False
    trainer.training(epoch=0)
    ckpt_dir = tmp_path / "ckpts"
    assert not list(ckpt_dir.glob("*.ckpt")), \
        "non-master rank must not write checkpoints"

    trainer.is_master = True
    trainer.save_checkpoint(epoch=0)
    assert (ckpt_dir / "last_checkpoint.ckpt").exists()
