"""Execution-parity for the real SBD experiment scripts (RUN_SLOW).

Round-2 verdict: the 8 ``models/sbd/**`` scripts were import-tested only.
This drives the actual reference experiment definition —
``models/sbd/dinov2/patch-embed_noup.py`` (reference:
models/sbd/dinov2/patch-embed_noup.py:145-150) — through the real CLIs on a
generated mini-SBD fixture tree in the exact on-disk format the loaders parse
(reference: core/data/datasets/sbd.py:15-131): ``img/NAME.jpg``,
``inst/NAME.mat`` with the ``GTinst.Segmentation`` instance map,
``train.txt``/``val.txt``. train.py -> checkpoint -> evaluate.py -> NoC table.
"""

import os
import subprocess
import sys
from pathlib import Path

import numpy as np
import pytest
import yaml

RUN_SLOW = os.environ.get("RUN_SLOW", "") not in ("", "0")
REPO = Path(__file__).resolve().parents[1]


def _make_sbd_tree(root: Path, n_train=8, n_val=4, seed=0):
    import cv2
    from scipy.io import savemat

    (root / "img").mkdir(parents=True)
    (root / "inst").mkdir()
    rng = np.random.default_rng(seed)
    names = {"train": [], "val": []}
    for split, n in (("train", n_train), ("val", n_val)):
        for i in range(n):
            name = f"2008_{split}{i:04d}"
            h, w = 96, 128
            img = (rng.random((h, w, 3)) * 60).astype(np.uint8)
            inst = np.zeros((h, w), np.uint8)
            # two solid instances (fill rate ~1.0 clears the thin-object
            # scrub at buggy_mask_thresh=0.08; areas clear min_object_area=80)
            r0, c0 = rng.integers(5, 30), rng.integers(5, 40)
            inst[r0:r0 + 40, c0:c0 + 45] = 1
            img[inst == 1] = [200, 180, 90]
            r1, c1 = rng.integers(55, 70), rng.integers(70, 90)
            inst[r1:r1 + 22, c1:c1 + 30] = 2
            img[inst == 2] = [40, 120, 210]
            cv2.imwrite(str(root / "img" / f"{name}.jpg"),
                        img[:, :, ::-1], [cv2.IMWRITE_JPEG_QUALITY, 95])
            savemat(str(root / "inst" / f"{name}.mat"),
                    {"GTinst": {"Segmentation": inst}})
            names[split].append(name)
    (root / "train.txt").write_text("\n".join(names["train"]) + "\n")
    (root / "val.txt").write_text("\n".join(names["val"]) + "\n")
    return root


def _run(cmd, cwd):
    env = dict(os.environ)
    env.setdefault("JAX_PLATFORMS", "cpu")
    env.setdefault("XLA_FLAGS", "--xla_force_host_platform_device_count=8")
    proc = subprocess.run(cmd, cwd=cwd, env=env, capture_output=True,
                          text=True, timeout=1800)
    assert proc.returncode == 0, (
        f"{' '.join(map(str, cmd))} failed:\n{proc.stdout[-4000:]}\n"
        f"{proc.stderr[-4000:]}")
    return proc


def test_sbd_mat_roundtrip(tmp_path):
    """The generated .mat parses through the real loader path."""
    from isegprobe_tpu.data.datasets.standard import _load_sbd_mask

    root = _make_sbd_tree(tmp_path / "sbd", n_train=1, n_val=1)
    mask = _load_sbd_mask(root / "inst" / "2008_train0000.mat")
    assert mask.shape == (96, 128)
    assert set(np.unique(mask)) == {0, 1, 2}


@pytest.mark.skipif(not RUN_SLOW, reason="RUN_SLOW e2e SBD experiment")
def test_sbd_script_trains_and_evaluates(tmp_path):
    sbd_root = _make_sbd_tree(tmp_path / "sbd")
    exps = tmp_path / "exps"

    _run(
        [sys.executable, "train.py",
         "exp.model_path=models/sbd/dinov2/patch-embed_noup.py",
         "exp.name=sbdfix",
         f"EXPS_PATH={exps}",
         f"DATASETS.SBD_PATH={sbd_root}",
         "training_params.epochs=1",
         "training_params.crop_size=[56,56]",
         "training_params.num_max_points=4",
         "training_params.lr_milestones=[1,1]",
         "training_params.do_validation=false",
         "dataloader.batch_size=4",
         "dataloader.workers=2"],
        cwd=REPO,
    )
    ckpts = list(exps.rglob("last_checkpoint.ckpt"))
    assert len(ckpts) == 1, f"expected one checkpoint, found {ckpts}"

    main_cfg = tmp_path / "main_cfg.yaml"
    main_cfg.write_text(yaml.safe_dump({
        "EXPS_PATH": str(exps),
        "INTERACTIVE_MODELS_PATH": str(tmp_path),
        "DATASETS": {"SBD_PATH": str(sbd_root)},
        "UPSAMPLERS": {},
    }))
    logs = tmp_path / "eval_logs"
    _run(
        [sys.executable, "evaluate.py",
         f"checkpoint={ckpts[0]}",
         "datasets=SBD",
         "eval_mode=fixed56",
         "n_clicks=3",
         "target_iou=0.9",
         "print_ious=false",
         "iou_analysis=false",
         "device_loop=true",
         f"main_cfg_path={main_cfg}",
         f"logs_path={logs}"],
        cwd=REPO,
    )
    results = (logs / "results.txt").read_text()
    assert "SBD" in results and "NoC@80%" in results
