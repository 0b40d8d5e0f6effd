"""Minimal repro for the libtpu worker fault: group-API staging + the banded
LoftUp slab graph (VERDICT r4 #4; bisection notes in BASELINE.md).

Round-4 findings on the then-current libtpu, distilled:

  1. a ``lax.cond``-gated harvest (scatter + job gather + lane reinit) around
     the banded-slab cross-attention graph faulted the TPU worker at EVERY
     lane count (batch 4/8/16). The codebase fix: the harvest is
     UNCONDITIONAL (it is a semantic no-op when no lane finished) —
     inference/device_eval.py run_window.
  2. even unconditional, staging the FULL 78-job frame buffer in one program
     faulted: batch 4 worked at J<=32 staged frames but crashed at J=128;
     batch 8 crashed at any J. The round-5 fix: windowed staging — the
     program holds only a window of frames and lane state carries across
     dispatches, so HBM is bounded by construction.

This script rebuilds the faulting shape with knobs so a future toolchain
update can be tested in minutes:

    # SAFE baseline (current default path, window 24): expected PASS
    python scripts/repro_group_fault.py --jobs 40 --batch 4 --window 24

    # the round-4 faulting shape (one window = full staging): expected
    # WORKER FAULT on the round-4/5 libtpu; PASS would mean the toolchain
    # fixed it and the window default can be lifted
    python scripts/repro_group_fault.py --jobs 78 --batch 8 --window 128

A fault typically presents as the process dying with a TPU runtime error (or
hanging until the tunnel resets); rerun after the worker restarts.
"""

import argparse
import json
import sys
import time
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--jobs", type=int, default=40)
    ap.add_argument("--batch", type=int, default=4)
    ap.add_argument("--window", type=int, default=24,
                    help="staged frames per compiled program; >= jobs "
                    "reproduces the round-4 full-staging fault shape")
    ap.add_argument("--size", type=int, default=448,
                    help="eval canvas (448 = the faulting production shape; "
                    "smaller compiles faster but may not fault)")
    ap.add_argument("--max-clicks", type=int, default=4)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from isegprobe_tpu.inference.device_eval import (
        evaluate_dataset_group,
        make_device_evaluator,
    )
    from isegprobe_tpu.models.probe_model import iSegProbeModel
    from isegprobe_tpu.utils.misc import enable_compile_cache

    enable_compile_cache()
    s = args.size

    # the faulting model family: banded-slab LoftUp queries at the eval
    # resolution, bf16 (the HBM-edge configuration from BASELINE.md)
    model = iSegProbeModel(
        backbone_cfg=dict(type="dinov2",
                          params=dict(feats_injection_mode="before_backbone")),
        embed_coords_cfg=dict(
            type="patchEmbed",
            params=dict(img_size=(s, s), patch_size=(14, 14), embed_dim=384)),
        head_cfg=dict(type="convhead",
                      params=dict(in_channels=384, num_layers=2,
                                  num_classes=1)),
        upsampler_cfg=dict(type="loftup", params=dict(n_dim=384)),
        use_disks=True, norm_radius=5, with_prev_mask=True,
        dtype=jnp.bfloat16,
    )
    image = np.zeros((1, s, s, 4), dtype=np.float32)
    points = np.full((1, 8, 3), -1.0, dtype=np.float32)
    params = model.init(jax.random.PRNGKey(0), image, points)["params"]
    params = jax.tree.map(lambda x: x.astype(jnp.bfloat16), params)

    class _DS:
        def __len__(self):
            return args.jobs

        def get_sample(self, i):
            rng = np.random.default_rng(i)
            img = (rng.random((375, 500, 3)) * 80).astype(np.uint8)
            gt = np.zeros((375, 500), np.int32)
            gt[90:280, 120:380] = 1
            sm = type("S", (), {})()
            sm.image, sm.objects_ids = img, [1]
            sm.gt_mask = lambda _o, g=gt: g
            return sm

    ev = make_device_evaluator(
        model, target_size=(s, s), max_clicks=args.max_clicks,
        net_clicks_limit=args.max_clicks, pred_thr=0.49, target_iou=0.9,
        with_flip=True, batch_size=args.batch, group_api=True,
    )
    t0 = time.time()
    results = evaluate_dataset_group(
        ev, params, _DS(), max_jobs_per_dispatch=args.window)
    ok = sum(1 for r in results if r is not None and len(r) >= 1)
    print(json.dumps({
        "status": "PASS",
        "jobs_completed": ok, "jobs": args.jobs, "batch": args.batch,
        "window": args.window, "size": args.size,
        "wall_s": round(time.time() - t0, 1),
    }))


if __name__ == "__main__":
    main()
