"""Adaptive (RITM cvpr) continuous batching vs lockstep on a REAL stop-at-IoU
workload (round 5): the trained flagship checkpoint over the 78-sample
synthetic fixture, T=400 adaptive ZoomIn, target_iou 0.9 — varied per-sample
click counts are exactly the straggler pattern the windowed job queue
removes. Prints one JSON line with both throughputs and the MXU anchor.

    python scripts/bench_adaptive_group.py --batch 8 [--n 78]
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
    ap.add_argument("--batch", type=int, default=8)
    ap.add_argument("--n", type=int, default=78)
    ap.add_argument("--target", type=int, default=400)
    ap.add_argument("--window", type=int, default=0)
    args = ap.parse_args()

    from bench import _EvalCfg, measure_mxu_anchor
    from evaluate import load_model_for_eval
    from isegprobe_tpu.data.datasets.synthetic import SyntheticShapesDataset
    from isegprobe_tpu.inference.adaptive_eval import (
        make_adaptive_group_runner,
        make_adaptive_runner,
    )
    from isegprobe_tpu.inference.device_eval import (
        evaluate_dataset_device,
        evaluate_dataset_group,
    )
    from isegprobe_tpu.utils.misc import enable_compile_cache

    enable_compile_cache()
    ckpt = Path(__file__).parents[1] / "assets" / "trained" / \
        "synthetic_dinov2_noup_160ep.ckpt"
    model, params = load_model_for_eval(str(ckpt), _EvalCfg(),
                                        target_size=(448, 448))
    ds = SyntheticShapesDataset(n_samples=args.n, seed=2026,
                                min_instance_area=900)

    protocol = dict(max_clicks=20, net_clicks_limit=20, pred_thr=0.49,
                    target_iou=0.90, with_flip=True, skip_clicks=1)
    lock = make_adaptive_runner(model, target_size=args.target,
                                batch_size=args.batch, **protocol)
    group = make_adaptive_group_runner(model, target_size=args.target,
                                       batch_size=args.batch, **protocol)

    a0 = measure_mxu_anchor()
    evaluate_dataset_device(lock, params, ds, batch_size=args.batch)  # warm
    t0 = time.perf_counter()
    ious_l = evaluate_dataset_device(lock, params, ds, batch_size=args.batch)
    lock_cps = sum(len(a) for a in ious_l) / (time.perf_counter() - t0)
    a1 = measure_mxu_anchor()

    gkw = dict(max_jobs_per_dispatch=args.window)
    evaluate_dataset_group(group, params, ds, **gkw)  # warm
    t0 = time.perf_counter()
    ious_g = evaluate_dataset_group(group, params, ds, **gkw)
    group_cps = sum(len(a) for a in ious_g) / (time.perf_counter() - t0)
    a2 = measure_mxu_anchor()

    # trajectory identity between the two paths on the same workload
    mismatch = sum(
        1 for a, b in zip(ious_l, ious_g)
        if len(a) != len(b) or not np.allclose(a, b, atol=1e-3))
    print(json.dumps({
        "adaptive_lockstep_clicks_per_s": round(lock_cps, 1),
        "adaptive_group_clicks_per_s": round(group_cps, 1),
        "adaptive_group_speedup": round(group_cps / lock_cps, 2),
        "trajectory_mismatches": mismatch,
        "useful_clicks": sum(len(a) for a in ious_g),
        "batch": args.batch, "n": args.n, "target": args.target,
        "anchors_tf_s": [round(a, 1) for a in (a0, a1, a2)],
    }))


if __name__ == "__main__":
    main()
