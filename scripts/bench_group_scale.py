"""Group-API continuous-batching scaling sweep (VERDICT r3 #3).

Round 3 left the trained-workload on-device job queue at 110-138 useful
clicks/s vs 281-326 lockstep-synthetic — this sweeps lane count (batch
8/16/32) on the FULL 78-sample trained workload (stop at IoU 0.9, bf16,
fixed-448 flip protocol, the committed 160-ep noup checkpoint) to find where
the useful-clicks/s ceiling actually is, and reports the lockstep baseline
at the same scale for the speedup claim.

  python scripts/bench_group_scale.py [--batches 8 16 32] [--n 78]
"""

import argparse
import json
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

CKPT = Path(__file__).resolve().parents[1] / "assets" / "trained" / \
    "synthetic_dinov2_noup_160ep.ckpt"


class _EvalCfg(dict):
    def get(self, key, default=None):
        return "bfloat16" if key == "dtype" else default


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batches", type=int, nargs="+", default=[8, 16, 32])
    ap.add_argument("--n", type=int, default=78)
    ap.add_argument("--lockstep-batch", type=int, default=8)
    args = ap.parse_args()

    from evaluate import load_model_for_eval
    from isegprobe_tpu.data.datasets.synthetic import SyntheticShapesDataset
    from isegprobe_tpu.inference.device_eval import (
        evaluate_dataset_device,
        evaluate_dataset_group,
        make_device_evaluator,
    )
    from isegprobe_tpu.utils.misc import enable_compile_cache

    enable_compile_cache()
    model, params = load_model_for_eval(str(CKPT), _EvalCfg(),
                                        target_size=(448, 448))
    # the BASELINE.md eval fixture: 78 instances, seed 2026 (evaluate.py)
    ds = SyntheticShapesDataset(n_samples=args.n, seed=2026,
                                min_instance_area=900)
    common = dict(target_size=(448, 448), max_clicks=20, net_clicks_limit=20,
                  pred_thr=0.49, target_iou=0.90, with_flip=True)

    out = {}
    lock = make_device_evaluator(model, batch_size=args.lockstep_batch,
                                 **common)
    evaluate_dataset_device(lock, params, ds,
                            batch_size=args.lockstep_batch)  # compile
    t0 = time.perf_counter()
    ious = evaluate_dataset_device(lock, params, ds,
                                   batch_size=args.lockstep_batch)
    dt = time.perf_counter() - t0
    out[f"lockstep_b{args.lockstep_batch}"] = round(
        sum(len(a) for a in ious) / dt, 1)

    for b in args.batches:
        ev = make_device_evaluator(model, batch_size=b, group_api=True,
                                   **common)
        evaluate_dataset_group(ev, params, ds)  # compile
        t0 = time.perf_counter()
        ious = evaluate_dataset_group(ev, params, ds)
        dt = time.perf_counter() - t0
        n_clicks = sum(len(a) for a in ious)
        out[f"group_b{b}"] = round(n_clicks / dt, 1)
        out[f"group_b{b}_wall_s"] = round(dt, 1)
    out["n_samples"] = args.n
    out["n_clicks"] = n_clicks
    print(json.dumps(out))


if __name__ == "__main__":
    main()
