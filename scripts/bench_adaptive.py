"""Batched compiled RITM-adaptive (cvpr) protocol throughput on the real chip
(VERDICT r4 #3: the adaptive evaluator had only ever been driven at batch
1-3). Runs bench.measure_adaptive at the requested lane count on either RITM
target: T=400 (the 448-class canvas) or the DAVIS T=600 on 854x480 frames
(the ~2.7k-token masked-attention canvas).

    python scripts/bench_adaptive.py --batch 8 --target 400
    python scripts/bench_adaptive.py --batch 8 --target 600
"""

import argparse
import json
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=8)
    ap.add_argument("--target", type=int, default=400)
    ap.add_argument("--dtype", default="bf16", choices=["bf16", "f32"])
    ap.add_argument("--repeats", type=int, default=3)
    args = ap.parse_args()

    from bench import measure_adaptive, measure_mxu_anchor
    from isegprobe_tpu.utils.misc import enable_compile_cache

    enable_compile_cache()
    # DAVIS frames are 854x480 -> canvas ceil14(max(512, 600)) x ceil14(896)
    hw = (480, 854) if args.target == 600 else (375, 500)
    t0 = time.time()
    cps = measure_adaptive(batch_size=args.batch, target=args.target,
                           sample_hw=hw, repeats=args.repeats,
                           dtype=args.dtype)
    anchor = measure_mxu_anchor()
    print(json.dumps({
        "adaptive_clicks_per_s": round(cps, 2),
        "ms_per_click_amortized": round(1000.0 * args.batch / cps, 2),
        "batch": args.batch, "target": args.target, "dtype": args.dtype,
        "frame_hw": hw, "anchor_tf_s": round(anchor, 1),
        "total_s_incl_compile": round(time.time() - t0, 1),
    }))


if __name__ == "__main__":
    main()
