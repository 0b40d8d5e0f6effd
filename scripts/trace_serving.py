"""Per-leaf-op attribution of the batched serving path (docs/PERF.md tables).

Runs the batch-8 bf16 device NoC loop (the headline serving workload,
reference workload: core/inference/evaluation.py:22-40) under
``jax.profiler.trace``, then parses the chrome-trace dump and sums device-side
leaf-op durations grouped by a normalized op name. This is the committed,
reproducible version of the ad-hoc /tmp scripts used for the round-3 PERF
tables.

Usage:
    python scripts/trace_serving.py [--batch 8] [--dtype bf16] [--clicks 20]

Prints a table of ms/click per leaf group plus the leaf total, and the
honest host-fetch wall (median of repeats) for cross-checking.
"""

import argparse
import collections
import glob
import gzip
import json
import os
import re
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def _normalize(name: str) -> str:
    """Group minor variants: strip .N suffixes and numeric ids."""
    name = re.sub(r"\.\d+$", "", name)
    name = re.sub(r"__\d+", "", name)
    name = re.sub(r"\d{3,}", "N", name)
    return name


def _load_trace_events(trace_dir: str):
    paths = glob.glob(
        os.path.join(trace_dir, "**", "*.trace.json.gz"), recursive=True
    )
    if not paths:
        raise FileNotFoundError(f"no *.trace.json.gz under {trace_dir}")
    path = max(paths, key=os.path.getmtime)
    with gzip.open(path, "rt") as f:
        data = json.load(f)
    return data.get("traceEvents", data)


def attribute(trace_dir: str, n_clicks: int, batch: int):
    events = _load_trace_events(trace_dir)
    # device tracks: pid metadata names mentioning TPU/device XLA ops. Host
    # python/runtime tracks are excluded so only leaf device ops are summed.
    pid_names = {}
    tid_names = {}
    for ev in events:
        if ev.get("ph") == "M" and ev.get("name") == "process_name":
            pid_names[ev["pid"]] = ev["args"].get("name", "")
        if ev.get("ph") == "M" and ev.get("name") == "thread_name":
            tid_names[(ev["pid"], ev.get("tid"))] = ev["args"].get("name", "")
    dev_pids = {
        pid
        for pid, name in pid_names.items()
        if any(k in name for k in ("TPU", "Device", "/device:", "XLA Op"))
        and "Host" not in name
    }
    sums = collections.Counter()
    for ev in events:
        if ev.get("ph") != "X" or "dur" not in ev:
            continue
        pid = ev.get("pid")
        tname = tid_names.get((pid, ev.get("tid")), "")
        if pid in dev_pids or "XLA Ops" in tname:
            sums[_normalize(ev["name"])] += ev["dur"]  # microseconds
    total_us = sum(sums.values())
    per_click = 1e-3 / n_clicks  # us -> ms, per click
    print(f"\ndevice leaf attribution ({len(sums)} op groups, "
          f"{total_us*1e-3:.1f} ms total, batch {batch}, {n_clicks} clicks):")
    print(f"{'leaf group':<52} {'ms/click':>9} {'share':>7}")
    for name, us in sums.most_common(24):
        print(f"{name[:52]:<52} {us*per_click:>9.3f} {us/total_us:>6.1%}")
    rest = total_us - sum(us for _, us in sums.most_common(24))
    if rest > 0:
        print(f"{'(rest)':<52} {rest*per_click:>9.3f} {rest/total_us:>6.1%}")
    print(f"{'LEAF TOTAL':<52} {total_us*per_click:>9.3f}")
    return total_us * per_click


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=8)
    ap.add_argument("--dtype", default="bf16",
                    choices=["bf16", "f32", "int8"])
    ap.add_argument("--clicks", type=int, default=20)
    ap.add_argument("--repeats", type=int, default=5)
    ap.add_argument("--trace-dir", default=None,
                    help="keep the trace dump here (default: temp dir)")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    import numpy as np

    from bench import build_predictor, synthetic_sample
    from isegprobe_tpu.inference.device_eval import make_device_evaluator
    from isegprobe_tpu.utils.misc import enable_compile_cache

    enable_compile_cache()
    dtype = {"bf16": jnp.bfloat16, "f32": jnp.float32,
             "int8": "int8"}[args.dtype]
    predictor = build_predictor(dtype)
    run = make_device_evaluator(
        predictor.model, target_size=(448, 448), max_clicks=args.clicks,
        net_clicks_limit=20, pred_thr=0.49, target_iou=1.01, with_flip=True,
        batch_size=args.batch,
    )
    imgs, gts, hws = [], [], []
    for _ in range(args.batch):
        img, gt = synthetic_sample((375, 500))
        h, w = img.shape[:2]
        pad_i = np.zeros((448, 672, 3), np.float32)
        pad_g = np.zeros((448, 672), np.int32)
        pad_i[:h, :w] = img if img.dtype != np.uint8 else img / 255.0
        pad_g[:h, :w] = gt
        imgs.append(pad_i)
        gts.append(pad_g)
        hws.append((h, w))
    images = jnp.asarray(np.stack(imgs))
    gt_pad = jnp.asarray(np.stack(gts))
    valid = jnp.asarray(np.array(hws, np.int32))

    def once():
        out = run(predictor.params, images, gt_pad, valid)
        # force a real host fetch — block_until_ready does not block on the
        # axon backend (docs/PERF.md); fetching a scalar does.
        return float(np.asarray(jax.tree_util.tree_leaves(out)[0]).ravel()[0])

    once()  # compile
    walls = []
    for _ in range(args.repeats):
        t0 = time.perf_counter()
        once()
        walls.append(time.perf_counter() - t0)
    wall_ms = float(np.median(walls) * 1000)
    clicks_per_s = args.batch * args.clicks / (wall_ms / 1e3)
    print(f"wall per program (median of {args.repeats}): {wall_ms:.1f} ms "
          f"=> {clicks_per_s:.1f} clicks/s {args.dtype} batch {args.batch}")

    trace_dir = args.trace_dir or tempfile.mkdtemp(prefix="iseg_trace_")
    with jax.profiler.trace(trace_dir):
        once()
    leaf_ms = attribute(trace_dir, args.clicks, args.batch)
    print(f"\nwall {wall_ms/args.clicks:.2f} ms/click vs leaf "
          f"{leaf_ms:.2f} ms/click (gap = loop/dispatch overhead)")
    if not args.trace_dir:
        import shutil

        shutil.rmtree(trace_dir, ignore_errors=True)


if __name__ == "__main__":
    main()
