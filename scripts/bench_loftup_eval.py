"""Leaf-by-leaf attribution of the LoftUp 448^2 serving click (VERDICT r3 #1).

The round-3 bench measured the trained LoftUp 448^2 eval at 0.41 SPC
(batch 8, bf16) while the traced upsampler costs only ~35 ms/lane — this
script pins down where the other ~85% of the click goes, stage by stage,
on the real chip:

  stage A  click-encode + patch-embed + DINOv2 trunk  -> [2B,32,32,384]
  stage B  LoftUp upsampler (banded)                  -> [2B,448,448,384]
  stage C  convhead (2x 3x3 conv @ 448^2 x 384)       -> [2B,448,448,1]
  stage D  full model forward (A+B+C+resize fused)
  stage E  one full device-eval click (protocol: EDT clicker, ROI machine,
           crop_resize, forward, inverse paste) at batch 8

Run:  python scripts/bench_loftup_eval.py [--dtype bfloat16|float32]
"""

import argparse
import sys
import time
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

CKPT = Path(__file__).resolve().parents[1] / "assets" / "trained" / \
    "synthetic_dinov2_loftup448_160ep.ckpt"


def _fetch(x):
    """Force a host fetch of a tiny scalar derived from the output —
    block_until_ready does not reliably block on the axon backend
    (docs/PARITY.md measurement note)."""
    import jax

    leaf = jax.tree.leaves(x)[0]
    return float(jax.numpy.sum(leaf[(0,) * (leaf.ndim - 1)]
                               .astype(jax.numpy.float32)))


def _time(fn, *args, warmup=2, repeats=5):
    for _ in range(warmup):
        _fetch(fn(*args))
    ts = []
    for _ in range(repeats):
        t0 = time.perf_counter()
        _fetch(fn(*args))
        ts.append(time.perf_counter() - t0)
    return float(np.median(ts) * 1000)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--dtype", default="bfloat16")
    ap.add_argument("--batch", type=int, default=8)
    ap.add_argument("--fused-head", action="store_true",
                    help="fuse the conv head into the LoftUp slab loop")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from evaluate import load_model_for_eval
    from isegprobe_tpu.utils.misc import enable_compile_cache, stamped

    enable_compile_cache()
    # program-name salt for every stage: the axon compile helper caches
    # executables by NAME + input shapes, not HLO — unsalted stage lambdas
    # aliased to stale unrelated binaries (utils/misc.py:code_fingerprint)
    salt = ("loftup_attr", args.dtype, args.batch)
    # stages A-C are fusion-independent (same traced code either way) — keep
    # their names unsalted by the flag so the second leg reuses the binaries
    salt_d = salt + (args.fused_head,)

    class _Cfg(dict):
        def get(self, key, default=None):
            return args.dtype if key == "dtype" else default

    model, params = load_model_for_eval(str(CKPT), _Cfg(),
                                        target_size=(448, 448))
    if args.fused_head:
        import dataclasses

        model = dataclasses.replace(model, fuse_hr_head=True)
    else:
        import dataclasses

        model = dataclasses.replace(model, fuse_hr_head=False)
    b = args.batch * 2  # flip pair
    rng = np.random.default_rng(0)
    image = jnp.asarray(rng.random((b, 448, 448, 4)), jnp.float32)
    points = jnp.full((b, 40, 3), -1.0, jnp.float32)
    points = points.at[:, 0].set(jnp.asarray([224.0, 224.0, 0.0]))

    # ---- stage A: trunk (click encode + embed + backbone) ----------------
    def stage_a(p, img, pts):
        def run(m, img, pts):
            im, prev = m.prepare_input(img)
            coords = m.get_coord_features(im, prev, pts)
            tokens = m.embed_coords(coords)
            return m.backbone(im, tokens)
        return model.apply({"params": p}, img, pts, method=run)

    a_fn = jax.jit(stamped(stage_a, salt))
    lr_feats = a_fn(params, image, points)
    _fetch(lr_feats)
    ms_a = _time(a_fn, params, image, points)

    # ---- stage B: upsampler --------------------------------------------
    def stage_b(p, feats, img):
        def run(m, feats, img):
            im, _ = m.prepare_input(img)
            return m.upsampler(feats, im)
        return model.apply({"params": p}, feats, img, method=run)

    b_fn = jax.jit(stamped(stage_b, salt))
    hr_feats = b_fn(params, lr_feats, image)
    _fetch(hr_feats)
    ms_b = _time(b_fn, params, lr_feats, image)

    # ---- stage C: head --------------------------------------------------
    def stage_c(p, feats):
        return model.apply({"params": p}, feats,
                           method=lambda m, f: m.head(f))

    c_fn = jax.jit(stamped(stage_c, salt))
    _fetch(c_fn(params, hr_feats))
    ms_c = _time(c_fn, params, hr_feats)

    # ---- stage D: full forward -----------------------------------------
    def stage_d(p, img, pts):
        return model.apply({"params": p}, img, pts)["instances"]

    d_fn = jax.jit(stamped(stage_d, salt_d))
    _fetch(d_fn(params, image, points))
    ms_d = _time(d_fn, params, image, points)

    # ---- stage E: one device-eval click ---------------------------------
    from isegprobe_tpu.inference.device_eval import (
        evaluate_dataset_device, make_device_evaluator)

    class _DS:
        def __len__(self):
            return args.batch

        def get_sample(self, i):
            class S:
                pass

            rng = np.random.default_rng(i)
            h, w = 375, 500
            img = (rng.random((h, w, 3)) * 80).astype(np.uint8)
            gt = np.zeros((h, w), dtype=np.int32)
            gt[h // 4: 3 * h // 4, w // 4: 3 * w // 4] = 1
            img[gt == 1] = [190, 170, 80]
            s = S()
            s.image, s.objects_ids = img, [1]
            s.gt_mask = lambda _o, g=gt: g
            return s

    run = make_device_evaluator(
        model, target_size=(448, 448), max_clicks=20, net_clicks_limit=20,
        pred_thr=0.49, target_iou=1.01, with_flip=True,
        batch_size=args.batch)
    ds = _DS()
    evaluate_dataset_device(run, params, ds, batch_size=args.batch)  # compile
    t0 = time.perf_counter()
    ious = evaluate_dataset_device(run, params, ds, batch_size=args.batch)
    wall = time.perf_counter() - t0
    n_clicks = sum(len(a) for a in ious)
    ms_e = wall / 20 * 1000  # per batched click (20 lockstep rounds)
    spc = wall / n_clicks

    print(f"dtype={args.dtype} batch={args.batch} (x2 flip)")
    print(f"A trunk (clicks+embed+DINOv2)          {ms_a:8.1f} ms")
    print(f"B LoftUp upsampler                      {ms_b:8.1f} ms")
    print(f"C convhead @448^2x384                   {ms_c:8.1f} ms")
    print(f"A+B+C                                   {ms_a+ms_b+ms_c:8.1f} ms")
    print(f"D full forward                          {ms_d:8.1f} ms")
    print(f"E device-eval click (protocol incl.)    {ms_e:8.1f} ms")
    print(f"  protocol overhead (E - D)             {ms_e-ms_d:8.1f} ms")
    print(f"  SPC {spc*1000:.1f} ms  ({n_clicks} clicks in {wall:.1f}s, "
          f"{n_clicks/wall:.1f} clicks/s)")


if __name__ == "__main__":
    main()
