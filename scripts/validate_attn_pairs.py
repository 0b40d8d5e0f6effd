"""On-chip validation of the zero-relayout head-pair attention kernel.

The pairs kernel (`ops/attention.py:_mha_qkv_pallas_pairs`) reads q/k/v for a
pair of 64-wide heads straight from the packed [B, N, 3C] projection output
via lane-block BlockSpecs and slices heads 64-wide inside VMEM. Its semantics
are pinned by interpret-mode CPU tests (tests/test_vit_parity.py), but Mosaic
legality on real hardware (in-VMEM 64-lane slicing, lane-block index maps)
was still unverified when the round-3 TPU outage hit — the kernel ships
opt-in behind ISEG_ATTN_PAIRS=1 until this script passes on the chip.

Runs parity (pairs vs jnp reference, bf16 + f32) and a timing sweep at the
serving shape ([16, 1025, 3*384] — the batch-8 flip-TTA DINOv2-S step) of
jnp vs packed kernel vs pairs kernel. Program names are content-stamped
(docs/PERF.md measurement hazard).
"""

import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

import jax
import jax.numpy as jnp
import numpy as np

from isegprobe_tpu.ops.attention import (
    _mha_qkv_jnp,
    _mha_qkv_pallas,
    _mha_qkv_pallas_pairs,
)
from isegprobe_tpu.utils.misc import stamped


def _fetch(x):
    return np.asarray(jax.device_get(x))


def timed(fn, *args, repeats=20):
    fn(*args)  # compile
    _fetch(fn(*args))  # force completion (block_until_ready unreliable here)
    t0 = time.perf_counter()
    for _ in range(repeats):
        out = fn(*args)
    _fetch(out)
    return (time.perf_counter() - t0) / repeats * 1000


def main():
    print("devices:", jax.devices())
    h, dh = 6, 64
    c = h * dh
    results = {}
    for dtype, atol in ((jnp.bfloat16, 3e-2), (jnp.float32, 2e-5)):
        key = jax.random.PRNGKey(0)
        qkv = jax.random.normal(key, (16, 1025, 3 * c), dtype=dtype)
        scale = dh**-0.5

        ref = _fetch(jax.jit(stamped(
            lambda t: _mha_qkv_jnp(t, h, scale), salt=("ref", str(dtype))))(qkv))
        pairs_fn = jax.jit(stamped(
            lambda t: _mha_qkv_pallas_pairs(t, h, scale),
            salt=("pairs", str(dtype))))
        got = _fetch(pairs_fn(qkv))
        err = np.max(np.abs(got.astype(np.float32) - ref.astype(np.float32)))
        ok = err < atol
        results[str(jnp.dtype(dtype))] = (ok, float(err))
        print(f"parity {jnp.dtype(dtype)}: max|err|={err:.2e} "
              f"(atol {atol}) -> {'OK' if ok else 'FAIL'}")
        if not ok:
            print("PARITY FAILED — keep the pairs kernel opt-in.")
            return 1

        packed_fn = jax.jit(stamped(
            lambda t: _mha_qkv_pallas(t, h, scale),
            salt=("packed", str(dtype))))
        jnp_fn = jax.jit(stamped(
            lambda t: _mha_qkv_jnp(t, h, scale), salt=("jnp", str(dtype))))
        t_jnp = timed(jnp_fn, qkv)
        t_packed = timed(packed_fn, qkv)
        t_pairs = timed(pairs_fn, qkv)
        print(f"timing {jnp.dtype(dtype)} [16,1025,3*384]: "
              f"jnp {t_jnp:.3f} ms | packed {t_packed:.3f} ms | "
              f"pairs {t_pairs:.3f} ms")

    print("pairs kernel VALID on this chip" if all(
        ok for ok, _ in results.values()) else "pairs kernel INVALID")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
