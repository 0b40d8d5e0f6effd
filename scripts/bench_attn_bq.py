"""Query-block-size sweep for the head-pair attention kernel.

At the serving sequence length N=1025 the default bq=256 needs 5 query
blocks = 1280 padded rows (~20% wasted QK^T/PV MXU work + 5x re-reads of the
K/V head-pair panels). Larger blocks that tile 1025 tightly (344 -> 3x344 =
1032, 528 -> 2x1056, 1056 -> 1 block) trade VMEM footprint for less padding
and fewer K/V reloads. This sweeps bq with the same K-difference amortized
timing as scripts/bench_attn_amortized.py (dispatch cancels between K=2 and
K=12 loops of the kernel inside one jitted fori_loop).
"""

import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

import jax
import jax.numpy as jnp
import numpy as np

from isegprobe_tpu.ops.attention import _mha_qkv_jnp, _mha_qkv_pallas_pairs
from isegprobe_tpu.utils.misc import stamped

K_LO, K_HI = 2, 12


def make_looper(fn, k, tag):
    def run(qkv):
        def body(i, acc):
            out = fn(qkv * (1.0 + i.astype(qkv.dtype) * 1e-6))
            return acc + jnp.sum(out.astype(jnp.float32))

        return jax.lax.fori_loop(0, k, body, jnp.float32(0.0))

    run.__name__ = f"attnbq_{tag}_k{k}"
    return jax.jit(stamped(run, salt=(tag, k)))


def wall(fn, qkv, repeats=5):
    np.asarray(jax.device_get(fn(qkv)))  # compile + run
    ts = []
    for _ in range(repeats):
        t0 = time.perf_counter()
        np.asarray(jax.device_get(fn(qkv)))
        ts.append(time.perf_counter() - t0)
    return float(np.median(ts))


def main():
    h, dh = 6, 64
    c = h * dh
    scale = dh**-0.5
    dtype = jnp.bfloat16
    qkv = jax.random.normal(jax.random.PRNGKey(0), (16, 1025, 3 * c), dtype)
    want = np.asarray(_mha_qkv_jnp(qkv, h, scale), np.float32)
    # bq should be a bf16 sublane-tile multiple (16); candidates tile N=1025
    # with 1280/1056/1056/1040 query rows (25%/3%/3%/1.5% padding) and
    # 5/3/2/1 K/V panel reloads per (batch, pair)
    for bq in (256, 352, 528, 1040):
        got = np.asarray(
            _mha_qkv_pallas_pairs(qkv, h, scale, bq=bq), np.float32)
        err = float(np.max(np.abs(got - want)))
        fn = lambda t, _bq=bq: _mha_qkv_pallas_pairs(t, h, scale, bq=_bq)
        lo = wall(make_looper(fn, K_LO, f"bq{bq}"), qkv)
        hi = wall(make_looper(fn, K_HI, f"bq{bq}"), qkv)
        per = (hi - lo) / (K_HI - K_LO) * 1000
        print(f"bf16 pairs bq={bq:4d}: {per:.3f} ms/call  "
              f"(walls {lo*1e3:.1f}/{hi*1e3:.1f} ms, max|err| {err:.2e})")


if __name__ == "__main__":
    main()
