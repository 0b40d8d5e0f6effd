"""Dispatch-free attention kernel timing via K-difference amortization.

Per-call wall timings through the axon tunnel are dispatch-dominated (tens of
ms of transport per call on a bad day) — useless for comparing ~1 ms kernels.
This runs the kernel K times inside ONE jitted fori_loop (inputs perturbed per
iteration so XLA cannot hoist/CSE the call) and differences K=K_HI vs K=K_LO
walls: transport cancels, leaving (K_HI-K_LO) x the pure device cost.
Method pinned in BASELINE.md (amortized forward-cost attribution).
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

K_LO, K_HI = 2, 12


def make_looper(fn, k, tag):
    def run(qkv):
        def body(i, acc):
            out = fn(qkv * (1.0 + i.astype(qkv.dtype) * 1e-6))
            return acc + jnp.sum(out.astype(jnp.float32))

        return jax.lax.fori_loop(0, k, body, jnp.float32(0.0))

    run.__name__ = f"attnloop_{tag}_k{k}"
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
    for dtype in (jnp.bfloat16, jnp.float32):
        qkv = jax.random.normal(
            jax.random.PRNGKey(0), (16, 1025, 3 * c), dtype=dtype)
        for name, fn in (
            ("jnp", lambda t: _mha_qkv_jnp(t, h, scale)),
            ("packed", lambda t: _mha_qkv_pallas(t, h, scale)),
            ("pairs", lambda t: _mha_qkv_pallas_pairs(t, h, scale)),
        ):
            lo = wall(make_looper(fn, K_LO, f"{name}_{jnp.dtype(dtype)}"), qkv)
            hi = wall(make_looper(fn, K_HI, f"{name}_{jnp.dtype(dtype)}"), qkv)
            per = (hi - lo) / (K_HI - K_LO) * 1000
            print(f"{jnp.dtype(dtype)} {name:7s}: {per:.3f} ms/call "
                  f"(walls {lo*1e3:.1f} / {hi*1e3:.1f} ms)")


if __name__ == "__main__":
    main()
