"""Recalibrate the chip's practical matmul ceiling (K-difference method).

The round-3 "practical ceiling" of ~118 TF/s bf16 / ~24 f32 was measured with
*chained* square matmuls fetched through the tunnel — a methodology that can
stall on the serial dependency and on transport. scripts/bench_int8_matmul.py
then measured individual serving-shape matmuls at 148-185 TF/s bf16, above
that "ceiling", so the calibration was suspect. This sweeps square matmul
sizes with the dispatch-cancelling K-difference fori_loop (the body varies the
input by i*1e-6 so nothing hoists; only a f32 scalar is fetched).
"""

import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

import jax
import jax.numpy as jnp
import numpy as np

from isegprobe_tpu.utils.misc import stamped

K_LO, K_HI = 2, 22


def make_looper(k, tag, dtype):
    def run(x, w):
        def body(i, acc):
            y = jnp.dot(x * (1.0 + i.astype(x.dtype) * 1e-6), w,
                        preferred_element_type=jnp.float32)
            return acc + jnp.sum(y) * 1e-9

        return jax.lax.fori_loop(0, k, body, jnp.float32(0.0))

    run.__name__ = f"mxucal_{tag}_k{k}"
    return jax.jit(stamped(run, salt=(tag, k, str(dtype))))


def wall(fn, x, w, repeats=5):
    np.asarray(jax.device_get(fn(x, w)))
    ts = []
    for _ in range(repeats):
        t0 = time.perf_counter()
        np.asarray(jax.device_get(fn(x, w)))
        ts.append(time.perf_counter() - t0)
    return float(np.median(ts))


def main():
    for dtype, sizes in ((jnp.bfloat16, (2048, 4096, 8192)),
                         (jnp.float32, (2048, 4096))):
        for n in sizes:
            key = jax.random.PRNGKey(n)
            x = jax.random.normal(key, (n, n), dtype)
            w = jax.random.normal(jax.random.PRNGKey(n + 1), (n, n), dtype)
            tag = f"{np.dtype(dtype).name}_{n}"
            lo = wall(make_looper(K_LO, tag, dtype), x, w)
            hi = wall(make_looper(K_HI, tag, dtype), x, w)
            ms = (hi - lo) / (K_HI - K_LO) * 1000
            tf = 2 * n**3 / 1e12
            print(f"{np.dtype(dtype).name} {n}^3 ({tf*1e3:.1f} GF): "
                  f"{ms:.3f} ms/matmul = {tf / (ms / 1e3):.0f} TF/s")


if __name__ == "__main__":
    main()
