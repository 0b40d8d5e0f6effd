"""Where does the int8 serving mode lose to bf16? (bench leg: 222.9 vs 257.1)

Compares, at the four ViT-S serving matmul shapes (M = 16 lanes x 1025
tokens), the amortized per-call device cost of:
  * bf16 matmul (the serving default),
  * int8_dynamic_matmul as shipped (weights quantized on the fly, f32
    activation pass),
  * int8 with PRE-quantized weights (wq/sw constants - what a quantize-at-
    load path would run),
using the K-difference fori_loop method (scripts/bench_attn_amortized.py).
Separates "int8 MXU wins" from "quantization overhead losses".
"""

import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

import jax
import jax.numpy as jnp
import numpy as np

from isegprobe_tpu.ops.quant import int8_dynamic_matmul
from isegprobe_tpu.utils.misc import stamped

# sub-ms kernels need a large K spread to rise above tunnel wall noise
K_LO, K_HI = 2, 202
_EPS = 1e-8


def int8_prequant_matmul(x, wq, sw):
    xf = x.astype(jnp.float32)
    sx = jnp.maximum(jnp.max(jnp.abs(xf), axis=-1, keepdims=True) / 127.0,
                     _EPS)
    xq = jnp.round(xf / sx).astype(jnp.int8)
    acc = jax.lax.dot_general(
        xq, wq, dimension_numbers=(((xq.ndim - 1,), (0,)), ((), ())),
        preferred_element_type=jnp.int32)
    return (acc.astype(jnp.float32) * sx * sw).astype(x.dtype)


def make_looper(fn, k, tag):
    def run(x):
        def body(i, acc):
            out = fn(x * (1.0 + i.astype(x.dtype) * 1e-6))
            return acc + jnp.sum(out.astype(jnp.float32))

        return jax.lax.fori_loop(0, k, body, jnp.float32(0.0))

    run.__name__ = f"int8mm_{tag}_k{k}"
    return jax.jit(stamped(run, salt=(tag, k)))


def wall(fn, x, repeats=5):
    np.asarray(jax.device_get(fn(x)))
    ts = []
    for _ in range(repeats):
        t0 = time.perf_counter()
        np.asarray(jax.device_get(fn(x)))
        ts.append(time.perf_counter() - t0)
    return float(np.median(ts))


def amortized_ms(fn, x, tag):
    lo = wall(make_looper(fn, K_LO, tag), x)
    hi = wall(make_looper(fn, K_HI, tag), x)
    return (hi - lo) / (K_HI - K_LO) * 1000


def main():
    m = 16 * 1025
    rng = np.random.default_rng(0)
    for name, kdim, n in (("qkv", 384, 1152), ("proj", 384, 384),
                          ("fc1", 384, 1536), ("fc2", 1536, 384)):
        x = jnp.asarray(rng.standard_normal((m, kdim)), jnp.bfloat16)
        w = jnp.asarray(rng.standard_normal((kdim, n)), jnp.float32)
        wf = w.astype(jnp.float32)
        sw = jnp.maximum(jnp.max(jnp.abs(wf), axis=0, keepdims=True) / 127.0,
                         _EPS)
        wq = jnp.round(wf / sw).astype(jnp.int8)
        wb = w.astype(jnp.bfloat16)
        tf = 2 * m * kdim * n / 1e12

        t_bf16 = amortized_ms(
            lambda t, _w=wb: jnp.dot(t, _w,
                                     preferred_element_type=jnp.float32)
            .astype(jnp.bfloat16), x, f"bf16_{name}")
        t_dyn = amortized_ms(
            lambda t, _w=w: int8_dynamic_matmul(t, _w).astype(jnp.bfloat16),
            x, f"dyn_{name}")
        t_pre = amortized_ms(
            lambda t, _wq=wq, _sw=sw: int8_prequant_matmul(t, _wq, _sw),
            x, f"pre_{name}")
        print(f"{name:4s} [{m}x{kdim}]x[{kdim}x{n}] ({tf*1e3:.1f} GF): "
              f"bf16 {t_bf16:.3f} ms ({tf/t_bf16*1e3:.0f} TF/s) | "
              f"int8 dyn {t_dyn:.3f} | int8 preq {t_pre:.3f} "
              f"({tf/max(t_pre,1e-9)*1e3:.0f} TF/s)")


if __name__ == "__main__":
    main()
