"""JBU ×16 stack benchmark + on-TPU pallas-vs-XLA parity (VERDICT r1 item 2).

Usage: python scripts/bench_jbu.py  (runs on the default device)
"""
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

import jax
import jax.numpy as jnp
import numpy as np

from isegprobe_tpu.models.upsamplers.jbu import JBUFeatUpUpsampler


def sync(x):
    return float(jnp.sum(x))


def bench(fn, *args, n=10):
    sync(fn(*args))
    t0 = time.time()
    for _ in range(n):
        r = fn(*args)
    sync(r)
    return (time.time() - t0) / n * 1e3


def main():
    rng = np.random.default_rng(0)
    source = jnp.asarray(rng.standard_normal((1, 28, 28, 384),
                                             dtype=np.float32))
    guidance = jnp.asarray(rng.random((1, 448, 448, 3), dtype=np.float32))

    results = {}
    out = {}
    for impl in ("pallas", "xla"):
        m = JBUFeatUpUpsampler(impl=impl)
        params = m.init(jax.random.PRNGKey(0), source, guidance)["params"]
        apply = jax.jit(lambda p, s, g, m=m: m.apply({"params": p}, s, g))
        out[impl] = apply(params, source, guidance)
        results[impl] = bench(apply, params, source, guidance)
        print(f"JBU x16 stack @448² ({impl}): {results[impl]:.1f} ms")

    err = float(jnp.abs(out["pallas"] - out["xla"]).max())
    scale = float(jnp.abs(out["xla"]).max())
    print(f"pallas vs xla on-device: max abs err {err:.2e} (scale {scale:.2f})")
    assert err < 1e-3 * max(1.0, scale), "pallas/XLA divergence"
    print(f"speedup: {results['xla'] / results['pallas']:.2f}x")


if __name__ == "__main__":
    main()
