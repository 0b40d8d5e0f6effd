"""Pin the EDT-leaf session-to-session variance (VERDICT r3 #7).

Round-3 traces showed `edt_l2sq_device` at 2.38 ms/click one session and
3.34 ms another, on the same kernel binary (docs/PERF.md leaf table) — 12%
of the click budget attributed to unexplained variance. This script
separates the two candidate causes:

  * chip-global clock/throughput drift (tunnel-attached chip, shared host):
    measured by an MXU anchor — a fixed [4096,4096]x[4096,4096] bf16 matmul
    whose TF/s tracks the chip clock. NOTE (round 5): this script's inline
    anchor divides a SINGLE 20-iter chain's wall by 20, so the ~30 ms tunnel
    RTT pollutes the absolute TF/s (reads 50-70 where the chip is at ~191);
    the RATIO below is still valid (both kernels carry the same RTT share).
    For absolute chip throughput use bench.measure_mxu_anchor (K-difference,
    RTT cancels);
  * kernel-specific variance (layout/scheduling nondeterminism across
    compiles): the EDT/anchor RATIO is invariant to clock drift, so ratio
    movement across sessions means the EDT binary itself changed.

Run several times across a session/round and compare:
  python scripts/bench_edt_variance.py [--repeats 50]

Each run prints one JSON line with p10/p50/p90 of both kernels and the
ratio; append to docs/PERF.md when investigating.
"""

import argparse
import json
import sys
import time
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--repeats", type=int, default=25)
    ap.add_argument("--batch", type=int, default=8)
    ap.add_argument("--hw", type=int, nargs=2, default=(375, 500))
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from isegprobe_tpu.ops.edt import edt_l2sq_device
    from isegprobe_tpu.utils.misc import enable_compile_cache, stamped

    enable_compile_cache()

    # the batch-8 clicker shape: 2 masks (FN/FP) per lane, padded border
    h, w = args.hw
    rng = np.random.default_rng(0)
    masks = jnp.asarray(rng.random((2 * args.batch, h, w)) > 0.6)

    # amortize the tunnel dispatch (~ms — would swamp a 2.4 ms kernel): run
    # INNER_N chained applications inside one program; per-iter = wall/INNER_N
    INNER_N = 20

    def edt(m):
        def body(_, carry):
            m, acc = carry
            d2 = edt_l2sq_device(m, pad_border=True)
            # data dependency (always-false flip) so iterations serialize
            return m ^ (d2 > 1e9), acc + d2[0, 0, 0]
        return jax.lax.fori_loop(0, INNER_N, body, (m, jnp.float32(0)))[1]

    edt_fn = jax.jit(stamped(edt, ("edt_variance", args.batch, tuple(args.hw))))

    n = 4096
    a = jnp.asarray(rng.standard_normal((n, n)), jnp.bfloat16)
    b = jnp.asarray(rng.standard_normal((n, n)), jnp.bfloat16)

    def anchor(a, b):
        def body(_, x):
            return jnp.matmul(x, b)
        return jax.lax.fori_loop(0, INNER_N, body, a)

    anchor_fn = jax.jit(stamped(anchor, ("edt_variance_anchor", n)))

    # walls must force a HOST FETCH: block_until_ready does not reliably
    # block on the axon backend (docs/PARITY.md measurement note)
    for _ in range(3):
        float(edt_fn(masks))
        float(jnp.sum(anchor_fn(a, b).astype(jnp.float32)))

    edt_ms, anchor_ms = [], []
    for _ in range(args.repeats):
        t0 = time.perf_counter()
        float(edt_fn(masks))
        edt_ms.append((time.perf_counter() - t0) * 1000 / 20)
        t0 = time.perf_counter()
        float(jnp.sum(anchor_fn(a, b).astype(jnp.float32)))
        anchor_ms.append((time.perf_counter() - t0) * 1000 / 20)

    def pct(xs):
        return {p: round(float(np.percentile(xs, p)), 3)
                for p in (10, 50, 90)}

    e, m = pct(edt_ms), pct(anchor_ms)
    anchor_tf = 2 * n ** 3 / (m[50] / 1e3) / 1e12  # per-iter
    print(json.dumps({
        "edt_ms": e,
        "anchor_ms": m,
        "anchor_tf_s": round(anchor_tf, 1),
        "edt_over_anchor": round(e[50] / m[50], 3),
        "ts": time.strftime("%Y-%m-%d %H:%M:%S"),
    }))


if __name__ == "__main__":
    main()
