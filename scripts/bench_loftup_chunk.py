"""Sweep the LoftUp banded-query slab height (query_chunk_rows) at the
448^2 bf16 serving shape — the upsampler is ~75% of the LoftUp click
(docs/PERF.md round-4 attribution), and the slab height is its main
scheduling knob: taller slabs amortize dispatch and halo recompute, shorter
slabs keep activations VMEM-resident.

  python scripts/bench_loftup_chunk.py [--chunks 32 64 112 224 448]
"""

import argparse
import sys
import time
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

CKPT = Path(__file__).resolve().parents[1] / "assets" / "trained" / \
    "synthetic_dinov2_loftup448_160ep.ckpt"


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--chunks", type=int, nargs="+",
                    default=[32, 64, 112, 224, 448])
    ap.add_argument("--batch", type=int, default=8)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from isegprobe_tpu.utils.misc import enable_compile_cache, stamped
    from isegprobe_tpu.utils.serialization import (
        build_model,
        load_checkpoint,
        merge_params,
    )

    enable_compile_cache()
    params_ck, config, _ = load_checkpoint(str(CKPT))
    b = args.batch * 2
    rng = np.random.default_rng(0)
    feats = jnp.asarray(rng.standard_normal((b, 32, 32, 384)), jnp.bfloat16)
    guidance = jnp.asarray(rng.random((b, 448, 448, 3)), jnp.float32)

    for chunk in args.chunks:
        cfg = dict(config)
        cfg["params"] = dict(config["params"])
        up = dict(cfg["params"]["upsampler_cfg"])
        up["params"] = dict(up.get("params") or {},
                            query_chunk_rows=chunk,
                            query_chunk_min_pixels=0 if chunk < 448 else 10**9)
        cfg["params"]["upsampler_cfg"] = up
        model = build_model(cfg, dtype=jnp.bfloat16)
        image = np.zeros((1, 448, 448, 4), np.float32)
        points = np.full((1, 40, 3), -1.0, np.float32)
        full = model.init(jax.random.PRNGKey(0), image, points)["params"]
        params = merge_params(full, params_ck)
        params = jax.tree.map(
            lambda x: x.astype(jnp.bfloat16)
            if hasattr(x, "dtype") and x.dtype == jnp.float32 else x, params)

        def stage_b(p, f, g):
            def run(m, f, g):
                return m.upsampler(f, g)
            return model.apply({"params": p}, f, g, method=run)

        fn = jax.jit(stamped(stage_b, ("loftup_chunk", chunk, args.batch)))
        def _fetch(x):
            # force a host fetch: block_until_ready does not reliably block
            # on the axon backend (docs/PARITY.md measurement note)
            return float(jnp.sum(x[0, 0, 0].astype(jnp.float32)))

        try:
            _fetch(fn(params, feats, guidance))
        except Exception as e:
            print(f"chunk={chunk}: FAILED {type(e).__name__}: {e}")
            continue
        ts = []
        for _ in range(5):
            t0 = time.perf_counter()
            _fetch(fn(params, feats, guidance))
            ts.append(time.perf_counter() - t0)
        print(f"chunk={chunk:4d}: {np.median(ts)*1000:8.1f} ms "
              f"(batch {b} flip-lanes)")


if __name__ == "__main__":
    main()
