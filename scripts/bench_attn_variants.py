"""Attention pairs-kernel variant sweep (round-3 continuation).

Candidates to lower the kernel floor identified in docs/PERF.md finding 1
("O(B·H·N^2) f32 softmax on the VPU plus 64-wide dot axes"):

  nodiv   — normalize AFTER the PV matmul: divide the [bq,128] output by the
            softmax sum instead of the [bq,N] probability panel (saves one
            f32 op over the N-wide panel per head).
  merged  — block-diagonal head-pair QK^T: stack the pair's queries as
            [[q0,0],[0,q1]] (shape [2bq,128]) so ONE 128-contraction matmul
            against the packed [N,128] key pair computes both heads' score
            panels at full MXU depth (the current kernel issues two
            64-contraction dots at half utilization). PV runs [2bq,N]@[N,128]
            (full lane width, half the product useful — a wash vs two
            64-lane-output dots) and the useful quadrants are sliced out.
            Needs bq small enough that the [2bq,N] f32 panels fit VMEM.
  expbf16 — exp computed in bf16 (max/sum reductions stay f32): tests whether
            the VPU doubles transcendental throughput in bf16. Accuracy-
            relaxed (~4e-3 expected on o) — opt-in candidate only.

Each variant is parity-checked on-chip against the f32 jnp reference before
timing (the nomask/garbage-tail class of bug only shows on real Mosaic).
Timing via the K-difference fori_loop amortization (method in BASELINE.md);
jitted loopers are content-stamped (axon caches executables by NAME+shape,
not HLO — docs/PERF.md measurement hazard).
"""

import functools
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl

from isegprobe_tpu.ops.attention import _mha_qkv_jnp, _mha_qkv_pallas_pairs
from isegprobe_tpu.utils.misc import stamped

K_LO, K_HI = 2, 12


def _softmax_mask(s, n_valid):
    col = jax.lax.broadcasted_iota(jnp.int32, s.shape, 1)
    return jnp.where(col < n_valid, s, -jnp.inf)


def _kernel_nodiv(q_ref, k_ref, v_ref, o_ref, *, scale, n_valid, expdt):
    prec = (jax.lax.Precision.HIGHEST if q_ref.dtype == jnp.float32
            else jax.lax.Precision.DEFAULT)
    mm = dict(preferred_element_type=jnp.float32, precision=prec)
    q2, k2, v2 = q_ref[0], k_ref[0], v_ref[0]
    halves = []
    for lo in (0, 64):
        q = q2[:, lo:lo + 64]
        k = k2[:, lo:lo + 64]
        s = jax.lax.dot_general(
            q, k, dimension_numbers=(((1,), (1,)), ((), ())), **mm) * scale
        s = _softmax_mask(s, n_valid)
        m = jnp.max(s, axis=-1, keepdims=True)
        e = jnp.exp((s - m).astype(expdt)).astype(expdt)
        ssum = jnp.sum(e.astype(jnp.float32), axis=-1, keepdims=True)
        h = jnp.dot(e.astype(v2.dtype), v2[:, lo:lo + 64], **mm)
        halves.append(h * (1.0 / ssum))
    o_ref[0] = jnp.concatenate(halves, axis=-1).astype(o_ref.dtype)


def _kernel_merged(q_ref, k_ref, v_ref, o_ref, *, scale, n_valid, expdt):
    prec = (jax.lax.Precision.HIGHEST if q_ref.dtype == jnp.float32
            else jax.lax.Precision.DEFAULT)
    mm = dict(preferred_element_type=jnp.float32, precision=prec)
    q2, k2, v2 = q_ref[0], k_ref[0], v_ref[0]
    bq = q2.shape[0]
    qq = jnp.concatenate([q2, q2], axis=0)                   # [2bq, 128]
    row = jax.lax.broadcasted_iota(jnp.int32, qq.shape, 0)
    lane = jax.lax.broadcasted_iota(jnp.int32, qq.shape, 1)
    qs = jnp.where((row < bq) == (lane < 64), qq, jnp.zeros_like(qq))
    s = jax.lax.dot_general(
        qs, k2, dimension_numbers=(((1,), (1,)), ((), ())), **mm) * scale
    s = _softmax_mask(s, n_valid)                            # [2bq, N]
    m = jnp.max(s, axis=-1, keepdims=True)
    e = jnp.exp((s - m).astype(expdt)).astype(expdt)
    ssum = jnp.sum(e.astype(jnp.float32), axis=-1, keepdims=True)
    out = jnp.dot(e.astype(v2.dtype), v2, **mm)              # [2bq, 128]
    inv = 1.0 / ssum
    top = out[:bq, 0:64] * inv[:bq]
    bot = out[bq:, 64:128] * inv[bq:]
    o_ref[0] = jnp.concatenate([top, bot], axis=-1).astype(o_ref.dtype)


def run_variant(kernel, qkv, num_heads, scale, bq, tag, expdt=None):
    b, n, three_c = qkv.shape
    c = three_c // 3
    pairs = num_heads // 2
    if expdt is None:
        expdt = jnp.float32
    grid = (b, pairs, -(-n // bq))
    fn = pl.pallas_call(
        functools.partial(kernel, scale=scale, n_valid=n, expdt=expdt),
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, bq, 128), lambda i, h, j: (i, j, h)),
            pl.BlockSpec((1, n, 128), lambda i, h, j: (i, 0, pairs + h)),
            pl.BlockSpec((1, n, 128), lambda i, h, j: (i, 0, 2 * pairs + h)),
        ],
        out_specs=pl.BlockSpec((1, bq, 128), lambda i, h, j: (i, j, h)),
        out_shape=jax.ShapeDtypeStruct((b, n, c), qkv.dtype),
    )
    return fn(qkv, qkv, qkv)


def make_looper(fn, k, tag):
    def run(qkv):
        def body(i, acc):
            out = fn(qkv * (1.0 + i.astype(qkv.dtype) * 1e-6))
            return acc + jnp.sum(out.astype(jnp.float32))
        return jax.lax.fori_loop(0, k, body, jnp.float32(0.0))
    run.__name__ = f"attnvar_{tag}_k{k}"
    return jax.jit(stamped(run, salt=(tag, k, "v1")))


def wall(fn, qkv, repeats=5):
    np.asarray(jax.device_get(fn(qkv)))
    ts = []
    for _ in range(repeats):
        t0 = time.perf_counter()
        np.asarray(jax.device_get(fn(qkv)))
        ts.append(time.perf_counter() - t0)
    return float(np.median(ts))


def main():
    h, dh = 6, 64
    c = h * dh
    scale = dh ** -0.5
    key = jax.random.PRNGKey(0)
    ref32 = None
    for dtype in (jnp.bfloat16, jnp.float32):
        qkv = jax.random.normal(key, (16, 1025, 3 * c), jnp.float32)
        if ref32 is None:
            ref32 = np.asarray(_mha_qkv_jnp(qkv, h, scale))
        qkv = qkv.astype(dtype)
        variants = [
            ("pairs", lambda t: _mha_qkv_pallas_pairs(t, h, scale), None),
            ("nodiv1040",
             lambda t: run_variant(_kernel_nodiv, t, h, scale, 1040, "nd"),
             None),
            ("merged528",
             lambda t: run_variant(_kernel_merged, t, h, scale, 528, "mg"),
             None),
            ("merged352",
             lambda t: run_variant(_kernel_merged, t, h, scale, 352, "mg3"),
             None),
        ]
        if dtype == jnp.bfloat16:
            variants += [
                ("nodiv_ebf16",
                 lambda t: run_variant(
                     _kernel_nodiv, t, h, scale, 1040, "ne", jnp.bfloat16),
                 None),
                ("merged_ebf16",
                 lambda t: run_variant(
                     _kernel_merged, t, h, scale, 528, "me", jnp.bfloat16),
                 None),
            ]
        for name, fn, _ in variants:
            got = np.asarray(fn(qkv)).astype(np.float32)
            err = float(np.max(np.abs(got - ref32)))
            lo = wall(make_looper(fn, K_LO, f"{name}_{jnp.dtype(dtype)}"), qkv)
            hi = wall(make_looper(fn, K_HI, f"{name}_{jnp.dtype(dtype)}"), qkv)
            per = (hi - lo) / (K_HI - K_LO) * 1000
            print(f"{jnp.dtype(dtype)} {name:13s}: {per:.3f} ms/call  "
                  f"max|err| vs f32 jnp = {err:.2e}  "
                  f"(walls {lo*1e3:.1f}/{hi*1e3:.1f})")


if __name__ == "__main__":
    main()
