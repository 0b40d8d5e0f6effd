"""Fused one-pass LayerNorm (Pallas TPU kernel) with a jnp reference path.

Motivation (docs/PERF.md): XLA lowers each flax ``nn.LayerNorm`` into
separate stats-reduce and normalize fusions. In the batch-8 bf16 device eval
the 26 LayerNorms of a flip-pair ViT forward cost ~5.8 ms/click of
``convert_reduce_fusion`` — an effective ~57 GB/s over activations that HBM
could stream at ~10× that. The kernel below reads each activation tile once
into VMEM, computes mean/variance in f32 **in registers** (same numerics as
flax's default ``force_float32_reductions=True`` + ``use_fast_variance=True``
— see flax normalization._compute_stats), normalizes, applies scale/bias and
writes the result — one HBM read + one write total.

The reference keeps LayerNorm inside torch's ``nn.LayerNorm``
(reference: core/model/featurizers/DINOv2.py:302-320 and the per-family layer
copies); there is no fused-kernel analogue to port — this is TPU-first design,
not translation.

Numerics: stats are f32 regardless of IO dtype; the only difference vs the
XLA path is floating-point reduction order (lane-tree vs XLA's reduce), i.e.
~1 ulp f32 on the stats. The f32 eval path stays on ``nn.LayerNorm`` for
bit-exact golden parity with the torch reference; the kernel serves the bf16
serving/training path (models/vit.py ``_ln``), where output rounding to bf16
absorbs the ulp-level stat difference (tests/test_layernorm.py).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl

__all__ = ["layernorm"]


def _ln_jnp(x, scale, bias, eps):
    """flax-equivalent reference: f32 fast-variance stats, IO-dtype output."""
    xf = x.astype(jnp.float32)
    m = jnp.mean(xf, axis=-1, keepdims=True)
    var = jnp.maximum(0.0, jnp.mean(xf * xf, axis=-1, keepdims=True) - m * m)
    y = (xf - m) * jax.lax.rsqrt(var + eps)
    y = y * scale.astype(jnp.float32) + bias.astype(jnp.float32)
    return y.astype(x.dtype)


def _ln_kernel(x_ref, g_ref, b_ref, o_ref, *, eps, d):
    x = x_ref[0].astype(jnp.float32)  # [th, d] — one VMEM-resident tile
    m = jnp.sum(x, axis=-1, keepdims=True) * (1.0 / d)
    var = jnp.maximum(
        0.0, jnp.sum(x * x, axis=-1, keepdims=True) * (1.0 / d) - m * m
    )
    y = (x - m) * jax.lax.rsqrt(var + eps)
    y = y * g_ref[...].astype(jnp.float32) + b_ref[...].astype(jnp.float32)
    o_ref[0] = y.astype(o_ref.dtype)


@functools.partial(jax.jit, static_argnames=("eps", "interpret"))
def _ln_pallas(x, scale, bias, eps, interpret=False):
    """Grid over the NATURAL [.., N, D] shape. No host-visible pad/reshape:
    merging only the leading dims is layout-free on TPU (tiling touches the
    last two dims), and Mosaic masks the partial last row-block itself — an
    explicit jnp.pad+slice round-trip costs two extra full-tensor HBM copies
    per call (measured +7 ms/click across the 26 LNs of the batch-8 device
    eval, docs/PERF.md)."""
    d = x.shape[-1]
    x3 = x[None] if x.ndim == 2 else x.reshape(-1, x.shape[-2], d)
    b, n, _ = x3.shape
    th = min(256, n)
    out = pl.pallas_call(
        functools.partial(_ln_kernel, eps=eps, d=d),
        grid=(b, -(-n // th)),
        in_specs=[
            pl.BlockSpec((1, th, d), lambda i, j: (i, j, 0)),
            pl.BlockSpec((1, d), lambda i, j: (0, 0)),
            pl.BlockSpec((1, d), lambda i, j: (0, 0)),
        ],
        out_specs=pl.BlockSpec((1, th, d), lambda i, j: (i, j, 0)),
        out_shape=jax.ShapeDtypeStruct((b, n, d), x.dtype),
        interpret=interpret,
    )(x3, scale.reshape(1, d), bias.reshape(1, d))
    return out.reshape(x.shape)


@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4))
def _ln_pallas_ad(x, scale, bias, eps, interpret=False):
    """Differentiable wrapper: fused forward, jnp-graph backward (the click
    encoder trains through its LayerNorms)."""
    return _ln_pallas(x, scale, bias, eps, interpret)


def _ln_pallas_ad_fwd(x, scale, bias, eps, interpret=False):
    return _ln_pallas(x, scale, bias, eps, interpret), (x, scale, bias)


def _ln_pallas_ad_bwd(eps, interpret, residuals, g):
    x, scale, bias = residuals
    _, vjp = jax.vjp(lambda x_, s_, b_: _ln_jnp(x_, s_, b_, eps), x, scale, bias)
    return vjp(g)


_ln_pallas_ad.defvjp(_ln_pallas_ad_fwd, _ln_pallas_ad_bwd)


def layernorm(
    x: jnp.ndarray,
    scale: jnp.ndarray,
    bias: jnp.ndarray,
    eps: float = 1e-6,
    impl: str = "auto",
) -> jnp.ndarray:
    """LayerNorm over the last axis with f32 stats (flax-default numerics).

    impl: 'auto' | 'jnp' | 'pallas' | 'pallas_interpret'.

    'auto' uses the fused kernel on TPU when the feature dim is lane-aligned
    (multiple of 128) and the row count is big enough to amortize the kernel
    launch; everything else takes the jnp path (identical math, XLA-fused).
    """
    d = x.shape[-1]
    n = 1
    for s in x.shape[:-1]:
        n *= s
    if impl == "auto":
        on_tpu = jax.default_backend() not in ("cpu", "gpu")
        impl = "pallas" if (on_tpu and d % 128 == 0 and n >= 256) else "jnp"
    if impl == "jnp":
        return _ln_jnp(x, scale, bias, eps)
    if impl == "pallas":
        return _ln_pallas_ad(x, scale, bias, eps)
    if impl == "pallas_interpret":
        return _ln_pallas_ad(x, scale, bias, eps, True)
    raise ValueError(f"Unknown layernorm impl: {impl}")
