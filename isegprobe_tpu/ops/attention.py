"""Multi-head attention: fused Pallas TPU kernel with a jnp reference path.

Replaces the reference's xformers ``memory_efficient_attention`` + pure-torch
fallback (reference: core/model/featurizers/dinov2/layers/attention.py:34-91).

Probing workloads have short sequences (≤ (448/14)²+1 = 1025 tokens at eval,
257 at train — SURVEY.md §2.12), so the whole K/V of one (batch, head) fits in
VMEM. The Pallas kernel therefore fuses QKᵀ → mask → softmax → PV per query
block with no HBM roundtrip of the attention matrix; queries are blocked so the
same kernel scales to longer sequences (the blockwise structure is where a
ring/context-parallel axis would attach if ever needed).

Known environment flake (tunnel-attached chips only): the axon remote AOT
compile helper intermittently rejects the bf16 kernel with ``Mosaic failed to
compile TPU kernel: Bad lhs type`` and then appears to serve the failure for
the same program hash on retry. The identical kernel compiles and matches the
jnp path (≤1e-3) when the surrounding program differs trivially (e.g. a
different sequence length), so this is not a kernel bug — on a direct-attached
chip it does not reproduce. Workaround if hit: retry with a fresh program
(any shape change) or fall back to ``impl='jnp'``.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

__all__ = ["mha", "mha_qkv"]


def _mha_jnp(q, k, v, scale, key_mask=None):
    """Reference path: q,k,v [B, N, H, Dh] -> [B, N, H, Dh], f32 softmax.

    Matmuls run at the INPUT dtype with f32 accumulation: HIGHEST precision
    on bf16 inputs would upcast the MXU to f32 throughput (~8x slower on
    v5e); f32 inputs keep HIGHEST for exact parity.

    ``key_mask`` [B, N] (bool/0-1): keys with mask 0 are excluded from every
    query's softmax (adaptive-canvas eval: tokens outside the valid grid
    must not influence valid tokens — inference/adaptive_eval.py)."""
    prec = (jax.lax.Precision.HIGHEST if q.dtype == jnp.float32
            else jax.lax.Precision.DEFAULT)
    s = jnp.einsum("bqhd,bkhd->bhqk", q, k, precision=prec,
                   preferred_element_type=jnp.float32) * scale
    if key_mask is not None:
        bias = jnp.where(key_mask.astype(jnp.bool_), 0.0, -1e30)
        s = s + bias[:, None, None, :].astype(s.dtype)
    p = jax.nn.softmax(s, axis=-1)
    out = jnp.einsum("bhqk,bkhd->bqhd", p.astype(v.dtype), v, precision=prec,
                     preferred_element_type=jnp.float32)
    return out.astype(q.dtype)


def _attn_kernel_packed(q_ref, k_ref, v_ref, o_ref, *, scale, n_valid):
    """Self-attention step on pre-packed [BH, N, dh] operands, masked grids
    (no host-visible pads): K/V blocks span the FULL unpadded N (legal since
    a Pallas block dim may equal the whole dim), and the partial last query
    block relies on Mosaic's write clipping — garbage out-of-bounds query
    rows never mix across rows and are never written."""
    prec = (jax.lax.Precision.HIGHEST if q_ref.dtype == jnp.float32
            else jax.lax.Precision.DEFAULT)
    mm = dict(preferred_element_type=jnp.float32, precision=prec)
    q = q_ref[0]  # [bq, dh]
    k = k_ref[0]  # [N, dh]
    s = jax.lax.dot_general(
        q, k, dimension_numbers=(((1,), (1,)), ((), ())), **mm
    ) * scale
    col = jax.lax.broadcasted_iota(jnp.int32, s.shape, 1)
    s = jnp.where(col < n_valid, s, -jnp.inf)
    m = jnp.max(s, axis=-1, keepdims=True)
    e = jnp.exp(s - m)
    p = e / jnp.sum(e, axis=-1, keepdims=True)
    o_ref[0] = jnp.dot(p.astype(v_ref.dtype), v_ref[0], **mm).astype(o_ref.dtype)


@functools.partial(jax.jit, static_argnames=("num_heads", "scale", "interpret"))
def _mha_qkv_pallas(qkv, num_heads, scale, interpret=False):
    """Fused self-attention consuming the PACKED qkv tensor [B, N, 3C].

    The generic path pays 4 relayout copies + 2 pads per call (per-tensor
    moveaxis/reshape/pad of q, k, v and the output — ~1 GB of HBM copy
    traffic per click at serving batch, docs/PERF.md). Here a single
    transpose of the reused qkv tensor produces [3, B·H, N, dh] and the
    grids are masked instead of padded. Measured at the serving shape
    ([16,1025,6·64] bf16): 1.02 vs 1.18 ms/call."""
    b, n, three_c = qkv.shape
    c = three_c // 3
    dh = c // num_heads
    t = qkv.reshape(b, n, 3, num_heads, dh)
    t = jnp.transpose(t, (2, 0, 3, 1, 4)).reshape(3, b * num_heads, n, dh)
    bq = min(256, n)
    grid = (b * num_heads, -(-n // bq))
    out = pl.pallas_call(
        functools.partial(_attn_kernel_packed, scale=scale, n_valid=n),
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, bq, dh), lambda i, j: (i, j, 0)),
            pl.BlockSpec((1, n, dh), lambda i, j: (i, 0, 0)),
            pl.BlockSpec((1, n, dh), lambda i, j: (i, 0, 0)),
        ],
        out_specs=pl.BlockSpec((1, bq, dh), lambda i, j: (i, j, 0)),
        out_shape=jax.ShapeDtypeStruct((b * num_heads, n, dh), qkv.dtype),
        interpret=interpret,
    )(t[0], t[1], t[2])
    out = out.reshape(b, num_heads, n, dh)
    return jnp.moveaxis(out, 1, 2).reshape(b, n, c)


def _attn_kernel_pairs(q_ref, k_ref, v_ref, o_ref, *, scale, n_valid):
    """Two heads per grid step, read straight from the packed [B, N, 3C]
    layout: each 128-lane block holds a HEAD PAIR (dh=64), sliced in VMEM —
    no HBM relayout on input or output."""
    prec = (jax.lax.Precision.HIGHEST if q_ref.dtype == jnp.float32
            else jax.lax.Precision.DEFAULT)
    mm = dict(preferred_element_type=jnp.float32, precision=prec)
    q2 = q_ref[0]  # [bq, 128] = heads (2h, 2h+1) side by side
    k2 = k_ref[0]  # [N, 128]
    v2 = v_ref[0]  # [N, 128]
    halves = []
    for lo in (0, 64):
        q = q2[:, lo:lo + 64]
        k = k2[:, lo:lo + 64]
        s = jax.lax.dot_general(
            q, k, dimension_numbers=(((1,), (1,)), ((), ())), **mm
        ) * scale
        col = jax.lax.broadcasted_iota(jnp.int32, s.shape, 1)
        s = jnp.where(col < n_valid, s, -jnp.inf)
        m = jnp.max(s, axis=-1, keepdims=True)
        e = jnp.exp(s - m)
        p = e / jnp.sum(e, axis=-1, keepdims=True)
        halves.append(jnp.dot(p.astype(v2.dtype), v2[:, lo:lo + 64], **mm))
    o_ref[0] = jnp.concatenate(halves, axis=-1).astype(o_ref.dtype)


@functools.partial(
    jax.jit, static_argnames=("num_heads", "scale", "interpret", "bq"))
def _mha_qkv_pallas_pairs(qkv, num_heads, scale, interpret=False, bq=None):
    """Zero-relayout fused self-attention on the packed [B, N, 3C] tensor.

    Requires dh == 64 and an even head count (true of every architecture in
    the framework: ViT-S 6×64, CLIP-B 12×64, SimpleViT 8×64): a pair of
    adjacent heads occupies one 128-lane block at a 128-aligned offset, so
    three BlockSpecs with different lane-block index_maps read q/k/v for a
    head pair DIRECTLY from the projection's output layout, and the output
    block lands directly in the [B, N, C] layout the next matmul consumes.
    Removes both the input transpose and the output moveaxis of
    _mha_qkv_pallas (the remaining `copy` bucket in docs/PERF.md's per-click
    attribution). Heads are sliced 64-wide inside VMEM, where the relayout
    is register traffic, not HBM."""
    b, n, three_c = qkv.shape
    c = three_c // 3
    dh = c // num_heads
    assert dh == 64 and num_heads % 2 == 0, "pairs kernel needs dh=64, even H"
    pairs = num_heads // 2
    pc = c // 128  # lane-blocks per tensor = pairs
    assert pc == pairs
    if bq is None:
        # One tight query block when the f32 score panel fits VMEM: at the
        # 1025-token serving shape, bq=256 pads the query grid to 1280 rows
        # (25% wasted QK^T/PV work) and re-reads the K/V panels 5x. A single
        # 1040-row block measured 0.480 vs 0.732 ms/call (1.52x) on v5e
        # (scripts/bench_attn_bq.py; 528 scored 0.564, 352 scored 0.811).
        # Beyond ~1152 rows the [bq, n] f32 score/exp panels crowd VMEM:
        # fall back to 512-row blocks (the best multi-block size measured).
        tight = -(-n // 16) * 16  # bf16 sublane-tile multiple
        bq = tight if tight <= 1152 else 512
    grid = (b, pairs, -(-n // bq))
    out = pl.pallas_call(
        functools.partial(_attn_kernel_pairs, scale=scale, n_valid=n),
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, bq, 128), lambda i, h, j: (i, j, h)),
            pl.BlockSpec((1, n, 128), lambda i, h, j: (i, 0, pairs + h)),
            pl.BlockSpec((1, n, 128), lambda i, h, j: (i, 0, 2 * pairs + h)),
        ],
        out_specs=pl.BlockSpec((1, bq, 128), lambda i, h, j: (i, j, h)),
        out_shape=jax.ShapeDtypeStruct((b, n, c), qkv.dtype),
        interpret=interpret,
    )(qkv, qkv, qkv)
    return out


def _mha_qkv_route(qkv, num_heads, scale, interpret=False):
    c = qkv.shape[-1] // 3
    eligible = (c % num_heads == 0 and c // num_heads == 64
                and num_heads % 2 == 0)
    # The pairs kernel is on-chip validated (scripts/validate_attn_pairs.py:
    # parity ≤1e-3 bf16 / 2.4e-7 f32 on TPU v5e) and measured 1.49x faster
    # than the packed kernel at the serving shape in bf16 (0.74 vs 1.10
    # ms/call, [16,1025,3·384], dispatch-amortized — docs/PERF.md). Default
    # ON where eligible; ISEG_ATTN_PAIRS=0 forces the generic packed kernel
    # (escape hatch + keeps it benchmarkable).
    import os

    if eligible and os.environ.get("ISEG_ATTN_PAIRS") != "0":
        return _mha_qkv_pallas_pairs(qkv, num_heads, scale, interpret)
    return _mha_qkv_pallas(qkv, num_heads, scale, interpret)


@functools.partial(jax.custom_vjp, nondiff_argnums=(1, 2, 3))
def _mha_qkv_pallas_ad(qkv, num_heads, scale, interpret=False):
    return _mha_qkv_route(qkv, num_heads, scale, interpret)


def _mha_qkv_jnp(qkv, num_heads, scale, key_mask=None):
    b, n, three_c = qkv.shape
    c = three_c // 3
    t = qkv.reshape(b, n, 3, num_heads, c // num_heads)
    out = _mha_jnp(t[:, :, 0], t[:, :, 1], t[:, :, 2], scale,
                   key_mask=key_mask)
    return out.reshape(b, n, c)


def _mha_qkv_pallas_ad_fwd(qkv, num_heads, scale, interpret=False):
    return _mha_qkv_route(qkv, num_heads, scale, interpret), (qkv,)


def _mha_qkv_pallas_ad_bwd(num_heads, scale, interpret, residuals, g):
    (qkv,) = residuals
    _, vjp = jax.vjp(lambda t: _mha_qkv_jnp(t, num_heads, scale), qkv)
    return vjp(g)


_mha_qkv_pallas_ad.defvjp(_mha_qkv_pallas_ad_fwd, _mha_qkv_pallas_ad_bwd)


def mha_qkv(
    qkv: jnp.ndarray,
    num_heads: int,
    scale: float | None = None,
    impl: str = "auto",
    key_mask: jnp.ndarray | None = None,
) -> jnp.ndarray:
    """Self-attention over a PACKED [B, N, 3·C] qkv tensor -> [B, N, C].

    Same semantics as splitting qkv into [B, N, H, Dh] q/k/v and calling
    ``mha`` — but the pallas path consumes the packed tensor with ONE
    relayout instead of four (docstring of _mha_qkv_pallas). ``auto``
    follows mha's measured policy (jnp at small scale / f32, fused kernel
    for big-bf16 or long sequences).

    ``key_mask`` [B, N]: exclude masked keys from every softmax (the
    adaptive-canvas dynamic-grid eval). Routed to the jnp path — the fused
    kernels don't take a mask, and the masked mode's token counts are far
    below their profitability threshold anyway."""
    b, n, three_c = qkv.shape
    c = three_c // 3
    dh = c // num_heads
    if scale is None:
        scale = dh**-0.5
    if key_mask is not None:
        return _mha_qkv_jnp(qkv, num_heads, scale, key_mask=key_mask)
    if impl == "auto":
        on_tpu = jax.default_backend() not in ("cpu", "gpu")
        score_bytes = 4 * b * num_heads * n * n
        big_bf16 = qkv.dtype == jnp.bfloat16 and score_bytes > 64e6
        impl = "pallas" if on_tpu and (n > 4096 or big_bf16) else "jnp"
    if impl == "jnp":
        return _mha_qkv_jnp(qkv, num_heads, scale)
    if impl == "pallas":
        return _mha_qkv_pallas_ad(qkv, num_heads, scale)
    if impl == "pallas_interpret":
        return _mha_qkv_pallas_ad(qkv, num_heads, scale, True)
    raise ValueError(f"Unknown attention impl: {impl}")


def _attn_kernel(q_ref, k_ref, v_ref, o_ref, *, scale, n_valid):
    q = q_ref[0]  # [bq, d] — input dtype: bf16 inputs ride the bf16 MXU
    k = k_ref[0]  # [Np, d]
    # f32 accumulation always. The precision must be EXPLICIT: the package
    # sets jax_default_matmul_precision=float32 globally (f32 NoC parity),
    # and an unannotated bf16 dot_general would inherit fp32 contract
    # precision, which Mosaic rejects on bf16 operands ("Bad lhs type").
    # DEFAULT keeps bf16 inputs on the one-pass bf16 MXU; f32 inputs keep
    # HIGHEST for exact parity with the jnp path.
    prec = (jax.lax.Precision.HIGHEST if q.dtype == jnp.float32
            else jax.lax.Precision.DEFAULT)
    mm = dict(preferred_element_type=jnp.float32, precision=prec)
    s = jax.lax.dot_general(
        q, k, dimension_numbers=(((1,), (1,)), ((), ())), **mm
    ) * scale  # [bq, Np] f32
    col = jax.lax.broadcasted_iota(jnp.int32, s.shape, 1)
    s = jnp.where(col < n_valid, s, -jnp.inf)
    # numerically-stable softmax in f32
    m = jnp.max(s, axis=-1, keepdims=True)
    e = jnp.exp(s - m)
    p = e / jnp.sum(e, axis=-1, keepdims=True)
    o = jnp.dot(p.astype(v_ref.dtype), v_ref[0], **mm)
    o_ref[0] = o.astype(o_ref.dtype)


@functools.partial(jax.jit, static_argnames=("scale", "interpret"))
def _mha_pallas(q, k, v, scale, interpret=False):
    """Fused attention. q: [B, Nq, H, Dh]; k, v: [B, Nk, H, Dh] (cross-attention
    supported — LoftUp attends ~200k image-coordinate queries to 1k low-res
    feature keys, reference: core/model/upsamplers/loftup/layers.py:177-202)."""
    b, nq, h, d = q.shape
    nk = k.shape[1]
    # Mosaic rejects mixed-dtype matmuls; unify on q's dtype defensively
    k = k.astype(q.dtype)
    v = v.astype(q.dtype)
    bq = 128
    nq_pad = -(-nq // bq) * bq
    nk_pad = -(-nk // 128) * 128

    def to_bh(x, n, n_pad):
        x = jnp.moveaxis(x, 2, 1).reshape(b * h, n, d)
        return jnp.pad(x, ((0, 0), (0, n_pad - n), (0, 0)))

    qf = to_bh(q, nq, nq_pad)
    kf = to_bh(k, nk, nk_pad)
    vf = to_bh(v, nk, nk_pad)

    grid = (b * h, nq_pad // bq)
    out = pl.pallas_call(
        functools.partial(_attn_kernel, scale=scale, n_valid=nk),
        out_shape=jax.ShapeDtypeStruct((b * h, nq_pad, d), q.dtype),
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, bq, d), lambda i, j: (i, j, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, nk_pad, d), lambda i, j: (i, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, nk_pad, d), lambda i, j: (i, 0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, bq, d), lambda i, j: (i, j, 0), memory_space=pltpu.VMEM),
        interpret=interpret,
    )(qf, kf, vf)

    out = out[:, :nq].reshape(b, h, nq, d)
    return jnp.moveaxis(out, 1, 2)


@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4))
def _mha_pallas_ad(q, k, v, scale, interpret=False):
    """Differentiable wrapper: fused Pallas forward, jnp-graph backward (the
    kernel itself has no VJP; training through frozen backbones still needs
    gradients w.r.t. injected click tokens)."""
    return _mha_pallas(q, k, v, scale, interpret)


def _mha_pallas_ad_fwd(q, k, v, scale, interpret=False):
    return _mha_pallas(q, k, v, scale, interpret), (q, k, v)


def _mha_pallas_ad_bwd(scale, interpret, residuals, g):
    q, k, v = residuals
    _, vjp = jax.vjp(lambda q_, k_, v_: _mha_jnp(q_, k_, v_, scale), q, k, v)
    return vjp(g)


_mha_pallas_ad.defvjp(_mha_pallas_ad_fwd, _mha_pallas_ad_bwd)


def mha(
    q: jnp.ndarray,
    k: jnp.ndarray,
    v: jnp.ndarray,
    scale: float | None = None,
    impl: str = "auto",
) -> jnp.ndarray:
    """Multi-head attention over [B, N, H, Dh] tensors (no masking of queries).

    impl: 'auto' | 'jnp' | 'pallas' | 'pallas_interpret' (CPU kernel testing).

    'auto' picks by measured crossover on a v5e chip (f32, 6 heads x 64):
    XLA's fused full attention wins at reference scale (N=1025: 1.5 vs 1.8 ms;
    N=2305: 2.6 vs 2.8) while the query-blocked Pallas kernel wins — and
    avoids the N² score materialization — from ~8k tokens (N=9216: 14.9 vs
    17.6 ms). Reference workloads top out at 2305 tokens (DAVIS 672²), so
    'auto' means jnp there and pallas only for long-sequence probing.

    The second 'auto' trigger is TOTAL attention-matrix size, not sequence
    length: XLA materializes the full [B, H, Nq, Nk] f32 score tensor to HBM
    (it does not flash-fuse attention), so at serving batch the bf16 jnp path
    turns bandwidth-bound — a profiler trace of the batch-8 flip-TTA device
    eval (docs/PERF.md) shows ~400 MB per ViT block, ~24 ms/click across 12
    blocks. For bf16 inputs with a score tensor over ~64 MB the VMEM-resident
    Pallas kernel wins regardless of N, so 'auto' switches to it there
    (≥ batch 4 flip-TTA at 448²); the single-sample latency path (50 MB)
    stays on the measured jnp side, as does all-f32 serving (measured slower
    through the kernel: 81 vs 95 clicks/s batch-8 — f32 MXU passes cost more
    than the HBM roundtrip saves).
    """
    if scale is None:
        scale = q.shape[-1] ** -0.5
    if impl == "auto":
        on_tpu = jax.default_backend() not in ("cpu", "gpu")
        score_bytes = 4 * q.shape[0] * q.shape[2] * q.shape[1] * k.shape[1]
        big_bf16 = q.dtype == jnp.bfloat16 and score_bytes > 64e6
        impl = ("pallas"
                if on_tpu and (q.shape[1] > 4096 or big_bf16)
                else "jnp")
    if impl == "jnp":
        return _mha_jnp(q, k, v, scale)
    if impl == "pallas":
        return _mha_pallas_ad(q, k, v, scale)
    if impl == "pallas_interpret":
        return _mha_pallas_ad(q, k, v, scale, True)
    raise ValueError(f"Unknown attention impl: {impl}")
