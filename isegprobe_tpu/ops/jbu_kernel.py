"""Fused Pallas kernel for Joint Bilateral Upsampling (FeatUp JBU stage).

The XLA composition in models/upsamplers/jbu.py materializes the [B, H, W, 49]
similarity/kernel tensors and 49 shifted products in HBM. This kernel fuses
the WHOLE stage per (spatial tile, channel block) with a two-pass online
softmax so the per-pixel 49-tap kernel never exists anywhere:

  pass 1:  m(x)   = max_p temp·⟨key(x), key(x+p)⟩
  pass 2:  e_p(x) = exp(temp·⟨key(x), key(x+p)⟩ − m) · spatial_p
           out(x) = Σ_p e_p(x)·hr(x+p) / Σ_p e_p(x)

(the softmax normalizer cancels against the kernel normalization, reference
FeatUp math; see models/upsamplers/jbu.py for the unfused form).

Halos: overlapping windows aren't expressible with disjoint BlockSpecs, so the
reflect-padded inputs stay in HBM/ANY and each program DMAs its
(tile + 2r halo) slab into VMEM scratch. Sliced DMAs require 128-aligned minor
dims, so the key channels are zero-padded to 128 (zero keys add 0 to dots).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

RADIUS = 3
DIAM = 2 * RADIUS + 1
NTAP = DIAM * DIAM  # 49


def _jbu_kernel(temp_ref, spatial_ref, proj_hbm, hr_hbm, o_ref,
                pscr, hscr, escr, sems, *, th, tw, cb, nc, key_dim):
    b = pl.program_id(0)
    i = pl.program_id(1)
    j = pl.program_id(2)

    # width slab is tw + 8 (>= tw + 2*RADIUS, 8-sublane aligned for the DMA)
    pdma = pltpu.make_async_copy(
        proj_hbm.at[b, pl.ds(i * th, th + 2 * RADIUS),
                    pl.ds(j * tw, tw + 8), :],
        pscr,
        sems.at[0],
    )
    hdma = pltpu.make_async_copy(
        hr_hbm.at[b, pl.ds(i * th, th + 2 * RADIUS),
                  pl.ds(j * tw, tw + 8), :],
        hscr,
        sems.at[1],
    )
    pdma.start()
    hdma.start()
    pdma.wait()

    center = pscr[RADIUS : RADIUS + th, RADIUS : RADIUS + tw, :]
    temp = jnp.clip(jnp.exp(temp_ref[0, 0]), 1e-4, 1e4)

    # Loop structure: rolled fori over the 7 row offsets (dynamic slice on the
    # cheap untiled dim 0); everything per-offset runs on the MXU. Fully
    # unrolling 49 taps blows the 16M scoped-VMEM stack; fully rolling makes
    # Mosaic lower 49 dynamic sublane shifts (minutes of compile).
    jj = jax.lax.broadcasted_iota(jnp.int32, (tw, tw + 8), 0)
    tt = jax.lax.broadcasted_iota(jnp.int32, (tw, tw + 8), 1)
    dmask = [(tt == jj + kx).astype(jnp.float32) for kx in range(DIAM)]

    # Similarities via a Gram matmul: G[s,j,t] = ⟨key(s,j), key(s+ky,t)⟩ for
    # one row offset ky computes all 7 column taps at once — the taps are G's
    # band diagonals. One [tw,K]x[K,tw+8] batched matmul replaces 7 VPU
    # K-wide reductions; raw sims land in escr so max/exp never recompute.
    def sims_body(ky, m):
        rslab = pscr[pl.ds(ky, th), :, :]  # [th, tw+8, K]
        gram = jax.lax.dot_general(
            center, rslab, (((2,), (2,)), ((0,), (0,))),
            preferred_element_type=jnp.float32,
        )  # [th, tw, tw+8]
        for kx in range(DIAM):
            s = jnp.sum(gram * dmask[kx][None], axis=-1) * temp
            escr[ky * DIAM + kx] = s
            m = jnp.maximum(m, s)
        return m

    m = jax.lax.fori_loop(
        0, DIAM, sims_body, jnp.full((th, tw), -jnp.inf, dtype=jnp.float32)
    )

    def weight_body(ky, den):
        for kx in range(DIAM):
            p = ky * DIAM + kx
            e = jnp.exp(escr[p] - m) * spatial_ref[0, p]
            escr[p] = e
            den = den + e
        return den

    den = jax.lax.fori_loop(
        0, DIAM, weight_body, jnp.zeros((th, tw), jnp.float32)
    )
    inv_den = 1.0 / jnp.maximum(den, 1e-7)

    hdma.wait()

    # Accumulation on the MXU: out[s,j,c] = Σ_ky Σ_kx E[ky,kx][s,j]·hr[s+ky,
    # j+kx,c] is, per row offset ky, a *banded* matmul — scatter the 7 tap
    # weight planes onto band diagonals M[s,j,j+kx] and contract with the
    # [tw+8, C] slab. 7 batched 96×104×C matmuls beat 49 shifted
    # multiply-adds on the VPU.
    def acc_body(ky, num):
        hslab = hscr[pl.ds(ky, th), :, :]  # [th, tw+8, cp]
        band = jnp.zeros((th, tw, tw + 8), jnp.float32)
        for kx in range(DIAM):
            band = band + escr[ky * DIAM + kx][:, :, None] * dmask[kx][None]
        return num + jax.lax.dot_general(
            band, hslab, (((2,), (1,)), ((0,), (0,))),
            preferred_element_type=jnp.float32,
        )

    num = jax.lax.fori_loop(
        0, DIAM, acc_body,
        jnp.zeros((th, tw, hscr.shape[-1]), jnp.float32),
    )
    o_ref[0] = (num * inv_den[:, :, None]).astype(o_ref.dtype)


def _pad_to(x, axis, multiple):
    size = x.shape[axis]
    pad = (-size) % multiple
    if pad == 0:
        return x
    widths = [(0, 0)] * x.ndim
    widths[axis] = (0, pad)
    return jnp.pad(x, widths)


@functools.partial(jax.jit, static_argnames=("interpret",))
def jbu_filter_pallas(hr, proj, temp, sigma, interpret: bool = False):
    """Fused JBU filtering.

    hr:   [B, H, W, C]  bicubically pre-upsampled source features
    proj: [B, H, W, K]  range-encoder output on the guidance
    temp, sigma: scalars (learned log-temperature and spatial sigma)
    Returns [B, H, W, C].
    """
    b, h, w, cch = hr.shape
    proj = _pad_to(proj, 3, 128)  # DMA minor-dim alignment
    key_dim = proj.shape[-1]
    # tile sized to keep halo slabs (full channel extent since v2 sweeps
    # channels inside the program) + fori carries + the unrolled row of tap
    # temporaries inside the 16M scoped-VMEM budget
    th = min(16, max(8, h))
    tw = min(64, max(8, w))

    # output tiling covers [0, hp) x [0, wp) with hp/wp the tile-rounded-up
    # extents; straddling tiles read only the reflect halo for their valid
    # rows/cols, fully-out-of-range tile outputs are cropped away
    nh, nw = -(-h // th), -(-w // tw)
    hp, wp = nh * th, nw * tw

    hr_p = jnp.pad(hr, ((0, 0), (RADIUS, RADIUS), (RADIUS, RADIUS), (0, 0)),
                   mode="reflect")
    proj_p = jnp.pad(proj, ((0, 0), (RADIUS, RADIUS), (RADIUS, RADIUS), (0, 0)),
                     mode="reflect")
    # grow to (hp + 2r) x (wp + 8-aligned slab width) with zeros
    pad_h = hp + 2 * RADIUS - hr_p.shape[1]
    pad_w = wp + 8 - hr_p.shape[2]  # last tile's slab spans wp - tw .. wp + 8
    hr_p = jnp.pad(hr_p, ((0, 0), (0, pad_h), (0, pad_w), (0, 0)))
    proj_p = jnp.pad(proj_p, ((0, 0), (0, pad_h), (0, pad_w), (0, 0)))

    # channel padding to 128 keeps the hr DMA minor dim aligned (narrower
    # minors crash the Mosaic compile), mirroring the proj 32->128 pad
    cb = 128
    hr_pc = _pad_to(hr_p, 3, cb).astype(jnp.float32)
    cp = hr_pc.shape[-1]
    nc = cp // cb
    # the channel sweep lives inside the program (weights computed once per
    # tile); hscr VMEM grows with cp, so very wide features would need a
    # channel-grid variant — the JBU configs top out at C=384
    assert cp <= 512, f"jbu_filter_pallas supports C<=512, got {cch}"

    temp_arr = jnp.asarray(temp, jnp.float32).reshape(1, 1)
    grid = jnp.linspace(-1.0, 1.0, DIAM)
    yy, xx = jnp.meshgrid(grid, grid, indexing="ij")
    spatial_arr = jnp.exp(
        -(yy**2 + xx**2) / (2.0 * jnp.asarray(sigma, jnp.float32) ** 2)
    ).reshape(1, NTAP)

    out = pl.pallas_call(
        functools.partial(_jbu_kernel, th=th, tw=tw, cb=cb, nc=nc,
                          key_dim=key_dim),
        out_shape=jax.ShapeDtypeStruct((b, hp, wp, cp), jnp.float32),
        grid=(b, nh, nw),
        in_specs=[
            pl.BlockSpec((1, 1), lambda bi, i, j: (0, 0),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec((1, NTAP), lambda bi, i, j: (0, 0),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(memory_space=pl.ANY),
        ],
        out_specs=pl.BlockSpec((1, th, tw, cp),
                               lambda bi, i, j: (bi, i, j, 0),
                               memory_space=pltpu.VMEM),
        scratch_shapes=[
            pltpu.VMEM((th + 2 * RADIUS, tw + 8, key_dim), jnp.float32),
            pltpu.VMEM((th + 2 * RADIUS, tw + 8, cp), jnp.float32),
            pltpu.VMEM((NTAP, th, tw), jnp.float32),
            pltpu.SemaphoreType.DMA((2,)),
        ],
        interpret=interpret,
    )(temp_arr, spatial_arr, proj_p.astype(jnp.float32), hr_pc)

    return out[:, :h, :w, :cch].astype(hr.dtype)


def jbu_filter_xla(hr, proj, temp, sigma):
    """Unfused reference composition (rolled 49-tap loops; differentiable).

    Used as the CPU/test path and as the backward rule of the fused kernel.
    The naive unrolled form materializes 49 × [B, H, W, C] intermediates and
    OOMs HBM at the ×16 stage of a 448² eval, hence the fori_loop form.
    """
    r, d = RADIUS, DIAM
    b, gh, gw, c = hr.shape
    kc = proj.shape[-1]

    proj_pad = jnp.pad(proj, ((0, 0), (r, r), (r, r), (0, 0)), mode="reflect")

    def sims_body(p, sims):
        ky, kx = p // d, p % d
        shifted = jax.lax.dynamic_slice(proj_pad, (0, ky, kx, 0),
                                        (b, gh, gw, kc))
        s = jnp.sum(proj * shifted, axis=-1)
        return jax.lax.dynamic_update_index_in_dim(sims, s, p, axis=-1)

    sims = jax.lax.fori_loop(
        0, d * d, sims_body, jnp.zeros((b, gh, gw, d * d), jnp.float32)
    )
    temp_c = jnp.clip(jnp.exp(temp), 1e-4, 1e4)
    range_kernel = jax.nn.softmax(temp_c * sims, axis=-1)

    grid = jnp.linspace(-1.0, 1.0, d)
    yy, xx = jnp.meshgrid(grid, grid, indexing="ij")
    spatial = jnp.exp(-(yy**2 + xx**2) / (2.0 * sigma**2)).reshape(-1)
    kernel = range_kernel * spatial
    kernel = kernel / jnp.clip(kernel.sum(axis=-1, keepdims=True), 1e-7)

    hr_pad = jnp.pad(hr, ((0, 0), (r, r), (r, r), (0, 0)), mode="reflect")

    def acc_body(p, out):
        ky, kx = p // d, p % d
        shifted = jax.lax.dynamic_slice(hr_pad, (0, ky, kx, 0), (b, gh, gw, c))
        w = jax.lax.dynamic_index_in_dim(kernel, p, axis=-1, keepdims=True)
        return out + w * shifted

    return jax.lax.fori_loop(0, d * d, acc_body, jnp.zeros_like(hr))


@jax.custom_vjp
def _jbu_fused_core(hr, proj, temp, sigma):
    return jbu_filter_pallas(hr, proj, temp, sigma)


def _jbu_fused_fwd(hr, proj, temp, sigma):
    return _jbu_fused_core(hr, proj, temp, sigma), (hr, proj, temp, sigma)


def _jbu_fused_bwd(residuals, g):
    _, vjp = jax.vjp(jbu_filter_xla, *residuals)
    return vjp(g.astype(jnp.float32))


_jbu_fused_core.defvjp(_jbu_fused_fwd, _jbu_fused_bwd)


@jax.custom_batching.custom_vmap
def jbu_filter_fused(hr, proj, temp, sigma):
    """Fused Pallas forward with an XLA-composition backward: the kernel has
    no VJP of its own, but training differentiates *through* the upsampler
    (loss -> head -> upsampler -> backbone -> click encoder), so the backward
    recomputes via the numerically-identical unfused form (on-device parity
    ~1e-6, scripts/bench_jbu.py).

    vmap folds the mapped axis into the kernel's native batch grid dimension
    (the default pallas batching rule can't block ANY-memspace operands) —
    this is what lets the batched device evaluator vmap whole JBU models."""
    return _jbu_fused_core(hr, proj, temp, sigma)


@jbu_filter_fused.def_vmap
def _jbu_fused_vmap(axis_size, in_batched, hr, proj, temp, sigma):
    hr_b, proj_b, temp_b, sigma_b = in_batched
    if temp_b or sigma_b or not (hr_b and proj_b):
        # unusual batching (per-lane params) — fall back to the unfused form
        out = jax.vmap(jbu_filter_xla)(
            hr if hr_b else jnp.broadcast_to(hr, (axis_size, *hr.shape)),
            proj if proj_b else jnp.broadcast_to(proj,
                                                 (axis_size, *proj.shape)),
            temp if temp_b else jnp.broadcast_to(temp, (axis_size,)),
            sigma if sigma_b else jnp.broadcast_to(sigma, (axis_size,)),
        )
        return out, True
    v, b, h, w, c = hr.shape
    k = proj.shape[-1]
    out = _jbu_fused_core(hr.reshape(v * b, h, w, c),
                          proj.reshape(v * b, h, w, k), temp, sigma)
    return out.reshape(v, b, h, w, c), True
