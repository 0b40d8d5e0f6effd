"""Fused Pallas kernels for Joint Bilateral Upsampling (FeatUp JBU stage).

The XLA composition in models/upsamplers/jbu.py materializes the [B, H, W, 49]
similarity/kernel tensors and 49 shifted products in HBM. These kernels fuse
the whole stage per spatial tile:

  K1 (weights): range similarities (49 shifted key-dots) -> softmax(temp·sim)
      × spatial Gaussian -> normalized combined kernel, per tile.
  K2 (apply):   out = Σ_p kernel[..., p] · hr_source[shifted_p], channel-blocked.

Halos: overlapping input windows are not expressible with disjoint BlockSpecs,
so the (reflect-)padded inputs stay in HBM/ANY and each program DMAs its
(tile + 2r halo) slab into VMEM scratch (double-buffering is unnecessary —
the DMA is tiny relative to the 49-tap compute).
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


def _weights_kernel(temp_ref, spatial_ref, proj_hbm, w_ref, scratch, sem, *,
                    th, tw, key_dim):
    b = pl.program_id(0)
    i = pl.program_id(1)
    j = pl.program_id(2)

    dma = pltpu.make_async_copy(
        proj_hbm.at[b, pl.ds(i * th, th + 2 * RADIUS),
                    pl.ds(j * tw, tw + 2 * RADIUS), :],
        scratch,
        sem,
    )
    dma.start()
    dma.wait()

    center = scratch[RADIUS : RADIUS + th, RADIUS : RADIUS + tw, :]
    sims = []
    for ky in range(DIAM):
        for kx in range(DIAM):
            shifted = scratch[ky : ky + th, kx : kx + tw, :]
            sims.append(jnp.sum(center * shifted, axis=-1))
    s = jnp.stack(sims, axis=-1)  # [th, tw, 49]

    temp = jnp.clip(jnp.exp(temp_ref[0, 0]), 1e-4, 1e4)
    s = s * temp
    m = jnp.max(s, axis=-1, keepdims=True)
    e = jnp.exp(s - m)
    rk = e / jnp.sum(e, axis=-1, keepdims=True)

    # spatial gaussian precomputed outside the kernel (49 scalars of sigma)
    k = rk * spatial_ref[0]
    k = k / jnp.maximum(jnp.sum(k, axis=-1, keepdims=True), 1e-7)
    w_ref[0] = k


def _apply_kernel(w_ref, hr_hbm, o_ref, scratch, sem, *, th, tw, cb):
    b = pl.program_id(0)
    i = pl.program_id(1)
    j = pl.program_id(2)
    c = pl.program_id(3)

    dma = pltpu.make_async_copy(
        hr_hbm.at[b, pl.ds(i * th, th + 2 * RADIUS),
                  pl.ds(j * tw, tw + 2 * RADIUS), pl.ds(c * cb, cb)],
        scratch,
        sem,
    )
    dma.start()
    dma.wait()

    acc = jnp.zeros((th, tw, cb), dtype=jnp.float32)
    p = 0
    for ky in range(DIAM):
        for kx in range(DIAM):
            acc = acc + w_ref[0, :, :, p : p + 1] * scratch[
                ky : ky + th, kx : kx + tw, :
            ]
            p += 1
    o_ref[0] = acc.astype(o_ref.dtype)


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
    key_dim = proj.shape[-1]
    th = min(64, max(8, h))
    tw = min(128, max(8, w))

    hr_p = jnp.pad(hr, ((0, 0), (RADIUS, RADIUS), (RADIUS, RADIUS), (0, 0)),
                   mode="reflect")
    proj_p = jnp.pad(proj, ((0, 0), (RADIUS, RADIUS), (RADIUS, RADIUS), (0, 0)),
                     mode="reflect")
    # pad spatial dims so tiles divide evenly (the tail tiles read zero-pads;
    # their outputs are cropped away)
    hr_p = _pad_to(_pad_to(hr_p, 1, th), 2, tw)
    proj_p = _pad_to(_pad_to(proj_p, 1, th), 2, tw)
    hp = hr_p.shape[1] - 2 * RADIUS
    wp = hr_p.shape[2] - 2 * RADIUS
    nh, nw = hp // th, wp // tw

    temp_arr = jnp.asarray(temp, jnp.float32).reshape(1, 1)
    grid = jnp.linspace(-1.0, 1.0, DIAM)
    yy, xx = jnp.meshgrid(grid, grid, indexing="ij")
    spatial_arr = jnp.exp(
        -(yy**2 + xx**2) / (2.0 * jnp.asarray(sigma, jnp.float32) ** 2)
    ).reshape(1, NTAP)

    weights = pl.pallas_call(
        functools.partial(_weights_kernel, th=th, tw=tw, key_dim=key_dim),
        out_shape=jax.ShapeDtypeStruct((b, hp, wp, NTAP), jnp.float32),
        grid=(b, nh, nw),
        in_specs=[
            pl.BlockSpec((1, 1), lambda bi, i, j: (0, 0),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec((1, NTAP), lambda bi, i, j: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.ANY),
        ],
        out_specs=pl.BlockSpec((1, th, tw, NTAP),
                               lambda bi, i, j: (bi, i, j, 0),
                               memory_space=pltpu.VMEM),
        scratch_shapes=[
            pltpu.VMEM((th + 2 * RADIUS, tw + 2 * RADIUS, key_dim),
                       jnp.float32),
            pltpu.SemaphoreType.DMA(()),
        ],
        interpret=interpret,
    )(temp_arr, spatial_arr, proj_p.astype(jnp.float32))

    cb = min(128, cch)
    hr_pc = _pad_to(hr_p, 3, cb).astype(jnp.float32)
    cp = hr_pc.shape[-1]
    nc = cp // cb

    out = pl.pallas_call(
        functools.partial(_apply_kernel, th=th, tw=tw, cb=cb),
        out_shape=jax.ShapeDtypeStruct((b, hp, wp, cp), jnp.float32),
        grid=(b, nh, nw, nc),
        in_specs=[
            pl.BlockSpec((1, th, tw, NTAP),
                         lambda bi, i, j, c: (bi, i, j, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.ANY),
        ],
        out_specs=pl.BlockSpec((1, th, tw, cb),
                               lambda bi, i, j, c: (bi, i, j, c),
                               memory_space=pltpu.VMEM),
        scratch_shapes=[
            pltpu.VMEM((th + 2 * RADIUS, tw + 2 * RADIUS, cb), jnp.float32),
            pltpu.SemaphoreType.DMA(()),
        ],
        interpret=interpret,
    )(weights, hr_pc)

    return out[:, :h, :w, :cch].astype(hr.dtype)
