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
                pscr, hscr, sems, *, th, tw, cb, key_dim):
    b = pl.program_id(0)
    i = pl.program_id(1)
    j = pl.program_id(2)
    c = pl.program_id(3)

    # width slab is tw + 8 (>= tw + 2*RADIUS, 8-sublane aligned for the DMA)
    pdma = pltpu.make_async_copy(
        proj_hbm.at[b, pl.ds(i * th, th + 2 * RADIUS),
                    pl.ds(j * tw, tw + 8), :],
        pscr,
        sems.at[0],
    )
    hdma = pltpu.make_async_copy(
        hr_hbm.at[b, pl.ds(i * th, th + 2 * RADIUS),
                  pl.ds(j * tw, tw + 8), pl.ds(c * cb, cb)],
        hscr,
        sems.at[1],
    )
    pdma.start()
    hdma.start()
    pdma.wait()
    hdma.wait()

    center = pscr[RADIUS : RADIUS + th, RADIUS : RADIUS + tw, :]
    temp = jnp.clip(jnp.exp(temp_ref[0, 0]), 1e-4, 1e4)

    # Loop structure: rolled fori over the 7 row offsets (dynamic slice on the
    # cheap untiled dim 0) with the 7 column offsets unrolled as static
    # sublane shifts. Fully unrolling 49 taps blows the 16M scoped-VMEM stack;
    # fully rolling makes Mosaic lower 49 dynamic sublane shifts (minutes of
    # compile). This hybrid keeps ≤7 tap temporaries live.

    def row_sims(ky):
        """[DIAM, th, tw] similarities of the 7 taps in row offset ky."""
        rslab = pscr[pl.ds(ky, th), :, :]  # [th, tw+8, K]
        return [
            jnp.sum(center * rslab[:, kx : kx + tw, :], axis=-1) * temp
            for kx in range(DIAM)
        ]

    def max_body(ky, acc):
        for s in row_sims(ky):
            acc = jnp.maximum(acc, s)
        return acc

    m = jax.lax.fori_loop(
        0, DIAM, max_body, jnp.full((th, tw), -jnp.inf, dtype=jnp.float32)
    )

    def acc_body(ky, carry):
        num, den = carry
        hslab = hscr[pl.ds(ky, th), :, :]  # [th, tw+8, cb]
        for kx, s in enumerate(row_sims(ky)):
            # spatial weight: dynamic row offset × static col offset
            e = jnp.exp(s - m) * spatial_ref[0, ky * DIAM + kx]
            den = den + e
            num = num + e[:, :, None] * hslab[:, kx : kx + tw, :]
        return num, den

    num, den = jax.lax.fori_loop(
        0, DIAM, acc_body,
        (jnp.zeros((th, tw, cb), jnp.float32), jnp.zeros((th, tw), jnp.float32)),
    )

    o_ref[0] = (num / jnp.maximum(den, 1e-7)[:, :, None]).astype(o_ref.dtype)


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
    # tile sized to keep halo slabs + fori carries + one tap's temporaries
    # inside the 16M scoped-VMEM budget
    th = min(16, max(8, h))
    tw = min(96, max(8, w))

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

    cb = min(128, cch)
    hr_pc = _pad_to(hr_p, 3, cb).astype(jnp.float32)
    cp = hr_pc.shape[-1]
    nc = cp // cb

    temp_arr = jnp.asarray(temp, jnp.float32).reshape(1, 1)
    grid = jnp.linspace(-1.0, 1.0, DIAM)
    yy, xx = jnp.meshgrid(grid, grid, indexing="ij")
    spatial_arr = jnp.exp(
        -(yy**2 + xx**2) / (2.0 * jnp.asarray(sigma, jnp.float32) ** 2)
    ).reshape(1, NTAP)

    out = pl.pallas_call(
        functools.partial(_jbu_kernel, th=th, tw=tw, cb=cb, key_dim=key_dim),
        out_shape=jax.ShapeDtypeStruct((b, hp, wp, cp), jnp.float32),
        grid=(b, nh, nw, nc),
        in_specs=[
            pl.BlockSpec((1, 1), lambda bi, i, j, c: (0, 0),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec((1, NTAP), lambda bi, i, j, c: (0, 0),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pltpu.ANY),
            pl.BlockSpec(memory_space=pltpu.ANY),
        ],
        out_specs=pl.BlockSpec((1, th, tw, cb),
                               lambda bi, i, j, c: (bi, i, j, c),
                               memory_space=pltpu.VMEM),
        scratch_shapes=[
            pltpu.VMEM((th + 2 * RADIUS, tw + 8, key_dim), jnp.float32),
            pltpu.VMEM((th + 2 * RADIUS, tw + 8, cb), jnp.float32),
            pltpu.SemaphoreType.DMA((2,)),
        ],
        interpret=interpret,
    )(temp_arr, spatial_arr, proj_p.astype(jnp.float32), hr_pc)

    return out[:, :h, :w, :cch].astype(hr.dtype)
