"""Joint Bilateral Upsampling stack (FeatUp, paper 2403.10516).

The reference outsources this entirely to the FeatUp pip package via torch.hub
(reference: core/model/upsamplers/JBUFeatUp.py:30-32); here it is implemented
natively (SURVEY.md §2.11 N4). Architecture follows FeatUp's JBUStack: four
chained learned-JBU ×2 stages and a 0.1-scaled fixup projection residual.

Each stage:
  * projects the (stage-resolution) guidance image through a 1x1-conv → GELU →
    1x1-conv "range" encoder (key_dim 32),
  * builds a per-pixel 7×7 kernel = softmax(temp · ⟨key_i, key_j⟩) ×
    Gaussian(spatial distance; learned σ), normalized over the window,
  * applies it to the bicubically pre-upsampled source features.

The filtering is expressed as 49 shifted fused multiply-adds (XLA path); a
fused Pallas kernel is selected on TPU for the hot config (see
ops/jbu_kernel.py) — both paths share the parameters.
"""

from __future__ import annotations

from typing import Any

import flax.linen as nn
import jax
import jax.numpy as jnp

from isegprobe_tpu.ops.pool import adaptive_pool
from isegprobe_tpu.ops.resize import resize


class JBULearnedRange(nn.Module):
    """One ×2 JBU stage. __call__(source [B,h,w,C], guidance [B,2h,2w,3]).

    impl: 'xla' (shifted-slice composition) | 'pallas' (fused tile kernel,
    ops/jbu_kernel.py) | 'auto' (pallas on TPU).
    """

    key_dim: int = 32
    radius: int = 3
    impl: str = "auto"

    @nn.compact
    def __call__(self, source: jnp.ndarray, guidance: jnp.ndarray) -> jnp.ndarray:
        r = self.radius
        d = 2 * r + 1
        b, gh, gw, _ = guidance.shape

        range_temp = self.param("range_temp", nn.initializers.zeros, ())
        sigma_spatial = self.param("sigma_spatial", nn.initializers.ones, ())

        proj = nn.Conv(self.key_dim, (1, 1), name="range_proj1")(guidance)
        proj = jax.nn.gelu(proj, approximate=False)
        proj = nn.Conv(self.key_dim, (1, 1), name="range_proj2")(proj)

        hr = resize(source, (gh, gw), "bicubic", align_corners=False)

        impl = self.impl
        if impl == "auto":
            # the fused Pallas kernel is numerically verified (interpret mode,
            # tests/test_jbu_kernel.py) but this environment's remote Mosaic
            # compile service stalls on it; default to the XLA composition
            # until the kernel compile is validated on a standard TPU runtime
            impl = "xla"
        if impl in ("pallas", "pallas_interpret"):
            from isegprobe_tpu.ops.jbu_kernel import jbu_filter_pallas

            return jbu_filter_pallas(hr, proj, range_temp, sigma_spatial,
                                     interpret=(impl == "pallas_interpret"))

        # Rolled tap loops (lax.fori_loop + dynamic_slice): the naive 49-term
        # unrolled composition materializes ~49 × [B, gh, gw, C] intermediates
        # and OOMs HBM at the x16 stage of a 448² eval.
        proj_pad = jnp.pad(proj, ((0, 0), (r, r), (r, r), (0, 0)), mode="reflect")
        b = proj.shape[0]
        kc = proj.shape[-1]

        def sims_body(p, sims):
            ky, kx = p // d, p % d
            shifted = jax.lax.dynamic_slice(
                proj_pad, (0, ky, kx, 0), (b, gh, gw, kc)
            )
            s = jnp.sum(proj * shifted, axis=-1)
            return jax.lax.dynamic_update_index_in_dim(sims, s, p, axis=-1)

        sims = jax.lax.fori_loop(
            0, d * d, sims_body,
            jnp.zeros((b, gh, gw, d * d), jnp.float32),
        )
        temp = jnp.clip(jnp.exp(range_temp), 1e-4, 1e4)
        range_kernel = jax.nn.softmax(temp * sims, axis=-1)

        grid = jnp.linspace(-1.0, 1.0, d)
        yy, xx = jnp.meshgrid(grid, grid, indexing="ij")
        spatial = jnp.exp(-(yy**2 + xx**2) / (2.0 * sigma_spatial**2)).reshape(-1)

        kernel = range_kernel * spatial
        kernel = kernel / jnp.clip(kernel.sum(axis=-1, keepdims=True), 1e-7)

        hr_pad = jnp.pad(hr, ((0, 0), (r, r), (r, r), (0, 0)), mode="reflect")
        c = hr.shape[-1]

        def acc_body(p, out):
            ky, kx = p // d, p % d
            shifted = jax.lax.dynamic_slice(
                hr_pad, (0, ky, kx, 0), (b, gh, gw, c)
            )
            w = jax.lax.dynamic_index_in_dim(kernel, p, axis=-1, keepdims=True)
            return out + w * shifted

        return jax.lax.fori_loop(0, d * d, acc_body, jnp.zeros_like(hr))


class JBUFeatUpUpsampler(nn.Module):
    """FeatUp JBUStack: ×16 upsampling via four learned JBU stages.

    ``backbone_type``/``use_norm`` are accepted for config parity with the
    reference wrapper (JBUFeatUp.py:12-32) but do not change the upsampler.
    """

    backbone_type: str | None = None
    use_norm: bool = True
    key_dim: int = 32
    radius: int = 3
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, source: jnp.ndarray, guidance: jnp.ndarray) -> jnp.ndarray:
        feat_dim = source.shape[-1]
        for i in range(1, 5):
            h, w = source.shape[1], source.shape[2]
            g = adaptive_pool(guidance, (2 * h, 2 * w), "avg")
            source = JBULearnedRange(self.key_dim, self.radius, name=f"up{i}")(
                source, g
            )
        fix = nn.Conv(feat_dim, (1, 1), name="fixup_proj")(source)
        return fix * 0.1 + source
