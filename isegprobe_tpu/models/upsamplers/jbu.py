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

from isegprobe_tpu.models.vit import mm_precision
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
    # compute dtype (params stay f32); the Pallas filter accumulates in f32
    # internally regardless and returns the input dtype
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, source: jnp.ndarray, guidance: jnp.ndarray) -> jnp.ndarray:
        # the filter ops are specialized to FeatUp's 7x7 window
        assert self.radius == 3, "JBU filtering is built for radius 3"
        _, gh, gw, _ = guidance.shape
        source = source.astype(self.dtype)
        guidance = guidance.astype(self.dtype)

        range_temp = self.param("range_temp", nn.initializers.zeros, ())
        sigma_spatial = self.param("sigma_spatial", nn.initializers.ones, ())

        prec = mm_precision(self.dtype)
        proj = nn.Conv(self.key_dim, (1, 1), dtype=self.dtype, precision=prec,
                       name="range_proj1")(guidance)
        proj = jax.nn.gelu(proj, approximate=False)
        proj = nn.Conv(self.key_dim, (1, 1), dtype=self.dtype, precision=prec,
                       name="range_proj2")(proj)

        hr = resize(source, (gh, gw), "bicubic", align_corners=False)

        from isegprobe_tpu.ops.jbu_kernel import (
            jbu_filter_fused,
            jbu_filter_pallas,
            jbu_filter_xla,
        )

        impl = self.impl
        if impl == "auto":
            # fused Pallas kernel on TPU (validated on-chip: exact match vs
            # interpret and ~1e-6 vs the XLA composition, 3.7x faster —
            # tests/test_jbu_kernel.py + scripts/bench_jbu.py); XLA
            # composition elsewhere (CPU tests)
            on_tpu = jax.default_backend() not in ("cpu", "gpu")
            impl = "pallas" if on_tpu else "xla"
        if impl == "pallas":
            # custom-VJP wrapper: fused forward, unfused backward (training
            # differentiates through the frozen upsampler to the click encoder)
            return jbu_filter_fused(hr, proj, range_temp, sigma_spatial)
        if impl == "pallas_interpret":
            return jbu_filter_pallas(hr, proj, range_temp, sigma_spatial,
                                     interpret=True)
        return jbu_filter_xla(hr, proj, range_temp, sigma_spatial)


class JBUFeatUpUpsampler(nn.Module):
    """FeatUp JBUStack: ×16 upsampling via four learned JBU stages.

    ``backbone_type``/``use_norm`` are accepted for config parity with the
    reference wrapper (JBUFeatUp.py:12-32) but do not change the upsampler.
    """

    backbone_type: str | None = None
    use_norm: bool = True
    key_dim: int = 32
    radius: int = 3
    impl: str = "auto"
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, source: jnp.ndarray, guidance: jnp.ndarray) -> jnp.ndarray:
        feat_dim = source.shape[-1]
        source = source.astype(self.dtype)
        guidance = guidance.astype(self.dtype)
        for i in range(1, 5):
            h, w = source.shape[1], source.shape[2]
            g = adaptive_pool(guidance, (2 * h, 2 * w), "avg")
            source = JBULearnedRange(self.key_dim, self.radius, self.impl,
                                     dtype=self.dtype, name=f"up{i}")(source, g)
        fix = nn.Conv(feat_dim, (1, 1), dtype=self.dtype,
                      precision=mm_precision(self.dtype),
                      name="fixup_proj")(source)
        return fix * 0.1 + source
