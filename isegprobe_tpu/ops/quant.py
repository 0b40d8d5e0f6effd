"""Dynamic W8A8 int8 matmul for the serving path.

TPU v5e's MXU runs int8 × int8 → int32 at ~2× the bf16 rate (nominal 394 vs
197 TF/s), and the probe forward is matmul-bound (docs/PERF.md). This module
provides an opt-in int8 serving mode for the ViT dense layers (qkv / proj /
fc1 / fc2 — where the FLOPs are):

  * activations: dynamic symmetric per-token (row) scales, computed on device
    each call — no calibration pass needed;
  * weights: symmetric per-output-channel scales, quantized from the stored
    f32/bf16 params on the fly (one elementwise pass over 21 M params,
    ~0.1 ms of HBM traffic — negligible next to the matmuls it feeds);
  * accumulation in int32 on the MXU, rescale in f32.

``QuantDense`` is parameter-compatible with ``flax.linen.Dense`` (same
"kernel"/"bias" names, shapes, and initializers), so converted reference
checkpoints and the bf16 cast-at-load path work unchanged; only the compute
path differs. Enabled per-model via ``eval_cfg.dtype=int8``
(evaluate.py) which implies bf16 for everything the int8 path does not cover
(attention inner products, convs, LayerNorm).

The reference has no analogue (torch fp32/fp16 only); this is a TPU-native
"beyond parity" serving knob. NoC impact is measured, not assumed — see
BASELINE.md (int8 row) and tests/test_quant.py for the numeric bounds.

Measured verdict at ViT-S scale (docs/PERF.md finding 6): **bf16 is the
recommended serving dtype.** At d_model=384 the serving matmuls already run
near the bf16 MXU peak and the dynamic-quant activation pass costs as much
as the int8 MXU saves (fc2 is 2× worse than bf16). This knob exists for
larger-d_model backbones where the trade flips.
"""

from __future__ import annotations

from typing import Any

import flax.linen as nn
import jax
import jax.numpy as jnp

_EPS = 1e-8


def int8_dynamic_matmul(x: jnp.ndarray, kernel: jnp.ndarray) -> jnp.ndarray:
    """``x @ kernel`` with dynamic W8A8 int8 quantization.

    x: [..., K] (any float dtype); kernel: [K, N]. Returns f32 [..., N].
    """
    xf = x.astype(jnp.float32)
    sx = jnp.max(jnp.abs(xf), axis=-1, keepdims=True) / 127.0
    sx = jnp.maximum(sx, _EPS)
    xq = jnp.round(xf / sx).astype(jnp.int8)

    kf = kernel.astype(jnp.float32)
    sw = jnp.max(jnp.abs(kf), axis=0, keepdims=True) / 127.0
    sw = jnp.maximum(sw, _EPS)
    wq = jnp.round(kf / sw).astype(jnp.int8)

    acc = jax.lax.dot_general(
        xq, wq,
        dimension_numbers=(((xq.ndim - 1,), (0,)), ((), ())),
        preferred_element_type=jnp.int32,
    )
    return acc.astype(jnp.float32) * sx * sw


class QuantDense(nn.Module):
    """Drop-in for ``nn.Dense`` running the int8 dynamic-quant matmul.

    Parameter tree (names, shapes, init) is identical to ``nn.Dense`` so a
    model can flip between the two without touching checkpoints.
    """

    features: int
    use_bias: bool = True
    dtype: Any = jnp.bfloat16

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        kernel = self.param(
            "kernel", nn.initializers.lecun_normal(),
            (x.shape[-1], self.features),
        )
        y = int8_dynamic_matmul(x, kernel)
        if self.use_bias:
            bias = self.param("bias", nn.initializers.zeros, (self.features,))
            y = y + bias.astype(jnp.float32)
        return y.astype(self.dtype)
