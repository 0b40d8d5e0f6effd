"""Fused Pallas LayerNorm vs flax nn.LayerNorm (the parity target).

The kernel replaces flax LN on the bf16 compute path (models/vit.py _ln);
these tests pin (a) numerical agreement with flax's default f32-stats
fast-variance LayerNorm in both dtypes, (b) the custom-VJP backward, and
(c) the FusedLayerNorm module being checkpoint-compatible with nn.LayerNorm
(same param names/shapes).
"""

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from isegprobe_tpu.ops.layernorm import layernorm


@pytest.mark.parametrize("dtype", [jnp.float32, jnp.bfloat16])
@pytest.mark.parametrize("shape", [(4, 1025, 384), (300, 128)])
def test_matches_flax(dtype, shape):
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.normal(size=shape) * 3 + 1, dtype)
    scale = jnp.asarray(rng.normal(size=shape[-1]) * 0.5 + 1, jnp.float32)
    bias = jnp.asarray(rng.normal(size=shape[-1]), jnp.float32)

    ln = nn.LayerNorm(epsilon=1e-6, dtype=dtype)
    want = ln.apply({"params": {"scale": scale, "bias": bias}}, x)
    got = layernorm(x, scale, bias, eps=1e-6, impl="pallas_interpret")
    assert got.dtype == want.dtype
    tol = 1e-6 if dtype == jnp.float32 else 2e-2
    np.testing.assert_allclose(
        np.asarray(got, np.float32), np.asarray(want, np.float32),
        rtol=tol, atol=tol,
    )


def test_jnp_path_matches_flax_exactly():
    rng = np.random.default_rng(1)
    x = jnp.asarray(rng.normal(size=(64, 384)), jnp.float32)
    scale = jnp.asarray(rng.normal(size=384) + 1, jnp.float32)
    bias = jnp.asarray(rng.normal(size=384), jnp.float32)
    ln = nn.LayerNorm(epsilon=1e-6, dtype=jnp.float32)
    want = ln.apply({"params": {"scale": scale, "bias": bias}}, x)
    got = layernorm(x, scale, bias, eps=1e-6, impl="jnp")
    # flax folds scale into rsqrt(var) before multiplying x; we apply it
    # after — identical math, one multiply-order difference => ~1 ulp f32
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=2e-5, atol=5e-7)


def test_grad_matches_jnp_reference():
    rng = np.random.default_rng(2)
    x = jnp.asarray(rng.normal(size=(8, 256, 384)), jnp.float32)
    scale = jnp.asarray(rng.normal(size=384) + 1, jnp.float32)
    bias = jnp.asarray(rng.normal(size=384), jnp.float32)

    def loss_k(x, s, b):
        return jnp.sum(jnp.sin(
            layernorm(x, s, b, impl="pallas_interpret").astype(jnp.float32)))

    def loss_j(x, s, b):
        return jnp.sum(jnp.sin(
            layernorm(x, s, b, impl="jnp").astype(jnp.float32)))

    gk = jax.grad(loss_k, argnums=(0, 1, 2))(x, scale, bias)
    gj = jax.grad(loss_j, argnums=(0, 1, 2))(x, scale, bias)
    for a, b in zip(gk, gj):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-4, atol=1e-5)


def test_module_checkpoint_compatible():
    """FusedLayerNorm loads/saves the same param tree as nn.LayerNorm."""
    from isegprobe_tpu.models.vit import FusedLayerNorm

    x = jnp.ones((4, 384), jnp.bfloat16)
    p_flax = nn.LayerNorm(epsilon=1e-6, dtype=jnp.bfloat16).init(
        jax.random.PRNGKey(0), x)["params"]
    p_fused = FusedLayerNorm(epsilon=1e-6, dtype=jnp.bfloat16).init(
        jax.random.PRNGKey(0), x)["params"]
    assert jax.tree.structure(p_flax) == jax.tree.structure(p_fused)
    assert all(
        a.shape == b.shape and a.dtype == b.dtype
        for a, b in zip(jax.tree.leaves(p_flax), jax.tree.leaves(p_fused))
    )
