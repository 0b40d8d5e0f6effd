"""Fused Pallas JBU kernel vs the XLA shifted-slice composition."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from isegprobe_tpu.models.upsamplers.jbu import JBULearnedRange


@pytest.mark.parametrize("hw", [(16, 16), (20, 36), (34, 130), (16, 258)])
def test_jbu_pallas_matches_xla(hw):
    rng = np.random.default_rng(0)
    src = jnp.asarray(rng.standard_normal((1, hw[0] // 2, hw[1] // 2, 48),
                                          dtype=np.float32))
    guide = jnp.asarray(rng.random((1, *hw, 3), dtype=np.float32))

    xla_mod = JBULearnedRange(impl="xla")
    params = xla_mod.init(jax.random.PRNGKey(0), src, guide)["params"]
    # non-trivial learned scalars
    params = dict(params)
    params["range_temp"] = jnp.asarray(0.5)
    params["sigma_spatial"] = jnp.asarray(0.8)

    want = np.asarray(xla_mod.apply({"params": params}, src, guide))
    got = np.asarray(
        JBULearnedRange(impl="pallas_interpret").apply({"params": params}, src,
                                                       guide)
    )
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-4)
