"""Masked canvas ViT forward vs the plain ViT on the true-size image.

The adaptive-ZoomIn compiled path (VERDICT r3 #6) runs the backbone on a
static canvas whose top-left traced (gh, gw) token rect is valid; valid
tokens must equal running the plain ViT on the actual (gh*p, gw*p) image —
pos-embed interpolation at the traced grid, invalid tokens excluded from
every softmax, per-sample grids."""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from isegprobe_tpu.models.vit import ViT, ViTConfig

CFG = ViTConfig(patch_size=14, embed_dim=64, depth=2, num_heads=4,
                layerscale=True, pretrain_grid=(7, 7),
                interpolate_offset=0.1, attn_impl="jnp")


@pytest.fixture(scope="module")
def vit_and_params():
    m = ViT(CFG)
    img = jnp.zeros((1, 98, 98, 3), jnp.float32)
    params = m.init(jax.random.PRNGKey(0), img)["params"]
    # non-degenerate weights
    params = jax.tree.map(
        lambda x: jnp.asarray(
            np.random.default_rng(7).standard_normal(x.shape) * 0.02,
            x.dtype),
        params)
    return m, params


@pytest.mark.parametrize("grids", [[(5, 3), (2, 6)], [(7, 7), (4, 4)]])
def test_masked_canvas_matches_plain(vit_and_params, grids):
    m, params = vit_and_params
    p = CFG.patch_size
    canvas_grid = (8, 8)
    rng = np.random.default_rng(11)
    canvas = np.zeros((len(grids), canvas_grid[0] * p, canvas_grid[1] * p, 3),
                      np.float32)
    wants = []
    for i, (gh, gw) in enumerate(grids):
        img = rng.standard_normal((1, gh * p, gw * p, 3), dtype=np.float32)
        canvas[i, : gh * p, : gw * p] = img[0]
        want = m.apply({"params": params}, jnp.asarray(img))["patch_tokens"]
        wants.append(np.asarray(want)[0])  # [gh*gw, D]

    def run(prm, x, vg):
        def fwd(mdl, x, vg):
            tokens = mdl.embed_patches(x)
            return mdl.forward_tokens_masked(tokens, canvas_grid, vg)
        return m.apply({"params": prm}, x, vg, method=fwd)["patch_tokens"]

    vg = jnp.asarray(grids, jnp.int32)
    got = np.asarray(jax.jit(run)(params, jnp.asarray(canvas), vg))
    got = got.reshape(len(grids), canvas_grid[0], canvas_grid[1], -1)
    for i, (gh, gw) in enumerate(grids):
        valid = got[i, :gh, :gw].reshape(gh * gw, -1)
        np.testing.assert_allclose(valid, wants[i], rtol=2e-4, atol=2e-5,
                                   err_msg=f"sample {i} grid {(gh, gw)}")


def test_masked_canvas_no_offset_variant(vit_and_params):
    """interpolate_offset=None (plain size-based scale) also matches."""
    cfg = dataclasses.replace(CFG, interpolate_offset=None)
    m = ViT(cfg)
    img = jnp.zeros((1, 98, 98, 3), jnp.float32)
    params = m.init(jax.random.PRNGKey(1), img)["params"]
    p = cfg.patch_size
    rng = np.random.default_rng(3)
    gh, gw = 6, 4
    img = rng.standard_normal((1, gh * p, gw * p, 3), dtype=np.float32)
    want = np.asarray(
        m.apply({"params": params}, jnp.asarray(img))["patch_tokens"])[0]

    canvas = np.zeros((1, 8 * p, 8 * p, 3), np.float32)
    canvas[0, : gh * p, : gw * p] = img[0]

    def fwd(mdl, x, vg):
        tokens = mdl.embed_patches(x)
        return mdl.forward_tokens_masked(tokens, (8, 8), vg)

    got = np.asarray(m.apply({"params": params}, jnp.asarray(canvas),
                             jnp.asarray([[gh, gw]]), method=fwd)
                     ["patch_tokens"])
    got = got.reshape(8, 8, -1)[:gh, :gw].reshape(gh * gw, -1)
    np.testing.assert_allclose(got, want, rtol=2e-4, atol=2e-5)
