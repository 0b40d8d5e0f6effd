"""Rematerialization paths (high-res training memory trade) are semantics-
preserving: forward values and parameter gradients must match the non-remat
graphs bit-for-bit-ish. Covers ViTConfig.remat_blocks (backbone blocks
recomputed in backward) and the LoftUp banded-slab remat (each coordinate-
query slab recomputed instead of all slabs' residuals held live) — the memory
levers that make 448² LoftUp training fit HBM."""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np

from isegprobe_tpu.models.upsamplers.loftup import LoftUpUpsampler
from isegprobe_tpu.models.vit import ViT, ViTConfig


def _grads(model, params, *args):
    def loss(p):
        out = model.apply({"params": p}, *args)
        if isinstance(out, dict):
            out = out["patch_tokens"]
        return jnp.sum(out * out)

    return jax.jit(jax.grad(loss))(params)


def test_vit_remat_blocks_same_forward_and_grads():
    cfg = ViTConfig(patch_size=14, embed_dim=64, depth=2, num_heads=4,
                    layerscale=True, pretrain_grid=(4, 4), attn_impl="jnp")
    x = jnp.asarray(np.random.default_rng(0).standard_normal(
        (2, 56, 56, 3), dtype=np.float32))
    model = ViT(cfg)
    params = model.init(jax.random.PRNGKey(0), x)["params"]
    model_r = ViT(dataclasses.replace(cfg, remat_blocks=True))

    want = model.apply({"params": params}, x)["patch_tokens"]
    got = model_r.apply({"params": params}, x)["patch_tokens"]
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=1e-6, atol=1e-6)

    gw = _grads(model, params, x)
    gr = _grads(model_r, params, x)
    for (kp, a), (_, b) in zip(
        jax.tree_util.tree_leaves_with_path(gw),
        jax.tree_util.tree_leaves_with_path(gr),
    ):
        np.testing.assert_allclose(np.asarray(b), np.asarray(a),
                                   rtol=1e-5, atol=1e-5,
                                   err_msg=jax.tree_util.keystr(kp))


def test_remat_backbone_plumbs_through_model_scripts():
    """training_params.remat_backbone=true reaches the ViT-family backbones
    via the central model-script plumbing (models/common.py), and leaves
    non-ViT backbones untouched."""
    import sys
    from pathlib import Path

    sys.path.insert(0, str(Path(__file__).resolve().parents[1]))
    from isegprobe_tpu.utils.config import EDict
    from models.common import init_model_from_modules_cfg

    cfg = EDict({"training_params": {"remat_backbone": True}})
    base = {
        "embed_coords": dict(type="patchEmbed",
                             params=dict(img_size=(56, 56),
                                         patch_size=(14, 14), embed_dim=384)),
        "head": dict(type="convhead",
                     params=dict(in_channels=384, num_layers=1, num_classes=1)),
        "upsampler": dict(type="identity", params=dict()),
        "neck": None,
        "save": None,
        "architecture": "backbone_upsampler_head",
    }
    m = init_model_from_modules_cfg(
        dict(base, backbone=dict(
            type="dinov2",
            params=dict(feats_injection_mode="before_backbone"))), cfg)
    assert m.backbone_cfg["params"]["remat_blocks"] is True

    m2 = init_model_from_modules_cfg(
        dict(base, backbone=dict(
            type="dinov2",
            params=dict(feats_injection_mode="before_backbone"))),
        EDict({"training_params": {}}))
    assert "remat_blocks" not in (m2.backbone_cfg.get("params") or {})


def test_loftup_banded_remat_grads_match_monolithic():
    """Banded-slab grads equal monolithic grads up to f32 reassociation.

    Per-slab attention sums gradient contributions in a different order than
    the single full-query attention; measured noise between two *banded*
    variants (14- vs 7-row slabs) is the same ULP-quantized ~1e-3 as banded
    vs monolithic, so the bound is relative to the global gradient scale,
    not per-leaf (bias grads are tiny nets of large cancelling terms)."""
    dim = 32
    rng = np.random.default_rng(7)
    src = jnp.asarray(rng.standard_normal((1, 4, 4, dim), dtype=np.float32))
    img = jnp.asarray(rng.random((1, 28, 28, 3), dtype=np.float32))

    mono = LoftUpUpsampler(n_dim=dim, attn_impl="jnp", query_chunk_rows=0)
    params = mono.init(jax.random.PRNGKey(2), src, img)["params"]
    banded = LoftUpUpsampler(n_dim=dim, attn_impl="jnp", query_chunk_rows=14,
                             query_chunk_min_pixels=0)

    gw = _grads(mono, params, src, img)
    gb = _grads(banded, params, src, img)
    gscale = max(float(jnp.max(jnp.abs(a))) for a in jax.tree.leaves(gw))
    tol = 2e-3 * max(1.0, gscale)
    for (kp, a), (_, b) in zip(
        jax.tree_util.tree_leaves_with_path(gw),
        jax.tree_util.tree_leaves_with_path(gb),
    ):
        diff = float(jnp.max(jnp.abs(jnp.asarray(b) - jnp.asarray(a))))
        assert diff <= tol, (
            f"{jax.tree_util.keystr(kp)}: max|Δgrad| {diff:.2e} > {tol:.2e}"
        )
