"""int8 dynamic-quant serving path (ops/quant.py + ViTConfig.quant).

The int8 mode is beyond-reference (torch runs f32/f16 only); these tests pin
its numeric error bounds and its param-tree compatibility with the float path
so checkpoints flip between modes without conversion.
"""

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from isegprobe_tpu.ops.quant import QuantDense, int8_dynamic_matmul


def test_int8_matmul_matches_f32_within_quant_noise():
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.normal(size=(64, 384)).astype(np.float32))
    w = jnp.asarray(rng.normal(size=(384, 1536)).astype(np.float32) * 0.05)
    exact = x @ w
    quant = int8_dynamic_matmul(x, w)
    rel = float(jnp.linalg.norm(quant - exact) / jnp.linalg.norm(exact))
    assert rel < 0.02, f"relative error {rel:.4f}"


def test_int8_matmul_handles_zero_rows():
    x = jnp.zeros((4, 128))
    w = jnp.ones((128, 16))
    out = int8_dynamic_matmul(x, w)
    assert bool(jnp.all(out == 0.0))
    assert bool(jnp.all(jnp.isfinite(out)))


def test_quant_dense_param_tree_matches_nn_dense():
    x = jnp.ones((2, 384))
    qd = QuantDense(256)
    dd = nn.Dense(256)
    pq = qd.init(jax.random.PRNGKey(0), x)["params"]
    pd = dd.init(jax.random.PRNGKey(0), x)["params"]
    assert jax.tree_util.tree_structure(pq) == jax.tree_util.tree_structure(pd)
    for a, b in zip(jax.tree.leaves(pq), jax.tree.leaves(pd)):
        assert a.shape == b.shape and a.dtype == b.dtype
    # identical init => identical params => outputs within quant noise
    out_q = qd.apply({"params": pd}, x)
    out_d = dd.apply({"params": pd}, x)
    assert out_q.shape == out_d.shape
    rel = float(jnp.linalg.norm(out_q.astype(jnp.float32) - out_d)
                / (jnp.linalg.norm(out_d) + 1e-9))
    assert rel < 0.03


def _tiny_model(**kw):
    from isegprobe_tpu.models.probe_model import iSegProbeModel

    return iSegProbeModel(
        backbone_cfg=dict(type="dinov2",
                          params=dict(feats_injection_mode="before_backbone")),
        embed_coords_cfg=dict(
            type="patchEmbed",
            params=dict(img_size=(28, 28), patch_size=(14, 14), embed_dim=384),
        ),
        head_cfg=dict(type="convhead",
                      params=dict(in_channels=384, num_layers=1,
                                  num_classes=1)),
        upsampler_cfg=dict(type="identity", params=dict()),
        save_cfg=dict(embed_coords=True, backbone=False, upsampler=False,
                      head=True),
        use_disks=True, norm_radius=5, with_prev_mask=True, attn_impl="jnp",
        **kw,
    )


def test_probe_model_int8_forward_close_to_bf16():
    """quant='int8' reuses the float param tree and lands near the bf16
    probabilities — the serving knob changes speed, not the protocol."""
    rng = np.random.default_rng(1)
    img = jnp.asarray(rng.random((1, 28, 28, 4)).astype(np.float32))
    pts = jnp.asarray(
        np.array([[[10, 12, 0]] + [[-1, -1, -1]] * 5], np.float32))

    bf16 = _tiny_model(dtype=jnp.bfloat16)
    params = bf16.init(jax.random.PRNGKey(0), img, pts)["params"]
    out_bf16 = bf16.apply({"params": params}, img, pts)["instances"]

    int8 = _tiny_model(dtype=jnp.bfloat16, quant="int8")
    out_int8 = int8.apply({"params": params}, img, pts)["instances"]

    p_bf16 = jax.nn.sigmoid(out_bf16.astype(jnp.float32))
    p_int8 = jax.nn.sigmoid(out_int8.astype(jnp.float32))
    err = float(jnp.max(jnp.abs(p_bf16 - p_int8)))
    assert err < 0.08, f"max prob deviation {err:.4f}"


def test_quant_rejected_for_simple_vit_click_encoder():
    """SimpleViT is the trainable click encoder — it stays float by design."""
    from isegprobe_tpu.models.probe_model import build_featurizer

    with pytest.raises(NotImplementedError):
        build_featurizer(
            "simple_vit",
            dict(img_size=(28, 28), patch_size=(14, 14), embed_dim=32,
                 depth=1, heads=2, mlp_dim=64),
            dtype=jnp.bfloat16, attn_impl="jnp", quant="int8")


def test_maskclip_int8_features_close_to_float():
    """int8 W8A8 now covers the CLIP tower (packed in_proj + out_proj +
    c_fc/c_proj); same param tree, bounded feature deviation."""
    from isegprobe_tpu.models.featurizers.maskclip import CLIPVisionTransformer

    rng = np.random.default_rng(3)
    x = jnp.asarray(rng.random((1, 32, 32, 3)).astype(np.float32))

    kw = dict(patch_size=16, width=64, layers=2, heads=2, output_dim=32,
              pretrain_grid=2, attn_impl="jnp")
    f32 = CLIPVisionTransformer(**kw)
    params = f32.init(jax.random.PRNGKey(0), x)["params"]
    ref = f32.apply({"params": params}, x)

    int8 = CLIPVisionTransformer(**kw, quant="int8")
    out = int8.apply({"params": params}, x)  # same tree: QuantDense drop-in

    err = float(jnp.max(jnp.abs(ref - out)))
    scale = float(jnp.max(jnp.abs(ref))) + 1e-6
    assert err / scale < 0.12, f"relative feature deviation {err / scale:.4f}"
