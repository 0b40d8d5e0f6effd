"""Golden-activation parity: our unified ViT vs the reference torch modules
(random-init, weight-converted). Skips when the reference tree is absent."""

import jax.numpy as jnp
import numpy as np
import pytest

from tests.reference_oracle import setup_reference

if not setup_reference():
    pytest.skip("reference tree unavailable", allow_module_level=True)

import torch  # noqa: E402

from isegprobe_tpu.models.convert import convert_vit  # noqa: E402
from isegprobe_tpu.models.vit import ViT, ViTConfig  # noqa: E402

torch.manual_seed(0)


def _init_torch(module):
    """Give every parameter a non-degenerate random value."""
    sd = module.state_dict()
    g = torch.Generator().manual_seed(1234)
    for k, v in sd.items():
        sd[k] = torch.randn(v.shape, generator=g) * 0.02
    module.load_state_dict(sd)
    module.eval()
    return module


@pytest.fixture(scope="module")
def dinov2_pair():
    from core.model.featurizers.DINOv2 import DinoVisionTransformer

    tm = _init_torch(
        DinoVisionTransformer(
            img_size=518, patch_size=14, embed_dim=64, depth=3, num_heads=4,
            init_values=1.0,
        )
    )
    cfg = ViTConfig(
        patch_size=14, embed_dim=64, depth=3, num_heads=4, layerscale=True,
        pretrain_grid=(37, 37), interpolate_offset=0.1, attn_impl="jnp",
    )
    params = convert_vit(tm.state_dict(), depth=3, layerscale=True)
    return tm, ViT(cfg), params


@pytest.mark.parametrize("hw", [(518, 518), (56, 70)])
def test_dinov2_patch_tokens_parity(dinov2_pair, hw):
    tm, jm, params = dinov2_pair
    rng = np.random.default_rng(0)
    x = rng.standard_normal((2, *hw, 3), dtype=np.float32)
    with torch.no_grad():
        want = tm.forward_features(torch.from_numpy(np.moveaxis(x, -1, 1).copy()))[
            "x_norm_patchtokens"
        ].numpy()
    got = np.asarray(
        jm.apply({"params": params}, jnp.asarray(x))["patch_tokens"]
    )
    np.testing.assert_allclose(got, want, rtol=1e-3, atol=5e-4)


def test_dinov2_injection_before_backbone(dinov2_pair):
    """Early injection path: add features to patch-embed output, then run the
    trunk — mirrors reference core/model/featurizers/DINOv2.py:518-534."""
    tm, jm, params = dinov2_pair
    rng = np.random.default_rng(1)
    x = rng.standard_normal((1, 56, 56, 3), dtype=np.float32)
    add = rng.standard_normal((1, 16, 64), dtype=np.float32)

    with torch.no_grad():
        xt = torch.from_numpy(np.moveaxis(x, -1, 1).copy())
        e = tm.patch_embed(xt) + torch.from_numpy(add)
        e = torch.cat((tm.cls_token.expand(1, -1, -1), e), dim=1)
        e = e + tm.interpolate_pos_encoding(e, 56, 56)
        for blk in tm.blocks:
            e = blk(e)
        want = tm.norm(e)[:, 1:].numpy()

    got = np.asarray(
        jm.apply({"params": params}, jnp.asarray(x), inject=jnp.asarray(add))[
            "patch_tokens"
        ]
    )
    np.testing.assert_allclose(got, want, rtol=1e-3, atol=5e-4)


@pytest.fixture(scope="module")
def dino_pair():
    from core.model.featurizers.DINO import VisionTransformer

    tm = _init_torch(
        VisionTransformer(
            img_size=[224], patch_size=16, embed_dim=64, depth=3, num_heads=4,
            qkv_bias=True,
        )
    )
    cfg = ViTConfig(
        patch_size=16, embed_dim=64, depth=3, num_heads=4, layerscale=False,
        pretrain_grid=(14, 14), interpolate_offset=0.1, attn_impl="jnp",
    )
    params = convert_vit(tm.state_dict(), depth=3, layerscale=False)
    return tm, ViT(cfg), params


def test_dino_tokens_and_keys_parity(dino_pair):
    tm, jm, params = dino_pair
    rng = np.random.default_rng(2)
    x = rng.standard_normal((1, 64, 80, 3), dtype=np.float32)
    with torch.no_grad():
        feats, _, qkvs = tm.get_intermediate_feat(
            torch.from_numpy(np.moveaxis(x, -1, 1).copy()), n=1
        )
        want_tokens = feats[0].numpy()
        want_k = qkvs[0][1].numpy()  # [B, H, N, Dh]

    out = jm.apply({"params": params}, jnp.asarray(x), return_last_k=True)
    got_tokens = np.asarray(out["tokens"])
    got_k = np.moveaxis(np.asarray(out["last_k"]), 1, 2)  # BNHD -> BHND
    np.testing.assert_allclose(got_tokens, want_tokens, rtol=1e-3, atol=5e-4)
    np.testing.assert_allclose(got_k, want_k, rtol=1e-3, atol=5e-4)


def test_pallas_attention_matches_jnp():
    from isegprobe_tpu.ops.attention import mha

    rng = np.random.default_rng(3)
    q = jnp.asarray(rng.standard_normal((2, 130, 4, 64), dtype=np.float32))
    k = jnp.asarray(rng.standard_normal((2, 130, 4, 64), dtype=np.float32))
    v = jnp.asarray(rng.standard_normal((2, 130, 4, 64), dtype=np.float32))
    want = np.asarray(mha(q, k, v, impl="jnp"))
    got = np.asarray(mha(q, k, v, impl="pallas_interpret"))
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-5)


def test_packed_qkv_attention_matches_split():
    """mha_qkv (packed, masked-grid kernel) == split-q/k/v mha, including a
    non-divisible token count (the 1025-token serving shape's hazard)."""
    from isegprobe_tpu.ops.attention import mha, mha_qkv

    rng = np.random.default_rng(4)
    b, n, h, dh = 2, 131, 4, 64
    qkv = jnp.asarray(rng.standard_normal((b, n, 3 * h * dh), dtype=np.float32))
    t = qkv.reshape(b, n, 3, h, dh)
    want = np.asarray(
        mha(t[:, :, 0], t[:, :, 1], t[:, :, 2], impl="jnp")
    ).reshape(b, n, h * dh)
    got_jnp = np.asarray(mha_qkv(qkv, h, impl="jnp"))
    # h=4, dh=64 -> the zero-relayout head-pair kernel
    got_kern = np.asarray(mha_qkv(qkv, h, impl="pallas_interpret"))
    np.testing.assert_allclose(got_jnp, want, rtol=0, atol=0)  # same graph
    np.testing.assert_allclose(got_kern, want, rtol=1e-5, atol=1e-5)

    # odd head count -> the generic packed (single-transpose) kernel
    h3 = 3
    qkv3 = jnp.asarray(
        rng.standard_normal((b, n, 3 * h3 * dh), dtype=np.float32))
    t3 = qkv3.reshape(b, n, 3, h3, dh)
    want3 = np.asarray(
        mha(t3[:, :, 0], t3[:, :, 1], t3[:, :, 2], impl="jnp")
    ).reshape(b, n, h3 * dh)
    got3 = np.asarray(mha_qkv(qkv3, h3, impl="pallas_interpret"))
    np.testing.assert_allclose(got3, want3, rtol=1e-5, atol=1e-5)


def test_pairs_kernel_bq_invariance():
    """The head-pair kernel's query block size is a pure tiling knob: any
    bq (tight single block, ragged last block, default heuristic) must give
    identical attention up to f32 rounding (scripts/bench_attn_bq.py sweeps
    it for speed on-chip; correctness must not depend on the choice)."""
    from isegprobe_tpu.ops.attention import _mha_qkv_jnp, _mha_qkv_pallas_pairs

    rng = np.random.default_rng(6)
    h, dh = 4, 64
    qkv = jnp.asarray(
        rng.standard_normal((2, 130, 3 * h * dh), dtype=np.float32))
    want = np.asarray(_mha_qkv_jnp(qkv, h, dh**-0.5))
    for bq in (None, 64, 136):
        got = np.asarray(_mha_qkv_pallas_pairs(
            qkv, h, dh**-0.5, interpret=True, bq=bq))
        np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-5)


def test_packed_qkv_attention_grad():
    """The custom-VJP backward (jnp-graph recompute) matches end-to-end
    autodiff through the jnp path."""
    from isegprobe_tpu.ops.attention import mha_qkv

    rng = np.random.default_rng(5)
    qkv = jnp.asarray(rng.standard_normal((1, 48, 3 * 2 * 64), dtype=np.float32))

    import jax

    def loss(impl):
        return lambda t: jnp.sum(jnp.sin(mha_qkv(t, 2, impl=impl)))

    gk = np.asarray(jax.grad(loss("pallas_interpret"))(qkv))
    gj = np.asarray(jax.grad(loss("jnp"))(qkv))
    np.testing.assert_allclose(gk, gj, rtol=1e-4, atol=1e-5)
