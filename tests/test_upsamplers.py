"""Upsampler parity (LiFT, LoftUp vs reference torch modules) and JBU behavior."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from tests.reference_oracle import setup_reference

HAS_REF = setup_reference()

from isegprobe_tpu.models.upsamplers.basic import BilinearUpsampler  # noqa: E402
from isegprobe_tpu.models.upsamplers.jbu import JBUFeatUpUpsampler  # noqa: E402
from isegprobe_tpu.models.upsamplers.lift import LiFTUpsampler  # noqa: E402
from isegprobe_tpu.models.upsamplers.loftup import LoftUpUpsampler  # noqa: E402


def test_bilinear_upsampler_shape():
    up = BilinearUpsampler()
    src = jnp.ones((1, 4, 4, 8))
    guide = jnp.ones((1, 56, 56, 3))
    assert up(src, guide).shape == (1, 56, 56, 8)


@pytest.mark.skipif(not HAS_REF, reason="reference tree unavailable")
def test_lift_parity():
    import torch

    from core.model.upsamplers.LiFT import LiFT
    from isegprobe_tpu.models.convert import convert_lift

    torch.manual_seed(0)
    tm = LiFT(in_channels=64, patch_size=14).eval()
    # randomize BN stats so the frozen-BN path is actually exercised
    for m in tm.modules():
        if isinstance(m, torch.nn.BatchNorm2d):
            m.running_mean.normal_(0, 0.5)
            m.running_var.uniform_(0.5, 2.0)

    rng = np.random.default_rng(0)
    src = rng.standard_normal((1, 8, 8, 64), dtype=np.float32)
    img = rng.random((1, 112, 112, 3), dtype=np.float32)

    with torch.no_grad():
        want = tm(
            torch.from_numpy(np.moveaxis(img, -1, 1).copy()),
            torch.from_numpy(np.moveaxis(src, -1, 1).copy()),
        ).numpy()
    want = np.moveaxis(want, 1, -1)

    jm = LiFTUpsampler(n_dim=64, patch=14)
    params = convert_lift(tm.state_dict())
    got = np.asarray(jm.apply({"params": params}, jnp.asarray(src), jnp.asarray(img)))
    assert got.shape == want.shape
    np.testing.assert_allclose(got, want, rtol=1e-3, atol=1e-3)


@pytest.mark.skipif(not HAS_REF, reason="reference tree unavailable")
def test_loftup_parity():
    import torch

    from core.model.upsamplers.loftup.layers import ChannelNorm
    from core.model.upsamplers.loftup.loftup import LoftUp, UpsamplerwithChannelNorm
    from isegprobe_tpu.models.convert import convert_loftup

    torch.manual_seed(1)
    dim = 64
    tm = UpsamplerwithChannelNorm(
        LoftUp(dim, lr_pe_type="sine", lr_size=16), ChannelNorm(dim)
    ).eval()
    for m in tm.modules():
        if isinstance(m, torch.nn.BatchNorm2d):
            m.running_mean.normal_(0, 0.5)
            m.running_var.uniform_(0.5, 2.0)

    rng = np.random.default_rng(1)
    src = rng.standard_normal((1, 8, 8, dim), dtype=np.float32)
    img = rng.random((1, 56, 56, 3), dtype=np.float32)

    with torch.no_grad():
        want = tm(
            torch.from_numpy(np.moveaxis(src, -1, 1).copy()),
            torch.from_numpy(np.moveaxis(img, -1, 1).copy()),
        ).numpy()
    want = np.moveaxis(want, 1, -1)

    jm = LoftUpUpsampler(n_dim=dim, attn_impl="jnp")
    params = convert_loftup(tm.upsampler.state_dict(), tm.channelnorm.state_dict())
    got = np.asarray(jm.apply({"params": params}, jnp.asarray(src), jnp.asarray(img)))
    assert got.shape == want.shape
    np.testing.assert_allclose(got, want, rtol=2e-3, atol=2e-3)

    # the MXU-padded serving layout must hit the same torch golden
    from isegprobe_tpu.models.convert import pad_loftup_params

    jp = LoftUpUpsampler(n_dim=dim, attn_impl="jnp", mxu_pad=True)
    padded = pad_loftup_params(params, n_dim=dim)
    gotp = np.asarray(jp.apply({"params": padded}, jnp.asarray(src),
                               jnp.asarray(img)))
    np.testing.assert_allclose(gotp, want, rtol=2e-3, atol=2e-3)


def test_loftup_mxu_pad_exact():
    """The MXU-aligned zero-padded channel layout (convert-time
    pad_loftup_params + mxu_pad=True — cdim/stem/head-dim padded to lane
    multiples, packed attention weights head-interleaved, masked LayerNorm
    statistics) must reproduce the unpadded forward exactly, in both the
    monolithic and the banded query paths (VERDICT r4 #1)."""
    from isegprobe_tpu.models.convert import pad_loftup_params

    dim = 32
    rng = np.random.default_rng(9)
    src = jnp.asarray(rng.standard_normal((2, 4, 4, dim), dtype=np.float32))
    img = jnp.asarray(rng.random((2, 56, 56, 3), dtype=np.float32))

    plain = LoftUpUpsampler(n_dim=dim, attn_impl="jnp", query_chunk_rows=0)
    p0 = plain.init(jax.random.PRNGKey(6), src, img)["params"]
    want = np.asarray(plain.apply({"params": p0}, src, img))

    pp = pad_loftup_params(p0, n_dim=dim)
    padded = LoftUpUpsampler(n_dim=dim, attn_impl="jnp", query_chunk_rows=0,
                             mxu_pad=True)
    # the transform must land exactly on the padded module's init shapes
    init_shapes = jax.tree.map(
        lambda x: x.shape,
        padded.init(jax.random.PRNGKey(0), src, img)["params"])
    got_shapes = jax.tree.map(lambda x: np.asarray(x).shape, pp)
    assert init_shapes == got_shapes
    got = np.asarray(padded.apply({"params": pp}, src, img))
    np.testing.assert_allclose(got, want, rtol=2e-5, atol=2e-5)

    # banded query path under padding (the 448² serving configuration)
    banded = LoftUpUpsampler(n_dim=dim, attn_impl="jnp", query_chunk_rows=16,
                             query_chunk_min_pixels=0, mxu_pad=True)
    gotb = np.asarray(banded.apply({"params": pp}, src, img))
    np.testing.assert_allclose(gotb, want, rtol=2e-5, atol=2e-5)


def test_loftup_banded_queries_exact():
    """The banded query path (auto-enabled at 448² eval so HBM holds
    device_batch=8) must reproduce the monolithic path exactly: stem slabs
    carry a 2-row halo and queries never attend to each other."""
    dim = 32
    rng = np.random.default_rng(7)
    src = jnp.asarray(rng.standard_normal((2, 4, 4, dim), dtype=np.float32))
    img = jnp.asarray(rng.random((2, 56, 56, 3), dtype=np.float32))

    mono = LoftUpUpsampler(n_dim=dim, attn_impl="jnp", query_chunk_rows=0)
    params = mono.init(jax.random.PRNGKey(2), src, img)["params"]
    want = mono.apply({"params": params}, src, img)

    banded = LoftUpUpsampler(n_dim=dim, attn_impl="jnp", query_chunk_rows=16,
                             query_chunk_min_pixels=0)
    got = banded.apply({"params": params}, src, img)
    assert got.shape == want.shape == (2, 56, 56, dim)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=1e-5, atol=1e-5)

    # non-divisible requested rows fall back to the nearest divisor (still
    # banded, still exact)
    banded24 = LoftUpUpsampler(n_dim=dim, attn_impl="jnp",
                               query_chunk_rows=24, query_chunk_min_pixels=0)
    got24 = banded24.apply({"params": params}, src, img)
    np.testing.assert_allclose(np.asarray(got24), np.asarray(want),
                               rtol=1e-5, atol=1e-5)


def test_loftup_fused_head_exact():
    """fuse_hr_head runs the seg head inside the LoftUp slab loop (the HR
    feature map never hits HBM — VERDICT r3 #1). Must be bit-compatible with
    the unfused upsampler->head composition in BOTH the banded and the
    monolithic (tail-on-full-frame) paths, including frame-edge slabs where
    the head's 3x3 zero padding is emulated with in_frame zeroing."""
    from isegprobe_tpu.models.probe_model import iSegProbeModel

    def make(fused, chunk_min):
        return iSegProbeModel(
            backbone_cfg=dict(type="dinov2", params=dict(
                feats_injection_mode="before_backbone")),
            embed_coords_cfg=dict(type="patchEmbed", params=dict(
                img_size=(56, 56), patch_size=(14, 14), embed_dim=384)),
            head_cfg=dict(type="convhead", params=dict(
                in_channels=384, num_layers=2, num_classes=1)),
            upsampler_cfg=dict(type="loftup", params=dict(
                n_dim=384, query_chunk_rows=16,
                query_chunk_min_pixels=chunk_min, attn_impl="jnp")),
            use_disks=True, norm_radius=5, with_prev_mask=True,
            fuse_hr_head=fused,
        )

    rng = np.random.default_rng(11)
    image = jnp.asarray(rng.random((2, 56, 56, 4), dtype=np.float32))
    points = jnp.full((2, 8, 3), -1.0, np.float32)
    points = points.at[:, 0].set(jnp.asarray([28.0, 30.0, 0.0]))

    # banded path (chunk_min=0 forces slabs at 56x56)
    plain = make(False, 0)
    params = plain.init(jax.random.PRNGKey(5), image, points)["params"]
    want = plain.apply({"params": params}, image, points)["instances"]
    got = make(True, 0).apply({"params": params}, image, points)["instances"]
    assert got.shape == want.shape == (2, 56, 56, 1)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=1e-5, atol=1e-5)

    # monolithic path (banding off): tail applied to the zero-padded frame
    got_mono = make(True, 10**9).apply({"params": params}, image,
                                       points)["instances"]
    np.testing.assert_allclose(np.asarray(got_mono), np.asarray(want),
                               rtol=1e-5, atol=1e-5)


def test_loftup_batch_lane_independence():
    """Each batch element's output must be independent of its batch-mates:
    the device-batched NoC loop flattens B different samples into one apply,
    so a batch-coupled reduction anywhere (the reference's MinMaxScaler
    couples batch+space — equivalent to per-sample only because its eval
    batch is a flip pair) would make results depend on batch composition."""
    dim = 32
    rng = np.random.default_rng(3)
    src = jnp.asarray(rng.standard_normal((2, 4, 4, dim), dtype=np.float32))
    # deliberately different value ranges so coupled min/max would differ
    img = jnp.asarray(np.stack([
        rng.random((28, 28, 3), dtype=np.float32) * 0.3,
        rng.random((28, 28, 3), dtype=np.float32) * 0.9 + 0.1,
    ]))

    up = LoftUpUpsampler(n_dim=dim, attn_impl="jnp")
    params = up.init(jax.random.PRNGKey(4), src, img)["params"]
    batched = up.apply({"params": params}, src, img)
    for i in range(2):
        single = up.apply({"params": params}, src[i:i + 1], img[i:i + 1])
        np.testing.assert_allclose(np.asarray(batched[i]),
                                   np.asarray(single[0]),
                                   rtol=1e-5, atol=1e-5)


def test_jbu_shapes_and_finiteness():
    rng = np.random.default_rng(2)
    src = jnp.asarray(rng.standard_normal((1, 4, 4, 32), dtype=np.float32))
    img = jnp.asarray(rng.random((1, 56, 56, 3), dtype=np.float32))
    up = JBUFeatUpUpsampler()
    params = up.init(jax.random.PRNGKey(0), src, img)["params"]
    out = up.apply({"params": params}, src, img)
    assert out.shape == (1, 64, 64, 32)  # x16
    assert np.isfinite(np.asarray(out)).all()


def test_jbu_uniform_guidance_preserves_constant_features():
    """With constant source, any normalized kernel must reproduce it."""
    src = jnp.ones((1, 4, 4, 8)) * 3.0
    img = jnp.asarray(np.random.default_rng(3).random((1, 64, 64, 3), np.float32))
    up = JBUFeatUpUpsampler()
    params = up.init(jax.random.PRNGKey(1), src, img)["params"]
    # zero the fixup projection so the pure filtering path is isolated
    params = jax.tree.map(lambda x: x, params)
    params["fixup_proj"]["kernel"] = jnp.zeros_like(params["fixup_proj"]["kernel"])
    params["fixup_proj"]["bias"] = jnp.zeros_like(params["fixup_proj"]["bias"])
    out = up.apply({"params": params}, src, img)
    np.testing.assert_allclose(np.asarray(out), 3.0, rtol=1e-5)
