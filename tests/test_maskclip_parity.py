"""MaskCLIP dense-feature parity vs the reference CLIP visual tower."""

import jax.numpy as jnp
import numpy as np
import pytest

from tests.reference_oracle import setup_reference

if not setup_reference():
    pytest.skip("reference tree unavailable", allow_module_level=True)

import torch  # noqa: E402

from isegprobe_tpu.models.convert import convert_clip_visual  # noqa: E402
from isegprobe_tpu.models.featurizers.maskclip import (  # noqa: E402
    CLIPVisionTransformer,
)


@pytest.fixture(scope="module")
def clip_pair():
    from core.model.featurizers.maskclip.model import VisionTransformer

    torch.manual_seed(0)
    tm = VisionTransformer(input_resolution=224, patch_size=16, width=64,
                           layers=3, heads=4, output_dim=32).eval()
    # non-degenerate weights
    sd = tm.state_dict()
    g = torch.Generator().manual_seed(99)
    for k, v in sd.items():
        sd[k] = torch.randn(v.shape, generator=g) * 0.02
    tm.load_state_dict(sd)

    jm = CLIPVisionTransformer(patch_size=16, width=64, layers=3, heads=4,
                               output_dim=32, pretrain_grid=14, attn_impl="jnp")
    params = convert_clip_visual(tm.state_dict(), layers=3)
    return tm, jm, params


@pytest.mark.parametrize("hw", [(224, 224), (64, 80)])
def test_dense_patch_features_parity(clip_pair, hw):
    tm, jm, params = clip_pair
    rng = np.random.default_rng(0)
    x = rng.standard_normal((1, *hw, 3), dtype=np.float32)
    with torch.no_grad():
        want = tm(torch.from_numpy(np.moveaxis(x, -1, 1).copy()),
                  patch_output=True).numpy()
    got = np.asarray(jm.apply({"params": params}, jnp.asarray(x)))
    np.testing.assert_allclose(got, want, rtol=1e-3, atol=5e-4)


def test_injection_before_backbone_parity(clip_pair):
    """Early injection path: inject into patch embeds, then dense forward
    (reference: MaskCLIP.py:50-66, model.py:370-430)."""
    tm, jm, params = clip_pair
    rng = np.random.default_rng(1)
    x = rng.standard_normal((1, 64, 64, 3), dtype=np.float32)
    add = rng.standard_normal((1, 16, 64), dtype=np.float32)

    with torch.no_grad():
        xt = torch.from_numpy(np.moveaxis(x, -1, 1).copy())
        e = tm.conv1(xt)
        e = e.reshape(e.shape[0], e.shape[1], -1).permute(0, 2, 1)
        e = e + torch.from_numpy(add)
        want = tm.forward_without_patch_embed(e, (64, 64),
                                              patch_output=True).numpy()

    tokens = jm.apply({"params": params}, jnp.asarray(x),
                      method=jm.embed_patches)
    tokens = tokens + jnp.asarray(add)
    got = np.asarray(
        jm.apply({"params": params}, tokens, (4, 4), method=jm.dense_features)
    )
    np.testing.assert_allclose(got, want, rtol=1e-3, atol=5e-4)
