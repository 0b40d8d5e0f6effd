"""Loss parity vs the reference torch implementations."""

import jax.numpy as jnp
import numpy as np
import pytest

from tests.reference_oracle import setup_reference

HAS_REF = setup_reference()

from isegprobe_tpu.training.losses import (  # noqa: E402
    FocalLoss,
    NormalizedFocalLossSigmoid,
    SigmoidBinaryCrossEntropyLoss,
    SoftIoU,
)


def _data(with_ignore=True):
    rng = np.random.default_rng(0)
    pred = rng.standard_normal((2, 17, 19, 1), dtype=np.float32) * 3
    label = (rng.random((2, 17, 19, 1)) > 0.5).astype(np.float32)
    if with_ignore:
        label[0, :3, :3, 0] = -1
    return pred, label


def _to_torch(x):
    import torch

    return torch.from_numpy(np.moveaxis(x, -1, 1).copy())


@pytest.mark.skipif(not HAS_REF, reason="reference tree unavailable")
@pytest.mark.parametrize("with_ignore", [True, False])
def test_nfl_parity(with_ignore):
    import torch

    from core.training.losses import NormalizedFocalLossSigmoid as TorchNFL

    pred, label = _data(with_ignore)
    tl = TorchNFL(alpha=0.5, gamma=2)
    with torch.no_grad():
        want = tl(_to_torch(pred), _to_torch(label)).numpy()
    got, aux = NormalizedFocalLossSigmoid(alpha=0.5, gamma=2)(
        jnp.asarray(pred), jnp.asarray(label)
    )
    np.testing.assert_allclose(np.asarray(got), want, rtol=1e-4, atol=1e-5)
    assert "nfl_k" in aux


@pytest.mark.skipif(not HAS_REF, reason="reference tree unavailable")
def test_focal_softiou_bce_parity():
    import torch

    from core.training.losses import FocalLoss as TorchFocal
    from core.training.losses import SigmoidBinaryCrossEntropyLoss as TorchBCE
    from core.training.losses import SoftIoU as TorchSoftIoU

    pred, label = _data()
    pt, lt = _to_torch(pred), _to_torch(label)
    with torch.no_grad():
        want_focal = TorchFocal(alpha=0.5, gamma=2)(pt, lt).numpy()
        want_iou = TorchSoftIoU()(pt, lt).numpy()
        want_bce = TorchBCE()(pt, lt).numpy()

    got_focal, _ = FocalLoss(alpha=0.5, gamma=2)(jnp.asarray(pred), jnp.asarray(label))
    got_iou, _ = SoftIoU()(jnp.asarray(pred), jnp.asarray(label))
    got_bce, _ = SigmoidBinaryCrossEntropyLoss()(jnp.asarray(pred), jnp.asarray(label))
    np.testing.assert_allclose(np.asarray(got_focal), want_focal, rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(np.asarray(got_iou), want_iou, rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(np.asarray(got_bce), want_bce, rtol=1e-4, atol=1e-5)


def test_nfl_gradient_flows():
    import jax

    pred, label = _data(with_ignore=False)
    loss_fn = NormalizedFocalLossSigmoid(alpha=0.5, gamma=2)
    g = jax.grad(lambda p: loss_fn(p, jnp.asarray(label))[0].mean())(jnp.asarray(pred))
    assert np.isfinite(np.asarray(g)).all()
    assert float(jnp.abs(g).max()) > 0
