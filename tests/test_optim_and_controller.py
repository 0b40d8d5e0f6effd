"""Layer-wise LR decay masking and the interactive controller's undo stack."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest


def test_layerwise_decay_scales_by_depth():
    from isegprobe_tpu.training.optim import make_layerwise_decay_optimizer

    params = {
        "backbone": {
            "patch_embed": {"proj": {"kernel": jnp.ones((2, 2))}},
            "blocks_0": {"attn": {"qkv": {"kernel": jnp.ones((2, 2))}}},
            "blocks_3": {"attn": {"qkv": {"kernel": jnp.ones((2, 2))}}},
            "norm": {"scale": jnp.ones((2,))},
        },
        "head": {"classifier": {"kernel": jnp.ones((2, 2))}},
    }
    num_layers = 4
    tx = make_layerwise_decay_optimizer(
        "sgd", 1.0, params, num_layers=num_layers, layer_decay=0.5,
    )
    state = tx.init(params)
    grads = jax.tree.map(jnp.ones_like, params)
    updates, _ = tx.update(grads, state, params)

    # BEiT scheme: layer 0 (patch_embed) scaled by 0.5^(L+1), blocks_i by
    # 0.5^(L-i), non-backbone by 1.0
    u_pe = float(updates["backbone"]["patch_embed"]["proj"]["kernel"][0, 0])
    u_b0 = float(updates["backbone"]["blocks_0"]["attn"]["qkv"]["kernel"][0, 0])
    u_b3 = float(updates["backbone"]["blocks_3"]["attn"]["qkv"]["kernel"][0, 0])
    u_head = float(updates["head"]["classifier"]["kernel"][0, 0])
    assert abs(u_pe / u_head) == pytest.approx(0.5 ** (num_layers + 1), rel=1e-5)
    assert abs(u_b0 / u_head) == pytest.approx(0.5 ** num_layers, rel=1e-5)
    assert abs(u_b3 / u_head) == pytest.approx(0.5 ** (num_layers - 3), rel=1e-5)


@pytest.fixture(scope="module")
def controller():
    from isegprobe_tpu.inference.predictor import TPUPredictor
    from isegprobe_tpu.interactive_demo.controller import InteractiveController
    from isegprobe_tpu.models.probe_model import iSegProbeModel

    model = iSegProbeModel(
        backbone_cfg=dict(type="dinov2",
                          params=dict(feats_injection_mode="before_backbone")),
        embed_coords_cfg=dict(
            type="patchEmbed",
            params=dict(img_size=(56, 56), patch_size=(14, 14), embed_dim=384),
        ),
        head_cfg=dict(type="convhead",
                      params=dict(in_channels=384, num_layers=1, num_classes=1)),
        upsampler_cfg=dict(type="identity", params=dict()),
        use_disks=True, norm_radius=5, with_prev_mask=True, attn_impl="jnp",
    )
    image = np.zeros((1, 56, 56, 4), dtype=np.float32)
    points = np.full((1, 4, 3), -1.0, dtype=np.float32)
    params = model.init(jax.random.PRNGKey(0), image, points)["params"]

    def factory():
        return TPUPredictor(model, params, target_size=(56, 56),
                            with_flip=False, net_clicks_limit=4)

    return InteractiveController(factory, prob_thresh=0.5)


def test_controller_undo_restores_previous_prediction(controller):
    rng = np.random.default_rng(0)
    img = (rng.random((60, 70, 3)) * 255).astype(np.uint8)
    controller.set_image(img)

    controller.add_click(30, 25, is_positive=True)
    prob_after_1 = controller.current_object_prob.copy()
    controller.add_click(50, 40, is_positive=False)
    prob_after_2 = controller.current_object_prob.copy()
    assert not np.array_equal(prob_after_1, prob_after_2)

    controller.undo_click()
    np.testing.assert_array_equal(controller.current_object_prob, prob_after_1)
    assert len(controller.clicker) == 1

    # finish object increments the result mask label space
    controller.finish_object()
    assert controller.object_count == 1
    assert controller.result_mask.dtype == np.uint16

    vis = controller.get_visualization(alpha_blend=0.5, click_radius=3)
    assert vis.shape == img.shape
