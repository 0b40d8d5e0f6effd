"""Composable eval-transform objects: ZoomIn/Crops/flip protocol behavior."""

import numpy as np

from isegprobe_tpu.inference.clicker import Click
from isegprobe_tpu.inference.transforms import (
    AddHorizontalFlip,
    Crops,
    LimitLongestSide,
    SigmoidForPred,
    ZoomIn,
    get_offsets,
)


def test_get_offsets_reference_formula():
    # length == crop -> single offset (reference: crops.py:97-117)
    assert get_offsets(320, 320) == [0]
    offs = get_offsets(700, 320, 0.2)
    assert offs[0] == 0 and offs[-1] + 320 <= 700
    assert all(b > a for a, b in zip(offs, offs[1:]))


def test_zoomin_fixed_mode_roundtrip():
    rng = np.random.default_rng(0)
    image = rng.random((1, 60, 80, 4), dtype=np.float32)
    z = ZoomIn(target_size=(56, 56), skip_clicks=-1)
    clicks = [Click(is_positive=True, coords=(30, 40), indx=0)]

    out, tclicks = z.transform(image, [clicks])
    # first click: no prev probs -> full-image ROI, resized to target
    assert out.shape == (1, 56, 56, 4)
    assert z._object_roi == (0, 59, 0, 79)
    # click remap: new_r = 56*(30-0)/60
    assert np.isclose(tclicks[0][0].coords[0], 56 * 30 / 60)

    probs = rng.random((1, 56, 56, 1), dtype=np.float32)
    full = z.inv_transform(probs)
    assert full.shape == (1, 60, 80, 1)

    # second click inside the predicted object reuses the ROI when IoU is high
    clicks.append(Click(is_positive=True, coords=(31, 41), indx=1))
    out2, _ = z.transform(image, [clicks])
    assert out2.shape == (1, 56, 56, 4)

    state = z.get_state()
    z.reset()
    assert z._object_roi is None
    z.set_state(state)
    assert z._object_roi is not None


def test_crops_tile_and_stitch_average():
    rng = np.random.default_rng(1)
    image = rng.random((1, 50, 70, 3), dtype=np.float32)
    c = Crops(crop_size=(32, 32), min_overlap=0.2)
    crops, clicks_lists = c.transform(
        image, [[Click(is_positive=True, coords=(10, 10), indx=0)]]
    )
    n = len(c.y_offsets) * len(c.x_offsets)
    assert crops.shape[0] == n
    assert len(clicks_lists) == n

    probs = np.ones((n, 32, 32, 1), dtype=np.float32)
    full = c.inv_transform(probs)
    assert full.shape == (1, 50, 70, 1)
    # count-averaged stitch of all-ones is all-ones
    np.testing.assert_allclose(full, 1.0, atol=1e-6)


def test_flip_and_sigmoid():
    rng = np.random.default_rng(2)
    image = rng.random((1, 20, 30, 3), dtype=np.float32)
    f = AddHorizontalFlip()
    out, clists = f.transform(image, [[Click(True, (5, 4), 0)]])
    assert out.shape[0] == 2
    assert clists[1][0].coords == (5, 30 - 4 - 1)
    probs = rng.random((2, 20, 30, 1), dtype=np.float32)
    merged = f.inv_transform(probs)
    np.testing.assert_allclose(
        merged, 0.5 * (probs[:1] + probs[1:, :, ::-1]), atol=1e-6
    )

    s = SigmoidForPred()
    logits = np.array([[0.0]])
    np.testing.assert_allclose(s.inv_transform(logits), 0.5)


def test_limit_longest_side():
    rng = np.random.default_rng(3)
    image = rng.random((1, 100, 200, 3), dtype=np.float32)
    t = LimitLongestSide(max_size=80)
    out, _ = t.transform(image, [[]])
    assert max(out.shape[1:3]) == 80
    small = rng.random((1, 40, 60, 3), dtype=np.float32)
    out2, _ = t.transform(small, [[]])
    assert out2.shape == small.shape  # untouched below the limit

def _probe_model(hw):
    import jax

    from isegprobe_tpu.models.probe_model import iSegProbeModel

    model = iSegProbeModel(
        backbone_cfg=dict(type="dinov2",
                          params=dict(feats_injection_mode="before_backbone")),
        embed_coords_cfg=dict(
            type="patchEmbed",
            params=dict(img_size=hw, patch_size=(14, 14), embed_dim=384),
        ),
        head_cfg=dict(type="convhead",
                      params=dict(in_channels=384, num_layers=1, num_classes=1)),
        upsampler_cfg=dict(type="identity", params=dict()),
        use_disks=True, norm_radius=5, with_prev_mask=True, attn_impl="jnp",
    )
    img = np.zeros((1, *hw, 4), np.float32)
    pts = np.full((1, 8, 3), -1.0, np.float32)
    params = model.init(jax.random.PRNGKey(0), img, pts)["params"]
    return model, params


def _scene(hw, box):
    rng = np.random.default_rng(0)
    img = (rng.random((*hw, 3)) * 70).astype(np.uint8)
    gt = np.zeros(hw, np.int32)
    y0, y1, x0, x1 = box
    gt[y0:y1, x0:x1] = 1
    img[gt == 1] = [185, 175, 85]
    return img, gt


def _drive_protocol(predictor, img, gt, n_clicks=3):
    from isegprobe_tpu.inference.clicker import Clicker

    predictor.set_input_image(img)
    clicker = Clicker(gt_mask=gt)
    mask = np.zeros_like(gt, bool)
    probs = None
    for _ in range(n_clicks):
        clicker.make_next_click(mask)
        probs = predictor.get_prediction(clicker)
        assert probs.shape == gt.shape
        mask = probs > 0.49
    return probs, clicker


def test_limit_longest_side_through_predictor():
    """LimitLongestSide must downscale the net input while the protocol keeps
    operating at the original resolution (ref: limit_longest_side.py:12-32)."""
    from isegprobe_tpu.inference.predictor import TransformChainPredictor
    from isegprobe_tpu.inference.transforms import (
        LimitLongestSide,
        SigmoidForPred,
    )

    hw = (84, 126)  # longest side 126 > limit 70 -> resized to 70-wide net in
    model, params = _probe_model((56, 84))
    limiter = LimitLongestSide(max_size=70)
    pred = TransformChainPredictor(
        model, params, transforms=[limiter, SigmoidForPred()],
        net_clicks_limit=4,
    )
    img, gt = _scene(hw, (20, 64, 30, 100))
    probs, clicker = _drive_protocol(pred, img, gt)
    assert limiter.image_changed, "limiter never resized"
    assert np.isfinite(probs).all() and 0 <= probs.min() <= probs.max() <= 1
    # clicks stay in original coordinates
    for c in clicker.clicks_list:
        assert 0 <= c.coords[0] < hw[0] and 0 <= c.coords[1] < hw[1]


def test_crops_through_predictor():
    """Tiled Crops: multi-crop batching + count-averaged stitching drives a
    full click protocol end-to-end (ref: crops.py:14-117)."""
    from isegprobe_tpu.inference.predictor import TransformChainPredictor
    from isegprobe_tpu.inference.transforms import Crops, SigmoidForPred

    hw = (84, 112)
    model, params = _probe_model((56, 56))
    crops = Crops(crop_size=(56, 56), min_overlap=0.2)
    pred = TransformChainPredictor(
        model, params, transforms=[crops, SigmoidForPred()],
        net_clicks_limit=4,
    )
    img, gt = _scene(hw, (20, 64, 28, 84))
    probs, _ = _drive_protocol(pred, img, gt)
    assert crops.x_offsets is not None and len(crops.x_offsets) >= 2
    assert probs.shape == hw
    assert np.isfinite(probs).all() and 0 <= probs.min() <= probs.max() <= 1


def test_compiled_crops_predictor_matches_host_chain():
    """CropsPredictor (one compiled program per click: tile + flip TTA +
    forward + stitch) reproduces the host TransformChainPredictor
    [Crops, Sigmoid, Flip] trajectory click-for-click."""
    from isegprobe_tpu.inference.clicker import Clicker
    from isegprobe_tpu.inference.predictor import (
        CropsPredictor,
        TransformChainPredictor,
    )
    from isegprobe_tpu.inference.transforms import (
        AddHorizontalFlip,
        Crops,
        SigmoidForPred,
    )

    hw = (84, 112)
    model, params = _probe_model((56, 56))
    host = TransformChainPredictor(
        model, params,
        transforms=[Crops(crop_size=(56, 56), min_overlap=0.2),
                    SigmoidForPred(), AddHorizontalFlip()],
        net_clicks_limit=4,
    )
    dev = CropsPredictor(model, params, crop_size=(56, 56), min_overlap=0.2,
                         with_flip=True, net_clicks_limit=4)
    img, gt = _scene(hw, (20, 64, 28, 84))

    host.set_input_image(img)
    dev.set_input_image(img)
    clicker_h = Clicker(gt_mask=gt)
    clicker_d = Clicker(gt_mask=gt)
    mask_h = np.zeros_like(gt, bool)
    mask_d = np.zeros_like(gt, bool)
    for _ in range(4):
        clicker_h.make_next_click(mask_h)
        clicker_d.make_next_click(mask_d)
        assert clicker_h.clicks_list[-1].coords == \
            clicker_d.clicks_list[-1].coords, "click sequences diverged"
        p_h = host.get_prediction(clicker_h)
        p_d = dev.get_prediction(clicker_d)
        np.testing.assert_allclose(p_d, p_h, atol=2e-3)
        mask_h, mask_d = p_h > 0.49, p_d > 0.49


def test_compiled_crops_predictor_small_image_untiled():
    """Frames smaller than the tile run untiled (reference crops.py:31-33)."""
    from isegprobe_tpu.inference.predictor import CropsPredictor

    model, params = _probe_model((56, 56))
    dev = CropsPredictor(model, params, crop_size=(112, 112),
                         with_flip=True, net_clicks_limit=4)
    img, gt = _scene((56, 56), (12, 40, 14, 44))
    probs, _ = _drive_protocol(dev, img, gt)
    assert len(dev._offsets) == 1
    assert probs.shape == (56, 56)
    assert np.isfinite(probs).all()


def test_compiled_crops_predictor_program_cache():
    """Same-geometry frames reuse one compiled step program; a new geometry
    compiles a new one (a fixed-size dataset compiles exactly once)."""
    from isegprobe_tpu.inference.predictor import CropsPredictor

    model, params = _probe_model((56, 56))
    dev = CropsPredictor(model, params, crop_size=(56, 56), min_overlap=0.2,
                         with_flip=True, net_clicks_limit=4)
    img1, _ = _scene((84, 112), (20, 64, 28, 84))
    img2, _ = _scene((84, 112), (10, 50, 30, 90))
    img3, _ = _scene((84, 126), (20, 64, 28, 84))

    dev.set_input_image(img1)
    step1 = dev._step
    dev.set_input_image(img2)
    assert dev._step is step1, "same geometry must reuse the compiled program"
    dev.set_input_image(img3)
    assert dev._step is not step1
    assert len(dev._step_cache) == 2


def test_compiled_crops_step_salts_offsets():
    """Two min_overlap settings can tile one geometry into the same tile
    count (identical shapes) at different baked offsets — program names must
    differ (the name+shape-keyed executable cache cannot tell them apart)."""
    from isegprobe_tpu.inference.predictor import CropsPredictor

    model, params = _probe_model((56, 56))
    img, _ = _scene((84, 112), (20, 64, 28, 84))
    names = []
    for overlap in (0.2, 0.4):
        dev = CropsPredictor(model, params, crop_size=(56, 56),
                             min_overlap=overlap, with_flip=True,
                             net_clicks_limit=4)
        dev.set_input_image(img)
        names.append((dev._step.__wrapped__.__name__, tuple(dev._offsets)))
    if names[0][1] == names[1][1]:  # same offsets -> same program is correct
        assert names[0][0] == names[1][0]
    else:
        assert names[0][0] != names[1][0], names
