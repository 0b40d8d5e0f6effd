"""Adaptive-canvas model forward vs the plain forward on the true-size input.

``iSegProbeModel.forward_masked`` is the compiled stand-in for the RITM
adaptive ZoomIn's data-dependent crop sizes (VERDICT r3 #6; reference:
core/inference/transforms/zoom_in.py:228-253): the model runs on a static
canvas whose per-sample traced (vh, vw) rect is valid, and the valid-rect
logits must equal running the ordinary forward on the actual (vh, vw) image.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from isegprobe_tpu.models.probe_model import iSegProbeModel

CANVAS = (112, 112)


def _model(upsampler="identity"):
    return iSegProbeModel(
        backbone_cfg=dict(type="dinov2",
                          params=dict(feats_injection_mode="before_backbone")),
        embed_coords_cfg=dict(
            type="patchEmbed",
            params=dict(img_size=CANVAS, patch_size=(14, 14), embed_dim=384)),
        head_cfg=dict(type="convhead",
                      params=dict(in_channels=384, num_layers=2,
                                  num_classes=1)),
        upsampler_cfg=dict(type=upsampler, params=dict()),
        use_disks=True, norm_radius=5, with_prev_mask=True, attn_impl="jnp",
    )


@pytest.mark.parametrize("upsampler", ["identity", "bilinear"])
def test_forward_masked_matches_true_size(upsampler):
    model = _model(upsampler)
    rng = np.random.default_rng(5)
    image = jnp.zeros((1, *CANVAS, 4), jnp.float32)
    points = jnp.full((1, 8, 3), -1.0, jnp.float32)
    params = model.init(jax.random.PRNGKey(0), image, points)["params"]

    sizes = [(98, 70), (112, 112), (59, 101)]
    canvas = np.zeros((len(sizes), *CANVAS, 4), np.float32)
    pts = np.full((len(sizes), 8, 3), -1.0, np.float32)
    wants = []
    for i, (vh, vw) in enumerate(sizes):
        img = rng.random((1, vh, vw, 4), dtype=np.float32)
        canvas[i, :vh, :vw] = img[0]
        pts[i, 0] = [vh * 0.4, vw * 0.6, 0]
        pts[i, 4] = [vh * 0.8, vw * 0.2, 1]
        want = model.apply({"params": params}, jnp.asarray(img),
                           jnp.asarray(pts[i:i + 1]))["instances"]
        wants.append(np.asarray(want)[0])

    vhw = jnp.asarray(sizes, jnp.int32)
    got = model.apply({"params": params}, jnp.asarray(canvas),
                      jnp.asarray(pts), vhw,
                      method=iSegProbeModel.forward_masked)["instances"]
    got = np.asarray(got)
    for i, (vh, vw) in enumerate(sizes):
        np.testing.assert_allclose(
            got[i, :vh, :vw], wants[i], rtol=2e-4, atol=2e-4,
            err_msg=f"sample {i} size {(vh, vw)}")


def test_adaptive_device_matches_host_protocol():
    """The compiled adaptive evaluator must walk the same clicks to the same
    IoUs as the host protocol (TransformChainPredictor over the parity-twin
    ZoomIn transform with a SCALAR target + skip_clicks=1 — the RITM cvpr
    mode, reference: core/inference/utils.py:292-295)."""
    from isegprobe_tpu.inference.adaptive_eval import make_adaptive_evaluator
    from isegprobe_tpu.inference.evaluation import evaluate_sample
    from isegprobe_tpu.inference.predictor import TransformChainPredictor
    from isegprobe_tpu.inference.transforms import (
        AddHorizontalFlip,
        SigmoidForPred,
        ZoomIn,
    )

    model = _model("identity")
    image0 = jnp.zeros((1, *CANVAS, 4), jnp.float32)
    points0 = jnp.full((1, 8, 3), -1.0, jnp.float32)
    params = model.init(jax.random.PRNGKey(2), image0, points0)["params"]

    T = 56
    max_clicks = 6
    rng = np.random.default_rng(17)

    def scene(h, w, seed):
        r = np.random.default_rng(seed)
        img = (r.random((h, w, 3)) * 70).astype(np.uint8)
        gt = np.zeros((h, w), np.int32)
        gt[h // 4: 2 * h // 3, w // 5: 3 * w // 4] = 1
        img[gt == 1] = [180, 160, 90]
        return img, gt

    run = make_adaptive_evaluator(
        model, target_size=T, frame_hw=CANVAS, max_clicks=max_clicks,
        net_clicks_limit=4, pred_thr=0.49, target_iou=0.95, with_flip=True,
        skip_clicks=1, min_crop_size=24,
    )

    for h, w, seed in [(98, 84, 0), (70, 112, 5)]:
        img, gt = scene(h, w, seed)

        host = TransformChainPredictor(
            model, params,
            transforms=[
                ZoomIn(target_size=T, skip_clicks=1, min_crop_size=24),
                AddHorizontalFlip(),
                SigmoidForPred(),
            ],
            net_clicks_limit=4,
        )
        _, host_ious, _ = evaluate_sample(
            img, gt, host, max_iou_thr=0.95, pred_thr=0.49,
            max_clicks=max_clicks)

        # device: pad into the static frame
        img_pad = np.zeros((*CANVAS, 3), np.uint8)
        img_pad[:h, :w] = img
        gt_pad = np.zeros(CANVAS, np.int8)
        gt_pad[:h, :w] = gt
        ious_dev, n_dev = run(params, jnp.asarray(img_pad),
                              jnp.asarray(gt_pad),
                              jnp.asarray([h, w], jnp.int32))
        ious_dev = np.asarray(ious_dev)[: int(n_dev)]

        assert len(ious_dev) == len(host_ious), (
            f"click counts diverge: device {len(ious_dev)} vs host "
            f"{len(host_ious)} ({host_ious} vs {ious_dev})")
        np.testing.assert_allclose(ious_dev, host_ious, atol=5e-3,
                                   err_msg=f"scene {(h, w, seed)}")


def test_adaptive_batched_matches_host_protocol():
    """Batched adaptive parity (VERDICT r4 #3): lane interaction is where
    vmap bugs live — per-lane dynamic pos-embed interpolation, masked
    attention over mixed valid-rects, per-lane ZoomIn state machines. Run
    four different-geometry scenes through ONE batched compiled adaptive
    program and require every lane's full IoU trajectory to match its own
    host-protocol run (TransformChainPredictor + scalar-target ZoomIn)."""
    from isegprobe_tpu.inference.adaptive_eval import make_adaptive_evaluator
    from isegprobe_tpu.inference.evaluation import evaluate_sample
    from isegprobe_tpu.inference.predictor import TransformChainPredictor
    from isegprobe_tpu.inference.transforms import (
        AddHorizontalFlip,
        SigmoidForPred,
        ZoomIn,
    )

    model = _model("identity")
    image0 = jnp.zeros((1, *CANVAS, 4), jnp.float32)
    points0 = jnp.full((1, 8, 3), -1.0, jnp.float32)
    params = model.init(jax.random.PRNGKey(2), image0, points0)["params"]

    T = 56
    max_clicks = 5

    def scene(h, w, seed, box):
        r = np.random.default_rng(seed)
        img = (r.random((h, w, 3)) * 70).astype(np.uint8)
        gt = np.zeros((h, w), np.int32)
        y0, y1, x0, x1 = box
        gt[y0:y1, x0:x1] = 1
        img[gt == 1] = [180, 160, 90]
        return img, gt

    # four lanes with distinct valid rects, object geometries, and therefore
    # distinct per-click crop sizes / ZoomIn decisions
    scenes = [
        scene(98, 84, 0, (24, 65, 16, 63)),
        scene(70, 112, 5, (17, 46, 22, 84)),
        scene(112, 112, 9, (10, 100, 60, 100)),
        scene(56, 56, 13, (14, 42, 14, 42)),
    ]

    run = make_adaptive_evaluator(
        model, target_size=T, frame_hw=CANVAS, max_clicks=max_clicks,
        net_clicks_limit=4, pred_thr=0.49, target_iou=0.95, with_flip=True,
        skip_clicks=1, min_crop_size=24, batch_size=len(scenes),
    )

    imgs = np.zeros((len(scenes), *CANVAS, 3), np.uint8)
    gts = np.zeros((len(scenes), *CANVAS), np.int8)
    hws = np.zeros((len(scenes), 2), np.int32)
    for i, (img, gt) in enumerate(scenes):
        h, w = img.shape[:2]
        imgs[i, :h, :w], gts[i, :h, :w], hws[i] = img, gt, (h, w)

    ious_dev, n_dev = run(params, jnp.asarray(imgs), jnp.asarray(gts),
                          jnp.asarray(hws))
    ious_dev, n_dev = np.asarray(ious_dev), np.asarray(n_dev)

    for i, (img, gt) in enumerate(scenes):
        host = TransformChainPredictor(
            model, params,
            transforms=[
                ZoomIn(target_size=T, skip_clicks=1, min_crop_size=24),
                AddHorizontalFlip(),
                SigmoidForPred(),
            ],
            net_clicks_limit=4,
        )
        _, host_ious, _ = evaluate_sample(
            img, gt, host, max_iou_thr=0.95, pred_thr=0.49,
            max_clicks=max_clicks)
        lane = ious_dev[i][: int(n_dev[i])]
        assert len(lane) == len(host_ious), (
            f"lane {i}: click counts diverge (device {len(lane)} vs host "
            f"{len(host_ious)}: {lane} vs {host_ious})")
        np.testing.assert_allclose(lane, host_ious, atol=5e-3,
                                   err_msg=f"lane {i}")


def test_adaptive_group_matches_per_sample():
    """Adaptive continuous batching (round 5): the RITM adaptive protocol
    through the windowed on-device job queue must reproduce the per-sample
    adaptive evaluator's trajectories exactly — including a window=2 chain
    that pauses mid-protocol lanes across dispatches. Lanes are
    protocol-independent; the queue re-times WHEN a lane runs, never what
    it computes."""
    from isegprobe_tpu.inference.adaptive_eval import (
        make_adaptive_group_runner,
        make_adaptive_runner,
    )
    from isegprobe_tpu.inference.device_eval import (
        evaluate_dataset_device,
        evaluate_dataset_group,
    )

    model = _model("identity")
    image0 = jnp.zeros((1, *CANVAS, 4), jnp.float32)
    points0 = jnp.full((1, 8, 3), -1.0, jnp.float32)
    params = model.init(jax.random.PRNGKey(2), image0, points0)["params"]

    def scene(h, w, seed, box):
        r = np.random.default_rng(seed)
        img = (r.random((h, w, 3)) * 70).astype(np.uint8)
        gt = np.zeros((h, w), np.int32)
        y0, y1, x0, x1 = box
        gt[y0:y1, x0:x1] = 1
        img[gt == 1] = [180, 160, 90]
        return img, gt

    # all four scenes pad to the same 128x128 bucket -> one canvas compile
    scenes = [
        scene(98, 84, 0, (24, 65, 16, 63)),
        scene(70, 112, 5, (17, 46, 22, 84)),
        scene(112, 112, 9, (10, 100, 60, 100)),
        scene(90, 100, 13, (20, 70, 25, 80)),
    ]

    class _DS:
        def __len__(self):
            return len(scenes)

        def get_sample(self, i):
            s = type("S", (), {})()
            img, gt = scenes[i]
            s.image, s.objects_ids = img, [1]
            s.gt_mask = lambda _o, g=gt: g
            return s

    protocol = dict(max_clicks=5, net_clicks_limit=4, pred_thr=0.49,
                    target_iou=0.85, with_flip=True, skip_clicks=1,
                    min_crop_size=24)
    single = make_adaptive_runner(model, target_size=56, batch_size=1,
                                  **protocol)
    want = evaluate_dataset_device(single, params, _DS(), batch_size=1)

    ev = make_adaptive_group_runner(model, target_size=56, batch_size=2,
                                    **protocol)
    stats: dict = {}
    got = evaluate_dataset_group(ev, params, _DS(), stats=stats)
    assert stats["dispatches"] == 1
    stats_w: dict = {}
    got_w = evaluate_dataset_group(ev, params, _DS(), stats=stats_w,
                                   max_jobs_per_dispatch=2)
    assert stats_w["dispatches"] == 2

    assert len(want) == len(got) == len(got_w) == len(scenes)
    for i in range(len(scenes)):
        assert len(got[i]) == len(want[i]), (
            f"group lane {i} stopped at a different click")
        np.testing.assert_allclose(got[i], want[i], rtol=1e-4, atol=1e-4)
        assert len(got_w[i]) == len(want[i]), (
            f"windowed lane {i} stopped at a different click")
        np.testing.assert_allclose(got_w[i], want[i], rtol=1e-4, atol=1e-4)


@pytest.mark.parametrize("feat_type", ["token", "key"])
def test_forward_masked_dino_family(feat_type):
    """The DINO ('vit') featurizer family under the adaptive canvas — both
    probing modes ('token' patch tokens, 'key' last-block key vectors). Key
    vectors are pointwise projections, so masked attention leaves valid
    tokens' keys exact."""
    model = iSegProbeModel(
        backbone_cfg=dict(type="vit", params=dict(
            feats_injection_mode="before_backbone", feat_type=feat_type)),
        embed_coords_cfg=dict(
            type="patchEmbed",
            params=dict(img_size=(112, 112), patch_size=(16, 16),
                        embed_dim=384)),
        head_cfg=dict(type="convhead",
                      params=dict(in_channels=384, num_layers=1,
                                  num_classes=1)),
        upsampler_cfg=dict(type="identity", params=dict()),
        use_disks=True, norm_radius=5, with_prev_mask=True, attn_impl="jnp",
    )
    rng = np.random.default_rng(9)
    image = jnp.zeros((1, 112, 112, 4), jnp.float32)
    points = jnp.full((1, 8, 3), -1.0, jnp.float32)
    params = model.init(jax.random.PRNGKey(3), image, points)["params"]

    vh, vw = 96, 77
    img = rng.random((1, vh, vw, 4), dtype=np.float32)
    pts = np.full((1, 8, 3), -1.0, np.float32)
    pts[0, 0] = [40.0, 33.0, 0]
    want = np.asarray(model.apply({"params": params}, jnp.asarray(img),
                                  jnp.asarray(pts))["instances"])[0]

    canvas = np.zeros((1, 112, 112, 4), np.float32)
    canvas[0, :vh, :vw] = img[0]
    got = np.asarray(model.apply(
        {"params": params}, jnp.asarray(canvas), jnp.asarray(pts),
        jnp.asarray([[vh, vw]], jnp.int32),
        method=iSegProbeModel.forward_masked)["instances"])[0]
    np.testing.assert_allclose(got[:vh, :vw], want, rtol=2e-4, atol=2e-4)


def test_forward_masked_maskclip():
    """The MaskCLIP (CLIP ViT-B/16 value-trick) family under the adaptive
    canvas — its own tower: QuickGELU blocks, +0.1-offset bicubic pos-embed
    at traced grids, last-block value path."""
    model = iSegProbeModel(
        backbone_cfg=dict(type="mask_clip", params=dict(
            feats_injection_mode="before_backbone")),
        embed_coords_cfg=dict(
            type="patchEmbed",
            params=dict(img_size=(112, 112), patch_size=(16, 16),
                        embed_dim=768)),
        head_cfg=dict(type="convhead",
                      params=dict(in_channels=512, num_layers=1,
                                  num_classes=1)),
        upsampler_cfg=dict(type="identity", params=dict()),
        use_disks=True, norm_radius=5, with_prev_mask=True, attn_impl="jnp",
    )
    rng = np.random.default_rng(21)
    image = jnp.zeros((1, 112, 112, 4), jnp.float32)
    points = jnp.full((1, 8, 3), -1.0, jnp.float32)
    params = model.init(jax.random.PRNGKey(6), image, points)["params"]

    vh, vw = 103, 80
    img = rng.random((1, vh, vw, 4), dtype=np.float32)
    pts = np.full((1, 8, 3), -1.0, np.float32)
    pts[0, 0] = [50.0, 31.0, 0]
    want = np.asarray(model.apply({"params": params}, jnp.asarray(img),
                                  jnp.asarray(pts))["instances"])[0]

    canvas = np.zeros((1, 112, 112, 4), np.float32)
    canvas[0, :vh, :vw] = img[0]
    got = np.asarray(model.apply(
        {"params": params}, jnp.asarray(canvas), jnp.asarray(pts),
        jnp.asarray([[vh, vw]], jnp.int32),
        method=iSegProbeModel.forward_masked)["instances"])[0]
    np.testing.assert_allclose(got[:vh, :vw], want, rtol=2e-4, atol=2e-4)


def test_forward_masked_unsupported_raises():
    model = _model()
    import dataclasses

    m2 = dataclasses.replace(model, upsampler_cfg=dict(type="bicubic",
                                                       params=dict()))
    image = jnp.zeros((1, *CANVAS, 4), jnp.float32)
    points = jnp.full((1, 8, 3), -1.0, jnp.float32)
    params = m2.init(jax.random.PRNGKey(0), image, points)["params"]
    with pytest.raises(NotImplementedError, match="identity/bilinear"):
        m2.apply({"params": params}, image, points,
                 jnp.asarray([[112, 112]]),
                 method=iSegProbeModel.forward_masked)
