"""CLI end-to-end: checkpoint save -> evaluate.py main() on a fixture GrabCut
dataset -> NoC table; plus the train.py config plumbing."""

import subprocess
import os
import sys
from pathlib import Path

import cv2
import numpy as np
import pytest
import yaml


@pytest.fixture(scope="module")
def fixture_dataset(tmp_path_factory):
    """Two tiny images in GrabCut directory layout."""
    root = tmp_path_factory.mktemp("grabcut")
    (root / "data_GT").mkdir()
    (root / "boundary_GT").mkdir()
    rng = np.random.default_rng(0)
    for i in range(2):
        h, w = 80, 90
        img = (rng.random((h, w, 3)) * 60).astype(np.uint8)
        mask = np.zeros((h, w), dtype=np.uint8)
        mask[20:60, 25:70] = 255
        img[mask > 0] = [200, 180, 90]
        cv2.imwrite(str(root / "data_GT" / f"img{i}.png"), img[:, :, ::-1])
        cv2.imwrite(str(root / "boundary_GT" / f"img{i}.png"), mask)
    return root


@pytest.fixture(scope="module")
def fixture_checkpoint(tmp_path_factory):
    import jax

    from isegprobe_tpu.models.probe_model import filter_state_dict, iSegProbeModel
    from isegprobe_tpu.utils.serialization import model_config, save_checkpoint

    model = iSegProbeModel(
        backbone_cfg=dict(type="dinov2",
                          params=dict(feats_injection_mode="before_backbone")),
        embed_coords_cfg=dict(
            type="patchEmbed",
            params=dict(img_size=(112, 112), patch_size=(14, 14), embed_dim=384),
        ),
        head_cfg=dict(type="convhead",
                      params=dict(in_channels=384, num_layers=1, num_classes=1)),
        upsampler_cfg=dict(type="identity", params=dict()),
        save_cfg=dict(embed_coords=True, backbone=False, upsampler=False,
                      head=True),
        use_disks=True,
        norm_radius=5,
        with_prev_mask=True,
        attn_impl="jnp",
    )
    image = np.zeros((1, 112, 112, 4), dtype=np.float32)
    points = np.full((1, 4, 3), -1.0, dtype=np.float32)
    params = model.init(jax.random.PRNGKey(0), image, points)["params"]
    path = tmp_path_factory.mktemp("ckpt") / "test.ckpt"
    save_checkpoint(filter_state_dict(params, model.save_cfg),
                    model_config(model), path)
    return path


def test_evaluate_main_runs(fixture_dataset, fixture_checkpoint, tmp_path,
                            monkeypatch):
    repo = Path(__file__).resolve().parents[1]
    main_cfg = {
        "EXPS_PATH": str(tmp_path / "exps"),
        "INTERACTIVE_MODELS_PATH": str(tmp_path),
        "DATASETS": {"GRABCUT_PATH": str(fixture_dataset)},
        "UPSAMPLERS": {},
    }
    main_cfg_path = tmp_path / "main_cfg.yaml"
    main_cfg_path.write_text(yaml.safe_dump(main_cfg))

    monkeypatch.chdir(repo)
    monkeypatch.setattr(
        sys, "argv",
        [
            "evaluate.py",
            f"checkpoint={fixture_checkpoint}",
            "datasets=GrabCut",
            "eval_mode=fixed112",
            "n_clicks=2",
            "target_iou=0.9",
            "print_ious=false",
            "iou_analysis=false",
            # device_loop + vis_preds: must fall back to the host per-click
            # path (the compiled loop can't service visual callbacks)
            "device_loop=true",
            "vis_preds=true",
            f"main_cfg_path={main_cfg_path}",
            f"logs_path={tmp_path / 'logs'}",
        ],
    )
    # load OUR evaluate.py explicitly — `import evaluate` can resolve to the
    # reference tree when the oracle tests prepended it to sys.path
    import importlib.util

    spec = importlib.util.spec_from_file_location(
        "isegprobe_evaluate_cli", repo / "evaluate.py"
    )
    evaluate = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(evaluate)
    evaluate.main()

    results = (tmp_path / "logs" / "results.txt").read_text()
    assert "GrabCut" in results and "NoC@80%" in results
    # fallback really took the host path: vis images were written
    vis_files = list((tmp_path / "logs").rglob("*.jpg"))
    assert vis_files, "vis_preds fallback produced no visualization images"


def test_evaluate_main_device_loop(fixture_dataset, fixture_checkpoint,
                                   tmp_path, monkeypatch):
    """The device_loop=true fast path through the CLI."""
    repo = Path(__file__).resolve().parents[1]
    main_cfg = {
        "EXPS_PATH": str(tmp_path / "exps"),
        "INTERACTIVE_MODELS_PATH": str(tmp_path),
        "DATASETS": {"GRABCUT_PATH": str(fixture_dataset)},
        "UPSAMPLERS": {},
    }
    main_cfg_path = tmp_path / "main_cfg.yaml"
    main_cfg_path.write_text(yaml.safe_dump(main_cfg))

    monkeypatch.chdir(repo)
    monkeypatch.setattr(
        sys, "argv",
        [
            "evaluate.py",
            f"checkpoint={fixture_checkpoint}",
            "datasets=GrabCut",
            "eval_mode=fixed112",
            "n_clicks=2",
            "target_iou=0.9",
            "print_ious=false",
            "iou_analysis=false",
            "device_loop=true",
            # batched + mesh-sharded over the 8-device suite mesh: exercises
            # the evaluate.py device_mesh wiring end-to-end
            "device_batch=8",
            "device_mesh=true",
            f"main_cfg_path={main_cfg_path}",
            f"logs_path={tmp_path / 'logs_dev'}",
        ],
    )
    import importlib.util

    spec = importlib.util.spec_from_file_location(
        "isegprobe_evaluate_cli_dev", repo / "evaluate.py"
    )
    evaluate = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(evaluate)
    evaluate.main()
    results = (tmp_path / "logs_dev" / "results.txt").read_text()
    assert "GrabCut" in results


def test_evaluate_main_device_refill(fixture_dataset, fixture_checkpoint,
                                     tmp_path, monkeypatch):
    """device_refill=true (continuous batching) through the CLI."""
    repo = Path(__file__).resolve().parents[1]
    main_cfg = {
        "EXPS_PATH": str(tmp_path / "exps"),
        "INTERACTIVE_MODELS_PATH": str(tmp_path),
        "DATASETS": {"GRABCUT_PATH": str(fixture_dataset)},
        "UPSAMPLERS": {},
    }
    main_cfg_path = tmp_path / "main_cfg.yaml"
    main_cfg_path.write_text(yaml.safe_dump(main_cfg))

    monkeypatch.chdir(repo)
    monkeypatch.setattr(
        sys, "argv",
        [
            "evaluate.py",
            f"checkpoint={fixture_checkpoint}",
            "datasets=GrabCut",
            "eval_mode=fixed112",
            "n_clicks=2",
            "target_iou=0.9",
            "print_ious=false",
            "iou_analysis=false",
            "device_loop=true",
            "device_batch=2",
            "device_refill=true",
            f"main_cfg_path={main_cfg_path}",
            f"logs_path={tmp_path / 'logs_refill'}",
        ],
    )
    import importlib.util

    spec = importlib.util.spec_from_file_location(
        "isegprobe_evaluate_cli_refill", repo / "evaluate.py"
    )
    evaluate = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(evaluate)
    evaluate.main()
    results = (tmp_path / "logs_refill" / "results.txt").read_text()
    assert "GrabCut" in results


@pytest.mark.parametrize("variant", ["multidev"])
def test_evaluate_main_refill_variants(fixture_dataset, fixture_checkpoint,
                                       tmp_path, monkeypatch, variant):
    """The multi-device continuous-batching CLI route: device_refill=true +
    device_mesh=true (one on-device job queue per device, jobs dealt
    round-robin). The round-3 device_refill=host variant was deleted
    (0.98x lockstep, BENCH_r03) and now raises a pointer error."""
    repo = Path(__file__).resolve().parents[1]
    main_cfg = {
        "EXPS_PATH": str(tmp_path / "exps"),
        "INTERACTIVE_MODELS_PATH": str(tmp_path),
        "DATASETS": {"GRABCUT_PATH": str(fixture_dataset)},
        "UPSAMPLERS": {},
    }
    main_cfg_path = tmp_path / "main_cfg.yaml"
    main_cfg_path.write_text(yaml.safe_dump(main_cfg))

    extra = ["device_refill=true", "device_mesh=true"]
    monkeypatch.chdir(repo)
    monkeypatch.setattr(
        sys, "argv",
        [
            "evaluate.py",
            f"checkpoint={fixture_checkpoint}",
            "datasets=GrabCut",
            "eval_mode=fixed112",
            "n_clicks=2",
            "target_iou=0.9",
            "print_ious=false",
            "iou_analysis=false",
            "device_loop=true",
            "device_batch=2",
            *extra,
            f"main_cfg_path={main_cfg_path}",
            f"logs_path={tmp_path / 'logs_refill_v'}",
        ],
    )
    import importlib.util

    spec = importlib.util.spec_from_file_location(
        f"isegprobe_evaluate_cli_refill_{variant}", repo / "evaluate.py"
    )
    evaluate = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(evaluate)
    evaluate.main()
    results = (tmp_path / "logs_refill_v" / "results.txt").read_text()
    assert "GrabCut" in results


def test_evaluate_main_int8(fixture_dataset, fixture_checkpoint, tmp_path,
                            monkeypatch):
    """eval dtype=int8: the W8A8 serving mode drives the same compiled device
    loop end-to-end and emits a results table."""
    repo = Path(__file__).resolve().parents[1]
    main_cfg = {
        "EXPS_PATH": str(tmp_path / "exps"),
        "INTERACTIVE_MODELS_PATH": str(tmp_path),
        "DATASETS": {"GRABCUT_PATH": str(fixture_dataset)},
        "UPSAMPLERS": {},
    }
    main_cfg_path = tmp_path / "main_cfg.yaml"
    main_cfg_path.write_text(yaml.safe_dump(main_cfg))

    monkeypatch.chdir(repo)
    monkeypatch.setattr(
        sys, "argv",
        [
            "evaluate.py",
            f"checkpoint={fixture_checkpoint}",
            "datasets=GrabCut",
            "eval_mode=fixed112",
            "n_clicks=2",
            "target_iou=0.9",
            "print_ious=false",
            "iou_analysis=false",
            "device_loop=true",
            "dtype=int8",
            f"main_cfg_path={main_cfg_path}",
            f"logs_path={tmp_path / 'logs_int8'}",
        ],
    )
    import importlib.util

    spec = importlib.util.spec_from_file_location(
        "isegprobe_evaluate_cli_int8", repo / "evaluate.py"
    )
    evaluate = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(evaluate)

    # the pos-embed pre-interpolation rebuilds the model; it must carry the
    # non-serialized dtype/quant knobs (regression: the rebuild silently
    # reverted dtype=int8/bfloat16 eval to the f32 float path)
    import jax.numpy as jnp

    class _EC(dict):
        def get(self, k, d=None):
            return super().get(k, d)

    model, _ = evaluate.load_model_for_eval(
        str(fixture_checkpoint), _EC(dtype="int8"), target_size=(112, 112))
    assert model.quant == "int8" and model.dtype == jnp.bfloat16
    model, _ = evaluate.load_model_for_eval(
        str(fixture_checkpoint), _EC(dtype="bfloat16"), target_size=(112, 112))
    assert model.quant is None and model.dtype == jnp.bfloat16

    evaluate.main()
    results = (tmp_path / "logs_int8" / "results.txt").read_text()
    assert "GrabCut" in results and "NoC@80%" in results


def test_evaluate_loftup_mxu_pad_load_path(tmp_path):
    """load_model_for_eval must apply the MXU-padded LoftUp layout by default
    (eval_cfg.mxu_pad, VERDICT r4 #1) AFTER the unpadded PRNGKey(0)
    init+merge — so the deterministic init stream behind every committed NoC
    table is unchanged — and the padded model's forward must equal the
    unpadded one's."""
    import importlib.util

    import jax
    import numpy as np

    from isegprobe_tpu.models.probe_model import (
        filter_state_dict,
        iSegProbeModel,
    )
    from isegprobe_tpu.utils.serialization import model_config, save_checkpoint

    repo = Path(__file__).resolve().parents[1]
    spec = importlib.util.spec_from_file_location(
        "isegprobe_evaluate_cli_mxupad", repo / "evaluate.py")
    evaluate = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(evaluate)

    model = iSegProbeModel(
        backbone_cfg=dict(type="dinov2",
                          params=dict(feats_injection_mode="before_backbone")),
        embed_coords_cfg=dict(
            type="patchEmbed",
            params=dict(img_size=(112, 112), patch_size=(14, 14),
                        embed_dim=384)),
        head_cfg=dict(type="convhead",
                      params=dict(in_channels=384, num_layers=1,
                                  num_classes=1)),
        upsampler_cfg=dict(type="loftup",
                           params=dict(n_dim=384, attn_impl="jnp")),
        save_cfg=dict(embed_coords=True, backbone=False, upsampler=False,
                      head=True),
        use_disks=True, norm_radius=5, with_prev_mask=True, attn_impl="jnp",
    )
    image = np.zeros((1, 112, 112, 4), dtype=np.float32)
    points = np.full((1, 4, 3), -1.0, dtype=np.float32)
    params = model.init(jax.random.PRNGKey(0), image, points)["params"]
    ckpt = tmp_path / "loftup.ckpt"
    save_checkpoint(filter_state_dict(params, model.save_cfg),
                    model_config(model), ckpt)

    class _EC(dict):
        def get(self, k, d=None):
            return super().get(k, d)

    # forced-on padded load (f32 so the parity check below is tight)
    m_pad, p_pad = evaluate.load_model_for_eval(
        str(ckpt), _EC(mxu_pad=True), target_size=(112, 112))
    attn = p_pad["upsampler"]["ca_transformer"]["ca_0"]["attention"]
    assert np.asarray(attn["in_proj_weight"]).shape == (3 * 512, 512)
    assert m_pad.upsampler_cfg["params"]["mxu_pad"] is True

    # 'auto' default: OFF for f32 (the exact-parity dtype)...
    m_raw, p_raw = evaluate.load_model_for_eval(
        str(ckpt), _EC(), target_size=(112, 112))
    attn_raw = p_raw["upsampler"]["ca_transformer"]["ca_0"]["attention"]
    assert np.asarray(attn_raw["in_proj_weight"]).shape == (3 * 404, 404)

    # ...and ON for the bf16 serving dtype
    m_bf, p_bf = evaluate.load_model_for_eval(
        str(ckpt), _EC(dtype="bfloat16"), target_size=(112, 112))
    attn_bf = p_bf["upsampler"]["ca_transformer"]["ca_0"]["attention"]
    assert np.asarray(attn_bf["in_proj_weight"]).shape == (3 * 512, 512)

    rng = np.random.default_rng(3)
    img = rng.random((1, 112, 112, 4), dtype=np.float32)
    pts = np.full((1, 8, 3), -1.0, np.float32)
    pts[0, 0] = [60.0, 50.0, 0.0]
    want = m_raw.apply({"params": p_raw}, img, pts)["instances"]
    got = m_pad.apply({"params": p_pad}, img, pts)["instances"]
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=2e-4, atol=2e-4)


def test_config_overrides():
    from isegprobe_tpu.utils.config import EDict, apply_overrides

    cfg = EDict.convert({"a": {"b": 1}, "flag": True})
    apply_overrides(cfg, ["a.b=5", "flag=false", "new.key=[1,2]"])
    assert cfg.a.b == 5 and cfg.flag is False and cfg.new.key == [1, 2]


def test_init_experiment_resume_numeric_prefix(tmp_path, monkeypatch):
    """`training.resume_exp=000` YAML-parses to int 0 (falsy); the resume
    branch must still find run 000 and pick up its last checkpoint
    (regression: it silently created a fresh run with fresh weights)."""
    from isegprobe_tpu.utils.config import EDict
    from isegprobe_tpu.utils.exp import init_experiment

    monkeypatch.chdir(tmp_path)
    model_dir = tmp_path / "models" / "synthetic"
    model_dir.mkdir(parents=True)
    script = model_dir / "demo_model.py"
    script.write_text("main = None\n")

    run = tmp_path / "exps" / "synthetic" / "demo_model" / "000_first"
    (run / "checkpoints").mkdir(parents=True)
    ckpt = run / "checkpoints" / "last_checkpoint.ckpt"
    ckpt.write_bytes(b"x")

    cfg = EDict.convert({
        "exp": {"model_path": str(script), "name": "second"},
        "training": {"resume_exp": 0, "resume_prefix": "latest",
                     "weights": None},
        "EXPS_PATH": str(tmp_path / "exps"),
    })
    cfg = init_experiment(cfg)
    assert Path(cfg.EXP_PATH).name == "000_first"
    assert cfg.training.weights == str(ckpt)


def test_init_experiment_resume_false_means_fresh_run(tmp_path, monkeypatch):
    """`training.resume_exp=false` must start a fresh run — bool is an int
    subclass and would otherwise format to the \"000\" prefix and silently
    resume run 000."""
    from isegprobe_tpu.utils.config import EDict
    from isegprobe_tpu.utils.exp import init_experiment

    monkeypatch.chdir(tmp_path)
    model_dir = tmp_path / "models" / "synthetic"
    model_dir.mkdir(parents=True)
    script = model_dir / "demo_model.py"
    script.write_text("main = None\n")

    run = tmp_path / "exps" / "synthetic" / "demo_model" / "000_first"
    (run / "checkpoints").mkdir(parents=True)
    (run / "checkpoints" / "last_checkpoint.ckpt").write_bytes(b"x")

    cfg = EDict.convert({
        "exp": {"model_path": str(script), "name": "second"},
        "training": {"resume_exp": False, "resume_prefix": "latest",
                     "weights": None},
        "EXPS_PATH": str(tmp_path / "exps"),
    })
    cfg = init_experiment(cfg)
    assert Path(cfg.EXP_PATH).name == "001_second"
    assert cfg.training.weights is None


def test_config_override_scientific_notation_floats():
    """`lr=2e-4` must land as a float: YAML 1.1 requires a dot in float
    literals so safe_load returns the string "2e-4" (hydra parses it as a
    float; so do we). Non-numeric strings stay strings."""
    from isegprobe_tpu.utils.config import EDict, apply_overrides

    cfg = EDict.convert({"training_params": {"lr": 5e-5}})
    apply_overrides(cfg, ["training_params.lr=2e-4", "a=1.5e3", "b=2E-4",
                          "name=exp2e", "c=1.5", "d=7"])
    assert cfg.training_params.lr == 2e-4
    assert isinstance(cfg.training_params.lr, float)
    assert cfg.a == 1500.0 and cfg.b == 2e-4
    assert cfg.name == "exp2e" and cfg.c == 1.5 and cfg.d == 7


def test_init_experiment_resume_numeric_checkpoint_prefix(tmp_path,
                                                          monkeypatch):
    """`training.resume_prefix=008` YAML-parses to int 8; it must match the
    zero-padded checkpoint name 008.ckpt."""
    from isegprobe_tpu.utils.config import EDict
    from isegprobe_tpu.utils.exp import init_experiment

    monkeypatch.chdir(tmp_path)
    model_dir = tmp_path / "models" / "synthetic"
    model_dir.mkdir(parents=True)
    script = model_dir / "demo_model.py"
    script.write_text("main = None\n")

    run = tmp_path / "exps" / "synthetic" / "demo_model" / "000_first"
    (run / "checkpoints").mkdir(parents=True)
    (run / "checkpoints" / "008.ckpt").write_bytes(b"x")
    (run / "checkpoints" / "last_checkpoint.ckpt").write_bytes(b"y")

    cfg = EDict.convert({
        "exp": {"model_path": str(script), "name": "x"},
        "training": {"resume_exp": "000", "resume_prefix": 8,
                     "weights": None},
        "EXPS_PATH": str(tmp_path / "exps"),
    })
    cfg = init_experiment(cfg)
    assert cfg.training.weights == str(run / "checkpoints" / "008.ckpt")


def test_train_wires_n_devices_into_mesh(monkeypatch):
    """training.n_devices restricts the trainer's data-parallel mesh (it was
    a documented knob in train_cfg.yaml; the trainer otherwise meshes all
    visible devices)."""
    import types

    import models.common as common

    captured = {}

    class _FakeTrainer:
        def __init__(self, *a, **kw):
            captured["mesh"] = kw.get("mesh")

        def run(self, **kw):
            pass

    monkeypatch.setattr(common, "iSegTrainer", _FakeTrainer)
    monkeypatch.setattr(common, "get_loss_cfg", lambda cfg: {})
    monkeypatch.setattr(common, "get_optimizer_cfg",
                        lambda cfg: ("adam", {"lr": 1e-4}))
    monkeypatch.setattr(common, "get_lr_scheduler",
                        lambda cfg: {"milestones": [1]})

    from isegprobe_tpu.utils.config import EDict

    cfg = EDict.convert({
        "training": {"seed": 0, "n_devices": 2},
        "training_params": {"checkpoint_interval": [[0, 1]],
                            "num_max_points": 4, "epochs": 1,
                            "do_validation": False},
    })
    common.train(model=None, cfg=cfg, dataset_fn=lambda c: (None, None))
    assert captured["mesh"] is not None
    assert captured["mesh"].devices.size == 2

    cfg.training.n_devices = None
    common.train(model=None, cfg=cfg, dataset_fn=lambda c: (None, None))
    assert captured["mesh"] is None  # trainer default = all devices


def test_zoomin_params_rect_fixed_mode_and_trunk_cache_normalization(
        monkeypatch):
    """The documented 'fixed<h>,<w>' eval_mode must parse in BOTH protocol
    branches (the RITM branch used int(mode[5:]) and crashed on the comma),
    and trunk_cache must accept CLI booleans / reject typos instead of
    silently disabling the cache."""
    repo = Path(__file__).resolve().parents[1]
    monkeypatch.chdir(repo)
    import importlib.util

    spec = importlib.util.spec_from_file_location(
        "isegprobe_evaluate_cli_parse", repo / "evaluate.py")
    evaluate = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(evaluate)

    class _EC(dict):
        def __getattr__(self, k):
            return self[k]

    for ritm in (False, True):
        zp = evaluate.get_zoomin_params(
            _EC(eval_mode="fixed448,672", eval_ritm=ritm), "GrabCut")
        assert zp == {"skip_clicks": -1, "target_size": (448, 672)}

    norm = evaluate._normalize_trunk_cache
    assert norm(True) == "on" and norm(False) == "off"
    assert norm("Auto") == "auto" and norm("ON") == "on"
    with pytest.raises(ValueError, match="trunk_cache"):
        norm("cached")


def test_evaluate_eval_ritm_config_effects(fixture_checkpoint, monkeypatch):
    """eval_ritm=true mirrors the reference's consumption of the flag
    (reference evaluate.py:70-86): the RITM maps_transform conv is forced
    on at model build, pos-embed pre-interpolation is skipped, and cvpr
    mode gets the RITM adaptive-ZoomIn crop sizes. (As in the reference,
    the stride-2 RITM conv only composes with RITM-family architectures,
    none of which exist in the probing framework — docs/PARITY.md.)"""
    repo = Path(__file__).resolve().parents[1]
    monkeypatch.chdir(repo)
    import importlib.util

    spec = importlib.util.spec_from_file_location(
        "isegprobe_evaluate_cli_ritm", repo / "evaluate.py"
    )
    evaluate = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(evaluate)

    # model build: RITM mode forces the maps_transform conv on (flax init
    # runs a forward, so a full load additionally needs an embed_coords
    # config sized for the stride-2 coord map, e.g. patch 7 at 224 eval)
    from isegprobe_tpu.utils.serialization import (
        build_model,
        load_checkpoint,
    )

    _, config, _ = load_checkpoint(str(fixture_checkpoint))
    model = build_model(config, use_rgb_conv=True)
    assert model.use_rgb_conv

    # cvpr+ritm -> adaptive ZoomIn at the RITM crop size; fixed stays fixed
    class _EC(dict):
        def __getattr__(self, k):
            return self[k]

    # SCALAR targets: aspect-preserving adaptive crops (reference
    # utils.py:292-295 — round 4 fixed the (size, size) squaring delta)
    zp = evaluate.get_zoomin_params(
        _EC(eval_mode="cvpr", eval_ritm=True), "GrabCut")
    assert zp == {"skip_clicks": 1, "target_size": 400}
    zp = evaluate.get_zoomin_params(
        _EC(eval_mode="cvpr", eval_ritm=True), "DAVIS")
    assert zp == {"skip_clicks": 1, "target_size": 600}
    zp = evaluate.get_zoomin_params(
        _EC(eval_mode="fixed400", eval_ritm=True), "GrabCut")
    assert zp == {"skip_clicks": -1, "target_size": (400, 400)}


@pytest.mark.parametrize("refill", [False, True])
def test_evaluate_main_adaptive_cvpr_device(fixture_dataset, tmp_path,
                                            monkeypatch, tmp_path_factory,
                                            refill):
    """eval_ritm + eval_mode=cvpr + device_loop: the compiled adaptive
    (RITM) ZoomIn protocol through the CLI, with an RITM-style fixture
    (use_rgb_conv stride-2 maps_transform + patch-7 click embed so the
    half-res coordinate grid matches the backbone grid). The refill leg
    routes the same protocol through the windowed on-device job queue
    (device_refill=true + device_batch=2 — round-5 adaptive continuous
    batching)."""
    import jax

    from isegprobe_tpu.models.probe_model import (
        filter_state_dict,
        iSegProbeModel,
    )
    from isegprobe_tpu.utils.serialization import (
        model_config,
        save_checkpoint,
    )

    model = iSegProbeModel(
        backbone_cfg=dict(type="dinov2",
                          params=dict(feats_injection_mode="before_backbone")),
        embed_coords_cfg=dict(
            type="patchEmbed",
            params=dict(img_size=(112, 112), patch_size=(7, 7),
                        embed_dim=384)),
        head_cfg=dict(type="convhead",
                      params=dict(in_channels=384, num_layers=1,
                                  num_classes=1)),
        upsampler_cfg=dict(type="identity", params=dict()),
        save_cfg=dict(embed_coords=True, backbone=False, upsampler=False,
                      head=True),
        use_disks=True, norm_radius=5, with_prev_mask=True,
        use_rgb_conv=True, attn_impl="jnp",
    )
    image = np.zeros((1, 112, 112, 4), dtype=np.float32)
    points = np.full((1, 4, 3), -1.0, dtype=np.float32)
    params = model.init(jax.random.PRNGKey(0), image, points)["params"]
    ckpt = tmp_path_factory.mktemp("ritm_ckpt") / "ritm.ckpt"
    save_checkpoint(params, model_config(model), ckpt)

    repo = Path(__file__).resolve().parents[1]
    main_cfg = {
        "EXPS_PATH": str(tmp_path / "exps"),
        "INTERACTIVE_MODELS_PATH": str(tmp_path),
        "DATASETS": {"GRABCUT_PATH": str(fixture_dataset)},
        "UPSAMPLERS": {},
    }
    main_cfg_path = tmp_path / "main_cfg.yaml"
    main_cfg_path.write_text(yaml.safe_dump(main_cfg))

    monkeypatch.chdir(repo)
    monkeypatch.setattr(
        sys, "argv",
        [
            "evaluate.py",
            f"checkpoint={ckpt}",
            "datasets=GrabCut",
            "eval_mode=cvpr",
            "eval_ritm=true",
            "n_clicks=2",
            "target_iou=0.9",
            "print_ious=false",
            "iou_analysis=false",
            "device_loop=true",
            *(["device_batch=2", "device_refill=true"] if refill else []),
            f"main_cfg_path={main_cfg_path}",
            f"logs_path={tmp_path / 'logs_adaptive'}",
        ],
    )
    import importlib.util

    spec = importlib.util.spec_from_file_location(
        "isegprobe_evaluate_cli_adaptive", repo / "evaluate.py"
    )
    evaluate = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(evaluate)
    evaluate.main()
    results = (tmp_path / "logs_adaptive" / "results.txt").read_text()
    assert "GrabCut" in results
