"""Evaluation CLI (reference: evaluate.py:30-212).

Loops datasets × checkpoints, builds the TPU predictor with the fixed-ZoomIn
protocol, runs the NoC evaluation, prints/saves the results table.

Usage:
    python evaluate.py checkpoint=/path/to/ckpt datasets=GrabCut,Berkeley \
        eval_mode=fixed448 [key=value overrides...]
"""

import sys
from pathlib import Path

import numpy as np

from isegprobe_tpu.inference.evaluation import evaluate_dataset
from isegprobe_tpu.inference.metrics import (
    compute_noc_metric,
    get_results_table,
    get_time_metrics,
    miou_at_k,
)
from isegprobe_tpu.utils.config import load_config, load_yaml
from isegprobe_tpu.utils.log import logger
from isegprobe_tpu.utils.serialization import (
    build_model,
    load_checkpoint,
    merge_params,
)


def get_dataset(dataset_name: str, main_cfg):
    """(reference: core/inference/utils.py:86-104)"""
    from isegprobe_tpu.data.datasets import (
        BerkeleyDataset,
        DavisDataset,
        GrabCutDataset,
        PascalVocDataset,
        SBDEvaluationDataset,
    )

    paths = main_cfg.DATASETS
    if dataset_name == "GrabCut":
        return GrabCutDataset(paths.GRABCUT_PATH)
    if dataset_name == "Berkeley":
        return BerkeleyDataset(paths.BERKELEY_PATH)
    if dataset_name == "DAVIS":
        return DavisDataset(paths.DAVIS_PATH)
    if dataset_name == "SBD":
        return SBDEvaluationDataset(paths.SBD_PATH)
    if dataset_name == "SBD_Train":
        return SBDEvaluationDataset(paths.SBD_PATH, split="train")
    if dataset_name == "PascalVOC":
        return PascalVocDataset(paths.PASCALVOC_PATH, split="test")
    if dataset_name == "COCO_MVal":
        return DavisDataset(paths.COCO_MVAL_PATH)
    if dataset_name.startswith("Synthetic"):
        # "Synthetic[:<n_samples>[:<render_size>]]" — procedural scenes, no
        # files; render_size (default 224) rasterizes scenes at another
        # resolution (e.g. Synthetic:50:448 for content-scale diagnostics)
        from isegprobe_tpu.data.datasets import SyntheticShapesDataset

        parts = dataset_name.split(":")
        n = int(parts[1]) if len(parts) > 1 else 50
        size = int(parts[2]) if len(parts) > 2 else 224
        scale = (size * size) / (224 * 224)
        return SyntheticShapesDataset(n_samples=n, seed=2026,
                                      image_size=(size, size),
                                      min_instance_area=int(1400 * scale))
    raise NotImplementedError(f"Dataset key: {dataset_name} is not found.")


def _normalize_trunk_cache(value) -> str:
    """CLI booleans are natural here (`trunk_cache=true`); map them onto the
    three-valued knob and reject typos instead of silently disabling the
    cache (make_device_evaluator only matches 'on'/'auto'/'off')."""
    if isinstance(value, bool):
        return "on" if value else "off"
    mode = str(value).strip().lower()
    if mode not in ("on", "auto", "off"):
        raise ValueError(
            f"trunk_cache={value!r}: expected on/auto/off (or true/false)")
    return mode


def _parse_fixed_mode(eval_mode: str):
    """'fixed<n>' or 'fixed<h>,<w>' -> (h, w)."""
    crop = eval_mode.split(",")
    h = int(crop[0][5:])
    w = int(crop[1]) if len(crop) == 2 else h
    return h, w


def get_zoomin_params(eval_cfg, dataset_name):
    """(reference: core/inference/utils.py:292-320)"""
    if eval_cfg.get("eval_ritm", False):
        # RITM protocol: adaptive ZoomIn (reference skip_clicks default 1)
        # at the RITM SCALAR targets — aspect-preserving crops of
        # data-dependent size (reference utils.py:292-295; through round 3
        # this framework silently squared them to (size, size))
        if eval_cfg.eval_mode == "cvpr":
            size = 600 if dataset_name == "DAVIS" else 400
            return {"skip_clicks": 1, "target_size": size}
        if eval_cfg.eval_mode.startswith("fixed"):
            return {"skip_clicks": -1,
                    "target_size": _parse_fixed_mode(eval_cfg.eval_mode)}
        raise NotImplementedError(f"Unknown eval_mode: {eval_cfg.eval_mode}")
    if eval_cfg.eval_mode == "cvpr":
        return {
            "skip_clicks": -1,
            "target_size": (672, 672) if dataset_name == "DAVIS" else (448, 448),
        }
    if eval_cfg.eval_mode.startswith("fixed"):
        return {"skip_clicks": -1,
                "target_size": _parse_fixed_mode(eval_cfg.eval_mode)}
    raise NotImplementedError(f"Unknown eval_mode: {eval_cfg.eval_mode}")


def load_model_for_eval(checkpoint_path: str, eval_cfg, target_size=(448, 448)):
    import jax

    params, config, _ = load_checkpoint(checkpoint_path)
    # dtype=bfloat16 runs the compute path one-pass on the MXU (~1.6x faster
    # clicks); f32 stays the default for exact NoC parity (BASELINE.md)
    dtype_name = str(eval_cfg.get("dtype", "float32"))
    import jax.numpy as jnp

    # eval_ritm: RITM-protocol evaluation (reference evaluate.py:70-86 +
    # serialization.py:88-90) — force the RITM maps_transform conv on and
    # skip the SimpleClick-style pos-embed pre-interpolation
    eval_ritm = bool(eval_cfg.get("eval_ritm", False))
    overrides = {"use_rgb_conv": True} if eval_ritm else {}
    # eval_cfg.fuse_hr_head=true: run the seg head inside the LoftUp slab
    # loop (probe_model._fused_head — no-op for every other upsampler).
    # Exact (tests/test_upsamplers.py) but measured perf-NEUTRAL at 448²
    # batch 8 (the click is upsampler-compute-bound, not HBM-bound —
    # docs/PERF.md round-4 attribution), so it is opt-in, not the default.
    overrides["fuse_hr_head"] = bool(eval_cfg.get("fuse_hr_head", False))
    if dtype_name == "int8":
        # dynamic W8A8 backbone dense layers on the int8 MXU (ops/quant.py);
        # everything the int8 path does not cover runs bf16
        model = build_model(config, dtype=jnp.bfloat16, quant="int8",
                            **overrides)
    else:
        model = build_model(config, dtype=getattr(jnp, dtype_name),
                            **overrides)
    # fresh init (frozen/pretrained modules), overlaid with the checkpoint
    h, w = target_size
    n_ch = 4 if config["params"].get("with_prev_mask") else 3
    image = np.zeros((1, h, w, n_ch), dtype=np.float32)
    points = np.full((1, 40, 3), -1.0, dtype=np.float32)
    full = model.init(jax.random.PRNGKey(0), image, points)["params"]
    params = merge_params(full, params)
    # frozen-upsampler weights from the config's upsampler_path (the
    # reference loads these at model build: model_builder.py:59-76 ->
    # loftup/loftup.py:152-177 key surgery / LiFT.py:125-136) — checkpoints
    # exclude frozen modules via save_cfg, so eval must re-load them
    from isegprobe_tpu.models.convert import load_upsampler_params

    up_loaded = load_upsampler_params(config["params"].get("upsampler_cfg"))
    if up_loaded is not None:
        params = dict(params)
        params["upsampler"] = merge_params(params["upsampler"], up_loaded)
    # MXU-aligned LoftUp serving layout: zero-pad every stem/cross-attention
    # weight to lane multiples (cdim 404->512, head dim 101->128 — exact by
    # construction, models/convert.py:pad_loftup_params) after the UNPADDED
    # init+merge so the deterministic PRNGKey(0) init stream (and therefore
    # every committed NoC table) is unchanged. Default 'auto': on for the
    # bf16/int8 serving dtypes (measured 1.21x on the 448² upsampler leg,
    # docs/PERF.md round 5), off for f32 — padding is perf-neutral there
    # (0.98x) and f32 is the exact-NoC-parity dtype, so its bit stream stays
    # untouched. eval_cfg.mxu_pad=true/false forces either way.
    up_cfg = dict(config["params"].get("upsampler_cfg") or {})
    mxu_pad = eval_cfg.get("mxu_pad", "auto")
    if str(mxu_pad).lower() == "auto":
        mxu_pad = dtype_name in ("bfloat16", "int8")
    if up_cfg.get("type") == "loftup" and bool(mxu_pad):
        from isegprobe_tpu.models.convert import pad_loftup_params

        up_params = dict(up_cfg.get("params") or {})
        params = dict(params)
        params["upsampler"] = pad_loftup_params(
            params["upsampler"],
            n_dim=int(up_params.get("n_dim", 384)),
            n_freqs=int(up_params.get("n_freqs", 20)),
            heads=int(up_params.get("num_heads", 4)),
            num_layers=int(up_params.get("num_layers", 2)),
        )
        up_params["mxu_pad"] = True
        config = dict(config)
        config["params"] = dict(config["params"],
                                upsampler_cfg=dict(up_cfg, params=up_params))
        if dtype_name == "int8":
            model = build_model(config, dtype=jnp.bfloat16, quant="int8",
                                **overrides)
        else:
            model = build_model(config, dtype=getattr(jnp, dtype_name),
                                **overrides)
    if not eval_ritm:
        model, params = interpolate_backbone_pos_embed(model, params, config,
                                                       target_size)
    if dtype_name in ("bfloat16", "int8"):
        # halve the weight HBM traffic too — the dominant cost of a
        # latency-bound batch-2 forward (int8 quantizes on the fly from
        # these bf16 weights inside the matmul op)
        params = jax.tree.map(
            lambda x: x.astype(jnp.bfloat16)
            if hasattr(x, "dtype") and x.dtype == jnp.float32 else x,
            params,
        )
    return model, params


def interpolate_backbone_pos_embed(model, params, config, target_size):
    """Pre-interpolate the backbone positional embedding to the eval grid
    (reference: evaluate.py:83-86 + utils/pos_embed.py:110-150) and rebuild
    the model so the per-forward interpolation becomes a no-op."""
    from isegprobe_tpu.models.convert import interpolate_pos_embed_params
    from isegprobe_tpu.models.featurizers.dino import DINO_TRUNK
    from isegprobe_tpu.models.featurizers.dinov2 import DINOV2_ARCHS

    backbone_cfg = dict(config["params"]["backbone_cfg"])
    btype = backbone_cfg["type"].lower()
    bparams = dict(backbone_cfg.get("params") or {})
    if btype == "dinov2":
        arch = DINOV2_ARCHS[bparams.get("arch", "dinov2_vits14")]
        patch, old_grid = arch.patch_size, arch.pretrain_grid
    elif btype == "vit":
        patch = bparams.get("patch_size", 16)
        old_grid = DINO_TRUNK.pretrain_grid
    else:
        return model, params  # mask_clip interpolates per forward; simple_vit fixed

    new_grid = (target_size[0] // patch, target_size[1] // patch)
    if tuple(new_grid) == tuple(old_grid):
        return model, params
    params = dict(params)
    params["backbone"] = dict(params["backbone"])
    params["backbone"]["model"] = dict(params["backbone"]["model"])
    params["backbone"]["model"]["pos_embed"] = interpolate_pos_embed_params(
        params["backbone"]["model"]["pos_embed"], old_grid, new_grid
    )
    bparams["pretrain_grid"] = new_grid
    backbone_cfg["params"] = bparams
    new_config = dict(config)
    new_config["params"] = dict(config["params"], backbone_cfg=backbone_cfg)
    # carry the non-serialized compute knobs (model_config drops dtype, and
    # quant/fuse_hr_head were applied as build overrides) — without these the
    # rebuild silently reverted dtype/quant/fusion eval modes
    return build_model(new_config, dtype=model.dtype, quant=model.quant,
                       fuse_hr_head=model.fuse_hr_head), params


def main() -> None:
    from isegprobe_tpu.parallel.mesh import maybe_init_distributed
    from isegprobe_tpu.utils.misc import enable_compile_cache

    overrides = [a for a in sys.argv[1:] if "=" in a]
    eval_cfg = load_config("configs/eval_cfg.yaml", overrides)
    if eval_cfg.get("cpu", False):
        # force the CPU backend (the reference's `cpu: true` torch-device
        # knob, eval_cfg.yaml:10) — must run before any device use
        import jax

        jax.config.update("jax_platforms", "cpu")
    maybe_init_distributed()
    enable_compile_cache()

    main_cfg = load_yaml(eval_cfg.main_cfg_path)

    if (eval_cfg.iou_analysis or eval_cfg.print_ious) and eval_cfg.min_n_clicks <= 1:
        eval_cfg.target_iou = 1.01
    else:
        eval_cfg.target_iou = max(0.8, eval_cfg.target_iou)

    logs_path = Path(eval_cfg.logs_path or
                     Path(main_cfg.EXPS_PATH) / "evaluation_logs")
    logs_path.mkdir(parents=True, exist_ok=True)

    # all reference experiments use NoBRS; f-BRS / input-BRS are available via
    # isegprobe_tpu.inference.brs.get_predictor (mode=f-BRS-A/B/C, RGB-BRS,
    # DistMap-BRS)

    from isegprobe_tpu.inference.eval_utils import (
        get_checkpoints_list,
        get_prediction_vis_callback,
        get_save_feats_callback,
        save_iou_analysis_data,
    )

    checkpoints_list = get_checkpoints_list(eval_cfg, main_cfg.EXPS_PATH)

    print_header = True
    for dataset_name in eval_cfg.datasets.split(","):
        dataset = get_dataset(dataset_name, main_cfg)
        zoomin_params = get_zoomin_params(eval_cfg, dataset_name)

        for checkpoint_path in checkpoints_list:
            _ts = zoomin_params["target_size"]
            model, params = load_model_for_eval(
                checkpoint_path, eval_cfg,
                target_size=(_ts, _ts) if isinstance(_ts, int) else _ts)
            from isegprobe_tpu.inference.brs import get_predictor

            predictor = get_predictor(
                model,
                params,
                brs_mode=eval_cfg.mode,
                prob_thresh=eval_cfg.thresh,
                with_flip=True,
                zoom_in_params=zoomin_params,
                predictor_params={
                    "net_clicks_limit": eval_cfg.clicks_limit or eval_cfg.n_clicks
                },
            )

            vis_callback = (
                get_prediction_vis_callback(logs_path, dataset_name,
                                            eval_cfg.thresh)
                if eval_cfg.vis_preds else None
            )
            feats_callback = (
                get_save_feats_callback(
                    logs_path, dataset_name, eval_cfg.save_feats_folder_name,
                    eval_cfg.save_feats_for_n_imgs,
                )
                if eval_cfg.save_feats else None
            )

            profile_dir = eval_cfg.get("profile_dir", "")
            if profile_dir:
                import jax

                jax.profiler.start_trace(profile_dir)
            latencies: list = []
            sample_times: list = []
            use_device_loop = (
                eval_cfg.get("device_loop", False) and eval_cfg.mode == "NoBRS"
            )
            # RITM adaptive mode: skip_clicks >= 0 with a SCALAR target —
            # compiled by the adaptive canvas evaluator (round 4; before
            # that the device loop only modeled the fixed-crop ZoomIn)
            adaptive_device = (
                use_device_loop
                and zoomin_params.get("skip_clicks", -1) >= 0
                and isinstance(zoomin_params["target_size"], int)
            )
            if (use_device_loop and not adaptive_device
                    and zoomin_params.get("skip_clicks", -1) >= 0):
                logger.info(
                    "skip_clicks>=0 with a fixed target: falling back from "
                    "device_loop to the host per-click path"
                )
                use_device_loop = False
            if use_device_loop and (vis_callback or feats_callback):
                # per-click probability maps never reach the host inside the
                # compiled loop — visual callbacks need the host protocol
                logger.info(
                    "vis_preds/save_feats requested: falling back from "
                    "device_loop to the host per-click path for callbacks"
                )
                use_device_loop = False
            if use_device_loop:
                # fast path: the whole ≤n_clicks protocol as one compiled
                # program per sample — or per BATCH of same-size samples
                # (protocol parity: tests/test_device_eval.py)
                from time import time as _time

                from isegprobe_tpu.inference.device_eval import (
                    evaluate_dataset_device,
                    make_device_evaluator,
                )

                device_batch = int(eval_cfg.get("device_batch", 1))
                # device_refill: false | true/'device' (continuous batching:
                # on-device job queue, one dispatch per same-shape group) —
                # identical results to lockstep, higher trained-workload
                # throughput. The round-3 'host' chunked-refill variant was
                # removed: it measured 0.98x lockstep (BENCH_r03).
                refill_raw = eval_cfg.get("device_refill", False)
                if isinstance(refill_raw, str):
                    refill_raw = refill_raw.lower()
                    if refill_raw in ("false", "true", "0", "1"):
                        refill_raw = refill_raw in ("true", "1")
                    elif refill_raw == "host":
                        raise ValueError(
                            "device_refill=host was removed (it measured "
                            "0.98x lockstep, BENCH_r03); use "
                            "device_refill=true (on-device job queue)")
                    elif refill_raw != "device":
                        raise ValueError(
                            f"device_refill={refill_raw!r} not recognized; "
                            "use false or true/'device' (on-device job "
                            "queue)")
                device_refill = (
                    "device" if refill_raw in (True, "device") else False)
                if device_refill and device_batch <= 1:
                    logger.warning(
                        "device_refill ignored: continuous batching "
                        f"needs device_batch>1 (got {device_batch})")
                    device_refill = False
                refill_devices = None
                if device_refill and eval_cfg.get("device_mesh", False):
                    # the on-device job queue composes with multiple chips
                    # the embarrassingly-parallel way: one queue program per
                    # device, params replicated, zero cross-chip sync (no
                    # Mesh object involved). With a single visible device,
                    # skip the explicit placement entirely (committed-device
                    # dispatch is pure overhead there, and the
                    # tunnel-attached backend mishandles it)
                    import jax

                    refill_devices = jax.devices()
                    if len(refill_devices) <= 1:
                        logger.warning(
                            "device_mesh=true with device_refill: only "
                            "one device visible - running the "
                            "single-device job queue")
                        refill_devices = None
                mesh = None
                if eval_cfg.get("device_mesh", False) and not device_refill:
                    # shard the sample axis over every chip (data axis);
                    # lanes are independent, so eval scales like DP training
                    import jax

                    n_dev = len(jax.devices())
                    if device_batch <= 1:
                        logger.warning(
                            "device_mesh=true ignored: needs device_batch>1 "
                            f"(got {device_batch}) to have a sample axis to "
                            "shard")
                    elif n_dev <= 1:
                        logger.warning(
                            "device_mesh=true ignored: only one device "
                            "visible — running single-chip")
                    elif device_batch % n_dev:
                        raise ValueError(
                            f"device_batch={device_batch} must be divisible "
                            f"by the number of devices ({n_dev}) to shard the "
                            "sample axis; pick e.g. "
                            f"device_batch={-(-device_batch // n_dev) * n_dev}"
                        )
                    else:
                        from isegprobe_tpu.parallel.mesh import make_mesh

                        mesh = make_mesh()
                if adaptive_device:
                    if mesh is not None:
                        logger.warning(
                            "adaptive (RITM cvpr) device eval is "
                            "single-chip; ignoring device_mesh")
                        mesh = None
                    from isegprobe_tpu.inference.adaptive_eval import (
                        make_adaptive_group_runner,
                        make_adaptive_runner,
                    )

                    adaptive_kw = dict(
                        target_size=zoomin_params["target_size"],
                        batch_size=device_batch,
                        max_clicks=eval_cfg.n_clicks,
                        net_clicks_limit=(eval_cfg.clicks_limit
                                          or eval_cfg.n_clicks),
                        pred_thr=eval_cfg.thresh,
                        target_iou=eval_cfg.target_iou,
                        min_clicks=eval_cfg.min_n_clicks,
                        with_flip=True,
                        skip_clicks=zoomin_params["skip_clicks"],
                    )
                    # device_refill composes with the adaptive protocol
                    # through the shared windowed job queue (round 5)
                    if device_refill == "device":
                        run = make_adaptive_group_runner(model, **adaptive_kw)
                    else:
                        run = make_adaptive_runner(model, **adaptive_kw)
                else:
                    run = make_device_evaluator(
                        model, target_size=zoomin_params["target_size"],
                        max_clicks=eval_cfg.n_clicks,
                        net_clicks_limit=(eval_cfg.clicks_limit
                                          or eval_cfg.n_clicks),
                        pred_thr=eval_cfg.thresh,
                        target_iou=eval_cfg.target_iou,
                        min_clicks=eval_cfg.min_n_clicks,
                        with_flip=True, batch_size=device_batch, mesh=mesh,
                        trunk_cache=_normalize_trunk_cache(
                            eval_cfg.get("trunk_cache", "auto")),
                        group_api=device_refill == "device",
                    )
                t0 = _time()
                if device_refill == "device":
                    from isegprobe_tpu.inference.device_eval import (
                        evaluate_dataset_group,
                    )

                    refill_stats: dict = {}
                    all_ious = evaluate_dataset_group(
                        run, params, dataset, sample_times=sample_times,
                        stats=refill_stats, devices=refill_devices,
                        # staging-window size (frames resident per compiled
                        # program; lane state carries across windows so
                        # switches cost a dispatch, not a drain — round 5);
                        # 0 = default 32. Bounds staged-frame HBM by
                        # construction (the full-78-frame LoftUp staging
                        # faulted the worker, scripts/repro_group_fault.py)
                        max_jobs_per_dispatch=int(
                            eval_cfg.get("group_max_jobs", 0)),
                    )
                    logger.info(f"group-eval stats: {refill_stats}")
                else:
                    all_ious = evaluate_dataset_device(
                        run, params, dataset, batch_size=device_batch,
                        sample_times=sample_times,
                    )
                elapsed = _time() - t0
            else:
                all_ious, elapsed = evaluate_dataset(
                    dataset,
                    predictor,
                    latencies=latencies,
                    max_iou_thr=eval_cfg.target_iou,
                    pred_thr=eval_cfg.thresh,
                    min_clicks=eval_cfg.min_n_clicks,
                    max_clicks=eval_cfg.n_clicks,
                    callback=vis_callback,
                    feats_callback=feats_callback,
                )
            if profile_dir:
                jax.profiler.stop_trace()

            model_name = eval_cfg.model_name or Path(checkpoint_path).stem
            if eval_cfg.iou_analysis or eval_cfg.save_ious:
                save_iou_analysis_data(
                    logs_path, dataset_name, model_name, all_ious,
                    n_clicks=eval_cfg.n_clicks, mode=eval_cfg.mode,
                )

            noc, noc_std, over_max = compute_noc_metric(
                all_ious, iou_thrs=[0.8, 0.85, 0.9], max_clicks=eval_cfg.n_clicks
            )
            spc, spi = get_time_metrics(all_ious, elapsed)
            table = get_results_table(
                noc, over_max, eval_cfg.mode, dataset_name, spc, elapsed,
                n_clicks=eval_cfg.n_clicks,
                model_name=model_name,
                print_header=print_header,
            )
            print(table)
            miou = miou_at_k(all_ious, eval_cfg.n_clicks)
            if eval_cfg.print_ious:
                print("mIoU@k:", " ".join(f"{v:.3f}" for v in miou))
            from isegprobe_tpu.inference.eval_utils import log_eval_to_wandb

            log_eval_to_wandb(eval_cfg, dataset_name, model_name, noc,
                              over_max, list(map(float, miou)), spc, elapsed)
            if latencies:
                from isegprobe_tpu.inference.evaluation import latency_percentiles

                print("per-click latency:", latency_percentiles(latencies))
            if sample_times:
                from isegprobe_tpu.inference.evaluation import latency_percentiles

                n_clicks_total = sum(len(a) for a in all_ious)
                print("per-sample wall:", latency_percentiles(sample_times))
                print(f"throughput: {n_clicks_total / elapsed:.1f} clicks/s "
                      f"({len(all_ious) / elapsed:.2f} samples/s)")
            with open(logs_path / "results.txt", "a") as f:
                f.write(table + "\n")
            print_header = False


if __name__ == "__main__":
    main()
