"""Evaluation-side utilities: visualization/feature callbacks, IoU-analysis
pickles, checkpoint discovery (reference: core/inference/utils.py:323-627)."""

from __future__ import annotations

import json
import pickle
from datetime import datetime
from pathlib import Path
from typing import Callable, List, Optional

import cv2
import numpy as np

from isegprobe_tpu.inference.evaluation import get_iou
from isegprobe_tpu.utils.viz import draw_points, draw_with_blend_and_clicks


def get_prediction_vis_callback(logs_path, dataset_name: str,
                                prob_thresh: float) -> Callable:
    """Save per-click prediction visualizations + IoU jsons
    (reference: utils.py:546-584)."""
    logs_path = Path(logs_path)
    save_path = logs_path / "predictions_vis" / dataset_name
    iou_save_path = save_path / "iou"
    save_path.mkdir(parents=True, exist_ok=True)
    iou_save_path.mkdir(parents=True, exist_ok=True)

    # evaluate_dataset passes the IMAGE index as sample_id for every object
    # of a multi-object sample (reference parity, evaluation.py:22-40) — the
    # reference callback overwrites earlier objects' files; here objects
    # after the first get an `_objN` filename suffix instead
    obj_counts: dict = {}

    def callback(image, gt_mask, pred_probs, sample_id, click_indx, clicks_list):
        if click_indx == 0:
            obj_counts[sample_id] = obj_counts.get(sample_id, -1) + 1
        n = obj_counts.get(sample_id, 0)
        tag = f"{sample_id}" if n == 0 else f"{sample_id}_obj{n}"
        pred_mask = pred_probs > prob_thresh
        image_with_mask = draw_with_blend_and_clicks(
            image, pred_mask, alpha=0.5, clicks_list=clicks_list
        )
        iou = get_iou(gt_mask, pred_mask) * 100
        with open(iou_save_path / f"{tag}_{click_indx}.json", "w") as f:
            json.dump({"iou": float(iou)}, f)
        cv2.imwrite(str(save_path / f"{tag}_{click_indx}.jpg"),
                    image_with_mask[:, :, ::-1])
        if click_indx == 0:
            cv2.imwrite(str(save_path / f"{tag}_gt.jpg"),
                        gt_mask.astype(np.uint8) * 255)

    return callback


def get_save_feats_callback(logs_path, dataset_name: str, save_folder_name: str,
                            exec_for_n_imgs: int = 10) -> Callable:
    """Dump raw low/high-res features (as .npy) + click images for offline PCA
    plots (reference: utils.py:587-627; torch .pth becomes numpy .npy)."""
    logs_path = Path(logs_path)
    current_time = datetime.now().strftime("%Y-%m-%d_%H:%M")
    save_path = (logs_path / "feats" / dataset_name /
                 f"{save_folder_name}_{current_time}")
    save_imgs_path = save_path / "images"
    save_path.mkdir(parents=True, exist_ok=True)
    save_imgs_path.mkdir(parents=True, exist_ok=True)

    def callback(image, feats, sample_id, click_indx, clicks_list):
        if sample_id >= exec_for_n_imgs or click_indx >= 1:
            return
        for k, v in feats.items():
            np.save(str(save_path / f"{sample_id}_{click_indx}_{k}.npy"),
                    np.asarray(v))
        if isinstance(image, dict):
            image = image["image"]
        image = cv2.cvtColor(image, cv2.COLOR_RGB2BGR)
        if clicks_list:
            pos = [c.coords for c in clicks_list if c.is_positive]
            neg = [c.coords for c in clicks_list if not c.is_positive]
            image = draw_points(image, pos, color=(0, 255, 0), radius=6)
            image = draw_points(image, neg, color=(255, 0, 0), radius=6)
        cv2.imwrite(str(save_imgs_path / f"{sample_id}_{click_indx}_image.jpg"),
                    image)

    return callback


def save_iou_analysis_data(logs_path, dataset_name: str, model_name: str,
                           all_ious: List[np.ndarray], n_clicks: int = 20,
                           mode: str = "NoBRS") -> None:
    """Pickle with per-sample IoU trajectories for offline analysis
    (reference: utils.py:508-543)."""
    logs_path = Path(logs_path)
    logs_path.mkdir(parents=True, exist_ok=True)
    name_prefix = f"{dataset_name}_{mode}_{n_clicks}"
    with open(logs_path / f"{name_prefix}_{model_name}.pickle", "wb") as f:
        pickle.dump({
            "dataset_name": dataset_name,
            "model_name": f"{model_name}_{mode}",
            "all_ious": all_ious,
        }, f)


def find_checkpoint(weights_folder, checkpoint_name: str) -> str:
    """(reference: utils.py:149-171)"""
    weights_folder = Path(weights_folder)
    if ":" in checkpoint_name:
        model_name, checkpoint_name = checkpoint_name.split(":")
        models_candidates = [
            x for x in weights_folder.glob(f"{model_name}*") if x.is_dir()
        ]
        assert len(models_candidates) == 1
        weights_folder = models_candidates[0]

    if checkpoint_name.endswith(".ckpt") or checkpoint_name.endswith(".pth"):
        if Path(checkpoint_name).exists():
            return checkpoint_name
        checkpoint_path = weights_folder / checkpoint_name
    else:
        candidates = list(weights_folder.rglob(f"{checkpoint_name}*.ckpt")) + list(
            weights_folder.rglob(f"{checkpoint_name}*.pth")
        )
        assert len(candidates) == 1, (
            f"ambiguous or missing checkpoint '{checkpoint_name}' "
            f"under {weights_folder}: {candidates}"
        )
        checkpoint_path = candidates[0]
    return str(checkpoint_path)


def get_checkpoints_list(eval_cfg, exps_path) -> List[str]:
    """Enumerate checkpoints of an experiment directory
    (reference: utils.py:323-362)."""
    exps_path = Path(exps_path)
    if eval_cfg.exp_path:
        rel_exp_path = eval_cfg.exp_path
        prefix = ""
        if ":" in rel_exp_path:
            rel_exp_path, prefix = rel_exp_path.split(":")
        exp_path_prefix = exps_path / rel_exp_path
        candidates = sorted(exp_path_prefix.parent.glob(
            exp_path_prefix.name + "*"
        ))
        assert len(candidates) == 1, "Invalid experiment path."
        exp_path = candidates[0]
        checkpoints = sorted((exp_path / "checkpoints").glob(f"{prefix}*.ckpt"))
        assert checkpoints, f"No checkpoints under {exp_path}"
        return [str(c) for c in checkpoints]
    return [eval_cfg.checkpoint]


def log_eval_to_wandb(eval_cfg, dataset_name: str, model_name: str,
                      noc: List[float], over_max: List[int],
                      miou: List[float], spc: float, elapsed: float) -> bool:
    """Push one dataset x checkpoint eval result to Weights & Biases: the
    summary dict plus mIoU-vs-clicks and NoC-vs-IoU line plots
    (reference: evaluate.py:149-205). No-ops (returns False) when the wandb
    package is absent or logging is disabled."""
    if not getattr(eval_cfg, "wandb", False):
        return False
    try:
        import wandb
    except ImportError:
        return False

    run_name = (getattr(eval_cfg, "wandb_name", None)
                or f"{model_name}__{dataset_name}__{eval_cfg.mode}")
    wandb.init(
        project=getattr(eval_cfg, "wandb_project", "iSegProbe-Eval"),
        name=run_name,
        config={**{k: v for k, v in dict(eval_cfg).items()
                   if isinstance(v, (int, float, bool, str, type(None)))},
                "dataset": dataset_name, "model": model_name},
        dir=getattr(eval_cfg, "wandb_dir", None) or None,
    )
    summary = {"dataset": dataset_name, "model": model_name,
               "SPC": spc, "time_s": elapsed}
    for thr, value, over in zip((80, 85, 90), noc, over_max):
        summary[f"NoC@{thr}%"] = value
        summary[f">={eval_cfg.n_clicks}@{thr}%"] = over
    if miou:
        summary["IoU@1"] = miou[0]
    wandb.log(summary)

    miou_table = wandb.Table(columns=["k (Clicks)", "mIoU@k"])
    for k, v in enumerate(miou, start=1):
        miou_table.add_data(int(k), float(v))
    wandb.log({"mIoU_vs_Clicks": wandb.plot.line(
        miou_table, "k (Clicks)", "mIoU@k", title="mIoU Given k Clicks")})

    noc_table = wandb.Table(columns=["X (IoU, %)", "NoC@X"])
    for thr, value in zip((80, 85, 90), noc):
        noc_table.add_data(int(thr), float(value))
    wandb.log({"NoC_vs_IoU": wandb.plot.line(
        noc_table, "X (IoU, %)", "NoC@X",
        title="Number of Clicks to Reach X% IoU")})
    wandb.finish()
    return True
