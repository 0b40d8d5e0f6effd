"""Default experiment building blocks (reference: models/defaults.py:21-114)."""

from typing import Dict, Tuple

from isegprobe_tpu.data import transforms as T
from isegprobe_tpu.data.datasets import SBDDataset
from isegprobe_tpu.data.points_sampler import MultiPointSampler
from isegprobe_tpu.training.losses import NormalizedFocalLossSigmoid
from isegprobe_tpu.utils.config import EDict


def get_loss_cfg(cfg) -> EDict:
    loss_cfg = EDict()
    loss_cfg.instance_loss = NormalizedFocalLossSigmoid(alpha=0.5, gamma=2)
    loss_cfg.instance_loss_weight = 1.0
    return loss_cfg


def get_sbd_train_val_datasets(cfg) -> Tuple:
    cfg.dataloader.batch_size = (
        32 if cfg.dataloader.batch_size < 1 else cfg.dataloader.batch_size
    )
    cfg.dataloader.val_batch_size = cfg.dataloader.batch_size
    crop_size = cfg.training_params.crop_size

    train_augmentator = T.Compose([
        T.UniformRandomResize(scale_range=(0.75, 1.25)),
        T.Flip(),
        T.RandomRotate90(),
        T.ShiftScaleRotate(shift_limit=0.03, scale_limit=0,
                           rotate_limit=(-3, 3), p=0.75),
        T.PadIfNeeded(min_height=crop_size[0], min_width=crop_size[1]),
        T.RandomCrop(*crop_size),
        T.RandomBrightnessContrast(brightness_limit=(-0.25, 0.25),
                                   contrast_limit=(-0.15, 0.4), p=0.75),
        T.RGBShift(r_shift_limit=10, g_shift_limit=10, b_shift_limit=10, p=0.75),
    ], p=1.0)

    val_augmentator = T.Compose([
        T.UniformRandomResize(scale_range=(0.75, 1.25)),
        T.PadIfNeeded(min_height=crop_size[0], min_width=crop_size[1]),
        T.RandomCrop(*crop_size),
    ], p=1.0)

    points_sampler = MultiPointSampler(
        cfg.training_params.num_max_points,
        prob_gamma=0.80,
        merge_objects_prob=0.15,
        max_num_merged_objects=2,
    )

    sbd_samples_weights = "./assets/sbd_samples_weights.pkl"
    from pathlib import Path

    trainset = SBDDataset(
        cfg.DATASETS.SBD_PATH,
        split="train",
        augmentator=train_augmentator,
        min_object_area=80,
        keep_background_prob=0.01,
        points_sampler=points_sampler,
        samples_scores_path=(
            sbd_samples_weights if Path(sbd_samples_weights).exists() else None
        ),
        samples_scores_gamma=1.25,
    )
    valset = SBDDataset(
        cfg.DATASETS.SBD_PATH,
        split="val",
        augmentator=val_augmentator,
        min_object_area=80,
        points_sampler=points_sampler,
        epoch_len=500,
    )
    return trainset, valset


def get_synthetic_train_val_datasets(cfg) -> Tuple:
    """Procedural shapes (no files / egress) for the end-to-end learning
    demonstration — same augmentation + click-synthesis pipeline as SBD."""
    from isegprobe_tpu.data.datasets import SyntheticShapesDataset

    cfg.dataloader.batch_size = (
        16 if cfg.dataloader.batch_size < 1 else cfg.dataloader.batch_size
    )
    cfg.dataloader.val_batch_size = cfg.dataloader.batch_size
    crop_size = cfg.training_params.crop_size

    # Two optional knobs for eval-statistics matching at high-res crops
    # (the fixed-448 ZoomIn protocol shows the model 2-4.5x UPSCALED content
    # from the 224-rendered eval scenes — guidance-conditioned upsamplers
    # like random-init LoftUp are sensitive to that content scale):
    #   * render_size: scene raster size (default: follow crop_size);
    #   * aug_scale_range: UniformRandomResize range (default 0.75-1.25).
    render_size = tuple(
        getattr(cfg.training_params, "render_size", None) or crop_size)
    scale_range = tuple(
        getattr(cfg.training_params, "aug_scale_range", None) or (0.75, 1.25))

    train_augmentator = T.Compose([
        T.UniformRandomResize(scale_range=scale_range),
        T.Flip(),
        T.RandomRotate90(),
        T.PadIfNeeded(min_height=crop_size[0], min_width=crop_size[1]),
        T.RandomCrop(*crop_size),
        T.RandomBrightnessContrast(brightness_limit=(-0.2, 0.2),
                                   contrast_limit=(-0.1, 0.3), p=0.5),
    ], p=1.0)
    val_augmentator = T.Compose([
        T.PadIfNeeded(min_height=crop_size[0], min_width=crop_size[1]),
        T.RandomCrop(*crop_size),
    ], p=1.0)

    points_sampler = MultiPointSampler(
        cfg.training_params.num_max_points,
        prob_gamma=0.80,
        merge_objects_prob=0.15,
        max_num_merged_objects=2,
    )

    # Render scenes at render_size (defaults to the training resolution):
    # coordinate-based upsamplers (LoftUp) are grid-specific, so a 448
    # crop_size must see genuine 448-grid inputs — either native 448 renders
    # or (render_size=[224,224] + aug_scale_range=[2,4.5]) upscaled 224
    # renders matching the fixed-448 ZoomIn eval statistics. Object-area
    # thresholds scale with the scene area to keep the instance-size
    # distribution equivalent.
    area_scale = (render_size[0] * render_size[1]) / (224 * 224)
    trainset = SyntheticShapesDataset(
        n_samples=320,
        seed=17,
        image_size=render_size,
        augmentator=train_augmentator,
        min_object_area=int(80 * area_scale),
        keep_background_prob=0.01,
        points_sampler=points_sampler,
        epoch_len=320,
    )
    valset = SyntheticShapesDataset(
        n_samples=48,
        seed=999,
        image_size=render_size,
        augmentator=val_augmentator,
        min_object_area=int(80 * area_scale),
        points_sampler=points_sampler,
        epoch_len=48,
    )
    return trainset, valset


def get_optimizer_cfg(cfg) -> Tuple[str, Dict]:
    lr = float(getattr(cfg.training_params, "lr", 5e-5))
    return "adam", {"lr": lr, "betas": (0.9, 0.999), "eps": 1e-8}


def get_lr_scheduler(cfg) -> Dict:
    return {"milestones": cfg.training_params.lr_milestones, "gamma": 0.1}
