"""Shared plumbing for experiment model scripts (the reference repeats this
per script, e.g. models/sbd/dinov2/patch-embed_noup.py:85-150)."""

from isegprobe_tpu.models.probe_model import iSegProbeModel
from isegprobe_tpu.training.metrics import AdaptiveIoU
from isegprobe_tpu.training.trainer import iSegTrainer
from isegprobe_tpu.utils.misc import seed_all
from models.defaults import (
    get_loss_cfg,
    get_lr_scheduler,
    get_optimizer_cfg,
    get_sbd_train_val_datasets,
)


def init_model_from_modules_cfg(modules_cfg, cfg, **model_kwargs) -> iSegProbeModel:
    """(reference: models/sbd/dinov2/patch-embed_noup.py:85-106)"""
    defaults = dict(use_disks=True, norm_radius=5, with_prev_mask=True)
    defaults.update(model_kwargs)
    # training_params.dtype=bfloat16: mixed-precision training — flax modules
    # compute in bf16 while param_dtype stays f32 (master weights, f32 Adam
    # moments); the trainer upcasts logits to f32 before the loss. Checkpoints
    # are unchanged (f32 params; dtype is not serialized into the config).
    train_dtype = str((cfg.get("training_params") or {}).get("dtype",
                                                             "float32"))
    if "dtype" in model_kwargs:
        pass  # an explicit model_kwargs dtype always wins over the config knob
    elif train_dtype in ("bfloat16", "bf16"):
        import jax.numpy as jnp

        defaults["dtype"] = jnp.bfloat16
    elif train_dtype not in ("float32", "f32"):
        raise ValueError(f"training_params.dtype={train_dtype!r}: expected "
                         "float32 or bfloat16")
    # training_params.remat_backbone=true: recompute backbone blocks in the
    # backward pass — the memory lever for high-res (448²) training. Plumbed
    # centrally so every experiment script gets it; only the ViT-family
    # featurizers take the knob (maskclip/simple_vit keep their own memory
    # profile).
    backbone_cfg = modules_cfg["backbone"]
    if (cfg.get("training_params") or {}).get("remat_backbone", False) \
            and backbone_cfg.get("type") in ("dinov2", "vit"):
        backbone_cfg = dict(backbone_cfg)
        backbone_cfg["params"] = dict(backbone_cfg.get("params") or {},
                                      remat_blocks=True)
    return iSegProbeModel(
        backbone_cfg=backbone_cfg,
        head_cfg=modules_cfg["head"],
        embed_coords_cfg=modules_cfg["embed_coords"],
        neck_cfg=modules_cfg["neck"],
        upsampler_cfg=modules_cfg["upsampler"],
        save_cfg=modules_cfg["save"],
        architecture=modules_cfg["architecture"],
        **defaults,
    )


def train(model, cfg, dataset_fn=get_sbd_train_val_datasets) -> None:
    """(reference: models/sbd/dinov2/patch-embed_noup.py:109-142)"""
    loss_cfg = get_loss_cfg(cfg)
    trainset, valset = dataset_fn(cfg)
    optimizer_name, optimizer_params = get_optimizer_cfg(cfg)
    lr_scheduler = get_lr_scheduler(cfg)

    # training.n_devices=null means all visible devices (the trainer's own
    # default mesh); an explicit count restricts the data-parallel mesh.
    # training.model_parallel>1 carves a model axis out of those devices —
    # a 2D (data, model) mesh with ViT blocks sharded Megatron-style
    # (parallel/tp.py; the trainer places params accordingly)
    n_devices = (cfg.training.get("n_devices")
                 if hasattr(cfg.training, "get") else None)
    model_parallel = int(
        (cfg.training.get("model_parallel")
         if hasattr(cfg.training, "get") else None) or 1)
    mesh = None
    if n_devices or model_parallel > 1:
        from isegprobe_tpu.parallel.mesh import make_mesh

        mesh = make_mesh(
            n_devices=int(n_devices) if n_devices else None,
            model_parallel=model_parallel)

    trainer = iSegTrainer(
        model,
        cfg,
        loss_cfg,
        trainset,
        valset,
        mesh=mesh,
        optimizer=optimizer_name,
        optimizer_params=optimizer_params,
        layerwise_decay=False,
        lr_scheduler=lr_scheduler,
        checkpoint_interval=[tuple(x) for x in
                             cfg.training_params.checkpoint_interval],
        image_dump_interval=300,
        metrics=[AdaptiveIoU()],
        max_interactive_points=cfg.training_params.num_max_points,
        max_num_next_clicks=3,
        seed=cfg.training.seed,
    )
    trainer.run(
        num_epochs=cfg.training_params.epochs,
        validation=cfg.training_params.do_validation,
    )


def make_main(define_modules_cfg, dataset_fn=get_sbd_train_val_datasets,
              **model_kwargs):
    def main(cfg):
        seed_all(cfg.training.seed)
        modules_cfg = define_modules_cfg(cfg)
        model = init_model_from_modules_cfg(modules_cfg, cfg, **model_kwargs)
        train(model, cfg, dataset_fn=dataset_fn)

    return main


def default_save_cfg() -> dict:
    return dict(embed_coords=True, backbone=False, upsampler=False, head=True)
