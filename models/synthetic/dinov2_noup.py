"""
Backbone: DINOv2 (random init — zero-egress env) | Click encoder: PatchEmbed
Upsampler: Identity | Injection: before backbone (early).

The flagship probe architecture trained on the procedural synthetic-shapes
dataset: the offline end-to-end *learning demonstration* — a trained head must
reach a far lower NoC than a random-init head on held-out scenes.
(reference capability: models/sbd/dinov2/patch-embed_noup.py +
core/training/trainer.py:180-311)
"""

import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[2]))

from models.common import default_save_cfg, make_main  # noqa: E402
from models.defaults import get_synthetic_train_val_datasets  # noqa: E402

MODEL_NAME = "synthetic_dinov2_noup_convhead_patchembed_earlyinject_224"
ARCHITECTURE = "backbone_upsampler_head"


def define_modules_cfg(cfg):
    return {
        "backbone": dict(type="dinov2",
                         params=dict(feats_injection_mode="before_backbone")),
        "embed_coords": dict(
            type="patchEmbed",
            params=dict(img_size=cfg.training_params.crop_size,
                        patch_size=(14, 14), embed_dim=384),
        ),
        "head": dict(type="convhead",
                     params=dict(in_channels=384, num_layers=2, num_classes=1)),
        "upsampler": dict(type="identity", params=dict()),
        "neck": None,
        "save": default_save_cfg(),
        "architecture": ARCHITECTURE,
    }


main = make_main(define_modules_cfg, dataset_fn=get_synthetic_train_val_datasets)
