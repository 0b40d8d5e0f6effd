"""
Synthetic-shapes training demo with the SimpleViT click encoder (late
injection): the trainable click-ViT is the module under test here.
Backbone: DINOv2 | Click encoder: SimpleViT | Upsampler: Identity
Injection: after backbone. (reference: models/sbd/dinov2/simple-vit_noup.py)
"""

import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[2]))

from models.common import default_save_cfg, make_main  # noqa: E402
from models.defaults import get_synthetic_train_val_datasets  # noqa: E402

MODEL_NAME = "synthetic_dinov2_noup_convhead_simplevit_lateinject_224"
ARCHITECTURE = "backbone_upsampler_head"


def define_modules_cfg(cfg):
    return {
        "backbone": dict(type="dinov2",
                         params=dict(feats_injection_mode="after_backbone")),
        "embed_coords": dict(
            type="simple_vit",
            params=dict(
                img_size=list(cfg.training_params.crop_size),
                patch_size=(14, 14),
                embed_dim=384,
                depth=6,
                heads=8,
                mlp_dim=2048,
                channels=3,
                dim_head=64,
            ),
        ),
        "head": dict(type="convhead",
                     params=dict(in_channels=384, num_layers=2, num_classes=1)),
        "upsampler": dict(type="identity", params=dict()),
        "neck": None,
        "save": default_save_cfg(),
        "architecture": ARCHITECTURE,
    }


main = make_main(define_modules_cfg, dataset_fn=get_synthetic_train_val_datasets)
