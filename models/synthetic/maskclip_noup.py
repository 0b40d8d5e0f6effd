"""
Synthetic-shapes training demo of the MaskCLIP featurizer.
Backbone: MaskCLIP (CLIP ViT-B/16 dense) | Click encoder: PatchEmbed
Upsampler: Identity | Injection: before backbone.
(reference: models/sbd/maskclip/patch-embed_noup.py)
"""

import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[2]))

from models.common import default_save_cfg, make_main  # noqa: E402
from models.defaults import get_synthetic_train_val_datasets  # noqa: E402

MODEL_NAME = "synthetic_maskclip_noup_convhead_patchembed_earlyinject_224"
ARCHITECTURE = "backbone_upsampler_head"


def define_modules_cfg(cfg):
    return {
        "backbone": dict(
            type="mask_clip",
            params=dict(model_name="ViT-B/16",
                        feats_injection_mode="before_backbone"),
        ),
        "embed_coords": dict(
            type="patchEmbed",
            params=dict(img_size=cfg.training_params.crop_size,
                        patch_size=(16, 16), embed_dim=768),
        ),
        "head": dict(type="convhead",
                     params=dict(in_channels=512, num_layers=2, num_classes=1)),
        "upsampler": dict(type="identity", params=dict()),
        "neck": None,
        "save": default_save_cfg(),
        "architecture": ARCHITECTURE,
    }


main = make_main(define_modules_cfg, dataset_fn=get_synthetic_train_val_datasets)
