"""
Backbone: DINOv2 (random init) | Click encoder: PatchEmbed
Upsampler: JBU-FeatUp x16 (fused Pallas kernel, frozen) | Injection: early.

Trains the probe head THROUGH the fused JBU stack on the synthetic shapes
dataset — exercises the kernel's custom-VJP backward in a real training run.
(reference: models/sbd/dinov2/patch-embed_jbu.py + the FeatUp dependency it
hub-loads, core/model/upsamplers/JBUFeatUp.py:30-32)
"""

import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[2]))

from models.common import default_save_cfg, make_main  # noqa: E402
from models.defaults import get_synthetic_train_val_datasets  # noqa: E402

MODEL_NAME = "synthetic_dinov2_jbu_convhead_patchembed_earlyinject_224"
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
        "upsampler": dict(type="jbu_featup",
                          params=dict(backbone_type="dinov2", use_norm=True)),
        "neck": None,
        "save": default_save_cfg(),
        "architecture": ARCHITECTURE,
    }


main = make_main(define_modules_cfg, dataset_fn=get_synthetic_train_val_datasets)
