"""
Synthetic-shapes training demo through the loftup upsampler (random init
— checkpoints unreachable offline; exercises train/eval through the stack).
Backbone: DINOv2 | Click encoder: PatchEmbed | Upsampler: LoftUp
Injection: before backbone. (reference: models/sbd/dinov2/patch-embed_loftup.py)
"""

import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[2]))

from models.common import default_save_cfg, make_main  # noqa: E402
from models.defaults import get_synthetic_train_val_datasets  # noqa: E402

MODEL_NAME = "synthetic_dinov2_loftup_convhead_patchembed_earlyinject_224"
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
        "upsampler": dict(type="loftup", params=dict(upsampler_path=cfg.UPSAMPLERS.LOFTUP, n_dim=384)),
        "neck": None,
        "save": default_save_cfg(),
        "architecture": ARCHITECTURE,
    }


main = make_main(define_modules_cfg, dataset_fn=get_synthetic_train_val_datasets)
