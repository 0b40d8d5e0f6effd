"""Featurizer registry (reference: core/model/featurizers/__init__.py:14-24,
core/utils/model_builder.py:19-57)."""

from isegprobe_tpu.models.featurizers.dino import DINOFeaturizer
from isegprobe_tpu.models.featurizers.dinov2 import DINOv2Featurizer
from isegprobe_tpu.models.featurizers.maskclip import MaskCLIPFeaturizer
from isegprobe_tpu.models.featurizers.simple_vit import SimpleViTFeaturizer

__all__ = [
    "DINOFeaturizer",
    "DINOv2Featurizer",
    "MaskCLIPFeaturizer",
    "SimpleViTFeaturizer",
]
