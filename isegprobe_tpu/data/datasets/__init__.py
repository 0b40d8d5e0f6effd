"""Dataset loaders (reference: core/data/datasets/__init__.py)."""

from isegprobe_tpu.data.datasets.standard import (
    BerkeleyDataset,
    DavisDataset,
    GrabCutDataset,
    PascalVocDataset,
    SBDDataset,
    SBDEvaluationDataset,
)

__all__ = [
    "BerkeleyDataset",
    "DavisDataset",
    "GrabCutDataset",
    "PascalVocDataset",
    "SBDDataset",
    "SBDEvaluationDataset",
]
