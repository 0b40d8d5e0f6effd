"""Dataset loaders (reference: core/data/datasets/__init__.py)."""

from isegprobe_tpu.data.datasets.extended import (
    ADE20kDataset,
    CocoDataset,
    CocoLvisDataset,
    LvisDataset,
    OpenImagesDataset,
)
from isegprobe_tpu.data.datasets.synthetic import SyntheticShapesDataset
from isegprobe_tpu.data.datasets.standard import (
    BerkeleyDataset,
    DavisDataset,
    GrabCutDataset,
    PascalVocDataset,
    SBDDataset,
    SBDEvaluationDataset,
)

__all__ = [
    "ADE20kDataset",
    "BerkeleyDataset",
    "CocoDataset",
    "CocoLvisDataset",
    "DavisDataset",
    "GrabCutDataset",
    "LvisDataset",
    "OpenImagesDataset",
    "PascalVocDataset",
    "SBDDataset",
    "SBDEvaluationDataset",
    "SyntheticShapesDataset",
]
