"""Optional test oracle: import the PyTorch reference implementation.

Golden-activation tests instantiate the reference's torch modules with random
weights, convert the state dict with our converters, and compare activations.
The reference tree is only present in the development environment; tests that
use this module must skip when it is unavailable.
"""

from __future__ import annotations

import sys
import types
from pathlib import Path

REFERENCE_PATH = Path("/root/reference")

_STUBS = (
    "wandb",
    "timm",
    "xformers",
    "xformers.ops",
    "mmcv",
    "mmcv.cnn",
    "omegaconf",
    "ftfy",
    "regex",
    "pkg_resources",
    "albumentations",
    "torch.utils.tensorboard",
    "torchvision",
    "torchvision.transforms",
)


def reference_available() -> bool:
    return (REFERENCE_PATH / "core").is_dir()


def setup_reference():
    """Make `core.*` of the reference importable; returns False if absent."""
    if not reference_available():
        return False
    if str(REFERENCE_PATH) not in sys.path:
        sys.path.insert(0, str(REFERENCE_PATH))
    for name in _STUBS:
        if name not in sys.modules:
            mod = types.ModuleType(name)
            sys.modules[name] = mod
    om = sys.modules["omegaconf"]
    if not hasattr(om, "DictConfig"):
        om.DictConfig = dict
        om.OmegaConf = type("OmegaConf", (), {})
        om.ListConfig = list
    tv = sys.modules["torchvision.transforms"]
    if not hasattr(tv, "Compose"):
        for sym in ("CenterCrop", "Compose", "Normalize", "Resize", "ToTensor",
                    "InterpolationMode"):
            setattr(tv, sym, type(sym, (), {"BICUBIC": 3}))
        sys.modules["torchvision"].transforms = tv
    tb = sys.modules["torch.utils.tensorboard"]
    if not hasattr(tb, "SummaryWriter"):
        tb.SummaryWriter = object
    pr = sys.modules["pkg_resources"]
    if not hasattr(pr, "packaging"):
        import packaging as _packaging
        import packaging.version  # noqa: F401  (pkg_resources exposes the submodule)

        pr.packaging = _packaging
    return True
