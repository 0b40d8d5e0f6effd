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
    # the CLIP BPE tokenizer needs the `regex` package and a vocab file; tests
    # never tokenize text, so stub the whole module
    "core.model.featurizers.maskclip.simple_tokenizer",
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
    mm = sys.modules["mmcv.cnn"]
    if not hasattr(mm, "ConvModule"):
        import torch.nn as _tnn

        class _ConvModule(_tnn.Module):
            """Minimal stand-in for mmcv ConvModule's default config:
            conv (bias) + ReLU, no norm — all the reference heads use."""

            def __init__(self, in_channels, out_channels, kernel_size,
                         stride=1, padding=0):
                super().__init__()
                self.conv = _tnn.Conv2d(in_channels, out_channels, kernel_size,
                                        stride=stride, padding=padding)
                self.activate = _tnn.ReLU(inplace=True)

            def forward(self, x):
                return self.activate(self.conv(x))

        mm.ConvModule = _ConvModule
        sys.modules["mmcv"].cnn = mm
    st = sys.modules["core.model.featurizers.maskclip.simple_tokenizer"]
    if not hasattr(st, "SimpleTokenizer"):
        st.SimpleTokenizer = lambda *a, **k: None
    tv = sys.modules["torchvision.transforms"]
    if not hasattr(tv, "Compose"):
        for sym in ("CenterCrop", "Compose", "Normalize", "Resize", "ToTensor",
                    "InterpolationMode"):
            setattr(
                tv,
                sym,
                type(sym, (), {
                    "BICUBIC": 3,
                    "__init__": lambda self, *a, **k: None,
                    "__call__": lambda self, x, *a, **k: x,
                }),
            )
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
