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

# genuinely installed packages must NOT be shadowed by empty stubs — the
# repo's own CLIP tokenizer uses `regex`, and the tokenizer-parity test uses
# the reference SimpleTokenizer when ftfy happens to be available
_STUB_ONLY_IF_MISSING = ("ftfy", "regex")


def reference_available() -> bool:
    return (REFERENCE_PATH / "core").is_dir()


def setup_reference():
    """Make `core.*` of the reference importable; returns False if absent."""
    if not reference_available():
        return False
    # APPEND, never prepend: the reference tree also contains a `models/`
    # package which would otherwise shadow this repo's `models/` for every
    # test collected after the first parity module (observed as
    # `models.common` resolving to /root/reference/models and failing on
    # the reference's easydict import). The reference's `core` package has
    # no repo-side name collision, so appending suffices for `core.*`.
    if str(REFERENCE_PATH) not in sys.path:
        sys.path.append(str(REFERENCE_PATH))
    import importlib.util

    def _installed(name: str) -> bool:
        mod = sys.modules.get(name)
        if mod is not None:  # a prior stub has __spec__ None
            return getattr(mod, "__spec__", None) is not None
        try:
            return importlib.util.find_spec(name) is not None
        except (ImportError, ValueError):
            return False

    real = {n: _installed(n) for n in _STUB_ONLY_IF_MISSING}
    for name in _STUBS:
        if name in sys.modules or real.get(name, False):
            continue
        sys.modules[name] = types.ModuleType(name)
    # the reference tokenizer module hard-imports ftfy AND regex. regex is
    # genuinely installed; when ftfy is not, its stub carries the vendored
    # deterministic fix_text (clip_tokenizer.fix_text_offline — VERDICT r4
    # #8), so the REFERENCE SimpleTokenizer runs offline and the exact
    # tokenizer-parity test needs no skip: both sides then clean through the
    # identical deterministic pipeline (real ftfy differs only in mojibake
    # heuristics, which well-formed prompts never trigger).
    if not real["ftfy"]:
        from isegprobe_tpu.models.featurizers.clip_tokenizer import (
            fix_text_offline,
        )

        sys.modules["ftfy"].fix_text = fix_text_offline
    tok_mod = "core.model.featurizers.maskclip.simple_tokenizer"
    if not real["regex"] and tok_mod not in sys.modules:
        sys.modules[tok_mod] = types.ModuleType(tok_mod)
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
    st = sys.modules.get(tok_mod)
    if st is not None and not hasattr(st, "SimpleTokenizer"):
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


def setup_reference_training():
    """Extend setup_reference() so the reference's TRAINER runs on this host:
    stub the albumentations submodules its data layer imports (the parity
    runs pass augmentator=None, so none execute), give the torchvision stub a
    real ToTensor, build the vendored DinoVisionTransformer instead of
    torch.hub (zero egress), and pin the trainer to CPU (its get_device
    hardcodes CUDA; this torch build is CPU-only). Returns False when the
    reference tree is absent."""
    if not setup_reference():
        return False
    import numpy as np
    import torch

    alb = sys.modules["albumentations"]
    alb.__path__ = []  # mark as package so submodule imports resolve
    for sym in ("Compose", "ReplayCompose", "BasicTransform", "DualTransform",
                "ImageOnlyTransform"):
        if not hasattr(alb, sym):
            setattr(alb, sym,
                    type(sym, (), {"__init__": lambda self, *a, **k: None}))
    for name, attrs in (
        ("albumentations.augmentations", {"functional": types.ModuleType("F")}),
        ("albumentations.core", {}),
        ("albumentations.core.serialization", {"SERIALIZABLE_REGISTRY": {}}),
        ("albumentations.core.transforms_interface",
         {"to_tuple": lambda *a, **k: tuple(a)}),
    ):
        mod = sys.modules.get(name) or types.ModuleType(name)
        for k, v in attrs.items():
            setattr(mod, k, v)
        sys.modules[name] = mod
    sys.modules["albumentations.augmentations.functional"] = \
        sys.modules["albumentations.augmentations"].functional

    if "easydict" not in sys.modules:
        ed_mod = types.ModuleType("easydict")

        class _EasyDict(dict):
            def __getattr__(self, k):
                try:
                    return self[k]
                except KeyError as e:
                    raise AttributeError(k) from e

            def __setattr__(self, k, v):
                self[k] = v

        ed_mod.EasyDict = _EasyDict
        sys.modules["easydict"] = ed_mod

    class _RealToTensor:
        def __init__(self, *a, **k):
            pass

        def __call__(self, x):
            arr = np.moveaxis(np.asarray(x), -1, 0).copy()
            return torch.from_numpy(arr).float() / 255.0

    sys.modules["torchvision.transforms"].ToTensor = _RealToTensor

    from core.model.featurizers.DINOv2 import DinoVisionTransformer

    def _local_dinov2(repo, arch, **kw):
        assert arch == "dinov2_vits14", arch
        return DinoVisionTransformer(img_size=518, patch_size=14,
                                     embed_dim=384, depth=12, num_heads=6,
                                     mlp_ratio=4, init_values=1.0)

    torch.hub.load = _local_dinov2
    torch.cuda.synchronize = lambda *a, **k: None

    import core.training.trainer as ref_trainer_mod

    ref_trainer_mod.get_device = lambda cfg: torch.device("cpu")

    class _NopSW:
        def __init__(self, *a, **k):
            pass

        def add_scalar(self, *a, **k):
            pass

        def add_image(self, *a, **k):
            pass

    ref_trainer_mod.SummaryWriterAvg = _NopSW
    return True
