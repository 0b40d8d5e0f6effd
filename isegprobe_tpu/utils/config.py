"""Config system: yaml + attribute-dict + dotted CLI overrides.

The reference uses Hydra (reference: train.py:13, evaluate.py:30,
configs/*.yaml); this framework keeps the same YAML files and key names but
resolves them with a small self-contained loader (hydra is not a dependency).
CLI overrides use the same ``a.b.c=value`` syntax.
"""

from __future__ import annotations

import re
from pathlib import Path
from typing import Any, Dict, List, Optional

import yaml


class EDict(dict):
    """Attribute-access dict (the reference's easydict)."""

    def __getattr__(self, name):
        try:
            return self[name]
        except KeyError as e:
            raise AttributeError(name) from e

    def __setattr__(self, name, value):
        self[name] = value

    @classmethod
    def convert(cls, obj):
        if isinstance(obj, dict):
            return cls({k: cls.convert(v) for k, v in obj.items()})
        if isinstance(obj, (list, tuple)):
            return type(obj)(cls.convert(v) for v in obj)
        return obj


def load_yaml(path: str | Path) -> EDict:
    with open(path) as f:
        data = yaml.safe_load(f) or {}
    data.pop("defaults", None)  # hydra-only keys kept in the files for parity
    data.pop("hydra", None)
    return EDict.convert(data)


_SCI_FLOAT = re.compile(r"[+-]?(\d+\.?\d*|\.\d+)[eE][+-]?\d+")


def _parse_value(text: str) -> Any:
    try:
        value = yaml.safe_load(text)
    except yaml.YAMLError:
        return text
    # YAML 1.1 floats require a dot, so "2e-4" loads as the STRING "2e-4"
    # (hydra, and any user typing `training_params.lr=2e-4`, means the
    # float) — coerce exponent-form numbers the way YAML 1.2 would
    if isinstance(value, str) and _SCI_FLOAT.fullmatch(value):
        return float(value)
    return value


def apply_overrides(cfg: EDict, overrides: List[str]) -> EDict:
    """Apply ``a.b.c=value`` overrides in place (Hydra CLI syntax)."""
    for ov in overrides:
        if "=" not in ov:
            raise ValueError(f"Override must look like key=value, got: {ov}")
        key, _, raw = ov.partition("=")
        node = cfg
        parts = key.split(".")
        for part in parts[:-1]:
            if part not in node or not isinstance(node[part], dict):
                node[part] = EDict()
            node = node[part]
        node[parts[-1]] = EDict.convert(_parse_value(raw))
    return cfg


def load_config(config_path: str | Path, overrides: Optional[List[str]] = None) -> EDict:
    cfg = load_yaml(config_path)
    if overrides:
        apply_overrides(cfg, overrides)
    return cfg


def find_main_config(start: str | Path, name: str = "main_cfg.yaml") -> Optional[Path]:
    """Upward directory search for the machine-paths config
    (reference: core/utils/exp.py:165-178)."""
    p = Path(start).resolve()
    for parent in [p, *p.parents]:
        candidate = parent / name
        if candidate.exists():
            return candidate
        candidate = parent / "configs" / name
        if candidate.exists():
            return candidate
    return None
