"""Self-describing checkpoints (reference: core/utils/serialization.py:10-91,
core/utils/misc.py:36-68).

A checkpoint is a single file holding {'config': <model ctor spec>,
'state_dict': <filtered flax params>} so evaluation can reconstruct the model
class purely from the file, exactly like the reference's @serialize flow.
Params are msgpack-encoded via flax.serialization.
"""

from __future__ import annotations

import importlib
import pickle
from pathlib import Path
from typing import Any, Dict, Optional, Tuple

import numpy as np
from flax import serialization as flax_serialization


def model_config(model) -> Dict:
    """Snapshot a flax dataclass module's constructor spec
    (the linen equivalent of the reference's @serialize decorator)."""
    import dataclasses

    cls = type(model)
    kwargs = {}
    for f in dataclasses.fields(cls):
        if f.name in ("parent", "name"):
            continue
        v = getattr(model, f.name)
        if callable(v) and not isinstance(v, (str, int, float, bool)):
            continue  # dtypes / callables are defaults; reconstructed from class
        kwargs[f.name] = v
    return {"class": f"{cls.__module__}.{cls.__qualname__}", "params": kwargs}


def build_model(config: Dict, **override_kwargs):
    """Re-instantiate a model from its serialized config
    (reference: serialization.py:61-91)."""
    module_name, _, cls_name = config["class"].rpartition(".")
    cls = getattr(importlib.import_module(module_name), cls_name)
    kwargs = dict(config["params"])
    kwargs.update(override_kwargs)
    return cls(**kwargs)


def save_checkpoint(
    params: Dict,
    config: Dict,
    path: str | Path,
    extra: Optional[Dict] = None,
) -> None:
    path = Path(path)
    path.parent.mkdir(parents=True, exist_ok=True)
    host_params = _to_host(params)
    payload = {
        "config": config,
        "state_dict": flax_serialization.msgpack_serialize(host_params),
    }
    if extra:
        payload["extra"] = extra
    tmp = path.with_suffix(path.suffix + ".tmp")
    with open(tmp, "wb") as f:
        pickle.dump(payload, f, protocol=pickle.HIGHEST_PROTOCOL)
    tmp.replace(path)


def load_checkpoint(path: str | Path) -> Tuple[Dict, Dict, Optional[Dict]]:
    with open(path, "rb") as f:
        payload = pickle.load(f)
    params = flax_serialization.msgpack_restore(payload["state_dict"])
    return params, payload["config"], payload.get("extra")


def merge_params(full_params: Dict, loaded: Dict) -> Dict:
    """Overlay a (possibly filtered) checkpoint onto freshly-initialized params
    — the reference's load-then-update pattern (inference/utils.py:70-74)."""
    merged = dict(full_params)
    for k, v in loaded.items():
        if isinstance(v, dict) and isinstance(merged.get(k), dict):
            merged[k] = merge_params(merged[k], v)
        else:
            merged[k] = v
    return merged


def _to_host(tree):
    import jax

    return jax.tree.map(lambda x: np.asarray(x), tree)
