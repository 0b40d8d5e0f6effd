"""Torch-checkpoint → flax-params converters for the backbone families.

The reference loads pretrained torch weights from torch.hub/timm/CLIP
(reference: core/model/featurizers/DINOv2.py:491, DINO.py:498-511,
maskclip/clip.py:118); we convert those state dicts into the parameter pytree
of our unified :class:`~isegprobe_tpu.models.vit.ViT`. Converters accept either
torch tensors or numpy arrays so they work without torch at inference time.
"""

from __future__ import annotations

import re
from typing import Any, Dict, Mapping

import numpy as np


def _to_np(v: Any) -> np.ndarray:
    if hasattr(v, "detach"):  # torch tensor
        v = v.detach().cpu().numpy()
    return np.asarray(v, dtype=np.float32)


def _linear(sd: Mapping, prefix: str, bias: bool = True) -> Dict:
    out = {"kernel": _to_np(sd[f"{prefix}.weight"]).T}
    if bias and f"{prefix}.bias" in sd:
        out["bias"] = _to_np(sd[f"{prefix}.bias"])
    return out


def _layernorm(sd: Mapping, prefix: str) -> Dict:
    return {
        "scale": _to_np(sd[f"{prefix}.weight"]),
        "bias": _to_np(sd[f"{prefix}.bias"]),
    }


def _conv_patch(sd: Mapping, prefix: str) -> Dict:
    # torch conv weight [D, C, ph, pw] -> flax kernel [ph, pw, C, D]
    out = {"kernel": _to_np(sd[f"{prefix}.weight"]).transpose(2, 3, 1, 0)}
    if f"{prefix}.bias" in sd:
        out["bias"] = _to_np(sd[f"{prefix}.bias"])
    return out


def convert_vit(state_dict: Mapping, depth: int, layerscale: bool = False) -> Dict:
    """Convert a DINO/DINOv2-family torch ViT state dict to our ViT params.

    Covers both the reference's in-repo DINO ViT (core/model/featurizers/
    DINO.py:213-377) and DINOv2 (DINOv2.py:53-351, with ls1/ls2 LayerScale).
    Extraneous keys (mask_token, head.*, register tokens) are ignored.
    """
    sd = dict(state_dict)
    params: Dict[str, Any] = {
        "cls_token": _to_np(sd["cls_token"]),
        "pos_embed": _to_np(sd["pos_embed"]),
        "patch_embed": {"proj": _conv_patch(sd, "patch_embed.proj")},
        "norm": _layernorm(sd, "norm"),
    }
    for i in range(depth):
        p = f"blocks.{i}"
        blk = {
            "norm1": _layernorm(sd, f"{p}.norm1"),
            "norm2": _layernorm(sd, f"{p}.norm2"),
            "attn": {
                "qkv": _linear(sd, f"{p}.attn.qkv"),
                "proj": _linear(sd, f"{p}.attn.proj"),
            },
            "mlp": {
                "fc1": _linear(sd, f"{p}.mlp.fc1"),
                "fc2": _linear(sd, f"{p}.mlp.fc2"),
            },
        }
        if layerscale:
            blk["ls1"] = {"gamma": _to_np(sd[f"{p}.ls1.gamma"])}
            blk["ls2"] = {"gamma": _to_np(sd[f"{p}.ls2.gamma"])}
        params[f"blocks_{i}"] = blk
    return params
