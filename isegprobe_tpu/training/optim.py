"""Optimizer factories (reference: core/training/optimizer.py:14-56,
core/utils/lr_decay.py:15-87) built on optax.

Frozen modules are handled the TPU-native way: the optimizer only ever sees the
trainable sub-tree (selected by path prefix), instead of requires_grad flags.
Layer-wise LR decay becomes an optax mask-and-scale transform keyed on the
parameter path (BEiT scheme: layer 0 = patch_embed/cls/pos, 1..D = blocks,
D+1 = everything else).
"""

from __future__ import annotations

import re
from typing import Dict, Sequence, Tuple

import jax
import optax

TRAINABLE_PREFIXES_DEFAULT = ("embed_coords", "head", "neck")


def make_optimizer(
    opt_name: str,
    lr_schedule,
    trainable_prefixes: Sequence[str] = TRAINABLE_PREFIXES_DEFAULT,
    weight_decay: float = 0.0,
    betas: Tuple[float, float] = (0.9, 0.999),
    eps: float = 1e-8,
    momentum: float = 0.9,
) -> optax.GradientTransformation:
    """name -> {sgd, adam, adamw} with frozen params zero-masked
    (reference: optimizer.py:14-35)."""
    opt_name = opt_name.lower()
    if opt_name == "sgd":
        tx = optax.sgd(lr_schedule, momentum=momentum)
    elif opt_name == "adam":
        tx = optax.adam(lr_schedule, b1=betas[0], b2=betas[1], eps=eps)
    elif opt_name == "adamw":
        tx = optax.adamw(lr_schedule, b1=betas[0], b2=betas[1], eps=eps,
                         weight_decay=weight_decay)
    else:
        raise ValueError(f"Unknown optimizer: {opt_name}")

    return optax.multi_transform(
        {"train": tx, "frozen": optax.set_to_zero()},
        lambda params: jax.tree.map(
            lambda t: t, _label_tree(params, trainable_prefixes)
        ),
    )


def _label_tree(params: Dict, trainable_prefixes: Sequence[str]) -> Dict:
    return {
        top: jax.tree.map(
            lambda _: "train" if top in trainable_prefixes else "frozen", sub
        )
        for top, sub in params.items()
    }


def vit_layer_id(path: Tuple[str, ...], num_layers: int) -> int:
    """BEiT layer assignment (reference: lr_decay.py:75-87). `path` is the
    parameter path inside the backbone's ViT trunk."""
    name = "/".join(path)
    if "cls_token" in name or "pos_embed" in name or "patch_embed" in name:
        return 0
    m = re.search(r"blocks_(\d+)", name)
    if m:
        return int(m.group(1)) + 1
    return num_layers


def make_layerwise_decay_optimizer(
    opt_name: str,
    lr_schedule,
    params: Dict,
    num_layers: int,
    layer_decay: float = 0.75,
    weight_decay: float = 0.02,
    trainable_prefixes: Sequence[str] = TRAINABLE_PREFIXES_DEFAULT + ("backbone",),
    **kwargs,
) -> optax.GradientTransformation:
    """Layer-wise LR decay over the backbone (reference: optimizer.py:38-56):
    scale lr by layer_decay^(num_layers+1-layer_id) per parameter."""
    scales = {i: layer_decay ** (num_layers + 1 - i) for i in range(num_layers + 2)}

    def scale_fn(path, _):
        top = path[0].key if hasattr(path[0], "key") else path[0]
        if top != "backbone":
            return 1.0
        sub = tuple(p.key if hasattr(p, "key") else p for p in path[1:])
        return scales[vit_layer_id(sub, num_layers)]

    scale_tree = jax.tree_util.tree_map_with_path(scale_fn, params)
    base = make_optimizer(opt_name, lr_schedule, trainable_prefixes,
                          weight_decay=weight_decay, **kwargs)
    return optax.chain(
        base,
        optax.GradientTransformation(
            init=lambda p: optax.EmptyState(),
            update=lambda updates, state, p=None: (
                jax.tree.map(lambda u, s: u * s, updates, scale_tree),
                state,
            ),
        ),
    )


def multistep_lr(base_lr: float, milestones: Sequence[int], gamma: float,
                 steps_per_epoch: int):
    """torch MultiStepLR equivalent as an optax schedule (epoch milestones)."""
    boundaries = {int(m * steps_per_epoch): gamma for m in milestones}
    return optax.piecewise_constant_schedule(base_lr, boundaries)
