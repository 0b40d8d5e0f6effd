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


def _bn(sd: Mapping, prefix: str) -> Dict:
    return {
        "scale": _to_np(sd[f"{prefix}.weight"]),
        "bias": _to_np(sd[f"{prefix}.bias"]),
        "mean": _to_np(sd[f"{prefix}.running_mean"]),
        "var": _to_np(sd[f"{prefix}.running_var"]),
    }


def _conv(sd: Mapping, prefix: str) -> Dict:
    out = {"kernel": _to_np(sd[f"{prefix}.weight"]).transpose(2, 3, 1, 0)}
    if f"{prefix}.bias" in sd:
        out["bias"] = _to_np(sd[f"{prefix}.bias"])
    return out


def convert_lift(state_dict: Mapping) -> Dict:
    """LiFT torch checkpoint -> LiFTUpsampler params
    (reference module: core/model/upsamplers/LiFT.py:47-122)."""
    sd = {k.removeprefix("module."): v for k, v in dict(state_dict).items()}
    return {
        "image_convs_1a": {"conv": _conv(sd, "image_convs_1.0"),
                           "bn": _bn(sd, "image_convs_1.1")},
        "image_convs_1b": {"conv": _conv(sd, "image_convs_1.3"),
                           "bn": _bn(sd, "image_convs_1.4")},
        "image_convs_2": {"conv": _conv(sd, "image_convs_2.0"),
                          "bn": _bn(sd, "image_convs_2.1")},
        "up_transpose": {
            # torch ConvTranspose2d weight [in, out, kh, kw] -> [kh, kw, in, out]
            "kernel": _to_np(sd["up1.up.weight"]).transpose(2, 3, 0, 1),
            "bias": _to_np(sd["up1.up.bias"]),
        },
        "up_conv": {
            "c1": {"conv": _conv(sd, "up1.conv_1.double_conv.0"),
                   "bn": _bn(sd, "up1.conv_1.double_conv.1")},
            "c2": {"conv": _conv(sd, "up1.conv_1.double_conv.3"),
                   "bn": _bn(sd, "up1.conv_1.double_conv.4")},
        },
        "outc": _conv(sd, "outc"),
    }


def convert_loftup(upsampler_sd: Mapping, channelnorm_sd: Mapping,
                   num_layers: int = 2) -> Dict:
    """LoftUp ('sine' variant) torch state dicts -> LoftUpUpsampler params.

    ``upsampler_sd``/``channelnorm_sd`` are the post-surgery dicts the reference
    loader produces (core/model/upsamplers/loftup/loftup.py:152-177).
    """
    sd = dict(upsampler_sd)
    ca = {"norm": _layernorm(sd, "ca_transformer.norm")}
    for i in range(num_layers):
        p = f"ca_transformer.layers.{i}"
        ca[f"ca_{i}"] = {
            "norm_q": _layernorm(sd, f"{p}.0.norm_q"),
            "norm_kv": _layernorm(sd, f"{p}.0.norm_kv"),
            "attention": {
                "in_proj_weight": _to_np(sd[f"{p}.0.attention.in_proj_weight"]),
                "in_proj_bias": _to_np(sd[f"{p}.0.attention.in_proj_bias"]),
                "out_proj": _linear(sd, f"{p}.0.attention.out_proj"),
            },
        }
        ca[f"ff_{i}"] = {
            "norm": _layernorm(sd, f"{p}.1.net.0"),
            "fc1": _linear(sd, f"{p}.1.net.1"),
            "fc2": _linear(sd, f"{p}.1.net.4"),
        }
    return {
        "channelnorm": {"norm": _layernorm(dict(channelnorm_sd), "norm")},
        "fourier_feat": {"biases": _to_np(sd["fourier_feat.1.biases"])},
        "lr_pe": {"biases": _to_np(sd["lr_pe.biases"])},
        "first_norm": {"norm": _layernorm(sd, "first_conv.0.norm")},
        "first_conv1": {"conv": _conv(sd, "first_conv.1"),
                        "bn": _bn(sd, "first_conv.2")},
        "first_conv2": {"conv": _conv(sd, "first_conv.4"),
                        "bn": _bn(sd, "first_conv.5")},
        "ca_transformer": ca,
        "final_conv": _conv(sd, "final_conv.0"),
        "final_ln": {
            "weight": _to_np(sd["final_conv.1.weight"]),
            "bias": _to_np(sd["final_conv.1.bias"]),
        },
    }


def convert_loftup_raw(state_dict: Mapping, num_layers: int = 2) -> Dict:
    """Raw (pre-surgery) LoftUp training checkpoint -> LoftUpUpsampler params.

    Applies the reference loader's key surgery (loftup/loftup.py:152-177):
    the ChannelNorm lives under ``model.1.`` and the upsampler under
    ``upsampler.`` in checkpoints the LoftUp training code writes."""
    sd = dict(state_dict)
    channelnorm_sd = {k.removeprefix("model.1."): v
                      for k, v in sd.items() if "model.1" in k}
    upsampler_sd = {k.removeprefix("upsampler."): v
                    for k, v in sd.items() if k.startswith("upsampler")}
    return convert_loftup(upsampler_sd, channelnorm_sd, num_layers=num_layers)


def load_upsampler_params(upsampler_cfg: Mapping | None):
    """Load + convert the frozen upsampler weights referenced by the config's
    ``upsampler_path`` (the reference loads them at model build time:
    core/model/upsamplers/LoftUp.py:10-24 -> loftup/loftup.py:152-177 with
    key surgery; LiFT.py:125-136 with the ``module.`` strip). Accepts either
    this framework's .msgpack (scripts/convert_weights.py output) or a raw
    torch checkpoint, converted here. Returns None when no path is
    configured or the file does not exist (random-init frozen upsampler —
    the offline training demos run this way)."""
    from pathlib import Path

    utype = str((upsampler_cfg or {}).get("type", "")).lower()
    uparams = (upsampler_cfg or {}).get("params") or {}
    path = uparams.get("upsampler_path")
    if not path or utype not in ("loftup", "lift"):
        return None
    p = Path(str(path))
    if not p.exists():
        return None
    if p.suffix == ".msgpack":
        from flax import serialization as flax_serialization

        return flax_serialization.msgpack_restore(p.read_bytes())
    import torch

    obj = torch.load(p, map_location="cpu", weights_only=False)
    if hasattr(obj, "state_dict"):
        obj = obj.state_dict()
    if isinstance(obj, dict) and "state_dict" in obj:
        obj = obj["state_dict"]
    if utype == "lift":
        return convert_lift(obj)
    return convert_loftup_raw(obj,
                              num_layers=int(uparams.get("num_layers", 2)))


def pad_loftup_params(params: Mapping, n_dim: int = 384, n_freqs: int = 20,
                      heads: int = 4, num_layers: int = 2) -> Dict:
    """Zero-pad LoftUp params to the MXU-aligned channel layout.

    Convert-time counterpart of ``LoftUpUpsampler(mxu_pad=True)``: every
    stem/cross-attention weight is zero-padded from the reference widths
    (cdim 404, stem 203, head dim 101 — loftup/loftup.py:100-138,
    loftup/layers.py:177-228) to the next 128-lane multiple (512/256/128).
    Exact by construction — zero rows/cols contribute nothing to any
    contraction, padded norm scales/biases are zero so padded activations
    stay exactly zero, and the masked LayerNorm statistics cover only real
    channels. The packed attention projections are stored HEAD-INTERLEAVED:
    head h's real rows land at ``h*dh_pad + i`` so the module's plain
    ``reshape(..., heads, dh_pad)`` puts each head's channels (plus zeros) in
    its own padded slot; ``out_proj`` input rows are scattered to match.

    Input: the UNPADDED flax param subtree of the upsampler (from
    ``convert_loftup`` or a fresh ``model.init``); output: the padded tree
    matching ``LoftUpUpsampler(mxu_pad=True).init`` shapes.
    """
    creal = n_dim + 2 * 5 * 2
    cpad = ((creal + 127) // 128) * 128
    sreal = 2 * n_freqs * 5 + 3
    spad = ((sreal + 127) // 128) * 128
    rdh, pdh = creal // heads, cpad // heads
    ar = np.arange(creal)
    hidx = (ar // rdh) * pdh + (ar % rdh)  # head-interleaved target rows

    def tail(a, axis: int, to: int) -> np.ndarray:
        a = np.asarray(a)
        pads = [(0, 0)] * a.ndim
        pads[axis] = (0, to - a.shape[axis])
        return np.pad(a, pads)

    def ln(p: Mapping, to: int) -> Dict:
        return {"scale": tail(p["scale"], 0, to),
                "bias": tail(p["bias"], 0, to)}

    def bn(p: Mapping, to: int) -> Dict:
        var = np.asarray(p["var"])
        return {"scale": tail(p["scale"], 0, to),
                "bias": tail(p["bias"], 0, to),
                "mean": tail(p["mean"], 0, to),
                # pad variance with ones: (0-0)*rsqrt(1+eps)*0+0 = 0, and no
                # divide-by-~0 in the padded lanes
                "var": np.concatenate(
                    [var, np.ones(to - var.shape[0], var.dtype)])}

    def conv(p: Mapping, cin_to: int, cout_to: int) -> Dict:
        out = {"kernel": tail(tail(p["kernel"], 2, cin_to), 3, cout_to)}
        if "bias" in p:
            out["bias"] = tail(p["bias"], 0, cout_to)
        return out

    p = dict(params)
    p["first_norm"] = {"norm": ln(params["first_norm"]["norm"], spad)}
    p["first_conv1"] = {
        "conv": conv(params["first_conv1"]["conv"], spad, cpad),
        "bn": bn(params["first_conv1"]["bn"], cpad)}
    p["first_conv2"] = {
        "conv": conv(params["first_conv2"]["conv"], cpad, cpad),
        "bn": bn(params["first_conv2"]["bn"], cpad)}

    ca_in = params["ca_transformer"]
    ca: Dict = {"norm": ln(ca_in["norm"], cpad)}
    for i in range(num_layers):
        layer = ca_in[f"ca_{i}"]
        w = np.asarray(layer["attention"]["in_proj_weight"])
        b = np.asarray(layer["attention"]["in_proj_bias"])
        wp = np.zeros((3 * cpad, cpad), w.dtype)
        bp = np.zeros((3 * cpad,), b.dtype)
        for blk in range(3):
            wp[blk * cpad + hidx, :creal] = w[blk * creal:(blk + 1) * creal]
            bp[blk * cpad + hidx] = b[blk * creal:(blk + 1) * creal]
        ok = np.asarray(layer["attention"]["out_proj"]["kernel"])
        okp = np.zeros((cpad, cpad), ok.dtype)
        okp[np.ix_(hidx, ar)] = ok
        ca[f"ca_{i}"] = {
            "norm_q": ln(layer["norm_q"], cpad),
            "norm_kv": ln(layer["norm_kv"], cpad),
            "attention": {
                "in_proj_weight": wp,
                "in_proj_bias": bp,
                "out_proj": {
                    "kernel": okp,
                    "bias": tail(layer["attention"]["out_proj"]["bias"],
                                 0, cpad)},
            },
        }
        ff = ca_in[f"ff_{i}"]
        ca[f"ff_{i}"] = {
            "norm": ln(ff["norm"], cpad),
            "fc1": {"kernel": tail(ff["fc1"]["kernel"], 0, cpad),
                    "bias": np.asarray(ff["fc1"]["bias"])},
            "fc2": {"kernel": tail(ff["fc2"]["kernel"], 1, cpad),
                    "bias": tail(ff["fc2"]["bias"], 0, cpad)},
        }
    p["ca_transformer"] = ca
    fc = params["final_conv"]
    p["final_conv"] = {"kernel": tail(fc["kernel"], 2, cpad),
                       "bias": np.asarray(fc["bias"])}
    return p


def convert_reference_checkpoint(torch_checkpoint: Mapping) -> Dict:
    """Convert a reference-trained iSegProbe checkpoint
    ({'state_dict', 'config'} — reference: core/utils/misc.py:36-68) into this
    framework's {'params', 'config'}.

    The trained modules are embed_coords (PatchEmbed conv) and the conv head
    (mmcv ConvModule stacks, reference: core/model/heads/conv_heads.py); frozen
    backbones/upsamplers are reloaded separately from converted pretrained
    weights. The config keys are shared by construction.
    """
    sd = torch_checkpoint["state_dict"]
    ref_cfg = torch_checkpoint.get("config", {})

    params: Dict[str, Any] = {}
    if "embed_coords.proj.weight" in sd:
        params["embed_coords"] = {"proj": _conv(sd, "embed_coords.proj")}
    head: Dict[str, Any] = {}
    i = 0
    # mmcv ConvModule stacks: head.convs.{i}.conv.*
    while f"head.convs.{i}.conv.weight" in sd:
        head[f"convs_{i}"] = _conv(sd, f"head.convs.{i}.conv")
        i += 1
    if "head.classifier.weight" in sd:
        head["classifier"] = _conv(sd, "head.classifier")
    if head:
        params["head"] = head

    config = None
    if ref_cfg:
        ref_params = ref_cfg.get("params", ref_cfg)
        keep = (
            "backbone_cfg", "head_cfg", "embed_coords_cfg", "neck_cfg",
            "upsampler_cfg", "save_cfg", "architecture", "use_disks",
            "norm_radius", "with_prev_mask", "with_aux_output",
            "use_rgb_conv", "use_leaky_relu",
        )

        def _unwrap(v):
            # a GENUINE reference checkpoint's @serialize decorator wraps
            # every ctor param as {'type', 'value', 'specified'}
            # (reference: core/utils/serialization.py:19-36); hand-built
            # fixtures may carry plain values — accept both
            if (isinstance(v, Mapping)
                    and set(v.keys()) == {"type", "value", "specified"}):
                return v["value"]
            return v

        config = {
            "class": "isegprobe_tpu.models.probe_model.iSegProbeModel",
            "params": {k: _unwrap(ref_params[k]) for k in keep
                       if k in ref_params},
        }
    return {"params": params, "config": config}


def interpolate_pos_embed_params(
    pos_embed: np.ndarray,
    old_grid: tuple,
    new_grid: tuple,
    num_extra_tokens: int = 1,
) -> np.ndarray:
    """Eval-time pos-embed pre-interpolation (reference:
    core/model/featurizers/utils/pos_embed.py:110-150): size-based bicubic,
    align_corners=False, NO '+0.1' offset — after this the forward pass sees a
    matching grid and skips its own interpolation.

    pos_embed: [1, extra + gh*gw, D] numpy/jax array.
    """
    import jax.numpy as jnp

    from isegprobe_tpu.ops.resize import resize

    pe = np.asarray(pos_embed, dtype=np.float32)
    gh0, gw0 = old_grid
    gh, gw = new_grid
    if (gh0, gw0) == (gh, gw):
        return pe
    extra = pe[:, :num_extra_tokens]
    patch = pe[:, num_extra_tokens:].reshape(1, gh0, gw0, -1)
    patch = np.asarray(
        resize(jnp.asarray(patch), (gh, gw), "bicubic", align_corners=False)
    )
    patch = patch.reshape(1, gh * gw, -1)
    return np.concatenate([extra, patch], axis=1)


def convert_clip_visual(state_dict: Mapping, layers: int = 12) -> Dict:
    """CLIP visual-tower torch state dict -> CLIPVisionTransformer params.

    Accepts either full-CLIP keys ('visual.conv1.weight', ...) or
    visual-only keys (reference loads full CLIP, maskclip/model.py:286-320).
    """
    sd = {k.removeprefix("visual."): v for k, v in dict(state_dict).items()}
    params: Dict[str, Any] = {
        "conv1": {"kernel": _to_np(sd["conv1.weight"]).transpose(2, 3, 1, 0)},
        "class_embedding": _to_np(sd["class_embedding"]),
        "positional_embedding": _to_np(sd["positional_embedding"]),
        "ln_pre": _layernorm(sd, "ln_pre"),
        "ln_post": _layernorm(sd, "ln_post"),
        "proj": _to_np(sd["proj"]),
    }
    for i in range(layers):
        p = f"transformer.resblocks.{i}"
        params[f"resblocks_{i}"] = {
            "ln_1": _layernorm(sd, f"{p}.ln_1"),
            "ln_2": _layernorm(sd, f"{p}.ln_2"),
            "attn": {
                "in_proj_weight": _to_np(sd[f"{p}.attn.in_proj_weight"]),
                "in_proj_bias": _to_np(sd[f"{p}.attn.in_proj_bias"]),
                "out_proj": _linear(sd, f"{p}.attn.out_proj"),
            },
            "c_fc": _linear(sd, f"{p}.mlp.c_fc"),
            "c_proj": _linear(sd, f"{p}.mlp.c_proj"),
        }
    return params


def convert_clip_text(state_dict: Mapping, layers: int = 12) -> Dict:
    """CLIP text-tower torch state dict -> CLIPTextEncoder params
    (reference: maskclip/model.py:473-495 — token/positional embeddings,
    causal transformer resblocks, ln_final, text_projection)."""
    sd = dict(state_dict)
    params: Dict[str, Any] = {
        "token_embedding": _to_np(sd["token_embedding.weight"]),
        "positional_embedding": _to_np(sd["positional_embedding"]),
        "ln_final": _layernorm(sd, "ln_final"),
        "text_projection": _to_np(sd["text_projection"]),
    }
    for i in range(layers):
        p = f"transformer.resblocks.{i}"
        params[f"resblocks_{i}"] = {
            "ln_1": _layernorm(sd, f"{p}.ln_1"),
            "ln_2": _layernorm(sd, f"{p}.ln_2"),
            "attn": {
                "in_proj_weight": _to_np(sd[f"{p}.attn.in_proj_weight"]),
                "in_proj_bias": _to_np(sd[f"{p}.attn.in_proj_bias"]),
                "out_proj": _linear(sd, f"{p}.attn.out_proj"),
            },
            "c_fc": _linear(sd, f"{p}.mlp.c_fc"),
            "c_proj": _linear(sd, f"{p}.mlp.c_proj"),
        }
    return params


def convert_vit(state_dict: Mapping, depth: int, layerscale: bool = False) -> Dict:
    """Convert a DINO/DINOv2-family torch ViT state dict to our ViT params.

    Covers both the reference's in-repo DINO ViT (core/model/featurizers/
    DINO.py:213-377) and DINOv2 (DINOv2.py:53-351, with ls1/ls2 LayerScale).
    Extraneous keys (mask_token, head.*, register tokens) are ignored.
    """
    sd = dict(state_dict)
    # DINOv2's block_chunks wrapping nests block params as blocks.{chunk}.{i}.*
    # with globally-consistent i (reference: core/model/featurizers/
    # DINOv2.py:160-172); strip the chunk index.
    chunk_re = re.compile(r"^blocks\.\d+\.(\d+)\.")
    if any(chunk_re.match(k) for k in sd):
        sd = {chunk_re.sub(r"blocks.\1.", k): v for k, v in sd.items()}
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
