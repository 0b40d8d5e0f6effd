"""The composite interactive-segmentation probe model.

Rebuilds iSegBaseModel + iSegProbeModel (reference:
core/model/iseg_base_model.py:12-118, core/model/iseg_probe_model.py:16-258)
as one flax module whose whole forward — image normalization, click disk-map
encoding, click patch embedding, backbone (with injection), upsampler, head and
the final align-corners resize — is a single compiled XLA program.

Differences from the reference's torch design (SURVEY.md §7):
  * NHWC everywhere; clicks come in as fixed-size padded [B, 2N, 3] tensors.
  * Frozen-ness is a property of the parameter tree, not the module: the
    ``trainable_submodules()`` helper gives the path prefixes the optimizer
    should update, and ``save_cfg`` filters what checkpoints store.
"""

from __future__ import annotations

from typing import Any, Dict, Optional, Tuple

import flax.linen as nn
import jax.numpy as jnp

from isegprobe_tpu.models.featurizers.dino import DINOFeaturizer
from isegprobe_tpu.models.featurizers.dinov2 import DINOv2Featurizer
from isegprobe_tpu.models.featurizers.simple_vit import SimpleViTFeaturizer
from isegprobe_tpu.models.heads import HEAD_REGISTRY
from isegprobe_tpu.models.upsamplers import UPSAMPLER_REGISTRY, _register_learned
from isegprobe_tpu.models.vit import PatchEmbed
from isegprobe_tpu.ops.dist_maps import encode_clicks
from isegprobe_tpu.ops.resize import resize
from isegprobe_tpu.models.vit import mm_precision

IMAGENET_MEAN = (0.485, 0.456, 0.406)
IMAGENET_STD = (0.229, 0.224, 0.225)

FROZEN_SUBMODULES = ("backbone", "upsampler")  # reference freezes these
TRAINABLE_SUBMODULES = ("embed_coords", "head", "neck")


def build_featurizer(ftype: str, params: Dict, **common) -> nn.Module:
    ftype = ftype.lower()
    params = dict(params or {})
    if ftype == "simple_vit":
        # int8 serving covers the unified-ViT and CLIP towers; SimpleViT is
        # the trainable click encoder and stays at the float dtype by design
        # (explicit failure beats silent fallback)
        if common.get("quant"):
            raise NotImplementedError(
                f"quant={common['quant']!r} is not supported for {ftype} "
                "(frozen backbone towers only)")
        common = {k: v for k, v in common.items() if k != "quant"}
    if ftype == "dinov2":
        return DINOv2Featurizer(**params, **common)
    if ftype == "vit":
        return DINOFeaturizer(**params, **common)
    if ftype == "simple_vit":
        # reference maps config key names (core/utils/model_builder.py:38-48)
        return SimpleViTFeaturizer(
            image_size=params["img_size"],
            patch_size=params["patch_size"],
            dim=params["embed_dim"],
            depth=params["depth"],
            heads=params["heads"],
            mlp_dim=params["mlp_dim"],
            channels=params.get("channels", 3),
            dim_head=params.get("dim_head", 64),
            **common,
        )
    if ftype == "mask_clip":
        from isegprobe_tpu.models.featurizers.maskclip import MaskCLIPFeaturizer

        return MaskCLIPFeaturizer(**params, **common)
    raise ValueError(f"Unsupported backbone type: {ftype}")


def build_upsampler(utype: str, params: Optional[Dict],
                    dtype=None) -> nn.Module:
    utype = utype.lower()
    if utype not in UPSAMPLER_REGISTRY:
        _register_learned()
    if utype not in UPSAMPLER_REGISTRY:
        raise ValueError(f"Unsupported upsampler type: {utype}")
    cls = UPSAMPLER_REGISTRY[utype]
    kwargs = dict(params) if params else {}
    # propagate the model compute dtype to upsamplers that support one
    # (JBU/LiFT/LoftUp) unless the config pins it explicitly — without this
    # the bf16 serving/training modes silently ran learned upsamplers in f32
    fields = getattr(cls, "__dataclass_fields__", {})
    if dtype is not None and "dtype" in fields and "dtype" not in kwargs:
        kwargs["dtype"] = dtype
    return cls(**kwargs)


def build_head(htype: str, params: Dict) -> nn.Module:
    if htype not in HEAD_REGISTRY:
        raise ValueError(f"Unsupported head type: {htype}")
    return HEAD_REGISTRY[htype](**params)


class ScaleLayer(nn.Module):
    """Learned |scale| multiplier (reference: core/model/ops.py:83-93)."""

    init_value: float = 1.0
    lr_mult: float = 1.0

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        scale = self.param(
            "scale",
            lambda key, shape: jnp.full(shape, self.init_value / self.lr_mult),
            (1,),
        )
        return x * jnp.abs(scale * self.lr_mult)


class RITMMapsTransform(nn.Module):
    """RITM-style coordinate-feature transform (reference:
    core/model/iseg_base_model.py:42-56): 1x1 conv -> (leaky)ReLU ->
    stride-2 3x3 conv -> ScaleLayer."""

    use_leaky_relu: bool = False
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        x = nn.Conv(16, (1, 1), dtype=self.dtype,
                    precision=mm_precision(self.dtype), name="conv1")(x)
        x = nn.leaky_relu(x, 0.2) if self.use_leaky_relu else nn.relu(x)
        x = nn.Conv(64, (3, 3), strides=2, padding=1, dtype=self.dtype,
                    precision=mm_precision(self.dtype), name="conv2")(x)
        return ScaleLayer(init_value=0.05, name="scale")(x)


def split_points_by_order(points: "np.ndarray", groups) -> list:
    """Distribute padded clicks into per-group tensors by click index — used
    by click-wise model ensembles (reference: iseg_base_model.py:120-156).
    points: [B, 2N, 3] host array."""
    import numpy as np

    points = np.asarray(points)
    num_groups = len(groups)
    bs = points.shape[0]
    num_points = points.shape[1] // 2

    groups = [x if x > 0 else num_points for x in groups]
    group_points = [np.full((bs, 2 * x, 3), -1, dtype=np.float32) for x in groups]

    last_point_indx_group = np.zeros((bs, num_groups, 2), dtype=np.int64)
    for group_indx, group_size in enumerate(groups):
        last_point_indx_group[:, group_indx, 1] = group_size

    for bindx in range(bs):
        for pindx in range(2 * num_points):
            point = points[bindx, pindx, :]
            group_id = int(point[2])
            if group_id < 0:
                continue
            is_negative = int(pindx >= num_points)
            if group_id >= num_groups or (group_id == 0 and is_negative):
                group_id = num_groups - 1
            new_point_indx = last_point_indx_group[bindx, group_id, is_negative]
            last_point_indx_group[bindx, group_id, is_negative] += 1
            group_points[group_id][bindx, new_point_indx, :] = point
    return group_points


class iSegProbeModel(nn.Module):
    """backbone (+ injected click tokens) -> upsampler -> head.

    Call signature: ``model(image, points)`` with image [B, H, W, 3] in [0, 1]
    (plus a prev-mask channel when ``with_prev_mask``, making [B, H, W, 4]) and
    points [B, 2N, 3] rows of (y, x, index), −1-padded, positives first.
    Returns {'instances': [B, H, W, 1] logits, 'instances_aux': None}.
    """

    backbone_cfg: Dict
    head_cfg: Dict
    embed_coords_cfg: Dict
    neck_cfg: Optional[Dict] = None
    upsampler_cfg: Optional[Dict] = None
    save_cfg: Optional[Dict] = None
    architecture: str = "backbone_upsampler_head"
    with_aux_output: bool = False
    norm_radius: float = 5.0
    use_disks: bool = False
    cpu_dist_maps: bool = False  # accepted for config parity; maps run on device
    use_rgb_conv: bool = False  # RITM-only coordinate transform
    use_leaky_relu: bool = False
    with_prev_mask: bool = False
    norm_mean_std: Tuple = (IMAGENET_MEAN, IMAGENET_STD)
    dtype: Any = jnp.float32
    attn_impl: str = "auto"
    # 'int8': backbone dense layers run dynamic W8A8 on the int8 MXU
    # (ops/quant.py); set via eval_cfg.dtype=int8 — serving only
    quant: Any = None
    # Serving-path fusion: run the seg head inside the LoftUp upsampler's
    # banded slab loop (models/upsamplers/loftup.py ``tail``), so the
    # [B, H, W, C] HR feature tensor never materializes in HBM. Numerically
    # exact (tests/test_upsamplers.py); enabled by evaluate.py — training
    # keeps the unfused path (the fused slabs cannot run under remat).
    fuse_hr_head: bool = False

    def setup(self):
        assert self.architecture in ("backbone_upsampler_head", "backbone_neck_head")
        if self.architecture == "backbone_neck_head":
            # parity with the reference: necks are registered but unimplemented
            # (core/utils/model_builder.py:97-100)
            raise NotImplementedError("neck architecture is not implemented")

        common = dict(dtype=self.dtype, attn_impl=self.attn_impl,
                      quant=self.quant)
        self.backbone = build_featurizer(
            self.backbone_cfg["type"], self.backbone_cfg.get("params"), **common
        )
        ucfg = self.upsampler_cfg
        self.upsampler_type = ucfg["type"] if ucfg else "bilinear"
        self.upsampler = build_upsampler(
            self.upsampler_type, ucfg.get("params") if ucfg else None,
            dtype=self.dtype,
        )
        self.head = build_head(self.head_cfg["type"], dict(self.head_cfg["params"]))

        if self.use_rgb_conv:
            self.maps_transform = RITMMapsTransform(
                use_leaky_relu=self.use_leaky_relu, dtype=self.dtype,
                name="maps_transform",
            )
        else:
            self.maps_transform = None

        ec_type = self.embed_coords_cfg["type"]
        ec_params = self.embed_coords_cfg["params"]
        if ec_type == "patchEmbed":
            p = ec_params["patch_size"]
            p = p[0] if isinstance(p, (tuple, list)) else p
            self.embed_coords = PatchEmbed(
                patch_size=p,
                embed_dim=ec_params["embed_dim"],
                dtype=self.dtype,
                name="embed_coords",
            )
        elif ec_type == "simple_vit":
            # click encoder stays at the float dtype under quant='int8' — the
            # backbone is where the FLOPs are, and SimpleViT has its own blocks
            ec_common = {k: v for k, v in common.items() if k != "quant"}
            self.embed_coords = build_featurizer("simple_vit", ec_params,
                                                 **ec_common)
        else:
            raise ValueError(f"Unknown embed_coords type: {ec_type}")

    # -- input preparation (reference: iseg_base_model.py:91-110) --------

    def prepare_input(self, image: jnp.ndarray):
        prev_mask = None
        if self.with_prev_mask:
            prev_mask = image[..., 3:]
            image = image[..., :3]
        mean = jnp.asarray(self.norm_mean_std[0], dtype=image.dtype)
        std = jnp.asarray(self.norm_mean_std[1], dtype=image.dtype)
        image = (image - mean) / std
        return image, prev_mask

    def get_coord_features(self, image, prev_mask, points) -> jnp.ndarray:
        h, w = image.shape[1], image.shape[2]
        coords = encode_clicks(
            points, h, w, norm_radius=self.norm_radius, use_disks=self.use_disks,
            dtype=image.dtype,
        )
        if prev_mask is not None:
            coords = jnp.concatenate([prev_mask.astype(coords.dtype), coords], axis=-1)
        return coords

    # -- forward ----------------------------------------------------------

    def _fused_head(self) -> bool:
        """Head-in-slab fusion applies when enabled AND the upsampler accepts
        a ``tail`` (LoftUp) AND the head implements the banded contract."""
        return (
            self.fuse_hr_head
            and self.upsampler_type == "loftup"
            and hasattr(self.head, "banded")
        )

    def _upsample_and_head(self, feats, image) -> jnp.ndarray:
        """upsampler -> (resize) -> head, fusing the head into the LoftUp
        slab loop when enabled (LoftUp output is always guidance-sized, so
        the fused path never needs the intermediate resize)."""
        h, w = image.shape[1], image.shape[2]
        if self._fused_head():
            return self.upsampler(feats, image, tail=self.head.banded,
                                  tail_halo=self.head.tail_halo)
        feats = self.upsampler(feats, image)
        if self.upsampler_type != "identity" and feats.shape[1:3] != (h, w):
            feats = resize(feats, (h, w), "bilinear", align_corners=True)
        return self.head(feats)

    def backbone_forward(self, image, coord_features) -> Dict:
        if self.maps_transform is not None:
            coord_features = self.maps_transform(coord_features)
        coord_tokens = self.embed_coords(coord_features)
        feats = self.backbone(image, coord_tokens)

        out = self._upsample_and_head(feats, image)
        return {"instances": out, "instances_aux": None}

    def __call__(self, image: jnp.ndarray, points: jnp.ndarray) -> Dict:
        image, prev_mask = self.prepare_input(image)
        coord_features = self.get_coord_features(image, prev_mask, points)
        outputs = self.backbone_forward(image, coord_features)

        h, w = image.shape[1], image.shape[2]
        outputs["instances"] = resize(
            outputs["instances"], (h, w), "bilinear", align_corners=True
        )
        return outputs

    # -- late-injection caching seams (SURVEY.md §7 delta #2) ---------------
    # With 'after_backbone' injection the frozen trunk depends only on the
    # image crop, so the per-click loop can cache it and rerun just the
    # click-embed + add + upsampler + head.

    def compute_backbone_trunk(self, image: jnp.ndarray) -> jnp.ndarray:
        """Trunk features of the (un-normalized, possibly prev-mask-extended)
        crop, with no click injection. [B, gh, gw, C]."""
        image, _ = self.prepare_input(image)
        return self.backbone(image, None)

    def forward_with_cached_trunk(
        self, image: jnp.ndarray, points: jnp.ndarray, trunk_feats: jnp.ndarray
    ) -> Dict:
        """Late-injection forward reusing cached trunk features."""
        image, prev_mask = self.prepare_input(image)
        coord_features = self.get_coord_features(image, prev_mask, points)
        if self.maps_transform is not None:
            coord_features = self.maps_transform(coord_features)
        coord_tokens = self.embed_coords(coord_features)

        b, gh, gw, c = trunk_feats.shape
        # same add the featurizers perform for 'after_backbone'
        feats = trunk_feats.astype(jnp.float32) + coord_tokens.reshape(
            b, gh, gw, c
        ).astype(jnp.float32)

        out = self._upsample_and_head(feats, image)
        h, w = image.shape[1], image.shape[2]
        out = resize(out, (h, w), "bilinear", align_corners=True)
        return {"instances": out, "instances_aux": None}

    # -- adaptive-canvas forward (RITM adaptive ZoomIn, VERDICT r3 #6) ------

    def forward_masked(self, image: jnp.ndarray, points: jnp.ndarray,
                       valid_hw: jnp.ndarray) -> Dict:
        """Forward on a static canvas whose top-left per-sample traced
        (vh, vw) rect is valid — the compiled stand-in for the reference's
        data-dependent adaptive-ZoomIn crop sizes (zoom_in.py:228-253).
        image: [B, Hc, Wc, 3/4]; valid_hw: [B, 2] int. Returns full-canvas
        logits whose valid rect equals running ``__call__`` on the true
        (vh, vw) input (tests/test_adaptive_eval.py).

        Supported families: ViT featurizers exposing ``masked_forward``
        (dinov2/vit), identity/bilinear upsamplers, heads with ``masked``.
        """
        from isegprobe_tpu.ops.dynamic_resize import dyn_resize_2d_batched

        if not hasattr(self.backbone, "masked_forward"):
            raise NotImplementedError(
                f"adaptive-canvas eval is not implemented for backbone "
                f"type {self.backbone_cfg['type']!r}")
        if self.upsampler_type not in ("identity", "bilinear"):
            raise NotImplementedError(
                f"adaptive-canvas eval supports identity/bilinear "
                f"upsamplers; got {self.upsampler_type!r}")

        hc, wc = image.shape[1], image.shape[2]
        image, prev_mask = self.prepare_input(image)
        coords = self.get_coord_features(image, prev_mask, points)
        # the disk-map formula emits values outside the valid rect too —
        # zero them so every conv consuming the maps (maps_transform,
        # embed_coords patch conv) sees the zero padding a true-size input
        # would have
        vhw = jnp.asarray(valid_hw)
        ii = jnp.arange(hc)
        jj = jnp.arange(wc)
        pix_valid = ((ii[None, :, None] < vhw[:, 0, None, None])
                     & (jj[None, None, :] < vhw[:, 1, None, None]))
        coords = coords * pix_valid[..., None].astype(coords.dtype)

        if self.maps_transform is not None:
            # RITM transform (1x1 conv -> relu -> 3x3 stride-2 -> scale,
            # eval_ritm configs): the stride-2 conv sees the zeroed
            # out-of-rect region exactly like a true-size input's zero
            # padding; the valid rect halves (ceil, torch stride-2 output
            # size) and is re-zeroed for the embed conv
            coords = self.maps_transform(coords)
            half = (vhw + 1) // 2
            hh, wh = coords.shape[1], coords.shape[2]
            i2 = jnp.arange(hh)
            j2 = jnp.arange(wh)
            m2 = ((i2[None, :, None] < half[:, 0, None, None])
                  & (j2[None, None, :] < half[:, 1, None, None]))
            coords = coords * m2[..., None].astype(coords.dtype)
        coord_tokens = self.embed_coords(coords)

        p = getattr(self.backbone, "patch_size", 14)
        vg = vhw // p
        feats = self.backbone.masked_forward(image, coord_tokens, vg)

        if self.upsampler_type == "bilinear":
            feats = dyn_resize_2d_batched(feats, vg, vhw, (hc, wc),
                                          "bilinear", align_corners=True)
            out = self.head.masked(feats, vhw)
            return {"instances": out, "instances_aux": None}

        out = self.head.masked(feats, vg)
        out = dyn_resize_2d_batched(out, vg, vhw, (hc, wc),
                                    "bilinear", align_corners=True)
        return {"instances": out, "instances_aux": None}

    def get_lowres_highres_feats(self, image, points) -> Tuple[Dict, Dict]:
        """Feature-probe path (reference: iseg_probe_model.py:136-174)."""
        image, prev_mask = self.prepare_input(image)
        coord_features = self.get_coord_features(image, prev_mask, points)
        # same pre-embed transform as backbone_forward — skipping it under
        # use_rgb_conv would feed embed_coords raw 2/3-channel maps where the
        # params expect the 64-channel RITM transform output
        if self.maps_transform is not None:
            coord_features = self.maps_transform(coord_features)
        coord_tokens = self.embed_coords(coord_features)
        lr_feats = self.backbone(image, coord_tokens)
        hr_feats = self.upsampler(lr_feats, image)
        if self.upsampler_type in ("identity", "lift"):
            h, w = image.shape[1], image.shape[2]
            hr_feats = resize(hr_feats, (h, w), "bilinear", align_corners=True)
        return {"coord_features": coord_features}, {
            "LowRes": lr_feats,
            "HighRes": hr_feats,
        }


def filter_state_dict(params: Dict, save_cfg: Optional[Dict]) -> Dict:
    """Filter a params pytree by the save_cfg include/exclude tree
    (reference: iseg_probe_model.py:199-258): keys of save_cfg are top-level
    submodules mapped to True/False or {'save': bool, 'exclude': [names]}."""
    if not save_cfg:
        return params

    def included(path: Tuple[str, ...]) -> bool:
        cfg: Any = save_cfg
        for part in path:
            if isinstance(cfg, dict):
                if "exclude" in cfg and part in cfg["exclude"]:
                    return False
                cfg = cfg.get(part, None)
                if cfg is False:
                    return False
                if cfg is None:
                    return True
                if isinstance(cfg, dict) and "save" in cfg and not cfg["save"]:
                    return False
        return cfg is not False

    def walk(tree: Dict, path: Tuple[str, ...]) -> Dict:
        out = {}
        for k, v in tree.items():
            p = path + (k,)
            if isinstance(v, dict):
                sub = walk(v, p)
                if sub:
                    out[k] = sub
            elif included(p):
                out[k] = v
        return out

    return walk(params, ())
