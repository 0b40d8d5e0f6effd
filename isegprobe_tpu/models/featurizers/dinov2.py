"""DINOv2 featurizer adapter (reference: core/model/featurizers/DINOv2.py:468-546).

Wraps the unified ViT configured as DINOv2-S/14 and implements the three
click-feature injection modes. Output is an NHWC feature map [B, h, w, 384].
"""

from __future__ import annotations

from typing import Any

import flax.linen as nn
import jax.numpy as jnp

from isegprobe_tpu.models.vit import ViT, ViTConfig

DINOV2_ARCHS = {
    # dinov2_vits14: patch 14, dim 384, depth 12, heads 6, LayerScale,
    # pretrained at 518x518 -> 37x37 pos-embed grid
    "dinov2_vits14": ViTConfig(
        patch_size=14,
        embed_dim=384,
        depth=12,
        num_heads=6,
        mlp_ratio=4.0,
        qkv_bias=True,
        layerscale=True,
        norm_eps=1e-6,
        pretrain_grid=(37, 37),
        interpolate_offset=0.1,
    ),
}

INJECTION_MODES = ("no_injection", "before_backbone", "after_backbone")


class DINOv2Featurizer(nn.Module):
    arch: str = "dinov2_vits14"
    feats_injection_mode: str = "no_injection"
    # override for eval-time pre-interpolated pos embeddings
    # (reference: utils/pos_embed.py:110-150 mutates grid_size the same way)
    pretrain_grid: Any = None
    dtype: Any = jnp.float32
    attn_impl: str = "auto"
    remat_blocks: bool = False  # recompute blocks in bwd (high-res training)
    quant: Any = None  # 'int8': W8A8 dense layers (ops/quant.py)

    @property
    def patch_size(self) -> int:
        return DINOV2_ARCHS[self.arch].patch_size

    @property
    def embed_dim(self) -> int:
        return DINOV2_ARCHS[self.arch].embed_dim

    def setup(self):
        if self.arch not in DINOV2_ARCHS:
            raise NotImplementedError(f"Unknown DINOv2 arch: {self.arch}")
        if self.feats_injection_mode not in INJECTION_MODES:
            raise ValueError(f"Unknown injection mode: {self.feats_injection_mode}")
        import dataclasses

        overrides = dict(dtype=self.dtype, attn_impl=self.attn_impl,
                         remat_blocks=self.remat_blocks, quant=self.quant)
        if self.pretrain_grid is not None:
            overrides["pretrain_grid"] = tuple(self.pretrain_grid)
        cfg = dataclasses.replace(DINOV2_ARCHS[self.arch], **overrides)
        self.model = ViT(cfg, name="model")

    def __call__(
        self, x: jnp.ndarray, additional_features: jnp.ndarray | None = None
    ) -> jnp.ndarray:
        """x: [B, H, W, 3]; additional_features: [B, N, D] click tokens."""
        b, h, w, _ = x.shape
        p = self.patch_size
        gh, gw = h // p, w // p
        mode = self.feats_injection_mode

        if additional_features is not None and mode == "before_backbone":
            tokens = self.model.embed_patches(x)
            tokens = tokens + additional_features.astype(tokens.dtype)
            feats = self.model.forward_tokens(tokens, (gh, gw))["patch_tokens"]
        else:
            feats = self.model(x)["patch_tokens"]
            if additional_features is not None and mode == "after_backbone":
                feats = feats.astype(jnp.float32) + additional_features.astype(
                    jnp.float32
                )

        return feats.reshape(b, gh, gw, self.embed_dim)

    def masked_forward(
        self,
        x: jnp.ndarray,
        additional_features: jnp.ndarray | None,
        valid_grid: jnp.ndarray,
    ) -> jnp.ndarray:
        """Canvas forward with per-sample traced valid token grids
        (``valid_grid`` [B, 2]) — the adaptive-ZoomIn compiled eval
        (inference/adaptive_eval.py). Valid-rect outputs equal ``__call__``
        on the true-size image (ViT.forward_tokens_masked)."""
        b, h, w, _ = x.shape
        p = self.patch_size
        gh_cap, gw_cap = h // p, w // p
        mode = self.feats_injection_mode

        tokens = self.model.embed_patches(x)
        if additional_features is not None and mode == "before_backbone":
            tokens = tokens + additional_features.astype(tokens.dtype)
        feats = self.model.forward_tokens_masked(
            tokens, (gh_cap, gw_cap), valid_grid)["patch_tokens"]
        if additional_features is not None and mode == "after_backbone":
            feats = feats.astype(jnp.float32) + additional_features.astype(
                jnp.float32)
        return feats.reshape(b, gh_cap, gw_cap, self.embed_dim)
