"""DINO / plain-ViT featurizer adapter (reference: core/model/featurizers/DINO.py:470-611).

Probes either the output patch tokens ('token') or the key vectors of the last
attention block ('key', the default used in the reference's ViT experiments).
"""

from __future__ import annotations

from typing import Any

import flax.linen as nn
import jax.numpy as jnp

from isegprobe_tpu.models.vit import ViT, ViTConfig

# Underlying trunk is always DINO vit_small (reference: DINO.py:496); the arch
# string selects which pretrained weights get converted into it.
DINO_TRUNK = ViTConfig(
    patch_size=16,
    embed_dim=384,
    depth=12,
    num_heads=6,
    mlp_ratio=4.0,
    qkv_bias=True,
    layerscale=False,
    norm_eps=1e-6,
    pretrain_grid=(14, 14),  # 224/16
    interpolate_offset=0.1,
)


class DINOFeaturizer(nn.Module):
    arch: str = "dino_vits16"
    patch_size: int = 16
    feat_type: str = "key"  # 'key' | 'token'
    feats_injection_mode: str = "no_injection"
    pretrain_grid: Any = None  # eval-time pre-interpolated pos-embed grid
    dtype: Any = jnp.float32
    attn_impl: str = "auto"
    remat_blocks: bool = False  # recompute blocks in bwd (high-res training)
    quant: Any = None  # 'int8': W8A8 dense layers (ops/quant.py)

    @property
    def embed_dim(self) -> int:
        return DINO_TRUNK.embed_dim

    def setup(self):
        import dataclasses

        from isegprobe_tpu.models.featurizers.dinov2 import INJECTION_MODES

        if self.feats_injection_mode not in INJECTION_MODES:
            # a typo'd mode would otherwise silently drop all click features
            raise ValueError(
                f"Unknown injection mode: {self.feats_injection_mode}")
        overrides = dict(patch_size=self.patch_size, dtype=self.dtype,
                         attn_impl=self.attn_impl,
                         remat_blocks=self.remat_blocks, quant=self.quant)
        if self.pretrain_grid is not None:
            overrides["pretrain_grid"] = tuple(self.pretrain_grid)
        cfg = dataclasses.replace(DINO_TRUNK, **overrides)
        self.model = ViT(cfg, name="model")

    def __call__(
        self, x: jnp.ndarray, additional_features: jnp.ndarray | None = None
    ) -> jnp.ndarray:
        b, h, w, _ = x.shape
        gh, gw = h // self.patch_size, w // self.patch_size
        mode = self.feats_injection_mode

        tokens = self.model.embed_patches(x)
        if additional_features is not None and mode == "before_backbone":
            tokens = tokens + additional_features.astype(tokens.dtype)

        out = self.model.forward_tokens(
            tokens, (gh, gw), return_last_k=(self.feat_type == "key")
        )

        if self.feat_type == "token":
            feats = out["patch_tokens"]
        elif self.feat_type == "key":
            # last block's keys, cls removed, heads flattened
            # (reference: DINO.py:588-603)
            k = out["last_k"][:, 1:]  # [B, N, H, Dh]
            feats = k.reshape(b, gh * gw, self.embed_dim)
        else:
            raise ValueError(f"Unknown feat_type: {self.feat_type}")

        if additional_features is not None and mode == "after_backbone":
            feats = feats + additional_features.astype(feats.dtype)

        return feats.reshape(b, gh, gw, self.embed_dim)

    def masked_forward(
        self,
        x: jnp.ndarray,
        additional_features: jnp.ndarray | None,
        valid_grid: jnp.ndarray,
    ) -> jnp.ndarray:
        """Canvas forward with per-sample traced valid token grids
        ([B, 2]) — the adaptive-ZoomIn compiled eval. Both probing modes are
        exact on the valid rect: 'token' via the masked blocks, 'key'
        because key vectors are pointwise projections of tokens the masked
        attention already makes exact (tests/test_adaptive_eval.py)."""
        b, h, w, _ = x.shape
        gh_cap, gw_cap = h // self.patch_size, w // self.patch_size
        mode = self.feats_injection_mode

        tokens = self.model.embed_patches(x)
        if additional_features is not None and mode == "before_backbone":
            tokens = tokens + additional_features.astype(tokens.dtype)
        out = self.model.forward_tokens_masked(
            tokens, (gh_cap, gw_cap), valid_grid,
            return_last_k=(self.feat_type == "key"))
        if self.feat_type == "token":
            feats = out["patch_tokens"]
        elif self.feat_type == "key":
            k = out["last_k"][:, 1:]  # [B, N, H, Dh]
            feats = k.reshape(b, gh_cap * gw_cap, self.embed_dim)
        else:
            raise ValueError(f"Unknown feat_type: {self.feat_type}")
        if additional_features is not None and mode == "after_backbone":
            feats = feats + additional_features.astype(feats.dtype)
        return feats.reshape(b, gh_cap, gw_cap, self.embed_dim)
