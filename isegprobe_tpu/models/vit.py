"""Unified Vision Transformer core (flax.linen), parameterized to express every
backbone family the reference uses — DINO-S/16, DINOv2-S/14 (LayerScale),
CLIP-B/16 (pre-LN + QuickGELU + final projection) and the trainable SimpleViT
click encoder.

One implementation instead of the reference's four in-repo ViT copies
(reference: core/model/featurizers/DINO.py:213-377, DINOv2.py:53-351,
maskclip/model.py, simple_ViT.py:96-155). Featurizer adapters in
``models/featurizers`` add click-feature injection around the exposed
``embed_patches`` / ``forward_tokens`` seams.

All images are NHWC. Compute dtype is configurable; the eval path keeps f32 for
NoC parity, training may use bf16.
"""

from __future__ import annotations

import dataclasses
import math
from typing import Any, Sequence

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from isegprobe_tpu.ops.attention import _mha_jnp, mha, mha_qkv
from isegprobe_tpu.ops.layernorm import layernorm
from isegprobe_tpu.ops.resize import resize


@dataclasses.dataclass(frozen=True)
class ViTConfig:
    patch_size: int = 14
    embed_dim: int = 384
    depth: int = 12
    num_heads: int = 6
    mlp_ratio: float = 4.0
    qkv_bias: bool = True
    proj_bias: bool = True
    ffn_bias: bool = True
    layerscale: bool = False  # DINOv2: True
    # DINOv2 hub builder passes init_values=1e-5; matters only for random
    # init (converted checkpoints overwrite it) — near-identity blocks keep
    # the patch/click signal readable by a probe trained on a random backbone
    layerscale_init: float = 1e-5
    act: str = "gelu"  # 'gelu' (exact) | 'quick_gelu' (CLIP)
    norm_eps: float = 1e-6
    class_token: bool = True
    # pos-embed grid the checkpoint was pretrained at (DINOv2-S/14: 518/14=37)
    pretrain_grid: tuple[int, int] = (37, 37)
    # DINO/DINOv2 '+0.1' scale-factor trick for pos-embed interpolation
    # (reference: core/model/featurizers/DINOv2.py:212-222); None = plain
    # size-based bicubic (the interpolate_pos_embed_inference convention,
    # reference: core/model/featurizers/utils/pos_embed.py:110-150).
    interpolate_offset: float | None = 0.1
    dtype: Any = jnp.float32
    attn_impl: str = "auto"
    # rematerialize each transformer block in the backward pass: activations
    # per block are recomputed instead of stored — the TPU-native memory/
    # compute trade for training at high resolution (e.g. 448² LoftUp runs)
    remat_blocks: bool = False
    # 'int8': run the block dense layers (qkv/proj/fc1/fc2) as dynamic W8A8
    # int8 MXU matmuls (ops/quant.py) — the opt-in serving knob; None = the
    # configured float dtype everywhere
    quant: str | None = None


def mm_precision(dtype) -> jax.lax.Precision | None:
    """Matmul precision for a module of compute dtype ``dtype``.

    The package pins ``jax_default_matmul_precision=float32`` globally so f32
    matmuls are exact (torch parity). bf16 layers override it with an
    explicit DEFAULT: (a) Mosaic rejects bf16 Pallas dots that inherit the
    f32 contract precision ("Bad lhs type", ops/attention.py), and (b) the
    intent — one-pass bf16 MXU with f32 accumulation — should not depend on a
    global flag. On the current libtpu the XLA-side timing is precision-
    insensitive for bf16 operands (measured equal across
    None/DEFAULT/HIGHEST, docs/PERF.md), so this is about correctness of
    intent and kernel compatibility, not an XLA speedup. f32 returns None =
    inherit the global exact setting."""
    return None if dtype == jnp.float32 else jax.lax.Precision.DEFAULT


def _dense(quant: str | None, features: int, use_bias: bool, dtype,
           name: str) -> nn.Module:
    """Block dense layer: nn.Dense, or the int8 dynamic-quant drop-in
    (identical param tree) when quant='int8'."""
    if quant == "int8":
        from isegprobe_tpu.ops.quant import QuantDense

        return QuantDense(features, use_bias=use_bias, dtype=dtype, name=name)
    if quant is not None:
        raise ValueError(f"Unknown quant mode: {quant!r}")
    return nn.Dense(features, use_bias=use_bias, dtype=dtype,
                    precision=mm_precision(dtype), name=name)


def _act_fn(name: str, x: jnp.ndarray) -> jnp.ndarray:
    if name == "gelu":
        return jax.nn.gelu(x, approximate=False)
    if name == "quick_gelu":
        return x * jax.nn.sigmoid(1.702 * x)
    raise ValueError(f"Unknown activation: {name}")


class PatchEmbed(nn.Module):
    """Conv patch embedding: NHWC image -> [B, N, D] tokens."""

    patch_size: int
    embed_dim: int
    dtype: Any = jnp.float32
    use_bias: bool = True

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        p = self.patch_size
        x = nn.Conv(
            self.embed_dim,
            kernel_size=(p, p),
            strides=(p, p),
            padding="VALID",
            use_bias=self.use_bias,
            dtype=self.dtype,
            precision=mm_precision(self.dtype),
            name="proj",
        )(x)
        b, h, w, d = x.shape
        return x.reshape(b, h * w, d)


class Attention(nn.Module):
    dim: int
    num_heads: int
    qkv_bias: bool = True
    proj_bias: bool = True
    dtype: Any = jnp.float32
    attn_impl: str = "auto"
    quant: str | None = None

    @nn.compact
    def __call__(self, x: jnp.ndarray, return_k: bool = False,
                 key_mask: jnp.ndarray | None = None):
        b, n, c = x.shape
        dh = c // self.num_heads
        qkv = _dense(self.quant, 3 * c, self.qkv_bias, self.dtype,
                     name="qkv")(x)
        if return_k:
            # DINO key-probing needs k back: take the generic split path.
            # Keys are pointwise projections, so the masked (adaptive
            # canvas) path returns them unchanged; only the softmax masks.
            t = qkv.reshape(b, n, 3, self.num_heads, dh)
            q, k, v = t[:, :, 0], t[:, :, 1], t[:, :, 2]  # [B, N, H, Dh]
            if key_mask is not None:
                out = _mha_jnp(q, k, v, dh**-0.5, key_mask=key_mask)
            else:
                out = mha(q, k, v, scale=dh**-0.5, impl=self.attn_impl)
            out = out.reshape(b, n, c)
        else:
            # packed path: the fused kernel consumes qkv with one relayout
            out = mha_qkv(qkv, self.num_heads, scale=dh**-0.5,
                          impl=self.attn_impl, key_mask=key_mask)
            k = None
        out = _dense(self.quant, c, self.proj_bias, self.dtype,
                     name="proj")(out)
        if return_k:
            return out, k
        return out


class Mlp(nn.Module):
    dim: int
    hidden_dim: int
    act: str = "gelu"
    use_bias: bool = True
    dtype: Any = jnp.float32
    quant: str | None = None

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        x = _dense(self.quant, self.hidden_dim, self.use_bias, self.dtype,
                   name="fc1")(x)
        x = _act_fn(self.act, x)
        x = _dense(self.quant, self.dim, self.use_bias, self.dtype,
                   name="fc2")(x)
        return x


class LayerScale(nn.Module):
    dim: int
    init_value: float = 1e-5

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        gamma = self.param(
            "gamma", nn.initializers.constant(self.init_value), (self.dim,)
        )
        return x * gamma


class FusedLayerNorm(nn.Module):
    """Drop-in for ``nn.LayerNorm`` (identical param names/shapes/numerics of
    the f32-stats fast-variance default) backed by the one-pass Pallas kernel
    in ops/layernorm.py — stats computed in f32 in registers, one HBM
    read+write. Standalone this beats XLA's split stats/normalize fusions;
    inside the full ViT forward XLA already fuses LN into the adjacent
    matmuls, so the in-program effect is near-neutral (trace accounting in
    docs/PERF.md) — the kernel's main value is for LN uses XLA cannot fuse
    and as the pattern for row-wise fused ops."""

    epsilon: float = 1e-6
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        d = x.shape[-1]
        scale = self.param("scale", nn.initializers.ones, (d,))
        bias = self.param("bias", nn.initializers.zeros, (d,))
        return layernorm(x.astype(self.dtype), scale, bias, eps=self.epsilon)


def _ln(c: ViTConfig, name: str) -> nn.Module:
    """f32 modules keep flax's ``nn.LayerNorm`` (bit-exact golden parity with
    the torch reference); bf16 modules use the fused one-pass kernel, whose
    f32-in-register stats differ from XLA's only in reduction order — the
    bf16 output rounding absorbs it (tests/test_layernorm.py)."""
    if c.dtype == jnp.float32:
        return nn.LayerNorm(epsilon=c.norm_eps, dtype=c.dtype, name=name)
    return FusedLayerNorm(epsilon=c.norm_eps, dtype=c.dtype, name=name)


class Block(nn.Module):
    cfg: ViTConfig

    @nn.compact
    def __call__(self, x: jnp.ndarray, return_k: bool = False,
                 key_mask: jnp.ndarray | None = None):
        c = self.cfg
        h = _ln(c, name="norm1")(x)
        attn = Attention(
            c.embed_dim, c.num_heads, c.qkv_bias, c.proj_bias, c.dtype,
            c.attn_impl, c.quant, name="attn",
        )
        if return_k:
            a, k = attn(h, return_k=True, key_mask=key_mask)
        else:
            a, k = attn(h, key_mask=key_mask), None
        if c.layerscale:
            a = LayerScale(c.embed_dim, c.layerscale_init, name="ls1")(a)
        x = x + a
        h2 = _ln(c, name="norm2")(x)
        m = Mlp(c.embed_dim, int(c.embed_dim * c.mlp_ratio), c.act, c.ffn_bias,
                c.dtype, c.quant, name="mlp")(h2)
        if c.layerscale:
            m = LayerScale(c.embed_dim, c.layerscale_init, name="ls2")(m)
        x = x + m
        if return_k:
            return x, k
        return x


class ViT(nn.Module):
    """The transformer trunk with cls token + interpolated pos embeddings.

    Exposed seams (used by featurizer adapters for click injection):
      * ``embed_patches(img)`` -> patch tokens [B, N, D]
      * ``forward_tokens(tokens, grid_hw)`` -> dict with normalized tokens
        (and optionally the last block's key vectors for DINO's 'key' probing,
        reference: core/model/featurizers/DINO.py:588-603).
    """

    cfg: ViTConfig

    def setup(self):
        c = self.cfg
        self.patch_embed = PatchEmbed(c.patch_size, c.embed_dim, c.dtype,
                                      name="patch_embed")
        if c.class_token:
            self.cls_token = self.param(
                "cls_token", nn.initializers.zeros, (1, 1, c.embed_dim)
            )
        gh, gw = c.pretrain_grid
        n_tokens = gh * gw + (1 if c.class_token else 0)
        self.pos_embed = self.param(
            "pos_embed",
            nn.initializers.truncated_normal(0.02),
            (1, n_tokens, c.embed_dim),
        )
        self.blocks = [Block(c, name=f"blocks_{i}") for i in range(c.depth)]
        self.norm = _ln(c, name="norm")

    def interpolated_pos_embed(self, grid_hw: tuple[int, int]) -> jnp.ndarray:
        """Bicubic pos-embed interpolation to a new token grid, with the
        DINO-family '+offset' scale trick when configured."""
        c = self.cfg
        gh0, gw0 = c.pretrain_grid
        gh, gw = grid_hw
        pe = self.pos_embed.astype(jnp.float32)
        n_extra = 1 if c.class_token else 0
        if (gh, gw) == (gh0, gw0):
            return pe
        extra, patch_pe = pe[:, :n_extra], pe[:, n_extra:]
        patch_pe = patch_pe.reshape(1, gh0, gw0, c.embed_dim)
        if c.interpolate_offset is not None:
            scales = ((gh + c.interpolate_offset) / gh0,
                      (gw + c.interpolate_offset) / gw0)
        else:
            scales = None
        patch_pe = resize(patch_pe, (gh, gw), "bicubic", align_corners=False,
                          scales=scales)
        patch_pe = patch_pe.reshape(1, gh * gw, c.embed_dim)
        return jnp.concatenate([extra, patch_pe], axis=1)

    def embed_patches(self, img: jnp.ndarray) -> jnp.ndarray:
        """NHWC image -> patch tokens [B, N, D] (pre cls/pos)."""
        return self.patch_embed(img)

    def dynamic_pos_embed(self, canvas_grid: tuple[int, int],
                          valid_grid) -> jnp.ndarray:
        """Pos embeddings interpolated to per-sample TRACED token grids,
        laid out row-major on the STATIC canvas grid (zero beyond each
        sample's valid rect). ``valid_grid``: [B, 2] int array. Replicates
        ``interpolated_pos_embed``'s torch semantics — including the
        exact-size short-circuit (the reference returns the raw table
        untouched when the grid matches pretraining, reference:
        core/model/featurizers/DINOv2.py:199-230). Returns [B, n_extra+N, D]
        (f32)."""
        from isegprobe_tpu.ops.dynamic_resize import dyn_matrix

        c = self.cfg
        gh0, gw0 = c.pretrain_grid
        gh_cap, gw_cap = canvas_grid
        pe = self.pos_embed.astype(jnp.float32)
        n_extra = 1 if c.class_token else 0
        extra, patch_pe = pe[:, :n_extra], pe[:, n_extra:]
        patch_pe = patch_pe.reshape(gh0, gw0, c.embed_dim)

        def one(vg):
            gh, gw = vg[0], vg[1]
            ghf = gh.astype(jnp.float32)
            gwf = gw.astype(jnp.float32)
            if c.interpolate_offset is not None:
                scales = ((ghf + c.interpolate_offset) / gh0,
                          (gwf + c.interpolate_offset) / gw0)
            else:
                scales = (ghf / gh0, gwf / gw0)
            mr = dyn_matrix(gh0, gh_cap, gh0, gh, "bicubic", False, scales[0])
            mc = dyn_matrix(gw0, gw_cap, gw0, gw, "bicubic", False, scales[1])
            interp = jnp.einsum("oh,hwc->owc", mr, patch_pe)
            interp = jnp.einsum("ow,hwc->hoc", mc, interp)
            ii = jnp.arange(gh_cap)
            jj = jnp.arange(gw_cap)
            valid = (ii[:, None] < gh) & (jj[None, :] < gw)
            # exact-size short-circuit: lay the raw table out instead
            if gh0 <= gh_cap and gw0 <= gw_cap:
                raw = jnp.zeros((gh_cap, gw_cap, c.embed_dim), jnp.float32)
                raw = raw.at[:gh0, :gw0].set(patch_pe)
                same = (gh == gh0) & (gw == gw0)
                interp = jnp.where(same, raw, interp)
            out = jnp.where(valid[:, :, None], interp, 0.0)
            return out.reshape(gh_cap * gw_cap, c.embed_dim)

        patch = jax.vmap(one)(jnp.asarray(valid_grid))  # [B, N, D]
        b = patch.shape[0]
        return jnp.concatenate(
            [jnp.broadcast_to(extra, (b, n_extra, c.embed_dim)), patch],
            axis=1)

    def forward_tokens_masked(
        self,
        tokens: jnp.ndarray,
        canvas_grid: tuple[int, int],
        valid_grid,
        return_last_k: bool = False,
    ) -> dict:
        """``forward_tokens`` on a static canvas grid whose top-left traced
        per-sample (gh, gw) rect is valid (``valid_grid``: [B, 2]): pos
        embeddings interpolate to each sample's dynamic grid, and invalid
        tokens are excluded from every attention softmax, so valid tokens'
        outputs equal running the plain ViT on the true
        (gh*patch, gw*patch) image (tests/test_masked_vit.py).
        Serving-path only (no remat, no key probing)."""
        c = self.cfg
        b = tokens.shape[0]
        gh_cap, gw_cap = canvas_grid
        vg = jnp.asarray(valid_grid)
        ii = jnp.arange(gh_cap)
        jj = jnp.arange(gw_cap)
        patch_valid = ((ii[None, :, None] < vg[:, 0, None, None])
                       & (jj[None, None, :] < vg[:, 1, None, None]))
        patch_valid = patch_valid.reshape(b, gh_cap * gw_cap)
        if c.class_token:
            cls = jnp.broadcast_to(
                self.cls_token.astype(tokens.dtype), (b, 1, c.embed_dim)
            )
            tokens = jnp.concatenate([cls, tokens], axis=1)
            mask = jnp.concatenate(
                [jnp.ones((b, 1), jnp.bool_), patch_valid], axis=1)
        else:
            mask = patch_valid
        pe = self.dynamic_pos_embed(canvas_grid, vg)
        x = tokens + pe.astype(tokens.dtype)
        # numerical hygiene: invalid lanes carry conv-of-zeros + clamped pe
        # taps; they are attention-masked anyway, but keep them bounded
        x = x * mask[:, :, None].astype(x.dtype)
        last_k = None
        for i, blk in enumerate(self.blocks):
            want_k = return_last_k and i == c.depth - 1
            if want_k:
                x, last_k = blk(x, return_k=True, key_mask=mask)
            else:
                x = blk(x, key_mask=mask)
        x = self.norm(x)
        out = {
            "tokens": x,
            "patch_tokens": x[:, 1:] if c.class_token else x,
        }
        if return_last_k:
            out["last_k"] = last_k
        return out

    def forward_tokens(
        self,
        tokens: jnp.ndarray,
        grid_hw: tuple[int, int],
        return_last_k: bool = False,
        last_n_norm: int = 1,
    ) -> dict:
        """Run cls-concat + pos-embed + blocks + final norm.

        Returns dict:
          'tokens': [B, 1+N, D] normalized output tokens (cls first if present)
          'patch_tokens': [B, N, D] normalized patch tokens
          'last_k': [B, 1+N, H, Dh] key vectors of the final block (optional)
        """
        c = self.cfg
        b = tokens.shape[0]
        if c.class_token:
            cls = jnp.broadcast_to(
                self.cls_token.astype(tokens.dtype), (b, 1, c.embed_dim)
            )
            tokens = jnp.concatenate([cls, tokens], axis=1)
        pe = self.interpolated_pos_embed(grid_hw).astype(tokens.dtype)
        x = tokens + pe

        last_k = None
        blk_call = (nn.remat(lambda mdl, t: mdl(t)) if c.remat_blocks
                    else (lambda mdl, t: mdl(t)))
        for i, blk in enumerate(self.blocks):
            want_k = return_last_k and i == c.depth - 1
            if want_k:
                x, last_k = blk(x, return_k=True)
            else:
                x = blk_call(blk, x)
        x = self.norm(x)

        out = {
            "tokens": x,
            "patch_tokens": x[:, 1:] if c.class_token else x,
        }
        if return_last_k:
            out["last_k"] = last_k
        return out

    def __call__(
        self,
        img: jnp.ndarray,
        inject: jnp.ndarray | None = None,
        return_last_k: bool = False,
    ) -> dict:
        """Full forward: NHWC image (+optional pre-backbone token injection)."""
        h, w = img.shape[1], img.shape[2]
        grid_hw = (h // self.cfg.patch_size, w // self.cfg.patch_size)
        tokens = self.embed_patches(img)
        if inject is not None:
            tokens = tokens + inject.astype(tokens.dtype)
        return self.forward_tokens(tokens, grid_hw, return_last_k=return_last_k)


def posemb_sincos_2d(h: int, w: int, dim: int, temperature: float = 10000.0) -> np.ndarray:
    """lucidrains SimpleViT fixed 2-D sincos embedding
    (reference: core/model/featurizers/simple_ViT.py:18-27)."""
    y, x = np.meshgrid(np.arange(h), np.arange(w), indexing="ij")
    assert dim % 4 == 0
    omega = np.arange(dim // 4) / (dim // 4 - 1)
    omega = 1.0 / temperature**omega
    y = y.flatten()[:, None] * omega[None, :]
    x = x.flatten()[:, None] * omega[None, :]
    return np.concatenate(
        [np.sin(x), np.cos(x), np.sin(y), np.cos(y)], axis=1
    ).astype(np.float32)


def get_2d_sincos_pos_embed(embed_dim: int, grid_size: int, cls_token: bool = False) -> np.ndarray:
    """MoCo-v3-style 2-D sincos pos embedding (reference:
    core/model/featurizers/utils/pos_embed.py:22-70)."""
    def _1d(dim, pos):
        omega = np.arange(dim // 2, dtype=np.float64) / (dim / 2.0)
        omega = 1.0 / 10000**omega
        out = np.einsum("m,d->md", pos.reshape(-1), omega)
        return np.concatenate([np.sin(out), np.cos(out)], axis=1)

    grid_h = np.arange(grid_size, dtype=np.float32)
    grid_w = np.arange(grid_size, dtype=np.float32)
    grid = np.stack(np.meshgrid(grid_w, grid_h), axis=0).reshape(2, -1)
    emb = np.concatenate([_1d(embed_dim // 2, grid[0]), _1d(embed_dim // 2, grid[1])], axis=1)
    if cls_token:
        emb = np.concatenate([np.zeros((1, embed_dim)), emb], axis=0)
    return emb.astype(np.float32)
