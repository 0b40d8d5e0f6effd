"""MaskCLIP featurizer: dense CLIP features via the value-projection trick
(reference: core/model/featurizers/MaskCLIP.py:13-92, maskclip/model.py:225-432,
maskclip/interpolate.py:5-60).

CLIP's ViT differs from the DINO family: pre-LN stem (ln_pre), QuickGELU MLP,
torch-MultiheadAttention packed projections, a 2-D positional embedding without
a batch dim, and a final ln_post + linear projection to the shared space. Dense
per-patch features run blocks 0..L-2 normally and replace the last block by its
value path only: out_proj(v_proj(ln_1(x))) — no attention, no residual
(model.py:251-264). Param names mirror the CLIP checkpoint for mechanical
conversion.
"""

from __future__ import annotations

from typing import Any

import flax.linen as nn
import jax
import jax.numpy as jnp

from isegprobe_tpu.models.vit import mm_precision
from isegprobe_tpu.ops.attention import mha
from isegprobe_tpu.ops.resize import resize

CLIP_ARCHS = {
    # ViT-B/16: the only arch the reference supports (model_builder.py:29-33)
    "ViT-B/16": dict(patch_size=16, width=768, layers=12, heads=12,
                     output_dim=512, pretrain_grid=14),
}


class _CLIPAttention(nn.Module):
    """torch nn.MultiheadAttention layout: packed in_proj + out_proj.

    ``causal=True`` applies the text tower's additive upper-triangular mask
    (reference model.py:529-535); at 77 tokens the plain-jnp masked form is
    the right tool (no kernel, one fused XLA attention)."""

    width: int
    heads: int
    attn_impl: str = "auto"
    causal: bool = False
    quant: Any = None  # 'int8': W8A8 dense layers (ops/quant.py)
    dtype: Any = jnp.float32  # compute dtype (params stay f32)

    def setup(self):
        d = self.width
        self.in_proj_weight = self.param(
            "in_proj_weight", nn.initializers.xavier_uniform(), (3 * d, d)
        )
        self.in_proj_bias = self.param("in_proj_bias", nn.initializers.zeros,
                                       (3 * d,))
        if self.quant == "int8":
            from isegprobe_tpu.ops.quant import QuantDense

            self.out_proj = QuantDense(d, name="out_proj")
        else:
            self.out_proj = nn.Dense(d, dtype=self.dtype,
                                     precision=mm_precision(self.dtype),
                                     name="out_proj")

    def _qkv(self, x: jnp.ndarray) -> jnp.ndarray:
        """x @ in_proj.T + bias — the packed torch MultiheadAttention stem;
        int8 keeps the same param (the transpose is free inside the quant
        matmul's weight pass)."""
        if self.quant == "int8":
            from isegprobe_tpu.ops.quant import int8_dynamic_matmul

            return (int8_dynamic_matmul(x, self.in_proj_weight.T)
                    .astype(x.dtype) + self.in_proj_bias.astype(x.dtype))
        w = self.in_proj_weight.astype(self.dtype)
        return (jnp.matmul(x.astype(self.dtype), w.T,
                           precision=mm_precision(self.dtype))
                + self.in_proj_bias.astype(self.dtype))

    def __call__(self, x: jnp.ndarray,
                 key_mask: jnp.ndarray | None = None) -> jnp.ndarray:
        d = self.width
        dh = d // self.heads
        qkv = self._qkv(x)
        q, k, v = jnp.split(qkv, 3, axis=-1)
        b, n, _ = x.shape
        if key_mask is not None:
            # adaptive-canvas eval: exclude invalid tokens from every
            # softmax (ops/attention._mha_jnp masked path)
            assert not self.causal
            from isegprobe_tpu.ops.attention import _mha_jnp

            out = _mha_jnp(
                q.reshape(b, n, self.heads, dh),
                k.reshape(b, n, self.heads, dh),
                v.reshape(b, n, self.heads, dh),
                dh**-0.5, key_mask=key_mask,
            ).reshape(b, n, d)
            return self.out_proj(out)
        if self.causal:
            qh = q.reshape(b, n, self.heads, dh)
            kh = k.reshape(b, n, self.heads, dh)
            vh = v.reshape(b, n, self.heads, dh)
            prec = (jax.lax.Precision.HIGHEST if x.dtype == jnp.float32
                    else jax.lax.Precision.DEFAULT)
            s = jnp.einsum("bqhd,bkhd->bhqk", qh, kh, precision=prec,
                           preferred_element_type=jnp.float32) * dh**-0.5
            mask = jnp.triu(jnp.full((n, n), -jnp.inf, jnp.float32), k=1)
            p = jax.nn.softmax(s + mask, axis=-1)
            out = jnp.einsum("bhqk,bkhd->bqhd", p.astype(vh.dtype), vh,
                             precision=prec,
                             preferred_element_type=jnp.float32)
            return self.out_proj(out.astype(x.dtype).reshape(b, n, d))
        out = mha(
            q.reshape(b, n, self.heads, dh),
            k.reshape(b, n, self.heads, dh),
            v.reshape(b, n, self.heads, dh),
            scale=dh**-0.5,
            impl=self.attn_impl,
        ).reshape(b, n, d)
        return self.out_proj(out)

    def value_path(self, x: jnp.ndarray) -> jnp.ndarray:
        """out_proj(v_proj(x)) — the MaskCLIP dense trick (model.py:251-264)."""
        d = self.width
        w = self.in_proj_weight[2 * d :].astype(self.dtype)
        v = (jnp.matmul(x.astype(self.dtype), w.T,
                        precision=mm_precision(self.dtype))
             + self.in_proj_bias[2 * d :].astype(self.dtype))
        return self.out_proj(v)


class _CLIPBlock(nn.Module):
    width: int
    heads: int
    attn_impl: str = "auto"
    causal: bool = False
    quant: Any = None
    dtype: Any = jnp.float32  # compute dtype; LN stats stay f32 (flax default)

    def setup(self):
        self.ln_1 = nn.LayerNorm(epsilon=1e-5, dtype=self.dtype, name="ln_1")
        self.attn = _CLIPAttention(self.width, self.heads, self.attn_impl,
                                   self.causal, self.quant, self.dtype,
                                   name="attn")
        self.ln_2 = nn.LayerNorm(epsilon=1e-5, dtype=self.dtype, name="ln_2")
        if self.quant == "int8":
            from isegprobe_tpu.ops.quant import QuantDense

            self.c_fc = QuantDense(self.width * 4, name="c_fc")
            self.c_proj = QuantDense(self.width, name="c_proj")
        else:
            prec = mm_precision(self.dtype)
            self.c_fc = nn.Dense(self.width * 4, dtype=self.dtype,
                                 precision=prec, name="c_fc")
            self.c_proj = nn.Dense(self.width, dtype=self.dtype,
                                   precision=prec, name="c_proj")

    def _mlp(self, x):
        h = self.c_fc(x)
        h = h * jax.nn.sigmoid(1.702 * h)  # QuickGELU (model.py:220-222)
        return self.c_proj(h)

    def __call__(self, x: jnp.ndarray,
                 key_mask: jnp.ndarray | None = None) -> jnp.ndarray:
        x = x + self.attn(self.ln_1(x), key_mask=key_mask)
        x = x + self._mlp(self.ln_2(x))
        return x

    def forward_v(self, x: jnp.ndarray) -> jnp.ndarray:
        return self.attn.value_path(self.ln_1(x))


class CLIPVisionTransformer(nn.Module):
    patch_size: int = 16
    width: int = 768
    layers: int = 12
    heads: int = 12
    output_dim: int = 512
    pretrain_grid: int = 14
    dtype: Any = jnp.float32
    attn_impl: str = "auto"
    quant: Any = None  # 'int8': W8A8 dense layers in the resblocks

    def setup(self):
        w = self.width
        self.conv1 = nn.Conv(w, (self.patch_size, self.patch_size),
                             strides=self.patch_size, use_bias=False,
                             padding="VALID", dtype=self.dtype, name="conv1")
        self.class_embedding = self.param(
            "class_embedding", nn.initializers.normal(w**-0.5), (w,)
        )
        self.positional_embedding = self.param(
            "positional_embedding", nn.initializers.normal(w**-0.5),
            (self.pretrain_grid**2 + 1, w),
        )
        self.ln_pre = nn.LayerNorm(epsilon=1e-5, dtype=self.dtype,
                                   name="ln_pre")
        self.resblocks = [
            _CLIPBlock(w, self.heads, self.attn_impl, quant=self.quant,
                       dtype=self.dtype, name=f"resblocks_{i}")
            for i in range(self.layers)
        ]
        self.ln_post = nn.LayerNorm(epsilon=1e-5, dtype=self.dtype,
                                    name="ln_post")
        self.proj = self.param(
            "proj", nn.initializers.normal(w**-0.5), (w, self.output_dim)
        )

    def embed_patches(self, x: jnp.ndarray) -> jnp.ndarray:
        """NHWC image -> patch tokens [B, N, width]."""
        b = x.shape[0]
        t = self.conv1(x)
        return t.reshape(b, -1, self.width)

    def _interp_pos(self, grid_hw):
        """+0.1-offset bicubic pos-embed interpolation
        (maskclip/interpolate.py:5-60)."""
        gh, gw = grid_hw
        g0 = self.pretrain_grid
        pe = self.positional_embedding.astype(jnp.float32)
        if (gh, gw) == (g0, g0):
            return pe
        cls_pe, patch_pe = pe[:1], pe[1:]
        patch_pe = patch_pe.reshape(1, g0, g0, self.width)
        scales = ((gh + 0.1) / g0, (gw + 0.1) / g0)
        patch_pe = resize(patch_pe, (gh, gw), "bicubic", align_corners=False,
                          scales=scales)
        return jnp.concatenate(
            [cls_pe, patch_pe.reshape(gh * gw, self.width)], axis=0
        )

    def dense_features(self, tokens: jnp.ndarray, grid_hw) -> jnp.ndarray:
        """tokens [B, N, width] (pre cls/pos) -> dense features [B, N, out]."""
        b = tokens.shape[0]
        cls = jnp.broadcast_to(
            self.class_embedding.astype(tokens.dtype), (b, 1, self.width)
        )
        x = jnp.concatenate([cls, tokens], axis=1)
        x = x + self._interp_pos(grid_hw).astype(x.dtype)
        x = self.ln_pre(x)
        for blk in self.resblocks[:-1]:
            x = blk(x)
        x = self.resblocks[-1].forward_v(x)
        x = x[:, 1:]  # drop cls
        x = self.ln_post(x)
        return jnp.matmul(x, self.proj.astype(x.dtype),
                          precision=mm_precision(x.dtype))

    def _dyn_pos(self, canvas_grid, valid_grid) -> jnp.ndarray:
        """_interp_pos at per-sample TRACED grids, laid out on the static
        canvas grid (zero beyond each sample's rect); preserves the
        exact-size short-circuit. Returns [B, 1+N, width] (f32)."""
        from isegprobe_tpu.ops.dynamic_resize import dyn_matrix

        g0 = self.pretrain_grid
        gh_cap, gw_cap = canvas_grid
        pe = self.positional_embedding.astype(jnp.float32)
        cls_pe, patch_pe = pe[:1], pe[1:]
        patch_pe = patch_pe.reshape(g0, g0, self.width)

        def one(vg):
            gh, gw = vg[0], vg[1]
            scales = ((gh.astype(jnp.float32) + 0.1) / g0,
                      (gw.astype(jnp.float32) + 0.1) / g0)
            mr = dyn_matrix(g0, gh_cap, g0, gh, "bicubic", False, scales[0])
            mc = dyn_matrix(g0, gw_cap, g0, gw, "bicubic", False, scales[1])
            interp = jnp.einsum("oh,hwc->owc", mr, patch_pe)
            interp = jnp.einsum("ow,hwc->hoc", mc, interp)
            ii = jnp.arange(gh_cap)
            jj = jnp.arange(gw_cap)
            valid = (ii[:, None] < gh) & (jj[None, :] < gw)
            if g0 <= gh_cap and g0 <= gw_cap:
                raw = jnp.zeros((gh_cap, gw_cap, self.width), jnp.float32)
                raw = raw.at[:g0, :g0].set(patch_pe)
                interp = jnp.where((gh == g0) & (gw == g0), raw, interp)
            interp = jnp.where(valid[:, :, None], interp, 0.0)
            return interp.reshape(gh_cap * gw_cap, self.width)

        patch = jax.vmap(one)(jnp.asarray(valid_grid))
        b = patch.shape[0]
        return jnp.concatenate(
            [jnp.broadcast_to(cls_pe[None], (b, 1, self.width)), patch],
            axis=1)

    def dense_features_masked(self, tokens: jnp.ndarray, canvas_grid,
                              valid_grid) -> jnp.ndarray:
        """``dense_features`` on a static canvas grid with per-sample traced
        valid rects ([B, 2]): dynamic pos-embed, invalid tokens excluded
        from every softmax; everything after the blocks (value path,
        ln_post, projection) is pointwise (tests/test_adaptive_eval.py)."""
        b = tokens.shape[0]
        gh_cap, gw_cap = canvas_grid
        vg = jnp.asarray(valid_grid)
        ii = jnp.arange(gh_cap)
        jj = jnp.arange(gw_cap)
        patch_valid = ((ii[None, :, None] < vg[:, 0, None, None])
                       & (jj[None, None, :] < vg[:, 1, None, None]))
        patch_valid = patch_valid.reshape(b, gh_cap * gw_cap)
        mask = jnp.concatenate(
            [jnp.ones((b, 1), jnp.bool_), patch_valid], axis=1)

        cls = jnp.broadcast_to(
            self.class_embedding.astype(tokens.dtype), (b, 1, self.width)
        )
        x = jnp.concatenate([cls, tokens], axis=1)
        x = x + self._dyn_pos(canvas_grid, vg).astype(x.dtype)
        x = self.ln_pre(x)
        x = x * mask[:, :, None].astype(x.dtype)  # keep invalid lanes bounded
        for blk in self.resblocks[:-1]:
            x = blk(x, key_mask=mask)
        x = self.resblocks[-1].forward_v(x)
        x = x[:, 1:]
        x = self.ln_post(x)
        return jnp.matmul(x, self.proj.astype(x.dtype),
                          precision=mm_precision(x.dtype))

    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        h, w = x.shape[1], x.shape[2]
        grid_hw = (h // self.patch_size, w // self.patch_size)
        return self.dense_features(self.embed_patches(x), grid_hw)


class MaskCLIPFeaturizer(nn.Module):
    """Adapter with the three injection modes
    (reference: MaskCLIP.py:41-92). Output [B, gh, gw, 512]."""

    model_name: str = "ViT-B/16"
    feats_injection_mode: str = "no_injection"
    dtype: Any = jnp.float32
    attn_impl: str = "auto"
    quant: Any = None  # 'int8': W8A8 dense layers (ops/quant.py)

    @property
    def patch_size(self) -> int:
        return CLIP_ARCHS[self.model_name]["patch_size"]

    def setup(self):
        if self.model_name not in CLIP_ARCHS:
            raise ValueError(
                f"Currently unsupported model_name for MaskCLIP: {self.model_name}"
            )
        from isegprobe_tpu.models.featurizers.dinov2 import INJECTION_MODES

        if self.feats_injection_mode not in INJECTION_MODES:
            # a typo'd mode would otherwise silently drop all click features
            raise ValueError(
                f"Unknown injection mode: {self.feats_injection_mode}")
        arch = dict(CLIP_ARCHS[self.model_name])
        self.model = CLIPVisionTransformer(
            **arch, dtype=self.dtype, attn_impl=self.attn_impl,
            quant=self.quant, name="model"
        )

    def __call__(self, x, additional_features=None):
        b, h, w, _ = x.shape
        gh, gw = h // self.patch_size, w // self.patch_size
        mode = self.feats_injection_mode

        tokens = self.model.embed_patches(x)
        if additional_features is not None and mode == "before_backbone":
            tokens = tokens + additional_features.astype(tokens.dtype)
        feats = self.model.dense_features(tokens, (gh, gw)).astype(jnp.float32)
        if additional_features is not None and mode == "after_backbone":
            feats = feats + additional_features.astype(feats.dtype)
        return feats.reshape(b, gh, gw, -1)

    def masked_forward(self, x, additional_features, valid_grid):
        """Canvas forward with per-sample traced valid token grids ([B, 2])
        — the adaptive-ZoomIn compiled eval (inference/adaptive_eval.py)."""
        b, h, w, _ = x.shape
        gh_cap, gw_cap = h // self.patch_size, w // self.patch_size
        mode = self.feats_injection_mode
        tokens = self.model.embed_patches(x)
        if additional_features is not None and mode == "before_backbone":
            tokens = tokens + additional_features.astype(tokens.dtype)
        feats = self.model.dense_features_masked(
            tokens, (gh_cap, gw_cap), valid_grid).astype(jnp.float32)
        if additional_features is not None and mode == "after_backbone":
            feats = feats + additional_features.astype(feats.dtype)
        return feats.reshape(b, gh_cap, gw_cap, -1)


class CLIPTextEncoder(nn.Module):
    """CLIP text tower (reference: maskclip/model.py:473-495, 580-593).

    Token ids [B, 77] -> joint-space embedding [B, output_dim]: token
    embedding + learned positional embedding, ``layers`` causal QuickGELU
    blocks (the same _CLIPBlock as the visual tower with the additive
    triangular mask), ln_final, then the projection of the end-of-text
    position — located per row as argmax(ids) since <|endoftext|> carries
    the highest id (model.py:590-591). Param names mirror the CLIP
    checkpoint for mechanical conversion (models/convert.py:
    convert_clip_text). ViT-B/16 text config: width 512, 8 heads,
    12 layers, vocab 49408, context 77, output_dim 512.
    """

    width: int = 512
    heads: int = 8
    layers: int = 12
    vocab_size: int = 49408
    context_length: int = 77
    output_dim: int = 512
    dtype: Any = jnp.float32

    def setup(self):
        w = self.width
        self.token_embedding = self.param(
            "token_embedding", nn.initializers.normal(0.02),
            (self.vocab_size, w))
        self.positional_embedding = self.param(
            "positional_embedding", nn.initializers.normal(0.01),
            (self.context_length, w))
        self.resblocks = [
            _CLIPBlock(w, self.heads, "jnp", True, dtype=self.dtype,
                       name=f"resblocks_{i}")
            for i in range(self.layers)
        ]
        self.ln_final = nn.LayerNorm(epsilon=1e-5, name="ln_final")
        self.text_projection = self.param(
            "text_projection", nn.initializers.normal(w**-0.5),
            (w, self.output_dim))

    def __call__(self, ids: jnp.ndarray) -> jnp.ndarray:
        x = jnp.take(self.token_embedding, ids, axis=0).astype(self.dtype)
        x = x + self.positional_embedding.astype(self.dtype)[None]
        for blk in self.resblocks:
            x = blk(x)
        x = self.ln_final(x.astype(jnp.float32))
        eot = jnp.argmax(ids, axis=-1)
        pooled = jnp.take_along_axis(x, eot[:, None, None], axis=1)[:, 0]
        return pooled @ self.text_projection
