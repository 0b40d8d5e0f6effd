"""LoftUp coordinate-based cross-attention upsampler (reference:
core/model/upsamplers/loftup/loftup.py:16-148, layers.py; paper 2504.14032).

Pipeline ('sine' LR-PE variant used by the reference checkpoints):
  image -> MinMaxScaler -> Fourier ImplicitFeaturizer (n_freqs=20, learned
  biases) -> conv stem -> per-pixel queries; LR feats (+ sine ImplicitFeaturizer
  PE, n_freqs=5) -> keys/values; 2-layer cross-attention transformer; 1x1 conv
  + ConvNeXt LayerNorm. The input LR features are ChannelNorm-ed by the wrapper
  (loftup.py:141-148).

TPU note: the cross-attention has ~H*W queries (200k at 448²) against only
(h*w) keys — the fused Pallas attention kernel streams query blocks against a
VMEM-resident KV, so the [Lq, Lk] matrix never exists in HBM (the torch
reference materializes 3.3 GB there).
"""

from __future__ import annotations

from typing import Any

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from isegprobe_tpu.models.vit import mm_precision
from isegprobe_tpu.ops.attention import mha


def _pad_mask(dim: int, real: int) -> jnp.ndarray | None:
    """Channel mask for MXU-padded activations: statistics cover only the
    first ``real`` of ``dim`` channels; the rest are alignment zeros. flax's
    LayerNorm takes the mask natively (``x.mean(where=mask)``), so the masked
    statistics are arithmetically identical to the unpadded layer's — exact
    zeros in the padded tail contribute nothing to either sum, and the divisor
    is the ``real`` count in both."""
    if real in (0, dim):
        return None
    return jnp.arange(dim) < real


class ChannelNorm(nn.Module):
    """LayerNorm over the channel axis (reference: loftup/layers.py:26-35).

    ``real``: when the input carries MXU-alignment zero padding, the number of
    real channels (statistics masked to them; padded scale/bias are zero, so
    padded outputs stay exactly zero)."""

    dim: int
    dtype: Any = jnp.float32
    real: int = 0

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        mask = _pad_mask(x.shape[-1], self.real)
        return nn.LayerNorm(epsilon=1e-5, dtype=self.dtype, name="norm")(
            x, mask=mask)


class ConvNeXtLayerNorm(nn.Module):
    """Channel-wise LN with ConvNeXt's eps inside the sqrt
    (reference: loftup/layers.py:38-58)."""

    dim: int
    eps: float = 1e-6
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        weight = self.param("weight", nn.initializers.ones, (self.dim,))
        bias = self.param("bias", nn.initializers.zeros, (self.dim,))
        # stats in f32 even under a bf16 compute dtype (matching every other
        # norm in the bf16 path: flax force_float32_reductions, FusedLayerNorm)
        xf = x.astype(jnp.float32)
        u = xf.mean(axis=-1, keepdims=True)
        s = jnp.square(xf - u).mean(axis=-1, keepdims=True)
        xf = (xf - u) / jnp.sqrt(s + self.eps)
        x = xf.astype(self.dtype)
        return (weight.astype(self.dtype) * x + bias.astype(self.dtype))


def min_max_scale(x: jnp.ndarray) -> jnp.ndarray:
    """Per-sample per-channel spatial min-max to [-0.5, 0.5].

    The reference scaler (loftup/layers.py:61-71) reduces over batch+space,
    but in its eval protocol the batch is only ever ONE sample's flip pair
    (AddHorizontalFlip doubles the batch before the model), and a flip is a
    spatial permutation — pair-coupled min/max equal per-sample min/max
    bit-for-bit. Reducing per sample therefore preserves reference EVAL
    parity exactly while keeping lanes independent in the device-batched NoC
    loop (a batch-coupled reduction would make each lane's prediction
    depend on which other samples share its batch).

    TRAINING batches are a deliberate delta: the reference couples every
    sample's normalization to its training-batch peers (a batch-composition
    dependence this rebuild treats as a quirk, not a feature); here each
    sample normalizes independently, so training numerics differ from torch
    at batch > 1 (docs/PARITY.md known-deltas)."""
    mn = x.min(axis=(1, 2), keepdims=True)
    mx = x.max(axis=(1, 2), keepdims=True)
    return (x - mn) / jnp.clip(mx - mn, 1e-4) - 0.5


class ImplicitFeaturizer(nn.Module):
    """Fourier features of the pixel grid (+ optional color channels), with the
    reference's learned-bias quirk reproduced exactly: the bias parameter is
    stored [2, dim_mult, n_freqs] but *reinterpreted* as [n_freqs, dim_mult]
    when added (reference: loftup/layers.py:101-135).
    """

    color_feats: bool = True
    n_freqs: int = 10
    learn_bias: bool = False
    # Output/compute dtype of the feature map. The Fourier PHASES are always
    # computed in f32 (freqs reach e^10 ≈ 2.2e4 — bf16 phase would be pure
    # noise); only the bounded sin/cos outputs are cast down, so bf16 halves
    # the dominant [B,H,W,2·nf·dm] activations with no phase error.
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray, row_coords: jnp.ndarray | None = None
                 ) -> jnp.ndarray:
        """``row_coords`` overrides the row grid — used by the banded query
        path to evaluate a horizontal slab at its *global* coordinates."""
        b, h, w, c = x.shape
        dim_mult = 2 + (3 if self.color_feats else 0)

        gh = row_coords if row_coords is not None else jnp.linspace(-1.0, 1.0, h)
        gw = jnp.linspace(-1.0, 1.0, w)
        grid = jnp.stack(jnp.meshgrid(gh, gw, indexing="ij"), axis=-1)  # [H,W,2]
        feats = jnp.broadcast_to(grid[None], (b, h, w, 2)).astype(jnp.float32)
        if self.color_feats:
            feats = jnp.concatenate([feats, x.astype(jnp.float32)], axis=-1)

        freqs = jnp.exp(jnp.linspace(-2.0, 10.0, self.n_freqs))
        # [B,H,W,nf,dim_mult]
        f = feats[..., None, :] * freqs[:, None]

        if self.learn_bias:
            biases = self.param(
                "biases",
                nn.initializers.normal(1.0),
                (2, dim_mult, self.n_freqs),
            )
            sin_b = biases[0].reshape(self.n_freqs, dim_mult)
            cos_b = biases[1].reshape(self.n_freqs, dim_mult)
            sin_f, cos_f = f + sin_b, f + cos_b
        else:
            sin_f = cos_f = f

        nfd = self.n_freqs * dim_mult
        sin_f = sin_f.reshape(b, h, w, nfd)
        cos_f = cos_f.reshape(b, h, w, nfd)
        parts = [jnp.sin(sin_f).astype(self.dtype),
                 jnp.cos(cos_f).astype(self.dtype)]
        if self.color_feats:
            parts.append(x.astype(self.dtype))
        return jnp.concatenate(parts, axis=-1)


class _TorchMHA(nn.Module):
    """torch.nn.MultiheadAttention-compatible cross-attention (packed in_proj;
    head_dim = dim // heads regardless of the dim_head arg, which the
    reference passes but torch ignores).

    ``real_dim``: set when ``dim`` is the MXU-padded width (512 for the
    reference's 404). The packed weights are then stored head-interleaved
    (convert.pad_loftup_params): head h's real rows sit at
    ``h*dh_pad .. h*dh_pad + dh_real``, the rest are zero, so the plain
    reshape below lands each head's channels (plus exact-zero padding) in its
    own padded head slot. The softmax scale stays the REAL head dim's — the
    zero q/k tail contributes nothing to the logits."""

    dim: int
    heads: int
    attn_impl: str = "auto"
    dtype: Any = jnp.float32
    real_dim: int = 0

    @nn.compact
    def __call__(self, q_in, kv_in):
        d = self.dim
        dh = d // self.heads
        real_dh = (self.real_dim or d) // self.heads
        in_w = self.param("in_proj_weight",
                          nn.initializers.xavier_uniform(), (3 * d, d))
        in_b = self.param("in_proj_bias", nn.initializers.zeros, (3 * d,))
        in_w = in_w.astype(self.dtype)
        in_b = in_b.astype(self.dtype)
        q_in = q_in.astype(self.dtype)
        kv_in = kv_in.astype(self.dtype)
        prec = mm_precision(self.dtype)
        q = jnp.matmul(q_in, in_w[:d].T, precision=prec) + in_b[:d]
        k = jnp.matmul(kv_in, in_w[d : 2 * d].T, precision=prec) + in_b[d : 2 * d]
        v = jnp.matmul(kv_in, in_w[2 * d :].T, precision=prec) + in_b[2 * d :]

        bq, nq, _ = q.shape
        nk = k.shape[1]
        q = q.reshape(bq, nq, self.heads, dh)
        k = k.reshape(bq, nk, self.heads, dh)
        v = v.reshape(bq, nk, self.heads, dh)
        out = mha(q, k, v, scale=real_dh**-0.5, impl=self.attn_impl)
        out = out.reshape(bq, nq, d)
        return nn.Dense(d, dtype=self.dtype,
                        precision=mm_precision(self.dtype), name="out_proj")(out)


class CrossAttentionLayer(nn.Module):
    dim: int
    heads: int
    attn_impl: str = "auto"
    dtype: Any = jnp.float32
    real_dim: int = 0

    @nn.compact
    def __call__(self, query, key_value):
        mask = _pad_mask(self.dim, self.real_dim)
        q = nn.LayerNorm(epsilon=1e-5, dtype=self.dtype, name="norm_q")(
            query, mask=mask)
        kv = nn.LayerNorm(epsilon=1e-5, dtype=self.dtype, name="norm_kv")(
            key_value, mask=mask)
        return _TorchMHA(self.dim, self.heads, self.attn_impl,
                         dtype=self.dtype, real_dim=self.real_dim,
                         name="attention")(q, kv)


class _FeedForward(nn.Module):
    dim: int
    hidden_dim: int
    dtype: Any = jnp.float32
    real_dim: int = 0

    @nn.compact
    def __call__(self, x):
        prec = mm_precision(self.dtype)
        x = nn.LayerNorm(epsilon=1e-5, dtype=self.dtype, name="norm")(
            x, mask=_pad_mask(self.dim, self.real_dim))
        x = nn.Dense(self.hidden_dim, dtype=self.dtype, precision=prec,
                     name="fc1")(x)
        x = jax.nn.gelu(x, approximate=False)
        return nn.Dense(self.dim, dtype=self.dtype, precision=prec,
                        name="fc2")(x)


class CATransformer(nn.Module):
    dim: int
    depth: int
    heads: int
    mlp_dim: int
    attn_impl: str = "auto"
    dtype: Any = jnp.float32
    real_dim: int = 0

    @nn.compact
    def __call__(self, query, key_value):
        query = query.astype(self.dtype)
        key_value = key_value.astype(self.dtype)
        for i in range(self.depth):
            query = CrossAttentionLayer(self.dim, self.heads, self.attn_impl,
                                        dtype=self.dtype,
                                        real_dim=self.real_dim,
                                        name=f"ca_{i}")(query, key_value) + query
            query = _FeedForward(self.dim, self.mlp_dim, dtype=self.dtype,
                                 real_dim=self.real_dim,
                                 name=f"ff_{i}")(query) + query
        return nn.LayerNorm(epsilon=1e-5, dtype=self.dtype, name="norm")(
            query, mask=_pad_mask(self.dim, self.real_dim))


class _ConvBNRelu(nn.Module):
    features: int
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        from isegprobe_tpu.models.upsamplers.lift import FrozenBatchNorm

        x = nn.Conv(self.features, (3, 3), padding=1, dtype=self.dtype,
                    precision=mm_precision(self.dtype), name="conv")(x)
        x = FrozenBatchNorm(self.features, name="bn")(x)
        return nn.relu(x).astype(self.dtype)


class LoftUpUpsampler(nn.Module):
    """__call__(source [B,h,w,C], guidance [B,H,W,3]) -> [B,H,W,C].

    Mirrors the reference wrapper (ChannelNorm on the input features,
    loftup/loftup.py:141-177) around the 'sine' LoftUp.
    """

    n_dim: int = 384
    n_freqs: int = 20
    num_heads: int = 4
    num_layers: int = 2
    upsampler_path: str | None = None  # checkpoint path; loading external
    attn_impl: str = "auto"
    # Banded query evaluation: above ``query_chunk_min_pixels`` output pixels,
    # the query side (Fourier stem -> cross-attention -> 1x1 conv + LN, all
    # per-pixel or 3x3-local) runs in horizontal slabs of
    # ``query_chunk_rows`` so the [B, H·W, cdim] query activations never
    # materialize at once — at 448² the monolithic path OOMs HBM at
    # device_batch=8. Banding is exact: the stem slabs carry a 2-row halo
    # (two 3x3 convs) with global-zero-padding emulation, and queries never
    # attend to each other.
    query_chunk_rows: int = 64
    query_chunk_min_pixels: int = 120_000
    # Compute dtype (params stay f32). Injected by the model builder from
    # iSegProbeModel.dtype — bf16 halves the per-pixel query activations
    # (the HBM bound at 448² training) and runs the cross-attention one-pass
    # on the MXU. Fourier phases stay f32 (see ImplicitFeaturizer.dtype).
    dtype: Any = jnp.float32
    # MXU-aligned zero-padded channel layout (serving): widths pad to the
    # next lane multiple (cdim 404->512, stem 203->256, head dim 101->128),
    # with every weight zero-padded at convert time
    # (models/convert.py:pad_loftup_params) so the result is exact by
    # construction — zero rows/cols contribute nothing, and the masked
    # LayerNorm statistics cover only real channels. Removes the ~27% MXU
    # tile waste of K=203/404 contractions and the dh=101->128 attention
    # padding identified in docs/PERF.md. Params stored PADDED when set; use
    # pad_loftup_params on an unpadded checkpoint/init tree first.
    mxu_pad: bool = False

    def setup(self):
        # setup-style (attribute name == param scope name, matching the
        # pre-refactor explicit names) so the banded slab body can run under
        # ``nn.remat`` — training at 448² otherwise stores every slab's
        # cross-attention residuals at once and OOMs HBM; with remat the
        # backward recomputes one slab at a time.
        dim = self.n_dim

        def _align(n: int) -> int:
            return ((n + 127) // 128) * 128 if self.mxu_pad else n

        creal = dim + 2 * 5 * 2  # + sine PE (no color, n_freqs=5)
        stem_real = 2 * self.n_freqs * 5 + 3
        self._creal = creal
        self._cdim = _align(creal)
        self._stem_real = stem_real
        self._stem = _align(stem_real)
        real = creal if self.mxu_pad else 0
        self.channelnorm = ChannelNorm(dim, dtype=self.dtype)
        self.lr_pe = ImplicitFeaturizer(False, 5, True, dtype=self.dtype)
        self.fourier_feat = ImplicitFeaturizer(True, self.n_freqs, True,
                                               dtype=self.dtype)
        self.first_norm = ChannelNorm(self._stem, dtype=self.dtype,
                                      real=stem_real if self.mxu_pad else 0)
        self.first_conv1 = _ConvBNRelu(self._cdim, dtype=self.dtype)
        self.first_conv2 = _ConvBNRelu(self._cdim, dtype=self.dtype)
        self.ca_transformer = CATransformer(
            self._cdim, self.num_layers, self.num_heads, dim, self.attn_impl,
            dtype=self.dtype, real_dim=real)
        self.final_conv = nn.Conv(dim, (1, 1), dtype=self.dtype,
                                  precision=mm_precision(self.dtype))
        self.final_ln = ConvNeXtLayerNorm(dim, dtype=self.dtype)

    def _pad_ch(self, x: jnp.ndarray, to: int) -> jnp.ndarray:
        """Zero-pad the channel axis to the MXU-aligned width (no-op unpadded)."""
        if x.shape[-1] == to:
            return x
        widths = [(0, 0)] * (x.ndim - 1) + [(0, to - x.shape[-1])]
        return jnp.pad(x, widths)

    def _slab(self, x_rows, kv, row_coords, in_frame):
        """Query tower for one horizontal slab (+2-row halo): Fourier stem ->
        convs (out-of-frame rows re-zeroed after each, reproducing the
        monolithic convs' zero padding) -> cross-attention -> head."""
        b = x_rows.shape[0]
        w = x_rows.shape[2]
        xb = self._pad_ch(self.fourier_feat(x_rows, row_coords=row_coords),
                          self._stem)
        xb = self.first_norm(xb)
        xb = xb * in_frame[None, :, None, None]
        xb = self.first_conv1(xb)[:, 1:-1] * in_frame[1:-1][None, :, None, None]
        xb = self.first_conv2(xb)[:, 1:-1]  # [b, chunk, w, cdim], exact
        chunk = xb.shape[1]
        qb = xb.reshape(b, chunk * w, self._cdim)
        ob = self.ca_transformer(qb, kv)
        ob = ob.reshape(b, chunk, w, self._cdim)
        return self.final_ln(self.final_conv(ob))

    def __call__(self, source: jnp.ndarray, guidance: jnp.ndarray,
                 tail=None, tail_halo: int = 0) -> jnp.ndarray:
        """``tail``: optional fused epilogue (the seg head's ``banded``
        contract — models/heads.py) applied inside the slab loop so the
        [B, H, W, n_dim] HR feature map never materializes in HBM; the slab
        band is extended by ``tail_halo`` rows each side to feed the tail's
        3x3 convs exactly. The fused path skips the slab remat (the tail
        closes over a sibling flax module, which lifted transforms reject) —
        it is a serving-path feature; training uses the unfused call."""
        cdim = self._cdim
        source = self.channelnorm(source)

        # keys/values from LR features + sine positional features
        lr_pe = self.lr_pe(source)
        kv = self._pad_ch(jnp.concatenate([source, lr_pe], axis=-1), cdim)
        b = source.shape[0]
        kv = kv.reshape(b, -1, cdim)

        h, w = guidance.shape[1], guidance.shape[2]
        x_scaled = min_max_scale(guidance)  # full-frame (pre-band) per sample

        chunk = self.query_chunk_rows
        if chunk > 0:  # largest divisor of h not above the requested rows
            while h % chunk:
                chunk -= 1
        use_bands = (
            chunk > 0 and chunk < h and h * w > self.query_chunk_min_pixels
        )

        if not use_bands:
            x = self._pad_ch(self.fourier_feat(x_scaled), self._stem)
            x = self.first_norm(x)
            x = self.first_conv1(x)
            x = self.first_conv2(x)
            q = x.reshape(b, h * w, cdim)
            out = self.ca_transformer(q, kv)
            out = out.reshape(b, h, w, cdim)
            out = self.final_ln(self.final_conv(out))
            if tail is not None:
                # emulate the monolithic head's zero padding with explicit
                # zero halo rows (in_frame marks them out-of-frame)
                th = tail_halo
                if th:
                    pad = jnp.zeros((b, th, w, out.shape[-1]), out.dtype)
                    out = jnp.concatenate([pad, out, pad], axis=1)
                in_frame = jnp.pad(jnp.ones((h,), jnp.float32), (th, th))
                return tail(out, in_frame)
            return out

        rows = jnp.linspace(-1.0, 1.0, h)
        th = tail_halo if tail is not None else 0
        # remat: backward recomputes each slab instead of keeping all slabs'
        # residuals live (forward-only eval is unaffected)
        slab = type(self)._slab if tail is not None else nn.remat(type(self)._slab)
        outs = []
        for r0 in range(0, h, chunk):
            # slab + 2-row stem halo (+ tail_halo rows for the fused head);
            # out-of-frame rows are zeroed after the norm, reproducing the
            # monolithic convs' zero padding at the frame edge
            band = jnp.arange(r0 - 2 - th, r0 + chunk + 2 + th)
            idx = jnp.clip(band, 0, h - 1)
            in_frame = ((band >= 0) & (band < h)).astype(x_scaled.dtype)
            hr = slab(self, x_scaled[:, idx], kv, rows[idx], in_frame)
            if tail is not None:
                # hr: [b, chunk + 2*tail_halo, w, dim]; the stem consumed its
                # own 2-row halo, so in_frame[2:-2] tracks the remaining rows
                hr = tail(hr, in_frame[2:-2])
            outs.append(hr)
        return jnp.concatenate(outs, axis=1)
