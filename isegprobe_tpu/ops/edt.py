"""Euclidean distance transforms — host (native C++) and on-device (JAX).

The reference's hottest non-model op is ``cv2.distanceTransform(mask, DIST_L2)``,
used by the evaluation clicker (reference: core/inference/clicker.py:72-73), the
training click simulator (core/training/trainer.py:597-598) and the point
sampler (core/data/points_sampler.py:371). We provide:

* ``edt_l2sq`` / ``edt_l2`` — host EDT backed by the native C++ kernel
  (ops/native/edt.cpp), falling back to OpenCV then scipy. Exact
  (Felzenszwalb–Huttenlocher), matching cv2's DIST_MASK_PRECISE output.
* ``edt_l2sq_device`` — exact squared EDT under jit: a two-scan column pass
  followed by a blocked brute-force lower-envelope row pass. All integer-valued
  squared distances are exact in float32, so decision parity (argmax location,
  FN-vs-FP comparison) with the host path is bitwise.
* ``next_click_from_error`` — the clicker's decision rule as a pure jittable
  function, enabling a fully on-device click loop.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl

from isegprobe_tpu.ops.native_lib import get_native_lib

_BIG = 1.0e6  # "infinity" for column distances; squared stays finite in f32


# ---------------------------------------------------------------------------
# Host path
# ---------------------------------------------------------------------------


def edt_l2sq(mask: np.ndarray) -> np.ndarray:
    """Exact squared L2 EDT of a 2-D uint8/bool mask (host).

    Distance from each non-zero pixel to the nearest zero pixel; 0 at zeros.
    """
    mask_u8 = np.ascontiguousarray(mask, dtype=np.uint8)
    h, w = mask_u8.shape
    lib = get_native_lib()
    if lib is not None:
        out = np.empty((h, w), dtype=np.float32)
        lib.edt_l2sq(mask_u8, h, w, out)
        return out
    try:
        import cv2

        d = cv2.distanceTransform(mask_u8, cv2.DIST_L2, 0)
        return d * d
    except ImportError:
        from scipy.ndimage import distance_transform_edt

        return distance_transform_edt(mask_u8).astype(np.float32) ** 2


def edt_l2(mask: np.ndarray) -> np.ndarray:
    """Exact L2 EDT (host); see :func:`edt_l2sq`."""
    return np.sqrt(edt_l2sq(mask))


def click_dist_maps_host(
    points: np.ndarray, height: int, width: int, norm_delimiter: float
) -> np.ndarray:
    """Host equivalent of the reference's Cython BFS kernel
    (core/utils/cython/_get_dist_maps.pyx:18-64): two [H, W] layers of min
    normalized squared distance to the rounded click coordinates."""
    pts = np.ascontiguousarray(points, dtype=np.float32)
    lib = get_native_lib()
    if lib is not None:
        out = np.empty((2, height, width), dtype=np.float32)
        lib.click_dist_maps(pts, pts.shape[0], height, width, norm_delimiter, out)
        return out
    # numpy fallback
    out = np.full((2, height, width), 1e6, dtype=np.float32)
    rr, cc = np.meshgrid(np.arange(height), np.arange(width), indexing="ij")
    n = pts.shape[0]
    for p in range(n):
        y, x = pts[p, 0], pts[p, 1]
        if max(y, x) < 0:
            continue
        li = 1 if p >= n // 2 else 0
        d2 = ((rr - round(y)) / norm_delimiter) ** 2 + (
            (cc - round(x)) / norm_delimiter
        ) ** 2
        out[li] = np.minimum(out[li], d2.astype(np.float32))
    return out


# ---------------------------------------------------------------------------
# Device path
# ---------------------------------------------------------------------------


def _column_pass(zero: jnp.ndarray) -> jnp.ndarray:
    """Vertical distance to the nearest zero pixel per column.

    zero: [..., H, W] bool (True where the mask is background/zero).
    Returns float32 [..., H, W]; _BIG where the column has no zero.

    The vertical distance decomposes as d_i = min(i − lastzero_i,
    nextzero_i − i): the index of the nearest zero above is a running max of
    (i if zero else −∞) and below a reverse running min — each a log-depth
    ``cummax``/``cummin`` over ONE array (the equivalent min-plus pair-scan
    carries (m, k) tuples and moves twice the HBM bytes per level; an
    H-step sequential lax.scan is dispatch-bound on TPU).  All values are
    integers ≤ _BIG + H, exact in f32.
    """
    axis = zero.ndim - 2  # scan's reverse path needs it nonnegative
    idx_shape = [1] * zero.ndim
    idx_shape[axis] = zero.shape[axis]
    idx = jnp.arange(zero.shape[axis], dtype=jnp.float32).reshape(idx_shape)
    lastz = jax.lax.cummax(jnp.where(zero, idx, -_BIG), axis=axis)
    nextz = jax.lax.cummin(jnp.where(zero, idx, 2 * _BIG), axis=axis,
                           reverse=True)
    return jnp.minimum(jnp.minimum(idx - lastz, nextz - idx), _BIG)


def _edt_row_kernel(g2_ref, d2_ref, o_ref):
    """One (row-block, source-block) step of the lower envelope.

    Everything stays in VMEM: the XLA scan version of this pass materializes
    [.., W, 128] candidate tensors in HBM each block and is HBM-bound
    (~14 ms/click at DAVIS scale). Layout matters as much as residency: the
    min over the 128 candidate sources runs along SUBLANES — per output row,
    ``src[c] + dist2[c, j]`` is a [128 sublanes, wp lanes] tile reduced over
    sublanes — because a lane-axis min (the naive [th, wp, 128] formulation)
    lowers to log-depth cross-lane shuffles and measures 2.1x slower
    (5.75 -> 2.37 ms for the batch-8 clicker shape, docs/PERF.md). The
    (j−c)² table arrives precomputed per source block via ``d2_ref``.
    """
    s = pl.program_id(1)
    src = g2_ref[...]  # [th, 128] squared column distances of source block s
    d2b = d2_ref[0]  # [128, wp]: (j - (s*128+c))² with sources on sublanes
    cand = jnp.stack(
        [jnp.min(src[r][:, None] + d2b, axis=0) for r in range(src.shape[0])]
    )  # [th, wp]

    @pl.when(s == 0)
    def _init():
        o_ref[...] = cand

    @pl.when(s != 0)
    def _acc():
        o_ref[...] = jnp.minimum(o_ref[...], cand)


def _row_envelope_pallas(g: jnp.ndarray) -> jnp.ndarray:
    """Pallas row pass: exact integers in f32, identical to the scan path."""
    w = g.shape[-1]
    lead = g.shape[:-1]
    n = int(np.prod(lead)) if lead else 1
    g2 = jnp.square(g).reshape(n, w)

    th = 16
    wp = -(-w // 128) * 128
    npad = (-n) % th
    # pad sources with "infinitely far" columns (values are already squared)
    g2 = jnp.pad(g2, ((0, npad), (0, wp - w)), constant_values=_BIG**2)
    j = jnp.arange(wp, dtype=jnp.float32)
    c = jnp.arange(wp, dtype=jnp.float32)
    dist2 = jnp.square(j[None, None, :] - c.reshape(wp // 128, 128, 1))

    d2 = pl.pallas_call(
        _edt_row_kernel,
        grid=((n + npad) // th, wp // 128),
        in_specs=[
            pl.BlockSpec((th, 128), lambda i, s: (i, s)),
            pl.BlockSpec((1, 128, wp), lambda i, s: (s, 0, 0)),
        ],
        out_specs=pl.BlockSpec((th, wp), lambda i, s: (i, 0)),
        out_shape=jax.ShapeDtypeStruct((n + npad, wp), jnp.float32),
    )(g2, dist2)
    return jnp.minimum(d2[:n, :w], _BIG**2).reshape(*lead, w)


def _row_envelope(g: jnp.ndarray, block: int = 128) -> jnp.ndarray:
    """d2[..., i, j] = min_j' g[..., i, j']^2 + (j - j')^2, blocked over j'."""
    if jax.default_backend() not in ("cpu", "gpu"):
        return _row_envelope_pallas(g)
    w = g.shape[-1]
    pad = (-w) % block
    g2 = jnp.square(g)
    if pad:
        g2 = jnp.pad(g2, [(0, 0)] * (g2.ndim - 1) + [(0, pad)], constant_values=_BIG**2)
    wp = w + pad
    cols = jnp.arange(w, dtype=jnp.float32)
    src = jnp.arange(wp, dtype=jnp.float32).reshape(wp // block, block)
    g2b = jnp.moveaxis(g2.reshape(*g2.shape[:-1], wp // block, block), -2, 0)

    def step(carry, inputs):
        g2_blk, src_blk = inputs  # [..., C], [C]
        dist = jnp.square(cols[:, None] - src_blk[None, :])  # [W, C]
        cand = jnp.min(g2_blk[..., None, :] + dist, axis=-1)  # [..., W]
        return jnp.minimum(carry, cand), None

    init = jnp.full((*g2.shape[:-1], w), _BIG**2, dtype=jnp.float32)
    # carry has an extra W axis vs g2 blocks' C axis; broadcast per row happens
    # inside step via g2_blk[..., None, :].
    d2, _ = jax.lax.scan(step, init, (g2b, src))
    return jnp.minimum(d2, _BIG**2)


@functools.partial(jax.jit, static_argnames=("pad_border",))
def edt_l2sq_device(mask: jnp.ndarray, pad_border: bool = False) -> jnp.ndarray:
    """Exact squared L2 EDT on device.

    mask: [..., H, W] (bool or numeric; non-zero = foreground). Returns squared
    distance from each non-zero pixel to the nearest zero pixel, 0 at zeros.
    ``pad_border=True`` treats out-of-image pixels as zero (the clicker's
    padding convention, reference: core/inference/clicker.py:68-77).
    """
    fg = mask.astype(jnp.bool_)
    if pad_border:
        fg = jnp.pad(fg, [(0, 0)] * (fg.ndim - 2) + [(1, 1), (1, 1)])
    g = _column_pass(~fg)
    d2 = _row_envelope(g)
    d2 = jnp.where(fg, d2, 0.0)
    if pad_border:
        d2 = d2[..., 1:-1, 1:-1]
    return d2


@jax.jit
def next_click_from_error(
    gt_mask: jnp.ndarray,
    pred_mask: jnp.ndarray,
    not_clicked: jnp.ndarray,
    not_ignore: jnp.ndarray | None = None,
):
    """The clicker decision rule (reference: core/inference/clicker.py:58-91),
    jittable: click at the deepest point of the largest error region.

    All args are [H, W] bool. Returns (is_positive, y, x) scalars.
    Decision-parity with the host/OpenCV path: squared distances are exact
    integers in f32 and argmax takes the first row-major maximum, matching
    ``np.where(...)[0][0]``.
    """
    if not_ignore is None:
        not_ignore = jnp.ones_like(gt_mask, dtype=jnp.bool_)
    fn = gt_mask & ~pred_mask & not_ignore
    fp = ~gt_mask & pred_mask & not_ignore

    stacked = jnp.stack([fn, fp])  # [2, H, W]
    d2 = edt_l2sq_device(stacked, pad_border=True)
    d2 = jnp.where(not_clicked[None], d2, 0.0)

    fn_d2, fp_d2 = d2[0], d2[1]
    fn_max = jnp.max(fn_d2)
    fp_max = jnp.max(fp_d2)
    is_positive = fn_max > fp_max

    chosen = jnp.where(is_positive, fn_d2, fp_d2)
    flat_idx = jnp.argmax(chosen)
    w = gt_mask.shape[-1]
    return is_positive, flat_idx // w, flat_idx % w
