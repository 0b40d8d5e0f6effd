"""Bounding-box helpers, seeding, and small utilities.

Semantics match the reference helpers used by the zoom-in transform and the
data layer (reference: core/utils/misc.py:71-127, 130-159).
"""

from __future__ import annotations

import random
from typing import Tuple

import numpy as np

Bbox = Tuple[int, int, int, int]  # (rmin, rmax, cmin, cmax), inclusive


def get_bbox_from_mask(mask: np.ndarray) -> Bbox:
    rows = np.any(mask, axis=1)
    cols = np.any(mask, axis=0)
    rmin, rmax = np.where(rows)[0][[0, -1]]
    cmin, cmax = np.where(cols)[0][[0, -1]]
    return int(rmin), int(rmax), int(cmin), int(cmax)


def expand_bbox(bbox: Bbox, expand_ratio: float, min_crop_size: int | None = None) -> Bbox:
    rmin, rmax, cmin, cmax = bbox
    rcenter = 0.5 * (rmin + rmax)
    ccenter = 0.5 * (cmin + cmax)
    height = expand_ratio * (rmax - rmin + 1)
    width = expand_ratio * (cmax - cmin + 1)
    if min_crop_size is not None:
        height = max(height, min_crop_size)
        width = max(width, min_crop_size)
    return (
        int(round(rcenter - 0.5 * height)),
        int(round(rcenter + 0.5 * height)),
        int(round(ccenter - 0.5 * width)),
        int(round(ccenter + 0.5 * width)),
    )


def clamp_bbox(bbox: Bbox, rmin: int, rmax: int, cmin: int, cmax: int) -> Bbox:
    return (
        max(rmin, bbox[0]),
        min(rmax, bbox[1]),
        max(cmin, bbox[2]),
        min(cmax, bbox[3]),
    )


def get_segments_iou(s1, s2) -> float:
    a, b = s1
    c, d = s2
    intersection = max(0, min(b, d) - max(a, c) + 1)
    union = max(1e-6, max(b, d) - min(a, c) + 1)
    return intersection / union


def get_bbox_iou(b1: Bbox, b2: Bbox) -> float:
    return get_segments_iou(b1[:2], b2[:2]) * get_segments_iou(b1[2:4], b2[2:4])


def get_labels_with_sizes(x: np.ndarray):
    """Positive instance labels present in a mask and their pixel counts.

    Background (0) and ignore regions (negative labels, e.g. GrabCut's -1)
    are never objects — the reference's bare bincount would crash on the
    latter (core/utils/misc.py:30-34 only ever sees non-negative masks)."""
    instances = x.reshape(-1)
    counts = np.bincount(instances[instances > 0])
    labels = np.nonzero(counts)[0]
    return labels.tolist(), counts[labels].tolist()


def enable_compile_cache(path: str = None) -> None:
    """Turn on JAX's persistent compilation cache for the CLIs.

    The compiled 448² 20-click protocol program takes ~3-4 min to build on a
    tunnel-attached chip but loads from the on-disk cache in seconds
    (measured: 222 s -> 14 s first-run). Respects an explicit
    ``JAX_COMPILATION_CACHE_DIR`` env override; defaults to the repo-local
    ``.jax_cache/`` (gitignored)."""
    import os
    from pathlib import Path

    if os.environ.get("JAX_COMPILATION_CACHE_DIR"):
        return  # user already chose a cache location via env
    import jax

    if path is None:
        path = Path(__file__).resolve().parents[2] / ".jax_cache"
    jax.config.update("jax_compilation_cache_dir", str(path))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 2)


_CODE_FINGERPRINT: str | None = None


def code_fingerprint() -> str:
    """Content hash of every ``isegprobe_tpu`` source file (cached per process).

    Exists because of a measured axon-tunnel hazard: the remote TPU compile
    helper caches executables by *program name + shapes*, not HLO content —
    after a source edit, a re-jitted program with the same function name can
    silently run the STALE binary (observed: byte-identical profiler traces
    across semantically different device-eval builds; renaming the jitted
    function forced a true recompile). Stamping long-lived jitted programs
    with this fingerprint (``stamped``) makes the cache key
    content-dependent, so edits always recompile and unchanged code still
    gets cache hits."""
    global _CODE_FINGERPRINT
    if _CODE_FINGERPRINT is None:
        import hashlib
        from pathlib import Path

        pkg = Path(__file__).resolve().parents[1]
        h = hashlib.md5()
        for p in sorted(pkg.rglob("*.py")):
            h.update(str(p.relative_to(pkg)).encode())
            h.update(p.read_bytes())
        _CODE_FINGERPRINT = h.hexdigest()[:10]
    return _CODE_FINGERPRINT


_TRACE_ENV_FLAGS = ("ISEG_ATTN_PAIRS",)


def _trace_env_salt() -> str:
    """Environment toggles that alter traced programs (ops/attention.py's
    kernel routing reads ISEG_ATTN_PAIRS at trace time)."""
    import os

    return "".join(f"{k}={os.environ.get(k, '')};" for k in _TRACE_ENV_FLAGS
                   if os.environ.get(k))


def stamped(fn, salt: object = None):
    """Rename ``fn`` to ``<name>_<code_fingerprint>[_<salt-hash>]`` before
    ``jax.jit``.

    jax uses ``__name__`` for the XLA module name, which the axon compile
    cache keys on (see code_fingerprint). Apply to every long-lived compiled
    program (device-eval loop, train step, predictor click step).

    ``salt``: any value whose ``repr`` captures configuration that is BAKED
    into the traced program as constants without changing input shapes
    (thresholds like target_iou/pred_thr, loss weights, chunk sizes, the
    model config). The package-source fingerprint alone cannot distinguish
    two builds that differ only in such constants — same name + same shapes
    would hit the stale cache entry. Factories must pass their constant
    config here.

    ``functools.partial`` objects (no settable ``__name__``) get a thin
    renamed wrapper."""
    base = getattr(fn, "__name__", None) or getattr(
        getattr(fn, "func", None), "__name__", "fn")
    name = f"{base}_{code_fingerprint()}"
    # env toggles that change the TRACED graph without changing source or
    # shapes (kernel routing flags) must enter every program name too, or
    # an A/B toggle re-measures the previous binary
    env_salt = _trace_env_salt()
    if salt is not None or env_salt:
        import hashlib

        name += "_" + hashlib.md5(
            (repr(salt) + env_salt).encode()).hexdigest()[:8]
    try:
        fn.__name__ = name
        fn.__qualname__ = name
        return fn
    except AttributeError:
        def wrapper(*args, **kwargs):
            return fn(*args, **kwargs)

        wrapper.__name__ = wrapper.__qualname__ = name
        return wrapper


def seed_all(seed: int) -> None:
    """Seed Python and NumPy RNGs. JAX randomness is already explicit via keys."""
    random.seed(seed)
    np.random.seed(seed)
