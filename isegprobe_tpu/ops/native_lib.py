"""ctypes loader (with lazy build) for the native host kernel library."""

from __future__ import annotations

import ctypes
import subprocess
import threading
from pathlib import Path

import numpy as np

_NATIVE_DIR = Path(__file__).parent / "native"
_LIB_PATH = _NATIVE_DIR / "libisegprobe_native.so"
_lock = threading.Lock()
_lib = None
_load_failed = False


def _build() -> bool:
    try:
        subprocess.run(
            ["make", "-s"], cwd=_NATIVE_DIR, check=True, capture_output=True
        )
        return True
    except (subprocess.CalledProcessError, FileNotFoundError):
        return False


def get_native_lib() -> ctypes.CDLL | None:
    """Load (building if necessary) the native library; None if unavailable."""
    global _lib, _load_failed
    if _lib is not None or _load_failed:
        return _lib
    with _lock:
        if _lib is not None or _load_failed:
            return _lib
        src = _NATIVE_DIR / "edt.cpp"
        if not _LIB_PATH.exists() or (
            src.exists() and src.stat().st_mtime > _LIB_PATH.stat().st_mtime
        ):
            if not _build():
                _load_failed = True
                return None
        try:
            lib = ctypes.CDLL(str(_LIB_PATH))
        except OSError:
            _load_failed = True
            return None

        u8p = np.ctypeslib.ndpointer(np.uint8, flags="C_CONTIGUOUS")
        f32p = np.ctypeslib.ndpointer(np.float32, flags="C_CONTIGUOUS")
        c_int, c_float = ctypes.c_int, ctypes.c_float

        lib.edt_l2sq.argtypes = [u8p, c_int, c_int, f32p]
        lib.edt_l2sq.restype = None
        lib.edt_l2.argtypes = [u8p, c_int, c_int, f32p]
        lib.edt_l2.restype = None
        lib.click_dist_maps.argtypes = [f32p, c_int, c_int, c_int, c_float, f32p]
        lib.click_dist_maps.restype = None
        _lib = lib
        return _lib
