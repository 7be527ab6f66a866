"""ctypes binding for the native C++ scene loader (native/libgsply.so).

The native loader streams and transforms .ply scenes into the planar
device layout in one pass (native/src/gsply.cc); this wrapper exposes it
with a graceful fallback to the pure-Python importer when the library
hasn't been built.  Build with ``make -C native`` (attempted lazily once).
"""

from __future__ import annotations

import ctypes
import pathlib
import subprocess
from typing import Optional

import numpy as np

_NATIVE_DIR = pathlib.Path(__file__).resolve().parents[2] / "native"
_LIB_PATH = _NATIVE_DIR / "libgsply.so"

_lib = None
_build_attempted = False


class _GsplyScene(ctypes.Structure):
    _fields_ = [
        ("count", ctypes.c_long),
        ("sh_degree", ctypes.c_int),
        ("sh_coeffs", ctypes.c_int),
        ("means", ctypes.POINTER(ctypes.c_float)),
        ("scales", ctypes.POINTER(ctypes.c_float)),
        ("quats", ctypes.POINTER(ctypes.c_uint32)),
        ("opacities", ctypes.POINTER(ctypes.c_float)),
        ("colors", ctypes.POINTER(ctypes.c_float)),
        ("sh", ctypes.POINTER(ctypes.c_float)),
        ("bounds_min", ctypes.c_float * 3),
        ("bounds_max", ctypes.c_float * 3),
        ("error", ctypes.c_char * 256),
    ]


def _load_library():
    global _lib, _build_attempted
    if _lib is not None:
        return _lib
    if not _LIB_PATH.exists() and not _build_attempted:
        _build_attempted = True
        try:
            subprocess.run(
                ["make", "-C", str(_NATIVE_DIR)],
                check=True,
                capture_output=True,
                timeout=120,
            )
        except Exception:
            return None
    if not _LIB_PATH.exists():
        return None
    lib = ctypes.CDLL(str(_LIB_PATH))
    lib.gsply_load.argtypes = [ctypes.c_char_p, ctypes.POINTER(_GsplyScene)]
    lib.gsply_load.restype = ctypes.c_int
    lib.gsply_release.argtypes = [ctypes.POINTER(_GsplyScene)]
    lib.gsply_release.restype = None
    _lib = lib
    return lib


def native_available() -> bool:
    return _load_library() is not None


def load_scene_native(path) -> Optional[dict]:
    """Load a .ply via the native library.

    Returns a dict of numpy arrays in the planar device layout, or None
    when the library is unavailable.  Raises ValueError on parse errors
    (same message style as the Python importer).
    """
    lib = _load_library()
    if lib is None:
        return None
    raw = _GsplyScene()
    rc = lib.gsply_load(str(path).encode(), ctypes.byref(raw))
    if rc != 0:
        msg = raw.error.decode(errors="replace")
        raise ValueError(msg)
    try:
        n = raw.count
        k = raw.sh_coeffs

        def arr(ptr, shape):
            return np.ctypeslib.as_array(ptr, shape=shape).copy()

        out = dict(
            means=arr(raw.means, (3, n)),
            scales=arr(raw.scales, (3, n)),
            quats=arr(raw.quats, (n,)),
            opacities=arr(raw.opacities, (n,)),
            colors=arr(raw.colors, (3, n)),
            sh=arr(raw.sh, (3, k, n)) if raw.sh_degree > 0 else None,
            sh_degree=raw.sh_degree,
            bounds_min=tuple(raw.bounds_min),
            bounds_max=tuple(raw.bounds_max),
        )
        return out
    finally:
        lib.gsply_release(ctypes.byref(raw))
