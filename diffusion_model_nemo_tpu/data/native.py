"""ctypes bindings for the native collate kernel (lazy g++ build).

``fast_stack(items)`` is a drop-in for ``np.stack`` over equally-shaped
arrays, backed by an OpenMP parallel memcpy (data/_native/fast_collate.c).
The shared object is compiled on first use into the package directory and
cached; environments without a toolchain silently fall back to numpy.
"""

from __future__ import annotations

import ctypes
import subprocess
from pathlib import Path
from typing import List, Optional, Sequence

import numpy as np

from ..utils import logging

__all__ = ["fast_stack", "native_available"]

_HERE = Path(__file__).parent
_SRC = _HERE / "_native" / "fast_collate.c"
_SO = _HERE / "_native" / "fast_collate.so"

_lib = None
_tried = False


def _load() -> Optional[ctypes.CDLL]:
    global _lib, _tried
    if _lib is not None or _tried:
        return _lib
    _tried = True
    try:
        if not _SO.exists() or _SO.stat().st_mtime < _SRC.stat().st_mtime:
            for cc in ("gcc", "cc", "g++"):
                cmd = [cc, "-O3", "-fopenmp", "-shared", "-fPIC", str(_SRC), "-o", str(_SO)]
                try:
                    subprocess.run(cmd, check=True, capture_output=True, timeout=120)
                    break
                except (subprocess.CalledProcessError, FileNotFoundError):
                    continue
            else:
                return None
        lib = ctypes.CDLL(str(_SO))
        lib.fast_stack.argtypes = [
            ctypes.POINTER(ctypes.c_void_p),
            ctypes.c_int64,
            ctypes.c_int64,
            ctypes.c_void_p,
        ]
        lib.fast_stack.restype = None
        _lib = lib
        logging.debug("native fast_collate loaded")
    except Exception as e:  # pragma: no cover - toolchain-dependent
        logging.debug(f"native fast_collate unavailable: {e}")
        _lib = None
    return _lib


def native_available() -> bool:
    return _load() is not None


# Below this, np.stack's overhead is negligible — skip the ctypes hop.
_MIN_NATIVE_BYTES = 1 << 20


def _worth_native() -> bool:
    """The win is the OpenMP parallel copy; on a single-core host the ctypes
    hop only adds overhead (measured ~+20% on the 1-vCPU dev rig)."""
    import os

    return (os.cpu_count() or 1) > 1


def fast_stack(items: Sequence[np.ndarray]) -> np.ndarray:
    """Stack equally-shaped arrays along a new axis 0 (parallel memcpy)."""
    n = len(items)
    first = np.ascontiguousarray(items[0])
    total = n * first.nbytes
    lib = _load() if (total >= _MIN_NATIVE_BYTES and _worth_native()) else None
    if lib is None:
        return np.stack(items)

    contig: List[np.ndarray] = [first]
    for it in items[1:]:
        a = np.ascontiguousarray(it)
        if a.shape != first.shape or a.dtype != first.dtype:
            return np.stack(items)
        contig.append(a)

    out = np.empty((n, *first.shape), dtype=first.dtype)
    ptrs = (ctypes.c_void_p * n)(*[a.ctypes.data for a in contig])
    lib.fast_stack(ptrs, n, first.nbytes, out.ctypes.data)
    return out
