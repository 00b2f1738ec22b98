"""ctypes bindings for the native host runtime (native/rii_native.cpp).

Auto-builds the shared library with the repo Makefile on first use; all callers
fall back to pure-numpy paths when the toolchain is unavailable.
"""

import ctypes
import os
import subprocess

import numpy as np

_HERE = os.path.dirname(os.path.abspath(__file__))
_SO = os.path.join(_HERE, "librii_native.so")
_SRC_DIR = os.path.normpath(os.path.join(_HERE, "..", "..", "native"))

_lib = None
_tried = False


def _load():
    global _lib, _tried
    if _lib is not None or _tried:
        return _lib
    _tried = True
    if not os.path.exists(_SO) and os.path.exists(os.path.join(_SRC_DIR, "Makefile")):
        try:
            subprocess.run(["make", "-C", _SRC_DIR], check=True,
                           capture_output=True, timeout=120)
        except Exception:
            return None
    if not os.path.exists(_SO):
        return None
    try:
        lib = ctypes.CDLL(_SO)
    except OSError:
        return None
    lib.rii_texmex_probe.argtypes = [
        ctypes.c_char_p, ctypes.c_int,
        ctypes.POINTER(ctypes.c_int64), ctypes.POINTER(ctypes.c_int64)]
    lib.rii_texmex_probe.restype = ctypes.c_int
    lib.rii_texmex_read.argtypes = [
        ctypes.c_char_p, ctypes.c_int, ctypes.c_int64, ctypes.c_int64,
        ctypes.c_int64, ctypes.c_void_p]
    lib.rii_texmex_read.restype = ctypes.c_int
    lib.rii_texmex_read_b2f.argtypes = [
        ctypes.c_char_p, ctypes.c_int64, ctypes.c_int64, ctypes.c_int64,
        ctypes.c_void_p]
    lib.rii_texmex_read_b2f.restype = ctypes.c_int
    _lib = lib
    return lib


def available():
    return _load() is not None


_ELEM = {"f": (4, np.float32), "i": (4, np.int32), "b": (1, np.uint8)}


def texmex_probe(path, kind):
    """Return (dim, count) of a TexMex file. kind in {'f','i','b'}."""
    lib = _load()
    assert lib is not None, "native loader unavailable"
    elem_bytes, _ = _ELEM[kind]
    dim = ctypes.c_int64()
    count = ctypes.c_int64()
    rc = lib.rii_texmex_probe(path.encode(), elem_bytes,
                              ctypes.byref(dim), ctypes.byref(count))
    assert rc == 0, f"rii_texmex_probe failed: {rc}"
    return int(dim.value), int(count.value)


def texmex_read(path, kind, offset=0, count=None):
    """Read (count, dim) payload array from a TexMex file (parallel native copy)."""
    lib = _load()
    assert lib is not None, "native loader unavailable"
    elem_bytes, dtype = _ELEM[kind]
    dim, total = texmex_probe(path, kind)
    if count is None:
        count = total - offset
    out = np.empty((count, dim), dtype=dtype)
    rc = lib.rii_texmex_read(path.encode(), elem_bytes, dim, offset, count,
                             out.ctypes.data_as(ctypes.c_void_p))
    assert rc == 0, f"rii_texmex_read failed: {rc}"
    return out


def bvecs_read_f32(path, offset=0, count=None):
    """Read bvecs payload directly as float32 (fused convert)."""
    lib = _load()
    assert lib is not None, "native loader unavailable"
    dim, total = texmex_probe(path, "b")
    if count is None:
        count = total - offset
    out = np.empty((count, dim), dtype=np.float32)
    rc = lib.rii_texmex_read_b2f(path.encode(), dim, offset, count,
                                 out.ctypes.data_as(ctypes.c_void_p))
    assert rc == 0, f"rii_texmex_read_b2f failed: {rc}"
    return out
