"""Native (C++) runtime components, loaded via ctypes.

The shared library is built on first import with g++ (cached next to the
sources); every native entry point has a pure-Python fallback, so the
framework works without a toolchain — just slower on the host pipeline.
"""

import ctypes
import os
import subprocess

import numpy as np

_DIR = os.path.dirname(os.path.abspath(__file__))
_SRC = os.path.join(_DIR, "ark_parser.cc")
_LIB = os.path.join(_DIR, "libastio.so")

_lib = None


def _build():
    cmd = ["g++", "-O3", "-shared", "-fPIC", _SRC, "-o", _LIB]
    subprocess.run(cmd, check=True, capture_output=True)


def _load():
    global _lib
    if _lib is not None:
        return _lib
    try:
        if (not os.path.exists(_LIB)
                or os.path.getmtime(_LIB) < os.path.getmtime(_SRC)):
            _build()
        lib = ctypes.CDLL(_LIB)
    except Exception:
        return None

    class ArkResult(ctypes.Structure):
        _fields_ = [
            ("data", ctypes.POINTER(ctypes.c_float)),
            ("n_floats", ctypes.c_longlong),
            ("rows", ctypes.POINTER(ctypes.c_longlong)),
            ("n_utts", ctypes.c_longlong),
            ("cols", ctypes.c_int),
            ("names", ctypes.c_char_p),
            ("names_len", ctypes.c_longlong),
        ]

    lib.ark_parse_text.restype = ctypes.POINTER(ArkResult)
    lib.ark_parse_text.argtypes = [ctypes.c_char_p]
    lib.ark_free.argtypes = [ctypes.POINTER(ArkResult)]
    lib._ArkResult = ArkResult
    _lib = lib
    return lib


def _fast_text_ark(path):
    """(utt_id, (T, D) float32) items from a text ark via the C++ parser.

    Parses and validates eagerly (before anything is yielded): the C++
    pass assumes one rectangular column count for the whole file, so a
    ragged/truncated/mixed-dims ark is detected here by a float-count
    mismatch and rejected with ValueError — the caller falls back to
    the per-matrix Python parser instead of slicing misaligned (or
    out-of-bounds) views out of the flat buffer.
    """
    lib = _load()
    res = lib.ark_parse_text(path.encode())
    if not res:
        raise IOError(f"failed to parse ark: {path}")
    try:
        r = res.contents
        n = int(r.n_utts)
        if n == 0:
            return iter(())
        cols = int(r.cols)
        rows = np.ctypeslib.as_array(r.rows, shape=(n,)).copy()
        total = int(rows.sum())
        names = (r.names or b"").decode().split("\n")
        if (cols <= 0 or (rows < 0).any() or len(names) != n
                or total * cols != int(r.n_floats)):
            raise ValueError(
                f"ark {path} is not representable by the fast parser "
                f"(ragged dims or malformed matrix markers)")
        flat = np.ctypeslib.as_array(r.data, shape=(total * cols,)).copy()
    finally:
        lib.ark_free(res)
    offset = 0
    items = []
    for i in range(n):
        t = int(rows[i])
        items.append(
            (names[i], flat[offset: offset + t * cols].reshape(t, cols)))
        offset += t * cols
    return iter(items)


fast_text_ark = _fast_text_ark if _load() is not None else None
