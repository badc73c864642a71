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
_SRCS = [os.path.join(_DIR, "ark_parser.cc"),
         os.path.join(_DIR, "shorten_dec.cc")]
_LIB = os.path.join(_DIR, "libastio.so")

_lib = None


def _build():
    cmd = ["g++", "-O3", "-shared", "-fPIC", *_SRCS, "-o", _LIB]
    subprocess.run(cmd, check=True, capture_output=True)


def _load():
    global _lib
    if _lib is not None:
        return _lib
    try:
        if (not os.path.exists(_LIB)
                or os.path.getmtime(_LIB)
                < max(os.path.getmtime(s) for s in _SRCS)):
            _build()
        lib = ctypes.CDLL(_LIB)
        if not hasattr(lib, "shn_decode"):
            _build()          # stale single-source library: rebuild
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

    class ShnResult(ctypes.Structure):
        _fields_ = [
            ("samples", ctypes.POINTER(ctypes.c_int32)),
            ("n", ctypes.c_longlong),
            ("nchan", ctypes.c_int),
            ("ftype", ctypes.c_int),
            ("verbatim", ctypes.POINTER(ctypes.c_uint8)),
            ("verbatim_len", ctypes.c_longlong),
            ("error", ctypes.c_char_p),
        ]

    lib.shn_decode.restype = ctypes.POINTER(ShnResult)
    lib.shn_decode.argtypes = [ctypes.c_char_p, ctypes.c_longlong,
                               ctypes.c_longlong]
    lib.shn_free.argtypes = [ctypes.POINTER(ShnResult)]
    lib._ShnResult = ShnResult
    _lib = lib
    return lib


def _fast_shn_decode(data, max_samples=None):
    """Shorten v2 stream -> (ftype, (n, nchan) int32, verbatim bytes)
    via the C++ decoder; raises ValueError with the decoder's message
    on malformed streams.  Returns None if the library is unavailable.
    """
    lib = _load()
    if lib is None:
        return None
    res = lib.shn_decode(bytes(data), len(data),
                         -1 if max_samples is None else int(max_samples))
    if not res:
        raise MemoryError("shn_decode allocation failed")
    try:
        r = res.contents
        if r.error:
            raise ValueError(r.error.decode())
        n, nchan = int(r.n), int(r.nchan)
        if n:
            samples = np.ctypeslib.as_array(
                r.samples, shape=(n * nchan,)).copy().reshape(n, nchan)
        else:
            samples = np.zeros((0, max(nchan, 1)), dtype=np.int32)
        verb = b""
        if r.verbatim_len:
            verb = bytes(np.ctypeslib.as_array(
                r.verbatim, shape=(int(r.verbatim_len),)))
        return int(r.ftype), samples, verb
    finally:
        lib.shn_free(res)


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
fast_shn_decode = _fast_shn_decode if _load() is not None else None
