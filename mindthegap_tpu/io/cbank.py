"""ctypes bridge to the native FASTA/FASTQ parser (native/fastx.cpp).

Returns records as (headers, packed code arrays) without python-level string
processing on the sequence path. Falls back to the pure-python bank when the
native library cannot be built."""

from __future__ import annotations

import ctypes
import os
import subprocess

import numpy as np

_NATIVE_DIR = os.path.join(
    os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__)))), "native"
)
_LIB_PATH = os.path.join(_NATIVE_DIR, "libmtgfastx.so")
_SRC_PATH = os.path.join(_NATIVE_DIR, "fastx.cpp")

_lib = None
_lib_failed = False


def _load():
    global _lib, _lib_failed
    if _lib is not None or _lib_failed:
        return _lib
    try:
        if not os.path.exists(_LIB_PATH) or os.path.getmtime(_LIB_PATH) < os.path.getmtime(_SRC_PATH):
            subprocess.run(
                ["g++", "-O2", "-shared", "-fPIC", "-o", _LIB_PATH, _SRC_PATH, "-lz"],
                check=True,
                capture_output=True,
            )
        lib = ctypes.CDLL(_LIB_PATH)
        lib.fastx_parse.restype = ctypes.c_void_p
        lib.fastx_parse.argtypes = [ctypes.c_char_p]
        lib.fastx_n.restype = ctypes.c_int64
        lib.fastx_n.argtypes = [ctypes.c_void_p]
        lib.fastx_codes_size.restype = ctypes.c_int64
        lib.fastx_codes_size.argtypes = [ctypes.c_void_p]
        lib.fastx_headers_size.restype = ctypes.c_int64
        lib.fastx_headers_size.argtypes = [ctypes.c_void_p]
        lib.fastx_codes.restype = ctypes.POINTER(ctypes.c_uint8)
        lib.fastx_codes.argtypes = [ctypes.c_void_p]
        lib.fastx_offsets.restype = ctypes.POINTER(ctypes.c_int64)
        lib.fastx_offsets.argtypes = [ctypes.c_void_p]
        lib.fastx_headers.restype = ctypes.POINTER(ctypes.c_char)
        lib.fastx_headers.argtypes = [ctypes.c_void_p]
        lib.fastx_free.argtypes = [ctypes.c_void_p]
        _lib = lib
    except Exception:
        _lib_failed = True
        _lib = None
    return _lib


def available() -> bool:
    return _load() is not None


def parse_codes(path: str):
    """Parse one FASTA/FASTQ(.gz) file natively.

    Returns (headers: list[str], codes: uint8 array, offsets: int64 array
    [n+1]) or None if the native parser is unavailable/failed."""
    lib = _load()
    if lib is None:
        return None
    h = lib.fastx_parse(path.encode())
    if not h:
        return None
    try:
        n = lib.fastx_n(h)
        csize = lib.fastx_codes_size(h)
        hsize = lib.fastx_headers_size(h)
        codes = np.ctypeslib.as_array(lib.fastx_codes(h), shape=(csize,)).copy()
        offsets = np.ctypeslib.as_array(lib.fastx_offsets(h), shape=(n + 1,)).copy()
        raw = ctypes.string_at(lib.fastx_headers(h), hsize)
        headers = raw.decode("utf-8", "replace").split("\0")[:-1] if hsize else []
        return headers, codes, offsets
    finally:
        lib.fastx_free(h)
