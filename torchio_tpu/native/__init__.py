"""ctypes bindings for the native decode engine (libfastnifti).

Auto-builds with g++ on first import when the shared library is missing
(source in ``native/fastnifti.cpp``); every entry point has a pure-numpy
fallback so the package works without a toolchain.
"""

from __future__ import annotations

import ctypes
import subprocess
from pathlib import Path

import numpy as np

_LIB_PATH = Path(__file__).parent / "libfastnifti.so"
_SRC_DIR = Path(__file__).parent.parent.parent / "native"
_lib: ctypes.CDLL | None = None
_tried = False


def _build() -> bool:
    if not (_SRC_DIR / "fastnifti.cpp").is_file():
        return False
    try:
        subprocess.run(  # noqa: S603
            ["make", "-C", str(_SRC_DIR)],
            check=True,
            capture_output=True,
            timeout=120,
        )
        return _LIB_PATH.is_file()
    except (subprocess.SubprocessError, OSError):
        return False


def get_lib() -> ctypes.CDLL | None:
    """Load (building if needed) the native library, or None."""
    global _lib, _tried
    if _lib is not None or _tried:
        return _lib
    _tried = True
    if not _LIB_PATH.is_file() and not _build():
        return None
    try:
        lib = ctypes.CDLL(str(_LIB_PATH))
        lib.fn_gunzip.restype = ctypes.c_longlong
        lib.fn_gunzip.argtypes = [
            ctypes.c_char_p,
            ctypes.c_longlong,
            ctypes.c_void_p,
            ctypes.c_longlong,
        ]
        lib.fn_f2c_transpose.restype = ctypes.c_int
        lib.fn_f2c_transpose.argtypes = [
            ctypes.c_void_p,
            ctypes.c_void_p,
            ctypes.c_longlong,
            ctypes.c_longlong,
            ctypes.c_longlong,
            ctypes.c_int,
        ]
        lib.fn_byteswap.restype = ctypes.c_int
        lib.fn_byteswap.argtypes = [
            ctypes.c_void_p,
            ctypes.c_longlong,
            ctypes.c_int,
        ]
        if hasattr(lib, "fn_jls_decode"):
            lib.fn_jls_info.restype = ctypes.c_int
            lib.fn_jls_info.argtypes = [
                ctypes.c_char_p,
                ctypes.c_longlong,
                ctypes.POINTER(ctypes.c_int),
                ctypes.POINTER(ctypes.c_int),
                ctypes.POINTER(ctypes.c_int),
                ctypes.POINTER(ctypes.c_int),
            ]
            lib.fn_jls_decode.restype = ctypes.c_int
            lib.fn_jls_decode.argtypes = [
                ctypes.c_char_p,
                ctypes.c_longlong,
                ctypes.c_void_p,
                ctypes.c_longlong,
            ]
        if hasattr(lib, "fn_jpegll_decode"):
            lib.fn_jpegll_info.restype = ctypes.c_int
            lib.fn_jpegll_info.argtypes = [
                ctypes.c_char_p,
                ctypes.c_longlong,
                ctypes.POINTER(ctypes.c_int),
                ctypes.POINTER(ctypes.c_int),
                ctypes.POINTER(ctypes.c_int),
            ]
            lib.fn_jpegll_decode.restype = ctypes.c_int
            lib.fn_jpegll_decode.argtypes = [
                ctypes.c_char_p,
                ctypes.c_longlong,
                ctypes.c_void_p,
                ctypes.c_longlong,
            ]
        _lib = lib
    except OSError:
        _lib = None
    return _lib


def available() -> bool:
    return get_lib() is not None


def gunzip(data: bytes, expected_size: int) -> bytes:
    """Inflate a gzip stream into a preallocated buffer (native or zlib)."""
    lib = get_lib()
    if lib is not None:
        out = ctypes.create_string_buffer(expected_size)
        written = lib.fn_gunzip(data, len(data), out, expected_size)
        if written >= 0:
            return out.raw[:written]
        # Negative rc (corrupt stream, undersized buffer): a file that
        # loads without the native lib must never fail because of it.
    import gzip as _gzip
    import io as _io

    with _gzip.GzipFile(fileobj=_io.BytesIO(data)) as g:
        return g.read()


def f2c_transpose(arr_f: np.ndarray) -> np.ndarray:
    """(I, J, K) Fortran-order array -> contiguous C-order array."""
    lib = get_lib()
    if arr_f.ndim != 3 or lib is None or arr_f.itemsize not in (1, 2, 4, 8):
        return np.ascontiguousarray(arr_f)
    src = np.asfortranarray(arr_f)
    dst = np.empty(arr_f.shape, dtype=arr_f.dtype, order="C")
    ni, nj, nk = arr_f.shape
    rc = lib.fn_f2c_transpose(
        src.ctypes.data, dst.ctypes.data, ni, nj, nk, arr_f.itemsize
    )
    if rc != 0:
        return np.ascontiguousarray(arr_f)
    return dst


def byteswap_inplace(arr: np.ndarray) -> np.ndarray:
    """Endianness swap (native when possible)."""
    lib = get_lib()
    if lib is None or arr.itemsize not in (2, 4, 8) or not arr.flags["C_CONTIGUOUS"]:
        return arr.byteswap()
    lib.fn_byteswap(arr.ctypes.data, arr.size, arr.itemsize)
    return arr


def jls_decode(stream: bytes) -> np.ndarray | None:
    """Native JPEG-LS decode, or None (caller falls back to the
    pure-Python decoder in :mod:`torchio_tpu.io.jpeg_ls`)."""
    lib = get_lib()
    if lib is None or not hasattr(lib, "fn_jls_decode"):
        return None
    height = ctypes.c_int()
    width = ctypes.c_int()
    ncomp = ctypes.c_int()
    precision = ctypes.c_int()
    if lib.fn_jls_info(
        stream, len(stream),
        ctypes.byref(height), ctypes.byref(width),
        ctypes.byref(ncomp), ctypes.byref(precision),
    ):
        return None
    shape = (
        (height.value, width.value)
        if ncomp.value == 1
        else (height.value, width.value, ncomp.value)
    )
    out = np.empty(shape, np.uint16)
    rc = lib.fn_jls_decode(stream, len(stream), out.ctypes.data, out.size)
    if rc != 0:
        return None
    if precision.value <= 8:
        return out.astype(np.uint8)
    return out


def jpegll_decode(stream: bytes) -> np.ndarray | None:
    """Native JPEG-Lossless decode, or None (caller falls back to the
    pure-Python decoder in :mod:`torchio_tpu.io.jpeg_lossless`)."""
    lib = get_lib()
    if lib is None or not hasattr(lib, "fn_jpegll_decode"):
        return None
    height = ctypes.c_int()
    width = ctypes.c_int()
    precision = ctypes.c_int()
    if lib.fn_jpegll_info(
        stream, len(stream),
        ctypes.byref(height), ctypes.byref(width), ctypes.byref(precision),
    ):
        return None
    out = np.empty((height.value, width.value), np.uint16)
    rc = lib.fn_jpegll_decode(
        stream, len(stream), out.ctypes.data, out.size
    )
    if rc != 0:
        return None
    if precision.value <= 8:
        return out.astype(np.uint8)
    return out
