"""ctypes binding for the native C++ slide engine (native/wsireader.cpp).

Builds libwsireader.so on first use if missing (g++ + libtiff are baked into
the image). The native layer replaces OpenSlide (reference:
wsi_core/WholeSlideImage.py:31) with batched, thread-pooled region decodes.
"""
from __future__ import annotations

import ctypes
import os
import subprocess
import threading
from typing import Optional

import numpy as np

_NATIVE_DIR = os.path.join(os.path.dirname(os.path.dirname(
    os.path.dirname(os.path.abspath(__file__)))), "native")
_SO_PATH = os.path.join(_NATIVE_DIR, "libwsireader.so")
_lock = threading.Lock()
_lib: Optional[ctypes.CDLL] = None

COMPRESSION_NONE = 1
COMPRESSION_JPEG = 7
COMPRESSION_DEFLATE = 8


def _build() -> None:
    subprocess.run(["make", "-C", _NATIVE_DIR], check=True,
                   capture_output=True)


def get_lib() -> ctypes.CDLL:
    global _lib
    with _lock:
        if _lib is not None:
            return _lib
        src = os.path.join(_NATIVE_DIR, "wsireader.cpp")
        if not os.path.exists(_SO_PATH) or (
                os.path.exists(src)
                and os.path.getmtime(src) > os.path.getmtime(_SO_PATH)):
            _build()  # missing OR stale (source newer than the .so)
        lib = ctypes.CDLL(_SO_PATH)
        lib.ws_open.restype = ctypes.c_void_p
        lib.ws_open.argtypes = [ctypes.c_char_p]
        lib.ws_close.argtypes = [ctypes.c_void_p]
        lib.ws_level_count.argtypes = [ctypes.c_void_p]
        lib.ws_level_count.restype = ctypes.c_int32
        lib.ws_level_dims.argtypes = [
            ctypes.c_void_p, ctypes.c_int32,
            ctypes.POINTER(ctypes.c_int64), ctypes.POINTER(ctypes.c_int64)]
        lib.ws_read_region.argtypes = (
            [ctypes.c_void_p, ctypes.c_int32] + [ctypes.c_int64] * 4 +
            [ctypes.c_void_p])
        lib.ws_read_region.restype = ctypes.c_int32
        lib.ws_read_regions.argtypes = [
            ctypes.c_void_p, ctypes.c_int32, ctypes.c_void_p, ctypes.c_int32,
            ctypes.c_int64, ctypes.c_int64, ctypes.c_void_p, ctypes.c_int32]
        lib.ws_read_regions.restype = ctypes.c_int32
        lib.ws_write_pyramid.argtypes = [
            ctypes.c_char_p, ctypes.c_void_p, ctypes.c_int64, ctypes.c_int64,
            ctypes.c_int32, ctypes.c_int32, ctypes.c_int32, ctypes.c_int32]
        lib.ws_write_pyramid.restype = ctypes.c_int32
        lib.ws_write_pyramid2.argtypes = [
            ctypes.c_char_p, ctypes.c_void_p, ctypes.c_int64, ctypes.c_int64,
            ctypes.c_int32, ctypes.c_int32, ctypes.c_int32, ctypes.c_int32,
            ctypes.c_int32]
        lib.ws_write_pyramid2.restype = ctypes.c_int32
        lib.ws_supports_yuv420.argtypes = [ctypes.c_void_p, ctypes.c_int32]
        lib.ws_supports_yuv420.restype = ctypes.c_int32
        lib.ws_read_regions_yuv420.argtypes = [
            ctypes.c_void_p, ctypes.c_int32, ctypes.c_void_p, ctypes.c_int32,
            ctypes.c_int64, ctypes.c_int64, ctypes.c_void_p, ctypes.c_void_p,
            ctypes.c_void_p, ctypes.c_int32]
        lib.ws_read_regions_yuv420.restype = ctypes.c_int32
        lib.ws_dct_probe.argtypes = [
            ctypes.c_void_p, ctypes.c_int32, ctypes.c_void_p]
        lib.ws_dct_probe.restype = ctypes.c_int32
        lib.ws_read_regions_dct2.argtypes = (
            [ctypes.c_void_p, ctypes.c_int32, ctypes.c_void_p,
             ctypes.c_int32, ctypes.c_int64, ctypes.c_int64] +
            [ctypes.c_void_p] * 5 + [ctypes.c_int32])
        lib.ws_read_regions_dct2.restype = ctypes.c_int32
        lib.ws_dct_group_size.restype = ctypes.c_int32
        lib.ws_dct_group_size.argtypes = []
        lib.ws_level_compression.argtypes = [ctypes.c_void_p,
                                             ctypes.c_int32]
        lib.ws_level_compression.restype = ctypes.c_int32
        lib.ws_compression_supported.argtypes = [ctypes.c_int32]
        lib.ws_compression_supported.restype = ctypes.c_int32
        lib.ws_j2k_available.argtypes = []
        lib.ws_j2k_available.restype = ctypes.c_int32
        lib.ws_yuv_layout.argtypes = [ctypes.c_void_p, ctypes.c_int32]
        lib.ws_yuv_layout.restype = ctypes.c_int32
        lib.ws_read_regions_planes.argtypes = [
            ctypes.c_void_p, ctypes.c_int32, ctypes.c_void_p, ctypes.c_int32,
            ctypes.c_int64, ctypes.c_int64, ctypes.c_void_p, ctypes.c_void_p,
            ctypes.c_void_p, ctypes.c_int32, ctypes.c_int32, ctypes.c_int32]
        lib.ws_read_regions_planes.restype = ctypes.c_int32
        # test-fixture lossless J2K encoder (subsampled YCC components —
        # the Aperio 33003 tile layout no Python encoder here can produce)
        lib.ws_j2k_encode_planes.argtypes = [
            ctypes.c_int64, ctypes.c_int64, ctypes.c_int32, ctypes.c_int32,
            ctypes.c_void_p, ctypes.c_void_p, ctypes.c_void_p,
            ctypes.c_int32, ctypes.c_void_p, ctypes.c_int64]
        lib.ws_j2k_encode_planes.restype = ctypes.c_int64
        _lib = lib
        return lib


def write_pyramid(path: str, level0: np.ndarray, tile: int = 256,
                  n_levels: int = 4, compression: int = COMPRESSION_JPEG,
                  quality: int = 80, ycbcr420: bool = False) -> None:
    """Write an RGB [H, W, 3] uint8 array as a tiled pyramidal TIFF.
    ycbcr420 stores JPEG tiles as YCbCr with 2x2 chroma subsampling (the
    TCGA .svs convention) — enables the raw-plane read fast path."""
    lib = get_lib()
    level0 = np.ascontiguousarray(level0, dtype=np.uint8)
    h, w = level0.shape[:2]
    r = lib.ws_write_pyramid2(
        path.encode(), level0.ctypes.data_as(ctypes.c_void_p),
        w, h, tile, n_levels, compression, quality, int(ycbcr420))
    if r != 0:
        raise IOError(f"ws_write_pyramid failed ({r}) for {path}")
