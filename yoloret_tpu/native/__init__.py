"""ctypes bindings for the native data-loader core (dataloader.cc).

Builds the shared library on first import (g++, cached next to the
source); every entry point degrades gracefully to the pure-Python path
when the toolchain or libjpeg is unavailable, so the framework never
hard-depends on the native build.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import threading
from typing import List, Optional, Tuple

import numpy as np

_HERE = os.path.dirname(os.path.abspath(__file__))
_SRC = os.path.join(_HERE, "dataloader.cc")
_SO = os.path.join(_HERE, "libyoloret_native.so")

_lib = None
_lock = threading.Lock()
_build_failed = False


def _build() -> Optional[str]:
    if os.path.exists(_SO) and os.path.getmtime(_SO) >= os.path.getmtime(_SRC):
        return _SO
    cmd = [
        "g++", "-O3", "-march=native", "-shared", "-fPIC", _SRC,
        "-ljpeg", "-lpthread", "-o", _SO,
    ]
    try:
        subprocess.run(cmd, check=True, capture_output=True, timeout=120)
        return _SO
    except Exception:
        return None


def get_lib() -> Optional[ctypes.CDLL]:
    """The loaded native library, building it if needed; None if
    unavailable (no g++/libjpeg)."""
    global _lib, _build_failed
    if _lib is not None:
        return _lib
    if _build_failed:
        return None
    with _lock:
        if _lib is not None:
            return _lib
        so = _build()
        if so is None:
            _build_failed = True
            return None
        try:
            lib = ctypes.CDLL(so)
        except OSError:
            _build_failed = True
            return None
        lib.yt_crc32c.restype = ctypes.c_uint32
        lib.yt_crc32c.argtypes = [ctypes.c_char_p, ctypes.c_uint64]
        lib.yt_masked_crc.restype = ctypes.c_uint32
        lib.yt_masked_crc.argtypes = [ctypes.c_char_p, ctypes.c_uint64]
        lib.yt_decode_resize_file.restype = ctypes.c_int
        lib.yt_decode_resize_file.argtypes = [
            ctypes.c_char_p, ctypes.c_int,
            ctypes.POINTER(ctypes.c_float),
            ctypes.POINTER(ctypes.c_int), ctypes.POINTER(ctypes.c_int),
        ]
        lib.yt_decode_resize_mem.restype = ctypes.c_int
        lib.yt_decode_resize_mem.argtypes = [
            ctypes.c_char_p, ctypes.c_uint64, ctypes.c_int,
            ctypes.POINTER(ctypes.c_float),
            ctypes.POINTER(ctypes.c_int), ctypes.POINTER(ctypes.c_int),
        ]
        lib.yt_decode_resize_file_u8.restype = ctypes.c_int
        lib.yt_decode_resize_file_u8.argtypes = [
            ctypes.c_char_p, ctypes.c_int,
            ctypes.POINTER(ctypes.c_uint8),
            ctypes.POINTER(ctypes.c_int), ctypes.POINTER(ctypes.c_int),
        ]
        lib.yt_decode_resize_mem_u8.restype = ctypes.c_int
        lib.yt_decode_resize_mem_u8.argtypes = [
            ctypes.c_char_p, ctypes.c_uint64, ctypes.c_int,
            ctypes.POINTER(ctypes.c_uint8),
            ctypes.POINTER(ctypes.c_int), ctypes.POINTER(ctypes.c_int),
        ]
        lib.yt_decode_resize_q_file_u8.restype = ctypes.c_int
        lib.yt_decode_resize_q_file_u8.argtypes = [
            ctypes.c_char_p, ctypes.c_int, ctypes.c_int,
            ctypes.POINTER(ctypes.c_uint8),
            ctypes.POINTER(ctypes.c_int), ctypes.POINTER(ctypes.c_int),
        ]
        lib.yt_decode_resize_q_mem_u8.restype = ctypes.c_int
        lib.yt_decode_resize_q_mem_u8.argtypes = [
            ctypes.c_char_p, ctypes.c_uint64, ctypes.c_int, ctypes.c_int,
            ctypes.POINTER(ctypes.c_uint8),
            ctypes.POINTER(ctypes.c_int), ctypes.POINTER(ctypes.c_int),
        ]
        lib.yt_decode_resize_batch.restype = ctypes.c_int
        lib.yt_decode_resize_batch.argtypes = [
            ctypes.POINTER(ctypes.c_char_p), ctypes.c_int, ctypes.c_int,
            ctypes.POINTER(ctypes.c_float), ctypes.POINTER(ctypes.c_int),
            ctypes.c_int,
        ]
        _lib = lib
        return _lib


def available() -> bool:
    return get_lib() is not None


def crc32c(data: bytes) -> int:
    lib = get_lib()
    if lib is None:
        from yoloret_tpu.data.tfrecord import crc32c as py_crc

        return py_crc(data)
    return int(lib.yt_crc32c(data, len(data)))


def decode_resize(path: str, staging: int) -> Tuple[np.ndarray, Tuple[int, int]]:
    """JPEG file -> ([staging, staging, 3] f32 in [0,1], (orig_h, orig_w)).
    Raises IOError on decode failure."""
    lib = get_lib()
    if lib is None:
        raise RuntimeError("native loader unavailable")
    out = np.empty((staging, staging, 3), np.float32)
    h = ctypes.c_int()
    w = ctypes.c_int()
    rc = lib.yt_decode_resize_file(
        path.encode(), staging,
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        ctypes.byref(h), ctypes.byref(w),
    )
    if rc != 0:
        raise IOError(f"native JPEG decode failed ({rc}) for {path!r}")
    return out, (h.value, w.value)


def decode_resize_u8(path: str, staging: int) -> Tuple[np.ndarray, Tuple[int, int]]:
    """JPEG file -> ([S, S, 3] uint8, (orig_h, orig_w))."""
    lib = get_lib()
    if lib is None:
        raise RuntimeError("native loader unavailable")
    out = np.empty((staging, staging, 3), np.uint8)
    h = ctypes.c_int()
    w = ctypes.c_int()
    rc = lib.yt_decode_resize_file_u8(
        path.encode(), staging,
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
        ctypes.byref(h), ctypes.byref(w),
    )
    if rc != 0:
        raise IOError(f"native JPEG decode failed ({rc}) for {path!r}")
    return out, (h.value, w.value)


def decode_resize_q_u8(
    path: str, staging: int, quality: int
) -> Tuple[np.ndarray, Tuple[int, int]]:
    """JPEG file -> resize to staging -> re-encode at ``quality`` ->
    decode: the random-JPEG-quality augmentation fused into the native
    loader, applied at staging scale like the reference
    (code/yolo3/utils.py:228-231 runs it after the resize)."""
    lib = get_lib()
    if lib is None:
        raise RuntimeError("native loader unavailable")
    out = np.empty((staging, staging, 3), np.uint8)
    h = ctypes.c_int()
    w = ctypes.c_int()
    rc = lib.yt_decode_resize_q_file_u8(
        path.encode(), staging, int(quality),
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
        ctypes.byref(h), ctypes.byref(w),
    )
    if rc != 0:
        raise IOError(f"native JPEG decode failed ({rc}) for {path!r}")
    return out, (h.value, w.value)


def decode_resize_q_bytes_u8(
    data: bytes, staging: int, quality: int
) -> Tuple[np.ndarray, Tuple[int, int]]:
    """In-memory JPEG bytes variant of :func:`decode_resize_q_u8`."""
    lib = get_lib()
    if lib is None:
        raise RuntimeError("native loader unavailable")
    out = np.empty((staging, staging, 3), np.uint8)
    h = ctypes.c_int()
    w = ctypes.c_int()
    rc = lib.yt_decode_resize_q_mem_u8(
        data, len(data), staging, int(quality),
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
        ctypes.byref(h), ctypes.byref(w),
    )
    if rc != 0:
        raise IOError(f"native JPEG decode failed ({rc})")
    return out, (h.value, w.value)


def decode_resize_bytes_u8(data: bytes, staging: int) -> Tuple[np.ndarray, Tuple[int, int]]:
    """In-memory JPEG bytes -> ([S, S, 3] uint8, (orig_h, orig_w))."""
    lib = get_lib()
    if lib is None:
        raise RuntimeError("native loader unavailable")
    out = np.empty((staging, staging, 3), np.uint8)
    h = ctypes.c_int()
    w = ctypes.c_int()
    rc = lib.yt_decode_resize_mem_u8(
        data, len(data), staging,
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
        ctypes.byref(h), ctypes.byref(w),
    )
    if rc != 0:
        raise IOError(f"native JPEG decode failed ({rc})")
    return out, (h.value, w.value)


def decode_resize_bytes(data: bytes, staging: int) -> Tuple[np.ndarray, Tuple[int, int]]:
    """In-memory JPEG bytes -> ([S, S, 3] f32, (orig_h, orig_w))."""
    lib = get_lib()
    if lib is None:
        raise RuntimeError("native loader unavailable")
    out = np.empty((staging, staging, 3), np.float32)
    h = ctypes.c_int()
    w = ctypes.c_int()
    rc = lib.yt_decode_resize_mem(
        data, len(data), staging,
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        ctypes.byref(h), ctypes.byref(w),
    )
    if rc != 0:
        raise IOError(f"native JPEG decode failed ({rc})")
    return out, (h.value, w.value)


def decode_resize_batch(
    paths: List[str], staging: int, threads: int = 8
) -> Tuple[np.ndarray, np.ndarray, int]:
    """Threaded batch decode. Returns (images [N, S, S, 3] f32,
    hw [N, 2] int32, n_failures); failed slots are zeroed."""
    lib = get_lib()
    if lib is None:
        raise RuntimeError("native loader unavailable")
    n = len(paths)
    out = np.empty((n, staging, staging, 3), np.float32)
    hw = np.empty((n, 2), np.int32)
    arr = (ctypes.c_char_p * n)(*[p.encode() for p in paths])
    failures = lib.yt_decode_resize_batch(
        arr, n, staging,
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        hw.ctypes.data_as(ctypes.POINTER(ctypes.c_int)),
        threads,
    )
    return out, hw, int(failures)
