"""ctypes bindings for the native host-IO library (combat_io.cc).

Builds ``libcombat_io.so`` on first use with g++ (cached next to the source);
every entry point has a numpy fallback so the framework runs without a
toolchain.  See combat_io.cc for why this layer exists (it replaces the
reference's DataLoader worker processes — utils/dataloader.py:120-122).
"""

from __future__ import annotations

import ctypes
import os
import subprocess
from typing import Optional, Tuple

import numpy as np

_DIR = os.path.dirname(os.path.abspath(__file__))
_SRC = os.path.join(_DIR, "combat_io.cc")
_LIB = os.path.join(_DIR, "libcombat_io.so")

_lib = None
_lib_tried = False


def _load() -> Optional[ctypes.CDLL]:
    global _lib, _lib_tried
    if _lib_tried:
        return _lib
    _lib_tried = True
    try:
        if not os.path.exists(_LIB) or os.path.getmtime(_LIB) < os.path.getmtime(_SRC):
            subprocess.run(
                ["g++", "-O3", "-shared", "-fPIC", "-pthread", "-std=c++17", _SRC, "-o", _LIB],
                check=True,
                capture_output=True,
            )
        lib = ctypes.CDLL(_LIB)
        lib.normalize_u8_f32.argtypes = [
            ctypes.POINTER(ctypes.c_uint8), ctypes.POINTER(ctypes.c_float),
            ctypes.c_int64, ctypes.c_float, ctypes.c_float, ctypes.c_int,
        ]
        lib.gather_rows_f32.argtypes = [
            ctypes.POINTER(ctypes.c_float), ctypes.POINTER(ctypes.c_int64),
            ctypes.POINTER(ctypes.c_float), ctypes.c_int64, ctypes.c_int64, ctypes.c_int,
        ]
        lib.decode_cifar10_bin.argtypes = [
            ctypes.c_char_p, ctypes.POINTER(ctypes.c_float),
            ctypes.POINTER(ctypes.c_int32), ctypes.c_int64, ctypes.c_int,
        ]
        lib.decode_cifar10_bin.restype = ctypes.c_int64
        _lib = lib
    except Exception:
        _lib = None
    return _lib


def available() -> bool:
    return _load() is not None


def normalize_u8(src: np.ndarray, scale: float = 2.0 / 255.0, bias: float = -1.0, n_threads: int = 0) -> np.ndarray:
    """uint8 → float32 affine map; native when available."""
    src = np.ascontiguousarray(src, dtype=np.uint8)
    lib = _load()
    if lib is None:
        return src.astype(np.float32) * scale + bias
    out = np.empty(src.shape, np.float32)
    lib.normalize_u8_f32(
        src.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        src.size, scale, bias, n_threads,
    )
    return out


def gather_rows(data: np.ndarray, idx: np.ndarray, n_threads: int = 0) -> np.ndarray:
    """out[i] = data[idx[i]] over the leading axis; native when available."""
    data = np.ascontiguousarray(data, dtype=np.float32)
    idx = np.ascontiguousarray(idx, dtype=np.int64)
    lib = _load()
    if lib is None:
        return data[idx]
    row = int(np.prod(data.shape[1:]))
    out = np.empty((idx.shape[0],) + data.shape[1:], np.float32)
    lib.gather_rows_f32(
        data.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        idx.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)),
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        idx.shape[0], row, n_threads,
    )
    return out


def decode_cifar10_bin(path: str, max_records: int = 10000, n_threads: int = 0) -> Optional[Tuple[np.ndarray, np.ndarray]]:
    """Decode a cifar-10-batches-bin file → (images NHWC f32 [-1,1], labels).
    Returns None if the native lib is unavailable (caller falls back)."""
    lib = _load()
    if lib is None:
        return None
    images = np.empty((max_records, 32, 32, 3), np.float32)
    labels = np.empty((max_records,), np.int32)
    n = lib.decode_cifar10_bin(
        path.encode(), images.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        labels.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)), max_records, n_threads,
    )
    if n < 0:
        return None
    return images[:n], labels[:n]
