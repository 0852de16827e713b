"""ctypes bindings for the native host-runtime library (native/ggrt_native.cpp).

Builds on first import with g++ (cached in native/build/); every entry
degrades gracefully to a numpy fallback if the toolchain is unavailable,
so the framework never hard-depends on the native path.
"""
from __future__ import annotations

import ctypes
import os
import subprocess
from pathlib import Path

import numpy as np

_ROOT = Path(__file__).resolve().parent.parent
_SRC = _ROOT / "native" / "ggrt_native.cpp"
_BUILD = _ROOT / "native" / "build"
_LIB_PATH = _BUILD / "libggrt_native.so"

_lib = None
_tried = False


def _build() -> bool:
    _BUILD.mkdir(parents=True, exist_ok=True)
    cmd = [
        "g++", "-O3", "-fopenmp", "-shared", "-fPIC", "-std=c++17",
        str(_SRC), "-o", str(_LIB_PATH),
    ]
    try:
        subprocess.run(cmd, check=True, capture_output=True, timeout=300)
        return True
    except Exception:
        return False


def get_lib():
    """Load (building if needed) the native library, or None."""
    global _lib, _tried
    if _lib is not None or _tried:
        return _lib
    _tried = True
    if not _LIB_PATH.exists() or _LIB_PATH.stat().st_mtime < _SRC.stat().st_mtime:
        if not _build():
            return None
    try:
        lib = ctypes.CDLL(str(_LIB_PATH))
    except OSError:
        return None

    f32p = ctypes.POINTER(ctypes.c_float)
    u8p = ctypes.POINTER(ctypes.c_uint8)
    lib.resize_bilinear_aa.argtypes = [f32p] + [ctypes.c_int] * 3 + [f32p] + [ctypes.c_int] * 2
    lib.pose_distances.argtypes = [f32p, ctypes.c_int, f32p, f32p]
    lib.ring_create.restype = ctypes.c_void_p
    lib.ring_create.argtypes = [ctypes.c_int]
    lib.ring_destroy.argtypes = [ctypes.c_void_p]
    lib.ring_push.argtypes = [ctypes.c_void_p, u8p, ctypes.c_int64]
    lib.ring_push.restype = ctypes.c_int
    lib.ring_pop.argtypes = [ctypes.c_void_p, u8p, ctypes.c_int64]
    lib.ring_pop.restype = ctypes.c_int64
    lib.ring_size.argtypes = [ctypes.c_void_p]
    lib.ring_size.restype = ctypes.c_int64
    _lib = lib
    return _lib


def _fptr(a: np.ndarray):
    return a.ctypes.data_as(ctypes.POINTER(ctypes.c_float))


def resize_bilinear_aa(image: np.ndarray, out_hw: tuple[int, int]) -> np.ndarray:
    """Anti-aliased float32 HWC resize; numpy fallback when no native lib."""
    image = np.ascontiguousarray(image, np.float32)
    h, w, c = image.shape
    dh, dw = out_hw
    lib = get_lib()
    if lib is not None:
        out = np.empty((dh, dw, c), np.float32)
        lib.resize_bilinear_aa(_fptr(image), h, w, c, _fptr(out), dh, dw)
        return out
    # Fallback: cv2 (what the reference uses), else nearest.
    try:
        import cv2

        from .data.llff import downsample_gaussian_blur

        ratio = dh / h
        return cv2.resize(
            downsample_gaussian_blur(image, ratio), (dw, dh), interpolation=cv2.INTER_LINEAR
        )
    except ImportError:
        ys = (np.linspace(0, h - 1, dh)).astype(int)
        xs = (np.linspace(0, w - 1, dw)).astype(int)
        return image[ys][:, xs]


def pose_distances(ref_c2w: np.ndarray, tar_c2w: np.ndarray) -> np.ndarray:
    """Camera-center distances (n,) from (n, 4, 4) refs to one (4, 4) target."""
    ref = np.ascontiguousarray(ref_c2w, np.float32)
    tar = np.ascontiguousarray(tar_c2w, np.float32)
    lib = get_lib()
    if lib is not None:
        out = np.empty(ref.shape[0], np.float32)
        lib.pose_distances(_fptr(ref), ref.shape[0], _fptr(tar), _fptr(out))
        return out
    return np.linalg.norm(ref[:, :3, 3] - tar[:3, 3], axis=-1)


class PrefetchRing:
    """SPSC blob ring (native) for producer-thread loader prefetch."""

    def __init__(self, capacity: int = 8):
        lib = get_lib()
        self._lib = lib
        if lib is not None:
            self._h = lib.ring_create(capacity)
        else:
            import collections

            self._q = collections.deque(maxlen=capacity)

    def push(self, blob: bytes) -> bool:
        if self._lib is not None:
            arr = np.frombuffer(blob, np.uint8)
            return bool(
                self._lib.ring_push(
                    self._h, arr.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)), arr.size
                )
            )
        if len(self._q) == self._q.maxlen:
            return False
        self._q.append(blob)
        return True

    def pop(self, max_size: int = 1 << 26):
        if self._lib is not None:
            out = np.empty(max_size, np.uint8)
            n = self._lib.ring_pop(
                self._h, out.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)), max_size
            )
            if n < 0:
                return None
            return out[:n].tobytes()
        return self._q.popleft() if self._q else None

    def __len__(self):
        if self._lib is not None:
            return int(self._lib.ring_size(self._h))
        return len(self._q)

    def __del__(self):
        if getattr(self, "_lib", None) is not None:
            self._lib.ring_destroy(self._h)
