"""ctypes binding for the native framebuffer runtime (native/framebuffer.cpp).

Builds the shared library on first use with the system C++ compiler (no
pybind11 in this environment; plain C ABI + ctypes).  Falls back cleanly:
``load_native()`` returns None when no compiler is available, and callers
(render.progressive) use the numpy path instead.
"""

from __future__ import annotations

import ctypes
import os
import shutil
import subprocess
import threading
from typing import Optional

import numpy as np

_SRC = os.path.join(
    os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__)))),
    "native",
    "framebuffer.cpp",
)
_CACHE_DIR = os.path.join(os.path.dirname(os.path.abspath(__file__)), "_build")
_LIB_PATH = os.path.join(_CACHE_DIR, "libssfb.so")

_lock = threading.Lock()
_lib = None
_tried = False


def _build() -> Optional[str]:
    cxx = shutil.which("g++") or shutil.which("c++") or shutil.which("clang++")
    if not cxx or not os.path.exists(_SRC):
        return None
    os.makedirs(_CACHE_DIR, exist_ok=True)
    if os.path.exists(_LIB_PATH) and os.path.getmtime(_LIB_PATH) >= os.path.getmtime(_SRC):
        return _LIB_PATH
    cmd = [cxx, "-O2", "-shared", "-fPIC", "-std=c++17", "-pthread", _SRC, "-o", _LIB_PATH]
    try:
        subprocess.run(cmd, check=True, capture_output=True)
    except subprocess.CalledProcessError:
        return None
    return _LIB_PATH


def load_native():
    """Returns the ctypes library handle, building it if needed; None when
    unavailable."""
    global _lib, _tried
    with _lock:
        if _lib is not None or _tried:
            return _lib
        _tried = True
        path = _build()
        if path is None:
            return None
        lib = ctypes.CDLL(path)
        lib.ssfb_create.restype = ctypes.c_void_p
        lib.ssfb_create.argtypes = [ctypes.c_uint32, ctypes.c_uint32]
        lib.ssfb_destroy.argtypes = [ctypes.c_void_p]
        lib.ssfb_add_chunk.argtypes = [
            ctypes.c_void_p, ctypes.c_uint64, ctypes.c_uint64,
            ctypes.POINTER(ctypes.c_float), ctypes.POINTER(ctypes.c_float),
        ]
        lib.ssfb_note_pass.argtypes = [ctypes.c_void_p, ctypes.c_uint32]
        lib.ssfb_spp_done.restype = ctypes.c_uint64
        lib.ssfb_spp_done.argtypes = [ctypes.c_void_p]
        lib.ssfb_mean.argtypes = [
            ctypes.c_void_p, ctypes.POINTER(ctypes.c_double), ctypes.POINTER(ctypes.c_double)
        ]
        lib.ssfb_tonemap_srgb_u8.argtypes = [
            ctypes.c_void_p, ctypes.POINTER(ctypes.c_float), ctypes.c_int,
            ctypes.POINTER(ctypes.c_uint8),
        ]
        lib.ssfb_checkpoint_async.restype = ctypes.c_int
        lib.ssfb_checkpoint_async.argtypes = [ctypes.c_void_p, ctypes.c_char_p]
        lib.ssfb_checkpoint_wait.restype = ctypes.c_int
        lib.ssfb_checkpoint_wait.argtypes = [ctypes.c_void_p]
        lib.ssfb_checkpoint_load.restype = ctypes.c_int
        lib.ssfb_checkpoint_load.argtypes = [ctypes.c_void_p, ctypes.c_char_p]
        _lib = lib
        return _lib


def _fptr(a):
    return a.ctypes.data_as(ctypes.POINTER(ctypes.c_float))


def _dptr(a):
    return a.ctypes.data_as(ctypes.POINTER(ctypes.c_double))


class NativeFramebuffer:
    """Python wrapper over the C++ accumulator.  Raises RuntimeError when the
    native library cannot be built."""

    def __init__(self, width: int, height: int):
        lib = load_native()
        if lib is None:
            raise RuntimeError("native framebuffer library unavailable")
        self._lib = lib
        self._h = lib.ssfb_create(width, height)
        self.width = width
        self.height = height

    def __del__(self):
        if getattr(self, "_h", None):
            self._lib.ssfb_destroy(self._h)
            self._h = None

    def add_chunk(self, offset: int, value3: np.ndarray, alpha: np.ndarray):
        value3 = np.ascontiguousarray(value3, np.float32)
        alpha = np.ascontiguousarray(alpha, np.float32)
        assert value3.shape == (alpha.shape[0], 3)
        self._lib.ssfb_add_chunk(
            self._h, offset, alpha.shape[0], _fptr(value3), _fptr(alpha)
        )

    def note_pass(self, pass_spp: int):
        self._lib.ssfb_note_pass(self._h, pass_spp)

    @property
    def spp_done(self) -> int:
        return int(self._lib.ssfb_spp_done(self._h))

    def mean(self):
        n = self.width * self.height
        value = np.empty((n, 3), np.float64)
        alpha = np.empty((n,), np.float64)
        self._lib.ssfb_mean(self._h, _dptr(value), _dptr(alpha))
        return (
            value.reshape(self.height, self.width, 3),
            alpha.reshape(self.height, self.width),
        )

    def tonemap_srgb_u8(self, matrix: np.ndarray, flip_rows: bool = True) -> np.ndarray:
        """matrix f32[3,3] applied to the mean value; returns u8[H, W, 4]
        (top-to-bottom when flip_rows)."""
        m = np.ascontiguousarray(matrix, np.float32).reshape(-1)
        out = np.empty((self.height, self.width, 4), np.uint8)
        self._lib.ssfb_tonemap_srgb_u8(
            self._h, _fptr(m), int(flip_rows),
            out.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
        )
        return out

    def checkpoint_async(self, path: str) -> bool:
        return bool(self._lib.ssfb_checkpoint_async(self._h, path.encode()))

    def checkpoint_wait(self) -> bool:
        return bool(self._lib.ssfb_checkpoint_wait(self._h))

    def checkpoint_load(self, path: str) -> bool:
        return bool(self._lib.ssfb_checkpoint_load(self._h, path.encode()))
