"""Native host runtime bindings (C++ via ctypes).

Covers the reference's host-side native layer with TPU-era roles:
CompVThreadDispatcher -> prefetching FrameLoader feeding the accelerator;
CompVMem aligned buffers -> AlignedBuffer; CompVMd5 -> md5_hex test oracle.

The shared library builds on first use (`make` + g++, both in the image);
if the toolchain is unavailable, `available()` returns False and callers
fall back to pure-Python paths (io/video.py reads frames inline).
"""
from __future__ import annotations

import ctypes
import os
import subprocess
import threading
from typing import List, Optional, Sequence

import numpy as np

_DIR = os.path.dirname(os.path.abspath(__file__))
_LIB_PATH = os.path.join(_DIR, "lib", "libcompv_runtime.so")
_lock = threading.Lock()
_lib: Optional[ctypes.CDLL] = None
_build_failed = False


def _load() -> Optional[ctypes.CDLL]:
    global _lib, _build_failed
    with _lock:
        if _lib is not None:
            return _lib
        if _build_failed:
            return None
        if not os.path.exists(_LIB_PATH):
            try:
                subprocess.run(["make", "-C", _DIR], check=True,
                               capture_output=True, timeout=120)
            except Exception:
                _build_failed = True
                return None
        try:
            lib = ctypes.CDLL(_LIB_PATH)
        except OSError:
            _build_failed = True
            return None
        lib.cv_loader_create.restype = ctypes.c_void_p
        lib.cv_loader_create.argtypes = [
            ctypes.POINTER(ctypes.c_char_p), ctypes.c_int, ctypes.c_long,
            ctypes.c_int, ctypes.c_int]
        lib.cv_loader_next.restype = ctypes.c_long
        lib.cv_loader_next.argtypes = [ctypes.c_void_p,
                                       ctypes.POINTER(ctypes.c_ubyte)]
        lib.cv_loader_destroy.argtypes = [ctypes.c_void_p]
        lib.cv_md5_hex.argtypes = [ctypes.POINTER(ctypes.c_ubyte),
                                   ctypes.c_long, ctypes.c_char_p]
        lib.cv_aligned_alloc.restype = ctypes.c_void_p
        lib.cv_aligned_alloc.argtypes = [ctypes.c_long, ctypes.c_long]
        lib.cv_aligned_free.argtypes = [ctypes.c_void_p]
        _lib = lib
        return _lib


def available() -> bool:
    """True if the native runtime built and loaded."""
    return _load() is not None


def md5_hex(data) -> str:
    """MD5 hex digest (reference compv_tests_md5 oracle). Falls back to
    hashlib when the native library is unavailable."""
    buf = np.ascontiguousarray(data).view(np.uint8).reshape(-1)
    lib = _load()
    if lib is None:
        import hashlib
        return hashlib.md5(buf.tobytes()).hexdigest()
    out = ctypes.create_string_buffer(33)
    lib.cv_md5_hex(buf.ctypes.data_as(ctypes.POINTER(ctypes.c_ubyte)),
                   buf.size, out)
    return out.value.decode()


class AlignedBuffer:
    """SIMD/DMA-aligned host buffer (reference CompVMem::mallocAligned)."""

    def __init__(self, nbytes: int, alignment: int = 128):
        lib = _load()
        self._lib = lib
        self.nbytes = nbytes
        if lib is None:
            self._arr = np.zeros(nbytes, np.uint8)
            self._ptr = None
        else:
            self._ptr = lib.cv_aligned_alloc(nbytes, alignment)
            if not self._ptr:
                raise MemoryError(nbytes)
            self._arr = np.ctypeslib.as_array(
                ctypes.cast(self._ptr, ctypes.POINTER(ctypes.c_ubyte)),
                shape=(nbytes,))

    @property
    def array(self) -> np.ndarray:
        return self._arr

    def __del__(self):
        if getattr(self, "_ptr", None) and self._lib is not None:
            self._lib.cv_aligned_free(self._ptr)
            self._ptr = None


class FrameLoader:
    """Multi-threaded raw-frame prefetcher over a file list.

    Frames are fixed-size raw buffers (e.g. W*H grayscale or W*H*3/2 YUV420);
    `next()` returns them in file-list order as numpy arrays while worker
    threads read ahead — the host-side input pipeline for per-frame TPU
    processing (reference analogue: FFmpeg reader + thread pool,
    core/compv_core_video_reader_ffmpeg.cxx:68-221).
    """

    def __init__(self, paths: Sequence[str], frame_bytes: int,
                 workers: int = 4, queue_depth: int = 8):
        self.paths: List[str] = [str(p) for p in paths]
        self.frame_bytes = frame_bytes
        lib = _load()
        self._lib = lib
        self._pos = 0
        if lib is None:
            self._h = None
            return
        arr = (ctypes.c_char_p * len(self.paths))(
            *[p.encode() for p in self.paths])
        self._h = lib.cv_loader_create(arr, len(self.paths), frame_bytes,
                                       workers, queue_depth)

    def next(self) -> Optional[np.ndarray]:
        """Next frame bytes, or None at end of list."""
        if self._h is None:  # pure-python fallback
            if self._pos >= len(self.paths):
                return None
            path = self.paths[self._pos]
            self._pos += 1
            out = np.zeros(self.frame_bytes, np.uint8)
            try:
                with open(path, "rb") as f:
                    raw = f.read(self.frame_bytes)
                out[:len(raw)] = np.frombuffer(raw, np.uint8)
            except OSError:
                pass
            return out
        buf = np.empty(self.frame_bytes, np.uint8)
        got = self._lib.cv_loader_next(
            self._h, buf.ctypes.data_as(ctypes.POINTER(ctypes.c_ubyte)))
        if got < 0:
            return None
        return buf

    def __iter__(self):
        while True:
            f = self.next()
            if f is None:
                return
            yield f

    def close(self):
        if getattr(self, "_h", None) is not None and self._lib is not None:
            self._lib.cv_loader_destroy(self._h)
            self._h = None

    def __del__(self):
        self.close()
