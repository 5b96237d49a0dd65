"""ctypes bindings to the native C++ streaming IO runtime (native/csdr_io.cpp).

Auto-builds the shared library on first use (g++, ~1 s); callers fall back to
pure-numpy IO when unavailable (io/sources.py keeps working either way).
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import threading
from typing import Iterator

import numpy as np

__all__ = ["load_lib", "native_cf32_source", "NativeRawFileSink", "available"]

_ROOT = os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
_NATIVE_DIR = os.path.join(_ROOT, "native")
_SO = os.path.join(_NATIVE_DIR, "libcsdr_io.so")

_lib = None
_lock = threading.Lock()
_build_failed = False


def _build() -> bool:
    try:
        subprocess.run(["make", "-C", _NATIVE_DIR, "-s"], check=True,
                       capture_output=True, timeout=120)
        return os.path.exists(_SO)
    except Exception:
        return False


def load_lib():
    global _lib, _build_failed
    with _lock:
        if _lib is not None:
            return _lib
        if _build_failed:
            raise RuntimeError("native csdr_io unavailable")
        # deployed bundles (apps/package_app.py) ship the .so outside the
        # source tree and point at it via CSDR_NATIVE_LIB — inside a zipapp
        # the repo-relative path below does not exist
        so = os.environ.get("CSDR_NATIVE_LIB") or _SO
        if not os.path.exists(so):
            if so is not _SO or not _build():
                _build_failed = True
                raise RuntimeError(f"native csdr_io unavailable ({so})")
        lib = ctypes.CDLL(so)
        lib.reader_open.restype = ctypes.c_void_p
        lib.reader_open.argtypes = [ctypes.c_char_p, ctypes.c_size_t, ctypes.c_int]
        lib.reader_next.restype = ctypes.c_int
        lib.reader_next.argtypes = [ctypes.c_void_p,
                                    ctypes.POINTER(ctypes.POINTER(ctypes.c_uint8)),
                                    ctypes.POINTER(ctypes.c_size_t)]
        lib.reader_close.argtypes = [ctypes.c_void_p]
        lib.writer_open.restype = ctypes.c_void_p
        lib.writer_open.argtypes = [ctypes.c_char_p, ctypes.c_int]
        lib.writer_write.restype = ctypes.c_int
        lib.writer_write.argtypes = [ctypes.c_void_p, ctypes.c_char_p, ctypes.c_size_t]
        lib.writer_close.restype = ctypes.c_int
        lib.writer_close.argtypes = [ctypes.c_void_p]
        _lib = lib
        return _lib


def available() -> bool:
    try:
        load_lib()
        return True
    except Exception:
        return False


def native_cf32_source(path: str, chunk_samples: int = 1 << 18,
                       n_buffers: int = 4) -> Iterator[np.ndarray]:
    """Double-buffered CF32 reader: the producer thread prefetches the next
    chunk from disk while the consumer feeds the device (the reference gets
    this from SoapySDR's 30 internal stream buffers; file playback there is
    single-threaded)."""
    lib = load_lib()
    h = lib.reader_open(path.encode(), chunk_samples * 8, n_buffers)
    if not h:
        raise FileNotFoundError(path)
    try:
        ptr = ctypes.POINTER(ctypes.c_uint8)()
        ln = ctypes.c_size_t()
        while True:
            rc = lib.reader_next(h, ctypes.byref(ptr), ctypes.byref(ln))
            if rc == 0:
                return
            if rc < 0:
                raise IOError(f"native read error on {path}")
            n = ln.value - (ln.value % 8)
            buf = ctypes.string_at(ptr, n)  # copy out of the lent buffer
            yield np.frombuffer(buf, dtype=np.complex64)
    finally:
        lib.reader_close(h)


class NativeRawFileSink:
    """Asynchronous raw writer: disk latency overlaps device compute."""

    def __init__(self, path: str, n_buffers: int = 8):
        self.lib = load_lib()
        self.h = self.lib.writer_open(path.encode(), n_buffers)
        if not self.h:
            raise IOError(f"cannot open {path}")

    def __call__(self, data):
        buf = np.ascontiguousarray(data).tobytes()
        if self.lib.writer_write(self.h, buf, len(buf)) != 0:
            raise IOError("native write error")

    def close(self):
        if self.h:
            rc = self.lib.writer_close(self.h)
            self.h = None
            if rc != 0:
                raise IOError("native writer flush failed")

    def __enter__(self):
        return self

    def __exit__(self, *exc):
        self.close()
