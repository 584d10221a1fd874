"""ctypes bindings for the native prefetching record reader.

Compiles ``native/record_reader.cpp`` on first use (g++ is in the image) and
caches the shared object under ``native/build/``. Falls back to the pure
Python :class:`IndexedDataset` when the toolchain is unavailable, so the
framework never hard-depends on the native path.
"""

from __future__ import annotations

import ctypes
import os
import pickle
import subprocess
import threading

import numpy as np

_ROOT = os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
_SRC = os.path.join(_ROOT, "native", "record_reader.cpp")
_BUILD_DIR = os.path.join(_ROOT, "native", "build")
_SO = os.path.join(_BUILD_DIR, "librecord_reader.so")
_lock = threading.Lock()
_lib = None


def _load_library():
    global _lib
    with _lock:
        if _lib is not None:
            return _lib
        if not os.path.isfile(_SO) or os.path.getmtime(_SO) < os.path.getmtime(_SRC):
            os.makedirs(_BUILD_DIR, exist_ok=True)
            cmd = ["g++", "-O2", "-shared", "-fPIC", "-std=c++17", "-pthread",
                   _SRC, "-o", _SO]
            subprocess.run(cmd, check=True, capture_output=True)
        lib = ctypes.CDLL(_SO)
        lib.rr_create.restype = ctypes.c_void_p
        lib.rr_create.argtypes = [ctypes.POINTER(ctypes.c_char_p), ctypes.c_int32,
                                  ctypes.POINTER(ctypes.c_int64), ctypes.c_int64]
        lib.rr_start.restype = ctypes.c_int32
        lib.rr_start.argtypes = [ctypes.c_void_p, ctypes.POINTER(ctypes.c_int32),
                                 ctypes.c_int64, ctypes.c_int32, ctypes.c_int32]
        lib.rr_next.restype = ctypes.c_int64
        lib.rr_next.argtypes = [ctypes.c_void_p,
                                ctypes.POINTER(ctypes.POINTER(ctypes.c_char)),
                                ctypes.POINTER(ctypes.c_int64)]
        lib.rr_release.argtypes = [ctypes.c_void_p, ctypes.POINTER(ctypes.c_char)]
        lib.rr_destroy.argtypes = [ctypes.c_void_p]
        _lib = lib
        return lib


def native_available() -> bool:
    try:
        _load_library()
        return True
    except Exception:
        return False


class NativePrefetchReader:
    """Iterate records of an indexed store with native threaded prefetch.

    Usage::

        reader = NativePrefetchReader(path)
        for item in reader.iterate(order, n_threads=4):
            ...
    """

    def __init__(self, path: str):
        self.path = path
        with open(path + ".idx", "rb") as f:
            meta = pickle.load(f)
        self.offsets = np.asarray(meta["offsets"], np.int64)  # [N,3]
        self.compress = meta.get("compress", False)
        n_chunks = int(self.offsets[:, 0].max()) + 1 if len(self.offsets) else 0
        self.chunk_paths = [f"{path}.data-{i:05d}".encode() for i in range(n_chunks)]
        self._lib = _load_library()
        arr = (ctypes.c_char_p * len(self.chunk_paths))(*self.chunk_paths)
        flat = np.ascontiguousarray(self.offsets.reshape(-1))
        self._handle = self._lib.rr_create(
            arr, len(self.chunk_paths),
            flat.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)),
            len(self.offsets),
        )
        # keep buffers alive for the handle's lifetime
        self._keepalive = (arr, flat)

    def __len__(self):
        return len(self.offsets)

    def iterate(self, order=None, n_threads: int = 4, ring_capacity: int = 16):
        import gzip

        order = np.asarray(
            order if order is not None else np.arange(len(self)), np.int32
        )
        rc = self._lib.rr_start(
            self._handle, order.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
            len(order), n_threads, ring_capacity,
        )
        assert rc == 0, "reader already started"
        ptr = ctypes.POINTER(ctypes.c_char)()
        length = ctypes.c_int64()
        while True:
            seq = self._lib.rr_next(self._handle, ctypes.byref(ptr),
                                    ctypes.byref(length))
            if seq == -1:
                break
            if seq == -2:
                raise IOError(f"native reader IO error in {self.path}")
            raw = ctypes.string_at(ptr, length.value)
            self._lib.rr_release(self._handle, ptr)
            if self.compress:
                raw = gzip.decompress(raw)
            yield pickle.loads(raw)

    def close(self):
        if self._handle:
            self._lib.rr_destroy(self._handle)
            self._handle = None

    def __del__(self):
        try:
            self.close()
        except Exception:
            pass
