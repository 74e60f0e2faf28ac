"""Native (C++) host runtime: threaded prefetching batch loader.

Build-on-first-use: compiles loader.cpp with g++ into a cached shared
library and binds it with ctypes (no pybind11 in this image).  Falls back
cleanly when no compiler is available — `native_available()` gates use.
"""
from __future__ import annotations

import ctypes
import os
import subprocess
import threading

import numpy as np

_HERE = os.path.dirname(os.path.abspath(__file__))
_BUILD_DIR = os.path.join(_HERE, "_build")
_LIB_PATH = os.path.join(_BUILD_DIR, "libiddiff_loader.so")
_lib = None
_lib_lock = threading.Lock()


def _build() -> str:
    os.makedirs(_BUILD_DIR, exist_ok=True)
    src = os.path.join(_HERE, "loader.cpp")
    cmd = [
        "g++", "-O3", "-std=c++17", "-shared", "-fPIC", "-pthread",
        src, "-o", _LIB_PATH,
    ]
    subprocess.run(cmd, check=True, capture_output=True)
    return _LIB_PATH


def _load():
    global _lib
    with _lib_lock:
        if _lib is not None:
            return _lib
        if not os.path.exists(_LIB_PATH) or os.path.getmtime(
            _LIB_PATH
        ) < os.path.getmtime(os.path.join(_HERE, "loader.cpp")):
            _build()
        lib = ctypes.CDLL(_LIB_PATH)
        lib.loader_create.restype = ctypes.c_void_p
        lib.loader_create.argtypes = [
            ctypes.POINTER(ctypes.c_float), ctypes.c_long, ctypes.c_long,
            ctypes.c_long, ctypes.c_int, ctypes.c_int,
        ]
        lib.loader_start_epoch.argtypes = [ctypes.c_void_p, ctypes.c_ulonglong]
        lib.loader_set_shard.argtypes = [
            ctypes.c_void_p, ctypes.c_long, ctypes.c_long,
        ]
        lib.loader_next.restype = ctypes.c_long
        lib.loader_next.argtypes = [
            ctypes.c_void_p, ctypes.POINTER(ctypes.POINTER(ctypes.c_float))
        ]
        lib.loader_release.argtypes = [ctypes.c_void_p]
        lib.loader_destroy.argtypes = [ctypes.c_void_p]
        _lib = lib
        return _lib


def native_available() -> bool:
    try:
        _load()
        return True
    except Exception:
        return False


class NativeEpochIterator:
    """Drop-in for data.datamodule.EpochIterator (single-array datasets):
    seeded per-epoch shuffle + gather runs on a C++ producer thread, so the
    next batch is assembled while the device executes the current step."""

    def __init__(self, array: np.ndarray, batch_size: int, shuffle: bool,
                 seed: int = 0, drop_last: bool = True, num_slots: int = 3,
                 shard_index: int = 0, num_shards: int = 1):
        self.array = np.ascontiguousarray(array, dtype=np.float32)
        self.item_shape = self.array.shape[1:]
        self.item_floats = int(np.prod(self.item_shape)) if self.item_shape else 1
        self.n = len(self.array)
        self.batch_size = int(batch_size)
        self.shuffle = shuffle
        self.drop_last = drop_last
        self._seed = seed
        self._epoch = 0
        lib = _load()
        flat = self.array.reshape(self.n, self.item_floats)
        self._handle = lib.loader_create(
            flat.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
            self.n, self.item_floats, self.batch_size,
            1 if drop_last else 0, num_slots,
        )
        self._lib = lib
        self.shard_index = int(shard_index)
        self.num_shards = max(int(num_shards), 1)
        if self.num_shards > 1:
            lib.loader_set_shard(self._handle, self.shard_index,
                                 self.num_shards)
            self.n = self.n // self.num_shards  # rows per host per epoch

    def __len__(self):
        if self.drop_last:
            return self.n // self.batch_size
        return (self.n + self.batch_size - 1) // self.batch_size

    def __iter__(self):
        lib = self._lib
        self._epoch += 1
        epoch_seed = (self._seed * 2654435761 + self._epoch) & (2**63 - 1)
        lib.loader_start_epoch(
            self._handle, epoch_seed if self.shuffle else 0
        )
        out = ctypes.POINTER(ctypes.c_float)()
        while True:
            rows = lib.loader_next(self._handle, ctypes.byref(out))
            if rows == 0:
                return
            buf = np.ctypeslib.as_array(out, shape=(rows, self.item_floats))
            # copy out of the ring slot before releasing it
            batch = np.array(buf, copy=True).reshape((rows,) + self.item_shape)
            lib.loader_release(self._handle)
            yield batch

    def __del__(self):
        try:
            if getattr(self, "_handle", None):
                self._lib.loader_destroy(self._handle)
                self._handle = None
        except Exception:
            pass
