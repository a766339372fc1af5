"""Native prefetching DataLoader (ctypes binding of csrc/loader.cpp).

TPU-host counterpart of the torch DataLoader (C++ worker machinery) the
reference's examples rely on: per-epoch shuffling, multi-threaded batch
gather + normalization, and a bounded prefetch buffer so host batch prep
overlaps device execution. Compiled on first use with g++; falls back to
a pure-numpy iterator when no compiler is available.

Usage:
    loader = DataLoader(x, y, batch_size=128, shuffle=True,
                        num_workers=4, scale=1/0.3081, shift=0.1307)
    for epoch in range(E):
        for xb, yb in loader.epoch(epoch_seed=epoch):
            step(jnp.asarray(xb), jnp.asarray(yb))
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import threading

import numpy as np

_LIB = None
_LIB_LOCK = threading.Lock()
_SRC = os.path.join(os.path.dirname(os.path.abspath(__file__)), "csrc",
                    "loader.cpp")
_SO = os.path.join(os.path.dirname(os.path.abspath(__file__)), "csrc",
                   "_loader.so")


def _build_lib():
    cmd = ["g++", "-O3", "-shared", "-fPIC", "-std=c++17", "-pthread",
           _SRC, "-o", _SO]
    subprocess.run(cmd, check=True, capture_output=True)


def _load_lib():
    global _LIB
    with _LIB_LOCK:
        if _LIB is not None:
            return _LIB
        if not os.path.exists(_SO) or (os.path.getmtime(_SO)
                                       < os.path.getmtime(_SRC)):
            _build_lib()
        lib = ctypes.CDLL(_SO)
        lib.bt_loader_create.restype = ctypes.c_void_p
        lib.bt_loader_create.argtypes = [
            ctypes.c_void_p, ctypes.c_void_p, ctypes.c_int64,
            ctypes.c_int64, ctypes.c_int64, ctypes.c_int, ctypes.c_int,
            ctypes.c_float, ctypes.c_float, ctypes.c_uint64,
            ctypes.c_int64,
        ]
        lib.bt_loader_num_batches.restype = ctypes.c_int64
        lib.bt_loader_num_batches.argtypes = [ctypes.c_void_p]
        lib.bt_loader_start_epoch.argtypes = [ctypes.c_void_p,
                                              ctypes.c_int,
                                              ctypes.c_int64]
        lib.bt_loader_next.restype = ctypes.c_int64
        lib.bt_loader_next.argtypes = [ctypes.c_void_p, ctypes.c_void_p,
                                       ctypes.c_void_p]
        lib.bt_loader_destroy.argtypes = [ctypes.c_void_p]
        _LIB = lib
        return lib


def native_available() -> bool:
    try:
        _load_lib()
        return True
    except Exception:
        return False


class DataLoader:
    """Threaded, shuffling, prefetching batch iterator over host arrays.

    ``x``: float32 array (N, ...); ``y``: int labels (N,) or None.
    ``scale``/``shift`` apply ``(x - shift) * scale`` in the worker
    threads (fused into the gather pass).
    """

    def __init__(self, x, y=None, *, batch_size: int, shuffle: bool = True,
                 drop_last: bool = True, num_workers: int = 4,
                 scale: float = 1.0, shift: float = 0.0, seed: int = 0,
                 queue_depth: int = 4):
        self.x = np.ascontiguousarray(np.asarray(x, np.float32))
        self.y = (np.ascontiguousarray(np.asarray(y, np.int32))
                  if y is not None else None)
        self.batch_size = int(batch_size)
        self.shuffle = shuffle
        self.drop_last = drop_last
        self.num_workers = int(num_workers)
        self.scale = float(scale)
        self.shift = float(shift)
        self.seed = int(seed)
        self.item_shape = self.x.shape[1:]
        self.item_size = int(np.prod(self.item_shape)) if self.item_shape \
            else 1
        self._handle = None
        self._lib = None
        try:
            self._lib = _load_lib()
            self._handle = ctypes.c_void_p(self._lib.bt_loader_create(
                self.x.ctypes.data_as(ctypes.c_void_p),
                (self.y.ctypes.data_as(ctypes.c_void_p)
                 if self.y is not None else None),
                self.x.shape[0], self.item_size, self.batch_size,
                1 if shuffle else 0, 1 if drop_last else 0,
                self.scale, self.shift, self.seed, queue_depth))
        except Exception:
            self._lib = None  # numpy fallback

    def __len__(self):
        n = self.x.shape[0]
        return n // self.batch_size if self.drop_last else \
            -(-n // self.batch_size)

    def epoch(self, epoch_seed: int = 0):
        """Iterate one epoch of (x_batch, y_batch) numpy arrays."""
        if self._lib is None:
            yield from self._numpy_epoch(epoch_seed)
            return
        self._lib.bt_loader_start_epoch(self._handle, self.num_workers,
                                        int(epoch_seed))
        out_x = np.empty((self.batch_size,) + self.item_shape, np.float32)
        out_y = np.empty((self.batch_size,), np.int32)
        while True:
            got = self._lib.bt_loader_next(
                self._handle, out_x.ctypes.data_as(ctypes.c_void_p),
                out_y.ctypes.data_as(ctypes.c_void_p))
            if got < 0:
                return
            yield out_x[:got].copy(), out_y[:got].copy()

    def __iter__(self):
        return self.epoch(0)

    def _numpy_epoch(self, epoch_seed):
        n = self.x.shape[0]
        idx = np.arange(n)
        if self.shuffle:
            np.random.RandomState(self.seed + epoch_seed).shuffle(idx)
        end = (n // self.batch_size) * self.batch_size if self.drop_last \
            else n
        for i in range(0, end, self.batch_size):
            sel = idx[i:i + self.batch_size]
            xb = self.x[sel]
            if self.scale != 1.0 or self.shift != 0.0:
                xb = (xb - self.shift) * self.scale
            yb = self.y[sel] if self.y is not None else \
                np.zeros(len(sel), np.int32)
            yield xb, yb

    def __del__(self):
        if self._lib is not None and self._handle:
            try:
                self._lib.bt_loader_destroy(self._handle)
            except Exception:
                pass
            self._handle = None
