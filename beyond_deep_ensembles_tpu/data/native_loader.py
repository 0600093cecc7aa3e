"""Native data pipeline: GIL-free batch gather + background prefetch.

Host-side replacement for the reference's torch DataLoader worker
processes (experiments/base/cifar.py:38): batches are assembled from a
resident numpy arena by the C++ thread pool in ``native/batcher.cc``
(row gather at memory bandwidth, GIL released via ctypes) while a Python
prefetch thread keeps ``prefetch`` batches ahead of the device — so the
TPU never waits on host indexing.

Falls back to numpy fancy-indexing when the shared library cannot be
built (pure-Python environments).
"""
from __future__ import annotations

import ctypes
import os
import queue
import subprocess
import threading
from typing import Iterator, Sequence, Tuple

import numpy as np

_NATIVE_DIR = os.path.join(os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__)))), "native")
_LIB = None
_LIB_TRIED = False


def _load_library():
    global _LIB, _LIB_TRIED
    if _LIB_TRIED:
        return _LIB
    _LIB_TRIED = True
    so_path = os.path.join(_NATIVE_DIR, "libbatcher.so")
    try:
        if not os.path.exists(so_path):
            subprocess.run(
                ["make", "-C", _NATIVE_DIR, "libbatcher.so"],
                check=True,
                capture_output=True,
                timeout=120,
            )
        lib = ctypes.CDLL(so_path)
        lib.gather_rows.argtypes = [
            ctypes.c_void_p,
            ctypes.POINTER(ctypes.c_int64),
            ctypes.c_int64,
            ctypes.c_int64,
            ctypes.c_void_p,
        ]
        lib.shuffle_indices.argtypes = [
            ctypes.POINTER(ctypes.c_int64),
            ctypes.c_int64,
            ctypes.c_uint64,
        ]
        _LIB = lib
    except Exception:
        _LIB = None
    return _LIB


def gather_rows(src: np.ndarray, indices: np.ndarray) -> np.ndarray:
    """dst[i] = src[indices[i]] via the native thread pool (numpy
    fallback when the library is unavailable)."""
    lib = _load_library()
    src = np.ascontiguousarray(src)
    indices = np.ascontiguousarray(indices, np.int64)
    if lib is None:
        return src[indices]
    out = np.empty((len(indices),) + src.shape[1:], src.dtype)
    row_bytes = src.dtype.itemsize * int(np.prod(src.shape[1:], dtype=np.int64))
    lib.gather_rows(
        src.ctypes.data_as(ctypes.c_void_p),
        indices.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)),
        ctypes.c_int64(len(indices)),
        ctypes.c_int64(row_bytes),
        out.ctypes.data_as(ctypes.c_void_p),
    )
    return out


def shuffled_indices(n: int, seed: int) -> np.ndarray:
    lib = _load_library()
    idx = np.arange(n, dtype=np.int64)
    if lib is None:
        return np.random.RandomState(seed).permutation(n).astype(np.int64)
    lib.shuffle_indices(
        idx.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)),
        ctypes.c_int64(n),
        ctypes.c_uint64(seed & 0xFFFFFFFFFFFFFFFF),
    )
    return idx


class PrefetchLoader:
    """Iterate shuffled minibatches with background assembly.

    arrays: tuple of equally-long numpy arrays (x, y, [meta...]).
    Drops the final partial batch (static shapes for jit).
    """

    def __init__(
        self,
        arrays: Sequence[np.ndarray],
        batch_size: int,
        seed: int = 0,
        shuffle: bool = True,
        prefetch: int = 4,
    ):
        self.arrays = [np.ascontiguousarray(a) for a in arrays]
        self.batch_size = batch_size
        self.seed = seed
        self.shuffle = shuffle
        self.prefetch = prefetch
        self.n = len(self.arrays[0])
        self.steps = self.n // batch_size

    def __len__(self) -> int:
        return self.steps

    def epoch(self, epoch_idx: int = 0) -> Iterator[Tuple[np.ndarray, ...]]:
        if self.shuffle:
            order = shuffled_indices(self.n, self.seed * 1_000_003 + epoch_idx)
        else:
            order = np.arange(self.n, dtype=np.int64)

        q: queue.Queue = queue.Queue(maxsize=self.prefetch)
        stop = threading.Event()

        def producer():
            for step in range(self.steps):
                if stop.is_set():
                    return
                sel = order[step * self.batch_size : (step + 1) * self.batch_size]
                q.put(tuple(gather_rows(a, sel) for a in self.arrays))
            q.put(None)

        t = threading.Thread(target=producer, daemon=True)
        t.start()
        try:
            while True:
                item = q.get()
                if item is None:
                    return
                yield item
        finally:
            stop.set()
