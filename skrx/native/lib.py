"""ctypes loader/builder for the native kernel library.

Compiles csrc/skrx_native.cc with g++ on first use (cached beside the
source); all entry points degrade gracefully (raise RuntimeError) when no
compiler is available so the pure-JAX path keeps working.
"""
import ctypes
import os
import subprocess
import threading
from typing import List, Optional, Sequence

import numpy as np

_HERE = os.path.dirname(os.path.abspath(__file__))
_SRC = os.path.join(_HERE, "csrc", "skrx_native.cc")
_SO = os.path.join(_HERE, "csrc", "libskrx_native.so")

_lock = threading.Lock()
_lib: Optional[ctypes.CDLL] = None
_failed = False


def _build() -> None:
    cmd = ["g++", "-O3", "-std=c++17", "-shared", "-fPIC", "-pthread",
           _SRC, "-o", _SO]
    subprocess.run(cmd, check=True, capture_output=True)


def _load() -> Optional[ctypes.CDLL]:
    global _lib, _failed
    if _lib is not None or _failed:
        return _lib
    with _lock:
        if _lib is not None or _failed:
            return _lib
        try:
            if (not os.path.exists(_SO)
                    or os.path.getmtime(_SO) < os.path.getmtime(_SRC)):
                _build()
            lib = ctypes.CDLL(_SO)
            lib.skrx_abi_check.restype = ctypes.c_int
            if lib.skrx_abi_check() != 1:
                raise RuntimeError("native ABI check failed")
            _lib = lib
        except Exception:
            _failed = True
    return _lib


def available() -> bool:
    return _load() is not None


def _flat_with_offsets(lists: Sequence[Sequence[int]]):
    offsets = np.zeros(len(lists) + 1, dtype=np.int64)
    for i, l in enumerate(lists):
        offsets[i + 1] = offsets[i] + len(l)
    flat = (np.concatenate([np.asarray(l, dtype=np.int32) for l in lists])
            if offsets[-1] else np.zeros(0, dtype=np.int32))
    return np.ascontiguousarray(flat), offsets


def _ptr(arr, ctype):
    return arr.ctypes.data_as(ctypes.POINTER(ctype))


def eval_score_matrix_native(scores: np.ndarray,
                             test_items: Sequence[Sequence[int]],
                             metrics: Sequence[int], top_k: int,
                             thread_num: int = 8,
                             train_items: Optional[Sequence[Sequence[int]]] = None
                             ) -> np.ndarray:
    """(B, n_metrics*top_k) cumulative metrics — drop-in CPU equivalent of
    the reference's ``eval_score_matrix`` (pyx_eval_matrix.pyx:22)."""
    lib = _load()
    if lib is None:
        raise RuntimeError("native library unavailable (no g++?)")
    scores = np.ascontiguousarray(scores, dtype=np.float32)
    b, n = scores.shape
    te_flat, te_off = _flat_with_offsets(test_items)
    metrics_arr = np.asarray(metrics, dtype=np.int32)
    out = np.zeros((b, len(metrics_arr) * top_k), dtype=np.float32)
    if train_items is not None:
        tr_flat, tr_off = _flat_with_offsets(train_items)
        tr_flat_p = _ptr(tr_flat, ctypes.c_int)
        tr_off_p = _ptr(tr_off, ctypes.c_int64)
    else:
        tr_flat_p = None
        tr_off_p = None
    lib.skrx_eval_score_matrix(
        _ptr(scores, ctypes.c_float), b, n,
        _ptr(te_flat, ctypes.c_int), _ptr(te_off, ctypes.c_int64),
        tr_flat_p, tr_off_p,
        _ptr(metrics_arr, ctypes.c_int), len(metrics_arr), top_k,
        thread_num, _ptr(out, ctypes.c_float))
    return out


def batch_sample_negatives_native(high: int, sizes: Sequence[int],
                                  exclusions: Sequence[Sequence[int]],
                                  seed: int = 2020,
                                  thread_num: int = 8) -> List[np.ndarray]:
    """Thread-pooled uniform rejection sampling with per-row exclusion —
    host equivalent of the reference's ``c_batch_randint_choice``
    (randint.h:90-128)."""
    lib = _load()
    if lib is None:
        raise RuntimeError("native library unavailable (no g++?)")
    sizes_arr = np.asarray(sizes, dtype=np.int64)
    ex_flat, ex_off = _flat_with_offsets(exclusions)
    out = np.zeros(int(sizes_arr.sum()), dtype=np.int32)
    lib.skrx_batch_sample_negatives(
        high, _ptr(sizes_arr, ctypes.c_int64), len(sizes_arr),
        _ptr(ex_flat, ctypes.c_int), _ptr(ex_off, ctypes.c_int64),
        ctypes.c_uint64(seed), thread_num, _ptr(out, ctypes.c_int))
    res, pos = [], 0
    for s in sizes_arr:
        res.append(out[pos: pos + s])
        pos += s
    return res


def _sortish(arr: np.ndarray, descending: bool, thread_num: int, arg: bool):
    lib = _load()
    if lib is None:
        raise RuntimeError("native library unavailable (no g++?)")
    arr = np.asarray(arr)
    squeeze = arr.ndim == 1
    if squeeze:
        arr = arr[None, :]
    assert arr.ndim == 2, "sort_native/arg_sort_native take 1D or 2D arrays"
    if np.issubdtype(arr.dtype, np.integer):
        arr = np.ascontiguousarray(arr, dtype=np.int32)
        fn = lib.skrx_arg_sort_i32 if arg else lib.skrx_sort_i32
        ctype = ctypes.c_int
    else:
        arr = np.ascontiguousarray(arr, dtype=np.float32)
        fn = lib.skrx_arg_sort_f32 if arg else lib.skrx_sort_f32
        ctype = ctypes.c_float
    rows, n = arr.shape
    out = np.zeros((rows, n), dtype=np.int32 if arg else arr.dtype)
    fn(_ptr(arr, ctype), rows, n, int(bool(descending)), thread_num,
       _ptr(out, ctypes.c_int if arg else ctype))
    return out[0] if squeeze else out


def sort_native(arr: np.ndarray, descending: bool = False,
                thread_num: int = 8) -> np.ndarray:
    """Row-wise (or 1D) full sort — host parity with the reference's
    templated sort kernels (sort.h:17-170, pyx_sort.pyx:25-187)."""
    return _sortish(arr, descending, thread_num, arg=False)


def arg_sort_native(arr: np.ndarray, descending: bool = False,
                    thread_num: int = 8) -> np.ndarray:
    """Row-wise (or 1D) stable argsort (ties keep lower index first)."""
    return _sortish(arr, descending, thread_num, arg=True)


def top_k_native(scores: np.ndarray, top_k: int, thread_num: int = 8):
    """Row-wise (values, indices) top-k (sort.h:17-170 equivalent)."""
    lib = _load()
    if lib is None:
        raise RuntimeError("native library unavailable (no g++?)")
    scores = np.ascontiguousarray(scores, dtype=np.float32)
    b, n = scores.shape
    vals = np.zeros((b, top_k), dtype=np.float32)
    idx = np.zeros((b, top_k), dtype=np.int32)
    lib.skrx_top_k(_ptr(scores, ctypes.c_float), b, n, top_k, thread_num,
                   _ptr(vals, ctypes.c_float), _ptr(idx, ctypes.c_int))
    return vals, idx
