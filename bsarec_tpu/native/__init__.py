"""ctypes bindings for the native host-side data runtime (native/seqrec.cpp).

The shared library is built on demand with `g++ -O3 -shared -fPIC` the
first time it's needed and cached next to this package. Every caller has
a pure-Python/numpy fallback: if no compiler is available the framework
works identically, just with slower host-side data preparation (the
device compute path is unaffected either way).

`lib()` returns the loaded CDLL or None.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import threading
from pathlib import Path

import numpy as np

_SRC = Path(__file__).resolve().parents[2] / "native" / "seqrec.cpp"
_SO = Path(__file__).resolve().parent / "_seqrec.so"
_lock = threading.Lock()
_lib = None
_tried = False


def _configure(lib: ctypes.CDLL) -> ctypes.CDLL:
    i32p = ctypes.POINTER(ctypes.c_int32)
    i64p = ctypes.POINTER(ctypes.c_int64)
    u32p = ctypes.POINTER(ctypes.c_uint32)
    u8p = ctypes.POINTER(ctypes.c_uint8)
    lib.corpus_count.argtypes = [ctypes.c_char_p, i64p, i64p]
    lib.corpus_count.restype = ctypes.c_int
    lib.corpus_fill.argtypes = [ctypes.c_char_p, i32p, i32p, i32p]
    lib.corpus_fill.restype = ctypes.c_int
    lib.prefix_rows.argtypes = [i32p, ctypes.c_int64, ctypes.c_int32]
    lib.prefix_rows.restype = ctypes.c_int64
    lib.prefix_expand.argtypes = [i32p, i32p, ctypes.c_int64, ctypes.c_int32, i32p, i32p, i32p]
    lib.prefix_expand.restype = None
    lib.eval_split.argtypes = [
        i32p, i32p, ctypes.c_int64, ctypes.c_int32, ctypes.c_int32,
        ctypes.c_int32, i32p, i32p, i32p,
    ]
    lib.eval_split.restype = None
    lib.seen_bitmask.argtypes = [
        i32p, ctypes.c_int64, ctypes.c_int64, ctypes.c_int64,
        ctypes.c_int32, u32p, ctypes.c_int64, ctypes.c_int64, ctypes.c_int32,
    ]
    lib.seen_bitmask.restype = None
    lib.same_target_pick.argtypes = [
        i32p, i32p, i32p, u8p, i64p, ctypes.c_int64, ctypes.c_uint64, i32p,
    ]
    lib.same_target_pick.restype = None
    lib.intwtime_count.argtypes = [ctypes.c_char_p, i64p, i64p, i64p]
    lib.intwtime_count.restype = ctypes.c_int
    lib.intwtime_fill.argtypes = [ctypes.c_char_p, ctypes.c_int64,
                                  i32p, i32p, i32p, i32p, i32p]
    lib.intwtime_fill.restype = ctypes.c_int
    return lib


def lib() -> ctypes.CDLL | None:
    """Load (building if needed) the native library, or None."""
    global _lib, _tried
    if _lib is not None or _tried:
        return _lib
    with _lock:
        if _lib is not None or _tried:
            return _lib
        _tried = True
        if os.environ.get("BSAREC_NO_NATIVE"):
            return None
        try:
            if not _SO.exists() or _SO.stat().st_mtime < _SRC.stat().st_mtime:
                subprocess.run(
                    ["g++", "-O3", "-shared", "-fPIC", "-o", str(_SO), str(_SRC)],
                    check=True, capture_output=True, timeout=120,
                )
            _lib = _configure(ctypes.CDLL(str(_SO)))
        except Exception:
            _lib = None
        return _lib


def _ptr(a: np.ndarray, ctype):
    return a.ctypes.data_as(ctypes.POINTER(ctype))


def parse_corpus(path: str):
    """-> (offsets [U+1] i32, items [total] i32, max_item) or None."""
    L = lib()
    if L is None:
        return None
    n_users = ctypes.c_int64()
    n_items = ctypes.c_int64()
    if L.corpus_count(str(path).encode(), ctypes.byref(n_users), ctypes.byref(n_items)):
        return None
    offsets = np.zeros(n_users.value + 1, np.int32)
    items = np.zeros(max(n_items.value, 1), np.int32)
    max_item = ctypes.c_int32()
    if L.corpus_fill(
        str(path).encode(), _ptr(offsets, ctypes.c_int32),
        _ptr(items, ctypes.c_int32), ctypes.byref(max_item),
    ):
        return None
    return offsets, items[: n_items.value], int(max_item.value)


def parse_intwtime(path: str):
    """PREPRec `<ds>_intwtime.csv` -> five [n_rows] i32 columns in file
    order ((users1, items1, t1, t2, te), usernum, itemnum) or None.
    Semantics identical to the Python loader (`preprec/data.py`): ids
    shifted to 1-based, 5th field truncated toward zero."""
    L = lib()
    if L is None:
        return None
    n_rows = ctypes.c_int64()
    max_u = ctypes.c_int64()
    max_i = ctypes.c_int64()
    if L.intwtime_count(str(path).encode(), ctypes.byref(n_rows),
                        ctypes.byref(max_u), ctypes.byref(max_i)):
        return None
    if n_rows.value == 0:
        return None  # Python loader raises its usual error on empty files
    cols = [np.zeros(n_rows.value, np.int32) for _ in range(5)]
    if L.intwtime_fill(str(path).encode(), n_rows.value,
                       *(_ptr(c, ctypes.c_int32) for c in cols)):
        return None  # includes rc=3: file changed between the two passes
    return tuple(cols), int(max_u.value), int(max_i.value)


def prefix_expand(offsets: np.ndarray, items: np.ndarray, max_len: int):
    L = lib()
    if L is None:
        return None
    n_users = offsets.shape[0] - 1
    total = L.prefix_rows(_ptr(offsets, ctypes.c_int32), n_users, max_len)
    inputs = np.zeros((total, max_len), np.int32)
    answers = np.zeros(total, np.int32)
    users = np.zeros(total, np.int32)
    L.prefix_expand(
        _ptr(offsets, ctypes.c_int32), _ptr(items, ctypes.c_int32), n_users,
        max_len, _ptr(inputs, ctypes.c_int32), _ptr(answers, ctypes.c_int32),
        _ptr(users, ctypes.c_int32),
    )
    return inputs, answers, users


def eval_split(offsets: np.ndarray, items: np.ndarray, max_len: int, drop: int, seen_width: int):
    L = lib()
    if L is None:
        return None
    n_users = offsets.shape[0] - 1
    inputs = np.zeros((n_users, max_len), np.int32)
    answers = np.zeros(n_users, np.int32)
    seen = np.zeros((n_users, seen_width), np.int32)
    L.eval_split(
        _ptr(offsets, ctypes.c_int32), _ptr(items, ctypes.c_int32), n_users,
        max_len, drop, seen_width, _ptr(inputs, ctypes.c_int32),
        _ptr(answers, ctypes.c_int32), _ptr(seen, ctypes.c_int32),
    )
    return inputs, answers, seen


def seen_bitmask(seen: np.ndarray, vocab: int, tile_cols: int,
                 id_offset: int = 0, mask_item0: bool = True):
    L = lib()
    if L is None:
        return None
    n_rows, n_cols = seen.shape
    vp = -(-vocab // tile_cols) * tile_cols
    out = np.zeros((n_rows, vp // 32), np.uint32)
    seen = np.ascontiguousarray(seen, np.int32)
    L.seen_bitmask(
        _ptr(seen, ctypes.c_int32), n_rows, n_cols, vocab, tile_cols,
        _ptr(out, ctypes.c_uint32), out.shape[1], id_offset, int(mask_item0),
    )
    return out.view(np.int32)


def same_target_pick(order, group_start, group_size, diverse, row_hash, seed: int):
    L = lib()
    if L is None:
        return None
    n = group_start.shape[0]
    pick = np.zeros(n, np.int32)
    L.same_target_pick(
        _ptr(np.ascontiguousarray(order, np.int32), ctypes.c_int32),
        _ptr(np.ascontiguousarray(group_start, np.int32), ctypes.c_int32),
        _ptr(np.ascontiguousarray(group_size, np.int32), ctypes.c_int32),
        _ptr(np.ascontiguousarray(diverse, np.uint8), ctypes.c_uint8),
        _ptr(np.ascontiguousarray(row_hash, np.int64), ctypes.c_int64),
        n, seed & (2**64 - 1), _ptr(pick, ctypes.c_int32),
    )
    return pick
