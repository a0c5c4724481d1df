"""ctypes bindings for the native host runtime (native/hinx_core.cpp).

Auto-builds `libhinx_core.so` with the in-tree Makefile on first use when a
compiler is available; every entry point has a numpy fallback so the pure-
Python path stays fully functional (pybind11 is unavailable in the target
image; a plain C ABI + ctypes keeps the binding dependency-free).
"""

from __future__ import annotations

import ctypes
import os
import subprocess

import numpy as np

_NATIVE_DIR = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "native")
_SO_PATH = os.path.join(_NATIVE_DIR, "libhinx_core.so")
_lib = None
_tried = False


def _load():
    global _lib, _tried
    if _lib is not None or _tried:
        return _lib
    _tried = True
    if not os.path.isfile(_SO_PATH):
        try:
            subprocess.run(
                ["make", "-C", _NATIVE_DIR, "-s"],
                check=True, capture_output=True, timeout=120,
            )
        except Exception:
            return None
    try:
        lib = ctypes.CDLL(_SO_PATH)
    except OSError:
        return None

    i64 = ctypes.POINTER(ctypes.c_int64)
    u8 = ctypes.POINTER(ctypes.c_uint8)
    u64 = ctypes.POINTER(ctypes.c_uint64)
    lib.sort_edges_by_dst.argtypes = [i64, i64, ctypes.c_int64, ctypes.c_int64, i64]
    try:  # absent in a stale .so built before block order landed
        lib.sort_edges_block.argtypes = [
            i64, i64, ctypes.c_int64, ctypes.c_int64, ctypes.c_int64, i64,
        ]
    except AttributeError:
        pass
    lib.build_csr.argtypes = [i64, i64, ctypes.c_int64, ctypes.c_int64, i64, i64]
    lib.leave_one_out.argtypes = [i64, i64, ctypes.c_int64, ctypes.c_int64, u8]
    lib.leave_one_out.restype = ctypes.c_int64
    lib.build_seen_table.argtypes = [
        i64, i64, ctypes.c_int64, ctypes.c_int64, ctypes.c_int64, ctypes.c_int64, i64, i64,
    ]
    lib.build_seen_table.restype = ctypes.c_int64
    lib.metapath_walk.argtypes = [i64, i64, i64, i64, ctypes.c_int64, i64,
                                  ctypes.c_int64, ctypes.c_int64, u64, i64]
    _lib = lib
    return _lib


def _p64(a):
    return a.ctypes.data_as(ctypes.POINTER(ctypes.c_int64))


def available():
    return _load() is not None


def sort_edges_by_dst(src, dst, num_nodes):
    """Stable (dst, src) sort permutation; native O(E+N) counting sort or
    np.lexsort fallback."""
    src = np.ascontiguousarray(src, dtype=np.int64)
    dst = np.ascontiguousarray(dst, dtype=np.int64)
    lib = _load()
    if lib is None:
        return np.lexsort((src, dst))
    order = np.empty(src.shape[0], dtype=np.int64)
    lib.sort_edges_by_dst(_p64(src), _p64(dst), src.shape[0], num_nodes, _p64(order))
    return order


def sort_edges_block(src, dst, num_nodes, block=128):
    """(dst // block, src, dst) sort permutation — the kernel block order
    (graph.py module docstring); native O(E+N) or np.lexsort fallback."""
    src = np.ascontiguousarray(src, dtype=np.int64)
    dst = np.ascontiguousarray(dst, dtype=np.int64)
    lib = _load()
    if lib is None or not hasattr(lib, "sort_edges_block"):
        return np.lexsort((dst, src, dst // block))
    order = np.empty(src.shape[0], dtype=np.int64)
    lib.sort_edges_block(
        _p64(src), _p64(dst), src.shape[0], num_nodes, block, _p64(order)
    )
    return order


def build_csr(src, dst, num_src):
    src = np.ascontiguousarray(src, dtype=np.int64)
    dst = np.ascontiguousarray(dst, dtype=np.int64)
    lib = _load()
    if lib is None:
        order = np.argsort(src, kind="stable")
        deg = np.bincount(src, minlength=num_src)
        rowptr = np.zeros(num_src + 1, dtype=np.int64)
        np.cumsum(deg, out=rowptr[1:])
        return rowptr, dst[order]
    rowptr = np.empty(num_src + 1, dtype=np.int64)
    col = np.empty(src.shape[0], dtype=np.int64)
    lib.build_csr(_p64(src), _p64(dst), src.shape[0], num_src, _p64(rowptr), _p64(col))
    return rowptr, col


def leave_one_out(uid, key, num_users):
    """Boolean test-row mask: per user, the last max-key row (the
    reference's stable-sort-then-take-last split, movielens.py:299-308)."""
    uid = np.ascontiguousarray(uid, dtype=np.int64)
    key = np.ascontiguousarray(key, dtype=np.int64)
    lib = _load()
    if lib is None:
        best = np.full(num_users, -1, dtype=np.int64)
        for r in range(uid.shape[0]):
            u = uid[r]
            if best[u] < 0 or key[r] >= key[best[u]]:
                best[u] = r
        mask = np.zeros(uid.shape[0], dtype=bool)
        mask[best[best >= 0]] = True
        return mask
    out = np.zeros(uid.shape[0], dtype=np.uint8)
    lib.leave_one_out(
        _p64(uid), _p64(key), uid.shape[0], num_users,
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
    )
    return out.astype(bool)


def build_seen_table(uid, iid, num_users, width, pad_value):
    """[num_users, width] sorted unique seen items + counts."""
    uid = np.ascontiguousarray(uid, dtype=np.int64)
    iid = np.ascontiguousarray(iid, dtype=np.int64)
    lib = _load()
    if lib is None:
        seen = np.full((num_users, width), pad_value, dtype=np.int64)
        counts = np.zeros(num_users, dtype=np.int64)
        order = np.lexsort((iid, uid))
        for r in order:
            u, i = uid[r], iid[r]
            c = counts[u]
            if c > 0 and seen[u, c - 1] == i:
                continue
            if c < width:
                seen[u, c] = i
            counts[u] = c + 1
        return seen, counts
    seen = np.empty((num_users, width), dtype=np.int64)
    counts = np.empty(num_users, dtype=np.int64)
    lib.build_seen_table(
        _p64(uid), _p64(iid), uid.shape[0], num_users, width, pad_value,
        _p64(seen), _p64(counts),
    )
    return seen, counts


def metapath_walk(step_csrs, starts, walk_len, seed=0):
    """Host-side metapath walks over [(rowptr, col), ...] step CSRs.

    Used by tooling/tests as a cross-check of the on-device walker
    (models/metapath2vec.py); returns [n_walks, walk_len+1] local ids."""
    starts = np.ascontiguousarray(starts, dtype=np.int64)
    lib = _load()
    if lib is None:
        rng = np.random.default_rng(seed)
        out = np.empty((starts.shape[0], walk_len + 1), dtype=np.int64)
        out[:, 0] = cur = starts.copy()
        for t in range(walk_len):
            rowptr, col = step_csrs[t % len(step_csrs)]
            lo = rowptr[cur]
            deg = rowptr[cur + 1] - lo
            pick = lo + np.where(deg > 0, rng.integers(0, np.maximum(deg, 1)), 0)
            cur = col[np.minimum(pick, col.shape[0] - 1)]
            out[:, t + 1] = cur
        return out
    rowptrs = np.concatenate([np.ascontiguousarray(rp, dtype=np.int64) for rp, _ in step_csrs])
    cols = np.concatenate([np.ascontiguousarray(c, dtype=np.int64) for _, c in step_csrs])
    rp_off = np.zeros(len(step_csrs), dtype=np.int64)
    col_off = np.zeros(len(step_csrs), dtype=np.int64)
    a = b = 0
    for k, (rp, c) in enumerate(step_csrs):
        rp_off[k], col_off[k] = a, b
        a += rp.shape[0]
        b += c.shape[0]
    out = np.empty((starts.shape[0], walk_len + 1), dtype=np.int64)
    state = np.array([seed * 2654435761 + 1], dtype=np.uint64)
    lib.metapath_walk(
        _p64(rowptrs), _p64(rp_off), _p64(cols), _p64(col_off),
        len(step_csrs), _p64(starts), starts.shape[0], walk_len,
        state.ctypes.data_as(ctypes.POINTER(ctypes.c_uint64)), _p64(out),
    )
    return out
