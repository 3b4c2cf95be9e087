"""ctypes bindings for the native host-side packer (packer.cpp).

The library is built lazily on first use (``make`` in this directory —
a single translation unit, sub-second). If the toolchain is missing the
callers fall back to the pure-Python implementations in `core.graph`;
`is_available()` reports which path is active.

Measured at 10K nodes / 20 snapshots (this host): pack-only 0.08s
(dense_adj=False) / 1.36s (dense adjacency, page-fault bound) vs the
Python packer's ~0.5s; end-to-end `build_sequence` times are dominated
by the host->device transfer, where the two paths roughly tie at small
scale and native is ~1.6x at 10K nodes.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
from typing import Optional, Tuple

import numpy as np

_DIR = os.path.dirname(os.path.abspath(__file__))
_LIB_PATH = os.path.join(_DIR, "libtagan_packer.so")
_lib: Optional[ctypes.CDLL] = None
_tried = False


def _build() -> bool:
    try:
        subprocess.run(["make", "-C", _DIR, "-s"], check=True,
                       capture_output=True, timeout=120)
        return os.path.exists(_LIB_PATH)
    except Exception:
        return False


def _load() -> Optional[ctypes.CDLL]:
    global _lib, _tried
    if _lib is not None or _tried:
        return _lib
    _tried = True
    if not os.path.exists(_LIB_PATH) and not _build():
        return None
    try:
        lib = ctypes.CDLL(_LIB_PATH)
    except OSError:
        return None

    i64p = np.ctypeslib.ndpointer(np.int64, flags="C_CONTIGUOUS")
    i32p = np.ctypeslib.ndpointer(np.int32, flags="C_CONTIGUOUS")
    f32p = np.ctypeslib.ndpointer(np.float32, flags="C_CONTIGUOUS")
    f64p = np.ctypeslib.ndpointer(np.float64, flags="C_CONTIGUOUS")
    u8p = np.ctypeslib.ndpointer(np.uint8, flags="C_CONTIGUOUS")

    lib.tagan_unique_ids.restype = ctypes.c_int64
    lib.tagan_unique_ids.argtypes = [i64p, i64p, ctypes.c_int64,
                                     ctypes.c_int64, i64p]

    lib.tagan_pack_sequence.restype = ctypes.c_int32
    lib.tagan_pack_sequence.argtypes = [
        f32p, i64p, i64p, ctypes.c_void_p,       # x, ids, edges, eattr
        i64p, i64p, ctypes.c_void_p,             # node/edge counts, times
        i64p, ctypes.c_int64,                    # unique ids
        ctypes.c_int64, ctypes.c_int64, ctypes.c_int64,  # T, F, Fe
        ctypes.c_int64, ctypes.c_int64, ctypes.c_int64,  # maxT, maxN, maxE
        ctypes.c_int32,                          # dense_adj
        f32p, u8p, u8p, i32p, i32p, u8p, f32p, f32p, u8p, i32p,
    ]

    lib.tagan_coo_to_csr.restype = ctypes.c_int32
    lib.tagan_coo_to_csr.argtypes = [i32p, i32p, u8p, ctypes.c_int64,
                                     ctypes.c_int64, i32p, i32p, i32p, u8p]

    lib.tagan_rcm_order.restype = ctypes.c_int32
    lib.tagan_rcm_order.argtypes = [i64p, i64p, ctypes.c_int64,
                                    ctypes.c_int64, i64p]
    _lib = lib
    return _lib


def is_available() -> bool:
    return _load() is not None


def pack_sequence_native(unpacked, max_nodes: int, max_edges: int,
                         max_time: int, edge_feature_dim: int,
                         dense_adj: bool = True):
    """Pack [(x, edge_index, edge_attr, node_ids, time)] via the C++
    packer. Returns numpy arrays in the core.graph layout, or None if
    the library is unavailable."""
    lib = _load()
    if lib is None:
        return None

    T = len(unpacked)
    Fn = unpacked[0][0].shape[1]
    Fe = edge_feature_dim

    x_concat = np.ascontiguousarray(
        np.concatenate([u[0] for u in unpacked], axis=0), np.float32)
    ids_concat = np.ascontiguousarray(
        np.concatenate([np.asarray(u[3], np.int64) for u in unpacked]))
    edges_concat = np.ascontiguousarray(np.concatenate(
        [np.asarray(u[1], np.int64).reshape(-1) for u in unpacked])
        if any(u[1].size for u in unpacked) else np.zeros(1, np.int64))
    if Fe > 0:
        blocks = []
        for u in unpacked:
            e_t = u[1].shape[1]
            if u[2] is not None and u[2].size:
                blocks.append(np.asarray(u[2][:, :Fe], np.float32))
            else:
                blocks.append(np.zeros((e_t, Fe), np.float32))
        eattr_concat = np.ascontiguousarray(
            np.concatenate(blocks, axis=0) if blocks
            else np.zeros((0, Fe), np.float32))
        eattr_ptr = eattr_concat.ctypes.data_as(ctypes.c_void_p)
    else:
        eattr_concat = None
        eattr_ptr = None
    node_counts = np.asarray([len(u[3]) for u in unpacked], np.int64)
    edge_counts = np.asarray([u[1].shape[1] for u in unpacked], np.int64)
    have_times = all(u[4] is not None for u in unpacked)
    if have_times:
        times_in = np.asarray([float(u[4]) for u in unpacked], np.float64)
        times_ptr = times_in.ctypes.data_as(ctypes.c_void_p)
    else:
        times_ptr = None

    unique = np.zeros(max(len(ids_concat), 1), np.int64)
    n_unique = lib.tagan_unique_ids(ids_concat, node_counts, T,
                                    max_nodes, unique)
    if n_unique < 0:
        raise ValueError(
            f"sequence has more unique nodes than max_nodes={max_nodes}")

    x = np.zeros((max_time, max_nodes, Fn), np.float32)
    node_mask = np.zeros((max_time, max_nodes), np.uint8)
    adj = np.zeros((max_time, max_nodes, max_nodes), np.uint8) \
        if dense_adj else np.zeros((max_time, 1, 1), np.uint8)
    edge_src = np.zeros((max_time, max_edges), np.int32)
    edge_dst = np.zeros((max_time, max_edges), np.int32)
    edge_mask = np.zeros((max_time, max_edges), np.uint8)
    edge_attr = np.zeros((max_time, max_edges, Fe), np.float32)
    times = np.zeros((max_time,), np.float32)
    time_mask = np.zeros((max_time,), np.uint8)
    node_ids = np.zeros((max_nodes,), np.int32)

    rc = lib.tagan_pack_sequence(
        x_concat, ids_concat, edges_concat, eattr_ptr,
        node_counts, edge_counts, times_ptr,
        unique[:max(n_unique, 1)], n_unique,
        T, Fn, Fe, max_time, max_nodes, max_edges,
        1 if dense_adj else 0,
        x, node_mask, adj, edge_src, edge_dst, edge_mask,
        edge_attr, times, time_mask, node_ids)
    if rc == -2:
        raise ValueError(f"a snapshot exceeds max_edges={max_edges}")
    if rc == -3:
        raise ValueError(f"sequence has {T} steps > max_time={max_time}")
    if rc != 0:
        raise ValueError(f"native packer failed with code {rc}")
    # uint8 0/1 -> bool is a zero-copy reinterpret (astype would copy
    # the [T, N, N] adjacency — gigabytes at 10K nodes)
    return (x, node_mask.view(bool), adj.view(bool), edge_src,
            edge_dst, edge_mask.view(bool), edge_attr, times,
            time_mask.view(bool), node_ids)


def coo_to_csr_native(edge_q: np.ndarray, edge_k: np.ndarray,
                      edge_mask: np.ndarray, num_nodes: int):
    """Single-snapshot CSR build in C++. Returns
    (row_ptr, col, perm, mask) or None if unavailable."""
    lib = _load()
    if lib is None:
        return None
    E = len(edge_q)
    row_ptr = np.zeros(num_nodes + 1, np.int32)
    col = np.zeros(E, np.int32)
    perm = np.zeros(E, np.int32)
    mask = np.zeros(E, np.uint8)
    rc = lib.tagan_coo_to_csr(
        np.ascontiguousarray(edge_q, np.int32),
        np.ascontiguousarray(edge_k, np.int32),
        np.ascontiguousarray(edge_mask, np.uint8), E, num_nodes,
        row_ptr, col, perm, mask)
    if rc != 0:
        raise ValueError(f"native CSR build failed with code {rc}")
    return row_ptr, col, perm, mask.astype(bool)


def rcm_order_native(src: np.ndarray, dst: np.ndarray, n: int):
    """Reverse Cuthill–McKee order of an undirected [0, n) index graph
    in C++ (core.graph.locality_order is the Python oracle). Returns a
    permutation array of length n, or None if unavailable."""
    lib = _load()
    if lib is None:
        return None
    src = np.ascontiguousarray(src, np.int64)
    dst = np.ascontiguousarray(dst, np.int64)
    out = np.zeros(n, np.int64)
    rc = lib.tagan_rcm_order(src, dst, len(src), n, out)
    if rc != 0:
        raise ValueError(f"native RCM failed with code {rc}")
    return out
