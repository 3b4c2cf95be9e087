"""Timestamped edge-table -> snapshot-sequence preprocessing.

The reference calls ``preprocess_temporal_graph(...)`` from a missing
``src/tagan/data`` package (bug B1); the contract is reconstructed from
its call sites (`/root/reference/preprocess_social_media.py:356-367`,
`run_tagan_social_media.py:151-158`, `debug_tagan.py:57-66`): bin a
timestamped edge table into at most ``max_snapshots`` snapshots of
``snapshot_duration`` seconds, each a dict with keys
``x / edge_index / edge_attr / node_ids / timestep``, with optional
feature normalization.
"""

from __future__ import annotations

from typing import Any, Dict, List, Optional, Sequence

import numpy as np


def preprocess_temporal_graph(
    data,
    timestamp_col: str = "timestamp",
    source_col: str = "source",
    target_col: str = "target",
    edge_attr_cols: Optional[Sequence[str]] = None,
    node_attr_cols: Optional[Dict[Any, np.ndarray]] = None,
    snapshot_duration: float = 3600.0,
    max_snapshots: int = 10,
    min_nodes_per_snapshot: int = 1,
    normalize_features: bool = True,
) -> List[Dict[str, Any]]:
    """Bin a timestamped edge table into graph snapshots.

    Args:
        data: mapping of column name -> sequence (or a pandas DataFrame —
            anything supporting ``data[col]``), one row per interaction.
        node_attr_cols: mapping node_id -> feature vector; nodes without
            an entry get zeros of the same length.

    Returns:
        List of snapshot dicts in the reference wire format
        (model.py:188-230): ``x`` f32[N_t, F], ``edge_index`` i64[2, E_t]
        (row indices into x), ``edge_attr`` f32[E_t, Fe] or None,
        ``node_ids`` list of global IDs, ``timestep`` float (bin start).
    """
    ts = np.asarray(data[timestamp_col], dtype=np.float64)
    src = np.asarray(data[source_col])
    dst = np.asarray(data[target_col])
    if len(ts) == 0:
        return []
    edge_attrs = None
    if edge_attr_cols:
        edge_attrs = np.stack(
            [np.asarray(data[c], dtype=np.float32) for c in edge_attr_cols],
            axis=1)

    t0 = ts.min()
    bins = ((ts - t0) // snapshot_duration).astype(np.int64)
    # cap at max_snapshots: later interactions fold into the last bin
    bins = np.minimum(bins, max_snapshots - 1)

    feat_dim = 0
    if node_attr_cols:
        feat_dim = len(next(iter(node_attr_cols.values())))

    snapshots: List[Dict[str, Any]] = []
    for b in range(int(bins.max()) + 1):
        sel = bins == b
        if not sel.any():
            continue
        s_nodes = src[sel]
        d_nodes = dst[sel]
        node_ids = sorted(set(s_nodes.tolist()) | set(d_nodes.tolist()))
        if len(node_ids) < min_nodes_per_snapshot:
            continue
        pos = {nid: i for i, nid in enumerate(node_ids)}
        ei = np.asarray(
            [[pos[s] for s in s_nodes], [pos[d] for d in d_nodes]],
            dtype=np.int64)
        if feat_dim > 0:
            x = np.zeros((len(node_ids), feat_dim), np.float32)
            for i, nid in enumerate(node_ids):
                v = node_attr_cols.get(nid)
                if v is not None:
                    x[i] = np.asarray(v, np.float32)
        else:
            # degree-based default features: [out_deg, in_deg, 1]
            x = np.zeros((len(node_ids), 3), np.float32)
            for s in s_nodes:
                x[pos[s], 0] += 1
            for d in d_nodes:
                x[pos[d], 1] += 1
            x[:, 2] = 1.0
        ea = edge_attrs[sel].astype(np.float32) \
            if edge_attrs is not None else None
        snapshots.append({
            "x": x, "edge_index": ei, "edge_attr": ea,
            "node_ids": [int(n) if isinstance(n, (int, np.integer))
                         else n for n in node_ids],
            "timestep": float(t0 + b * snapshot_duration),
        })

    if normalize_features and snapshots:
        allx = np.concatenate([s["x"] for s in snapshots], axis=0)
        mu = allx.mean(axis=0)
        sd = allx.std(axis=0)
        sd = np.where(sd < 1e-8, 1.0, sd)
        for s in snapshots:
            s["x"] = ((s["x"] - mu) / sd).astype(np.float32)
    return snapshots
