"""Synthetic temporal-graph data generators.

Port of the reference's generator *semantics* (not code):

* ``create_synthetic_data`` — Barabási–Albert topology, bidirectional
  edges, per-step Gaussian features with a label-correlated drift on
  feature 0 that strengthens over time
  (`/root/reference/src/tagan/utils/data_utils.py:14-121`).
* ``create_dynamic_synthetic_data`` — extension with node churn
  (appear/disappear/reappear) to exercise the memory bank, which the
  reference's generator never does (constant node set per sequence).

Pure numpy; no torch/networkx dependency. The BA process matches
networkx's ``barabasi_albert_graph`` semantics: start with m isolated
nodes, attach each new node to m existing nodes sampled preferentially
by degree (repeated nodes collapse — simple graph).
"""

from __future__ import annotations

from typing import List, Optional, Tuple

import numpy as np


def barabasi_albert_edges(n: int, m: int,
                          rng: np.random.Generator) -> np.ndarray:
    """Undirected BA edge list [2, E] (each edge once)."""
    m = max(1, min(m, n - 1))
    targets = list(range(m))
    repeated: List[int] = []
    edges = []
    for src in range(m, n):
        chosen = set()
        while len(chosen) < m:
            if repeated and rng.random() > 1.0 / (len(repeated) + 1):
                cand = repeated[rng.integers(len(repeated))]
            else:
                cand = targets[rng.integers(len(targets))]
            chosen.add(cand)
        for dst in chosen:
            edges.append((src, dst))
            repeated.extend([src, dst])
        targets.append(src)
    if not edges:
        edges = [(0, min(1, n - 1))]
    return np.asarray(edges, dtype=np.int64).T


def create_synthetic_data(
    num_samples: int = 100,
    num_nodes_range: Tuple[int, int] = (5, 20),
    num_edges_per_node: int = 2,
    node_feature_dim: int = 10,
    edge_feature_dim: int = 5,
    sequence_length: int = 4,
    num_classes: int = 2,
    balanced: bool = True,
    seed: Optional[int] = None,
):
    """Generate [(graph_sequence, label)] in the reference wire format:
    snapshots are (x, edge_index, edge_attr, node_ids) tuples
    (data_utils.py:14-121)."""
    rng = np.random.default_rng(seed)

    if balanced and num_classes > 0:
        per = num_samples // num_classes
        labels = []
        for c in range(num_classes):
            labels.extend([c] * per)
        labels.extend([num_classes - 1] * (num_samples - len(labels)))
        rng.shuffle(labels)
    else:
        labels = rng.integers(0, max(1, num_classes),
                              size=num_samples).tolist()

    data = []
    for i in range(num_samples):
        n = int(rng.integers(num_nodes_range[0], num_nodes_range[1] + 1))
        ei = barabasi_albert_edges(n, num_edges_per_node, rng)
        # bidirectional (data_utils.py:75)
        ei = np.concatenate([ei, ei[::-1]], axis=1)
        node_ids = list(range(n))
        seq = []
        is_positive = (labels[i] == 1) if num_classes == 2 \
            else (labels[i] > 0)
        for t in range(sequence_length):
            x = rng.standard_normal((n, node_feature_dim)).astype(np.float32)
            strength = (0.5 + 0.2 * t / sequence_length)
            x[:, 0] += strength if is_positive else -strength
            x += 0.1 * rng.standard_normal(
                (n, node_feature_dim)).astype(np.float32)
            ea = rng.standard_normal(
                (ei.shape[1], edge_feature_dim)).astype(np.float32) \
                if edge_feature_dim > 0 else None
            seq.append((x, ei, ea, node_ids))
        label = float(labels[i]) if num_classes == 2 else int(labels[i])
        data.append((seq, label))
    return data


def create_dynamic_synthetic_data(
    num_samples: int = 100,
    num_nodes_range: Tuple[int, int] = (10, 30),
    num_edges_per_node: int = 2,
    node_feature_dim: int = 10,
    edge_feature_dim: int = 0,
    sequence_length: int = 8,
    num_classes: int = 2,
    churn_prob: float = 0.3,
    reappear_prob: float = 0.5,
    seed: Optional[int] = None,
):
    """Like `create_synthetic_data` but with node churn: each step a node
    may go inactive (churn_prob) and inactive nodes may reappear
    (reappear_prob). Exercises the memory-bank reappearance machinery the
    reference intended (temporal_propagation.py:1411-1446)."""
    rng = np.random.default_rng(seed)
    labels = rng.integers(0, max(1, num_classes), size=num_samples).tolist()
    data = []
    for i in range(num_samples):
        n = int(rng.integers(num_nodes_range[0], num_nodes_range[1] + 1))
        base_ei = barabasi_albert_edges(n, num_edges_per_node, rng)
        base_ei = np.concatenate([base_ei, base_ei[::-1]], axis=1)
        active = np.ones(n, bool)
        is_positive = (labels[i] == 1) if num_classes == 2 \
            else (labels[i] > 0)
        seq = []
        for t in range(sequence_length):
            flips_out = rng.random(n) < churn_prob
            flips_in = rng.random(n) < reappear_prob
            active = np.where(active, ~flips_out, flips_in)
            if not active.any():
                active[rng.integers(n)] = True
            ids = np.flatnonzero(active)
            id_pos = {int(g): k for k, g in enumerate(ids)}
            keep = np.isin(base_ei[0], ids) & np.isin(base_ei[1], ids)
            ei_g = base_ei[:, keep]
            ei = np.asarray([[id_pos[int(a)] for a in ei_g[0]],
                             [id_pos[int(b)] for b in ei_g[1]]],
                            dtype=np.int64).reshape(2, -1)
            x = rng.standard_normal(
                (len(ids), node_feature_dim)).astype(np.float32)
            strength = (0.5 + 0.2 * t / sequence_length)
            x[:, 0] += strength if is_positive else -strength
            ea = rng.standard_normal(
                (ei.shape[1], edge_feature_dim)).astype(np.float32) \
                if edge_feature_dim > 0 else None
            seq.append((x, ei, ea, [int(g) for g in ids]))
        label = float(labels[i]) if num_classes == 2 else int(labels[i])
        data.append((seq, label))
    return data


def create_order_churn_data(
    num_samples: int = 100,
    num_nodes_range: Tuple[int, int] = (10, 16),
    num_edges_per_node: int = 2,
    node_feature_dim: int = 10,
    sequence_length: int = 8,
    signal: float = 1.0,
    churn_prob: float = 0.3,
    reappear_prob: float = 0.5,
    seed: Optional[int] = None,
):
    """Churn data whose label is encoded in TEMPORAL ORDER: class 1
    sequences carry +signal on feature 0 in the first half and -signal
    in the second half; class 0 the reverse. The time-mean of the
    signal is ~0 for both classes, so any pipeline that pools over time
    without temporal structure (un-timed attention + unmasked mean —
    the reference's executed path, SURVEY B2/B4) sees no first-order
    signal; recovering the label requires the causal/time-aware
    machinery (time encodings, causal masks, temporal propagation with
    the memory bank carrying state across churn gaps). The benchmark
    task for VERDICT round-1 item 5 (benchmarks/accuracy_churn.py)."""
    rng = np.random.default_rng(seed)
    labels = rng.integers(0, 2, size=num_samples).tolist()
    data = []
    half = sequence_length // 2
    for i in range(num_samples):
        n = int(rng.integers(num_nodes_range[0], num_nodes_range[1] + 1))
        base_ei = barabasi_albert_edges(n, num_edges_per_node, rng)
        base_ei = np.concatenate([base_ei, base_ei[::-1]], axis=1)
        active = np.ones(n, bool)
        sign0 = 1.0 if labels[i] == 1 else -1.0
        seq = []
        for t in range(sequence_length):
            flips_out = rng.random(n) < churn_prob
            flips_in = rng.random(n) < reappear_prob
            active = np.where(active, ~flips_out, flips_in)
            if not active.any():
                active[rng.integers(n)] = True
            ids = np.flatnonzero(active)
            id_pos = {int(g): k for k, g in enumerate(ids)}
            keep = np.isin(base_ei[0], ids) & np.isin(base_ei[1], ids)
            ei_g = base_ei[:, keep]
            ei = np.asarray([[id_pos[int(a)] for a in ei_g[0]],
                             [id_pos[int(b)] for b in ei_g[1]]],
                            dtype=np.int64).reshape(2, -1)
            x = rng.standard_normal(
                (len(ids), node_feature_dim)).astype(np.float32)
            s = sign0 * signal * (1.0 if t < half else -1.0)
            x[:, 0] += s
            seq.append((x, ei, None, [int(g) for g in ids]))
        data.append((seq, float(labels[i])))
    return data
