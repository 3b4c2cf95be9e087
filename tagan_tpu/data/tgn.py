"""TGN-style temporal interaction graph loading.

BASELINE.json config 4 targets "TGN-style real temporal graphs
(Wikipedia/Reddit-scale, ~10K nodes, 600K temporal edges) with neighbor
sampling per snapshot". This module provides:

* ``load_jodie_csv`` — reader for the standard JODIE/TGN CSV format
  (``user_id,item_id,timestamp,state_label,f0,f1,...`` with a header
  line), the distribution format of the Wikipedia/Reddit datasets.
* ``TemporalInteractionStream`` — a columnar event stream (sources,
  destinations, times, edge features, labels) with bipartite node-ID
  remapping.
* ``stream_to_sequences`` — sliding-window conversion of the stream
  into snapshot sequences: each window of ``seq_span`` seconds becomes
  one sequence of ``num_snapshots`` equal-duration snapshots; per
  snapshot the interaction multigraph is degree-capped by **recency
  neighbor sampling** (keep each node's most recent ``max_degree``
  events — the standard TGN sampler), and the sequence label is the
  window's max state label (or a caller-supplied labeler).
* ``create_tgn_synthetic`` — an offline generator with the same shape
  (bipartite user-item interactions, power-law popularity, bursty
  repeat behavior, state-change labels) for testing at any scale.

No reference analog — the reference has no real-data loader at all
(its data package is missing, SURVEY.md B1).
"""

from __future__ import annotations

import dataclasses
from typing import Callable, Dict, List, Optional, Sequence, Tuple

import numpy as np

from .dataset import TemporalGraphDataset


@dataclasses.dataclass
class TemporalInteractionStream:
    src: np.ndarray          # i64[E] global source node ids
    dst: np.ndarray          # i64[E] global destination node ids
    t: np.ndarray            # f64[E] event times (sorted ascending)
    edge_feat: np.ndarray    # f32[E, Fe] (Fe may be 0)
    label: np.ndarray        # f32[E] per-event state label
    num_nodes: int

    def __post_init__(self):
        order = np.argsort(self.t, kind="stable")
        self.src = self.src[order]
        self.dst = self.dst[order]
        self.t = self.t[order]
        self.edge_feat = self.edge_feat[order]
        self.label = self.label[order]

    @property
    def num_events(self) -> int:
        return len(self.t)


def load_jodie_csv(path: str) -> TemporalInteractionStream:
    """Parse the JODIE CSV format (user_id,item_id,timestamp,state_label,
    features...). Item ids are offset past user ids (bipartite)."""
    srcs, dsts, ts, labels, feats = [], [], [], [], []
    with open(path) as f:
        header = f.readline()
        del header
        for line in f:
            parts = line.strip().split(",")
            if len(parts) < 4:
                continue
            srcs.append(int(float(parts[0])))
            dsts.append(int(float(parts[1])))
            ts.append(float(parts[2]))
            labels.append(float(parts[3]))
            feats.append([float(v) for v in parts[4:]])
    src = np.asarray(srcs, np.int64)
    dst = np.asarray(dsts, np.int64)
    n_users = int(src.max()) + 1 if len(src) else 0
    dst = dst + n_users      # bipartite offset (JODIE convention)
    fe = np.asarray(feats, np.float32) if feats and feats[0] else \
        np.zeros((len(src), 0), np.float32)
    return TemporalInteractionStream(
        src=src, dst=dst, t=np.asarray(ts, np.float64),
        edge_feat=fe, label=np.asarray(labels, np.float32),
        num_nodes=int(dst.max()) + 1 if len(dst) else 0)


def create_tgn_synthetic(num_users: int = 1000, num_items: int = 500,
                         num_events: int = 50000, time_span: float = 1e6,
                         edge_feat_dim: int = 4,
                         state_change_rate: float = 0.002,
                         num_churn_bursts: int = 0,
                         burst_len: int = 24,
                         burst_span: float = 0.0,
                         burst_feat_shift: float = 2.0,
                         num_decoy_bursts: int = 0,
                         decoy_feat_shift: float = 0.0,
                         burst_label_noise: float = 0.0,
                         seed: int = 0) -> TemporalInteractionStream:
    """Bipartite interaction stream with power-law item popularity and
    bursty user repeat behavior — the statistical shape of the JODIE
    datasets, generated offline.

    ``state_change_rate`` labels random events positive (unlearnable
    noise — fine for throughput runs). For an accuracy-meaningful task
    set ``num_churn_bursts`` > 0: that many users emit a tight burst of
    ``burst_len`` interactions within ``burst_span`` seconds at a random
    churn time, and exactly those events carry label 1 — observable
    both as an activity spike (degree features) and through
    ``burst_feat_shift`` added to the burst events' edge features (the
    JODIE datasets' state-change signature lives in the edge features
    the same way), so windows containing a burst are predictably
    positive.

    Difficulty dials (round 5 — a benchmark saturated at AUC 1.0 can
    neither catch regressions nor rank readouts):
    ``num_decoy_bursts`` adds bursts with the SAME activity spike but
    ``decoy_feat_shift`` (default 0: plain noise) on their features and
    label 0 — the activity signal alone then produces false positives,
    forcing the readout onto the feature signature;
    ``burst_label_noise`` silently unlabels each real burst with that
    probability (a false-negative rate in the labels — irreducible
    error that caps attainable AUC below 1)."""
    rng = np.random.default_rng(seed)
    item_pop = rng.zipf(1.5, num_items).astype(np.float64)
    item_pop /= item_pop.sum()
    user_act = rng.zipf(1.8, num_users).astype(np.float64)
    user_act /= user_act.sum()

    src = rng.choice(num_users, num_events, p=user_act)
    # bursty repeats: 30% of events reuse the user's previous item
    dst_new = rng.choice(num_items, num_events, p=item_pop)
    dst = dst_new.copy()
    last_item: Dict[int, int] = {}
    repeat = rng.random(num_events) < 0.3
    for e in range(num_events):
        u = int(src[e])
        if repeat[e] and u in last_item:
            dst[e] = last_item[u]
        last_item[u] = int(dst[e])
    t = np.sort(rng.random(num_events)) * time_span
    fe = rng.standard_normal((num_events, edge_feat_dim)).astype(np.float32)
    label = (rng.random(num_events) < state_change_rate).astype(np.float32)

    if num_churn_bursts > 0 or num_decoy_bursts > 0:
        span = burst_span or time_span / 1000.0
        n_all = num_churn_bursts + num_decoy_bursts
        users_b = rng.choice(num_users, n_all, replace=False)
        b_src, b_dst, b_t, b_fe, b_lb = [], [], [], [], []
        for i, u in enumerate(users_b):
            real = i < num_churn_bursts
            t_c = rng.random() * (time_span - span)
            b_src.extend([u] * burst_len)
            b_dst.extend(rng.choice(num_items, burst_len,
                                    p=item_pop).tolist())
            b_t.extend((t_c + np.sort(rng.random(burst_len)) * span)
                       .tolist())
            shift = burst_feat_shift if real else decoy_feat_shift
            b_fe.append(shift + rng.standard_normal(
                (burst_len, edge_feat_dim)).astype(np.float32))
            lab = 1.0 if (real and
                          rng.random() >= burst_label_noise) else 0.0
            b_lb.extend([lab] * burst_len)
        src = np.concatenate([src, np.asarray(b_src)])
        dst = np.concatenate([dst, np.asarray(b_dst)])
        t = np.concatenate([t, np.asarray(b_t)])
        fe = np.concatenate([fe] + b_fe)
        label = np.concatenate(
            [label, np.asarray(b_lb, np.float32)])

    return TemporalInteractionStream(
        src=src.astype(np.int64),
        dst=(dst + num_users).astype(np.int64), t=t, edge_feat=fe,
        label=label, num_nodes=num_users + num_items)


def _recency_sample(src, dst, order_hint, max_degree):
    """Keep each node's most recent `max_degree` incident events.
    Events are in time order; returns a boolean keep-mask."""
    keep = np.ones(len(src), bool)
    count: Dict[int, int] = {}
    # walk backwards (most recent first)
    for e in range(len(src) - 1, -1, -1):
        cs = count.get(src[e], 0)
        cd = count.get(dst[e], 0)
        if cs >= max_degree and cd >= max_degree:
            keep[e] = False
            continue
        count[src[e]] = cs + 1
        count[dst[e]] = cd + 1
    return keep


def stream_to_sequences(
    stream: TemporalInteractionStream,
    num_snapshots: int = 10,
    seq_span: Optional[float] = None,
    stride: Optional[float] = None,
    max_degree: int = 16,
    bidirectional: bool = True,
    node_feature_fn: Optional[Callable[[int], np.ndarray]] = None,
    node_feature_dim: int = 8,
    labeler: Optional[Callable[[np.ndarray], float]] = None,
    max_sequences: Optional[int] = None,
) -> TemporalGraphDataset:
    """Slide a window over the event stream; each window becomes one
    snapshot sequence in the framework wire format."""
    if stream.num_events == 0:
        return TemporalGraphDataset([], [])
    t0, t1 = float(stream.t[0]), float(stream.t[-1])
    span = seq_span or (t1 - t0) / 10.0
    hop = stride or span
    if labeler is None:
        def labeler(lbls):
            return float(lbls.max()) if len(lbls) else 0.0

    sequences, labels = [], []
    w_start = t0
    while w_start < t1 and (max_sequences is None
                            or len(sequences) < max_sequences):
        w_end = w_start + span
        lo, hi = np.searchsorted(stream.t, [w_start, w_end])
        if hi - lo < num_snapshots:       # too few events
            w_start += hop
            continue
        ev_src = stream.src[lo:hi]
        ev_dst = stream.dst[lo:hi]
        ev_t = stream.t[lo:hi]
        ev_fe = stream.edge_feat[lo:hi]
        ev_lb = stream.label[lo:hi]

        snap_dur = span / num_snapshots
        bins = np.minimum(((ev_t - w_start) // snap_dur).astype(np.int64),
                          num_snapshots - 1)
        snaps = []
        for b in range(num_snapshots):
            sel = bins == b
            if not sel.any():
                continue
            s_src = ev_src[sel]
            s_dst = ev_dst[sel]
            s_fe = ev_fe[sel]
            keep = _recency_sample(s_src, s_dst, None, max_degree)
            s_src, s_dst, s_fe = s_src[keep], s_dst[keep], s_fe[keep]
            ids = sorted(set(s_src.tolist()) | set(s_dst.tolist()))
            pos = {g: i for i, g in enumerate(ids)}
            ei = np.asarray([[pos[g] for g in s_src],
                             [pos[g] for g in s_dst]], np.int64)
            ea = s_fe.astype(np.float32)
            if bidirectional:
                ei = np.concatenate([ei, ei[::-1]], axis=1)
                ea = np.concatenate([ea, ea], axis=0)
            if node_feature_fn is not None:
                x = np.stack([node_feature_fn(g) for g in ids])
            else:
                # degree features + mean incident edge features (the
                # JODIE-style event signal aggregated into node context
                # — a snapshot model has no other way to see it)
                x = np.zeros((len(ids), node_feature_dim), np.float32)
                for g_arr, col in ((s_src, 0), (s_dst, 1)):
                    for g in g_arr:
                        x[pos[g], col] += 1.0
                x[:, 2] = 1.0
                kf = min(node_feature_dim - 3, s_fe.shape[1])
                if kf > 0:
                    acc = np.zeros((len(ids), kf), np.float64)
                    cnt = np.zeros((len(ids),), np.float64)
                    for e in range(len(s_src)):
                        for g in (s_src[e], s_dst[e]):
                            acc[pos[g]] += s_fe[e, :kf]
                            cnt[pos[g]] += 1.0
                    x[:, 3:3 + kf] = (acc
                                      / np.maximum(cnt, 1.0)[:, None])
            # window-relative snapshot times (0, 1, 2, ...): absolute
            # stream seconds (~1e6) would saturate the time encodings
            snaps.append({"x": x.astype(np.float32), "edge_index": ei,
                          "edge_attr": ea if ea.shape[1] else None,
                          "node_ids": [int(g) for g in ids],
                          "timestep": float(b)})
        if len(snaps) >= max(2, num_snapshots // 2):
            sequences.append(snaps)
            labels.append(labeler(ev_lb))
        w_start += hop
    return TemporalGraphDataset(sequences, labels)
