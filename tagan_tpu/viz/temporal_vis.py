"""Temporal graph visualization (reference
`/root/reference/src/tagan/visualization/temporal_vis.py`, 1211 LoC).
Same public surface; matplotlib/networkx implementations with plotly
fallback handling."""

from __future__ import annotations

from typing import Any, Dict, List, Optional, Sequence

import numpy as np

import matplotlib
matplotlib.use("Agg")
import matplotlib.pyplot as plt

try:
    import plotly.graph_objects as go
    HAS_PLOTLY = True
except ImportError:
    HAS_PLOTLY = False

from .attention_vis import plot_temporal_graph_attention  # re-export (:450)


def _unpack(snapshot):
    if isinstance(snapshot, dict):
        return (np.asarray(snapshot["x"]), np.asarray(snapshot["edge_index"]),
                list(snapshot["node_ids"]))
    x, ei, _, ids = snapshot[:4]
    return np.asarray(x), np.asarray(ei), list(ids)


def visualize_temporal_graph(graph_sequence, max_steps: int = 6,
                             title: str = "Temporal graph",
                             save_path: Optional[str] = None):
    """Grid of per-snapshot graph drawings (temporal_vis.py:20)."""
    import networkx as nx
    steps = list(graph_sequence)[:max_steps]
    cols = min(len(steps), 3)
    rows = (len(steps) + cols - 1) // cols
    fig, axes = plt.subplots(rows, cols, figsize=(4.5 * cols, 4 * rows),
                             squeeze=False)
    axes = axes.ravel()
    all_ids = sorted({i for s in steps for i in _unpack(s)[2]})
    base_pos = {nid: p for nid, p in zip(
        all_ids, nx.spring_layout(nx.complete_graph(len(all_ids)),
                                  seed=0).values())}
    for t, snap in enumerate(steps):
        x, ei, ids = _unpack(snap)
        g = nx.DiGraph()
        g.add_nodes_from(ids)
        for e in range(ei.shape[1]):
            g.add_edge(ids[int(ei[0, e])], ids[int(ei[1, e])])
        pos = {n: base_pos[n] for n in g.nodes()}
        vals = x[:, 0] if x.size else None
        nx.draw_networkx(g, pos, ax=axes[t], node_color=vals,
                         cmap="coolwarm", node_size=180, font_size=6,
                         with_labels=True, arrows=True)
        axes[t].set_title(f"t={t} ({len(ids)} nodes, {ei.shape[1]} edges)")
        axes[t].axis("off")
    for t in range(len(steps), len(axes)):
        axes[t].axis("off")
    fig.suptitle(title)
    fig.tight_layout()
    if save_path:
        fig.savefig(save_path, dpi=120)
        plt.close(fig)
    return fig


def plot_node_feature_evolution(graph_sequence, node_id: int,
                                feature_indices: Optional[Sequence[int]]
                                = None,
                                title: Optional[str] = None,
                                save_path: Optional[str] = None):
    """Line plot of one node's features over time (temporal_vis.py:263)."""
    series: Dict[int, List[float]] = {}
    ts = []
    for t, snap in enumerate(graph_sequence):
        x, _, ids = _unpack(snap)
        if node_id in ids:
            row = x[ids.index(node_id)]
            feats = feature_indices if feature_indices is not None \
                else range(min(len(row), 8))
            for f in feats:
                series.setdefault(f, []).append(float(row[f]))
            ts.append(t)
    fig, ax = plt.subplots(figsize=(7, 4))
    for f, vals in series.items():
        ax.plot(ts, vals, marker="o", label=f"feat {f}")
    ax.set_xlabel("time step")
    ax.set_ylabel("value")
    ax.legend(fontsize=7)
    ax.set_title(title or f"Node {node_id} feature evolution")
    if save_path:
        fig.savefig(save_path, dpi=120)
        plt.close(fig)
    return fig


def animate_feature_timeseries(graph_sequence, feature_index: int = 0,
                               save_path: Optional[str] = None,
                               interval: int = 500):
    """Animated histogram of a feature across nodes per step
    (temporal_vis.py:381)."""
    from matplotlib import animation
    frames = []
    for snap in graph_sequence:
        x, _, _ = _unpack(snap)
        frames.append(x[:, feature_index] if x.size else np.zeros(1))
    lo = min(f.min() for f in frames)
    hi = max(f.max() for f in frames)
    fig, ax = plt.subplots(figsize=(6, 4))

    def update(i):
        ax.clear()
        ax.hist(frames[i], bins=20, range=(lo, hi), color="tab:blue")
        ax.set_title(f"feature {feature_index} @ t={i}")
        return []

    anim = animation.FuncAnimation(fig, update, frames=len(frames),
                                   interval=interval, blit=False)
    if save_path:
        anim.save(save_path, writer="pillow")
        plt.close(fig)
    return anim


def interactive_temporal_graph(graph_sequence, title: str = "Temporal graph",
                               save_path: Optional[str] = None):
    """Plotly slider view when available (temporal_vis.py:715); static
    grid fallback otherwise."""
    if not HAS_PLOTLY:
        return visualize_temporal_graph(graph_sequence, title=title,
                                        save_path=save_path)
    import networkx as nx
    frames = []
    for t, snap in enumerate(graph_sequence):
        x, ei, ids = _unpack(snap)
        g = nx.Graph()
        g.add_nodes_from(range(len(ids)))
        g.add_edges_from(ei.T.tolist())
        pos = nx.spring_layout(g, seed=0)
        # edge segments (None-separated polyline, the plotly idiom —
        # reference temporal_vis.py:715 draws edges per frame too)
        ex, ey = [], []
        for a, b in g.edges():
            ex += [pos[a][0], pos[b][0], None]
            ey += [pos[a][1], pos[b][1], None]
        xs = [pos[n][0] for n in g.nodes()]
        ys = [pos[n][1] for n in g.nodes()]
        color = x[:, 0] if x.size else None
        frames.append(go.Frame(
            data=[go.Scatter(x=ex, y=ey, mode="lines",
                             line=dict(width=0.7, color="#999"),
                             hoverinfo="none"),
                  go.Scatter(x=xs, y=ys, mode="markers",
                             marker=dict(size=7, color=color,
                                         colorscale="Viridis"),
                             text=[str(i) for i in ids])],
            name=str(t)))
    fig = go.Figure(data=frames[0].data, frames=frames)
    steps = [dict(args=[[f.name],
                        dict(frame=dict(duration=0, redraw=True),
                             mode="immediate")],
                  label=f.name, method="animate") for f in frames]
    fig.update_layout(
        title=title, showlegend=False,
        sliders=[dict(steps=steps, currentvalue=dict(prefix="t="))],
        updatemenus=[dict(type="buttons", buttons=[dict(
            label="Play", method="animate",
            args=[None, dict(frame=dict(duration=400))])])])
    if save_path:
        fig.write_html(save_path)
    return fig


def plot_temporal_patterns(values, labels: Optional[Sequence[str]] = None,
                           title: str = "Temporal patterns",
                           save_path: Optional[str] = None):
    """Multi-series temporal line plot (temporal_vis.py:930)."""
    vals = np.asarray(values)
    if vals.ndim == 1:
        vals = vals[None]
    fig, ax = plt.subplots(figsize=(7, 4))
    for i, row in enumerate(vals):
        ax.plot(row, marker=".",
                label=labels[i] if labels and i < len(labels)
                else f"series {i}")
    ax.set_xlabel("time step")
    ax.legend(fontsize=7)
    ax.set_title(title)
    if save_path:
        fig.savefig(save_path, dpi=120)
        plt.close(fig)
    return fig
