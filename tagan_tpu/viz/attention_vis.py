"""Attention visualization (reference
`/root/reference/src/tagan/visualization/attention_vis.py`, 894 LoC).

Same public surface; matplotlib/networkx implementations. The
plotly-based interactives fall back to matplotlib when plotly is absent
from the environment (it is not baked into this image).
"""

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


def _to_np(x):
    return np.asarray(x)


def plot_attention_patterns(attention_weights, head: Optional[int] = None,
                            title: str = "Attention patterns",
                            save_path: Optional[str] = None,
                            cmap: str = "viridis"):
    """Heatmap(s) of attention weights [heads, T, T] or [B, heads, T, T]
    (reference attention_vis.py:18)."""
    w = _to_np(attention_weights)
    while w.ndim > 3:
        w = w[0]
    n_heads = w.shape[0]
    if head is not None:
        fig, ax = plt.subplots(figsize=(5, 4))
        im = ax.imshow(w[head], cmap=cmap, aspect="auto")
        ax.set_title(f"{title} (head {head})")
        fig.colorbar(im, ax=ax)
        axes = [ax]
    else:
        cols = min(n_heads, 4)
        rows = (n_heads + cols - 1) // cols
        fig, axes = plt.subplots(rows, cols,
                                 figsize=(4 * cols, 3.2 * rows),
                                 squeeze=False)
        axes = axes.ravel()
        for h in range(n_heads):
            im = axes[h].imshow(w[h], cmap=cmap, aspect="auto")
            axes[h].set_title(f"head {h}")
            fig.colorbar(im, ax=axes[h])
        for h in range(n_heads, len(axes)):
            axes[h].axis("off")
        fig.suptitle(title)
    fig.tight_layout()
    if save_path:
        fig.savefig(save_path, dpi=120)
        plt.close(fig)
    return fig


def plot_temporal_graph_attention(attention_weights, time_stamps=None,
                                  focus_step: Optional[int] = None,
                                  title: str = "Temporal attention",
                                  save_path: Optional[str] = None):
    """Past-vs-future attention from a focus timestep (reference
    attention_vis.py:169/:451 and debug_tagan.py:341-494 asymmetry view)."""
    w = _to_np(attention_weights)
    while w.ndim > 3:
        w = w[0]
    mean_w = w.mean(axis=0)                   # [T, T]
    T = mean_w.shape[0]
    t0 = focus_step if focus_step is not None else T // 2
    fig, (ax1, ax2) = plt.subplots(1, 2, figsize=(10, 4))
    im = ax1.imshow(mean_w, cmap="viridis", aspect="auto")
    ax1.set_title("head-mean attention")
    ax1.set_xlabel("key step")
    ax1.set_ylabel("query step")
    fig.colorbar(im, ax=ax1)
    xs = np.arange(T)
    ax2.bar(xs, mean_w[t0], color=np.where(xs < t0, "tab:blue",
                                           np.where(xs > t0, "tab:orange",
                                                    "tab:green")))
    ax2.axvline(t0, ls="--", c="k", lw=1)
    ax2.set_title(f"attention from step {t0} (blue=past orange=future)")
    # asymmetry score: mean |A[i,j] - A[j,i]| (debug_tagan.py:341-494)
    asym = float(np.mean(np.abs(mean_w - mean_w.T)))
    fig.suptitle(f"{title} — asymmetry={asym:.4f}")
    fig.tight_layout()
    if save_path:
        fig.savefig(save_path, dpi=120)
        plt.close(fig)
    return fig


def plot_interactive_attention(attention_weights, title: str = "Attention",
                               save_path: Optional[str] = None):
    """Plotly heatmap when available (attention_vis.py:286); matplotlib
    fallback otherwise."""
    w = _to_np(attention_weights)
    while w.ndim > 2:
        w = w.mean(axis=0)
    if HAS_PLOTLY:
        fig = go.Figure(data=go.Heatmap(z=w, colorscale="Viridis"))
        fig.update_layout(title=title)
        if save_path:
            fig.write_html(save_path)
        return fig
    return plot_attention_patterns(w[None], title=title,
                                   save_path=save_path)


def create_animated_attention(attention_weights_seq,
                              save_path: Optional[str] = None,
                              interval: int = 500):
    """Frame-per-timestep animation of attention matrices
    (attention_vis.py:625)."""
    from matplotlib import animation
    ws = [_to_np(w) for w in attention_weights_seq]
    ws = [w.mean(axis=0) if w.ndim > 2 else w for w in ws]
    fig, ax = plt.subplots(figsize=(5, 4))
    im = ax.imshow(ws[0], cmap="viridis", aspect="auto")
    fig.colorbar(im, ax=ax)

    def update(i):
        im.set_data(ws[i])
        ax.set_title(f"step {i}")
        return [im]

    anim = animation.FuncAnimation(fig, update, frames=len(ws),
                                   interval=interval, blit=False)
    if save_path:
        anim.save(save_path, writer="pillow")
        plt.close(fig)
    return anim


def plot_graph_with_attention(edge_index, attention_weights=None,
                              node_ids: Optional[Sequence[int]] = None,
                              node_values=None,
                              title: str = "Graph attention",
                              save_path: Optional[str] = None):
    """Draw the snapshot graph with edges weighted by attention
    (attention_vis.py:760)."""
    import networkx as nx
    ei = _to_np(edge_index)
    g = nx.DiGraph()
    nodes = node_ids if node_ids is not None \
        else sorted(set(ei[0]) | set(ei[1]))
    g.add_nodes_from(nodes)
    weights = None
    if attention_weights is not None:
        weights = _to_np(attention_weights).reshape(-1)
    for e in range(ei.shape[1]):
        w = float(weights[e]) if weights is not None \
            and e < len(weights) else 1.0
        g.add_edge(int(ei[0, e]), int(ei[1, e]), weight=w)
    pos = nx.spring_layout(g, seed=0)
    fig, ax = plt.subplots(figsize=(6, 5))
    ew = [g[u][v]["weight"] for u, v in g.edges()]
    ew = np.asarray(ew)
    ew = 0.5 + 3.0 * (ew - ew.min()) / (np.ptp(ew) + 1e-9) \
        if len(ew) else []
    nc = _to_np(node_values) if node_values is not None else "tab:blue"
    nx.draw_networkx(g, pos, ax=ax, width=list(ew), node_color=nc,
                     node_size=250, arrows=True, with_labels=True,
                     font_size=7, cmap="viridis")
    ax.set_title(title)
    ax.axis("off")
    if save_path:
        fig.savefig(save_path, dpi=120)
        plt.close(fig)
    return fig
