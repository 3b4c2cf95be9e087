"""Performance visualization (reference
`/root/reference/src/tagan/visualization/performance_vis.py`, 989 LoC).
Same public surface; matplotlib implementations with plotly fallback."""

from __future__ import annotations

from typing import Dict, List, Optional, Sequence

import numpy as np

import matplotlib
matplotlib.use("Agg")
import matplotlib.pyplot as plt

try:
    import plotly.graph_objects as go
    HAS_PLOTLY = True
except ImportError:
    HAS_PLOTLY = False


def plot_performance_metrics(metrics: Dict[str, float],
                             title: str = "Metrics",
                             save_path: Optional[str] = None):
    """Bar chart of scalar metrics (performance_vis.py:23)."""
    keys = [k for k, v in metrics.items() if np.isscalar(v)
            and not isinstance(v, bool)]
    vals = [float(metrics[k]) for k in keys]
    fig, ax = plt.subplots(figsize=(max(5, 0.8 * len(keys)), 4))
    ax.bar(keys, vals, color="tab:blue")
    ax.set_title(title)
    ax.tick_params(axis="x", rotation=45)
    for i, v in enumerate(vals):
        ax.text(i, v, f"{v:.3f}", ha="center", va="bottom", fontsize=7)
    fig.tight_layout()
    if save_path:
        fig.savefig(save_path, dpi=120)
        plt.close(fig)
    return fig


def plot_confusion_matrix(y_true, y_pred, class_names=None,
                          normalize: bool = False,
                          title: str = "Confusion matrix",
                          save_path: Optional[str] = None):
    """(performance_vis.py:101)"""
    yt = np.asarray(y_true).astype(int).reshape(-1)
    yp = np.asarray(y_pred).astype(int).reshape(-1)
    n = int(max(yt.max(initial=0), yp.max(initial=0))) + 1
    cm = np.zeros((n, n))
    for a, b in zip(yt, yp):
        cm[a, b] += 1
    if normalize:
        cm = cm / np.maximum(cm.sum(axis=1, keepdims=True), 1)
    fig, ax = plt.subplots(figsize=(4 + 0.3 * n, 3.5 + 0.3 * n))
    im = ax.imshow(cm, cmap="Blues")
    fig.colorbar(im, ax=ax)
    names = class_names or [str(i) for i in range(n)]
    ax.set_xticks(range(n), names)
    ax.set_yticks(range(n), names)
    ax.set_xlabel("predicted")
    ax.set_ylabel("true")
    for i in range(n):
        for j in range(n):
            ax.text(j, i, f"{cm[i, j]:.2f}" if normalize
                    else f"{int(cm[i, j])}", ha="center", va="center",
                    color="black" if cm[i, j] < cm.max() / 2 else "white")
    ax.set_title(title)
    fig.tight_layout()
    if save_path:
        fig.savefig(save_path, dpi=120)
        plt.close(fig)
    return fig


def _roc_points(y_true, scores):
    yt = np.asarray(y_true).reshape(-1)
    sc = np.asarray(scores).reshape(-1)
    order = np.argsort(-sc)
    yt = yt[order]
    tps = np.cumsum(yt)
    fps = np.cumsum(1 - yt)
    tpr = tps / max(yt.sum(), 1)
    fpr = fps / max((1 - yt).sum(), 1)
    return np.concatenate([[0], fpr]), np.concatenate([[0], tpr])


def plot_roc_curve(y_true, scores, title: str = "ROC curve",
                   save_path: Optional[str] = None):
    """(performance_vis.py:201)"""
    fpr, tpr = _roc_points(y_true, scores)
    auc = float(np.trapezoid(tpr, fpr))
    fig, ax = plt.subplots(figsize=(5, 4.5))
    ax.plot(fpr, tpr, label=f"AUC={auc:.3f}")
    ax.plot([0, 1], [0, 1], "k--", lw=1)
    ax.set_xlabel("FPR")
    ax.set_ylabel("TPR")
    ax.legend()
    ax.set_title(title)
    if save_path:
        fig.savefig(save_path, dpi=120)
        plt.close(fig)
    return fig


def plot_precision_recall_curve(y_true, scores,
                                title: str = "Precision-recall",
                                save_path: Optional[str] = None):
    """(performance_vis.py:325)"""
    yt = np.asarray(y_true).reshape(-1)
    sc = np.asarray(scores).reshape(-1)
    order = np.argsort(-sc)
    yt = yt[order]
    tps = np.cumsum(yt)
    precision = tps / np.arange(1, len(yt) + 1)
    recall = tps / max(yt.sum(), 1)
    fig, ax = plt.subplots(figsize=(5, 4.5))
    ax.plot(recall, precision)
    ax.set_xlabel("recall")
    ax.set_ylabel("precision")
    ax.set_title(title)
    if save_path:
        fig.savefig(save_path, dpi=120)
        plt.close(fig)
    return fig


def plot_training_history(history: Dict[str, Sequence[float]],
                          title: str = "Training history",
                          save_path: Optional[str] = None):
    """Loss/metric curves per epoch (performance_vis.py:454;
    trainer.py:591-638)."""
    loss_keys = [k for k in history if "loss" in k]
    metric_keys = [k for k in history if "loss" not in k]
    n = (1 if loss_keys else 0) + (1 if metric_keys else 0)
    fig, axes = plt.subplots(1, max(n, 1), figsize=(6 * max(n, 1), 4),
                             squeeze=False)
    ax_i = 0
    if loss_keys:
        for k in loss_keys:
            axes[0][ax_i].plot(history[k], label=k)
        axes[0][ax_i].set_title("loss")
        axes[0][ax_i].legend()
        ax_i += 1
    if metric_keys:
        for k in metric_keys:
            axes[0][ax_i].plot(history[k], label=k)
        axes[0][ax_i].set_title("metrics")
        axes[0][ax_i].legend()
    fig.suptitle(title)
    fig.tight_layout()
    if save_path:
        fig.savefig(save_path, dpi=120)
        plt.close(fig)
    return fig


def plot_metric_comparison(results: Dict[str, Dict[str, float]],
                           metric_names: Optional[Sequence[str]] = None,
                           title: str = "Model comparison",
                           save_path: Optional[str] = None):
    """Grouped bars comparing runs/models (performance_vis.py:578)."""
    models = list(results.keys())
    metrics = metric_names or sorted(
        {m for r in results.values() for m in r})
    width = 0.8 / max(len(models), 1)
    fig, ax = plt.subplots(figsize=(max(6, len(metrics) * 1.2), 4))
    xs = np.arange(len(metrics))
    for i, m in enumerate(models):
        vals = [results[m].get(k, 0.0) for k in metrics]
        ax.bar(xs + i * width, vals, width, label=m)
    ax.set_xticks(xs + width * (len(models) - 1) / 2, metrics, rotation=30)
    ax.legend()
    ax.set_title(title)
    fig.tight_layout()
    if save_path:
        fig.savefig(save_path, dpi=120)
        plt.close(fig)
    return fig


def interactive_performance_plot(history: Dict[str, Sequence[float]],
                                 title: str = "Training",
                                 save_path: Optional[str] = None):
    """(performance_vis.py:685) — plotly when available."""
    if not HAS_PLOTLY:
        return plot_training_history(history, title=title,
                                     save_path=save_path)
    fig = go.Figure()
    for k, v in history.items():
        fig.add_trace(go.Scatter(y=list(v), name=k, mode="lines"))
    fig.update_layout(title=title)
    if save_path:
        fig.write_html(save_path)
    return fig


def interactive_confusion_matrix(y_true, y_pred, class_names=None,
                                 save_path: Optional[str] = None):
    """(performance_vis.py:799) — plotly when available."""
    if not HAS_PLOTLY:
        return plot_confusion_matrix(y_true, y_pred, class_names,
                                     save_path=save_path)
    yt = np.asarray(y_true).astype(int).reshape(-1)
    yp = np.asarray(y_pred).astype(int).reshape(-1)
    n = int(max(yt.max(initial=0), yp.max(initial=0))) + 1
    cm = np.zeros((n, n))
    for a, b in zip(yt, yp):
        cm[a, b] += 1
    fig = go.Figure(data=go.Heatmap(z=cm, colorscale="Blues"))
    if save_path:
        fig.write_html(save_path)
    return fig


def plot_feature_importance(model_fn, params, inputs, labels,
                            feature_axis: int = -1,
                            n_repeats: int = 3,
                            metric_fn=None,
                            feature_names: Optional[Sequence[str]] = None,
                            title: str = "Permutation importance",
                            save_path: Optional[str] = None,
                            seed: int = 0):
    """Permutation feature importance (performance_vis.py:889):
    shuffle each feature column across samples and measure metric drop.

    model_fn(params, inputs) -> predictions; metric_fn(preds, labels) ->
    scalar (default: accuracy of thresholded predictions).
    """
    rng = np.random.default_rng(seed)
    x = np.asarray(inputs)
    labels = np.asarray(labels)
    if metric_fn is None:
        def metric_fn(p, y):
            p = np.asarray(p).reshape(-1)
            return float(np.mean((p > 0.5) == (y.reshape(-1) > 0.5)))
    base = metric_fn(model_fn(params, x), labels)
    nf = x.shape[feature_axis]
    drops = []
    for f in range(nf):
        deltas = []
        for _ in range(n_repeats):
            xp = x.copy()
            idx = [slice(None)] * x.ndim
            idx[feature_axis] = f
            col = xp[tuple(idx)]
            perm = rng.permutation(col.reshape(col.shape[0], -1))
            xp[tuple(idx)] = perm.reshape(col.shape)
            deltas.append(base - metric_fn(model_fn(params, xp), labels))
        drops.append(float(np.mean(deltas)))
    fig, ax = plt.subplots(figsize=(max(5, 0.5 * nf), 4))
    names = feature_names or [str(i) for i in range(nf)]
    ax.bar(names, drops, color="tab:red")
    ax.set_ylabel("metric drop")
    ax.set_title(f"{title} (base={base:.3f})")
    ax.tick_params(axis="x", rotation=60)
    fig.tight_layout()
    if save_path:
        fig.savefig(save_path, dpi=120)
        plt.close(fig)
    return fig, dict(zip(names, drops))
