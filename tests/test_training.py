"""End-to-end training tests — the analog of the reference's
`test_bias_fix.py` (train on balanced synthetic data, assert the model
does not collapse to all-positive and actually learns) plus loader /
checkpoint / memory-carry coverage.
"""

import os
import tempfile

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import tagan_tpu as tt
from tagan_tpu.data import (TemporalGraphDataset, TemporalGraphDataLoader,
                            create_synthetic_data)
from tagan_tpu.train import TAGANTrainer, calculate_metrics


@pytest.fixture(scope="module")
def tiny_data():
    data = create_synthetic_data(
        num_samples=24, num_nodes_range=(6, 9), node_feature_dim=8,
        edge_feature_dim=0, sequence_length=4, num_classes=2,
        balanced=True, seed=0)
    return TemporalGraphDataset(data)


def _model(loss_type="bce", compat="intended"):
    cfg = tt.TAGANConfig(
        hidden_dim=16, num_heads=2, num_layers=1, node_feature_dim=8,
        edge_feature_dim=0, output_dim=1, loss_type=loss_type,
        dropout=0.0, compat_mode=compat, learning_rate=5e-3)
    from tagan_tpu.nn.model import TAGAN
    return TAGAN(cfg)


def test_loader_shapes(tiny_data):
    loader = TemporalGraphDataLoader(tiny_data, batch_size=8, shuffle=True)
    batches = list(loader)
    assert len(batches) == 3
    batch, labels, mask = batches[0]
    assert batch.x.shape[0] == 8
    assert labels.shape == (8,)
    assert bool(mask.all())
    stats = tiny_data.get_statistics()
    assert stats["num_sequences"] == 24
    assert stats["max_time_steps"] == 4


def test_training_learns_and_no_bias_collapse(tiny_data):
    """test_bias_fix.py semantics: after a few epochs on balanced data
    the model must not predict a single class for everything and train
    accuracy must beat chance."""
    model = _model()
    exp = tt.ExperimentConfig(model=model.config, batch_size=8,
                              num_epochs=8, early_stopping_patience=20)
    trainer = TAGANTrainer(model, exp)
    loader = TemporalGraphDataLoader(tiny_data, batch_size=8, shuffle=True,
                                     seed=1)
    result = trainer.train(loader, val_loader=None, verbose=False)
    assert len(result["history"]["train_loss"]) == 8
    # loss must decrease
    assert result["history"]["train_loss"][-1] < \
        result["history"]["train_loss"][0]
    eval_loader = TemporalGraphDataLoader(tiny_data, batch_size=8,
                                          shuffle=False)
    preds = trainer.predict(eval_loader)
    hard = (preds.reshape(-1) > 0.5)
    assert 0 < hard.sum() < len(hard), "collapsed to a single class"
    labels = np.asarray(tiny_data.labels, dtype=np.float64)
    m = calculate_metrics(preds.reshape(-1), labels, threshold=0.5)
    assert m["accuracy"] > 0.6, m


def test_checkpoint_roundtrip(tiny_data, tmp_path):
    model = _model()
    exp = tt.ExperimentConfig(model=model.config, batch_size=8,
                              num_epochs=1)
    trainer = TAGANTrainer(model, exp)
    loader = TemporalGraphDataLoader(tiny_data, batch_size=8)
    trainer.train(loader, verbose=False)
    path = os.path.join(tmp_path, "ckpt.pkl")
    trainer.save_checkpoint(path, metrics={"f1": 0.5})
    p_before = jax.tree_util.tree_map(np.asarray, trainer.params)

    trainer2 = TAGANTrainer(model, exp)
    metrics = trainer2.load_checkpoint(path)
    assert metrics["f1"] == 0.5
    for a, b in zip(jax.tree_util.tree_leaves(p_before),
                    jax.tree_util.tree_leaves(trainer2.params)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    # resumed trainer can continue stepping
    trainer2.train(loader, num_epochs=1, verbose=False)


def test_split(tiny_data):
    tr, va, te = tiny_data.split((0.5, 0.25, 0.25), seed=0)
    assert len(tr) + len(va) + len(te) == len(tiny_data)
    assert len(tr) == 12


def test_memory_carry_across_calls():
    """Functional memory state threads across forwards (the reference's
    persistent self.memory_bank, model.py:57-61, minus its cross-batch
    leakage by default — threading is explicit here)."""
    model = _model()
    params = model.init(jax.random.key(0))
    data = create_synthetic_data(num_samples=1, num_nodes_range=(6, 6),
                                 node_feature_dim=8, edge_feature_dim=0,
                                 sequence_length=3, seed=3)
    seq = tt.build_sequence(data[0][0])
    out1 = model(params, seq)
    assert int(out1.memory.size) > 0
    out2 = model(params, seq, memory=out1.memory)
    # carried memory changes the second pass (reappearance blending)
    assert not np.allclose(np.asarray(out1.logits),
                           np.asarray(out2.logits))
