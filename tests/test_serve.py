"""Serving subsystem: batched Predictor, streaming memory carry, and
AOT export/reload (`tagan_tpu.serve`).

The reference has no serving path (inference is eager per-sequence
`model.infer`, model.py:475-536); these tests pin the framework's
deployment contract: Predictor == direct forward, artifacts reload and
reproduce bit-identical probabilities without the model code path.
"""

import os
import tempfile

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import tagan_tpu as tt
from tagan_tpu.data import create_synthetic_data
from tagan_tpu.nn.model import TAGAN, batched_forward
from tagan_tpu.serve import (ExportedPredictor, Predictor, StreamingSession,
                             export_artifact, load_artifact)


@pytest.fixture(scope="module")
def setup():
    data = create_synthetic_data(
        num_samples=7, num_nodes_range=(6, 9), node_feature_dim=8,
        edge_feature_dim=0, sequence_length=4, num_classes=2, seed=1)
    cfg = tt.TAGANConfig(
        hidden_dim=16, num_heads=2, num_layers=1, node_feature_dim=8,
        edge_feature_dim=0, output_dim=1, loss_type="bce", dropout=0.0)
    model = TAGAN(cfg)
    params = model.init(jax.random.key(0))
    return model, params, [s for s, _ in data]


def _dims(seqs):
    return tt.pad_dims_for(seqs)


def test_predictor_matches_direct_forward(setup):
    model, params, seqs = setup
    dims = _dims(seqs)
    pred = Predictor(model, params, dims=dims, batch_size=3)
    proba = pred.predict_proba(seqs)
    assert proba.shape == (7, 1)

    # oracle: pack + batched_forward directly, all 7 in one batch
    T, N, E, Fe = dims
    built = [tt.build_sequence(s, max_nodes=N, max_edges=max(E, 1),
                               max_time=T, edge_feature_dim=Fe)
             for s in seqs]
    out = batched_forward(model, params, tt.batch_sequences(built))
    np.testing.assert_allclose(
        proba, np.asarray(out.predictions).reshape(7, -1),
        rtol=1e-5, atol=1e-6)

    # final-batch padding must not leak: batch_size 3 over 7 sequences
    # pads the last batch with a repeat of its first element
    labels = pred.predict(seqs, threshold=0.5)
    assert labels.shape == (7,)
    assert set(np.unique(labels)) <= {0, 1}


def test_predictor_prebuilt_and_auto_dims(setup):
    model, params, seqs = setup
    pred_auto = Predictor(model, params, batch_size=4)
    proba_auto = pred_auto.predict_proba(seqs)
    T, N, E, Fe = _dims(seqs)
    built = [tt.build_sequence(s, max_nodes=N, max_edges=max(E, 1),
                               max_time=T, edge_feature_dim=Fe)
             for s in seqs]
    proba_pre = pred_auto.predict_proba(tt.batch_sequences(built))
    np.testing.assert_allclose(proba_auto, proba_pre, rtol=1e-5, atol=1e-6)


def test_predictor_from_checkpoint(setup, tmp_path):
    model, params, seqs = setup
    from tagan_tpu.train import TAGANTrainer
    trainer = TAGANTrainer(model, tt.ExperimentConfig(model=model.config))
    trainer.params = params
    path = str(tmp_path / "ckpt.pkl")
    trainer.save_checkpoint(path)
    pred = Predictor.from_checkpoint(path, dims=_dims(seqs), batch_size=4)
    ref = Predictor(model, params, dims=_dims(seqs), batch_size=4)
    np.testing.assert_allclose(pred.predict_proba(seqs),
                               ref.predict_proba(seqs),
                               rtol=1e-6, atol=1e-7)


def test_streaming_session_carries_memory(setup, tmp_path):
    model, params, seqs = setup
    T, N, E, Fe = _dims(seqs)
    sess = StreamingSession(model, params, dims=(T, N, E, Fe))
    p1 = sess.update(seqs[0])
    mem_after_1 = sess.memory
    assert np.all(np.asarray(mem_after_1.valid) | True)  # pytree alive
    p2 = sess.update(seqs[1])
    assert p1.shape == p2.shape

    # memory actually evolves between chunks
    assert not np.allclose(np.asarray(mem_after_1.states),
                           np.asarray(sess.memory.states))

    # state persistence round trip
    path = str(tmp_path / "mem.npz")
    sess.save_state(path)
    states_before = np.asarray(sess.memory.states)
    sess.reset()
    assert not np.allclose(np.asarray(sess.memory.states), states_before) \
        or not states_before.any()
    sess.load_state(path)
    np.testing.assert_array_equal(np.asarray(sess.memory.states),
                                  states_before)

    # a fresh session fed the same first chunk reproduces p1 exactly
    sess2 = StreamingSession(model, params, dims=(T, N, E, Fe))
    np.testing.assert_allclose(sess2.update(seqs[0]), p1, rtol=0, atol=0)


def test_streaming_rejects_executed_mode(setup):
    model, params, seqs = setup
    cfg = tt.TAGANConfig(
        hidden_dim=16, num_heads=2, num_layers=1, node_feature_dim=8,
        edge_feature_dim=0, output_dim=1, compat_mode="executed")
    with pytest.raises(ValueError):
        StreamingSession(TAGAN(cfg), params, dims=(4, 16, 16, 0))


def test_export_artifact_roundtrip(setup, tmp_path):
    model, params, seqs = setup
    dims = _dims(seqs)
    path = str(tmp_path / "artifact")
    export_artifact(model, params, dims, path, batch_size=4,
                    platforms=("cpu",))
    assert os.path.exists(os.path.join(path, "predict.jaxexport"))
    assert os.path.exists(os.path.join(path, "params.npz"))
    assert os.path.exists(os.path.join(path, "meta.json"))

    loaded = load_artifact(path)
    assert isinstance(loaded, ExportedPredictor)
    ref = Predictor(model, params, dims=dims, batch_size=4)
    np.testing.assert_allclose(loaded.predict_proba(seqs),
                               ref.predict_proba(seqs),
                               rtol=1e-5, atol=1e-6)
    labels = loaded.predict(seqs)
    assert labels.shape == (7,)


def test_export_multiclass_predict(setup, tmp_path):
    _, _, seqs = setup
    cfg = tt.TAGANConfig(
        hidden_dim=16, num_heads=2, num_layers=1, node_feature_dim=8,
        edge_feature_dim=0, output_dim=3, loss_type="ce", dropout=0.0)
    model = TAGAN(cfg)
    params = model.init(jax.random.key(1))
    dims = _dims(seqs)
    pred = Predictor(model, params, dims=dims, batch_size=4)
    proba = pred.predict_proba(seqs)
    assert proba.shape == (7, 3)
    np.testing.assert_allclose(proba.sum(-1), 1.0, rtol=1e-5)
    labels = pred.predict(seqs)
    assert labels.shape == (7,)
    assert labels.max() < 3
