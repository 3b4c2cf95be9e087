"""TGN-style temporal interaction stream loading + sequence building."""

import os

import numpy as np
import pytest

import tagan_tpu as tt
from tagan_tpu.data import (create_tgn_synthetic, load_jodie_csv,
                            stream_to_sequences)


@pytest.fixture(scope="module")
def stream():
    return create_tgn_synthetic(num_users=200, num_items=100,
                                num_events=5000, seed=0)


def test_synthetic_stream_shape(stream):
    assert stream.num_events == 5000
    assert np.all(np.diff(stream.t) >= 0)
    assert stream.src.max() < 200
    assert stream.dst.min() >= 200          # bipartite offset
    assert stream.edge_feat.shape == (5000, 4)


def test_jodie_roundtrip(tmp_path, stream):
    path = os.path.join(tmp_path, "jodie.csv")
    with open(path, "w") as f:
        f.write("user_id,item_id,timestamp,state_label,f0,f1,f2,f3\n")
        for e in range(200):
            feats = ",".join(f"{v:.6f}" for v in stream.edge_feat[e])
            f.write(f"{stream.src[e]},{stream.dst[e] - 200},"
                    f"{stream.t[e]:.3f},{stream.label[e]},{feats}\n")
    loaded = load_jodie_csv(path)
    assert loaded.num_events == 200
    np.testing.assert_array_equal(loaded.src, stream.src[:200])
    # item offset re-derived from max user id in the sample
    assert loaded.dst.min() >= loaded.src.max() + 1
    # features go through %.6f text formatting: absolute-only tolerance
    np.testing.assert_allclose(loaded.edge_feat, stream.edge_feat[:200],
                               rtol=0, atol=1e-5)


def test_stream_to_sequences(stream):
    ds = stream_to_sequences(stream, num_snapshots=5, max_degree=8,
                             max_sequences=6)
    assert len(ds) > 0
    seq, label = ds[0]
    assert 2 <= len(seq) <= 5
    for snap in seq:
        assert snap["x"].shape[1] == 8
        assert snap["edge_index"].shape[0] == 2
        # recency sampling: every kept event has at least one endpoint
        # under the cap, so total events are bounded by nodes * cap
        n_events = snap["edge_index"].shape[1] // 2  # bidirectional
        assert n_events <= len(snap["node_ids"]) * 8


def test_sequences_feed_model(stream):
    import jax
    import jax.numpy as jnp
    from tagan_tpu.nn.model import TAGAN
    ds = stream_to_sequences(stream, num_snapshots=4, max_degree=4,
                             max_sequences=2)
    T, N, E, Fe = tt.pad_dims_for(ds.sequences)
    seq = tt.build_sequence(ds.sequences[0], max_nodes=N,
                            max_edges=max(E, 1), max_time=T)
    cfg = tt.TAGANConfig(hidden_dim=16, num_heads=2, num_layers=1,
                         node_feature_dim=8, edge_feature_dim=Fe,
                         output_dim=1, loss_type="bce", dropout=0.0)
    model = TAGAN(cfg)
    params = model.init(jax.random.key(0))
    loss = jax.jit(lambda p, s: model(p, s, jnp.asarray(1.0)).loss)(
        params, seq)
    assert np.isfinite(float(loss))
