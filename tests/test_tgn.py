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


def test_node_pooling_variants():
    """node_pooling mean/max/attention/logit all run; the non-mean
    variants actually change the readout (the mean is the reference's
    hardwired pooling, model.py:377-427; "logit" is the per-node
    MIL readout)."""
    import jax
    import jax.numpy as jnp
    from tagan_tpu.nn.model import TAGAN
    rng = np.random.default_rng(3)
    N, T, F = 20, 4, 8
    snaps = [{"x": rng.standard_normal((N, F)).astype(np.float32),
              "edge_index": np.stack([rng.integers(0, N, 40),
                                      rng.integers(0, N, 40)]),
              "node_ids": list(range(N)), "timestep": float(t)}
             for t in range(T)]
    seq = tt.build_sequence(snaps, max_nodes=N, max_edges=40, max_time=T)
    outs = {}
    for pool in ("mean", "max", "attention", "logit"):
        cfg = tt.TAGANConfig(hidden_dim=16, num_heads=2, num_layers=1,
                             node_feature_dim=F, output_dim=1,
                             loss_type="bce", dropout=0.0,
                             node_pooling=pool)
        model = TAGAN(cfg)
        params = model.init(jax.random.key(0))
        if pool == "attention":
            assert "node_pool" in params
        out = model(params, seq, jnp.asarray(1.0))
        assert np.isfinite(float(out.loss))
        g = jax.grad(lambda p: model(p, seq, jnp.asarray(1.0)).loss)(
            params)
        leaves = jax.tree_util.tree_leaves(g)
        assert all(np.isfinite(np.asarray(l)).all() for l in leaves)
        outs[pool] = float(out.logits[0])
    assert outs["mean"] != outs["max"]
    assert outs["mean"] != outs["attention"]
    assert outs["mean"] != outs["logit"]


def test_needle_task_not_all_positive_with_attention_pooling():
    """The reference ships test_bias_fix.py (:73-260) precisely to catch
    all-positive collapse; round 2's TGN result collapsed that way
    (specificity 0.0) because mean pooling dilutes a one-node burst.
    With node_pooling="attention", a short training run on a balanced
    needle task must separate the classes: not all-positive, not
    all-negative at threshold 0.5."""
    import jax
    import jax.numpy as jnp
    import optax
    from tagan_tpu.nn.model import TAGAN

    rng = np.random.default_rng(7)
    N, T, F, S = 24, 3, 6, 24
    seqs, labels = [], []
    for s in range(S):
        label = s % 2
        needle = int(rng.integers(0, N))
        snaps = []
        for t in range(T):
            x = rng.standard_normal((N, F)).astype(np.float32)
            if label:
                x[needle, 0] += 6.0        # one-node burst
            snaps.append({"x": x,
                          "edge_index": np.stack(
                              [rng.integers(0, N, 40),
                               rng.integers(0, N, 40)]),
                          "node_ids": list(range(N)),
                          "timestep": float(t)})
        seqs.append(tt.build_sequence(snaps, max_nodes=N, max_edges=40,
                                      max_time=T))
        labels.append(float(label))
    from tagan_tpu.core.graph import batch_sequences
    batch = batch_sequences(seqs)
    lbl = jnp.asarray(labels)

    cfg = tt.TAGANConfig(hidden_dim=16, num_heads=2, num_layers=1,
                         node_feature_dim=F, output_dim=1,
                         loss_type="bce", dropout=0.0,
                         learning_rate=1e-2, node_pooling="attention")
    model = TAGAN(cfg)
    params = model.init(jax.random.key(1))
    tx = optax.adam(1e-2)
    opt = tx.init(params)

    def loss_fn(p):
        out = jax.vmap(lambda s, l: model(p, s, l).loss)(batch, lbl)
        return jnp.mean(out)

    @jax.jit
    def step(p, o):
        loss, g = jax.value_and_grad(loss_fn)(p)
        up, o = tx.update(g, o, p)
        return optax.apply_updates(p, up), o, loss

    for _ in range(40):
        params, opt, loss = step(params, opt)
    preds = jax.jit(jax.vmap(
        lambda s: model(params, s, None).predictions))(batch)
    hard = np.asarray(preds).reshape(-1) > 0.5
    y = np.asarray(labels) > 0.5
    tn = int(np.sum(~hard & ~y))
    tp = int(np.sum(hard & y))
    # the reference's collapse check: neither all-positive nor
    # all-negative on balanced data
    assert tn > 0, "all-positive collapse (reference test_bias_fix.py)"
    assert tp > 0, "all-negative collapse"
    assert float(loss) < 0.5


def test_difficulty_dials_decoys_and_label_noise():
    """Round-5 re-arm (VERDICT r4 weak #4): decoy bursts carry the
    activity spike WITHOUT the feature shift and label 0; per-burst
    label noise silently unlabels whole real bursts; base events are
    untouched."""
    base = create_tgn_synthetic(
        num_users=300, num_items=100, num_events=4000,
        state_change_rate=0.0, num_churn_bursts=10, burst_len=20,
        burst_feat_shift=3.0, seed=3)
    armed = create_tgn_synthetic(
        num_users=300, num_items=100, num_events=4000,
        state_change_rate=0.0, num_churn_bursts=10, burst_len=20,
        burst_feat_shift=3.0, num_decoy_bursts=10,
        decoy_feat_shift=0.0, burst_label_noise=0.5, seed=3)
    n_base = 4000
    # decoys add events (the stream re-sorts by time, so select by
    # label/feature, not position)
    assert len(armed.src) == n_base + 20 * 20
    assert len(base.src) == n_base + 10 * 20
    lab = np.asarray(armed.label) > 0.5
    feat_mean = np.asarray(armed.edge_feat).mean(axis=1)
    # labeled positives are real bursts: features carry the shift
    assert feat_mean[lab].mean() > 1.5
    # shifted events ~= the 10 real bursts only (decoys stay ~N(0,1):
    # P(per-event 4-dim mean > 1.5) ~ 0.1%) — the activity spike alone
    # cannot separate classes
    shifted = feat_mean > 1.5
    assert 100 <= shifted.sum() <= 260
    # label noise: whole real bursts silently unlabeled
    pos_armed = float(lab.sum())
    pos_base = float(np.asarray(base.label).sum())
    assert 0 < pos_armed < pos_base
    assert pos_armed % 20 == 0          # bursts flip together
    # some SHIFTED events are unlabeled (the irreducible error)
    assert (shifted & ~lab).sum() >= 20
