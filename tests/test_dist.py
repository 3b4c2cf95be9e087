"""Distributed (SPMD) correctness on the virtual 8-device CPU mesh:
the sharded train step must match the single-device step numerically,
and shardings must actually propagate.
"""

import jax
import jax.numpy as jnp
import numpy as np
import optax
import pytest

import tagan_tpu as tt
from tagan_tpu.data.synthetic import create_synthetic_data
from tagan_tpu.dist import (make_mesh, make_train_step, make_eval_step,
                            shard_batch)
from tagan_tpu.nn.model import TAGAN, batched_forward

pytestmark = pytest.mark.skipif(len(jax.devices()) < 8,
                                reason="needs 8 (virtual) devices")


@pytest.fixture(scope="module")
def setup():
    cfg = tt.TAGANConfig(hidden_dim=16, num_heads=2, num_layers=1,
                         node_feature_dim=8, output_dim=1,
                         loss_type="bce", dropout=0.0)
    model = TAGAN(cfg)
    params = model.init(jax.random.key(0))
    data = create_synthetic_data(num_samples=8, num_nodes_range=(6, 10),
                                 node_feature_dim=8, edge_feature_dim=0,
                                 sequence_length=3, seed=0)
    T, N, E, _ = tt.pad_dims_for([s for s, _ in data])
    N = 12  # divisible-friendly slot count for the graph axis
    batch = tt.batch_sequences(
        [tt.build_sequence(s, max_nodes=N, max_edges=E, max_time=T)
         for s, _ in data])
    labels = jnp.asarray([l for _, l in data], jnp.float32)
    return model, params, batch, labels


@pytest.mark.parametrize("mesh_shape", [(4, 2), (8, 1), (2, 4)])
def test_spmd_matches_single_device(setup, mesh_shape):
    model, params, batch, labels = setup
    data_ax, graph_ax = mesh_shape
    mesh = make_mesh(data=data_ax, graph=graph_ax)
    tx = optax.adam(1e-3)
    opt_state = tx.init(params)

    step = make_train_step(model, tx, mesh)
    sb = shard_batch(mesh, batch)
    p1, o1, loss_spmd = step(params, opt_state, sb, labels)

    # single-device oracle
    def loss_fn(p):
        return batched_forward(model, p, batch, labels).loss
    loss_ref, grads = jax.value_and_grad(loss_fn)(params)
    updates, _ = tx.update(grads, opt_state, params)
    p_ref = optax.apply_updates(params, updates)

    np.testing.assert_allclose(float(loss_spmd), float(loss_ref),
                               rtol=1e-5, atol=1e-6)
    # Adam normalizes by sqrt(v): on near-zero first-step gradients, fp32
    # reduction-order differences between the psum'd mesh gradient and
    # the single-device gradient are amplified to O(update). Compare
    # parameters in absolute terms (one update is <= lr = 1e-3).
    for a, b in zip(jax.tree_util.tree_leaves(p1),
                    jax.tree_util.tree_leaves(p_ref)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=0.0, atol=5e-4)


def test_eval_step(setup):
    model, params, batch, labels = setup
    mesh = make_mesh(data=4, graph=2)
    ev = make_eval_step(model, mesh)
    loss, preds = ev(params, shard_batch(mesh, batch), labels)
    ref = batched_forward(model, params, batch, labels)
    np.testing.assert_allclose(float(loss), float(ref.loss), rtol=1e-5,
                               atol=1e-6)
    np.testing.assert_allclose(np.asarray(preds),
                               np.asarray(ref.predictions), rtol=1e-4,
                               atol=1e-5)


def test_batch_is_actually_sharded(setup):
    model, params, batch, labels = setup
    mesh = make_mesh(data=4, graph=2)
    sb = shard_batch(mesh, batch)
    sh = sb.x.sharding
    # batch axis split 4 ways, node axis 2 ways
    assert sh.shard_shape(sb.x.shape)[0] == sb.x.shape[0] // 4
    assert sh.shard_shape(sb.x.shape)[2] == sb.x.shape[2] // 2


def test_trainer_with_mesh_matches_single_device():
    """TAGANTrainer(mesh=...) trains the same trajectory as the
    single-device trainer (GSPMD data+graph sharding is math-invariant)."""
    import numpy as np
    import tagan_tpu as tt
    from tagan_tpu.data import TemporalGraphDataset, TemporalGraphDataLoader
    from tagan_tpu.data.synthetic import create_synthetic_data
    from tagan_tpu.train import TAGANTrainer
    from tagan_tpu.dist.mesh import make_mesh

    data = create_synthetic_data(num_samples=16, num_nodes_range=(6, 8),
                                 node_feature_dim=8, edge_feature_dim=0,
                                 sequence_length=3, balanced=True, seed=2)
    ds = TemporalGraphDataset(data)
    cfg = tt.TAGANConfig(hidden_dim=16, num_heads=2, num_layers=1,
                         node_feature_dim=8, edge_feature_dim=0,
                         output_dim=1, loss_type="bce", dropout=0.0,
                         learning_rate=5e-3)
    model = tt.TAGAN(cfg)
    exp = tt.ExperimentConfig(model=cfg, batch_size=8, num_epochs=1)
    loader = TemporalGraphDataLoader(ds, batch_size=8)

    t_single = TAGANTrainer(model, exp)
    p0, rng0 = t_single.params, t_single.rng
    t_mesh = TAGANTrainer(model, exp, params=p0, rng=rng0,
                          mesh=make_mesh(data=2, graph=4))
    l1, m1 = t_single._run_epoch(loader, True)
    l2, m2 = t_mesh._run_epoch(loader, True)
    assert abs(l1 - l2) < 1e-5
    # params: Adam's g/(sqrt(v)+eps) amplifies cross-shard reduction-
    # order noise on near-zero grads, so allow per-step drift O(1e-4·lr)
    for a, b in zip(jax.tree_util.tree_leaves(t_single.params),
                    jax.tree_util.tree_leaves(t_mesh.params)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   atol=1e-3)
    assert m1["accuracy"] == m2["accuracy"]
    # fused-epoch path under the mesh too
    t_mesh2 = TAGANTrainer(model, exp.replace(fused_epochs=True),
                           params=p0, rng=rng0,
                           mesh=make_mesh(data=2, graph=4))
    l3, _ = t_mesh2._run_epoch(loader, True)
    assert abs(l1 - l3) < 1e-5
