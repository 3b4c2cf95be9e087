"""spatial_backend="ring" in the full model: edge-partitioned geometric
attention over the mesh graph axis (K/V circulating via ppermute inside
a shard_map), wired through TAGAN(mesh=...) + with_ring_plan sequences.
Collective-level equivalence of the ring itself lives in
tests/test_edge_partition.py."""

import jax
import jax.numpy as jnp
import numpy as np
import optax
import pytest

import tagan_tpu as tt
from tagan_tpu.data.synthetic import (create_dynamic_synthetic_data,
                                      create_synthetic_data)
from tagan_tpu.dist.mesh import make_mesh
from tagan_tpu.nn.model import TAGAN


def _ring_setup(num_samples=2, shards=4, seed=0, churn=False, T=3):
    if churn:
        data = create_dynamic_synthetic_data(
            num_samples=num_samples, sequence_length=T,
            num_nodes_range=(9, 12), node_feature_dim=8, seed=seed)
    else:
        data = create_synthetic_data(
            num_samples=num_samples, sequence_length=T,
            num_nodes_range=(9, 12), node_feature_dim=8,
            edge_feature_dim=0, seed=seed)
    T_, N, E, _ = tt.pad_dims_for([s for s, _ in data])
    N = -(-N // shards) * shards                 # shard multiple
    seqs = [tt.build_sequence(s, max_nodes=N, max_edges=max(E, 1),
                              max_time=T_).with_ring_plan(
                shards, max_edges_per_bucket=E + N)
            for s, _ in data]
    labels = jnp.asarray([float(l) for _, l in data])
    return seqs, labels


@pytest.mark.parametrize("churn", [False, True])
def test_ring_model_matches_dense(churn):
    seqs, _ = _ring_setup(seed=1 + churn, churn=churn)
    mesh = make_mesh(data=2, graph=4)
    base = tt.TAGANConfig(hidden_dim=16, num_heads=2, num_layers=2,
                          node_feature_dim=8, output_dim=1,
                          loss_type="bce", dropout=0.0)
    dense = TAGAN(base)
    ring = TAGAN(base.replace(spatial_backend="ring"), mesh=mesh)
    params = dense.init(jax.random.key(0))
    for seq in seqs:
        d = jax.jit(lambda p, s: dense(p, s).logits)(params, seq)
        r = jax.jit(lambda p, s: ring(p, s).logits)(params, seq)
        np.testing.assert_allclose(np.asarray(d), np.asarray(r),
                                   rtol=2e-4, atol=2e-5)


@pytest.mark.parametrize("metric,learnable", [
    ("gaussian_kernel", True), ("mahalanobis", True), ("manhattan", False)])
def test_ring_metric_variants_match_dense(metric, learnable):
    """Learnable kernel metrics (sigma / low-rank mahalanobis) ride the
    ring's replicated metric-parameter operands."""
    seqs, _ = _ring_setup(num_samples=1, seed=3)
    mesh = make_mesh(data=2, graph=4)
    base = tt.TAGANConfig(hidden_dim=16, num_heads=2, num_layers=1,
                          node_feature_dim=8, output_dim=1,
                          loss_type="bce", dropout=0.0,
                          distance_metric=metric,
                          learnable_distance=learnable)
    dense = TAGAN(base)
    ring = TAGAN(base.replace(spatial_backend="ring"), mesh=mesh)
    params = dense.init(jax.random.key(0))
    d = jax.jit(lambda p, s: dense(p, s).logits)(params, seqs[0])
    r = jax.jit(lambda p, s: ring(p, s).logits)(params, seqs[0])
    np.testing.assert_allclose(np.asarray(d), np.asarray(r),
                               rtol=2e-4, atol=2e-5)


def test_ring_train_step_matches_dense():
    """One SGD step through the ring backend lands on the same params
    as the dense backend (the ring's custom softmax streaming is exact,
    so grads agree to float tolerance; SGD keeps the comparison
    proportional to the grads — Adam would amplify fp noise on
    near-zero entries)."""
    seqs, labels = _ring_setup(num_samples=2, seed=5)
    mesh = make_mesh(data=2, graph=4)
    base = tt.TAGANConfig(hidden_dim=16, num_heads=2, num_layers=2,
                          node_feature_dim=8, output_dim=1,
                          loss_type="bce", dropout=0.0)
    dense = TAGAN(base)
    ring = TAGAN(base.replace(spatial_backend="ring"), mesh=mesh)
    params = dense.init(jax.random.key(0))
    tx = optax.sgd(0.1)

    def one_step(model, params, seq, label):
        def loss_fn(p):
            return model(p, seq, label).loss
        loss, g = jax.value_and_grad(loss_fn)(params)
        upd, _ = tx.update(g, tx.init(params), params)
        return loss, optax.apply_updates(params, upd)

    l_d, p_d = jax.jit(lambda p: one_step(dense, p, seqs[0],
                                          labels[0]))(params)
    l_r, p_r = jax.jit(lambda p: one_step(ring, p, seqs[0],
                                          labels[0]))(params)
    np.testing.assert_allclose(float(l_d), float(l_r), rtol=1e-5)
    for (ka, a), (kb, b) in zip(
            jax.tree_util.tree_leaves_with_path(p_d),
            jax.tree_util.tree_leaves_with_path(p_r)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=5e-3, atol=5e-5,
                                   err_msg=str(ka))


def test_ring_batched_vmap_step():
    """Batched (vmap over sequences) forward+grad with the shard_map'd
    ring inside — the trainer's batching pattern."""
    seqs, labels = _ring_setup(num_samples=2, seed=7)
    mesh = make_mesh(data=2, graph=4)
    cfg = tt.TAGANConfig(hidden_dim=16, num_heads=2, num_layers=1,
                         node_feature_dim=8, output_dim=1,
                         loss_type="bce", dropout=0.0,
                         spatial_backend="ring")
    ring = TAGAN(cfg, mesh=mesh)
    params = ring.init(jax.random.key(0))
    batch = tt.batch_sequences(seqs)

    def loss_fn(p):
        losses = jax.vmap(lambda s, l: ring(p, s, l).loss)(batch, labels)
        return jnp.mean(losses)

    loss, g = jax.jit(jax.value_and_grad(loss_fn))(params)
    assert np.isfinite(float(loss))
    gn = sum(float(jnp.sum(jnp.abs(x)))
             for x in jax.tree_util.tree_leaves(g))
    assert np.isfinite(gn) and gn > 0


def test_ring_error_cases():
    seqs, _ = _ring_setup(num_samples=1, seed=9)
    mesh = make_mesh(data=2, graph=4)
    cfg = tt.TAGANConfig(hidden_dim=16, num_heads=2, num_layers=1,
                         node_feature_dim=8, output_dim=1,
                         loss_type="bce", spatial_backend="ring")
    # no mesh
    with pytest.raises(ValueError, match="mesh"):
        TAGAN(cfg)(TAGAN(cfg, mesh=mesh).init(jax.random.key(0)),
                   seqs[0])
    # no ring plan on the sequence
    ring = TAGAN(cfg, mesh=mesh)
    p = ring.init(jax.random.key(0))
    import dataclasses
    bare = dataclasses.replace(seqs[0], ring_eq=None, ring_ek=None,
                               ring_em=None)
    with pytest.raises(ValueError, match="with_ring_plan"):
        ring(p, bare)
    # shard-count mismatch between plan and mesh
    mesh2 = make_mesh(data=4, graph=2)
    ring2 = TAGAN(cfg, mesh=mesh2)
    with pytest.raises(ValueError, match="shards"):
        ring2(p, seqs[0])


def test_boundary_ring_matches_full_and_dense():
    """with_ring_plan(boundary=True): only each shard's boundary rows
    circulate; outputs must match both the full-chunk ring and the
    dense backend, and the traffic report must show a real reduction."""
    from tagan_tpu.dist.edge_partition import boundary_traffic_report
    seqs, _ = _ring_setup(num_samples=2, seed=13)
    mesh = make_mesh(data=2, graph=4)
    base = tt.TAGANConfig(hidden_dim=16, num_heads=2, num_layers=2,
                          node_feature_dim=8, output_dim=1,
                          loss_type="bce", dropout=0.0)
    dense = TAGAN(base)
    ring = TAGAN(base.replace(spatial_backend="ring"), mesh=mesh)
    params = dense.init(jax.random.key(0))
    for seq in seqs:
        import dataclasses as dc
        bare = dc.replace(seq, ring_eq=None, ring_ek=None, ring_em=None,
                          ring_bnd_idx=None)
        halo_seq = bare.with_ring_plan(4, boundary=True)
        assert halo_seq.ring_bnd_idx is not None
        d = jax.jit(lambda p, s: dense(p, s).logits)(params, seq)
        f = jax.jit(lambda p, s: ring(p, s).logits)(params, seq)
        h = jax.jit(lambda p, s: ring(p, s).logits)(params, halo_seq)
        np.testing.assert_allclose(np.asarray(d), np.asarray(h),
                                   rtol=2e-4, atol=2e-5)
        np.testing.assert_allclose(np.asarray(f), np.asarray(h),
                                   rtol=1e-5, atol=1e-6)
        # boundary compaction is a strict subset of the shard
        Bp = halo_seq.ring_bnd_idx.shape[-1]
        per = seq.max_nodes // 4
        assert Bp <= per
        rep = boundary_traffic_report(seq.max_nodes, 4, Bp, 2, 8,
                                      beta=Bp / per)
        assert rep["bytes_boundary_ring"] <= rep["bytes_full_ring"]


def test_boundary_ring_grads():
    """Backward through the boundary ring (take/ppermute transpose)
    matches the dense backend's grads."""
    seqs, labels = _ring_setup(num_samples=1, seed=15)
    import dataclasses as dc
    bare = dc.replace(seqs[0], ring_eq=None, ring_ek=None, ring_em=None,
                      ring_bnd_idx=None)
    halo_seq = bare.with_ring_plan(4, boundary=True)
    mesh = make_mesh(data=2, graph=4)
    base = tt.TAGANConfig(hidden_dim=16, num_heads=2, num_layers=1,
                          node_feature_dim=8, output_dim=1,
                          loss_type="bce", dropout=0.0)
    dense = TAGAN(base)
    ring = TAGAN(base.replace(spatial_backend="ring"), mesh=mesh)
    params = dense.init(jax.random.key(0))
    gd = jax.jit(jax.grad(lambda p: dense(p, seqs[0], labels[0]).loss))(
        params)
    gh = jax.jit(jax.grad(lambda p: ring(p, halo_seq, labels[0]).loss))(
        params)
    for (ka, a), (kb, b) in zip(
            jax.tree_util.tree_leaves_with_path(gd),
            jax.tree_util.tree_leaves_with_path(gh)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=5e-3, atol=1e-5,
                                   err_msg=str(ka))


@pytest.mark.parametrize("boundary", [False, True])
def test_ring_train_dropout(boundary):
    """Attention + output dropout on the ring backend (per-edge keep on
    the normalized weights, like csr/flash): stochastic forward differs
    from deterministic and between rngs; grads finite; eval mode still
    matches dense."""
    seqs, labels = _ring_setup(num_samples=1, seed=21)
    seq = seqs[0]
    if boundary:
        import dataclasses as dc
        seq = dc.replace(seq, ring_eq=None, ring_ek=None, ring_em=None,
                         ring_bnd_idx=None).with_ring_plan(
            4, boundary=True)
    mesh = make_mesh(data=2, graph=4)
    cfg = tt.TAGANConfig(hidden_dim=16, num_heads=2, num_layers=2,
                         node_feature_dim=8, output_dim=1,
                         loss_type="bce", dropout=0.4,
                         spatial_backend="ring")
    ring = TAGAN(cfg, mesh=mesh)
    dense = TAGAN(cfg.replace(spatial_backend="dense"))
    params = ring.init(jax.random.key(0))
    det = jax.jit(lambda p: ring(p, seq).logits)(params)
    d = jax.jit(lambda p: dense(p, seq).logits)(params)
    np.testing.assert_allclose(np.asarray(det), np.asarray(d),
                               rtol=2e-4, atol=2e-5)
    tr = jax.jit(lambda p, r: ring(p, seq, deterministic=False,
                                   rng=r).logits)
    t1, t2 = tr(params, jax.random.key(1)), tr(params, jax.random.key(2))
    assert not np.allclose(np.asarray(det), np.asarray(t1), atol=1e-5)
    assert not np.allclose(np.asarray(t1), np.asarray(t2), atol=1e-5)
    g = jax.jit(jax.grad(
        lambda p, r: ring(p, seq, labels[0], deterministic=False,
                          rng=r).loss))(params, jax.random.key(3))
    gn = sum(float(jnp.sum(jnp.abs(x)))
             for x in jax.tree_util.tree_leaves(g))
    assert np.isfinite(gn) and gn > 0


def _edge_feature_setup(shards=4, seed=31, num_samples=2):
    data = create_synthetic_data(
        num_samples=num_samples, sequence_length=3,
        num_nodes_range=(9, 12), node_feature_dim=8,
        edge_feature_dim=4, seed=seed)
    T_, N, E, Fe = tt.pad_dims_for([s for s, _ in data])
    N = -(-N // shards) * shards
    seqs = [tt.build_sequence(s, max_nodes=N, max_edges=max(E, 1),
                              max_time=T_, edge_feature_dim=Fe)
            for s, _ in data]
    labels = jnp.asarray([float(l) for _, l in data])
    return seqs, labels, Fe


@pytest.mark.parametrize("boundary", [False, True])
def test_ring_edge_bias_matches_dense(boundary):
    """use_edge_features on the ring backend: the per-edge bias values
    circulate through the bucket provenance (ring_esrc) and the biased
    ring runs the dense path's double softmax in two passes — logits
    match the dense backend (VERDICT r2 item 4)."""
    seqs, _, Fe = _edge_feature_setup(seed=31 + boundary)
    seqs = [s.with_ring_plan(4, boundary=boundary) for s in seqs]
    mesh = make_mesh(data=2, graph=4)
    base = tt.TAGANConfig(hidden_dim=16, num_heads=2, num_layers=2,
                          node_feature_dim=8, edge_feature_dim=Fe,
                          use_edge_features=True, output_dim=1,
                          loss_type="bce", dropout=0.0)
    dense = TAGAN(base)
    ring = TAGAN(base.replace(spatial_backend="ring"), mesh=mesh)
    params = dense.init(jax.random.key(0))
    for seq in seqs:
        d = jax.jit(lambda p, s: dense(p, s).logits)(params, seq)
        r = jax.jit(lambda p, s: ring(p, s).logits)(params, seq)
        np.testing.assert_allclose(np.asarray(d), np.asarray(r),
                                   rtol=2e-4, atol=2e-5)


def test_ring_edge_bias_train_step_matches_dense():
    """One SGD step with edge bias active: grads through the two-pass
    biased ring (incl. the edge-embedding and per-layer bias linears)
    agree with the dense path."""
    seqs, labels, Fe = _edge_feature_setup(seed=37, num_samples=1)
    seqs = [s.with_ring_plan(4) for s in seqs]
    mesh = make_mesh(data=2, graph=4)
    base = tt.TAGANConfig(hidden_dim=16, num_heads=2, num_layers=2,
                          node_feature_dim=8, edge_feature_dim=Fe,
                          use_edge_features=True, output_dim=1,
                          loss_type="bce", dropout=0.0)
    dense = TAGAN(base)
    ring = TAGAN(base.replace(spatial_backend="ring"), mesh=mesh)
    params = dense.init(jax.random.key(0))
    tx = optax.sgd(0.1)

    def one_step(model, params, seq, label):
        def loss_fn(p):
            return model(p, seq, label).loss
        loss, g = jax.value_and_grad(loss_fn)(params)
        upd, _ = tx.update(g, tx.init(params), params)
        return loss, optax.apply_updates(params, upd)

    l_d, p_d = jax.jit(lambda p: one_step(dense, p, seqs[0],
                                          labels[0]))(params)
    l_r, p_r = jax.jit(lambda p: one_step(ring, p, seqs[0],
                                          labels[0]))(params)
    np.testing.assert_allclose(float(l_d), float(l_r), rtol=1e-5)
    for (ka, a), (kb, b) in zip(
            jax.tree_util.tree_leaves_with_path(p_d),
            jax.tree_util.tree_leaves_with_path(p_r)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=5e-3, atol=5e-5,
                                   err_msg=str(ka))


@pytest.mark.parametrize("boundary", [False, True])
def test_ring_edge_bias_dropout(boundary):
    """Biased ring in train mode: two keep masks (between softmaxes +
    final weights) — stochastic forward differs per rng, eval matches
    dense, grads finite. ``boundary=True`` pins the boundary-ring's
    keep_l[0/1, :, 0, src] indexing under keep2_spec (ADVICE r3)."""
    seqs, labels, Fe = _edge_feature_setup(seed=41, num_samples=1)
    seq = seqs[0].with_ring_plan(4, boundary=boundary)
    mesh = make_mesh(data=2, graph=4)
    cfg = tt.TAGANConfig(hidden_dim=16, num_heads=2, num_layers=2,
                         node_feature_dim=8, edge_feature_dim=Fe,
                         use_edge_features=True, output_dim=1,
                         loss_type="bce", dropout=0.4,
                         spatial_backend="ring")
    ring = TAGAN(cfg, mesh=mesh)
    dense = TAGAN(cfg.replace(spatial_backend="dense"))
    params = ring.init(jax.random.key(0))
    det = jax.jit(lambda p: ring(p, seq).logits)(params)
    d = jax.jit(lambda p: dense(p, seq).logits)(params)
    np.testing.assert_allclose(np.asarray(det), np.asarray(d),
                               rtol=2e-4, atol=2e-5)
    tr = jax.jit(lambda p, r: ring(p, seq, deterministic=False,
                                   rng=r).logits)
    t1, t2 = tr(params, jax.random.key(1)), tr(params, jax.random.key(2))
    assert not np.allclose(np.asarray(det), np.asarray(t1), atol=1e-5)
    assert not np.allclose(np.asarray(t1), np.asarray(t2), atol=1e-5)
    g = jax.jit(jax.grad(
        lambda p, r: ring(p, seq, labels[0], deterministic=False,
                          rng=r).loss))(params, jax.random.key(3))
    gn = sum(float(jnp.sum(jnp.abs(x)))
             for x in jax.tree_util.tree_leaves(g))
    assert np.isfinite(gn) and gn > 0


def test_ring_flash_local_path_runs_and_matches_dense():
    """VERDICT r3 item 1: with a boundary plan, the ring backend's local
    math must go through the flash Pallas kernel (diagonal buckets) +
    scatter-free padded boundary folds — asserted by counting pallas
    calls — and stay exactly parity with the dense backend (logits and
    grads)."""
    import jax.experimental.pallas as pl
    import jax.flatten_util  # noqa: F401 (before use — a late import
    #                          would shadow the module-level `jax`)
    import tagan_tpu.ops.pallas.flash_geometric as FG2
    calls = []
    orig = pl.pallas_call

    def probe(*a, **kw):
        calls.append(1)
        kw.setdefault("interpret", True)
        return orig(*a, **kw)

    old = FG2.pl.pallas_call
    FG2.pl.pallas_call = probe
    try:
        data = create_synthetic_data(
            num_samples=1, sequence_length=3, num_nodes_range=(9, 12),
            node_feature_dim=8, edge_feature_dim=0, seed=5)
        T, N, E, _ = tt.pad_dims_for([s for s, _ in data])
        N = -(-N // 4) * 4
        seq = tt.build_sequence(
            data[0][0], max_nodes=N, max_edges=max(E, 1),
            max_time=T).with_ring_plan(4, boundary=True)
        assert seq.ring_flash_diag is not None
        assert seq.ring_flash_off is not None
        mesh = make_mesh(data=2, graph=4)
        cfg = tt.TAGANConfig(hidden_dim=16, num_heads=2, num_layers=2,
                             node_feature_dim=8, output_dim=1,
                             loss_type="bce", dropout=0.0,
                             spatial_backend="ring")
        ring = TAGAN(cfg, mesh=mesh)
        dense = TAGAN(cfg.replace(spatial_backend="dense"))
        params = ring.init(jax.random.key(0))
        r = ring(params, seq).logits
        assert len(calls) >= cfg.num_layers   # flash kernel per layer
        d = dense(params, seq).logits
        np.testing.assert_allclose(np.asarray(r), np.asarray(d),
                                   rtol=2e-4, atol=2e-5)
        g = jax.grad(lambda p: ring(p, seq, jnp.asarray(1.0)).loss)(
            params)
        gd = jax.grad(lambda p: dense(p, seq, jnp.asarray(1.0)).loss)(
            params)
        fr, _ = jax.flatten_util.ravel_pytree(g)
        fd, _ = jax.flatten_util.ravel_pytree(gd)
        assert np.isfinite(np.asarray(fr)).all()
        np.testing.assert_allclose(np.asarray(fr), np.asarray(fd),
                                   rtol=5e-3, atol=5e-5)
    finally:
        FG2.pl.pallas_call = old


def test_ring_flash_local_biased_path_runs_and_matches_dense():
    """Round 5 (VERDICT r4 item 2): with edge features ON and a
    boundary plan, the biased ring's local math must go through the
    flash Pallas kernels (asserted by counting pallas calls — the
    biased path launches the lse1 + biased-main walks per layer) and
    match the dense double softmax (logits, one SGD step of grads)."""
    import jax.experimental.pallas as pl
    import jax.flatten_util  # noqa: F401
    import tagan_tpu.ops.pallas.flash_geometric as FG2
    calls = []
    orig = pl.pallas_call

    def probe(*a, **kw):
        calls.append(1)
        kw.setdefault("interpret", True)
        return orig(*a, **kw)

    old = FG2.pl.pallas_call
    FG2.pl.pallas_call = probe
    try:
        seqs, labels, Fe = _edge_feature_setup(seed=53, num_samples=1)
        seq = seqs[0].with_ring_plan(4, boundary=True)
        assert len(seq.ring_flash_diag) >= 8      # eslot provenance
        assert len(seq.ring_flash_off) >= 6       # obid provenance
        mesh = make_mesh(data=2, graph=4)
        cfg = tt.TAGANConfig(hidden_dim=16, num_heads=2, num_layers=2,
                             node_feature_dim=8, edge_feature_dim=Fe,
                             use_edge_features=True, output_dim=1,
                             loss_type="bce", dropout=0.0,
                             spatial_backend="ring")
        ring = TAGAN(cfg, mesh=mesh)
        dense = TAGAN(cfg.replace(spatial_backend="dense"))
        params = ring.init(jax.random.key(0))
        calls.clear()
        r = ring(params, seq).logits
        assert len(calls) >= cfg.num_layers   # flash kernels per layer
        d = dense(params, seq).logits
        np.testing.assert_allclose(np.asarray(r), np.asarray(d),
                                   rtol=2e-4, atol=2e-5)
        g = jax.grad(lambda p: ring(p, seq, labels[0]).loss)(params)
        gd = jax.grad(lambda p: dense(p, seq, labels[0]).loss)(params)
        fr, _ = jax.flatten_util.ravel_pytree(g)
        fd, _ = jax.flatten_util.ravel_pytree(gd)
        assert np.isfinite(np.asarray(fr)).all()
        np.testing.assert_allclose(np.asarray(fr), np.asarray(fd),
                                   rtol=5e-3, atol=5e-5)
    finally:
        FG2.pl.pallas_call = old


def test_ring_flash_local_dropout():
    """Flash-local ring in train mode: in-kernel band dropout (per-shard
    seeds) + padded-fold keep factors — eval matches dense, stochastic
    differs, grads finite."""
    data = create_synthetic_data(
        num_samples=1, sequence_length=3, num_nodes_range=(9, 12),
        node_feature_dim=8, edge_feature_dim=0, seed=11)
    T, N, E, _ = tt.pad_dims_for([s for s, _ in data])
    N = -(-N // 4) * 4
    seq = tt.build_sequence(
        data[0][0], max_nodes=N, max_edges=max(E, 1),
        max_time=T).with_ring_plan(4, boundary=True)
    mesh = make_mesh(data=2, graph=4)
    cfg = tt.TAGANConfig(hidden_dim=16, num_heads=2, num_layers=2,
                         node_feature_dim=8, output_dim=1,
                         loss_type="bce", dropout=0.4,
                         spatial_backend="ring")
    ring = TAGAN(cfg, mesh=mesh)
    dense = TAGAN(cfg.replace(spatial_backend="dense"))
    params = ring.init(jax.random.key(0))
    det = jax.jit(lambda p: ring(p, seq).logits)(params)
    d = jax.jit(lambda p: dense(p, seq).logits)(params)
    np.testing.assert_allclose(np.asarray(det), np.asarray(d),
                               rtol=2e-4, atol=2e-5)
    tr = jax.jit(lambda p, r: ring(p, seq, deterministic=False,
                                   rng=r).logits)
    t1, t2 = tr(params, jax.random.key(1)), tr(params, jax.random.key(2))
    assert not np.allclose(np.asarray(det), np.asarray(t1), atol=1e-5)
    assert not np.allclose(np.asarray(t1), np.asarray(t2), atol=1e-5)
    g = jax.jit(jax.grad(
        lambda p, r: ring(p, seq, jnp.asarray(1.0), deterministic=False,
                          rng=r).loss))(params, jax.random.key(3))
    gn = sum(float(jnp.sum(jnp.abs(x)))
             for x in jax.tree_util.tree_leaves(g))
    assert np.isfinite(gn) and gn > 0
