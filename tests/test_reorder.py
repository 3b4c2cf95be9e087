"""RCM locality slot ordering: semantics-invariant, block-sparser."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import tagan_tpu as tt
from tagan_tpu.data.synthetic import create_synthetic_data
from tagan_tpu.ops.pallas.flash_geometric import occupied_blocks_bound


def _banded_shuffled_snapshots(n=96, band=3, T=3, seed=0):
    """A path/banded graph with shuffled IDs — worst case for sorted-ID
    slots, ideal for RCM."""
    rng = np.random.default_rng(seed)
    perm = rng.permutation(n)
    snaps = []
    for t in range(T):
        src, dst = [], []
        for i in range(n - 1):
            for j in range(i + 1, min(i + 1 + band, n)):
                src.append(perm[i]); dst.append(perm[j])
        ids = list(perm)
        pos = {nid: p for p, nid in enumerate(ids)}
        ei = np.asarray([[pos[s] for s in src], [pos[d] for d in dst]],
                        np.int64)
        x = rng.standard_normal((n, 8)).astype(np.float32)
        snaps.append({"x": x, "edge_index": ei, "edge_attr": None,
                      "node_ids": ids, "timestep": float(t)})
    return snaps


def test_rcm_reorder_is_semantics_invariant():
    snaps = _banded_shuffled_snapshots()
    cfg = tt.TAGANConfig(hidden_dim=16, num_heads=2, num_layers=1,
                         node_feature_dim=8, edge_feature_dim=0,
                         output_dim=1, loss_type="bce", dropout=0.0)
    m = tt.TAGAN(cfg)
    p = m.init(jax.random.key(0))
    s_plain = tt.build_sequence(snaps)
    s_rcm = tt.build_sequence(snaps, reorder="rcm")
    lab = jnp.asarray(1.0)
    o1 = jax.jit(lambda pp, s: m(pp, s, lab))(p, s_plain)
    o2 = jax.jit(lambda pp, s: m(pp, s, lab))(p, s_rcm)
    np.testing.assert_allclose(np.asarray(o1.logits), np.asarray(o2.logits),
                               rtol=1e-4, atol=1e-5)
    # node_ids cover the same set
    assert set(np.asarray(s_plain.node_ids).tolist()) \
        == set(np.asarray(s_rcm.node_ids).tolist())
    # per-slot features permute consistently with node_ids
    ids1 = np.asarray(s_plain.node_ids)
    ids2 = np.asarray(s_rcm.node_ids)
    x1 = np.asarray(s_plain.x)
    x2 = np.asarray(s_rcm.x)
    lookup = {nid: i for i, nid in enumerate(ids1) if nid >= 0}
    for s2, nid in enumerate(ids2):
        if nid >= 0:
            np.testing.assert_array_equal(x2[:, s2], x1[:, lookup[nid]])


def test_rcm_reduces_block_occupancy():
    snaps = _banded_shuffled_snapshots()
    s_plain = tt.build_sequence(snaps)
    s_rcm = tt.build_sequence(snaps, reorder="rcm")

    def occ(seq):
        n = seq.x.shape[1]
        m = np.zeros((n, n), bool)
        es = np.asarray(seq.edge_src[0]); ed = np.asarray(seq.edge_dst[0])
        em = np.asarray(seq.edge_mask[0])
        m[es[em], ed[em]] = True
        np.fill_diagonal(m, True)
        return occupied_blocks_bound(m, 16, 16)

    assert occ(s_rcm) < occ(s_plain), (occ(s_rcm), occ(s_plain))
    assert occ(s_rcm) <= 3   # banded graph -> near-diagonal blocks


def test_rcm_reorder_dynamic_churn_invariant():
    """Invariance also holds with node churn (memory machinery active)."""
    from tagan_tpu.data.synthetic import create_dynamic_synthetic_data
    data = create_dynamic_synthetic_data(num_samples=1,
                                         num_nodes_range=(10, 12),
                                         node_feature_dim=8,
                                         sequence_length=5, seed=4)
    snaps = data[0][0]
    cfg = tt.TAGANConfig(hidden_dim=16, num_heads=2, num_layers=1,
                         node_feature_dim=8, edge_feature_dim=0,
                         output_dim=1, loss_type="bce", dropout=0.0)
    m = tt.TAGAN(cfg)
    p = m.init(jax.random.key(1))
    lab = jnp.asarray(0.0)
    o1 = jax.jit(lambda pp, s: m(pp, s, lab))(p, tt.build_sequence(snaps))
    o2 = jax.jit(lambda pp, s: m(pp, s, lab))(
        p, tt.build_sequence(snaps, reorder="rcm"))
    np.testing.assert_allclose(np.asarray(o1.logits), np.asarray(o2.logits),
                               rtol=1e-4, atol=1e-5)


def test_temporal_asymmetry_invariant():
    """The core 'asymmetric' property (debug_tagan.py:341-494 diagnostic
    as an invariant): with future_discount < 1 the temporal attention
    matrix is measurably asymmetric, and past positions receive more
    mass than future ones at the default init."""
    from tagan_tpu.nn.temporal_attention import AsymmetricTemporalAttention
    T, Hd = 9, 16
    attn = AsymmetricTemporalAttention(hidden_dim=Hd, num_heads=2,
                                       dropout=0.0, future_discount=0.5,
                                       time_aware=False,
                                       orient_past_high=True)
    p = attn.init(jax.random.key(0))
    x = jnp.asarray(np.random.default_rng(0).standard_normal((3, T, Hd)),
                    jnp.float32)
    _, w = attn(p, x, return_weights=True)   # [B, H, T, T]
    w = np.asarray(w).mean(axis=(0, 1))
    asym = np.abs(w - w.T).mean()
    assert asym > 1e-3, f"attention unexpectedly symmetric ({asym})"
    # with content scores silenced (x=0 -> uniform QK logits) the
    # asymmetric kernel alone sets the mass: past must beat future
    _, w0 = attn(p, jnp.zeros_like(x), return_weights=True)
    w0 = np.asarray(w0).mean(axis=(0, 1))
    mid = T // 2
    past = w0[mid, :mid].sum()
    future = w0[mid, mid + 1:].sum()
    assert past > future, (past, future)


def test_asymmetric_kernel_orientation_flag():
    """B11: default replicates the reference's flipped init; the flag
    realizes the documented intent (mirror tables)."""
    from tagan_tpu.nn.temporal_attention import AsymmetricTemporalAttention
    a = AsymmetricTemporalAttention(hidden_dim=16, num_heads=2,
                                    future_discount=0.5)
    b = AsymmetricTemporalAttention(hidden_dim=16, num_heads=2,
                                    future_discount=0.5,
                                    orient_past_high=True)
    ka = np.asarray(a._init_asymmetric_kernel())
    kb = np.asarray(b._init_asymmetric_kernel())
    np.testing.assert_allclose(ka, kb[::-1])
    w = a.asymmetric_window_size
    # flag=True: rel>0 (past keys) side holds the undivided weights
    assert kb[w + 1, 0] > kb[w - 1, 0]
    assert ka[w + 1, 0] < ka[w - 1, 0]
