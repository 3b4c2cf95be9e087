"""Native C++ packer vs the pure-Python oracle."""

import numpy as np
import pytest

import tagan_tpu as tt
from tagan_tpu import native
from tagan_tpu.data.synthetic import (create_dynamic_synthetic_data,
                                      create_synthetic_data)

pytestmark = pytest.mark.skipif(not native.is_available(),
                                reason="native packer not built")


def _compare(seq_raw, **dims):
    py = tt.build_sequence(seq_raw, use_native=False, **dims)
    nat = tt.build_sequence(seq_raw, use_native=True, **dims)
    for name in ("x", "node_mask", "adj", "edge_src", "edge_dst",
                 "edge_mask", "edge_attr", "times", "time_mask",
                 "node_ids"):
        a, b = np.asarray(getattr(py, name)), np.asarray(getattr(nat, name))
        np.testing.assert_array_equal(a, b, err_msg=name)


def test_pack_matches_python_static_nodes():
    data = create_synthetic_data(num_samples=3, sequence_length=4,
                                 node_feature_dim=6, edge_feature_dim=3,
                                 seed=0)
    for seq_raw, _ in data:
        _compare(seq_raw, max_nodes=24, max_edges=80, max_time=5)


def test_pack_matches_python_churn():
    data = create_dynamic_synthetic_data(num_samples=3, sequence_length=6,
                                         num_nodes_range=(8, 12),
                                         node_feature_dim=5, seed=1)
    T, N, E, Fe = tt.pad_dims_for([s for s, _ in data])
    for seq_raw, _ in data:
        _compare(seq_raw, max_nodes=N, max_edges=max(E, 1), max_time=T)


def test_pack_overflow_errors():
    data = create_synthetic_data(num_samples=1, sequence_length=2,
                                 num_nodes_range=(8, 8),
                                 node_feature_dim=4, seed=2)
    seq_raw = data[0][0]
    with pytest.raises(ValueError):
        tt.build_sequence(seq_raw, max_nodes=3, use_native=True)
    with pytest.raises(ValueError):
        tt.build_sequence(seq_raw, max_edges=1, use_native=True)


def test_csr_native_matches_python():
    import jax.numpy as jnp
    from tagan_tpu.core.graph import coo_to_csr
    rng = np.random.default_rng(0)
    E, Nn = 40, 9
    eq = rng.integers(0, Nn, E).astype(np.int32)
    ek = rng.integers(0, Nn, E).astype(np.int32)
    em = rng.random(E) > 0.3
    row_ptr, col, perm, mask = native.coo_to_csr_native(eq, ek, em, Nn)
    jx = coo_to_csr(jnp.asarray(eq)[None], jnp.asarray(ek)[None],
                    jnp.asarray(em)[None], Nn)
    np.testing.assert_array_equal(row_ptr, np.asarray(jx.row_ptr[0]))
    # per-row neighbor sets agree (order within a row may differ between
    # the two stable sorts only if input order differs — both are stable
    # over input order, so exact equality holds)
    np.testing.assert_array_equal(col[:row_ptr[-1]],
                                  np.asarray(jx.col[0])[:row_ptr[-1]])
    np.testing.assert_array_equal(mask, np.asarray(jx.edge_mask[0]))


def test_native_is_fast_enough():
    """The native packer must not be slower than Python on a large
    sequence (it should be much faster; assert a loose bound to stay
    robust on shared CI hosts)."""
    import time
    data = create_synthetic_data(num_samples=1, sequence_length=12,
                                 num_nodes_range=(300, 300),
                                 num_edges_per_node=8,
                                 node_feature_dim=32, edge_feature_dim=8,
                                 seed=3)
    seq_raw = data[0][0]
    dims = dict(max_nodes=512, max_edges=6000, max_time=12)

    def best(fn, n=3):
        ts = []
        for _ in range(n):
            t0 = time.perf_counter()
            fn()
            ts.append(time.perf_counter() - t0)
        return min(ts)

    # warm both paths (first jnp.asarray pays device init / transfers)
    tt.build_sequence(seq_raw, use_native=False, **dims)
    tt.build_sequence(seq_raw, use_native=True, **dims)
    t_py = best(lambda: tt.build_sequence(seq_raw, use_native=False,
                                          **dims))
    t_nat = best(lambda: tt.build_sequence(seq_raw, use_native=True,
                                           **dims))
    assert t_nat < t_py, (t_nat, t_py)
