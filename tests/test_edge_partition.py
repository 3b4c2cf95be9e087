"""Edge-partitioned (shard_map) attention vs the single-device oracle."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from tagan_tpu.dist import (make_mesh, partition_edges_by_query,
                            edge_partitioned_attention, scaling_report)
from tagan_tpu.ops import sparse as S

pytestmark = pytest.mark.skipif(len(jax.devices()) < 8,
                                reason="needs 8 (virtual) devices")


@pytest.mark.parametrize("g", [2, 4, 8])
def test_edge_partitioned_matches_oracle(g):
    rng = np.random.default_rng(0)
    H, N, D = 2, 32, 8
    E = 200
    q = jnp.asarray(rng.standard_normal((H, N, D)), jnp.float32)
    k = jnp.asarray(rng.standard_normal((H, N, D)), jnp.float32)
    v = jnp.asarray(rng.standard_normal((H, N, D)), jnp.float32)
    eq = rng.integers(0, N, E).astype(np.int32)
    ek = rng.integers(0, N, E).astype(np.int32)
    em = rng.random(E) > 0.2
    # self loops so every query row has mass
    loops = np.arange(N, dtype=np.int32)
    eq = np.concatenate([eq, loops])
    ek = np.concatenate([ek, loops])
    em = np.concatenate([em, np.ones(N, bool)])

    mesh = make_mesh(data=8 // g, graph=g)
    peq, pek, pem, Ep = partition_edges_by_query(eq, ek, em, N, g)
    got = edge_partitioned_attention(mesh, "scaled_dot_product", q, k, v,
                                     peq, pek, pem)
    want = S.edge_attention("scaled_dot_product", q, k, v,
                            jnp.asarray(eq), jnp.asarray(ek),
                            jnp.asarray(em), N)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=2e-4, atol=2e-5)


def test_partition_overflow():
    eq = np.zeros(10, np.int32)   # all on shard 0
    ek = np.arange(10, dtype=np.int32)
    em = np.ones(10, bool)
    with pytest.raises(ValueError):
        partition_edges_by_query(eq, ek, em, 8, 2, max_edges_per_shard=4)


def test_scaling_report():
    mesh = make_mesh(data=4, graph=2)
    rep = scaling_report(mesh, 100.0, 640.0)
    assert rep["chips"] == 8
    assert abs(rep["scaling_efficiency"] - 0.8) < 1e-9


@pytest.mark.parametrize("g", [2, 4])
def test_ring_edge_attention_matches_oracle(g):
    """Halo-overlapped ring attention (ppermute + streaming segment
    softmax) == single-device sparse attention."""
    from tagan_tpu.dist import (partition_edges_by_query_and_key,
                                ring_edge_attention)
    rng = np.random.default_rng(3)
    H, N, D = 2, 24, 8
    E = 150
    q = jnp.asarray(rng.standard_normal((H, N, D)), jnp.float32)
    k = jnp.asarray(rng.standard_normal((H, N, D)), jnp.float32)
    v = jnp.asarray(rng.standard_normal((H, N, D)), jnp.float32)
    eq = rng.integers(0, N, E).astype(np.int32)
    ek = rng.integers(0, N, E).astype(np.int32)
    em = rng.random(E) > 0.2
    loops = np.arange(N, dtype=np.int32)
    eq = np.concatenate([eq, loops])
    ek = np.concatenate([ek, loops])
    em = np.concatenate([em, np.ones(N, bool)])

    mesh = make_mesh(data=8 // g, graph=g)
    bq, bk, bm, Ep = partition_edges_by_query_and_key(eq, ek, em, N, g)
    got = ring_edge_attention(mesh, "scaled_dot_product", q, k, v,
                              bq, bk, bm)
    want = S.edge_attention("scaled_dot_product", q, k, v,
                            jnp.asarray(eq), jnp.asarray(ek),
                            jnp.asarray(em), N)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=2e-4, atol=2e-5)
