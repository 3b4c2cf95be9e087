"""Fused ring flash attention (in-kernel remote DMA + flash recurrence)
vs the dense oracle and the collective ppermute ring — on a virtual CPU
mesh with interpreter-emulated remote DMAs (like tests/test_ring_gather)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.sharding import Mesh

import tagan_tpu  # noqa: F401  (conftest pins cpu + 8 devices)
from tagan_tpu.ops.distances import pairwise_scores
from tagan_tpu.ops.masked import masked_softmax
from tagan_tpu.ops.pallas.ring_flash import ring_flash_attention


def _mesh(g):
    devs = np.asarray(jax.devices("cpu")[:g])
    return Mesh(devs, ("graph",))


def _data(N, H=2, Dh=16, seed=0, dead_row=None):
    r = np.random.default_rng(seed)
    q = jnp.asarray(r.standard_normal((H, N, Dh)), jnp.float32)
    k = jnp.asarray(r.standard_normal((H, N, Dh)), jnp.float32)
    v = jnp.asarray(r.standard_normal((H, N, Dh)), jnp.float32)
    adj = r.random((N, N)) < 0.3
    adj[np.arange(N), np.arange(N)] = True
    if dead_row is not None:
        adj[dead_row] = False
    return q, k, v, jnp.asarray(adj)


def _oracle(metric, q, k, v, adj, scale=None):
    sig = scale if metric == "gaussian_kernel" else None
    gam = scale if metric == "rbf_kernel" else None
    w = masked_softmax(pairwise_scores(metric, q, k, sigma=sig,
                                       gamma=gam), adj[None])
    return jnp.einsum("hij,hjd->hid", w, v)


@pytest.mark.parametrize("g", [2, 4])
@pytest.mark.parametrize("metric", ["scaled_dot_product", "euclidean",
                                    "cosine_similarity"])
def test_ring_flash_matches_dense(g, metric):
    N = 16 * g
    q, k, v, adj = _data(N, seed=g)
    mesh = _mesh(g)
    got = ring_flash_attention(mesh, q, k, v, adj, metric=metric)
    want = _oracle(metric, q, k, v, adj)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=2e-4, atol=2e-4)


def test_ring_flash_scaled_metric_and_dead_rows():
    g, N = 4, 48
    q, k, v, adj = _data(N, seed=9, dead_row=5)
    scale = jnp.asarray([0.8, 1.3])
    mesh = _mesh(g)
    got = ring_flash_attention(mesh, q, k, v, adj,
                               metric="gaussian_kernel",
                               scale_param=scale)
    want = _oracle("gaussian_kernel", q, k, v, adj, scale)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=2e-4, atol=2e-4)
    assert np.all(np.asarray(got)[:, 5] == 0.0)


def test_ring_flash_matches_collective_ring():
    """The fused kernel and the ppermute formulation implement the same
    semantics (up to streaming-order float noise)."""
    from tagan_tpu.dist.edge_partition import (
        partition_edges_by_query_and_key, ring_edge_attention)
    from tagan_tpu.dist.mesh import make_mesh
    g, N = 4, 32
    q, k, v, adj = _data(N, seed=11)
    mesh = _mesh(g)
    fused = ring_flash_attention(mesh, q, k, v, adj,
                                 metric="scaled_dot_product")
    # collective ring consumes bucketed edges of the same mask
    src, dst = np.nonzero(np.asarray(adj))
    eq, ek, em, _ = partition_edges_by_query_and_key(
        src.astype(np.int32), dst.astype(np.int32),
        np.ones_like(src, bool), N, g)
    mesh2 = make_mesh(data=2, graph=4)
    coll = ring_edge_attention(mesh2, "scaled_dot_product", q, k, v,
                               eq, ek, em)
    np.testing.assert_allclose(np.asarray(fused), np.asarray(coll),
                               rtol=2e-4, atol=2e-4)
