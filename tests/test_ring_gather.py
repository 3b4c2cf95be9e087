"""Ring all-gather Pallas kernel vs lax.all_gather on the virtual CPU
mesh (remote DMAs run in interpreter emulation)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.sharding import NamedSharding, PartitionSpec as P

from tagan_tpu.ops.pallas.ring_gather import (ring_all_gather,
                                              ring_all_gather_sharded)

pytestmark = pytest.mark.skipif(len(jax.devices()) < 8,
                                reason="needs 8 (virtual) devices")


def _graph_mesh(g):
    # interpret-mode remote DMA supports scalar LOGICAL ids only, i.e.
    # single-axis meshes; multi-axis meshes use mesh-coordinate ids on
    # real hardware
    from jax.sharding import Mesh
    import numpy as _np
    return Mesh(_np.asarray(jax.devices()[:g]), ("graph",))


@pytest.mark.parametrize("g", [2, 4, 8])
def test_ring_gather_matches_lax(g):
    mesh = _graph_mesh(g)
    rng = np.random.default_rng(0)
    N, D = g * 16, 128
    x = jnp.asarray(rng.standard_normal((N, D)), jnp.float32)
    x = jax.device_put(x, NamedSharding(mesh, P("graph")))
    got = ring_all_gather_sharded(mesh, x, "graph")
    np.testing.assert_allclose(np.asarray(got), np.asarray(x), rtol=1e-6)


def test_ring_gather_inside_shard_map_computation():
    """The kernel composes with local compute inside one shard_map body
    (the edge-partition usage pattern)."""
    mesh = _graph_mesh(4)
    rng = np.random.default_rng(1)
    N, D = 4 * 8, 128
    k = jnp.asarray(rng.standard_normal((N, D)), jnp.float32)
    q = jnp.asarray(rng.standard_normal((N, D)), jnp.float32)
    ks = jax.device_put(k, NamedSharding(mesh, P("graph")))
    qs = jax.device_put(q, NamedSharding(mesh, P("graph")))

    def local(q_l, k_l):
        kg = ring_all_gather(k_l, "graph", 4, interpret=True)
        return q_l @ kg.T          # [N/g, N] local scores

    fn = jax.jit(jax.shard_map(local, mesh=mesh, in_specs=(P("graph"),
                                                           P("graph")),
                               out_specs=P("graph"), check_vma=False))
    got = fn(qs, ks)
    want = q @ k.T
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=1e-4, atol=1e-5)
