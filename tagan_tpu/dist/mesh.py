"""Device-mesh definitions and sharding helpers.

The reference has no distributed code at all (SURVEY.md §2.9); scaling
here is designed TPU-first:

* ``data`` axis — data parallel over sequences (and the snapshot axis
  within long sequences); maps to DCN across hosts, ICI within a host.
* ``graph`` axis — edge/node partition of each snapshot's graph: each
  chip owns a slot shard plus its incident edges; SpMM partial sums are
  reduced with ``psum`` over this axis and boundary (halo) node
  embeddings move via ``all_to_all`` / ``ppermute`` over ICI.

All entry points take a standard `jax.sharding.Mesh`; tests run on a
virtual CPU mesh (`XLA_FLAGS=--xla_force_host_platform_device_count=8`).
"""

from __future__ import annotations

from typing import Optional, Sequence, Tuple

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

DATA_AXIS = "data"
GRAPH_AXIS = "graph"


def make_mesh(data: Optional[int] = None, graph: int = 1,
              devices: Optional[Sequence[jax.Device]] = None) -> Mesh:
    """Create a (data, graph) mesh over available devices.

    With multi-host topologies, callers should order devices so the
    graph axis maps to ICI neighbors (the default device order from
    `jax.devices()` does this on TPU slices)."""
    devs = list(devices if devices is not None else jax.devices())
    n = len(devs)
    if data is None:
        assert n % graph == 0, f"{n} devices not divisible by graph={graph}"
        data = n // graph
    assert data * graph == n, (
        f"mesh {data}x{graph} != {n} devices")
    arr = np.asarray(devs).reshape(data, graph)
    return Mesh(arr, (DATA_AXIS, GRAPH_AXIS))


def batch_sharding(mesh: Mesh) -> NamedSharding:
    """Shard a stacked SnapshotSequence batch over the data axis
    (leading/batch dim), replicate over graph."""
    return NamedSharding(mesh, P(DATA_AXIS))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def node_sharded(mesh: Mesh, batch: bool = True) -> NamedSharding:
    """Shard node-feature arrays [B, T, N, H] over (data, -, graph, -)."""
    if batch:
        return NamedSharding(mesh, P(DATA_AXIS, None, GRAPH_AXIS))
    return NamedSharding(mesh, P(None, GRAPH_AXIS))


def shard_batch(mesh: Mesh, batch_pytree):
    """Device-put a stacked batch pytree with the batch axis sharded over
    the data axis."""
    sh = batch_sharding(mesh)
    return jax.tree_util.tree_map(lambda x: jax.device_put(x, sh),
                                  batch_pytree)


def shard_params(mesh: Mesh, params):
    """Replicate parameters across the mesh (model is small relative to
    activations for this family; graph-axis sharding of activations is
    where scaling lives)."""
    sh = replicated(mesh)
    return jax.tree_util.tree_map(lambda x: jax.device_put(x, sh), params)
