"""SPMD training over a (data, graph) mesh.

The recipe (no reference analog — SURVEY.md §2.9 documents the reference
has zero distributed code): pick a mesh, annotate shardings on the
inputs, let GSPMD propagate and insert collectives over ICI.

* batch axis  -> P('data')   — data parallel over sequences
* node slots  -> P('graph')  — graph/edge partition of every snapshot:
  each chip owns a slot shard; the dense edge-masked attention becomes a
  row-sharded [N/g, N] score block (all-gather of keys rides ICI), and
  segment/SpMM partial sums reduce with psum inserted by XLA.

`make_train_step` returns a jitted step with explicit in/out shardings;
gradients are averaged across 'data' by jit's output sharding (params
replicated), which is exactly a psum over the mesh.
"""

from __future__ import annotations

from typing import Any, Callable, Optional, Tuple

import jax
import jax.numpy as jnp
import optax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..core.graph import SnapshotSequence
from .mesh import DATA_AXIS, GRAPH_AXIS


def batch_specs(mesh: Mesh) -> SnapshotSequence:
    """PartitionSpecs for a stacked SnapshotSequence batch
    [B, T, N, ...]: batch over data, node slots over graph."""
    d, g = DATA_AXIS, GRAPH_AXIS
    return SnapshotSequence(
        x=P(d, None, g, None),
        node_mask=P(d, None, g),
        adj=P(d, None, g, None),
        edge_src=P(d, None, None),
        edge_dst=P(d, None, None),
        edge_mask=P(d, None, None),
        edge_attr=P(d, None, None, None),
        times=P(d, None),
        time_mask=P(d, None),
        node_ids=P(d, g),
    )


def batch_shardings(mesh: Mesh) -> SnapshotSequence:
    return jax.tree_util.tree_map(lambda s: NamedSharding(mesh, s),
                                  batch_specs(mesh),
                                  is_leaf=lambda s: isinstance(s, P))


def shard_batch(mesh: Mesh, batch: SnapshotSequence) -> SnapshotSequence:
    sh = batch_shardings(mesh)
    return jax.tree_util.tree_map(jax.device_put, batch, sh)


def make_train_step(model, tx: optax.GradientTransformation,
                    mesh: Mesh) -> Callable:
    """Jitted SPMD train step: (params, opt_state, batch, labels) ->
    (params, opt_state, loss). Params/opt replicated; batch sharded
    (data, graph); collectives inserted by GSPMD."""
    repl = NamedSharding(mesh, P())
    b_shard = batch_shardings(mesh)
    lbl_shard = NamedSharding(mesh, P(DATA_AXIS))

    def loss_fn(params, batch, labels):
        def one(seq, label):
            return model(params, seq, label, deterministic=True).loss
        losses = jax.vmap(one)(batch, labels)
        return jnp.mean(losses)

    def step(params, opt_state, batch, labels):
        loss, grads = jax.value_and_grad(loss_fn)(params, batch, labels)
        updates, opt_state = tx.update(grads, opt_state, params)
        params = optax.apply_updates(params, updates)
        return params, opt_state, loss

    return jax.jit(
        step,
        in_shardings=(repl, repl, b_shard, lbl_shard),
        out_shardings=(repl, repl, repl),
    )


def make_eval_step(model, mesh: Mesh) -> Callable:
    repl = NamedSharding(mesh, P())
    b_shard = batch_shardings(mesh)
    lbl_shard = NamedSharding(mesh, P(DATA_AXIS))

    def step(params, batch, labels):
        def one(seq, label):
            out = model(params, seq, label, deterministic=True)
            return out.loss, out.predictions
        losses, preds = jax.vmap(one)(batch, labels)
        return jnp.mean(losses), preds

    return jax.jit(step, in_shardings=(repl, b_shard, lbl_shard))
