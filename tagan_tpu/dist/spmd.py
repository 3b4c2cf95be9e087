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


def batch_specs(mesh: Mesh,
                batch: Optional[SnapshotSequence] = None
                ) -> SnapshotSequence:
    """PartitionSpecs for a stacked SnapshotSequence batch
    [B, T, N, ...]: batch over data, node slots over graph. With
    ``batch`` given, the optional plan fields it carries (ring buckets,
    boundary/flash-local structures, hybrid plans) get specs too —
    ring structures shard their per-shard axis over graph, hybrid
    (single-chip) structures ride the data axis only (trailing dims
    replicated; PartitionSpec may be shorter than the rank)."""
    import dataclasses as _dc
    d, g = DATA_AXIS, GRAPH_AXIS
    specs = SnapshotSequence(
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
    if batch is None:
        return specs
    extras = {}
    for f in ("ring_eq", "ring_ek", "ring_em", "ring_esrc"):
        if getattr(batch, f) is not None:
            extras[f] = P(d, None, g)      # [B, T, Gq, Gk, Ep]
    if batch.ring_bnd_idx is not None:
        extras["ring_bnd_idx"] = P(d, None, g)
    if batch.ring_flash_diag is not None:
        extras["ring_flash_diag"] = tuple(
            P(d, None, g) for _ in batch.ring_flash_diag)
    if batch.ring_flash_off is not None:
        extras["ring_flash_off"] = tuple(
            P(d, None, g) for _ in batch.ring_flash_off)
    if batch.ring_flash_off_c is not None:
        extras["ring_flash_off_c"] = tuple(
            tuple(P(d, None, g) for _ in b)
            for b in batch.ring_flash_off_c)
    for f in ("hyb_mask_blocks", "hyb_band_slot", "hyb_res_bid"):
        if getattr(batch, f) is not None:
            extras[f] = P(d)
    for f in ("hyb_plan", "hyb_plan_t", "hyb_res", "hyb_res_pad",
              "hyb_res_cbid"):
        val = getattr(batch, f)
        if val is not None:
            extras[f] = tuple(P(d) for _ in val)
    if batch.hyb_res_cpad is not None:
        extras["hyb_res_cpad"] = tuple(
            tuple(P(d) for _ in b) for b in batch.hyb_res_cpad)
    return _dc.replace(specs, **extras)


def batch_shardings(mesh: Mesh,
                    batch: Optional[SnapshotSequence] = None
                    ) -> SnapshotSequence:
    return jax.tree_util.tree_map(lambda s: NamedSharding(mesh, s),
                                  batch_specs(mesh, batch),
                                  is_leaf=lambda s: isinstance(s, P))


def shard_batch(mesh: Mesh, batch: SnapshotSequence) -> SnapshotSequence:
    sh = batch_shardings(mesh, batch)
    return jax.tree_util.tree_map(jax.device_put, batch, sh)


def make_train_step(model, tx: optax.GradientTransformation,
                    mesh: Mesh) -> Callable:
    """Jitted SPMD train step: (params, opt_state, batch, labels) ->
    (params, opt_state, loss). Params/opt replicated; batch sharded
    (data, graph); collectives inserted by GSPMD."""
    repl = NamedSharding(mesh, P())
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

    # batch shardings are inferred from the arrays `shard_batch`
    # committed (the batch pytree's optional plan fields vary per
    # dataset, so a static spec tree here cannot match every batch)
    return jax.jit(
        step,
        in_shardings=(repl, repl, None, lbl_shard),
        out_shardings=(repl, repl, repl),
    )


def make_eval_step(model, mesh: Mesh) -> Callable:
    repl = NamedSharding(mesh, P())
    lbl_shard = NamedSharding(mesh, P(DATA_AXIS))

    def step(params, batch, labels):
        def one(seq, label):
            out = model(params, seq, label, deterministic=True)
            return out.loss, out.predictions
        losses, preds = jax.vmap(one)(batch, labels)
        return jnp.mean(losses), preds

    return jax.jit(step, in_shardings=(repl, None, lbl_shard))
