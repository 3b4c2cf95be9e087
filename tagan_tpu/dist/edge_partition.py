"""Edge-partitioned sparse attention over the graph mesh axis.

The TAGAN analog of tensor parallelism (SURVEY.md §2.9): each chip on
the ``graph`` axis owns a contiguous shard of node slots plus every edge
whose *query* endpoint lives in that shard. One attention step is then:

  1. ``all_gather`` the key/value node features over the graph axis
     (rides ICI; O(N·D) per chip — the feature matrix is small relative
     to edge compute for the target configs),
  2. local SDDMM + segment softmax + SpMM for the shard's queries —
     softmax normalization is exact because *all* edges of a query live
     on its owner,
  3. outputs stay sharded by query owner (no reduction needed).

This is the explicit `shard_map` + collective formulation of what the
GSPMD path in `dist/spmd.py` derives automatically; it exists both as
the scalable building block for >HBM graphs (each chip only ever holds
its edge shard) and as the place where a Pallas
``make_async_remote_copy`` halo exchange can later replace the
all-gather for boundary-only traffic.

Partitioning helper: `partition_edges_by_query` reorders a padded COO
edge list so edges land on their query's owner shard, padded per shard.
"""

from __future__ import annotations

from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..ops import sparse as S
from .mesh import GRAPH_AXIS


def partition_edges_by_query(
    edge_q: np.ndarray, edge_k: np.ndarray, edge_mask: np.ndarray,
    num_nodes: int, num_shards: int,
    max_edges_per_shard: Optional[int] = None,
) -> Tuple[np.ndarray, np.ndarray, np.ndarray, int]:
    """Host-side: group edges by query-owner shard (owner = slot //
    (N/num_shards)), pad each shard's list to a common static length.

    Returns (edge_q [S, Ep], edge_k [S, Ep], edge_mask [S, Ep], Ep).
    Padded entries point at the owner's first slot with mask=False.
    """
    assert num_nodes % num_shards == 0, (num_nodes, num_shards)
    per = num_nodes // num_shards
    eq = np.asarray(edge_q)
    ek = np.asarray(edge_k)
    em = np.asarray(edge_mask).astype(bool)
    owner = eq // per
    buckets_q, buckets_k = [], []
    for s in range(num_shards):
        sel = em & (owner == s)
        buckets_q.append(eq[sel])
        buckets_k.append(ek[sel])
    Ep = max_edges_per_shard or max((len(b) for b in buckets_q),
                                    default=1) or 1
    out_q = np.zeros((num_shards, Ep), np.int32)
    out_k = np.zeros((num_shards, Ep), np.int32)
    out_m = np.zeros((num_shards, Ep), bool)
    for s in range(num_shards):
        n = len(buckets_q[s])
        if n > Ep:
            raise ValueError(
                f"shard {s} has {n} edges > max_edges_per_shard={Ep}")
        out_q[s, :n] = buckets_q[s]
        out_k[s, :n] = buckets_k[s]
        out_m[s, :n] = True
        out_q[s, n:] = s * per     # padded edges point at owned slot 0
        out_k[s, n:] = s * per
    return out_q, out_k, out_m, Ep


def edge_partitioned_attention(
    mesh: Mesh,
    metric: str,
    q: jax.Array,            # [H, N, D]   (will be sharded over N)
    k: jax.Array,            # [H, N, D]
    v: jax.Array,            # [H, N, D]
    edge_q: jax.Array,       # i32[S, Ep] from partition_edges_by_query
    edge_k: jax.Array,       # i32[S, Ep]
    edge_mask: jax.Array,    # bool[S, Ep]
    *,
    sigma=None, gamma=None,
) -> jax.Array:
    """Sharded edge attention: returns [H, N, D] context, sharded over
    the graph axis by query owner."""
    H, N, D = q.shape
    g = mesh.shape[GRAPH_AXIS]
    per = N // g

    node_spec = P(None, GRAPH_AXIS, None)
    edge_spec = P(GRAPH_AXIS, None)

    def local(q_l, k_l, v_l, eq_l, ek_l, em_l):
        # q_l/k_l/v_l: [H, N/g, D] local shards; e*_l: [1, Ep]
        kg = jax.lax.all_gather(k_l, GRAPH_AXIS, axis=1, tiled=True)
        vg = jax.lax.all_gather(v_l, GRAPH_AXIS, axis=1, tiled=True)
        my = jax.lax.axis_index(GRAPH_AXIS)
        eq_local = eq_l[0] - my * per          # owner-local query ids
        ctx = S.edge_attention(metric, q_l, kg, vg, eq_local, ek_l[0],
                               em_l[0], per, sigma=sigma, gamma=gamma)
        return ctx

    shard_fn = jax.shard_map(
        local, mesh=mesh,
        in_specs=(node_spec, node_spec, node_spec,
                  edge_spec, edge_spec, edge_spec),
        out_specs=node_spec)

    dev = NamedSharding(mesh, node_spec)
    q = jax.device_put(q, dev)
    k = jax.device_put(k, dev)
    v = jax.device_put(v, dev)
    es = NamedSharding(mesh, edge_spec)
    edge_q = jax.device_put(jnp.asarray(edge_q), es)
    edge_k = jax.device_put(jnp.asarray(edge_k), es)
    edge_mask = jax.device_put(jnp.asarray(edge_mask), es)
    return shard_fn(q, k, v, edge_q, edge_k, edge_mask)


def partition_edges_by_query_and_key(
    edge_q: np.ndarray, edge_k: np.ndarray, edge_mask: np.ndarray,
    num_nodes: int, num_shards: int,
    max_edges_per_bucket: Optional[int] = None,
) -> Tuple[np.ndarray, np.ndarray, np.ndarray, int]:
    """Host-side: bucket edges by (query-owner, key-owner) shard pair.

    Returns (edge_q [G, G, Ep], edge_k [G, G, Ep], mask [G, G, Ep], Ep)
    where bucket [gq, gk] holds edges whose query lives on shard gq and
    key on shard gk — the layout the ring-overlap attention walks.
    """
    assert num_nodes % num_shards == 0
    per = num_nodes // num_shards
    eq = np.asarray(edge_q)
    ek = np.asarray(edge_k)
    em = np.asarray(edge_mask).astype(bool)
    qo = eq // per
    ko = ek // per
    buckets = {}
    for gq in range(num_shards):
        for gk in range(num_shards):
            sel = em & (qo == gq) & (ko == gk)
            buckets[(gq, gk)] = (eq[sel], ek[sel])
    Ep = max_edges_per_bucket or max(
        (len(b[0]) for b in buckets.values()), default=1) or 1
    out_q = np.zeros((num_shards, num_shards, Ep), np.int32)
    out_k = np.zeros((num_shards, num_shards, Ep), np.int32)
    out_m = np.zeros((num_shards, num_shards, Ep), bool)
    for (gq, gk), (bq, bk) in buckets.items():
        n = len(bq)
        if n > Ep:
            raise ValueError(f"bucket ({gq},{gk}) has {n} edges > {Ep}")
        out_q[gq, gk, :n] = bq
        out_k[gq, gk, :n] = bk
        out_m[gq, gk, :n] = True
        out_q[gq, gk, n:] = gq * per
        out_k[gq, gk, n:] = gk * per
    return out_q, out_k, out_m, Ep


def make_ring_attention(mesh: Mesh, metric: str, H: int, N: int, D: int):
    """Build the shard_map'd ring-attention callable for use *inside*
    jit (no device_put — operands are resharded by GSPMD as needed).

    Returned signature:
        fn(q, k, v, edge_q, edge_k, edge_mask, sigma, gamma, cov_inv)
        -> [H, N, D] context (sharded over the graph axis by query owner)
    where edge_* are the [G, G, Ep] buckets from
    `partition_edges_by_query_and_key` and sigma/gamma/cov_inv are the
    (replicated) learnable metric parameters ([H] / [H] / [H, Dh, Dh],
    pass all-ones/zeros placeholders when unused — shard_map needs
    concrete operands)."""
    from ..ops.distances import edgewise_scores
    from ..ops.masked import NEG_INF

    g = mesh.shape[GRAPH_AXIS]
    assert N % g == 0, (N, g)
    per = N // g

    node_spec = P(None, GRAPH_AXIS, None)
    edge_spec = P(GRAPH_AXIS, None, None)

    def local(q_l, k_l, v_l, eq_l, ek_l, em_l, sigma, gamma, cov_inv):
        my = jax.lax.axis_index(GRAPH_AXIS)
        eq_loc = eq_l[0] - my * per               # [G, Ep] local query ids
        neg = jnp.asarray(NEG_INF, q_l.dtype)

        # mark the accumulators as device-varying so scan's carry typing
        # matches the (varying) updates computed from sharded operands
        m0 = jax.lax.pvary(jnp.full((H, per), neg), GRAPH_AXIS)
        l0 = jax.lax.pvary(jnp.zeros((H, per)), GRAPH_AXIS)
        acc0 = jax.lax.pvary(jnp.zeros((H, per, D)), GRAPH_AXIS)

        def body(carry, step):
            m, l, acc, kc, vc = carry
            # the chunk now held originated `step` hops to the right...
            # ppermute sends right, so after s steps we hold shard
            # (my - s) mod g's chunk
            src = jax.lax.rem(my - step + g, g)
            eqs = eq_loc[src]                      # [Ep]
            eks = ek_l[0, src] - src * per         # chunk-local key ids
            ems = em_l[0, src]
            q_e = jnp.take(q_l, eqs, axis=1)       # [H, Ep, D]
            k_e = jnp.take(kc, eks, axis=1)
            s_e = edgewise_scores(metric, q_e, k_e, sigma=sigma,
                                  gamma=gamma, cov_inv=cov_inv)
            s_e = jnp.where(ems[None, :], s_e, neg)

            def seg_max(x):
                return jax.vmap(lambda r: jax.ops.segment_max(
                    r, eqs, num_segments=per))(x)

            def seg_sum(x):
                return jax.vmap(lambda r: jax.ops.segment_sum(
                    r, eqs, num_segments=per))(x)

            m_chunk = seg_max(s_e)
            m_chunk = jnp.where(jnp.isfinite(m_chunk), m_chunk, neg)
            m_new = jnp.maximum(m, m_chunk)
            # guard fully-empty queries (m stays NEG_INF)
            shift = jnp.where(m_new <= neg * 0.5, 0.0, m_new)
            p_e = jnp.exp(s_e - jnp.take_along_axis(
                shift, jnp.broadcast_to(eqs, (H, eqs.shape[0])), axis=1))
            p_e = p_e * ems[None, :]
            alpha = jnp.where(m_new <= neg * 0.5, 1.0, jnp.exp(m - m_new))
            alpha = jnp.where(m <= neg * 0.5, 0.0, alpha)
            l_new = l * alpha + seg_sum(p_e)
            v_e = jnp.take(vc, eks, axis=1)        # [H, Ep, D]
            contrib = jax.vmap(lambda pe, ve: jax.ops.segment_sum(
                pe[:, None] * ve, eqs, num_segments=per))(p_e, v_e)
            acc_new = acc * alpha[..., None] + contrib
            # circulate the chunk to the right neighbor
            perm = [(i, (i + 1) % g) for i in range(g)]
            kc2 = jax.lax.ppermute(kc, GRAPH_AXIS, perm)
            vc2 = jax.lax.ppermute(vc, GRAPH_AXIS, perm)
            return (m_new, l_new, acc_new, kc2, vc2), 0

        (m, l, acc, _, _), _ = jax.lax.scan(
            body, (m0, l0, acc0, k_l, v_l), jnp.arange(g))
        denom = jnp.where(l > 0, l, 1.0)
        return acc / denom[..., None]

    rep = P()
    return jax.shard_map(
        local, mesh=mesh,
        in_specs=(node_spec, node_spec, node_spec,
                  edge_spec, edge_spec, edge_spec, rep, rep, rep),
        out_specs=node_spec)


def ring_edge_attention(
    mesh: Mesh,
    metric: str,
    q: jax.Array,            # [H, N, D]
    k: jax.Array,            # [H, N, D]
    v: jax.Array,            # [H, N, D]
    edge_q: jax.Array,       # i32[G, G, Ep] from *_by_query_and_key
    edge_k: jax.Array,
    edge_mask: jax.Array,
    *,
    sigma=None, gamma=None, cov_inv=None,
) -> jax.Array:
    """Halo-overlapped edge attention: K/V shards circulate around the
    ring (`ppermute` over ICI) while each chip folds the arriving chunk
    into a streaming segment softmax for its local queries — no chip
    ever holds the full K/V, and step s's communication overlaps step
    s's compute in the XLA schedule.

    This is the standalone (device_put) wrapper around
    `make_ring_attention`, which the model's ``spatial_backend="ring"``
    uses inside its jitted forward; `ops/pallas/ring_gather` provides
    the same ring as a remote-DMA kernel for fusing the copy into the
    kernel itself."""
    H, N, D = q.shape
    shard_fn = make_ring_attention(mesh, metric, H, N, D)
    node_spec = P(None, GRAPH_AXIS, None)
    edge_spec = P(GRAPH_AXIS, None, None)
    dev = NamedSharding(mesh, node_spec)
    es = NamedSharding(mesh, edge_spec)
    q = jax.device_put(q, dev)
    k = jax.device_put(k, dev)
    v = jax.device_put(v, dev)
    edge_q = jax.device_put(jnp.asarray(edge_q), es)
    edge_k = jax.device_put(jnp.asarray(edge_k), es)
    edge_mask = jax.device_put(jnp.asarray(edge_mask), es)
    Dh = q.shape[-1]
    sigma, gamma, cov_inv = metric_placeholders(H, Dh, q.dtype, sigma,
                                                gamma, cov_inv)
    return shard_fn(q, k, v, edge_q, edge_k, edge_mask, sigma, gamma,
                    cov_inv)


def metric_placeholders(H: int, Dh: int, dtype, sigma=None, gamma=None,
                        cov_inv=None):
    """Concrete stand-ins matching `ops.distances` None-defaults (sigma
    and gamma default to 1, mahalanobis' cov_inv to the identity) —
    shard_map needs real operands for every input."""
    if sigma is None:
        sigma = jnp.ones((H,), dtype)
    if gamma is None:
        gamma = jnp.ones((H,), dtype)
    if cov_inv is None:
        cov_inv = jnp.broadcast_to(jnp.eye(Dh, dtype=dtype),
                                   (H, Dh, Dh))
    return sigma, gamma, cov_inv


def scaling_report(mesh: Mesh, edges_per_sec_1chip: float,
                   edges_per_sec_mesh: float) -> dict:
    """Scaling-efficiency counter (BASELINE north-star metric):
    efficiency = (mesh throughput / chips) / single-chip throughput."""
    n = mesh.devices.size
    per_chip = edges_per_sec_mesh / n
    return {
        "chips": int(n),
        "edges_per_sec_total": edges_per_sec_mesh,
        "edges_per_sec_per_chip": per_chip,
        "scaling_efficiency": per_chip / edges_per_sec_1chip
        if edges_per_sec_1chip > 0 else 0.0,
    }
