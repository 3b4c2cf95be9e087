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
    # one argsort groups edges by owner — O(E log E), no per-shard scans
    owner = (eq[em] // per).astype(np.int64)
    vq, vk = eq[em], ek[em]
    order = np.argsort(owner, kind="stable")
    owner, vq, vk = owner[order], vq[order], vk[order]
    counts = np.bincount(owner, minlength=num_shards)
    Ep = max_edges_per_shard or max(int(counts.max(initial=0)), 1)
    if counts.max(initial=0) > Ep:
        s = int(np.argmax(counts))
        raise ValueError(
            f"shard {s} has {counts[s]} edges > max_edges_per_shard={Ep}")
    starts = np.concatenate([[0], np.cumsum(counts)[:-1]])
    pos = np.arange(len(owner)) - starts[owner]     # slot within shard
    base = (np.arange(num_shards) * per)[:, None]
    out_q = np.broadcast_to(base, (num_shards, Ep)).astype(np.int32).copy()
    out_k = out_q.copy()          # padded edges point at owned slot 0
    out_m = np.zeros((num_shards, Ep), bool)
    out_q[owner, pos] = vq
    out_k[owner, pos] = vk
    out_m[owner, pos] = True
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
    edge_ids: Optional[np.ndarray] = None,
):
    """Host-side: bucket edges by (query-owner, key-owner) shard pair.

    Returns (edge_q [G, G, Ep], edge_k [G, G, Ep], mask [G, G, Ep], Ep)
    where bucket [gq, gk] holds edges whose query lives on shard gq and
    key on shard gk — the layout the ring-overlap attention walks.

    When ``edge_ids`` (an int array aligned with ``edge_q``; use -1 for
    entries with no provenance, e.g. appended self loops) is given, a
    fifth array i32[G, G, Ep] is returned before Ep carrying each
    bucketed slot's original edge id (-1 on padding) — the per-edge
    feature provenance the biased ring gathers bias values through.
    """
    assert num_nodes % num_shards == 0
    per = num_nodes // num_shards
    G = num_shards
    eq = np.asarray(edge_q)
    ek = np.asarray(edge_k)
    em = np.asarray(edge_mask).astype(bool)
    # one argsort groups edges by (query-owner, key-owner) bucket —
    # O(E log E) instead of G^2 boolean scans of the full edge list
    vq, vk = eq[em], ek[em]
    bucket = (vq // per) * G + (vk // per)
    order = np.argsort(bucket, kind="stable")
    bucket, vq, vk = bucket[order], vq[order], vk[order]
    counts = np.bincount(bucket, minlength=G * G)
    Ep = max_edges_per_bucket or max(int(counts.max(initial=0)), 1)
    if counts.max(initial=0) > Ep:
        b = int(np.argmax(counts))
        raise ValueError(
            f"bucket ({b // G},{b % G}) has {counts[b]} edges > {Ep}")
    starts = np.concatenate([[0], np.cumsum(counts)[:-1]])
    pos = np.arange(len(bucket)) - starts[bucket]
    gq_base = (np.arange(G) * per)[:, None, None]
    gk_base = (np.arange(G) * per)[None, :, None]
    out_q = np.broadcast_to(gq_base, (G, G, Ep)).astype(np.int32).copy()
    out_k = np.broadcast_to(gk_base, (G, G, Ep)).astype(np.int32).copy()
    out_m = np.zeros((G, G, Ep), bool)
    out_q[bucket // G, bucket % G, pos] = vq
    out_k[bucket // G, bucket % G, pos] = vk
    out_m[bucket // G, bucket % G, pos] = True
    if edge_ids is not None:
        vid = np.asarray(edge_ids)[em][order]
        out_src = np.full((G, G, Ep), -1, np.int32)
        out_src[bucket // G, bucket % G, pos] = vid
        return out_q, out_k, out_m, out_src, Ep
    return out_q, out_k, out_m, Ep


def _edge_scores(metric, q_l, kc, eqs, eks, ems, sigma, gamma, cov_inv,
                 neg):
    """Masked per-edge scores for one chunk: [H, Ep] (neg on padding)."""
    from ..ops.distances import edgewise_scores
    q_e = jnp.take(q_l, eqs, axis=1)       # [H, Ep, D]
    k_e = jnp.take(kc, eks, axis=1)
    s_e = edgewise_scores(metric, q_e, k_e, sigma=sigma,
                          gamma=gamma, cov_inv=cov_inv)
    return jnp.where(ems[None, :], s_e, neg)


def _fold_scores(s_e, eqs, ems, m, l, acc, per, neg, v_e=None,
                 keep=None, keep_inv=1.0):
    """Fold one chunk's masked scores into the streaming per-query
    segment softmax: (m, l[, acc]) -> updated. ``keep`` (bool[H, Ep])
    drops the NORMALIZED weights: the V accumulator takes the dropped
    p_e while the denominator keeps the un-dropped sum — exactly
    dropout(softmax(s)) @ v, like the csr and flash paths. With
    ``v_e=None`` only (m, l) update (the logsumexp-only pass)."""
    H = s_e.shape[0]

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
    if v_e is None:
        return m_new, l_new
    p_v = p_e if keep is None else jnp.where(keep, p_e * keep_inv, 0.0)
    contrib = jax.vmap(lambda pe, ve: jax.ops.segment_sum(
        pe[:, None] * ve, eqs, num_segments=per))(p_v, v_e)
    acc_new = acc * alpha[..., None] + contrib
    return m_new, l_new, acc_new


def _fold_chunk(metric, q_l, kc, vc, eqs, eks, ems, m, l, acc, per,
                sigma, gamma, cov_inv, neg, keep=None, keep_inv=1.0):
    """Fold one K/V chunk into the streaming per-query segment softmax:
    (m, l, acc) -> updated. eqs are owner-local query ids, eks index
    into `kc`/`vc` (chunk-local), ems masks padded bucket slots."""
    s_e = _edge_scores(metric, q_l, kc, eqs, eks, ems, sigma, gamma,
                       cov_inv, neg)
    v_e = jnp.take(vc, eks, axis=1)        # [H, Ep, D]
    return _fold_scores(s_e, eqs, ems, m, l, acc, per, neg, v_e=v_e,
                        keep=keep, keep_inv=keep_inv)


def _fold_biased_chunk(metric, q_l, kc, vc, eqs, eks, ems, b_e,
                       m1, l1, m2, l2, acc, per, sigma, gamma, cov_inv,
                       neg, keep1=None, keep2=None, keep_inv=1.0):
    """Pass-B fold of the edge-biased (double-softmax) ring: given the
    FINAL first-softmax stats (m1, l1) per query, recompute this
    chunk's scores, form the first-softmax weights w_e (optionally
    dropped by ``keep1`` — the dense path's dropout between the two
    softmaxes), add the head-shared per-edge bias b_e [Ep], and fold
    t_e = w_e + b_e into the streaming SECOND softmax (m2, l2, acc)
    with ``keep2`` dropping its normalized weights — op-for-op the
    semantics of `ops.sparse.edge_attention(edge_bias=...)`
    (geometric_attention.py:567-575 re-softmax)."""
    H = q_l.shape[0]
    s_e = _edge_scores(metric, q_l, kc, eqs, eks, ems, sigma, gamma,
                       cov_inv, neg)
    shift1 = jnp.where(m1 <= neg * 0.5, 0.0, m1)
    denom1 = jnp.where(l1 > 0, l1, 1.0)
    eqs_h = jnp.broadcast_to(eqs, (H, eqs.shape[0]))
    w_e = jnp.exp(s_e - jnp.take_along_axis(shift1, eqs_h, axis=1)) \
        / jnp.take_along_axis(denom1, eqs_h, axis=1)
    w_e = w_e * ems[None, :]
    if keep1 is not None:
        w_e = jnp.where(keep1, w_e * keep_inv, 0.0)
    t_e = jnp.where(ems[None, :], w_e + b_e[None, :], neg)
    v_e = jnp.take(vc, eks, axis=1)
    return _fold_scores(t_e, eqs, ems, m2, l2, acc, per, neg, v_e=v_e,
                        keep=keep2, keep_inv=keep_inv)


def make_ring_attention(mesh: Mesh, metric: str, H: int, N: int, D: int,
                        dropout_rate: float = 0.0, biased: bool = False):
    """Build the shard_map'd ring-attention callable for use *inside*
    jit (no device_put — operands are resharded by GSPMD as needed).

    Returned signature:
        fn(q, k, v, edge_q, edge_k, edge_mask, sigma, gamma, cov_inv)
        -> [H, N, D] context (sharded over the graph axis by query owner)
    where edge_* are the [G, G, Ep] buckets from
    `partition_edges_by_query_and_key` and sigma/gamma/cov_inv are the
    (replicated) learnable metric parameters ([H] / [H] / [H, Dh, Dh],
    pass all-ones/zeros placeholders when unused — shard_map needs
    concrete operands).

    With ``dropout_rate`` > 0 the callable takes one extra trailing
    operand ``keep`` (bool[H, G, G, Ep], bucketed like the edges):
    attention dropout on the normalized weights, identical semantics to
    the csr and flash backends.

    With ``biased=True`` the callable takes an extra ``bias`` operand
    (f32[G, G, Ep], head-shared per-edge bias values, bucketed like the
    edges) after edge_mask, and implements the dense path's
    geometric-bias DOUBLE softmax (geometric_attention.py:567-575) in
    two ring passes: pass A circulates K only and accumulates the
    first softmax's per-query (max, sum); pass B circulates K and V,
    reconstitutes the first-softmax weights w_e exactly from those
    finals, and streams the second softmax over w_e + bias_e. Dropout
    then needs TWO keep masks — ``keep`` becomes bool[2, H, G, G, Ep]
    (keep[0] drops w_e between the softmaxes, keep[1] drops the final
    normalized weights), matching `ops.sparse.edge_attention`'s order."""
    from ..ops.masked import NEG_INF

    g = mesh.shape[GRAPH_AXIS]
    assert N % g == 0, (N, g)
    per = N // g
    inv = 1.0 / (1.0 - dropout_rate) if dropout_rate > 0.0 else 1.0

    node_spec = P(None, GRAPH_AXIS, None)
    edge_spec = P(GRAPH_AXIS, None, None)
    keep_spec = P(None, GRAPH_AXIS, None, None)
    keep2_spec = P(None, None, GRAPH_AXIS, None, None)

    def _varying_init(neg):
        # mark the accumulators as device-varying so scan's carry typing
        # matches the (varying) updates computed from sharded operands
        m0 = jax.lax.pcast(jnp.full((H, per), neg), GRAPH_AXIS,
                          to='varying')
        l0 = jax.lax.pcast(jnp.zeros((H, per)), GRAPH_AXIS,
                          to='varying')
        acc0 = jax.lax.pcast(jnp.zeros((H, per, D)), GRAPH_AXIS,
                            to='varying')
        return m0, l0, acc0

    def local(q_l, k_l, v_l, eq_l, ek_l, em_l, sigma, gamma, cov_inv,
              keep_l=None):
        my = jax.lax.axis_index(GRAPH_AXIS)
        eq_loc = eq_l[0] - my * per               # [G, Ep] local query ids
        neg = jnp.asarray(NEG_INF, q_l.dtype)
        m0, l0, acc0 = _varying_init(neg)

        def body(carry, step):
            m, l, acc, kc, vc = carry
            # the chunk now held originated `step` hops to the right...
            # ppermute sends right, so after s steps we hold shard
            # (my - s) mod g's chunk
            src = jax.lax.rem(my - step + g, g)
            kp = None if keep_l is None else keep_l[:, 0, src]
            m, l, acc = _fold_chunk(
                metric, q_l, kc, vc, eq_loc[src],
                ek_l[0, src] - src * per, em_l[0, src], m, l, acc, per,
                sigma, gamma, cov_inv, neg, keep=kp, keep_inv=inv)
            # circulate the chunk to the right neighbor
            perm = [(i, (i + 1) % g) for i in range(g)]
            kc2 = jax.lax.ppermute(kc, GRAPH_AXIS, perm)
            vc2 = jax.lax.ppermute(vc, GRAPH_AXIS, perm)
            return (m, l, acc, kc2, vc2), 0

        (m, l, acc, _, _), _ = jax.lax.scan(
            body, (m0, l0, acc0, k_l, v_l), jnp.arange(g))
        denom = jnp.where(l > 0, l, 1.0)
        return acc / denom[..., None]

    def local_biased(q_l, k_l, v_l, eq_l, ek_l, em_l, bias_l, sigma,
                     gamma, cov_inv, keep_l=None):
        my = jax.lax.axis_index(GRAPH_AXIS)
        eq_loc = eq_l[0] - my * per
        neg = jnp.asarray(NEG_INF, q_l.dtype)
        m0, l0, acc0 = _varying_init(neg)
        perm = [(i, (i + 1) % g) for i in range(g)]

        # pass A: first softmax's (max, sum) — K circulates alone
        def body_a(carry, step):
            m, l, kc = carry
            src = jax.lax.rem(my - step + g, g)
            s_e = _edge_scores(
                metric, q_l, kc, eq_loc[src], ek_l[0, src] - src * per,
                em_l[0, src], sigma, gamma, cov_inv, neg)
            m, l = _fold_scores(s_e, eq_loc[src], em_l[0, src], m, l,
                                None, per, neg)
            return (m, l, jax.lax.ppermute(kc, GRAPH_AXIS, perm)), 0

        (m1, l1, _), _ = jax.lax.scan(body_a, (m0, l0, k_l),
                                      jnp.arange(g))

        # pass B: stream the second softmax over w_e + bias_e
        def body_b(carry, step):
            m, l, acc, kc, vc = carry
            src = jax.lax.rem(my - step + g, g)
            kp1 = None if keep_l is None else keep_l[0, :, 0, src]
            kp2 = None if keep_l is None else keep_l[1, :, 0, src]
            m, l, acc = _fold_biased_chunk(
                metric, q_l, kc, vc, eq_loc[src],
                ek_l[0, src] - src * per, em_l[0, src], bias_l[0, src],
                m1, l1, m, l, acc, per, sigma, gamma, cov_inv, neg,
                keep1=kp1, keep2=kp2, keep_inv=inv)
            kc2 = jax.lax.ppermute(kc, GRAPH_AXIS, perm)
            vc2 = jax.lax.ppermute(vc, GRAPH_AXIS, perm)
            return (m, l, acc, kc2, vc2), 0

        (m2, l2, acc, _, _), _ = jax.lax.scan(
            body_b, (m0, l0, acc0, k_l, v_l), jnp.arange(g))
        denom = jnp.where(l2 > 0, l2, 1.0)
        return acc / denom[..., None]

    rep = P()
    base = (node_spec, node_spec, node_spec,
            edge_spec, edge_spec, edge_spec)
    if biased:
        specs = base + (edge_spec, rep, rep, rep)
        if dropout_rate > 0.0:
            specs = specs + (keep2_spec,)
        return jax.shard_map(local_biased, mesh=mesh, in_specs=specs,
                             out_specs=node_spec)
    specs = base + (rep, rep, rep)
    if dropout_rate > 0.0:
        specs = specs + (keep_spec,)
    return jax.shard_map(local, mesh=mesh, in_specs=specs,
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


# ---------------------------------------------------------------------------
# Boundary-only (beta-traffic) halo exchange
# ---------------------------------------------------------------------------

def make_boundary_plan(
    ring_eq: np.ndarray,     # i32[G, G, Ep] from *_by_query_and_key
    ring_ek: np.ndarray,
    ring_em: np.ndarray,
    num_nodes: int, num_shards: int,
    max_boundary: Optional[int] = None,
):
    """Host-side: compact each shard's *boundary* nodes — the keys any
    other shard's queries reference — and remap the bucket key ids so
    the ring can circulate only those rows (traffic x beta instead of
    the full shard, SURVEY §2.9's halo exchange).

    Returns (bnd_idx i32[G, Bp], ek_local i32[G, G, Ep], Bp, beta):
      bnd_idx[g]        shard g's boundary node ids, *shard-local*,
                        padded with 0 (padded rows are never referenced)
      ek_local[gq, gk]  key ids remapped: diagonal buckets -> shard-local
                        ids into the full chunk, off-diagonal -> positions
                        into shard gk's boundary compaction
      beta              mean true boundary fraction (pre-padding)
    """
    assert num_nodes % num_shards == 0
    per = num_nodes // num_shards
    G = num_shards
    ek = np.asarray(ring_ek)
    em = np.asarray(ring_em).astype(bool)
    off_diag = ~np.eye(G, dtype=bool)
    exports = []
    for gk in range(G):
        sel = em[off_diag[:, gk], gk]                # [G-1, Ep] valid
        keys = ek[off_diag[:, gk], gk][sel] - gk * per
        exports.append(np.unique(keys))
    Bp = max_boundary or max(1, max((len(e) for e in exports),
                                    default=1))
    bnd_idx = np.zeros((G, Bp), np.int32)
    ek_local = np.zeros_like(ek)
    for gk in range(G):
        exp = exports[gk]
        if len(exp) > Bp:
            raise ValueError(
                f"shard {gk} exports {len(exp)} boundary nodes > "
                f"max_boundary={Bp}")
        bnd_idx[gk, :len(exp)] = exp
        loc = ek[:, gk] - gk * per                   # [G, Ep]
        # off-diagonal: position in the sorted boundary list
        remap = np.searchsorted(exp, loc) if len(exp) else \
            np.zeros_like(loc)
        remap = np.clip(remap, 0, max(len(exp) - 1, 0))
        local = np.where(off_diag[:, gk][:, None], remap, loc)
        ek_local[:, gk] = np.where(em[:, gk], local, 0)
    beta = float(np.mean([len(e) for e in exports]) / per)
    return bnd_idx, ek_local, Bp, beta


def make_boundary_ring_attention(mesh: Mesh, metric: str, H: int, N: int,
                                 D: int, dropout_rate: float = 0.0,
                                 biased: bool = False):
    """Boundary-only ring: hop 0 folds the diagonal bucket against the
    full local K/V; the remaining g-1 hops circulate only each shard's
    boundary compaction (rows another shard actually references —
    `make_boundary_plan`), so per-hop traffic is Bp rows instead of
    N/g. Same streaming segment softmax as `make_ring_attention`, so
    outputs are bit-compatible with it (and the dense oracle).

    Returned signature:
        fn(q, k, v, edge_q, ek_local, edge_mask, bnd_idx,
           sigma, gamma, cov_inv) -> [H, N, D]
    with ek_local/bnd_idx from `make_boundary_plan` (ek stored
    pre-localized: diagonal -> shard-local, off-diagonal -> boundary
    positions). ``dropout_rate`` > 0 adds a trailing ``keep``
    (bool[H, G, G, Ep]) operand like `make_ring_attention`.

    ``biased=True`` adds a ``bias`` operand (f32[G, G, Ep]) after
    edge_mask and runs the double-softmax in two boundary passes (see
    `make_ring_attention`); with dropout the trailing keep becomes
    bool[2, H, G, G, Ep]."""
    from ..ops.masked import NEG_INF

    g = mesh.shape[GRAPH_AXIS]
    assert N % g == 0, (N, g)
    per = N // g
    inv = 1.0 / (1.0 - dropout_rate) if dropout_rate > 0.0 else 1.0

    node_spec = P(None, GRAPH_AXIS, None)
    edge_spec = P(GRAPH_AXIS, None, None)
    bnd_spec = P(GRAPH_AXIS, None)
    keep_spec = P(None, GRAPH_AXIS, None, None)
    keep2_spec = P(None, None, GRAPH_AXIS, None, None)
    perm = [(i, (i + 1) % g) for i in range(g)]

    def _varying_init(neg):
        m0 = jax.lax.pcast(jnp.full((H, per), neg), GRAPH_AXIS,
                          to='varying')
        l0 = jax.lax.pcast(jnp.zeros((H, per)), GRAPH_AXIS,
                          to='varying')
        acc0 = jax.lax.pcast(jnp.zeros((H, per, D)), GRAPH_AXIS,
                            to='varying')
        return m0, l0, acc0

    def local(q_l, k_l, v_l, eq_l, ek_l, em_l, bidx_l, sigma, gamma,
              cov_inv, keep_l=None):
        my = jax.lax.axis_index(GRAPH_AXIS)
        eq_loc = eq_l[0] - my * per               # [G, Ep] local query ids
        neg = jnp.asarray(NEG_INF, q_l.dtype)
        m0, l0, acc0 = _varying_init(neg)

        # hop 0: the diagonal bucket against the full local chunk
        kp0 = None if keep_l is None else keep_l[:, 0, my]
        m, l, acc = _fold_chunk(
            metric, q_l, k_l, v_l, eq_loc[my], ek_l[0, my], em_l[0, my],
            m0, l0, acc0, per, sigma, gamma, cov_inv, neg, keep=kp0,
            keep_inv=inv)

        # only the boundary rows circulate
        kb = jnp.take(k_l, bidx_l[0], axis=1)     # [H, Bp, D]
        vb = jnp.take(v_l, bidx_l[0], axis=1)

        def body(carry, step):
            m, l, acc, kc, vc = carry
            kc = jax.lax.ppermute(kc, GRAPH_AXIS, perm)
            vc = jax.lax.ppermute(vc, GRAPH_AXIS, perm)
            src = jax.lax.rem(my - step + g, g)
            kp = None if keep_l is None else keep_l[:, 0, src]
            m, l, acc = _fold_chunk(
                metric, q_l, kc, vc, eq_loc[src], ek_l[0, src],
                em_l[0, src], m, l, acc, per, sigma, gamma, cov_inv,
                neg, keep=kp, keep_inv=inv)
            return (m, l, acc, kc, vc), 0

        (m, l, acc, _, _), _ = jax.lax.scan(
            body, (m, l, acc, kb, vb), jnp.arange(1, g))
        denom = jnp.where(l > 0, l, 1.0)
        return acc / denom[..., None]

    def local_biased(q_l, k_l, v_l, eq_l, ek_l, em_l, bias_l, bidx_l,
                     sigma, gamma, cov_inv, keep_l=None):
        my = jax.lax.axis_index(GRAPH_AXIS)
        eq_loc = eq_l[0] - my * per
        neg = jnp.asarray(NEG_INF, q_l.dtype)
        m0, l0, acc0 = _varying_init(neg)
        kb = jnp.take(k_l, bidx_l[0], axis=1)     # [H, Bp, D]
        vb = jnp.take(v_l, bidx_l[0], axis=1)

        # pass A: first softmax's (max, sum); hop 0 diag, then only
        # the boundary K rows circulate
        s_d = _edge_scores(metric, q_l, k_l, eq_loc[my], ek_l[0, my],
                           em_l[0, my], sigma, gamma, cov_inv, neg)
        m1, l1 = _fold_scores(s_d, eq_loc[my], em_l[0, my], m0, l0,
                              None, per, neg)

        def body_a(carry, step):
            m, l, kc = carry
            kc = jax.lax.ppermute(kc, GRAPH_AXIS, perm)
            src = jax.lax.rem(my - step + g, g)
            s_e = _edge_scores(metric, q_l, kc, eq_loc[src],
                               ek_l[0, src], em_l[0, src], sigma, gamma,
                               cov_inv, neg)
            m, l = _fold_scores(s_e, eq_loc[src], em_l[0, src], m, l,
                                None, per, neg)
            return (m, l, kc), 0

        (m1, l1, _), _ = jax.lax.scan(body_a, (m1, l1, kb),
                                      jnp.arange(1, g))

        # pass B: second softmax over w_e + bias_e
        kp1 = None if keep_l is None else keep_l[0, :, 0, my]
        kp2 = None if keep_l is None else keep_l[1, :, 0, my]
        m2, l2, acc = _fold_biased_chunk(
            metric, q_l, k_l, v_l, eq_loc[my], ek_l[0, my], em_l[0, my],
            bias_l[0, my], m1, l1, m0, l0, acc0, per, sigma, gamma,
            cov_inv, neg, keep1=kp1, keep2=kp2, keep_inv=inv)

        def body_b(carry, step):
            m, l, acc, kc, vc = carry
            kc = jax.lax.ppermute(kc, GRAPH_AXIS, perm)
            vc = jax.lax.ppermute(vc, GRAPH_AXIS, perm)
            src = jax.lax.rem(my - step + g, g)
            k1 = None if keep_l is None else keep_l[0, :, 0, src]
            k2 = None if keep_l is None else keep_l[1, :, 0, src]
            m, l, acc = _fold_biased_chunk(
                metric, q_l, kc, vc, eq_loc[src], ek_l[0, src],
                em_l[0, src], bias_l[0, src], m1, l1, m, l, acc, per,
                sigma, gamma, cov_inv, neg, keep1=k1, keep2=k2,
                keep_inv=inv)
            return (m, l, acc, kc, vc), 0

        (m2, l2, acc, _, _), _ = jax.lax.scan(
            body_b, (m2, l2, acc, kb, vb), jnp.arange(1, g))
        denom = jnp.where(l2 > 0, l2, 1.0)
        return acc / denom[..., None]

    rep = P()
    base = (node_spec, node_spec, node_spec,
            edge_spec, edge_spec, edge_spec)
    if biased:
        specs = base + (edge_spec, bnd_spec, rep, rep, rep)
        if dropout_rate > 0.0:
            specs = specs + (keep2_spec,)
        return jax.shard_map(local_biased, mesh=mesh, in_specs=specs,
                             out_specs=node_spec)
    specs = base + (bnd_spec, rep, rep, rep)
    if dropout_rate > 0.0:
        specs = specs + (keep_spec,)
    return jax.shard_map(local, mesh=mesh, in_specs=specs,
                         out_specs=node_spec)


def make_boundary_ring_flash_attention(mesh: Mesh, metric: str, H: int,
                                       N: int, D: int,
                                       dropout_rate: float = 0.0):
    """Flash-local boundary ring (VERDICT r3 item 1): hop 0 runs each
    shard's DIAGONAL bucket — the bulk of the edges on a local graph —
    through the compact-mask flash Pallas kernel
    (`flash_geometric_attention_lse`), and the g-1 boundary hops fold
    the off-diagonal buckets through the scatter-free padded-degree
    partial (`ops.sparse._padded_partial`) against the circulating
    boundary compactions. Partials merge EXACTLY into the union
    softmax via their logsumexps (`merge_attention_partials`), so the
    result is bit-compatible with `make_boundary_ring_attention` — but
    the per-shard local math hits the MXU instead of serialized
    segment scatters. Fully differentiable (flash lse custom_vjp +
    padded-partial custom_vjp + XLA merge/ppermute).

    Returned signature:
        fn(q, k, v,
           dmask, djl, djc, djs, dil, dic, dis,     # ring_flash_diag
           onbr, onval, oinc, oincs, oival,         # ring_flash_off
           bnd_idx, sigma, gamma, cov_inv
           [, seeds, kap])                          # train mode
        -> [H, N, D] context (sharded by query owner)
    with the structure arrays from
    `SnapshotSequence.with_ring_plan(boundary=True)` (one snapshot's
    slice, leading G axis). In train mode ``seeds`` i32[G] drives the
    flash kernel's in-kernel hash dropout per shard and ``kap``
    f32[H, G, G, per, dmax] carries the off-diagonal buckets'
    inverted-dropout keep factors (query layout; the key walk reads
    the same mask through inc_slot).

    Metrics: the MXU-expressible set only — the model routes
    mahalanobis/manhattan to the segment-fold ring."""
    from ..ops import sparse as SP
    from ..ops.pallas.flash_geometric import (MXU_METRICS,
                                              flash_geometric_attention_lse)
    if metric not in MXU_METRICS:
        raise NotImplementedError(metric)
    g = mesh.shape[GRAPH_AXIS]
    assert N % g == 0, (N, g)
    per = N // g
    perm = [(i, (i + 1) % g) for i in range(g)]

    node_spec = P(None, GRAPH_AXIS, None)
    g1 = lambda extra: P(*((GRAPH_AXIS,) + (None,) * extra))  # noqa: E731
    rep = P()

    def local(q_l, k_l, v_l, dmask_l, djl_l, djc_l, djs_l, dil_l,
              dic_l, dis_l, onbr_l, onval_l, oinc_l, oincs_l, oival_l,
              bidx_l, sigma, gamma, cov_inv, seeds_l=None, kap_l=None):
        my = jax.lax.axis_index(GRAPH_AXIS)
        bm = dmask_l.shape[-2]
        bn = dmask_l.shape[-1]
        # flash scale convention: sigma for gaussian, gamma for rbf
        # (placeholders are all-ones, ignored by the other metrics)
        scale = sigma if metric == "gaussian_kernel" else gamma
        seed0 = None if seeds_l is None else seeds_l
        out0, lse0 = flash_geometric_attention_lse(
            q_l, k_l, v_l, dmask_l[0], metric=metric,
            scale_param=scale, block_m=bm, block_n=bn,
            plan=(djl_l[0], djc_l[0], djs_l[0]),
            plan_t=(dil_l[0], dic_l[0], dis_l[0]),
            dropout_rate=dropout_rate, dropout_seed=seed0)

        kb = jnp.take(k_l, bidx_l[0], axis=1)      # [H, Bp, D]
        vb = jnp.take(v_l, bidx_l[0], axis=1)

        def body(carry, step):
            out, lse, kc, vc = carry
            kc = jax.lax.ppermute(kc, GRAPH_AXIS, perm)
            vc = jax.lax.ppermute(vc, GRAPH_AXIS, perm)
            src = jax.lax.rem(my - step + g, g)
            kap_s = None if kap_l is None else kap_l[:, 0, src]
            part = SP._padded_partial(
                metric, q_l, kc, vc, onbr_l[0, src], onval_l[0, src],
                oinc_l[0, src], oincs_l[0, src], oival_l[0, src],
                kap_s, sigma, gamma, cov_inv)
            out, lse = SP.merge_attention_partials([(out, lse), part])
            return (out, lse, kc, vc), 0

        (out, _, _, _), _ = jax.lax.scan(
            body, (out0, lse0, kb, vb), jnp.arange(1, g))
        return out

    specs = (node_spec, node_spec, node_spec,
             g1(3), g1(2), g1(1), g1(2), g1(2), g1(1), g1(2),
             g1(3), g1(3), g1(3), g1(3), g1(3),
             g1(1), rep, rep, rep)
    if dropout_rate > 0.0:
        specs = specs + (P(GRAPH_AXIS),
                         P(None, GRAPH_AXIS, None, None, None))
    return jax.shard_map(local, mesh=mesh, in_specs=specs,
                         out_specs=node_spec, check_vma=False)


def make_boundary_ring_flash_attention_compact(
        mesh: Mesh, metric: str, H: int, N: int, D: int,
        n_buckets: int, dropout_rate: float = 0.0):
    """Flash-local boundary ring with COMPACT bipartite hop folds
    (round 5): like `make_boundary_ring_flash_attention` but the g-1
    off-diagonal folds run on degree-bucketed compact tables
    (`ops.sparse.edge_attention_partial_bipartite_compact`) instead of
    the padded [per, dmax] layout — per-hop gather work ~1.5x the
    cross-edge count instead of per*dmax (measured ~25x padding at a
    131K shard). Bit-compatible with the padded variant (union-exact
    lse merges; COO-exactness tested at the op level).

    Returned signature (one snapshot's slice):
        fn(q, k, v,
           dmask, djl, djc, djs, dil, dic, dis,     # diag (7)
           offc,                                    # nested buckets
           bnd_idx, sigma, gamma, cov_inv [, seeds])
        -> [H, N, D] context (sharded by query owner)
    ``offc`` is `SnapshotSequence.ring_flash_off_c`'s per-snapshot
    slice (tuple of per-bucket 6-tuples, leading [G, G] axes). In
    train mode ``seeds`` i32[G] drives both the diag kernel's hash
    dropout and the folds' per-hop/bucket keep draws."""
    from ..ops import sparse as SP
    from ..ops.pallas.flash_geometric import (MXU_METRICS,
                                              flash_geometric_attention_lse)
    if metric not in MXU_METRICS:
        raise NotImplementedError(metric)
    g = mesh.shape[GRAPH_AXIS]
    assert N % g == 0, (N, g)
    perm = [(i, (i + 1) % g) for i in range(g)]

    node_spec = P(None, GRAPH_AXIS, None)
    g1 = lambda extra: P(*((GRAPH_AXIS,) + (None,) * extra))  # noqa: E731
    rep = P()

    def local(q_l, k_l, v_l, dmask_l, djl_l, djc_l, djs_l, dil_l,
              dic_l, dis_l, offc_l, bidx_l, sigma, gamma, cov_inv,
              seeds_l=None):
        my = jax.lax.axis_index(GRAPH_AXIS)
        bm = dmask_l.shape[-2]
        bn = dmask_l.shape[-1]
        scale = sigma if metric == "gaussian_kernel" else gamma
        seed0 = None if seeds_l is None else seeds_l
        out0, lse0 = flash_geometric_attention_lse(
            q_l, k_l, v_l, dmask_l[0], metric=metric,
            scale_param=scale, block_m=bm, block_n=bn,
            plan=(djl_l[0], djc_l[0], djs_l[0]),
            plan_t=(dil_l[0], dic_l[0], dis_l[0]),
            dropout_rate=dropout_rate, dropout_seed=seed0)

        kb = jnp.take(k_l, bidx_l[0], axis=1)      # [H, Bp, D]
        vb = jnp.take(v_l, bidx_l[0], axis=1)

        def body(carry, step):
            out, lse, kc, vc = carry
            kc = jax.lax.ppermute(kc, GRAPH_AXIS, perm)
            vc = jax.lax.ppermute(vc, GRAPH_AXIS, perm)
            src = jax.lax.rem(my - step + g, g)
            buckets = [tuple(a[0, src] for a in b) for b in offc_l]
            rng = None
            if seeds_l is not None and dropout_rate > 0.0:
                rng = jax.random.fold_in(
                    jax.random.key(seeds_l[0]), step)
            part = SP.edge_attention_partial_bipartite_compact(
                metric, q_l, kc, vc, buckets, sigma=sigma,
                gamma=gamma, cov_inv=cov_inv,
                dropout_rate=dropout_rate, dropout_rng=rng)
            out, lse = SP.merge_attention_partials([(out, lse), part])
            return (out, lse, kc, vc), 0

        (out, _, _, _), _ = jax.lax.scan(
            body, (out0, lse0, kb, vb), jnp.arange(1, g))
        return out

    offc_spec = tuple((g1(2), g1(3), g1(3), g1(3), g1(3), g1(3))
                      for _ in range(n_buckets))
    specs = (node_spec, node_spec, node_spec,
             g1(3), g1(2), g1(1), g1(2), g1(2), g1(1), g1(2),
             offc_spec, g1(1), rep, rep, rep)
    if dropout_rate > 0.0:
        specs = specs + (P(GRAPH_AXIS),)
    return jax.shard_map(local, mesh=mesh, in_specs=specs,
                         out_specs=node_spec, check_vma=False)


def make_boundary_ring_flash_biased_attention(mesh: Mesh, metric: str,
                                              H: int, N: int, D: int,
                                              dropout_rate: float = 0.0):
    """Edge-BIASED flash-local boundary ring (round 5, VERDICT r4
    item 2): the dense path's geometric-bias double softmax
    (geometric_attention.py:567-575) with each shard's diagonal bucket
    through the Pallas flash kernels and the boundary folds
    scatter-free — composed from differentiable partials:

      pass A   union lse1 = flash lse (diag) ⊕ per-hop bipartite score
               logsumexps, folded by logaddexp (`_lse_union`)
      pass B   `flash_biased_partial_lse` (diag, bias in the compact
               block store scattered per shard) merged over lse2 with
               per-hop `_res_biased_partial` folds (bias through the
               padded tables' obid provenance)

    Gradients — including through the union statistics — assemble by
    plain autodiff over the partials' custom_vjps (the compositional
    identity tested in tests/test_hybrid.py::
    test_flash_biased_partial_compositional).

    Returned signature (one snapshot's slice):
        fn(q, k, v,
           dmask, djl, djc, djs, dil, dic, dis, eslot,  # diag (8)
           onbr, onval, oinc, oincs, oival, obid,       # off (6)
           eq, ek, em, esrc,                            # raw buckets
           b_all,                                       # f32[E] bias/edge
           bidx, sigma, gamma, cov_inv
           [, seeds, kap1, kap2])                       # train mode
        -> [H, N, D] context (sharded by query owner)
    ``seeds`` i32[G, 2] drives the diag kernels' two hash-PRNG drops;
    ``kap1``/``kap2`` f32[H, G, G, per, dmax] carry the off-diagonal
    inverted-dropout keep factors (query layout)."""
    from ..ops import sparse as SP
    from ..ops.pallas import hybrid_biased as HB
    from ..ops.pallas.flash_geometric import (
        MXU_METRICS, _COSINE, _l2_normalize,
        flash_geometric_attention_lse)
    if metric not in MXU_METRICS:
        raise NotImplementedError(metric)
    g = mesh.shape[GRAPH_AXIS]
    assert N % g == 0, (N, g)
    per = N // g
    perm = [(i, (i + 1) % g) for i in range(g)]

    node_spec = P(None, GRAPH_AXIS, None)
    g1 = lambda extra: P(*((GRAPH_AXIS,) + (None,) * extra))  # noqa: E731
    rep = P()

    def local(q_l, k_l, v_l, dmask_l, djl_l, djc_l, djs_l, dil_l,
              dic_l, dis_l, eslot_l, onbr_l, onval_l, oinc_l, oincs_l,
              oival_l, obid_l, eq_l, ek_l, em_l, esrc_l, b_all,
              bidx_l, sigma, gamma, cov_inv, seeds_l=None, kap1_l=None,
              kap2_l=None):
        my = jax.lax.axis_index(GRAPH_AXIS)
        bm = dmask_l.shape[-2]
        bn = dmask_l.shape[-1]
        S_l = dmask_l.shape[-3]
        scale = sigma if metric == "gaussian_kernel" else gamma
        E = b_all.shape[0]
        if metric in _COSINE:
            # one convention everywhere: the flash kernel normalizes
            # internally (idempotent on unit rows); the bipartite
            # score helpers expect pre-normalized operands
            q_l = _l2_normalize(q_l)
            k_l = _l2_normalize(k_l)

        # diag bias store: bucket provenance -> per-edge values ->
        # compact block slots (invalid entries route out of bounds)
        ed = esrc_l[0, my]
        bvals = jnp.where(ed >= 0, b_all[jnp.clip(ed, 0, E - 1)], 0.0)
        qloc = eq_l[0, my] - my * per
        kloc = ek_l[0, my]
        valid = em_l[0, my] & (eslot_l[0] >= 0)
        sl = jnp.where(valid, eslot_l[0], S_l)
        store = jnp.zeros((S_l, bm, bn), jnp.float32).at[
            sl, qloc % bm, kloc % bn].add(
            jnp.where(valid, bvals, 0.0), mode="drop")

        dplan = (djl_l[0], djc_l[0], djs_l[0])
        dplan_t = (dil_l[0], dic_l[0], dis_l[0])

        # pass A: union first-softmax logsumexp (undropped by
        # definition — dropout acts on normalized weights)
        _, lse1 = flash_geometric_attention_lse(
            q_l, k_l, v_l, dmask_l[0], metric=metric,
            scale_param=scale, block_m=bm, block_n=bn,
            plan=dplan, plan_t=dplan_t)
        kb = jnp.take(k_l, bidx_l[0], axis=1)      # [H, Bp, D]
        vb = jnp.take(v_l, bidx_l[0], axis=1)

        def body_a(carry, step):
            l1, kc = carry
            kc = jax.lax.ppermute(kc, GRAPH_AXIS, perm)
            src = jax.lax.rem(my - step + g, g)
            lse_h = HB._res_lse1(metric, q_l, kc, onbr_l[0, src],
                                 onval_l[0, src], scale, D)
            return (HB._lse_union(l1, lse_h), kc), 0

        (lse1_u, _), _ = jax.lax.scan(body_a, (lse1, kb),
                                      jnp.arange(1, g))

        # pass B: biased partials of the second softmax, merged exactly
        band = HB.flash_biased_partial_lse(
            q_l, k_l, v_l, dmask_l[0], dplan, dplan_t, store, lse1_u,
            metric=metric, scale_param=scale, block_m=bm, block_n=bn,
            dropout_rate=dropout_rate, dropout_seeds=seeds_l)

        def body_b(carry, step):
            out, lse, kc, vc = carry
            kc = jax.lax.ppermute(kc, GRAPH_AXIS, perm)
            vc = jax.lax.ppermute(vc, GRAPH_AXIS, perm)
            src = jax.lax.rem(my - step + g, g)
            ob = obid_l[0, src]
            tab = jnp.where(ob >= 0,
                            b_all[jnp.clip(ob, 0, E - 1)], 0.0)
            k1 = None if kap1_l is None else kap1_l[:, 0, src]
            k2 = None if kap2_l is None else kap2_l[:, 0, src]
            part = HB._res_biased_partial(
                metric, q_l, kc, vc, onbr_l[0, src], onval_l[0, src],
                tab, lse1_u, k1, k2, scale, D)
            out, lse = SP.merge_attention_partials([(out, lse), part])
            return (out, lse, kc, vc), 0

        (out, _, _, _), _ = jax.lax.scan(
            body_b, (band[0], band[1], kb, vb), jnp.arange(1, g))
        return out

    specs = (node_spec, node_spec, node_spec,
             g1(3), g1(2), g1(1), g1(2), g1(2), g1(1), g1(2), g1(1),
             g1(3), g1(3), g1(3), g1(3), g1(3), g1(3),
             g1(2), g1(2), g1(2), g1(2), rep,
             g1(1), rep, rep, rep)
    if dropout_rate > 0.0:
        specs = specs + (g1(1),
                         P(None, GRAPH_AXIS, None, None, None),
                         P(None, GRAPH_AXIS, None, None, None))
    return jax.shard_map(local, mesh=mesh, in_specs=specs,
                         out_specs=node_spec, check_vma=False)


def boundary_traffic_report(N: int, num_shards: int, Bp: int, H: int,
                            D: int, beta: float,
                            bytes_per_el: int = 4) -> dict:
    """Per-layer ring traffic: full-chunk circulation vs boundary-only
    (the measured reduction VERDICT/SURVEY §2.9 asks to track)."""
    per = N // num_shards
    hops = num_shards - 1
    full = 2 * H * per * D * hops * bytes_per_el        # K and V
    bnd = 2 * H * Bp * D * hops * bytes_per_el
    return {
        "bytes_full_ring": int(full),
        "bytes_boundary_ring": int(bnd),
        "padded_reduction": full / max(bnd, 1),
        "beta_true": beta,
        "true_reduction": 1.0 / max(beta, 1e-9),
    }
