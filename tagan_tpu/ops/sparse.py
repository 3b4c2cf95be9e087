"""Sparse attention ops: SDDMM, segment softmax, SpMM (XLA reference path).

The reference densifies every snapshot's edge list into an N x N mask and
runs full dense attention (`/root/reference/src/tagan/layers/graph_attention.py:96-105`
+ `geometric_attention.py:351-516`). The computation is structurally an
SDDMM (one score per edge per head) -> per-destination segment softmax ->
SpMM (edge-weighted neighbor aggregation). This module implements that
pipeline in pure XLA (gather / segment_sum) — the correctness oracle and
small-graph fallback. The Pallas TPU kernels in
``tagan_tpu.ops.pallas`` implement the same interface for the hot path.

Edge convention (matches `core.graph.SnapshotSequence`): an edge
(src=i, dst=j) in ``adj[i, j]`` means query/row i attends to key j, i.e.
for attention, scores are computed per (edge_q=i, edge_k=j) pair and the
softmax normalizes over all edges sharing the same *query* i (plus the
self loop the adapter adds).
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp

from .distances import edgewise_scores
from .masked import NEG_INF


def sddmm(
    metric: str,
    q: jax.Array,        # [H, N, D]
    k: jax.Array,        # [H, N, D]
    edge_q: jax.Array,   # i32[E] query node per edge
    edge_k: jax.Array,   # i32[E] key node per edge
    *,
    sigma: Optional[jax.Array] = None,
    gamma: Optional[jax.Array] = None,
    cov_inv: Optional[jax.Array] = None,
) -> jax.Array:
    """Sampled dense-dense matmul: per-edge, per-head attention scores.
    Returns [H, E]."""
    q_e = jnp.take(q, edge_q, axis=1)   # [H, E, D]
    k_e = jnp.take(k, edge_k, axis=1)
    return edgewise_scores(metric, q_e, k_e, sigma=sigma, gamma=gamma,
                           cov_inv=cov_inv)


def segment_softmax(
    scores: jax.Array,     # [H, E]
    edge_q: jax.Array,     # i32[E]
    edge_mask: jax.Array,  # bool[E]
    num_nodes: int,
) -> jax.Array:
    """Softmax over all valid edges sharing a query node. Returns [H, E]
    with zeros on masked edges."""
    neg = jnp.asarray(NEG_INF, scores.dtype)
    s = jnp.where(edge_mask[None, :], scores, neg)
    seg_max = jax.ops.segment_max(s.T, edge_q, num_segments=num_nodes)  # [N, H]
    seg_max = jnp.where(seg_max <= neg * 0.5, 0.0, seg_max)
    centered = s - jnp.take(seg_max, edge_q, axis=0).T
    e = jnp.exp(centered) * edge_mask[None, :].astype(scores.dtype)
    denom = jax.ops.segment_sum(e.T, edge_q, num_segments=num_nodes)  # [N, H]
    denom = jnp.where(denom == 0, 1.0, denom)
    return e / jnp.take(denom, edge_q, axis=0).T


def spmm(
    weights: jax.Array,    # [H, E] attention weights
    v: jax.Array,          # [H, N, D] values
    edge_q: jax.Array,     # i32[E]
    edge_k: jax.Array,     # i32[E]
    num_nodes: int,
) -> jax.Array:
    """Edge-weighted neighbor aggregation: out[h, i] = sum_e w[h,e] v[h, k_e]
    over edges with q_e == i. Returns [H, N, D]."""
    v_e = jnp.take(v, edge_k, axis=1)                 # [H, E, D]
    contrib = weights[:, :, None] * v_e               # [H, E, D]
    # segment-sum per head over query ids
    def per_head(c):
        return jax.ops.segment_sum(c, edge_q, num_segments=num_nodes)
    return jax.vmap(per_head)(contrib)


def edge_attention(
    metric: str,
    q: jax.Array, k: jax.Array, v: jax.Array,   # [H, N, D]
    edge_q: jax.Array, edge_k: jax.Array, edge_mask: jax.Array,
    num_nodes: int,
    *,
    sigma=None, gamma=None, cov_inv=None,
    edge_bias: Optional[jax.Array] = None,       # [E] or [H, E]
    dropout_rate: float = 0.0,
    dropout_rng: Optional[jax.Array] = None,
) -> jax.Array:
    """Full sparse attention: SDDMM -> segment softmax -> SpMM.
    Returns [H, N, D] aggregated context per query node.

    ``edge_bias`` implements the dense path's geometric-bias re-softmax
    (geometric_attention.py:567-575, mask-restricted like
    nn.geometric.GeometricAttention) in O(E): the softmaxed weights get
    the per-edge bias added and are re-normalized per query segment.
    ``dropout_rate`` applies inverted dropout to the normalized edge
    weights (the reference's softmax-weight dropout, :474-516) — after
    the first softmax and, when biased, again after the re-softmax,
    matching the dense path's op order exactly."""
    import jax as _jax

    def _drop(w, rng):
        keep = 1.0 - dropout_rate
        m = _jax.random.bernoulli(rng, keep, w.shape)
        return jnp.where(m, w / keep, 0.0)

    scores = sddmm(metric, q, k, edge_q, edge_k, sigma=sigma, gamma=gamma,
                   cov_inv=cov_inv)
    w = segment_softmax(scores, edge_q, edge_mask, num_nodes)
    r1 = r2 = None
    if dropout_rate > 0.0 and dropout_rng is not None:
        r1, r2 = _jax.random.split(dropout_rng)
        w = _drop(w, r1)
    if edge_bias is not None:
        b = edge_bias if edge_bias.ndim == 2 else edge_bias[None, :]
        w = segment_softmax(w + b, edge_q, edge_mask, num_nodes)
        if r2 is not None:
            w = _drop(w, r2)
    return spmm(w, v, edge_q, edge_k, num_nodes)


def edge_attention_partial(
    metric: str,
    q: jax.Array, k: jax.Array, v: jax.Array,   # [H, N, D]
    edge_q: jax.Array, edge_k: jax.Array, edge_mask: jax.Array,
    num_nodes: int,
    *,
    sigma=None, gamma=None, cov_inv=None,
    dropout_rate: float = 0.0,
    dropout_rng: Optional[jax.Array] = None,
):
    """Partial sparse attention over ONE edge subset: returns
    ``(out, lse)`` where ``out`` [H, N, D] is the softmax-normalized
    aggregation over *these edges only* and ``lse`` [H, N] is the
    per-query logsumexp of their scores (``NEG_INF`` where a query has
    no valid edge). Combine partials over disjoint edge subsets with
    `merge_attention_partials` — exactly equal to one softmax over the
    union (the flash-combine identity). Dropout applies to the
    normalized weights; since dropping is linear in the weight, a
    dropped partial merges into a dropped union softmax exactly.

    No self loops are added here — callers decide which subset owns the
    diagonal (the hybrid backend puts it in the band part)."""
    scores = sddmm(metric, q, k, edge_q, edge_k, sigma=sigma, gamma=gamma,
                   cov_inv=cov_inv)
    neg = jnp.asarray(NEG_INF, scores.dtype)
    s = jnp.where(edge_mask[None, :], scores, neg)
    seg_max = jax.ops.segment_max(s.T, edge_q,
                                  num_segments=num_nodes)       # [N, H]
    dead = seg_max <= neg * 0.5
    m_safe = jnp.where(dead, 0.0, seg_max)
    e = jnp.exp(s - jnp.take(m_safe, edge_q, axis=0).T) \
        * edge_mask[None, :].astype(scores.dtype)
    denom = jax.ops.segment_sum(e.T, edge_q,
                                num_segments=num_nodes)          # [N, H]
    safe_denom = jnp.where(denom == 0, 1.0, denom)
    w = e / jnp.take(safe_denom, edge_q, axis=0).T
    if dropout_rate > 0.0 and dropout_rng is not None:
        keep = 1.0 - dropout_rate
        mkeep = jax.random.bernoulli(dropout_rng, keep, w.shape)
        w = jnp.where(mkeep, w / keep, 0.0)
    out = spmm(w, v, edge_q, edge_k, num_nodes)
    lse = jnp.where(dead, neg, m_safe + jnp.log(safe_denom)).T   # [H, N]
    return out, lse


def merge_attention_partials(parts):
    """Merge partial attentions over disjoint edge subsets into the
    exact union softmax: ``parts`` is a sequence of ``(out, lse)`` with
    out [H, N, D] normalized within its subset and lse [H, N] the
    subset logsumexp. Dead-row conventions of both producers are
    honored: the csr partial marks dead rows with a large NEGATIVE lse
    (`ops.masked.NEG_INF`), the flash kernel with a large POSITIVE one
    (`flash_geometric.LSE_DEAD`) — any |lse| >= 1e29 counts as dead.

    Returns (out, lse) with out 0 / lse NEG_INF on rows dead in every
    part. Fully differentiable (the max is stop-gradient'd — the merged
    output is analytically invariant to the shift)."""
    outs = [o for o, _ in parts]
    lses = []
    for _, lse in parts:
        dead = jnp.abs(lse) >= 1e29
        lses.append(jnp.where(dead, NEG_INF, lse))
    m = lses[0]
    for lse in lses[1:]:
        m = jnp.maximum(m, lse)
    all_dead = m <= NEG_INF * 0.5
    m_safe = jax.lax.stop_gradient(jnp.where(all_dead, 0.0, m))
    # exp(NEG_INF - m_safe) underflows to exactly 0 for dead parts
    ws = [jnp.exp(lse - m_safe) for lse in lses]
    denom = sum(ws)
    safe_denom = jnp.where(denom == 0, 1.0, denom)
    out = sum(o * w[..., None] for o, w in zip(outs, ws)) \
        / safe_denom[..., None]
    out = jnp.where(all_dead[..., None], 0.0, out)
    lse = jnp.where(all_dead, NEG_INF, m_safe + jnp.log(safe_denom))
    return out, lse


def add_self_loops(edge_q: jax.Array, edge_k: jax.Array, edge_mask: jax.Array,
                   node_mask: jax.Array):
    """Append one self-loop edge per active node (the dense adapter adds
    eye(), graph_attention.py:102). Returns extended (edge_q, edge_k,
    edge_mask) with E + N entries."""
    n = node_mask.shape[0]
    loops = jnp.arange(n, dtype=edge_q.dtype)
    return (jnp.concatenate([edge_q, loops]),
            jnp.concatenate([edge_k, loops]),
            jnp.concatenate([edge_mask, node_mask]))


# ---------------------------------------------------------------------------
# Padded-degree residual partial (scatter-free: the TPU-native layout)
# ---------------------------------------------------------------------------
#
# The COO `edge_attention_partial` pays per-edge segment_max/segment_sum
# scatters, which serialize on TPU (~20 ns/update — they dominate the
# hybrid backend's 131K-node step). The padded layout stores each
# query's residual neighbors in a dense [N, dmax] table (and each key's
# incident queries in [N, dmax_t]) so EVERY op is a gather or a dense
# axis reduction: no scatter in forward OR backward (the backward uses
# the transposed table, the same two-walk idea as the flash kernel's
# dq vs dk/dv walks). Exactly equal to the COO partial; combine with
# `merge_attention_partials` as usual.


def _pp_exp(s, lse, valid, neg):
    """Normalized weights exp(s - lse) with dead/padded rows sanitized
    BEFORE the exp (a padded slot may gather a NEG_INF lse; exp of the
    raw difference would overflow to inf and poison the 0-mask)."""
    lse_safe = jnp.where(jnp.abs(lse) >= 1e29, 0.0, lse)
    expo = jnp.where(valid, s - lse_safe, neg)
    return jnp.exp(expo)


def _pp_params3(sigma, gamma, cov_inv):
    """edgewise_scores assumes [H, E] scores; the padded layout is
    [H, N, dmax] — give the per-head params one extra broadcast axis."""
    sg = None if sigma is None else sigma[..., None]
    gm = None if gamma is None else gamma[..., None]
    cv = None if cov_inv is None else cov_inv[:, None]
    return sg, gm, cv


def _pp_gather(ops, idx):
    """Gather rows jointly in NODE-MAJOR layout: ``ops`` is a list of
    [H, N, Dx] arrays sharing the same row indices ``idx`` [R, W].
    Returns the gathered arrays, each [H, R, W, Dx].

    Why: `jnp.take(x, idx, axis=1)` on an [H, N, D] operand makes every
    index fetch H strided D-row slices (H tiny non-contiguous reads per
    index — measured 274 ms/layer-pass for the 131K residual, VERDICT
    r4 item 2). Concatenating the operands feature-wise and
    transposing node-major first makes each index ONE contiguous
    H*sum(Dx) read; the layout shuffles are dense [N, H*D] transposes
    (bandwidth-trivial next to the gather)."""
    H, N = ops[0].shape[:2]
    R, W = idx.shape
    widths = [o.shape[-1] for o in ops]
    cat = ops[0] if len(ops) == 1 else jnp.concatenate(ops, axis=-1)
    nm = jnp.moveaxis(cat, 0, 1).reshape(N, H * sum(widths))
    g = jnp.take(nm, idx.reshape(-1), axis=0)
    g = g.reshape(R, W, H, sum(widths))
    g = jnp.moveaxis(g, 2, 0)                       # [H, R, W, sum]
    outs = []
    o0 = 0
    for w in widths:
        outs.append(g[..., o0:o0 + w])
        o0 += w
    return outs


def _pp_score_q(metric, q, k, nbr, sigma, gamma, cov_inv, k_e=None):
    """Scores in the query layout: [H, N, dmax]. ``k_e`` passes a
    pre-gathered neighbor operand (so callers can fuse its gather with
    others and so vjp over q treats it as constant)."""
    sg, gm, cv = _pp_params3(sigma, gamma, cov_inv)
    if k_e is None:
        (k_e,) = _pp_gather([k], nbr)               # [H, N, dmax, D]
    q_b = jnp.broadcast_to(q[:, :, None, :], k_e.shape)
    return edgewise_scores(metric, q_b, k_e, sigma=sg, gamma=gm,
                           cov_inv=cv)


def _pp_score_k(metric, q, k, inc, sigma, gamma, cov_inv, q_e=None):
    """Scores in the key layout: [H, N, dmax_t] (row = key node)."""
    sg, gm, cv = _pp_params3(sigma, gamma, cov_inv)
    if q_e is None:
        (q_e,) = _pp_gather([q], inc)               # [H, N, dmax_t, D]
    k_b = jnp.broadcast_to(k[:, :, None, :], q_e.shape)
    return edgewise_scores(metric, q_e, k_b, sigma=sg, gamma=gm,
                           cov_inv=cv)


def _padded_partial_impl(metric, q, k, v, nbr, nval, kappa, sigma,
                         gamma, cov_inv, with_edges=False):
    neg = jnp.asarray(NEG_INF, q.dtype)
    k_e, v_e = _pp_gather([k, v], nbr)              # ONE fused gather
    s = _pp_score_q(metric, q, k, nbr, sigma, gamma, cov_inv, k_e=k_e)
    s = jnp.where(nval[None], s, neg)               # [H, N, dmax]
    m = jnp.max(s, axis=-1)                         # [H, N]
    dead = m <= neg * 0.5
    m_safe = jnp.where(dead, 0.0, m)
    e = jnp.exp(s - m_safe[..., None]) * nval[None]
    l = jnp.sum(e, axis=-1)
    l_safe = jnp.where(l == 0, 1.0, l)
    p = e / l_safe[..., None]
    pk = p if kappa is None else p * kappa
    out = jnp.sum(pk[..., None] * v_e, axis=-2)
    lse = jnp.where(dead, neg, m_safe + jnp.log(l_safe))
    if with_edges:
        return out, lse, k_e, v_e
    return out, lse


from functools import partial as _partial


@_partial(jax.custom_vjp, nondiff_argnums=(0,))
def _padded_partial(metric, q, k, v, nbr, nval, inc, inc_slot, ival,
                    kappa, sigma, gamma, cov_inv):
    return _padded_partial_impl(metric, q, k, v, nbr, nval, kappa,
                                sigma, gamma, cov_inv)


def _padded_partial_fwd(metric, q, k, v, nbr, nval, inc, inc_slot,
                        ival, kappa, sigma, gamma, cov_inv):
    # the fused neighbor gather rides the residuals: its ~table-size
    # serialized indices (~20-30 ns each) cost more to replay in
    # backward than the [H, N, dmax, 2D] buffer costs to hold
    out, lse, k_e, v_e = _padded_partial_impl(
        metric, q, k, v, nbr, nval, kappa, sigma, gamma, cov_inv,
        with_edges=True)
    res = (q, k, v, nbr, nval, inc, inc_slot, ival, kappa, sigma,
           gamma, cov_inv, out, lse, k_e, v_e)
    return (out, lse), res


def _padded_partial_bwd(metric, res, cts):
    (q, k, v, nbr, nval, inc, inc_slot, ival, kappa, sigma, gamma,
     cov_inv, out, lse, k_e, v_e) = res
    dout, dlse = cts
    neg = jnp.asarray(NEG_INF, q.dtype)
    delta = jnp.sum(dout * out, axis=-1)            # [H, N] = dout.out

    def score_q(qq, sg, gm, cv):
        return _pp_score_q(metric, qq, k, nbr, sg, gm, cv, k_e=k_e)

    s, vjp_q = jax.vjp(score_q, q, sigma, gamma, cov_inv)
    p = _pp_exp(s, lse[..., None], nval[None], neg)     # normalized w
    dv_dot = jnp.sum(dout[:, :, None, :] * v_e, axis=-1)  # dout_i.v_j
    if kappa is not None:
        dv_dot = kappa * dv_dot
    ds = p * (dv_dot - delta[..., None] + dlse[..., None])
    ds = jnp.where(nval[None], ds, 0.0)
    dq, dsigma, dgamma, dcov = vjp_q(ds)

    # -- key walk: transposed table -> (dk, dv), no scatter. All the
    # per-incident-edge operands (queries, output cotangents, row
    # statistics) ride ONE fused node-major gather over `inc`.
    q_e, dout_i, stats_i = _pp_gather(
        [q, dout, jnp.stack([lse, delta, dlse], axis=-1)], inc)
    lse_i = stats_i[..., 0]
    delta_i = stats_i[..., 1]
    dlse_i = stats_i[..., 2]

    def score_k(kk):
        return _pp_score_k(metric, q, kk, inc, sigma, gamma, cov_inv,
                           q_e=q_e)

    s_t, vjp_k = jax.vjp(score_k, k)                # [H, N, dmax_t]
    p_t = _pp_exp(s_t, lse_i, ival[None], neg)
    if kappa is not None:
        # the SAME keep factors, read through the edge's query-layout
        # slot (one linearized gather; dropout-only cost)
        H = q.shape[0]
        kap_nm = jnp.moveaxis(kappa, 0, -1).reshape(-1, H)
        idx2 = (inc * nbr.shape[1] + inc_slot).reshape(-1)
        kap_t = jnp.moveaxis(
            jnp.take(kap_nm, idx2, axis=0).reshape(
                inc.shape[0], inc.shape[1], H), 2, 0)
    else:
        kap_t = None
    pk = p_t if kap_t is None else p_t * kap_t
    pk = jnp.where(ival[None], pk, 0.0)
    dv = jnp.sum(pk[..., None] * dout_i, axis=-2)   # [H, N, D] keys
    qv_dot = jnp.sum(dout_i * v[:, :, None, :], axis=-1)   # dout_i.v_j
    if kap_t is not None:
        qv_dot = kap_t * qv_dot
    ds_t = p_t * (qv_dot - delta_i + dlse_i)
    ds_t = jnp.where(ival[None], ds_t, 0.0)
    (dk,) = vjp_k(ds_t)

    return (dq, dk, dv, None, None, None, None, None, None,
            dsigma, dgamma, dcov)


_padded_partial.defvjp(_padded_partial_fwd, _padded_partial_bwd)


def edge_attention_partial_padded_compact(
    metric: str,
    q: jax.Array, k: jax.Array, v: jax.Array,   # [H, N, D]
    buckets,            # from core.graph.compact_padded_residual
    *,
    sigma=None, gamma=None, cov_inv=None,
    dropout_rate: float = 0.0,
    dropout_rng: Optional[jax.Array] = None,
):
    """`edge_attention_partial` on degree-bucketed COMPACT padded
    tables: each bucket holds a disjoint query subset with rows
    compacted to active queries/keys (gather work ~1.5x the edge count
    instead of N*dmax — see `core.graph.compact_padded_residual`).
    Buckets partition the query set, so their partials combine by plain
    row-disjoint union (no softmax merge needed). Returns the same
    ``(out [H, N, D], lse [H, N])`` as the uncompacted variant."""
    H, N, D = q.shape
    Dv = v.shape[-1]
    # node-major accumulation buffer: out and lse ride ONE scatter per
    # bucket with contiguous H*(Dv+1) rows (a [H, N, D]-layout scatter
    # pays H strided updates per index — the same serialization the
    # _pp_gather comment describes, on the write side)
    acc = jnp.concatenate(
        [jnp.zeros((N, H * Dv), q.dtype),
         jnp.full((N, H), NEG_INF, q.dtype)], axis=-1)
    for b, (qid, nbr, nval, kid, inc, inc_slot, ival, *_bid) in \
            enumerate(buckets):
        (q_c,) = _pp_gather([q], jnp.minimum(qid, N - 1)[:, None])
        q_c = q_c[:, :, 0]
        kid_safe = jnp.minimum(kid, N - 1)[:, None]
        k_c, v_c = _pp_gather([k, v], kid_safe)    # ONE fused gather
        k_c = k_c[:, :, 0]
        v_c = v_c[:, :, 0]
        if dropout_rate > 0.0 and dropout_rng is not None:
            keep_p = 1.0 - dropout_rate
            mk = jax.random.bernoulli(
                jax.random.fold_in(dropout_rng, b), keep_p,
                (H,) + nbr.shape)
            kappa = jnp.where(mk, 1.0 / keep_p, 0.0)
        else:
            kappa = None
        sg = sigma if sigma is not None else jnp.ones((H,), q.dtype)
        gm = gamma if gamma is not None else jnp.ones((H,), q.dtype)
        cv = cov_inv if cov_inv is not None else jnp.broadcast_to(
            jnp.eye(q.shape[-1], dtype=q.dtype),
            (H, q.shape[-1], q.shape[-1]))
        out_c, lse_c = _padded_partial(
            metric, q_c, k_c, v_c, nbr, nval, inc, inc_slot, ival,
            kappa, sg, gm, cv)
        val = jnp.concatenate(
            [jnp.moveaxis(out_c, 0, 1).reshape(qid.shape[0], H * Dv),
             lse_c.T], axis=-1)
        # sentinel rows (qid == N) drop out of bounds
        acc = acc.at[qid].set(val, mode="drop")
    out = jnp.moveaxis(acc[:, :H * Dv].reshape(N, H, Dv), 1, 0)
    lse = acc[:, H * Dv:].T
    return out, lse


def edge_attention_partial_bipartite_compact(
    metric: str,
    q: jax.Array,                    # [H, n_q, D]
    k: jax.Array, v: jax.Array,      # [H, n_k, D] (e.g. a circulating
                                     # boundary compaction)
    buckets,         # from core.graph.compact_bipartite_edges
    *,
    sigma=None, gamma=None, cov_inv=None,
    dropout_rate: float = 0.0,
    dropout_rng: Optional[jax.Array] = None,
):
    """`edge_attention_partial` over a BIPARTITE edge set on
    degree-bucketed compact tables (round 5 — the ring's boundary hop
    folds): queries index q's [n_q] rows, keys index k/v's [n_k] rows;
    gather work ~1.5x the edge count instead of n_q * dmax. Buckets
    partition the query set, so partials combine by row-disjoint
    union. Returns ``(out [H, n_q, Dv], lse [H, n_q])`` with LSE on
    the csr dead-row convention."""
    H, Nq, D = q.shape
    Dv = v.shape[-1]
    acc = jnp.concatenate(
        [jnp.zeros((Nq, H * Dv), q.dtype),
         jnp.full((Nq, H), NEG_INF, q.dtype)], axis=-1)
    sg = sigma if sigma is not None else jnp.ones((H,), q.dtype)
    gm = gamma if gamma is not None else jnp.ones((H,), q.dtype)
    cv = cov_inv if cov_inv is not None else jnp.broadcast_to(
        jnp.eye(D, dtype=q.dtype), (H, D, D))
    for b, (qid, nbr, nval, inc, inc_slot, ival) in enumerate(buckets):
        (q_c,) = _pp_gather([q], jnp.minimum(qid, Nq - 1)[:, None])
        q_c = q_c[:, :, 0]
        if dropout_rate > 0.0 and dropout_rng is not None:
            keep_p = 1.0 - dropout_rate
            mk = jax.random.bernoulli(
                jax.random.fold_in(dropout_rng, b), keep_p,
                (H,) + tuple(nbr.shape))
            kappa = jnp.where(mk, 1.0 / keep_p, 0.0)
        else:
            kappa = None
        out_c, lse_c = _padded_partial(
            metric, q_c, k, v, nbr, nval, inc, inc_slot, ival,
            kappa, sg, gm, cv)
        val = jnp.concatenate(
            [jnp.moveaxis(out_c, 0, 1).reshape(qid.shape[0], H * Dv),
             lse_c.T], axis=-1)
        acc = acc.at[qid].set(val, mode="drop")
    out = jnp.moveaxis(acc[:, :H * Dv].reshape(Nq, H, Dv), 1, 0)
    lse = acc[:, H * Dv:].T
    return out, lse


def edge_attention_partial_padded(
    metric: str,
    q: jax.Array, k: jax.Array, v: jax.Array,   # [H, N, D]
    nbr: jax.Array, nval: jax.Array,            # i32/bool [N, dmax]
    inc: jax.Array, inc_slot: jax.Array,        # i32 [N, dmax_t]
    ival: jax.Array,                            # bool [N, dmax_t]
    *,
    sigma=None, gamma=None, cov_inv=None,
    dropout_rate: float = 0.0,
    dropout_rng: Optional[jax.Array] = None,
):
    """`edge_attention_partial` on the padded-degree layout (see module
    comment): returns the same ``(out [H, N, D], lse [H, N])``.
    ``nbr``/``inc``/``inc_slot`` come from
    `core.graph.pad_residual_edges`; dropout drops the normalized
    weights (denominator keeps the full sum), identical to the COO
    partial — the keep mask is drawn once in the query layout and the
    backward reads the SAME mask through ``inc_slot``."""
    H, N, D = q.shape
    dmax = nbr.shape[1]
    if dropout_rate > 0.0 and dropout_rng is not None:
        keep_p = 1.0 - dropout_rate
        mk = jax.random.bernoulli(dropout_rng, keep_p, (H, N, dmax))
        kappa = jnp.where(mk, 1.0 / keep_p, 0.0)
    else:
        # None (not ones): the eval path then skips every keep-factor
        # multiply AND the kap_t transposed gather in backward
        kappa = None
    if sigma is None:
        sigma = jnp.ones((H,), q.dtype)
    if gamma is None:
        gamma = jnp.ones((H,), q.dtype)
    if cov_inv is None:
        cov_inv = jnp.broadcast_to(jnp.eye(D, dtype=q.dtype), (H, D, D))
    return _padded_partial(metric, q, k, v, nbr, nval, inc, inc_slot,
                           ival, kappa, sigma, gamma, cov_inv)
