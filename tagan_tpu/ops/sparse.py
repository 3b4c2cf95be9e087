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
