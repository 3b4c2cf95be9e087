"""Flash-style edge-masked geometric attention (Pallas TPU kernel).

This is the fused SDDMM -> masked segment-softmax -> SpMM pipeline for
one graph snapshot, computed blockwise so the [N, N] score matrix never
touches HBM (the reference materializes it densely,
`/root/reference/src/tagan/layers/graph_attention.py:96-105` +
`geometric_attention.py:351-516`; XLA's fallback in `ops.sparse` /
dense path materializes it too). For N in the thousands this is the
difference between O(N^2) HBM traffic and O(N * D) — the score blocks
live only in VMEM and both matmuls (QK^T cross term and P@V) hit the
MXU.

Supported metrics are those expressible through the QK^T cross term +
row norms (so the MXU does the heavy lifting):

    scaled_dot_product   s = qk / sqrt(d)
    dot_product          s = qk
    squared_euclidean    s = -(|q|^2 + |k|^2 - 2qk)
    euclidean            s = -sqrt(sq + 1e-8)
    gaussian_kernel      s = exp(-sq / (2 sigma_h^2))
    rbf_kernel           s = exp(-gamma_h * sq)
    cosine_similarity    s = clip(qk_normalized, -1, 1)   (q, k pre-normalized)
    cosine_distance      s = clip(..) - 1

mahalanobis with a low-rank PSD metric FᵀF rides the euclidean kernel
in factor space (|Fq − Fk|², transform applied by the caller —
nn.geometric.apply_flash); only manhattan is not MXU-expressible
blockwise and stays on the XLA path. q/k and v feature dims may differ.

**All eight metrics train through Pallas backward kernels** — the
[N, N] scores are recomputed blockwise in VMEM during backward, never
in HBM. The kernel-parameterized metrics (gaussian sigma / rbf gamma)
accumulate d(scale) inside the dq kernel (one extra per-block
reduction); the cosine metrics run the kernels on L2-normalized inputs
with the clip gradient applied in-block and the normalization chain
pulled back outside (O(N·D) in XLA). Two backward layouts exist: the
two-walk dq + dk/dv kernels (7 matmul stages per occupied block) and a
**fused single-walk kernel** (5 stages, one DMA pass, dq written as
per-key-strip partials and reduced outside — the splash-attention
fused-backward pattern); `FUSED_BWD`/`fused=` select. The auto rule
enables fused only when BOTH the HBM dq-partial buffer fits
`FUSED_DQ_BUDGET` AND an analytic scoped-VMEM estimate of the fused
kernel's working set (`_fused_bwd_vmem_bytes` — double-buffered block
windows + live score-block temporaries) fits `FUSED_VMEM_BUDGET`; at
the 10K headline geometry (block 512x1024) the working set exceeds the
chip's 16 MB scoped-VMEM limit (measured 17.77 MB on v5e), so auto
selects the two-walk path there.

bf16 geometry caveat: with ``bf16=True`` the backward walks keep the
f32 block windows AND live bf16 casts of the [BM, BN] operands for the
MXU, so even the two-walk dk/dv kernel exceeds scoped VMEM at block
512x1024 (measured 17.75 MB on v5e) — use block_m <= 256 for bf16
backward passes (nn/model.py's flash branch applies this rule).

**Attention dropout** (the reference's softmax-weight dropout,
`geometric_attention.py:474-516`) runs *inside* the kernel: a
counter-based hash PRNG keyed on (seed, head, global row, global col)
generates the keep mask, so the backward kernels — including the
transposed dk/dv walk — regenerate the identical mask from coordinates
alone, with nothing materialized. The softmax denominator uses the
un-dropped sum (dropout applies to the normalized weights, matching
``dropout(softmax(s)) @ v`` exactly).

Note on numerics: the kernel uses the norm-expansion form of the
squared distance; the XLA oracle uses subtract-then-square. They agree
to ~1e-5 relative at fp32, which the kernel tests assert.

Grid layout: (heads, N/BM, N/BN); the j axis accumulates into VMEM
scratch (running max / sum / output accumulator — the standard
flash-attention recurrence), finalized on the last j step.
"""

from __future__ import annotations

import functools
import math
from typing import Optional

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

NEG_INF = -1e30


def _pcall(kernel, **kw):
    """pallas_call that auto-interprets on the CPU backend (like
    ring_flash): CPU has no Mosaic lowering, so plain CPU users (and
    the multichip dryrun) get the interpreter instead of a hard error.
    Respects an interpret= already bound by tests' monkeypatched
    partial."""
    fn = pl.pallas_call
    if (jax.default_backend() == "cpu"
            and "interpret" not in getattr(fn, "keywords", {})):
        kw["interpret"] = True
    return fn(kernel, **kw)

MXU_METRICS = ("scaled_dot_product", "dot_product", "squared_euclidean",
               "euclidean", "gaussian_kernel", "rbf_kernel",
               "cosine_similarity", "cosine_distance")

# metrics whose score goes through the squared distance sq = |q|²+|k|²-2qk
_SQ_METRICS = ("squared_euclidean", "euclidean", "gaussian_kernel",
               "rbf_kernel")

# metrics with a Pallas backward (all of them — kept as a name for the
# tests and for callers probing capability)
BWD_METRICS = MXU_METRICS

# metrics with a learnable per-head scale parameter (d(scale) is
# accumulated in-kernel during backward)
SCALED_METRICS = ("gaussian_kernel", "rbf_kernel")

_COSINE = ("cosine_similarity", "cosine_distance")


def _l2_normalize(x: jax.Array) -> jax.Array:
    """Row L2-normalization with the same zero-guard the oracle uses."""
    n = jnp.linalg.norm(x, axis=-1, keepdims=True)
    return x / jnp.where(n == 0, 1e-8, n)


def _scores_from(metric: str, qk, sq, scale, true_d: int):
    """Score block from the cross term (and squared distance where
    needed). `scale` is the per-head sigma/gamma scalar (traced)."""
    if metric == "scaled_dot_product":
        return qk / math.sqrt(true_d)
    if metric == "dot_product":
        return qk
    if metric == "cosine_similarity":
        return jnp.clip(qk, -1.0, 1.0)
    if metric == "cosine_distance":
        return jnp.clip(qk, -1.0, 1.0) - 1.0
    if metric == "squared_euclidean":
        return -sq
    if metric == "euclidean":
        return -jnp.sqrt(sq + 1e-8)
    if metric == "gaussian_kernel":
        return jnp.exp(-sq / (2.0 * scale * scale))
    if metric == "rbf_kernel":
        return jnp.exp(-scale * sq)
    raise NotImplementedError(metric)


def _qk_sq(metric: str, q, k, bf16: bool):
    """Cross term (MXU) and, for sq-based metrics, the squared
    distance via the norm expansion."""
    if bf16:
        qk = jnp.dot(q.astype(jnp.bfloat16), k.astype(jnp.bfloat16).T,
                     preferred_element_type=jnp.float32)
    else:
        qk = jnp.dot(q, k.T, preferred_element_type=jnp.float32)
    sq = None
    if metric in _SQ_METRICS:
        qn = jnp.sum(q * q, axis=-1, keepdims=True)       # [BM, 1]
        kn = jnp.sum(k * k, axis=-1, keepdims=True).T     # [1, BN]
        sq = jnp.maximum(qn + kn - 2.0 * qk, 0.0)
    return qk, sq


def _block_scores(metric: str, q, k, scale_param, true_d: int,
                  bf16: bool = False):
    """Score block [BM, BN] from q [BM, D], k [BN, D]."""
    qk, sq = _qk_sq(metric, q, k, bf16)
    return _scores_from(metric, qk, sq, scale_param, true_d)


def _clip_grad(x):
    """d(clip(x, -1, 1))/dx with JAX's min/max tie-splitting (0.5 at the
    exact boundary) so kernel grads match `jnp.clip` autodiff."""
    hi = jnp.where(x > 1.0, 0.0, jnp.where(x == 1.0, 0.5, 1.0))
    lo = jnp.where(x < -1.0, 0.0, jnp.where(x == -1.0, 0.5, 1.0))
    return hi * lo


# ---------------------------------------------------------------------------
# In-kernel dropout: counter-based hash PRNG on global coordinates
# ---------------------------------------------------------------------------

def _keep_thresh(rate: float) -> int:
    """uint32 threshold for `bits < thresh == keep` at keep prob 1-rate."""
    return min(int(round((1.0 - rate) * 4294967296.0)), 4294967295)


def _keep_mask(seed, h, row0, col0, bm: int, bn: int, thresh: int):
    """Deterministic keep mask bool[bm, bn] for the block whose top-left
    global coordinate is (row0, col0), head h. Stateless (a triple32-
    style integer hash), so forward and both backward walks — including
    the transposed dk/dv walk — regenerate the identical mask from
    coordinates alone. Works in interpret mode too (plain jnp ops, no
    pltpu.prng)."""
    u32 = jnp.uint32
    r = row0 + jax.lax.broadcasted_iota(jnp.int32, (bm, bn), 0)
    c = col0 + jax.lax.broadcasted_iota(jnp.int32, (bm, bn), 1)
    x = r.astype(u32) * u32(0x9E3779B1)
    x = x ^ (c.astype(u32) * u32(0x85EBCA77))
    x = x + (seed.astype(u32) ^ (h.astype(u32) * u32(0xC2B2AE3D)))
    x = x ^ (x >> 17)
    x = x * u32(0xED5AD4BB)
    x = x ^ (x >> 11)
    x = x * u32(0xAC4C1B51)
    x = x ^ (x >> 15)
    x = x * u32(0x31848BAB)
    x = x ^ (x >> 14)
    return x < u32(thresh)


LSE_DEAD = 1e30   # stored logsumexp for rows with no valid edges:
                  # exp(s - LSE_DEAD) underflows to exactly 0 in backward


# ---------------------------------------------------------------------------
# Bit-packed masks: 8 key columns per byte, interleaved per key block
# ---------------------------------------------------------------------------

# Opt-in: bit-packed masks trade VPU unpack passes for 1/8 the mask
# HBM traffic/residency. MEASURED on v5e at the 10K bench config: the
# forward is compute-bound, so packing is ~18% SLOWER (23.6 vs 19.2 ms
# per T-pass) — hence default OFF; flip on when the mask's HBM
# footprint is the binding constraint (very large N with dense_adj).
PACK_MASKS = False


def _mask_packable(Np: int, block_n: int) -> bool:
    """Packed mask blocks are [BM, BN/8] int8 — legal on TPU only when
    the lane dim BN/8 is 128-divisible (BN % 1024 == 0) or spans the
    full packed row (single key block)."""
    return PACK_MASKS and (block_n % 1024 == 0 or Np == block_n)


def _pack_mask(mask: jax.Array, block_n: int) -> jax.Array:
    """Bit-pack [.., N] key columns 8x: within each block_n-wide key
    block, natural column j lands in bit j // (block_n//8) of byte
    j % (block_n//8). This interleave is exactly what the kernel's
    `pltpu.repeat` (tile semantics) + one shift/and unpacks — masks cost
    1/8 the HBM traffic and residency of the int8 form."""
    Np = mask.shape[-1]
    n_j = Np // block_n
    m = (mask != 0).astype(jnp.int32)
    m = m.reshape(*mask.shape[:-1], n_j, 8, block_n // 8)
    w = (jnp.int32(1) << jnp.arange(8, dtype=jnp.int32))[:, None]
    p = jnp.sum(m * w, axis=-2)
    return p.reshape(*mask.shape[:-1], Np // 8).astype(jnp.int8)


def _mask_bits(mask_val: jax.Array, packed: bool) -> jax.Array:
    """In-kernel: packed [BM, BN/8] int8 block -> int32 0/1 [BM, BN]
    (or pass the int8 mask through unchanged when not packed — the
    consumers only test `!= 0`)."""
    if not packed:
        return mask_val
    bm, bn8 = mask_val.shape
    rep = pltpu.repeat(mask_val.astype(jnp.int32), 8, axis=1)
    bit = jax.lax.broadcasted_iota(jnp.int32, (bm, bn8 * 8), 1) // bn8
    return (rep >> bit) & 1


def _flash_kernel(jlist_ref, jcount_ref, *rest, metric: str, n_j: int,
                  true_d: int, bf16: bool, dropout_rate: float,
                  block_m: int, block_n: int, packed: bool = False,
                  compact: bool = False):
    """Block-sparse flash body. The grid's j axis walks a *compacted*
    list of occupied key blocks (scalar-prefetched `jlist` drives the
    k/v/mask index maps, so empty blocks cost neither DMA nor compute;
    trailing repeats of the last occupied index are deduplicated by the
    pipeline and skipped via `jcount`). With ``compact`` the mask input
    is the [n_slots, BM, mw] occupied-block store (an extra `jslot`
    prefetch drives its index map) instead of a dense [Np, Np] mask."""
    if compact:
        (jslot_ref, scale_ref, seed_ref, q_ref, k_ref, v_ref, mask_ref,
         o_ref, lse_ref, acc_ref, m_ref, l_ref) = rest
    else:
        (scale_ref, seed_ref, q_ref, k_ref, v_ref, mask_ref,
         o_ref, lse_ref, acc_ref, m_ref, l_ref) = rest
    j = pl.program_id(2)
    i = pl.program_id(1)
    h = pl.program_id(0)

    @pl.when(j == 0)
    def _init():
        acc_ref[:] = jnp.zeros_like(acc_ref)
        m_ref[:] = jnp.full_like(m_ref, NEG_INF)
        l_ref[:] = jnp.zeros_like(l_ref)

    @pl.when(j < jcount_ref[i])
    def _compute():
        q = q_ref[0]          # [BM, D]
        k = k_ref[0]          # [BN, D]
        v = v_ref[0]          # [BN, D]
        mask = _mask_bits(mask_ref[0] if compact else mask_ref[:],
                          packed)               # [BM, BN]

        s = _block_scores(metric, q, k, scale_ref[h], true_d, bf16)
        s = jnp.where(mask != 0, s, NEG_INF)

        m_prev = m_ref[:]                                   # [BM, 1]
        m_cur = jnp.max(s, axis=-1, keepdims=True)
        m_new = jnp.maximum(m_prev, m_cur)
        # masked entries need no second select: once m_new is finite,
        # exp(NEG_INF - m_new) underflows to exactly 0. Rows where m_new
        # is still NEG_INF (nothing valid seen yet) produce p == 1
        # garbage, but it is washed out by alpha == 0 the moment a valid
        # entry appears, and rows that stay dead are zeroed at finalize
        # via the m == NEG_INF check.
        p = jnp.exp(s - m_new)
        alpha = jnp.exp(m_prev - m_new)
        # the softmax denominator uses the UN-dropped sum: dropout acts
        # on the normalized weights, exactly dropout(softmax(s)) @ v
        l_new = l_ref[:] * alpha + jnp.sum(p, axis=-1, keepdims=True)
        if dropout_rate > 0.0:
            keep = _keep_mask(seed_ref[0], h, i * block_m,
                              jlist_ref[i, j] * block_n, block_m, block_n,
                              _keep_thresh(dropout_rate))
            p_v = jnp.where(keep, p * (1.0 / (1.0 - dropout_rate)), 0.0)
        else:
            p_v = p
        if bf16:
            pv = jnp.dot(p_v.astype(jnp.bfloat16),
                         v.astype(jnp.bfloat16),
                         preferred_element_type=jnp.float32)
        else:
            pv = jnp.dot(p_v, v, preferred_element_type=jnp.float32)
        acc_ref[:] = acc_ref[:] * alpha + pv
        m_ref[:] = m_new
        l_ref[:] = l_new

    @pl.when(j == n_j - 1)
    def _finalize():
        # dead = row never saw a valid edge (running max untouched);
        # valid rows always have l >= 1 (the max entry contributes
        # exp(0) = 1 and survives — m is non-decreasing)
        dead = m_ref[:] <= NEG_INF
        safe = jnp.where(dead, 1.0, l_ref[:])
        o_ref[0] = jnp.where(dead, 0.0,
                             acc_ref[:] / safe).astype(o_ref.dtype)
        lse = jnp.where(dead, LSE_DEAD, m_ref[:] + jnp.log(safe))
        lse_ref[0] = lse          # [BM, 1] block of the (H, Np, 1) array


def _round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


def _plan_from_occ(occ: jax.Array):
    """Compact an occupancy matrix bool[n_i, n_j] into the walk plan
    (jlist, jcount): occupied j indices per row, padded by repeating the
    last entry (so the pipeline's same-index dedup skips the DMA)."""
    n_i, n_j = occ.shape
    jcount = jnp.sum(occ.astype(jnp.int32), axis=1)
    jidx = jnp.broadcast_to(jnp.arange(n_j), (n_i, n_j))
    order = jnp.argsort(jnp.where(occ, jidx, n_j), axis=1)
    jlist = jnp.take_along_axis(jnp.where(occ, jidx, 0), order, axis=1)
    last = jnp.take_along_axis(
        jlist, jnp.maximum(jcount - 1, 0)[:, None], axis=1)
    pos = jnp.broadcast_to(jnp.arange(n_j), (n_i, n_j))
    jlist = jnp.where(pos < jcount[:, None], jlist, last).astype(jnp.int32)
    return jlist, jcount.astype(jnp.int32)


def _occ_from_mask(mask: jax.Array, block_m: int, block_n: int,
                   n_pad: Optional[int] = None) -> jax.Array:
    N = mask.shape[0]
    Np = n_pad or _round_up(N, max(block_m, block_n))
    mask = mask != 0
    if Np != N:
        mask = jnp.pad(mask, ((0, Np - N), (0, Np - N)))
    n_i, n_j = Np // block_m, Np // block_n
    # boolean any-reduction — never materialize an int32 copy of the
    # full [N, N] mask (at 10K nodes that is a 20 GB tensor)
    return jnp.any(mask.reshape(n_i, block_m, n_j, block_n), axis=(1, 3))


@functools.partial(jax.jit, static_argnames=("block_m", "block_n", "n_pad"))
def make_block_plan(mask: jax.Array, block_m: int = 512,
                    block_n: int = 1024, n_pad: Optional[int] = None):
    """Precompute the block-sparsity plan (jlist, jcount) for a mask.

    Reusable across kernel calls with the same graph — in the model the
    adjacency is fixed per snapshot, so the plan is computed once per
    batch, not once per attention layer/step."""
    return _plan_from_occ(_occ_from_mask(mask, block_m, block_n, n_pad))


@functools.partial(jax.jit, static_argnames=("block_m", "block_n", "n_pad"))
def make_block_plans_from_mask(mask: jax.Array, block_m: int = 512,
                               block_n: int = 1024,
                               n_pad: Optional[int] = None):
    """Both walk plans — (plan, plan_t) for the forward/dq and dk/dv
    kernels — from a dense mask via one boolean block-occupancy
    reduction (the transposed occupancy is just ``occ.T``). The
    mask-side analog of :func:`make_block_plans_from_edges`; matches it
    exactly when the mask is the densified edge list (+ self loops on
    live nodes)."""
    occ = _occ_from_mask(mask, block_m, block_n, n_pad)
    return _plan_from_occ(occ), _plan_from_occ(occ.T)


def _edge_block_ids(edge_src, edge_dst, edge_mask, node_mask, n,
                    block_m, block_n, n_j, self_loops):
    """Block-pair segment id per edge (+ optional self loops), with the
    validity weight. Returns (ids i32[E'], w f32[E'])."""
    ids = (edge_src // block_m) * n_j + (edge_dst // block_n)
    w = edge_mask.astype(jnp.float32)
    if self_loops:
        d = jnp.arange(n)
        dm = jnp.ones((n,), jnp.float32) if node_mask is None \
            else node_mask.astype(jnp.float32)
        ids = jnp.concatenate([ids, (d // block_m) * n_j + (d // block_n)])
        w = jnp.concatenate([w, dm])
    return ids, w


def _occ_from_edges(edge_src, edge_dst, edge_mask, node_mask, n,
                    block_m, block_n, Np, self_loops=True):
    """Occupancy bool[n_i, n_j] straight from the edge list in O(E)."""
    n_i, n_j = Np // block_m, Np // block_n
    nseg = n_i * n_j
    ids, w = _edge_block_ids(edge_src, edge_dst, edge_mask, node_mask, n,
                             block_m, block_n, n_j, self_loops)
    if ids.shape[0] * nseg <= 64_000_000:
        # one-hot matmul instead of segment_sum: XLA lowers segment_sum
        # to a serialized scatter-add (~20 ns/update on TPU — ~1.4 ms at
        # 160K edges) while the MXU chews the same reduction in ~no time.
        # Exact: products are 0/1 (exact in bf16), accumulation is fp32,
        # and integer counts up to 2^24 are exact — occupancy only needs
        # count > 0.
        oh = jax.nn.one_hot(ids, nseg, dtype=jnp.float32)
        contrib = (w[None, :] @ oh)[0]
        return contrib.reshape(n_i, n_j) > 0.5
    contrib = jax.ops.segment_sum(w, ids, num_segments=nseg)
    return contrib.reshape(n_i, n_j) > 0.0


@functools.partial(jax.jit, static_argnames=("n", "block_m", "block_n",
                                             "n_pad", "self_loops"))
def make_block_plans_from_edges(
    edge_src: jax.Array, edge_dst: jax.Array, edge_mask: jax.Array,
    node_mask: Optional[jax.Array], n: int,
    block_m: int = 512, block_n: int = 1024,
    n_pad: Optional[int] = None, self_loops: bool = True,
):
    """Both walk plans — (plan, plan_t) for the forward/dq and dk/dv
    kernels — straight from the edge list in O(E) (one segment-sum over
    block-pair ids), never touching the dense [N, N] mask. The
    transposed occupancy is just ``occ.T``, so no 100 MB int8 mask
    transpose either. Matches make_block_plan(mask)/(mask.T) exactly
    when the mask is the densified edge list (+ self loops on live
    nodes, graph_attention.py:102)."""
    Np = n_pad or _round_up(n, max(block_m, block_n))
    occ = _occ_from_edges(edge_src, edge_dst, edge_mask, node_mask, n,
                          block_m, block_n, Np, self_loops)
    return _plan_from_occ(occ), _plan_from_occ(occ.T)


@functools.partial(jax.jit, static_argnames=(
    "n", "block_m", "block_n", "max_slots", "n_pad", "self_loops",
    "max_blocks_per_row", "max_blocks_per_col", "pack"))
def make_compact_structure_from_edges(
    edge_src: jax.Array, edge_dst: jax.Array, edge_mask: jax.Array,
    node_mask: Optional[jax.Array], n: int, block_m: int, block_n: int,
    max_slots: int, n_pad: Optional[int] = None, self_loops: bool = True,
    max_blocks_per_row: Optional[int] = None,
    max_blocks_per_col: Optional[int] = None, pack: bool = False,
):
    """Compact mask-block structure: instead of a dense [N, N] mask in
    HBM (17 GB at 131K nodes), store ONLY the occupied [BM, BN] blocks —
    mask HBM scales with the occupied-block count (O(E) for banded
    graphs), not N². Returns

        (mask_blocks, cplan, cplan_t)

    mask_blocks  i8[max_slots, BM, BN]   (or [.., BM, BN//8] when
                                          ``pack`` — requires
                                          block_n % 1024 == 0)
    cplan        (jlist, jcount, jslot)  forward/dq walk + slot per step
    cplan_t      (ilist, icount, islot)  dk/dv walk + slot per step

    Slots are assigned in row-major occupied-block order. ``max_slots``
    must upper-bound the true occupied count (host-side:
    `occupied_blocks_total`); blocks past the bound would be silently
    dropped by the scatter. ``max_blocks_per_row``/``col`` statically
    shrink the walk widths like the dense-plan path. Self loops for live
    nodes are folded in like the dense mask build
    (graph_attention.py:102)."""
    if pack and block_n % 1024 != 0:
        raise ValueError("pack=True needs block_n % 1024 == 0 (the "
                         "packed lane dim BN/8 must be 128-divisible)")
    Np = n_pad or _round_up(n, max(block_m, block_n))
    n_i, n_j = Np // block_m, Np // block_n
    occ = _occ_from_edges(edge_src, edge_dst, edge_mask, node_mask, n,
                          block_m, block_n, Np, self_loops)
    flat = occ.reshape(-1)
    slot_mat = jnp.cumsum(flat.astype(jnp.int32)) - 1      # [n_i * n_j]

    jlist, jcount = _shrink_plan(_plan_from_occ(occ), max_blocks_per_row)
    ilist, icount = _shrink_plan(_plan_from_occ(occ.T),
                                 max_blocks_per_col)
    i_of = jnp.arange(n_i)[:, None]
    j_of = jnp.arange(n_j)[:, None]
    # clamp: empty walk rows carry jlist 0 whose block may be
    # unoccupied (slot -1) — the pipeline still DMAs the block, so it
    # must stay in bounds (its content is never read: count == 0)
    jslot = jnp.clip(slot_mat[i_of * n_j + jlist], 0,
                     max_slots - 1).astype(jnp.int32)
    islot = jnp.clip(slot_mat[ilist * n_j + j_of], 0,
                     max_slots - 1).astype(jnp.int32)

    # scatter the edge bits into their block slots (out-of-bounds slots
    # from invalid edges are dropped by the scatter's default mode)
    ids, w = _edge_block_ids(edge_src, edge_dst, edge_mask, node_mask, n,
                             block_m, block_n, n_j, self_loops)
    diag = jnp.arange(n, dtype=edge_src.dtype)
    rows = jnp.concatenate([edge_src, diag]) if self_loops else edge_src
    cols = jnp.concatenate([edge_dst, diag]) if self_loops else edge_dst
    slot_e = jnp.where(w > 0, slot_mat[ids], max_slots)    # drop invalid
    mask_blocks = jnp.zeros((max_slots, block_m, block_n), jnp.int8)
    mask_blocks = mask_blocks.at[
        slot_e, rows % block_m, cols % block_n].max(jnp.int8(1))
    if pack:
        mask_blocks = _pack_mask(mask_blocks, block_n)
    return (mask_blocks, (jlist, jcount, jslot),
            (ilist, icount.astype(jnp.int32), islot))


def occupied_blocks_total(mask, block_m: int = 512,
                          block_n: int = 1024) -> int:
    """Host-side: total occupied [BM, BN] blocks — the static
    ``max_slots`` for `make_compact_structure_from_edges`."""
    import numpy as np
    m = np.asarray(mask)
    N = m.shape[0]
    Np = _round_up(N, max(block_m, block_n))
    if Np != N:
        m = np.pad(m, ((0, Np - N), (0, Np - N)))
    n_i, n_j = Np // block_m, Np // block_n
    occ = m.reshape(n_i, block_m, n_j, block_n).sum(axis=(1, 3)) > 0
    return max(int(occ.sum()), 1)


def occupied_blocks_bound(mask, block_m: int = 512,
                          block_n: int = 1024) -> int:
    """Host-side helper: the max number of occupied [block_m, block_n]
    key blocks over query blocks — a safe static value for
    `flash_geometric_attention(max_blocks_per_row=...)`."""
    import numpy as np
    m = np.asarray(mask)
    N = m.shape[0]
    Np = _round_up(N, max(block_m, block_n))
    if Np != N:
        m = np.pad(m, ((0, Np - N), (0, Np - N)))
    n_i, n_j = Np // block_m, Np // block_n
    occ = m.reshape(n_i, block_m, n_j, block_n).sum(axis=(1, 3)) > 0
    return max(int(occ.sum(axis=1).max()), 1)


def _xla_reference(metric, q, k, v, mask, scale_param):
    """Dense XLA oracle — the definition the kernel must match
    (deterministic path; in-kernel dropout has no dense twin)."""
    from ..distances import pairwise_scores
    from ..masked import masked_softmax
    sigma = scale_param if metric == "gaussian_kernel" else None
    gamma = scale_param if metric == "rbf_kernel" else None
    w = masked_softmax(pairwise_scores(metric, q, k, sigma=sigma,
                                       gamma=gamma), mask[None] != 0)
    return jnp.einsum("hij,hjd->hid", w, v)


# ---------------------------------------------------------------------------
# Differentiable entry points (custom_vjp, Pallas forward AND backward)
# ---------------------------------------------------------------------------

@functools.partial(jax.custom_vjp, nondiff_argnums=(9, 10, 11, 12, 13))
def _flash_diff(q, k, v, mask, jlist, jcount, ilist, icount, seed,
                metric, block_m, block_n, bf16, dropout_rate):
    return _flash_forward(q, k, v, mask, metric=metric, block_m=block_m,
                          block_n=block_n, bf16=bf16,
                          plan=(jlist, jcount), seed=seed,
                          dropout_rate=dropout_rate)


def _flash_diff_fwd(q, k, v, mask, jlist, jcount, ilist, icount, seed,
                    metric, block_m, block_n, bf16, dropout_rate):
    out, lse = _flash_forward(q, k, v, mask, metric=metric,
                              block_m=block_m, block_n=block_n, bf16=bf16,
                              plan=(jlist, jcount), seed=seed,
                              dropout_rate=dropout_rate, return_lse=True)
    return out, (q, k, v, mask, out, lse, jlist, jcount, ilist, icount,
                 seed)


def _flash_diff_bwd(metric, block_m, block_n, bf16, dropout_rate, res, g):
    q, k, v, mask, out, lse, jlist, jcount, ilist, icount, seed = res
    kw = dict(metric=metric, block_m=block_m, block_n=block_n, bf16=bf16,
              plan=(jlist, jcount), plan_t=(ilist, icount), seed=seed,
              dropout_rate=dropout_rate)
    if metric in _COSINE:
        # the kernels ran on L2-normalized q/k (the forward normalizes);
        # run the Pallas backward in normalized space and pull the
        # normalization chain back outside — O(N·D) XLA, no [N, N]
        qn, vjp_q = jax.vjp(_l2_normalize, q)
        kn, vjp_k = jax.vjp(_l2_normalize, k)
        dqn, dkn, dv = flash_geometric_attention_bwd(
            qn, kn, v, mask, out, lse, g, **kw)
        dq, = vjp_q(dqn)
        dk, = vjp_k(dkn)
    else:
        dq, dk, dv = flash_geometric_attention_bwd(
            q, k, v, mask, out, lse, g, **kw)
    return dq, dk, dv, None, None, None, None, None, None


_flash_diff.defvjp(_flash_diff_fwd, _flash_diff_bwd)


@functools.partial(jax.custom_vjp, nondiff_argnums=(10, 11, 12, 13, 14))
def _flash_diff_scaled(q, k, v, scale, mask, jlist, jcount, ilist, icount,
                       seed, metric, block_m, block_n, bf16, dropout_rate):
    """Scale-parameterized variant (gaussian sigma / rbf gamma): Pallas
    kernels forward AND backward; d(scale) is accumulated inside the dq
    kernel — the [N, N] scores never reach HBM in either direction."""
    return _flash_forward(q, k, v, mask, metric=metric, scale_param=scale,
                          block_m=block_m, block_n=block_n, bf16=bf16,
                          plan=(jlist, jcount), seed=seed,
                          dropout_rate=dropout_rate)


def _flash_diff_scaled_fwd(q, k, v, scale, mask, jlist, jcount, ilist,
                           icount, seed, metric, block_m, block_n, bf16,
                           dropout_rate):
    out, lse = _flash_forward(q, k, v, mask, metric=metric,
                              scale_param=scale, block_m=block_m,
                              block_n=block_n, bf16=bf16,
                              plan=(jlist, jcount), seed=seed,
                              dropout_rate=dropout_rate, return_lse=True)
    return out, (q, k, v, scale, mask, out, lse, jlist, jcount, ilist,
                 icount, seed)


def _flash_diff_scaled_bwd(metric, block_m, block_n, bf16, dropout_rate,
                           res, g):
    (q, k, v, scale, mask, out, lse, jlist, jcount, ilist, icount,
     seed) = res
    dq, dk, dv, dscale = flash_geometric_attention_bwd(
        q, k, v, mask, out, lse, g, metric=metric, scale=scale,
        block_m=block_m, block_n=block_n, bf16=bf16,
        plan=(jlist, jcount), plan_t=(ilist, icount), seed=seed,
        dropout_rate=dropout_rate, need_dscale=True)
    return (dq, dk, dv, dscale.astype(scale.dtype), None, None, None,
            None, None, None)


_flash_diff_scaled.defvjp(_flash_diff_scaled_fwd, _flash_diff_scaled_bwd)


def _shrink_plan(plan, walk: Optional[int]):
    """Statically truncate a (list, count) plan to `walk` entries."""
    lst, cnt = plan
    if walk is None or walk >= lst.shape[1]:
        return lst, cnt
    return lst[:, :walk], jnp.minimum(cnt, walk)


@functools.partial(jax.jit, static_argnames=("metric", "block_m",
                                             "block_n", "bf16",
                                             "max_blocks_per_row",
                                             "max_blocks_per_col",
                                             "dropout_rate"))
def flash_geometric_attention(
    q: jax.Array, k: jax.Array, v: jax.Array, mask: jax.Array,
    metric: str = "scaled_dot_product",
    scale_param: Optional[jax.Array] = None,
    block_m: int = 512, block_n: int = 1024, bf16: bool = False,
    max_blocks_per_row: Optional[int] = None, plan=None,
    plan_t=None, max_blocks_per_col: Optional[int] = None,
    dropout_rate: float = 0.0, dropout_seed: Optional[jax.Array] = None,
    bias: Optional[jax.Array] = None,
) -> jax.Array:
    """Differentiable entry point: Pallas kernels forward AND backward
    (custom_vjp) for every MXU metric, both walking precomputed
    block-sparsity plans. `plan` (query-block walk) and `plan_t` (the
    transposed plan driving the dk/dv kernel) are computed here when not
    supplied — pass them in to share one plan across the attention
    layers of a model (the adjacency is fixed per snapshot).
    `max_blocks_per_row`/`max_blocks_per_col` statically shrink the
    forward/backward grids for block-sparse graphs (must upper-bound the
    true occupancy — see `occupied_blocks_bound`).

    Kernel-parameterized metrics (gaussian/rbf with learnable
    sigma/gamma) run Pallas in both directions too; d(sigma)/d(gamma)
    is reduced inside the dq kernel.

    ``dropout_rate`` > 0 with a ``dropout_seed`` (int32 scalar/[1])
    enables in-kernel attention-weight dropout (inverted, like the
    dense path); the backward regenerates the identical mask.

    ``bias`` [N, N] switches to the edge-biased variant — the dense
    path's re-softmax ``softmax(drop(softmax(s)) + B) @ v`` — with
    Pallas kernels in both directions (2-walk forward, 3-walk
    backward incl. dbias). With dropout, a second seed is derived from
    ``dropout_seed`` for the post-re-softmax drop.
    """
    N = q.shape[1]
    Np = _round_up(N, max(block_m, block_n))
    if plan is None and plan_t is None:
        # one occupancy reduction serves both plans (occ_t == occ.T) —
        # never transpose the [N, N] mask
        occ = _occ_from_mask(mask, block_m, block_n, Np)
        plan = _plan_from_occ(occ)
        plan_t = _plan_from_occ(occ.T)
    elif plan is None:
        plan = make_block_plan.__wrapped__(mask, block_m, block_n,
                                           n_pad=Np)
    elif plan_t is None:
        plan_t = make_block_plan.__wrapped__(mask.T, block_n, block_m,
                                             n_pad=Np)
    jlist, jcount = _shrink_plan(plan, max_blocks_per_row)
    ilist, icount = _shrink_plan(plan_t, max_blocks_per_col)
    if dropout_rate > 0.0 and dropout_seed is None:
        raise ValueError("dropout_rate > 0 requires dropout_seed")
    if bias is not None:
        if dropout_seed is None:
            seeds = jnp.zeros((2,), jnp.int32)
        else:
            s = jnp.asarray(dropout_seed, jnp.int32).reshape((-1,))
            if s.shape[0] >= 2:
                seeds = s[:2]
            else:
                # derive the post-re-softmax drop seed deterministically
                seeds = jnp.concatenate(
                    [s, s ^ jnp.asarray([0x5BD1E995], jnp.int32)])
        scale = scale_param if scale_param is not None \
            else jnp.ones((q.shape[0],), jnp.float32)
        return _flash_diff_biased(q, k, v, scale, bias, mask, jlist,
                                  jcount, ilist, icount, seeds, metric,
                                  block_m, block_n, bf16, dropout_rate)
    seed = jnp.zeros((1,), jnp.int32) if dropout_seed is None \
        else jnp.asarray(dropout_seed, jnp.int32).reshape((1,))
    if scale_param is not None:
        return _flash_diff_scaled(q, k, v, scale_param, mask, jlist,
                                  jcount, ilist, icount, seed, metric,
                                  block_m, block_n, bf16, dropout_rate)
    return _flash_diff(q, k, v, mask, jlist, jcount, ilist, icount, seed,
                       metric, block_m, block_n, bf16, dropout_rate)


# ---------------------------------------------------------------------------
# Differentiable (out, lse) entry point — dense or compact masks.
# lse as a first-class differentiable output is what lets partial
# attentions over disjoint edge sets merge exactly (the hybrid
# band + residual backend): the lse cotangent folds into the softmax
# vjp as delta' = delta - g_lse (see flash_geometric_attention_bwd).
# ---------------------------------------------------------------------------

@functools.partial(jax.custom_vjp, nondiff_argnums=(12, 13, 14, 15, 16,
                                                    17))
def _flash_diff_lse(q, k, v, scale, mask, jlist, jcount, jslot, ilist,
                    icount, islot, seed, metric, block_m, block_n, bf16,
                    dropout_rate, compact):
    plan = (jlist, jcount, jslot) if compact else (jlist, jcount)
    return _flash_forward(q, k, v, mask, metric=metric, scale_param=scale,
                          block_m=block_m, block_n=block_n, bf16=bf16,
                          plan=plan, seed=seed, dropout_rate=dropout_rate,
                          return_lse=True)


def _flash_diff_lse_fwd(q, k, v, scale, mask, jlist, jcount, jslot, ilist,
                        icount, islot, seed, metric, block_m, block_n,
                        bf16, dropout_rate, compact):
    plan = (jlist, jcount, jslot) if compact else (jlist, jcount)
    out, lse = _flash_forward(q, k, v, mask, metric=metric,
                              scale_param=scale, block_m=block_m,
                              block_n=block_n, bf16=bf16, plan=plan,
                              seed=seed, dropout_rate=dropout_rate,
                              return_lse=True)
    return (out, lse), (q, k, v, scale, mask, out, lse, jlist, jcount,
                        jslot, ilist, icount, islot, seed)


def _flash_diff_lse_bwd(metric, block_m, block_n, bf16, dropout_rate,
                        compact, res, ct):
    (q, k, v, scale, mask, out, lse, jlist, jcount, jslot, ilist, icount,
     islot, seed) = res
    g, g_lse = ct
    need_dscale = metric in SCALED_METRICS
    plan = (jlist, jcount, jslot) if compact else (jlist, jcount)
    plan_t = (ilist, icount, islot) if compact else (ilist, icount)
    kw = dict(metric=metric, scale=scale, block_m=block_m,
              block_n=block_n, bf16=bf16, plan=plan, plan_t=plan_t,
              seed=seed, dropout_rate=dropout_rate,
              need_dscale=need_dscale, dlse=g_lse)
    if metric in _COSINE:
        qn, vjp_q = jax.vjp(_l2_normalize, q)
        kn, vjp_k = jax.vjp(_l2_normalize, k)
        grads = flash_geometric_attention_bwd(qn, kn, v, mask, out, lse,
                                              g, **kw)
        dq, = vjp_q(grads[0])
        dk, = vjp_k(grads[1])
        grads = (dq, dk) + grads[2:]
    else:
        grads = flash_geometric_attention_bwd(q, k, v, mask, out, lse, g,
                                              **kw)
    if need_dscale:
        dq, dk, dv, dscale = grads
        dscale = dscale.astype(scale.dtype)
    else:
        dq, dk, dv = grads
        dscale = jnp.zeros_like(scale)
    return (dq, dk, dv, dscale, None, None, None, None, None, None,
            None, None)


_flash_diff_lse.defvjp(_flash_diff_lse_fwd, _flash_diff_lse_bwd)


def flash_geometric_attention_lse(
    q: jax.Array, k: jax.Array, v: jax.Array, mask: jax.Array,
    metric: str = "scaled_dot_product",
    scale_param: Optional[jax.Array] = None,
    block_m: int = 512, block_n: int = 1024, bf16: bool = False,
    plan=None, plan_t=None,
    dropout_rate: float = 0.0, dropout_seed: Optional[jax.Array] = None,
):
    """Like `flash_geometric_attention` but returns ``(out, lse)`` with
    the per-row logsumexp as a first-class DIFFERENTIABLE output (rows
    with no valid edges give out 0 / lse `LSE_DEAD`). This is the
    primitive for exact partial-attention merging (hybrid
    band + residual backend, `ops.sparse.merge_attention_partials`).

    3-tuple ``plan``/``plan_t`` (with slot arrays from
    `make_compact_structure_from_edges`) switch ``mask`` to the compact
    occupied-block store — mask HBM scales with occupied blocks, not
    N²; the backward then always takes the two-walk layout."""
    H = q.shape[0]
    N = q.shape[1]
    Np = _round_up(N, max(block_m, block_n))
    compact = plan is not None and len(plan) == 3
    if compact:
        if plan_t is None or len(plan_t) != 3:
            raise ValueError("compact masks need plan AND plan_t from "
                             "make_compact_structure_from_edges")
        jlist, jcount, jslot = plan
        ilist, icount, islot = plan_t
    else:
        if plan is None and plan_t is None:
            occ = _occ_from_mask(mask, block_m, block_n, Np)
            plan = _plan_from_occ(occ)
            plan_t = _plan_from_occ(occ.T)
        elif plan is None:
            plan = make_block_plan.__wrapped__(mask, block_m, block_n,
                                               n_pad=Np)
        elif plan_t is None:
            plan_t = make_block_plan.__wrapped__(mask.T, block_n,
                                                 block_m, n_pad=Np)
        jlist, jcount = plan
        ilist, icount = plan_t
        jslot = islot = jnp.zeros((1, 1), jnp.int32)
    if dropout_rate > 0.0 and dropout_seed is None:
        raise ValueError("dropout_rate > 0 requires dropout_seed")
    seed = jnp.zeros((1,), jnp.int32) if dropout_seed is None \
        else jnp.asarray(dropout_seed, jnp.int32).reshape((1,))
    scale = scale_param if scale_param is not None \
        else jnp.ones((H,), jnp.float32)
    return _flash_diff_lse(q, k, v, scale, mask, jlist, jcount, jslot,
                           ilist, icount, islot, seed, metric, block_m,
                           block_n, bf16, dropout_rate, compact)


# ---------------------------------------------------------------------------
# Edge-biased variant: the dense path's geometric-bias re-softmax
# (geometric_attention.py:567-575) computed blockwise —
#     w1 = softmax(mask(s));  [drop1];  w2 = softmax(mask(w1 + B));
#     [drop2];  out = w2 @ v
# B is a per-pair scalar shared across heads (the model scatters the
# per-edge projected bias into a dense [N, N] — O(N^2) HBM for the bias
# itself, but the [H, N, N] score/weight tensors still never leave
# VMEM). Forward = 2 walks (lse1 pass + biased streaming-softmax pass);
# backward = 3 walks (combined delta1+dB walk with heads innermost,
# dq+dscale walk, transposed dk/dv walk). Dropout after each softmax
# uses two hash-PRNG seeds regenerated from coordinates, like the
# unbiased kernel.
# ---------------------------------------------------------------------------


def _lse1_kernel(jlist_ref, jcount_ref, *rest, metric: str, n_j: int,
                 true_d: int, bf16: bool, packed: bool = False,
                 compact: bool = False):
    """First-softmax logsumexp only (no PV matmul) — feeds the biased
    main walk, which reconstructs w1 = exp(s - lse1) blockwise. With
    ``compact`` the mask input is the [n_slots, BM, mw] occupied-block
    store (jslot prefetch drives its index map)."""
    if compact:
        (jslot_ref, scale_ref, q_ref, k_ref, mask_ref,
         lse_ref, m_ref, l_ref) = rest
    else:
        (scale_ref, q_ref, k_ref, mask_ref,
         lse_ref, m_ref, l_ref) = rest
    j = pl.program_id(2)
    i = pl.program_id(1)
    h = pl.program_id(0)

    @pl.when(j == 0)
    def _init():
        m_ref[:] = jnp.full_like(m_ref, NEG_INF)
        l_ref[:] = jnp.zeros_like(l_ref)

    @pl.when(j < jcount_ref[i])
    def _compute():
        s = _block_scores(metric, q_ref[0], k_ref[0], scale_ref[h],
                          true_d, bf16)
        s = jnp.where(_mask_bits(mask_ref[0] if compact else mask_ref[:],
                                 packed) != 0, s,
                      NEG_INF)
        m_prev = m_ref[:]
        m_new = jnp.maximum(m_prev, jnp.max(s, axis=-1, keepdims=True))
        l_ref[:] = l_ref[:] * jnp.exp(m_prev - m_new) + \
            jnp.sum(jnp.exp(s - m_new), axis=-1, keepdims=True)
        m_ref[:] = m_new

    @pl.when(j == n_j - 1)
    def _fin():
        dead = m_ref[:] <= NEG_INF
        safe = jnp.where(dead, 1.0, l_ref[:])
        lse_ref[0] = jnp.where(dead, LSE_DEAD, m_ref[:] + jnp.log(safe))


def _w1_block(metric, q, k, mask, lse1_row, scale, true_d, bf16,
              seeds_ref, h, row0, col0, bm, bn, dropout_rate):
    """Recompute the (dropped) first-softmax weights for one block.
    Returns (w1, w1d, s, sq, qk) — w1 pre-drop (for the softmax-1
    backward), w1d post-drop (what the second softmax saw)."""
    qk, sq = _qk_sq(metric, q, k, bf16)
    s = _scores_from(metric, qk, sq, scale, true_d)
    w1 = jnp.where(mask != 0, jnp.exp(s - lse1_row), 0.0)
    if dropout_rate > 0.0:
        keep1 = _keep_mask(seeds_ref[0], h, row0, col0, bm, bn,
                           _keep_thresh(dropout_rate))
        w1d = jnp.where(keep1, w1 * (1.0 / (1.0 - dropout_rate)), 0.0)
    else:
        w1d = w1
    return w1, w1d, s, sq, qk


def _flash_biased_kernel(jlist_ref, jcount_ref, *rest,
                         metric: str, n_j: int, true_d: int, bf16: bool,
                         dropout_rate: float, block_m: int, block_n: int,
                         packed: bool = False, compact: bool = False):
    """Biased main walk: streaming softmax over z = drop1(w1) + B with
    the same block-sparsity plan as the lse1 walk. ``lse1`` is an INPUT,
    so the caller may pass a logsumexp over a superset of these blocks'
    edges (the hybrid band+residual union) — the walk then computes the
    band PARTIAL of the union's second softmax (out normalized within
    the walked blocks, lse2 the walked blocks' z-logsumexp), exact for
    `merge_attention_partials`. With ``compact`` the mask AND bias
    inputs are [n_slots, BM, *] occupied-block stores."""
    if compact:
        (jslot_ref, scale_ref, seeds_ref, q_ref, k_ref, v_ref, mask_ref,
         bias_ref, lse1_ref, o_ref, lse2_ref, acc_ref, m_ref,
         l_ref) = rest
    else:
        (scale_ref, seeds_ref, q_ref, k_ref, v_ref, mask_ref,
         bias_ref, lse1_ref, o_ref, lse2_ref, acc_ref, m_ref,
         l_ref) = rest
    j = pl.program_id(2)
    i = pl.program_id(1)
    h = pl.program_id(0)

    @pl.when(j == 0)
    def _init():
        acc_ref[:] = jnp.zeros_like(acc_ref)
        m_ref[:] = jnp.full_like(m_ref, NEG_INF)
        l_ref[:] = jnp.zeros_like(l_ref)

    @pl.when(j < jcount_ref[i])
    def _compute():
        mask = _mask_bits(mask_ref[0] if compact else mask_ref[:], packed)
        bias = bias_ref[0] if compact else bias_ref[:]
        row0 = i * block_m
        col0 = jlist_ref[i, j] * block_n
        _, w1d, _, _, _ = _w1_block(
            metric, q_ref[0], k_ref[0], mask, lse1_ref[0], scale_ref[h],
            true_d, bf16, seeds_ref, h, row0, col0, block_m, block_n,
            dropout_rate)
        z = jnp.where(mask != 0, w1d + bias, NEG_INF)
        m_prev = m_ref[:]
        m_new = jnp.maximum(m_prev, jnp.max(z, axis=-1, keepdims=True))
        p2 = jnp.exp(z - m_new)
        alpha = jnp.exp(m_prev - m_new)
        # denominator uses the un-dropped sum (drop2 acts on the
        # normalized weights)
        l_ref[:] = l_ref[:] * alpha + jnp.sum(p2, axis=-1, keepdims=True)
        if dropout_rate > 0.0:
            keep2 = _keep_mask(seeds_ref[1], h, row0, col0, block_m,
                               block_n, _keep_thresh(dropout_rate))
            p2 = jnp.where(keep2, p2 * (1.0 / (1.0 - dropout_rate)), 0.0)
        acc_ref[:] = acc_ref[:] * alpha + _dot(p2, v_ref[0], bf16)
        m_ref[:] = m_new

    @pl.when(j == n_j - 1)
    def _fin():
        dead = m_ref[:] <= NEG_INF
        safe = jnp.where(dead, 1.0, l_ref[:])
        o_ref[0] = jnp.where(dead, 0.0,
                             acc_ref[:] / safe).astype(o_ref.dtype)
        lse2_ref[0] = jnp.where(dead, LSE_DEAD, m_ref[:] + jnp.log(safe))


def _bwd_biased_common(metric, q, k, v, do, mask, bias, lse1_row,
                       lse2_row, delta2_row, scale, true_d, bf16,
                       seeds_ref, h, row0, col0, bm, bn, dropout_rate):
    """Full backward recompute for one block: (w2d, dw1, w1, s, sq, qk)
    where dw1 = dL/d(w1) (post softmax-1, pre drop-1 chain applied) —
    i.e. ds = w1 * (dw1 - delta1_row) completes the softmax-1 vjp."""
    w1, w1d, s, sq, qk = _w1_block(
        metric, q, k, mask, lse1_row, scale, true_d, bf16, seeds_ref, h,
        row0, col0, bm, bn, dropout_rate)
    z = jnp.where(mask != 0, w1d + bias, NEG_INF)
    w2 = jnp.exp(z - lse2_row)          # 0 on masked (z = -inf)
    dp2 = _dot(do, v.T, bf16)
    inv = 1.0 / (1.0 - dropout_rate)
    if dropout_rate > 0.0:
        keep2 = _keep_mask(seeds_ref[1], h, row0, col0, bm, bn,
                           _keep_thresh(dropout_rate))
        w2d = jnp.where(keep2, w2 * inv, 0.0)
        dp2 = jnp.where(keep2, dp2 * inv, 0.0)
    else:
        w2d = w2
    dz = w2 * (dp2 - delta2_row)
    if dropout_rate > 0.0:
        keep1 = _keep_mask(seeds_ref[0], h, row0, col0, bm, bn,
                           _keep_thresh(dropout_rate))
        dw1 = jnp.where(keep1, dz * inv, 0.0)
    else:
        dw1 = dz
    return w2d, dz, dw1, w1, s, sq, qk


def _biased_bwd_pre_kernel(jlist_ref, jcount_ref, *rest,
                           metric: str, n_j: int, n_h: int, true_d: int,
                           bf16: bool, dropout_rate: float, block_m: int,
                           block_n: int, packed: bool = False,
                           compact: bool = False):
    """Combined walk A — grid (n_i, n_j_walk, H), heads innermost:
      delta1[row, h] = sum_j w1 ⊙ dw1   (softmax-1 vjp row term)
      dB[i, j]      = sum_h dz          (bias is head-shared)
    dB blocks at unoccupied (i, j) positions are never visited and hold
    unspecified values — callers must only read positions covered by
    real edges (which lie in occupied blocks by construction). With
    ``compact``, mask/bias are occupied-block stores and dB is written
    back in the SAME compact slot layout."""
    if compact:
        # jsdb_ref: the dB output's slot table (padded/empty walk steps
        # routed to a trash slot) — consumed only by the out index map
        (jslot_ref, jsdb_ref, scale_ref, seeds_ref, q_ref, k_ref, v_ref,
         mask_ref, bias_ref, do_ref, lse1_ref, lse2_ref, delta2_ref,
         delta1_ref, db_ref, d1_acc, db_acc) = rest
    else:
        (scale_ref, seeds_ref, q_ref, k_ref, v_ref, mask_ref,
         bias_ref, do_ref, lse1_ref, lse2_ref, delta2_ref,
         delta1_ref, db_ref, d1_acc, db_acc) = rest
    i = pl.program_id(0)
    j = pl.program_id(1)
    h = pl.program_id(2)

    @pl.when(jnp.logical_and(j == 0, h == 0))
    def _init_row():
        d1_acc[:] = jnp.zeros_like(d1_acc)

    @pl.when(h == 0)
    def _init_block():
        db_acc[:] = jnp.zeros_like(db_acc)

    @pl.when(j < jcount_ref[i])
    def _compute():
        row0 = i * block_m
        col0 = jlist_ref[i, j] * block_n
        _, dz, dw1, w1, _, _, _ = _bwd_biased_common(
            metric, q_ref[0], k_ref[0], v_ref[0], do_ref[0],
            _mask_bits(mask_ref[0] if compact else mask_ref[:], packed),
            bias_ref[0] if compact else bias_ref[:],
            lse1_ref[0], lse2_ref[0], delta2_ref[0],
            scale_ref[h], true_d, bf16, seeds_ref, h, row0, col0,
            block_m, block_n, dropout_rate)
        db_acc[:] = db_acc[:] + dz
        rowsum = jnp.sum(w1 * dw1, axis=-1, keepdims=True)   # [BM, 1]
        hcol = jax.lax.broadcasted_iota(
            jnp.int32, d1_acc.shape, 1) == h
        d1_acc[:] = d1_acc[:] + jnp.where(hcol, rowsum, 0.0)

        @pl.when(h == n_h - 1)
        def _flush_db():
            if compact:
                db_ref[0] = db_acc[:]
            else:
                db_ref[:] = db_acc[:]

    @pl.when(jnp.logical_and(j == n_j - 1, h == n_h - 1))
    def _fin_row():
        delta1_ref[:] = d1_acc[:]


def _biased_bwd_dq_kernel(jlist_ref, jcount_ref, *rest, metric: str,
                          n_j: int,
                          true_d: int, bf16: bool, dropout_rate: float,
                          block_m: int, block_n: int, need_dscale: bool,
                          packed: bool = False, compact: bool = False):
    """Walk B: dq (+ dscale) over the forward plan, consuming walk A's
    delta1 (full [BM, H] block; the head column is one-hot selected —
    a (BM, 1) lane slice of an [Np, H] array violates the TPU 8x128
    block rule)."""
    if compact:
        jslot_ref, *rest = rest
    (scale_ref, seeds_ref, q_ref, k_ref, v_ref, mask_ref, bias_ref,
     do_ref, lse1_ref, lse2_ref, delta2_ref, delta1_ref,
     *rest) = rest
    if need_dscale:
        dq_ref, dsc_ref, acc_ref, dsc_acc = rest
    else:
        dq_ref, acc_ref = rest
        dsc_ref = dsc_acc = None
    j = pl.program_id(2)
    i = pl.program_id(1)
    h = pl.program_id(0)

    if need_dscale:
        @pl.when(jnp.logical_and(h == 0,
                                 jnp.logical_and(i == 0, j == 0)))
        def _zero_dsc():
            dsc_ref[:] = jnp.zeros_like(dsc_ref)

    @pl.when(j == 0)
    def _init():
        acc_ref[:] = jnp.zeros_like(acc_ref)
        if need_dscale:
            dsc_acc[:] = jnp.zeros_like(dsc_acc)

    @pl.when(j < jcount_ref[i])
    def _compute():
        q = q_ref[0]
        k = k_ref[0]
        scale = scale_ref[h]
        row0 = i * block_m
        col0 = jlist_ref[i, j] * block_n
        _, _, dw1, w1, s, sq, qk = _bwd_biased_common(
            metric, q, k, v_ref[0], do_ref[0],
            _mask_bits(mask_ref[0] if compact else mask_ref[:], packed),
            bias_ref[0] if compact else bias_ref[:],
            lse1_ref[0], lse2_ref[0], delta2_ref[0], scale, true_d,
            bf16, seeds_ref, h, row0, col0, block_m, block_n,
            dropout_rate)
        d1row = jnp.sum(
            delta1_ref[:] * (jax.lax.broadcasted_iota(
                jnp.int32, delta1_ref.shape, 1) == h),
            axis=1, keepdims=True)
        ds = w1 * (dw1 - d1row)          # [BM, BN]
        acc_ref[:] = acc_ref[:] + _chain_dq(metric, ds, s, sq, qk, q, k,
                                            scale, true_d, bf16)
        if need_dscale:
            common = jnp.sum(ds * s * sq)
            factor = 1.0 / (scale * scale * scale) \
                if metric == "gaussian_kernel" else -1.0
            dsc_acc[:] = dsc_acc[:] + common * factor

    @pl.when(j == n_j - 1)
    def _fin():
        dq_ref[0] = acc_ref[:].astype(dq_ref.dtype)
        if need_dscale:
            hot = jnp.logical_and(
                jax.lax.broadcasted_iota(jnp.int32, dsc_ref.shape, 0)
                == h,
                jax.lax.broadcasted_iota(jnp.int32, dsc_ref.shape, 1)
                == i)
            dsc_ref[:] = dsc_ref[:] + jnp.where(hot, dsc_acc[0, 0], 0.0)


def _biased_bwd_dkv_kernel(ilist_ref, icount_ref, *rest,
                           metric: str, n_i: int, true_d: int, bf16: bool,
                           dropout_rate: float, block_m: int,
                           block_n: int, packed: bool = False,
                           compact: bool = False):
    """Walk C: dk/dv over the transposed plan."""
    if compact:
        (islot_ref, scale_ref, seeds_ref, q_ref, k_ref, v_ref, mask_ref,
         bias_ref, do_ref, lse1_ref, lse2_ref, delta2_ref,
         delta1_ref, dk_ref, dv_ref, dk_acc, dv_acc) = rest
    else:
        (scale_ref, seeds_ref, q_ref, k_ref, v_ref, mask_ref,
         bias_ref, do_ref, lse1_ref, lse2_ref, delta2_ref,
         delta1_ref, dk_ref, dv_ref, dk_acc, dv_acc) = rest
    i = pl.program_id(2)
    j = pl.program_id(1)
    h = pl.program_id(0)

    @pl.when(i == 0)
    def _init():
        dk_acc[:] = jnp.zeros_like(dk_acc)
        dv_acc[:] = jnp.zeros_like(dv_acc)

    @pl.when(i < icount_ref[j])
    def _compute():
        q = q_ref[0]
        k = k_ref[0]
        scale = scale_ref[h]
        row0 = ilist_ref[j, i] * block_m
        col0 = j * block_n
        w2d, _, dw1, w1, s, sq, qk = _bwd_biased_common(
            metric, q, k, v_ref[0], do_ref[0],
            _mask_bits(mask_ref[0] if compact else mask_ref[:], packed),
            bias_ref[0] if compact else bias_ref[:],
            lse1_ref[0], lse2_ref[0], delta2_ref[0], scale, true_d,
            bf16, seeds_ref, h, row0, col0, block_m, block_n,
            dropout_rate)
        d1row = jnp.sum(
            delta1_ref[:] * (jax.lax.broadcasted_iota(
                jnp.int32, delta1_ref.shape, 1) == h),
            axis=1, keepdims=True)
        ds = w1 * (dw1 - d1row)
        dv_acc[:] = dv_acc[:] + _dot(w2d.T, do_ref[0], bf16)
        dk_acc[:] = dk_acc[:] + _chain_dk(metric, ds, s, sq, qk, q, k,
                                          scale, true_d, bf16)

    @pl.when(i == n_i - 1)
    def _fin():
        dk_ref[0] = dk_acc[:].astype(dk_ref.dtype)
        dv_ref[0] = dv_acc[:].astype(dv_ref.dtype)


def _flash_forward(
    q: jax.Array,            # [H, N, D]
    k: jax.Array,            # [H, N, D]
    v: jax.Array,            # [H, N, D]
    mask: jax.Array,         # bool/int8 [N, N] — True where j attends-to
    metric: str = "scaled_dot_product",
    scale_param: Optional[jax.Array] = None,   # [H] sigma/gamma
    block_m: int = 512,
    block_n: int = 1024,
    bf16: bool = False,
    max_blocks_per_row: Optional[int] = None,
    plan=None,    # optional precomputed (jlist, jcount) from make_block_plan
    seed: Optional[jax.Array] = None,          # i32[1] dropout seed
    dropout_rate: float = 0.0,
    return_lse: bool = False,
) -> jax.Array:
    """Fused edge-masked attention for one snapshot. Returns [H, N, D]
    context (rows with an empty mask row come back zero); with
    ``return_lse`` also the per-row logsumexp [H, N] (LSE_DEAD on empty
    rows) consumed by the Pallas backward.

    max_blocks_per_row: static upper bound on occupied [BM, BN] key
    blocks per query block — shrinks the grid's j extent so block-sparse
    graphs pay only for occupied blocks (the caller computes it host-side
    from the graph structure, e.g. via `occupied_blocks_bound`). Must be
    >= the true maximum or edges are dropped (checked by
    `occupied_blocks_bound`, not here — shapes must stay static).

    A 3-tuple ``plan`` (jlist, jcount, jslot) switches to the COMPACT
    mask form: ``mask`` is then the [n_slots, BM, BN] (or packed
    [n_slots, BM, BN//8]) occupied-block store from
    `make_compact_structure_from_edges` — mask HBM scales with the
    occupied blocks, not N² (the >HBM-graph path, SURVEY §2.9)."""
    if metric not in MXU_METRICS:
        raise NotImplementedError(
            f"metric {metric} is not MXU-expressible; use ops.sparse")
    H, N, D = q.shape
    Dv = v.shape[-1]          # q/k and v feature dims may differ (e.g.
                              # mahalanobis runs q/k in factor space)
    if metric in _COSINE:
        q = _l2_normalize(q)
        k = _l2_normalize(k)
    if scale_param is None:
        scale_param = jnp.ones((H,), jnp.float32)
    if seed is None:
        seed = jnp.zeros((1,), jnp.int32)

    compact = plan is not None and len(plan) == 3

    # pad to block multiples; padded mask columns/rows are zero
    Np = _round_up(N, max(block_m, block_n))
    Dp = _round_up(max(D, Dv), 128)
    if Np != N or Dp != D or Dp != Dv:
        q = jnp.pad(q, ((0, 0), (0, Np - N), (0, Dp - D)))
        k = jnp.pad(k, ((0, 0), (0, Np - N), (0, Dp - D)))
        v = jnp.pad(v, ((0, 0), (0, Np - N), (0, Dp - Dv)))
        if not compact:
            mask = jnp.pad(mask.astype(jnp.int8),
                           ((0, Np - N), (0, Np - N)))
    mask = mask.astype(jnp.int8)

    n_i = Np // block_m
    n_j = Np // block_n

    # compacted occupied-block lists: jlist[i] holds the occupied j
    # indices for query block i (padded by repeating the last entry, so
    # the pipeline's same-index dedup skips the DMA), jcount[i] how many.
    jslot = None
    if compact:
        jlist, jcount, jslot = plan
    elif plan is not None:
        jlist, jcount = plan
    else:
        jlist, jcount = make_block_plan.__wrapped__(
            mask, block_m, block_n, n_pad=Np)

    # static grid shrink for block-sparse graphs (a pre-shrunk plan also
    # bounds the walk via its own width)
    n_walk = min(jlist.shape[1],
                 n_j if max_blocks_per_row is None else max_blocks_per_row)
    jlist = jlist[:, :n_walk]
    jcount = jnp.minimum(jcount, n_walk)
    if jslot is not None:
        jslot = jslot[:, :n_walk]
    grid = (H, n_i, n_walk)
    n_j = n_walk

    if compact:
        # the block store is pre-packed (or not) by its builder
        packed = mask.shape[-1] * 8 == block_n
        mask_op = mask
        mw = mask.shape[-1]
        mask_spec = pl.BlockSpec(
            (1, block_m, mw),
            lambda h, i, j, jl, jc, js, sc, sd: (js[i, j], 0, 0),
            memory_space=pltpu.VMEM)

        def _im_kv(h, i, j, jl, jc, js, sc, sd):
            return (h, jl[i, j], 0)
        prefetch = (jlist, jcount.astype(jnp.int32),
                    jslot.astype(jnp.int32))
    else:
        packed = _mask_packable(Np, block_n)
        mask_op = _pack_mask(mask, block_n) if packed else mask
        mw = block_n // 8 if packed else block_n
        mask_spec = pl.BlockSpec(
            (block_m, mw),
            lambda h, i, j, jl, jc, sc, sd: (i, jl[i, j]),
            memory_space=pltpu.VMEM)

        def _im_kv(h, i, j, jl, jc, sc, sd):
            return (h, jl[i, j], 0)
        prefetch = (jlist, jcount.astype(jnp.int32))

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=len(prefetch) + 2,
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, block_m, Dp), lambda h, i, j, *_: (h, i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, block_n, Dp), _im_kv,
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, block_n, Dp), _im_kv,
                         memory_space=pltpu.VMEM),
            mask_spec,
        ],
        out_specs=(
            pl.BlockSpec((1, block_m, Dp),
                         lambda h, i, j, *_: (h, i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, block_m, 1),
                         lambda h, i, j, *_: (h, i, 0),
                         memory_space=pltpu.VMEM),
        ),
        scratch_shapes=[
            pltpu.VMEM((block_m, Dp), jnp.float32),   # acc
            pltpu.VMEM((block_m, 1), jnp.float32),    # running max
            pltpu.VMEM((block_m, 1), jnp.float32),    # running sum
        ],
    )

    out, lse = _pcall(
        functools.partial(_flash_kernel, metric=metric, n_j=n_j,
                          true_d=D, bf16=bf16, dropout_rate=dropout_rate,
                          block_m=block_m, block_n=block_n,
                          packed=packed, compact=compact),
        grid_spec=grid_spec,
        out_shape=(jax.ShapeDtypeStruct((H, Np, Dp), q.dtype),
                   jax.ShapeDtypeStruct((H, Np, 1), jnp.float32)),
        cost_estimate=pl.CostEstimate(
            flops=2 * 2 * H * Np * Np * Dp,
            bytes_accessed=4 * H * Np * Dp * 4 + Np * Np,
            transcendentals=H * Np * Np,
        ),
    )(*prefetch, scale_param.astype(jnp.float32),
      jnp.asarray(seed, jnp.int32).reshape((1,)), q, k, v, mask_op)
    if return_lse:
        return out[:, :N, :Dv], lse[:, :N, 0]
    return out[:, :N, :Dv]


# ---------------------------------------------------------------------------
# Pallas backward kernels (flash-attention backward, edge-masked)
# ---------------------------------------------------------------------------

def _dot(a, b, bf16: bool):
    """MXU contraction with fp32 accumulate; optional bf16 inputs."""
    if bf16:
        return jnp.dot(a.astype(jnp.bfloat16), b.astype(jnp.bfloat16),
                       preferred_element_type=jnp.float32)
    return jnp.dot(a, b, preferred_element_type=jnp.float32)


def _bwd_block(metric, q, k, v, do, lse_row, delta_row, mask, true_d,
               scale, bf16, keep, keep_inv):
    """Shared recompute for a backward block: returns
    (p, ds, s, sq, qk) where p is the (normalized) probability block and
    ds = dL/dscores. `keep` is the regenerated dropout mask (or None)."""
    qk, sq = _qk_sq(metric, q, k, bf16)
    s = _scores_from(metric, qk, sq, scale, true_d)
    p = jnp.where(mask != 0, jnp.exp(s - lse_row), 0.0)
    dp = _dot(do, v.T, bf16)
    if keep is not None:
        dp = jnp.where(keep, dp * keep_inv, 0.0)
    ds = p * (dp - delta_row)
    return p, ds, s, sq, qk


def _dsq_from_ds(metric, ds, s, sq, scale):
    """Chain dL/dscore -> dL/d(squared distance) for sq-based metrics."""
    if metric == "squared_euclidean":
        return -ds
    if metric == "euclidean":
        return ds * (-0.5 * jax.lax.rsqrt(sq + 1e-8))
    if metric == "gaussian_kernel":
        return ds * s * (-1.0 / (2.0 * scale * scale))
    if metric == "rbf_kernel":
        return ds * (-scale * s)
    raise NotImplementedError(metric)


def _chain_dq(metric, ds, s, sq, qk, q, k, scale, true_d, bf16):
    """dq contribution of a block given ds [BM, BN]."""
    if metric == "dot_product":
        return _dot(ds, k, bf16)
    if metric == "scaled_dot_product":
        return _dot(ds, k, bf16) / math.sqrt(true_d)
    if metric in _COSINE:
        return _dot(ds * _clip_grad(qk), k, bf16)
    dsq = _dsq_from_ds(metric, ds, s, sq, scale)
    row = jnp.sum(dsq, axis=1, keepdims=True)
    return 2.0 * (row * q - _dot(dsq, k, bf16))


def _chain_dk(metric, ds, s, sq, qk, q, k, scale, true_d, bf16):
    """dk contribution of a block given ds [BM, BN]."""
    if metric == "dot_product":
        return _dot(ds.T, q, bf16)
    if metric == "scaled_dot_product":
        return _dot(ds.T, q, bf16) / math.sqrt(true_d)
    if metric in _COSINE:
        return _dot((ds * _clip_grad(qk)).T, q, bf16)
    dsq = _dsq_from_ds(metric, ds, s, sq, scale)
    col = jnp.sum(dsq, axis=0)[:, None]
    return 2.0 * (col * k - _dot(dsq.T, q, bf16))


def _flash_bwd_dq_kernel(jlist_ref, jcount_ref, *rest, metric, n_j,
                         true_d, bf16, dropout_rate, block_m, block_n,
                         need_dscale, packed=False, compact=False):
    """dq accumulation over a compacted walk of occupied key blocks
    (same block-sparsity plan as the forward). With `need_dscale`, also
    reduces d(sigma)/d(gamma) per (head, query-block) into a second
    output (summed outside). That output's block is the FULL [H, n_i]
    array (constant index map, one-hot accumulate): a (1, 1) block
    fails the TPU lowering's 8x128 divisibility rule — caught on
    hardware, invisible in interpret mode. ``compact`` switches the
    mask input to the occupied-block store (jslot-prefetch-indexed)."""
    if compact:
        (jslot_ref, scale_ref, seed_ref, q_ref, k_ref, v_ref, mask_ref,
         do_ref, lse_ref, delta_ref, *rest) = rest
    else:
        (scale_ref, seed_ref, q_ref, k_ref, v_ref, mask_ref,
         do_ref, lse_ref, delta_ref, *rest) = rest
    if need_dscale:
        dq_ref, dsc_ref, acc_ref, dsc_acc = rest
    else:
        dq_ref, acc_ref = rest
        dsc_ref = dsc_acc = None
    j = pl.program_id(2)
    i = pl.program_id(1)
    h = pl.program_id(0)

    if need_dscale:
        @pl.when(jnp.logical_and(h == 0,
                                 jnp.logical_and(i == 0, j == 0)))
        def _zero_dsc():
            dsc_ref[:] = jnp.zeros_like(dsc_ref)

    @pl.when(j == 0)
    def _init():
        acc_ref[:] = jnp.zeros_like(acc_ref)
        if need_dscale:
            dsc_acc[:] = jnp.zeros_like(dsc_acc)

    @pl.when(j < jcount_ref[i])
    def _compute():
        q = q_ref[0]
        k = k_ref[0]
        v = v_ref[0]
        do = do_ref[0]
        lse_row = lse_ref[0]        # [BM, 1]
        delta_row = delta_ref[0]    # [BM, 1]
        scale = scale_ref[h]
        keep = None
        if dropout_rate > 0.0:
            keep = _keep_mask(seed_ref[0], h, i * block_m,
                              jlist_ref[i, j] * block_n, block_m, block_n,
                              _keep_thresh(dropout_rate))
        p, ds, s, sq, qk = _bwd_block(
            metric, q, k, v, do, lse_row, delta_row,
            _mask_bits(mask_ref[0] if compact else mask_ref[:], packed),
            true_d, scale, bf16, keep, 1.0 / (1.0 - dropout_rate))
        acc_ref[:] = acc_ref[:] + _chain_dq(metric, ds, s, sq, qk, q, k,
                                            scale, true_d, bf16)
        if need_dscale:
            # gaussian: ds/dsigma = s*sq/sigma^3 ; rbf: ds/dgamma = -sq*s
            common = jnp.sum(ds * s * sq)
            factor = 1.0 / (scale * scale * scale) \
                if metric == "gaussian_kernel" else -1.0
            dsc_acc[:] = dsc_acc[:] + common * factor

    @pl.when(j == n_j - 1)
    def _fin():
        dq_ref[0] = acc_ref[:].astype(dq_ref.dtype)
        if need_dscale:
            # one-hot accumulate into the resident full block (grid
            # cells run sequentially on the core, so RMW is safe)
            hot = jnp.logical_and(
                jax.lax.broadcasted_iota(jnp.int32, dsc_ref.shape, 0)
                == h,
                jax.lax.broadcasted_iota(jnp.int32, dsc_ref.shape, 1)
                == i)
            dsc_ref[:] = dsc_ref[:] + jnp.where(hot, dsc_acc[0, 0], 0.0)


def _flash_bwd_dkv_kernel(ilist_ref, icount_ref, *rest, metric, n_i,
                          true_d, bf16, dropout_rate, block_m, block_n,
                          packed=False, compact=False):
    """dk/dv accumulation over a compacted walk of occupied *query*
    blocks (the transposed plan). ``compact`` switches the mask input
    to the occupied-block store (islot-prefetch-indexed)."""
    if compact:
        (islot_ref, scale_ref, seed_ref, q_ref, k_ref, v_ref, mask_ref,
         do_ref, lse_ref, delta_ref, dk_ref, dv_ref, dk_acc,
         dv_acc) = rest
    else:
        (scale_ref, seed_ref, q_ref, k_ref, v_ref, mask_ref,
         do_ref, lse_ref, delta_ref, dk_ref, dv_ref, dk_acc,
         dv_acc) = rest
    i = pl.program_id(2)
    j = pl.program_id(1)
    h = pl.program_id(0)

    @pl.when(i == 0)
    def _init():
        dk_acc[:] = jnp.zeros_like(dk_acc)
        dv_acc[:] = jnp.zeros_like(dv_acc)

    @pl.when(i < icount_ref[j])
    def _compute():
        q = q_ref[0]
        k = k_ref[0]
        v = v_ref[0]
        do = do_ref[0]
        lse_row = lse_ref[0]        # [BM, 1]
        delta_row = delta_ref[0]    # [BM, 1]
        scale = scale_ref[h]
        keep = None
        keep_inv = 1.0 / (1.0 - dropout_rate)
        if dropout_rate > 0.0:
            keep = _keep_mask(seed_ref[0], h, ilist_ref[j, i] * block_m,
                              j * block_n, block_m, block_n,
                              _keep_thresh(dropout_rate))
        p, ds, s, sq, qk = _bwd_block(
            metric, q, k, v, do, lse_row, delta_row,
            _mask_bits(mask_ref[0] if compact else mask_ref[:], packed),
            true_d, scale, bf16, keep, keep_inv)
        if keep is not None:
            p_v = jnp.where(keep, p * keep_inv, 0.0)
        else:
            p_v = p
        dv_acc[:] = dv_acc[:] + _dot(p_v.T, do, bf16)
        dk_acc[:] = dk_acc[:] + _chain_dk(metric, ds, s, sq, qk, q, k,
                                          scale, true_d, bf16)

    @pl.when(i == n_i - 1)
    def _fin():
        dk_ref[0] = dk_acc[:].astype(dk_ref.dtype)
        dv_ref[0] = dv_acc[:].astype(dv_ref.dtype)


def _flash_bwd_fused_kernel(ilist_ref, icount_ref, scale_ref, seed_ref,
                            q_ref, k_ref, v_ref, mask_ref, do_ref, lse_ref,
                            delta_ref, *rest, metric, n_i, true_d, bf16,
                            dropout_rate, block_m, block_n, need_dscale,
                            packed=False):
    """Single-walk backward: dq, dk, dv (and dscale) from ONE pass over
    the transposed plan's (key strip, occupied query block) walk — the
    block recompute (QK^T, dP) is shared, so 5 matmul stages per block
    instead of the two-walk path's 7, and q/k/v/do/mask blocks are
    DMA'd once instead of twice.

    dk/dv accumulate in VMEM scratch along the walk (as in the dkv
    kernel). dq cannot accumulate across *key strips* without revisiting
    output blocks (undefined on the TPU pipeline), so each step writes a
    **dq partial** into slot (j, h, query-block) of a [n_j, H, Np, Dp]
    HBM buffer — the splash-attention fused-backward pattern
    (jax/experimental/pallas/ops/tpu/splash_attention) adapted to the
    compacted block-sparse walks: padded walk steps repeat the last
    active block index with the buffer unchanged (an idempotent
    rewrite), and slots the walk never visits are masked out by the
    caller before the cross-strip sum."""
    if need_dscale:
        (dk_ref, dv_ref, dqp_ref, dsc_ref,
         dk_acc, dv_acc, dq_acc, dsc_acc) = rest
    else:
        dk_ref, dv_ref, dqp_ref, dk_acc, dv_acc, dq_acc = rest
        dsc_ref = dsc_acc = None
    i = pl.program_id(2)
    j = pl.program_id(1)
    h = pl.program_id(0)

    if need_dscale:
        @pl.when(jnp.logical_and(h == 0,
                                 jnp.logical_and(j == 0, i == 0)))
        def _zero_dsc():
            dsc_ref[:] = jnp.zeros_like(dsc_ref)

    @pl.when(i == 0)
    def _init():
        dk_acc[:] = jnp.zeros_like(dk_acc)
        dv_acc[:] = jnp.zeros_like(dv_acc)
        if need_dscale:
            dsc_acc[:] = jnp.zeros_like(dsc_acc)

    # An inactive i == 0 step (a key strip with an empty walk) still
    # computes: its mask block is all-zero by construction (the block is
    # unoccupied), so every contribution — including the dq partial that
    # lands in slot (j, h, 0) — is exactly zero.
    @pl.when(jnp.logical_or(i < icount_ref[j], i == 0))
    def _compute():
        q = q_ref[0]
        k = k_ref[0]
        v = v_ref[0]
        do = do_ref[0]
        lse_row = lse_ref[0]        # [BM, 1]
        delta_row = delta_ref[0]    # [BM, 1]
        scale = scale_ref[h]
        keep = None
        keep_inv = 1.0 / (1.0 - dropout_rate)
        if dropout_rate > 0.0:
            keep = _keep_mask(seed_ref[0], h, ilist_ref[j, i] * block_m,
                              j * block_n, block_m, block_n,
                              _keep_thresh(dropout_rate))
        p, ds, s, sq, qk = _bwd_block(
            metric, q, k, v, do, lse_row, delta_row,
            _mask_bits(mask_ref[:], packed), true_d,
            scale, bf16, keep, keep_inv)
        if keep is not None:
            p_v = jnp.where(keep, p * keep_inv, 0.0)
        else:
            p_v = p
        dv_acc[:] = dv_acc[:] + _dot(p_v.T, do, bf16)
        dk_acc[:] = dk_acc[:] + _chain_dk(metric, ds, s, sq, qk, q, k,
                                          scale, true_d, bf16)
        dq_acc[:] = _chain_dq(metric, ds, s, sq, qk, q, k,
                              scale, true_d, bf16)
        if need_dscale:
            common = jnp.sum(ds * s * sq)
            factor = 1.0 / (scale * scale * scale) \
                if metric == "gaussian_kernel" else -1.0
            dsc_acc[:] = dsc_acc[:] + common * factor

    # every step (re)writes its dq partial block — see docstring
    dqp_ref[0, 0] = dq_acc[:].astype(dqp_ref.dtype)

    @pl.when(i == n_i - 1)
    def _fin():
        dk_ref[0] = dk_acc[:].astype(dk_ref.dtype)
        dv_ref[0] = dv_acc[:].astype(dv_ref.dtype)
        if need_dscale:
            hot = jnp.logical_and(
                jax.lax.broadcasted_iota(jnp.int32, dsc_ref.shape, 0)
                == h,
                jax.lax.broadcasted_iota(jnp.int32, dsc_ref.shape, 1)
                == j)
            dsc_ref[:] = dsc_ref[:] + jnp.where(hot, dsc_acc[0, 0], 0.0)


# Fused single-walk backward (see _flash_bwd_fused_kernel): 5 matmul
# stages per block vs 7 and half the backward input DMA, at the cost of
# a [n_j, H, Np, 128] fp32 dq-partial buffer in HBM. None = auto: fused
# only when that buffer fits FUSED_DQ_BUDGET AND the analytic
# scoped-VMEM estimate fits FUSED_VMEM_BUDGET (the large-block layouts
# blow the chip's 16 MB scoped-VMEM limit — 17.77 MB measured on v5e at
# block 512x1024, BENCH_r02; CPU interpret mode cannot catch this).
# True/False force it for tests/experiments.
FUSED_BWD: Optional[bool] = None
FUSED_DQ_BUDGET = 1 << 29    # 512 MB
# Safety margin under the 16 MB scoped-VMEM hardware limit; the
# estimate itself is slightly conservative (18.6 MB modeled vs 17.77 MB
# measured at block 512x1024).
FUSED_VMEM_BUDGET = 14 << 20


def _fused_bwd_vmem_bytes(block_m: int, block_n: int, Dp: int,
                          packed: bool = False,
                          need_dscale: bool = False) -> int:
    """Analytic scoped-VMEM estimate for the fused single-walk backward
    kernel: Mosaic's scoped allocation = double-buffered in/out block
    windows + single-buffered scratch + live [BM, BN] fp32 score-block
    temporaries (qk/s, p, dp, ds + one spill — ~5 live at once; the
    measured footprint at block 512x1024/Dp 128 is 17.77 MB, this model
    gives 18.6 MB)."""
    f32 = 4
    mb = block_m * Dp * f32              # query-sized window
    nb = block_n * Dp * f32              # key-strip-sized window
    mask_b = block_m * (block_n // 8 if packed else block_n)
    # in: q, do, dqp-out are mb; k, v, dk-out, dv-out are nb;
    # lse + delta are [BM, 1] rows — all double-buffered by the pipeline
    windows = 2 * (3 * mb + 4 * nb + mask_b + 2 * block_m * f32)
    scratch = 2 * nb + mb                # dk_acc, dv_acc, dq_acc
    temporaries = 5 * block_m * block_n * f32
    extra = (block_m * 16 * f32) if need_dscale else 0
    return windows + scratch + temporaries + extra


def _bwd_fused_call(q, k, v, do, mask_op, lse_i, delta_i, scale, seed,
                    ilist, icount, *, metric, block_m, block_n, bf16,
                    dropout_rate, need_dscale, packed, mw, H, N, D, Dv,
                    Np, Dp, n_i, n_j, n_walk_i):
    """Launch the fused single-walk backward and reduce the dq partials.

    Slots of the [n_j, H, Np, Dp] partial buffer that the compacted walk
    never visits hold uninitialized memory; a walk-derived validity mask
    zeroes them (jnp.where — a select, so even NaN garbage is inert)
    before the cross-strip sum."""
    out_specs = [
        pl.BlockSpec((1, block_n, Dp), lambda h, j, i, *_: (h, j, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((1, block_n, Dp), lambda h, j, i, *_: (h, j, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((1, 1, block_m, Dp),
                     lambda h, j, i, il, ic, sc, sd: (j, h, il[j, i], 0),
                     memory_space=pltpu.VMEM),
    ]
    out_shapes = [
        jax.ShapeDtypeStruct((H, Np, Dp), k.dtype),
        jax.ShapeDtypeStruct((H, Np, Dp), v.dtype),
        # fp32 regardless of q.dtype: the FUSED_DQ_BUDGET math assumes
        # 4-byte partials, and the cross-strip reduction must accumulate
        # in fp32 (the two-walk path gets this via its VMEM scratch)
        jax.ShapeDtypeStruct((n_j, H, Np, Dp), jnp.float32),
    ]
    scratch = [pltpu.VMEM((block_n, Dp), jnp.float32),
               pltpu.VMEM((block_n, Dp), jnp.float32),
               pltpu.VMEM((block_m, Dp), jnp.float32)]
    if need_dscale:
        # FULL-array block (constant index map), one-hot accumulated —
        # same lowering rule as the two-walk dq kernel's dscale output
        out_specs.append(pl.BlockSpec((H, n_j), lambda h, j, i, *_: (0, 0),
                                      memory_space=pltpu.VMEM))
        out_shapes.append(jax.ShapeDtypeStruct((H, n_j), jnp.float32))
        scratch.append(pltpu.VMEM((1, 1), jnp.float32))

    spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=4,
        grid=(H, n_j, n_walk_i),
        in_specs=[
            pl.BlockSpec((1, block_m, Dp),
                         lambda h, j, i, il, ic, sc, sd: (h, il[j, i], 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, block_n, Dp), lambda h, j, i, *_: (h, j, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, block_n, Dp), lambda h, j, i, *_: (h, j, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((block_m, mw),
                         lambda h, j, i, il, ic, sc, sd: (il[j, i], j),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, block_m, Dp),
                         lambda h, j, i, il, ic, sc, sd: (h, il[j, i], 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, block_m, 1),
                         lambda h, j, i, il, ic, sc, sd: (h, il[j, i], 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, block_m, 1),
                         lambda h, j, i, il, ic, sc, sd: (h, il[j, i], 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=tuple(out_specs),
        scratch_shapes=scratch,
    )
    res = _pcall(
        functools.partial(_flash_bwd_fused_kernel, metric=metric,
                          n_i=n_walk_i, true_d=D, bf16=bf16,
                          dropout_rate=dropout_rate, block_m=block_m,
                          block_n=block_n, need_dscale=need_dscale,
                          packed=packed),
        grid_spec=spec,
        out_shape=tuple(out_shapes),
    )(ilist, icount, scale, seed, q, k, v, mask_op, do, lse_i, delta_i)
    if need_dscale:
        dk, dv, dqp, dsc = res
        dscale = jnp.sum(dsc, axis=1)                      # [H]
    else:
        dk, dv, dqp = res
        dscale = None

    # validity: visited[j, qb] = strip j's walk wrote slot qb
    il = ilist[:, :n_walk_i]
    jj = jnp.broadcast_to(jnp.arange(n_j)[:, None], il.shape)
    pos = jnp.broadcast_to(jnp.arange(n_walk_i)[None, :], il.shape)
    live = (pos < icount[:, None]).astype(jnp.int32)
    visited = jnp.zeros((n_j, n_i), jnp.int32).at[jj, il].add(live) > 0
    # an empty walk still writes zeros into slot (j, h, 0) — harmless,
    # and marking it visited costs nothing (the content is exact zero)
    visited = visited.at[:, 0].set(
        jnp.logical_or(visited[:, 0], icount == 0))
    vrows = jnp.repeat(visited, block_m, axis=1)           # [n_j, Np]
    dq = jnp.sum(jnp.where(vrows[:, None, :, None], dqp, 0.0),
                 axis=0).astype(q.dtype)

    if need_dscale:
        return dq[:, :N, :D], dk[:, :N, :D], dv[:, :N, :Dv], dscale
    return dq[:, :N, :D], dk[:, :N, :D], dv[:, :N, :Dv]


def flash_geometric_attention_bwd(
    q, k, v, mask, out, lse, do,
    metric: str = "scaled_dot_product",
    scale: Optional[jax.Array] = None,
    block_m: int = 512, block_n: int = 1024, bf16: bool = False,
    plan=None, plan_t=None,
    seed: Optional[jax.Array] = None, dropout_rate: float = 0.0,
    need_dscale: bool = False,
    fused: Optional[bool] = None,
    dlse: Optional[jax.Array] = None,
):
    """Pallas flash backward: (dq, dk, dv[, dscale]) without
    materializing [N, N] scores in HBM — every MXU metric. For the
    cosine metrics, q/k must already be L2-normalized (the caller pulls
    the normalization chain back — see `_flash_diff_bwd`).
    `plan`/`plan_t` reuse the forward's block-sparsity plans (possibly
    pre-shrunk — the walk extent is each plan's width).

    `fused` selects the kernel layout: True = single-walk fused kernel
    (5 matmul stages/block, dq partials per key strip — see
    `_flash_bwd_fused_kernel`), False = the two-walk dq + dkv kernels
    (no extra HBM buffer — required once the [n_j, H, Np, 128] partial
    would not fit), None = module default `FUSED_BWD`, itself defaulting
    to a size-based auto rule: fused only when the HBM partial fits
    `FUSED_DQ_BUDGET` AND the analytic scoped-VMEM working set
    (`_fused_bwd_vmem_bytes`) fits `FUSED_VMEM_BUDGET` — at the 10K
    headline geometry (block 512x1024) the fused layout exceeds the
    16 MB scoped-VMEM chip limit (17.77 MB measured on v5e), so auto
    picks two-walk there.

    3-tuple plans (jlist, jcount, jslot) switch to the COMPACT mask
    form (``mask`` = [n_slots, BM, mw] occupied-block store, see
    `make_compact_structure_from_edges`); compact always takes the
    two-walk layout. ``dlse`` is the optional cotangent of the
    forward's logsumexp output (used by the hybrid band+residual merge,
    `flash_geometric_attention_lse`): it folds into the softmax vjp as
    ds = p * (dp - (delta - dlse))."""
    if metric not in BWD_METRICS:
        raise NotImplementedError(metric)
    H, N, D = q.shape
    Dv = v.shape[-1]
    Np = _round_up(N, max(block_m, block_n))
    Dp = _round_up(max(D, Dv), 128)
    compact = plan is not None and len(plan) == 3
    if scale is None:
        scale = jnp.ones((H,), jnp.float32)
    if seed is None:
        seed = jnp.zeros((1,), jnp.int32)
    seed = jnp.asarray(seed, jnp.int32).reshape((1,))
    if Np != N or Dp != D or Dp != Dv:
        padqk = ((0, 0), (0, Np - N), (0, Dp - D))
        padv = ((0, 0), (0, Np - N), (0, Dp - Dv))
        q = jnp.pad(q, padqk)
        k = jnp.pad(k, padqk)
        v = jnp.pad(v, padv)
        do = jnp.pad(do, padv)
        out = jnp.pad(out, padv)
        if not compact:
            mask = jnp.pad(mask.astype(jnp.int8),
                           ((0, Np - N), (0, Np - N)))
        lse = jnp.pad(lse, ((0, 0), (0, Np - N)),
                      constant_values=LSE_DEAD)
        if dlse is not None:
            dlse = jnp.pad(dlse, ((0, 0), (0, Np - N)))
    mask = mask.astype(jnp.int8)
    delta = jnp.sum(do * out, axis=-1)                 # [H, Np]
    if dlse is not None:
        # logsumexp cotangent: dlse/ds_ij = p_ij, so it rides the
        # existing softmax vjp via delta' = delta - dlse
        delta = delta - dlse.astype(delta.dtype)

    n_i = Np // block_m
    n_j = Np // block_n
    lse_i = lse[..., None]        # (H, Np, 1)
    delta_i = delta[..., None]
    scale = scale.astype(jnp.float32)

    # block-sparsity plans: forward plan drives dq's key walk, the
    # transposed plan drives dk/dv's query walk
    if plan is None:
        plan = make_block_plan.__wrapped__(mask, block_m, block_n,
                                           n_pad=Np)
    if plan_t is None:
        plan_t = make_block_plan.__wrapped__(mask.T, block_n, block_m,
                                             n_pad=Np)
    jslot = islot = None
    if compact:
        if len(plan_t) != 3:
            raise ValueError("compact plans need plan_t with islot too")
        jlist, jcount, jslot = plan
        ilist, icount, islot = plan_t
    else:
        jlist, jcount = plan
        ilist, icount = plan_t
    n_walk_j = min(jlist.shape[1], n_j)
    n_walk_i = min(ilist.shape[1], n_i)
    jcount = jnp.minimum(jcount, n_walk_j)
    icount = jnp.minimum(icount, n_walk_i)

    if compact:
        packed = mask.shape[-1] * 8 == block_n
        mask_op = mask
        mw = mask.shape[-1]
    else:
        packed = _mask_packable(Np, block_n)
        mask_op = _pack_mask(mask, block_n) if packed else mask
        mw = block_n // 8 if packed else block_n

    if fused is None:
        fused = FUSED_BWD
    if compact:
        fused = False        # fused layout has no compact mask plumbing
    if fused is None:
        fused = (n_j * H * Np * Dp * 4 <= FUSED_DQ_BUDGET
                 and _fused_bwd_vmem_bytes(block_m, block_n, Dp, packed,
                                           need_dscale)
                 <= FUSED_VMEM_BUDGET)
    if fused:
        return _bwd_fused_call(
            q, k, v, do, mask_op, lse_i, delta_i, scale, seed,
            ilist, icount, metric=metric, block_m=block_m,
            block_n=block_n, bf16=bf16, dropout_rate=dropout_rate,
            need_dscale=need_dscale, packed=packed, mw=mw, H=H, N=N,
            D=D, Dv=Dv, Np=Np, Dp=Dp, n_i=n_i, n_j=n_j,
            n_walk_i=n_walk_i)

    dq_out_specs = pl.BlockSpec((1, block_m, Dp),
                                lambda h, i, j, *_: (h, i, 0),
                                memory_space=pltpu.VMEM)
    dq_out_shape = jax.ShapeDtypeStruct((H, Np, Dp), q.dtype)
    dq_scratch = [pltpu.VMEM((block_m, Dp), jnp.float32)]
    if need_dscale:
        # FULL-array block (constant index map) — (1, 1) blocks violate
        # the TPU 8x128 divisibility rule; the kernel one-hot
        # accumulates into the resident buffer
        dq_out_specs = (dq_out_specs,
                        pl.BlockSpec((H, n_i), lambda h, i, j, *_: (0, 0),
                                     memory_space=pltpu.VMEM))
        dq_out_shape = (dq_out_shape,
                        jax.ShapeDtypeStruct((H, n_i), jnp.float32))
        dq_scratch.append(pltpu.VMEM((1, 1), jnp.float32))

    if compact:
        dq_mask_spec = pl.BlockSpec(
            (1, block_m, mw),
            lambda h, i, j, jl, jc, js, sc, sd: (js[i, j], 0, 0),
            memory_space=pltpu.VMEM)

        def _dq_kv(h, i, j, jl, jc, js, sc, sd):
            return (h, jl[i, j], 0)
        dq_prefetch = (jlist, jcount.astype(jnp.int32),
                       jslot.astype(jnp.int32))
    else:
        dq_mask_spec = pl.BlockSpec(
            (block_m, mw),
            lambda h, i, j, jl, jc, sc, sd: (i, jl[i, j]),
            memory_space=pltpu.VMEM)

        def _dq_kv(h, i, j, jl, jc, sc, sd):
            return (h, jl[i, j], 0)
        dq_prefetch = (jlist, jcount)

    dq_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=len(dq_prefetch) + 2,
        grid=(H, n_i, n_walk_j),
        in_specs=[
            pl.BlockSpec((1, block_m, Dp), lambda h, i, j, *_: (h, i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, block_n, Dp), _dq_kv,
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, block_n, Dp), _dq_kv,
                         memory_space=pltpu.VMEM),
            dq_mask_spec,
            pl.BlockSpec((1, block_m, Dp), lambda h, i, j, *_: (h, i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, block_m, 1), lambda h, i, j, *_: (h, i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, block_m, 1), lambda h, i, j, *_: (h, i, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=dq_out_specs,
        scratch_shapes=dq_scratch,
    )
    dq_res = _pcall(
        functools.partial(_flash_bwd_dq_kernel, metric=metric,
                          n_j=n_walk_j, true_d=D, bf16=bf16,
                          dropout_rate=dropout_rate, block_m=block_m,
                          block_n=block_n, need_dscale=need_dscale,
                          packed=packed, compact=compact),
        grid_spec=dq_spec,
        out_shape=dq_out_shape,
    )(*dq_prefetch, scale, seed, q, k, v, mask_op, do, lse_i, delta_i)
    if need_dscale:
        dq, dsc = dq_res
        dscale = jnp.sum(dsc, axis=1)          # [H]
    else:
        dq = dq_res
        dscale = None

    if compact:
        dkv_mask_spec = pl.BlockSpec(
            (1, block_m, mw),
            lambda h, j, i, il, ic, isl, sc, sd: (isl[j, i], 0, 0),
            memory_space=pltpu.VMEM)

        def _dkv_q(h, j, i, il, ic, isl, sc, sd):
            return (h, il[j, i], 0)
        dkv_prefetch = (ilist, icount.astype(jnp.int32),
                        islot.astype(jnp.int32))
    else:
        dkv_mask_spec = pl.BlockSpec(
            (block_m, mw),
            lambda h, j, i, il, ic, sc, sd: (il[j, i], j),
            memory_space=pltpu.VMEM)

        def _dkv_q(h, j, i, il, ic, sc, sd):
            return (h, il[j, i], 0)
        dkv_prefetch = (ilist, icount)

    dkv_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=len(dkv_prefetch) + 2,
        grid=(H, n_j, n_walk_i),
        in_specs=[
            pl.BlockSpec((1, block_m, Dp), _dkv_q,
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, block_n, Dp), lambda h, j, i, *_: (h, j, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, block_n, Dp), lambda h, j, i, *_: (h, j, 0),
                         memory_space=pltpu.VMEM),
            dkv_mask_spec,
            pl.BlockSpec((1, block_m, Dp), _dkv_q,
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, block_m, 1),
                         lambda h, j, i, *pf: (h, pf[0][j, i], 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, block_m, 1),
                         lambda h, j, i, *pf: (h, pf[0][j, i], 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=(
            pl.BlockSpec((1, block_n, Dp), lambda h, j, i, *_: (h, j, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, block_n, Dp), lambda h, j, i, *_: (h, j, 0),
                         memory_space=pltpu.VMEM),
        ),
        scratch_shapes=[pltpu.VMEM((block_n, Dp), jnp.float32),
                        pltpu.VMEM((block_n, Dp), jnp.float32)],
    )
    dk, dv = _pcall(
        functools.partial(_flash_bwd_dkv_kernel, metric=metric,
                          n_i=n_walk_i, true_d=D, bf16=bf16,
                          dropout_rate=dropout_rate, block_m=block_m,
                          block_n=block_n, packed=packed,
                          compact=compact),
        grid_spec=dkv_spec,
        out_shape=(jax.ShapeDtypeStruct((H, Np, Dp), k.dtype),
                   jax.ShapeDtypeStruct((H, Np, Dp), v.dtype)),
    )(*dkv_prefetch, scale, seed, q, k, v, mask_op, do, lse_i, delta_i)

    if need_dscale:
        return dq[:, :N, :D], dk[:, :N, :D], dv[:, :N, :Dv], dscale
    return dq[:, :N, :D], dk[:, :N, :D], dv[:, :N, :Dv]


# ---------------------------------------------------------------------------
# Edge-biased host orchestration
# ---------------------------------------------------------------------------

def _pad_all(q, k, v, mask, block_m, block_n, extra_mats=()):
    """Pad [H, N, D] operands + [N, N] mats to block multiples. Returns
    (q, k, v, mask, mats, Np, Dp)."""
    H, N, D = q.shape
    Dv = v.shape[-1]
    Np = _round_up(N, max(block_m, block_n))
    Dp = _round_up(max(D, Dv), 128)
    if Np != N or Dp != D or Dp != Dv:
        q = jnp.pad(q, ((0, 0), (0, Np - N), (0, Dp - D)))
        k = jnp.pad(k, ((0, 0), (0, Np - N), (0, Dp - D)))
        v = jnp.pad(v, ((0, 0), (0, Np - N), (0, Dp - Dv)))
        mask = jnp.pad(mask.astype(jnp.int8), ((0, Np - N), (0, Np - N)))
        extra_mats = tuple(
            jnp.pad(m.astype(jnp.float32), ((0, Np - N), (0, Np - N)))
            for m in extra_mats)
    else:
        extra_mats = tuple(m.astype(jnp.float32) for m in extra_mats)
    return q, k, v, mask.astype(jnp.int8), extra_mats, Np, Dp


def _flash_biased_forward(
    q, k, v, mask, bias,
    metric: str = "scaled_dot_product",
    scale_param: Optional[jax.Array] = None,
    block_m: int = 512, block_n: int = 1024, bf16: bool = False,
    plan=None, seeds: Optional[jax.Array] = None,
    dropout_rate: float = 0.0, return_lse: bool = False,
):
    """Two-walk biased forward. `bias` is the head-shared [N, N]
    pre-re-softmax additive bias (only positions under the mask are
    read). Returns out [H, N, Dv] (+ lse1, lse2 [H, N] residuals)."""
    if metric not in MXU_METRICS:
        raise NotImplementedError(metric)
    H, N, D = q.shape
    Dv = v.shape[-1]
    if metric in _COSINE:
        q = _l2_normalize(q)
        k = _l2_normalize(k)
    if scale_param is None:
        scale_param = jnp.ones((H,), jnp.float32)
    if seeds is None:
        seeds = jnp.zeros((2,), jnp.int32)
    seeds = jnp.asarray(seeds, jnp.int32).reshape((2,))
    q, k, v, mask, (bias,), Np, Dp = _pad_all(q, k, v, mask, block_m,
                                              block_n, extra_mats=(bias,))
    n_i, n_j = Np // block_m, Np // block_n
    if plan is None:
        plan = make_block_plan.__wrapped__(mask, block_m, block_n,
                                           n_pad=Np)
    jlist, jcount = plan
    n_walk = min(jlist.shape[1], n_j)
    jlist = jlist[:, :n_walk]
    jcount = jnp.minimum(jcount, n_walk).astype(jnp.int32)
    grid = (H, n_i, n_walk)
    scale32 = scale_param.astype(jnp.float32)

    def _b(shape, imap):
        return pl.BlockSpec(shape, imap, memory_space=pltpu.VMEM)

    packed = _mask_packable(Np, block_n)
    mask_op = _pack_mask(mask, block_n) if packed else mask
    mw = block_n // 8 if packed else block_n
    qspec = _b((1, block_m, Dp), lambda h, i, j, *_: (h, i, 0))
    kspec = _b((1, block_n, Dp),
               lambda h, i, j, jl, *_: (h, jl[i, j], 0))
    mspec = _b((block_m, mw), lambda h, i, j, jl, *_: (i, jl[i, j]))
    bspec = _b((block_m, block_n), lambda h, i, j, jl, *_: (i, jl[i, j]))
    rowspec = _b((1, block_m, 1), lambda h, i, j, *_: (h, i, 0))

    lse1 = _pcall(
        functools.partial(_lse1_kernel, metric=metric, n_j=n_walk,
                          true_d=D, bf16=bf16, packed=packed),
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=3, grid=grid,
            in_specs=[qspec, kspec, mspec],
            out_specs=rowspec,
            scratch_shapes=[pltpu.VMEM((block_m, 1), jnp.float32),
                            pltpu.VMEM((block_m, 1), jnp.float32)]),
        out_shape=jax.ShapeDtypeStruct((H, Np, 1), jnp.float32),
    )(jlist, jcount, scale32, q, k, mask_op)

    out, lse2 = _pcall(
        functools.partial(_flash_biased_kernel, metric=metric, n_j=n_walk,
                          true_d=D, bf16=bf16, dropout_rate=dropout_rate,
                          block_m=block_m, block_n=block_n,
                          packed=packed),
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=4, grid=grid,
            in_specs=[qspec, kspec, kspec, mspec, bspec, rowspec],
            out_specs=(qspec, rowspec),
            scratch_shapes=[pltpu.VMEM((block_m, Dp), jnp.float32),
                            pltpu.VMEM((block_m, 1), jnp.float32),
                            pltpu.VMEM((block_m, 1), jnp.float32)]),
        out_shape=(jax.ShapeDtypeStruct((H, Np, Dp), q.dtype),
                   jax.ShapeDtypeStruct((H, Np, 1), jnp.float32)),
        cost_estimate=pl.CostEstimate(
            flops=2 * 2 * H * Np * Np * Dp,
            bytes_accessed=4 * H * Np * Dp * 4 + 5 * Np * Np,
            transcendentals=2 * H * Np * Np),
    )(jlist, jcount, scale32, seeds, q, k, v, mask_op, bias, lse1)
    if return_lse:
        return out[:, :N, :Dv], lse1[:, :N, 0], lse2[:, :N, 0]
    return out[:, :N, :Dv]


def flash_biased_attention_bwd(
    q, k, v, bias, mask, out, lse1, lse2, do,
    metric: str = "scaled_dot_product",
    scale: Optional[jax.Array] = None,
    block_m: int = 512, block_n: int = 1024, bf16: bool = False,
    plan=None, plan_t=None, seeds: Optional[jax.Array] = None,
    dropout_rate: float = 0.0, need_dscale: bool = False,
):
    """Three-walk biased backward: (dq, dk, dv, dbias[, dscale]).
    `dbias` is dense [N, N]; blocks not covered by the sparsity plan are
    UNSPECIFIED — only read it at positions covered by real edges (the
    model gathers at edge coordinates, which lie in occupied blocks).
    For cosine metrics q/k must already be L2-normalized."""
    H, N, D = q.shape
    Dv = v.shape[-1]
    if scale is None:
        scale = jnp.ones((H,), jnp.float32)
    if seeds is None:
        seeds = jnp.zeros((2,), jnp.int32)
    seeds = jnp.asarray(seeds, jnp.int32).reshape((2,))
    q, k, v, mask, (bias,), Np, Dp = _pad_all(q, k, v, mask, block_m,
                                              block_n, extra_mats=(bias,))
    if do.shape[-2] != Np or do.shape[-1] != Dp:
        do = jnp.pad(do, ((0, 0), (0, Np - N), (0, Dp - Dv)))
        out = jnp.pad(out, ((0, 0), (0, Np - N), (0, Dp - Dv)))
        lse1 = jnp.pad(lse1, ((0, 0), (0, Np - N)),
                       constant_values=LSE_DEAD)
        lse2 = jnp.pad(lse2, ((0, 0), (0, Np - N)),
                       constant_values=LSE_DEAD)
    delta2 = jnp.sum(do * out, axis=-1)            # [H, Np]
    lse1_i = lse1[..., None]
    lse2_i = lse2[..., None]
    delta2_i = delta2[..., None]
    scale32 = scale.astype(jnp.float32)
    n_i, n_j = Np // block_m, Np // block_n
    if plan is None:
        plan = make_block_plan.__wrapped__(mask, block_m, block_n,
                                           n_pad=Np)
    if plan_t is None:
        plan_t = make_block_plan.__wrapped__(mask.T, block_n, block_m,
                                             n_pad=Np)
    jlist, jcount = plan
    ilist, icount = plan_t
    n_walk_j = min(jlist.shape[1], n_j)
    n_walk_i = min(ilist.shape[1], n_i)
    jcount = jnp.minimum(jcount, n_walk_j).astype(jnp.int32)
    icount = jnp.minimum(icount, n_walk_i).astype(jnp.int32)

    def _b(shape, imap):
        return pl.BlockSpec(shape, imap, memory_space=pltpu.VMEM)

    kw = dict(metric=metric, true_d=D, bf16=bf16,
              dropout_rate=dropout_rate, block_m=block_m, block_n=block_n)

    packed = _mask_packable(Np, block_n)
    mask_op = _pack_mask(mask, block_n) if packed else mask
    mw = block_n // 8 if packed else block_n
    kw["packed"] = packed

    # --- walk A: delta1 + dB (grid (n_i, n_walk_j, H), heads innermost)
    a_q = _b((1, block_m, Dp), lambda i, j, h, jl, *_: (h, i, 0))
    a_k = _b((1, block_n, Dp), lambda i, j, h, jl, *_: (h, jl[i, j], 0))
    a_mask = _b((block_m, mw), lambda i, j, h, jl, *_: (i, jl[i, j]))
    a_m = _b((block_m, block_n), lambda i, j, h, jl, *_: (i, jl[i, j]))
    a_row = _b((1, block_m, 1), lambda i, j, h, jl, *_: (h, i, 0))
    delta1, dbias = _pcall(
        functools.partial(_biased_bwd_pre_kernel, n_j=n_walk_j, n_h=H,
                          **kw),
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=4, grid=(n_i, n_walk_j, H),
            in_specs=[a_q, a_k, a_k, a_mask, a_m, a_q, a_row, a_row,
                      a_row],
            out_specs=(_b((block_m, H), lambda i, j, h, *_: (i, 0)),
                       a_m),
            scratch_shapes=[pltpu.VMEM((block_m, H), jnp.float32),
                            pltpu.VMEM((block_m, block_n), jnp.float32)]),
        out_shape=(jax.ShapeDtypeStruct((Np, H), jnp.float32),
                   jax.ShapeDtypeStruct((Np, Np), jnp.float32)),
    )(jlist, jcount, scale32, seeds, q, k, v, mask_op, bias, do,
      lse1_i, lse2_i, delta2_i)

    # --- walk B: dq (+ dscale) (grid (H, n_i, n_walk_j))
    b_q = _b((1, block_m, Dp), lambda h, i, j, *_: (h, i, 0))
    b_k = _b((1, block_n, Dp), lambda h, i, j, jl, *_: (h, jl[i, j], 0))
    b_mask = _b((block_m, mw), lambda h, i, j, jl, *_: (i, jl[i, j]))
    b_m = _b((block_m, block_n), lambda h, i, j, jl, *_: (i, jl[i, j]))
    b_row = _b((1, block_m, 1), lambda h, i, j, *_: (h, i, 0))
    b_d1 = _b((block_m, H), lambda h, i, j, *_: (i, 0))
    out_specs = b_q
    out_shape = jax.ShapeDtypeStruct((H, Np, Dp), q.dtype)
    scratch = [pltpu.VMEM((block_m, Dp), jnp.float32)]
    if need_dscale:
        # full-array block, one-hot accumulated in-kernel (TPU 8x128
        # block rule forbids (1, 1) blocks)
        out_specs = (out_specs,
                     _b((H, n_i), lambda h, i, j, *_: (0, 0)))
        out_shape = (out_shape, jax.ShapeDtypeStruct((H, n_i),
                                                     jnp.float32))
        scratch.append(pltpu.VMEM((1, 1), jnp.float32))
    dq_res = _pcall(
        functools.partial(_biased_bwd_dq_kernel, n_j=n_walk_j,
                          need_dscale=need_dscale, **kw),
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=4, grid=(H, n_i, n_walk_j),
            in_specs=[b_q, b_k, b_k, b_mask, b_m, b_q, b_row, b_row,
                      b_row, b_d1],
            out_specs=out_specs, scratch_shapes=scratch),
        out_shape=out_shape,
    )(jlist, jcount, scale32, seeds, q, k, v, mask_op, bias, do,
      lse1_i, lse2_i, delta2_i, delta1)
    if need_dscale:
        dq, dsc = dq_res
        dscale = jnp.sum(dsc, axis=1)
    else:
        dq = dq_res
        dscale = None

    # --- walk C: dk/dv (grid (H, n_j, n_walk_i), transposed plan)
    c_q = _b((1, block_m, Dp), lambda h, j, i, il, *_: (h, il[j, i], 0))
    c_kv = _b((1, block_n, Dp), lambda h, j, i, *_: (h, j, 0))
    c_mask = _b((block_m, mw), lambda h, j, i, il, *_: (il[j, i], j))
    c_m = _b((block_m, block_n), lambda h, j, i, il, *_: (il[j, i], j))
    c_row = _b((1, block_m, 1), lambda h, j, i, il, *_: (h, il[j, i], 0))
    c_d1 = _b((block_m, H), lambda h, j, i, il, *_: (il[j, i], 0))
    dk, dv = _pcall(
        functools.partial(_biased_bwd_dkv_kernel, n_i=n_walk_i, **kw),
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=4, grid=(H, n_j, n_walk_i),
            in_specs=[c_q, c_kv, c_kv, c_mask, c_m, c_q, c_row, c_row,
                      c_row, c_d1],
            out_specs=(c_kv, c_kv),
            scratch_shapes=[pltpu.VMEM((block_n, Dp), jnp.float32),
                            pltpu.VMEM((block_n, Dp), jnp.float32)]),
        out_shape=(jax.ShapeDtypeStruct((H, Np, Dp), k.dtype),
                   jax.ShapeDtypeStruct((H, Np, Dp), v.dtype)),
    )(ilist, icount, scale32, seeds, q, k, v, mask_op, bias, do,
      lse1_i, lse2_i, delta2_i, delta1)

    res = (dq[:, :N, :D], dk[:, :N, :D], dv[:, :N, :Dv],
           dbias[:N, :N])
    if need_dscale:
        return res + (dscale,)
    return res


@functools.partial(jax.custom_vjp, nondiff_argnums=(11, 12, 13, 14, 15))
def _flash_diff_biased(q, k, v, scale, bias, mask, jlist, jcount, ilist,
                       icount, seeds, metric, block_m, block_n, bf16,
                       dropout_rate):
    return _flash_biased_forward(q, k, v, mask, bias, metric=metric,
                                 scale_param=scale, block_m=block_m,
                                 block_n=block_n, bf16=bf16,
                                 plan=(jlist, jcount), seeds=seeds,
                                 dropout_rate=dropout_rate)


def _flash_diff_biased_fwd(q, k, v, scale, bias, mask, jlist, jcount,
                           ilist, icount, seeds, metric, block_m,
                           block_n, bf16, dropout_rate):
    out, lse1, lse2 = _flash_biased_forward(
        q, k, v, mask, bias, metric=metric, scale_param=scale,
        block_m=block_m, block_n=block_n, bf16=bf16,
        plan=(jlist, jcount), seeds=seeds, dropout_rate=dropout_rate,
        return_lse=True)
    return out, (q, k, v, scale, bias, mask, out, lse1, lse2, jlist,
                 jcount, ilist, icount, seeds)


def _flash_diff_biased_bwd(metric, block_m, block_n, bf16, dropout_rate,
                           res, g):
    (q, k, v, scale, bias, mask, out, lse1, lse2, jlist, jcount, ilist,
     icount, seeds) = res
    need_dscale = metric in SCALED_METRICS
    kw = dict(metric=metric, scale=scale, block_m=block_m,
              block_n=block_n, bf16=bf16, plan=(jlist, jcount),
              plan_t=(ilist, icount), seeds=seeds,
              dropout_rate=dropout_rate, need_dscale=need_dscale)
    if metric in _COSINE:
        qn, vjp_q = jax.vjp(_l2_normalize, q)
        kn, vjp_k = jax.vjp(_l2_normalize, k)
        grads = flash_biased_attention_bwd(qn, kn, v, bias, mask, out,
                                           lse1, lse2, g, **kw)
        dq, = vjp_q(grads[0])
        dk, = vjp_k(grads[1])
        grads = (dq, dk) + grads[2:]
    else:
        grads = flash_biased_attention_bwd(q, k, v, bias, mask, out,
                                           lse1, lse2, g, **kw)
    if need_dscale:
        dq, dk, dv, dbias, dscale = grads
        dscale = dscale.astype(scale.dtype)
    else:
        dq, dk, dv, dbias = grads
        dscale = jnp.zeros_like(scale)
    return (dq, dk, dv, dscale, dbias, None, None, None, None, None,
            None)


_flash_diff_biased.defvjp(_flash_diff_biased_fwd, _flash_diff_biased_bwd)
