"""Edge-biased hybrid (band + residual) attention — exact union double
softmax at >HBM scale.

The dense reference applies its geometric bias as a re-softmax over the
already-softmaxed weights (`/root/reference/src/tagan/layers/
geometric_attention.py:567-575`):

    w1 = softmax(mask(s));  [drop1];  w2 = softmax(mask(w1 + B));
    [drop2];  out = w2 @ v

The hybrid backend splits the edge set into a BAND part (compact
occupied-block masks through the flash kernels) and a RESIDUAL part
(padded-degree tables, `ops.sparse`) — but the two softmaxes normalize
over the UNION edge set, so the parts cannot be biased independently.
The decomposition used here exploits that every biased flash kernel
walk takes its row statistics (lse1, lse2, delta1, delta2) as INPUTS:

  forward
    1. lse1_band  — compact lse1 walk over the band blocks
    2. lse1_res   — padded-layout score logsumexp over residual slots
    3. lse1_U     = logaddexp union                 (the first softmax)
    4. band pass  — the biased main walk with lse1_U gives the band
                    PARTIAL of the second softmax: z = drop1(w1) + B,
                    (out_b, lse2_b) normalized within the band
    5. res pass   — the same z-partial on the padded tables
    6. merge      — `merge_attention_partials` (the flash-combine
                    identity applied to the SECOND softmax)

  backward (given only d(out); the lse outputs are internal)
    delta2        = sum(dout * out_U) per row       (union, from merge)
    walk A (band) — delta1_band + dB_band (compact slot layout)
    XLA (res)     — delta1_res + dB_res on the padded tables
    delta1_U      = delta1_band + delta1_res
    walks B/C     — dq/dk/dv band with UNION lse1/lse2/delta1/delta2:
                    the kernel math is unchanged — union statistics in,
                    union-exact gradients out
    XLA (res)     — dq/dk/dv residual via the query + transposed-key
                    walks (no scatter), same union statistics

Dropout: band keep masks are the kernels' coordinate-hash PRNG (two
seeds — between the softmaxes and on the final weights); residual keep
masks are explicit inverted-dropout factors drawn once in the query
layout and read from the key walk through ``inc_slot`` — band and
residual edge sets are disjoint, so the union drop pattern is exact.

Scale/metric conventions match `flash_geometric`: q/k arrive
L2-normalized for the cosine metrics and factor-space for mahalanobis
(the caller's chain rules run outside this custom_vjp); ``scale`` is
sigma (gaussian) / gamma (rbf) with in-walk d(scale) accumulation plus
the residual contribution. Residual scores use the SAME norm-expansion
formulas as the kernel blocks (`_scores_from`), so band and residual
agree bit-for-bit in convention.
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .flash_geometric import (LSE_DEAD, NEG_INF, SCALED_METRICS,
                              _biased_bwd_dkv_kernel,
                              _biased_bwd_dq_kernel,
                              _biased_bwd_pre_kernel, _clip_grad,
                              _dsq_from_ds, _flash_biased_kernel,
                              _lse1_kernel, _pcall, _round_up,
                              _SQ_METRICS, _COSINE, MXU_METRICS)

import math


# ---------------------------------------------------------------------------
# Padded-layout (residual) score helpers — kernel-convention numerics
# ---------------------------------------------------------------------------

def _pp_scores_aux(metric, a, b_e, scale, true_d):
    """Scores for padded edge slots, norm-expansion form (identical to
    the kernel's `_block_scores` chain). a [H, N, D] row operand,
    b_e [H, N, W, D] gathered neighbor operand. Returns (s, sq, qk)
    each [H, N, W]."""
    qk = jnp.sum(a[:, :, None, :] * b_e, axis=-1)
    sq = None
    if metric in _SQ_METRICS:
        an = jnp.sum(a * a, axis=-1)[:, :, None]
        bn = jnp.sum(b_e * b_e, axis=-1)
        sq = jnp.maximum(an + bn - 2.0 * qk, 0.0)
    sc = scale[:, None, None]
    if metric == "scaled_dot_product":
        s = qk / math.sqrt(true_d)
    elif metric == "dot_product":
        s = qk
    elif metric == "cosine_similarity":
        s = jnp.clip(qk, -1.0, 1.0)
    elif metric == "cosine_distance":
        s = jnp.clip(qk, -1.0, 1.0) - 1.0
    elif metric == "squared_euclidean":
        s = -sq
    elif metric == "euclidean":
        s = -jnp.sqrt(sq + 1e-8)
    elif metric == "gaussian_kernel":
        s = jnp.exp(-sq / (2.0 * sc * sc))
    elif metric == "rbf_kernel":
        s = jnp.exp(-sc * sq)
    else:
        raise NotImplementedError(metric)
    return s, sq, qk


def _pp_chain_drow(metric, ds, s, sq, qk, a, b_e, scale, true_d):
    """d(row operand a) from ds [H, N, W]: sum over the slot axis of
    each edge's score chain (the edgewise form of `_chain_dq`)."""
    sc = scale[:, None, None]
    if metric == "dot_product":
        return jnp.sum(ds[..., None] * b_e, axis=-2)
    if metric == "scaled_dot_product":
        return jnp.sum(ds[..., None] * b_e, axis=-2) / math.sqrt(true_d)
    if metric in _COSINE:
        return jnp.sum((ds * _clip_grad(qk))[..., None] * b_e, axis=-2)
    dsq = _dsq_from_ds(metric, ds, s, sq, sc)
    return jnp.sum((2.0 * dsq)[..., None]
                   * (a[:, :, None, :] - b_e), axis=-2)


def _pp_dscale(metric, ds, s, sq, scale):
    """Residual d(scale) contribution per head (same formulas as the
    in-kernel accumulation)."""
    if metric not in SCALED_METRICS:
        return jnp.zeros_like(scale)
    common = jnp.sum(ds * s * sq, axis=(1, 2))
    if metric == "gaussian_kernel":
        return common / (scale * scale * scale)
    return -common


def _lse_union(a, b):
    """Combine two logsumexps with the dead-row convention
    |lse| >= 1e29 (either sign) meaning 'no valid entries'."""
    a_ = jnp.where(jnp.abs(a) >= 1e29, NEG_INF, a)
    b_ = jnp.where(jnp.abs(b) >= 1e29, NEG_INF, b)
    m = jnp.maximum(a_, b_)
    dead = m <= NEG_INF * 0.5
    m_safe = jnp.where(dead, 0.0, m)
    s = jnp.exp(a_ - m_safe) + jnp.exp(b_ - m_safe)
    s = jnp.where(s == 0, 1.0, s)
    return jnp.where(dead, LSE_DEAD, m_safe + jnp.log(s))


def _row_safe(lse):
    """lse with dead markers replaced by 0 (safe to subtract inside an
    exp whose result is masked anyway)."""
    return jnp.where(jnp.abs(lse) >= 1e29, 0.0, lse)


# ---------------------------------------------------------------------------
# Band walks with compact blockspecs
# ---------------------------------------------------------------------------

def _b(shape, imap):
    return pl.BlockSpec(shape, imap, memory_space=pltpu.VMEM)


def _pad_ops(q, k, v, block_m, block_n):
    H, N, D = q.shape
    Dv = v.shape[-1]
    Np = _round_up(N, max(block_m, block_n))
    Dp = _round_up(max(D, Dv), 128)
    if Np != N or Dp != D or Dp != Dv:
        q = jnp.pad(q, ((0, 0), (0, Np - N), (0, Dp - D)))
        k = jnp.pad(k, ((0, 0), (0, Np - N), (0, Dp - D)))
        v = jnp.pad(v, ((0, 0), (0, Np - N), (0, Dp - Dv)))
    return q, k, v, Np, Dp


def _pad_rows(x, Np, fill=0.0):
    """[H, N] row statistic -> [H, Np, 1] kernel operand."""
    H, N = x.shape
    if Np != N:
        x = jnp.pad(x, ((0, 0), (0, Np - N)), constant_values=fill)
    return x[..., None]


def _band_lse1(q, k, mask_blocks, cplan, scale, *, metric, block_m,
               block_n, bf16):
    """Compact lse1 walk: [H, N] first-softmax logsumexp of the band
    scores (LSE_DEAD on rows with no band edge)."""
    H, N, D = q.shape
    q, k, _, Np, Dp = _pad_ops(q, k, q, block_m, block_n)
    jlist, jcount, jslot = cplan
    n_i = Np // block_m
    n_walk = jlist.shape[1]
    packed = mask_blocks.shape[-1] * 8 == block_n
    mw = mask_blocks.shape[-1]
    lse1 = _pcall(
        functools.partial(_lse1_kernel, metric=metric, n_j=n_walk,
                          true_d=D, bf16=bf16, packed=packed,
                          compact=True),
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=4, grid=(H, n_i, n_walk),
            in_specs=[
                _b((1, block_m, Dp), lambda h, i, j, *_: (h, i, 0)),
                _b((1, block_n, Dp),
                   lambda h, i, j, jl, jc, js, sc: (h, jl[i, j], 0)),
                _b((1, block_m, mw),
                   lambda h, i, j, jl, jc, js, sc: (js[i, j], 0, 0)),
            ],
            out_specs=_b((1, block_m, 1), lambda h, i, j, *_: (h, i, 0)),
            scratch_shapes=[pltpu.VMEM((block_m, 1), jnp.float32),
                            pltpu.VMEM((block_m, 1), jnp.float32)]),
        out_shape=jax.ShapeDtypeStruct((H, Np, 1), jnp.float32),
    )(jlist, jcount.astype(jnp.int32), jslot.astype(jnp.int32),
      scale.astype(jnp.float32), q, k, mask_blocks)
    return lse1[:, :N, 0]


def _band_biased_main(q, k, v, mask_blocks, bias_blocks, lse1_u, cplan,
                      scale, seeds, *, metric, block_m, block_n, bf16,
                      dropout_rate):
    """Compact biased main walk with an EXTERNAL (union) lse1: returns
    the band partial (out_b [H, N, Dv], lse2_b [H, N]) of the second
    softmax over z = drop1(exp(s - lse1_u)) + B."""
    H, N, D = q.shape
    Dv = v.shape[-1]
    q, k, v, Np, Dp = _pad_ops(q, k, v, block_m, block_n)
    jlist, jcount, jslot = cplan
    n_i = Np // block_m
    n_walk = jlist.shape[1]
    packed = mask_blocks.shape[-1] * 8 == block_n
    mw = mask_blocks.shape[-1]
    lse1_i = _pad_rows(lse1_u, Np, fill=LSE_DEAD)
    kv = _b((1, block_n, Dp),
            lambda h, i, j, jl, jc, js, sc, sd: (h, jl[i, j], 0))
    out, lse2 = _pcall(
        functools.partial(_flash_biased_kernel, metric=metric,
                          n_j=n_walk, true_d=D, bf16=bf16,
                          dropout_rate=dropout_rate, block_m=block_m,
                          block_n=block_n, packed=packed, compact=True),
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=5, grid=(H, n_i, n_walk),
            in_specs=[
                _b((1, block_m, Dp), lambda h, i, j, *_: (h, i, 0)),
                kv, kv,
                _b((1, block_m, mw),
                   lambda h, i, j, jl, jc, js, sc, sd: (js[i, j], 0, 0)),
                _b((1, block_m, block_n),
                   lambda h, i, j, jl, jc, js, sc, sd: (js[i, j], 0, 0)),
                _b((1, block_m, 1), lambda h, i, j, *_: (h, i, 0)),
            ],
            out_specs=(
                _b((1, block_m, Dp), lambda h, i, j, *_: (h, i, 0)),
                _b((1, block_m, 1), lambda h, i, j, *_: (h, i, 0)),
            ),
            scratch_shapes=[pltpu.VMEM((block_m, Dp), jnp.float32),
                            pltpu.VMEM((block_m, 1), jnp.float32),
                            pltpu.VMEM((block_m, 1), jnp.float32)]),
        out_shape=(jax.ShapeDtypeStruct((H, Np, Dp), q.dtype),
                   jax.ShapeDtypeStruct((H, Np, 1), jnp.float32)),
    )(jlist, jcount.astype(jnp.int32), jslot.astype(jnp.int32),
      scale.astype(jnp.float32), seeds, q, k, v, mask_blocks,
      bias_blocks, lse1_i)
    return out[:, :N, :Dv], lse2[:, :N, 0]


def _band_bwd_pre(q, k, v, mask_blocks, bias_blocks, do, lse1_u, lse2_u,
                  delta2, cplan, scale, seeds, *, metric, block_m,
                  block_n, bf16, dropout_rate):
    """Walk A (compact): returns (delta1_band [H, N],
    dbias_blocks [S+1, BM, BN]) — slot S is a trash slot absorbing the
    writes of empty/padded walk steps (their output DMA fires whether or
    not the kernel wrote the buffer)."""
    H, N, D = q.shape
    q, k, v, Np, Dp = _pad_ops(q, k, v, block_m, block_n)
    do = jnp.pad(do, ((0, 0), (0, Np - N), (0, Dp - do.shape[-1]))) \
        if (do.shape[-2] != Np or do.shape[-1] != Dp) else do
    jlist, jcount, jslot = cplan
    n_i = Np // block_m
    n_walk = jlist.shape[1]
    S = mask_blocks.shape[0]
    packed = mask_blocks.shape[-1] * 8 == block_n
    mw = mask_blocks.shape[-1]
    # padded / empty walk entries write the trash slot S
    live = jnp.arange(n_walk)[None, :] < jcount[:, None]
    js_db = jnp.where(live, jslot, S).astype(jnp.int32)
    lse1_i = _pad_rows(lse1_u, Np, fill=LSE_DEAD)
    lse2_i = _pad_rows(lse2_u, Np, fill=LSE_DEAD)
    delta2_i = _pad_rows(delta2, Np)
    a_q = _b((1, block_m, Dp), lambda i, j, h, *_: (h, i, 0))
    a_k = _b((1, block_n, Dp),
             lambda i, j, h, jl, jc, js, jd, sc, sd: (h, jl[i, j], 0))
    a_mask = _b((1, block_m, mw),
                lambda i, j, h, jl, jc, js, jd, sc, sd: (js[i, j], 0, 0))
    a_bias = _b((1, block_m, block_n),
                lambda i, j, h, jl, jc, js, jd, sc, sd: (js[i, j], 0, 0))
    a_row = _b((1, block_m, 1), lambda i, j, h, *_: (h, i, 0))
    delta1, dbias = _pcall(
        functools.partial(_biased_bwd_pre_kernel, metric=metric,
                          n_j=n_walk, n_h=H, true_d=D, bf16=bf16,
                          dropout_rate=dropout_rate, block_m=block_m,
                          block_n=block_n, packed=packed, compact=True),
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=6, grid=(n_i, n_walk, H),
            in_specs=[a_q, a_k, a_k, a_mask, a_bias, a_q, a_row, a_row,
                      a_row],
            out_specs=(
                _b((block_m, H), lambda i, j, h, *_: (i, 0)),
                _b((1, block_m, block_n),
                   lambda i, j, h, jl, jc, js, jd, sc, sd:
                   (jd[i, j], 0, 0)),
            ),
            scratch_shapes=[pltpu.VMEM((block_m, H), jnp.float32),
                            pltpu.VMEM((block_m, block_n),
                                       jnp.float32)]),
        out_shape=(jax.ShapeDtypeStruct((Np, H), jnp.float32),
                   jax.ShapeDtypeStruct((S + 1, block_m, block_n),
                                        jnp.float32)),
    )(jlist, jcount.astype(jnp.int32), jslot.astype(jnp.int32), js_db,
      scale.astype(jnp.float32), seeds, q, k, v, mask_blocks,
      bias_blocks, do, lse1_i, lse2_i, delta2_i)
    return delta1[:N].T, dbias


def _band_bwd_dq_dkv(q, k, v, mask_blocks, bias_blocks, do, lse1_u,
                     lse2_u, delta2, delta1_u, cplan, cplan_t, scale,
                     seeds, *, metric, block_m, block_n, bf16,
                     dropout_rate, need_dscale):
    """Walks B and C (compact) with UNION row statistics: returns
    (dq, dk, dv[, dscale]) — the band contributions."""
    H, N, D = q.shape
    Dv = v.shape[-1]
    q, k, v, Np, Dp = _pad_ops(q, k, v, block_m, block_n)
    do = jnp.pad(do, ((0, 0), (0, Np - N), (0, Dp - do.shape[-1]))) \
        if (do.shape[-2] != Np or do.shape[-1] != Dp) else do
    jlist, jcount, jslot = cplan
    ilist, icount, islot = cplan_t
    n_i = Np // block_m
    n_j = Np // block_n
    n_walk_j = jlist.shape[1]
    n_walk_i = ilist.shape[1]
    packed = mask_blocks.shape[-1] * 8 == block_n
    mw = mask_blocks.shape[-1]
    lse1_i = _pad_rows(lse1_u, Np, fill=LSE_DEAD)
    lse2_i = _pad_rows(lse2_u, Np, fill=LSE_DEAD)
    delta2_i = _pad_rows(delta2, Np)
    delta1_full = delta1_u.T                   # [N, H]
    if Np != N:
        delta1_full = jnp.pad(delta1_full, ((0, Np - N), (0, 0)))
    scale32 = scale.astype(jnp.float32)

    # --- walk B: dq (+ dscale), grid (H, n_i, n_walk_j)
    b_q = _b((1, block_m, Dp), lambda h, i, j, *_: (h, i, 0))
    b_k = _b((1, block_n, Dp),
             lambda h, i, j, jl, jc, js, sc, sd: (h, jl[i, j], 0))
    b_mask = _b((1, block_m, mw),
                lambda h, i, j, jl, jc, js, sc, sd: (js[i, j], 0, 0))
    b_bias = _b((1, block_m, block_n),
                lambda h, i, j, jl, jc, js, sc, sd: (js[i, j], 0, 0))
    b_row = _b((1, block_m, 1), lambda h, i, j, *_: (h, i, 0))
    b_d1 = _b((block_m, H), lambda h, i, j, *_: (i, 0))
    out_specs = b_q
    out_shape = jax.ShapeDtypeStruct((H, Np, Dp), q.dtype)
    scratch = [pltpu.VMEM((block_m, Dp), jnp.float32)]
    if need_dscale:
        out_specs = (out_specs,
                     _b((H, n_i), lambda h, i, j, *_: (0, 0)))
        out_shape = (out_shape,
                     jax.ShapeDtypeStruct((H, n_i), jnp.float32))
        scratch.append(pltpu.VMEM((1, 1), jnp.float32))
    dq_res = _pcall(
        functools.partial(_biased_bwd_dq_kernel, metric=metric,
                          n_j=n_walk_j, true_d=D, bf16=bf16,
                          dropout_rate=dropout_rate, block_m=block_m,
                          block_n=block_n, need_dscale=need_dscale,
                          packed=packed, compact=True),
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=5, grid=(H, n_i, n_walk_j),
            in_specs=[b_q, b_k, b_k, b_mask, b_bias, b_q, b_row, b_row,
                      b_row, b_d1],
            out_specs=out_specs, scratch_shapes=scratch),
        out_shape=out_shape,
    )(jlist, jcount.astype(jnp.int32), jslot.astype(jnp.int32),
      scale32, seeds, q, k, v, mask_blocks, bias_blocks, do,
      lse1_i, lse2_i, delta2_i, delta1_full)
    if need_dscale:
        dq, dsc = dq_res
        dscale = jnp.sum(dsc, axis=1)
    else:
        dq = dq_res
        dscale = None

    # --- walk C: dk/dv, grid (H, n_j, n_walk_i), transposed plan
    c_q = _b((1, block_m, Dp),
             lambda h, j, i, il, ic, isl, sc, sd: (h, il[j, i], 0))
    c_kv = _b((1, block_n, Dp), lambda h, j, i, *_: (h, j, 0))
    c_mask = _b((1, block_m, mw),
                lambda h, j, i, il, ic, isl, sc, sd: (isl[j, i], 0, 0))
    c_bias = _b((1, block_m, block_n),
                lambda h, j, i, il, ic, isl, sc, sd: (isl[j, i], 0, 0))
    c_row = _b((1, block_m, 1),
               lambda h, j, i, il, ic, isl, sc, sd: (h, il[j, i], 0))
    c_d1 = _b((block_m, H),
              lambda h, j, i, il, ic, isl, sc, sd: (il[j, i], 0))
    dk, dv = _pcall(
        functools.partial(_biased_bwd_dkv_kernel, metric=metric,
                          n_i=n_walk_i, true_d=D, bf16=bf16,
                          dropout_rate=dropout_rate, block_m=block_m,
                          block_n=block_n, packed=packed, compact=True),
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=5, grid=(H, n_j, n_walk_i),
            in_specs=[c_q, c_kv, c_kv, c_mask, c_bias, c_q, c_row,
                      c_row, c_row, c_d1],
            out_specs=(c_kv, c_kv),
            scratch_shapes=[pltpu.VMEM((block_n, Dp), jnp.float32),
                            pltpu.VMEM((block_n, Dp), jnp.float32)]),
        out_shape=(jax.ShapeDtypeStruct((H, Np, Dp), k.dtype),
                   jax.ShapeDtypeStruct((H, Np, Dp), v.dtype)),
    )(ilist, icount.astype(jnp.int32), islot.astype(jnp.int32),
      scale32, seeds, q, k, v, mask_blocks, bias_blocks, do,
      lse1_i, lse2_i, delta2_i, delta1_full)
    res = (dq[:, :N, :D], dk[:, :N, :D], dv[:, :N, :Dv])
    if need_dscale:
        return res + (dscale,)
    return res


# ---------------------------------------------------------------------------
# Residual (padded-layout) passes
# ---------------------------------------------------------------------------

def _res_lse1(metric, q, k, nbr, nval, scale, true_d):
    """First-softmax logsumexp over residual slots: [H, N] with
    LSE_DEAD on rows without residual edges."""
    from ..sparse import _pp_gather
    (k_e,) = _pp_gather([k], nbr)          # node-major fused gather
    s, _, _ = _pp_scores_aux(metric, q, k_e, scale, true_d)
    s = jnp.where(nval[None], s, NEG_INF)
    m = jnp.max(s, axis=-1)
    dead = m <= NEG_INF * 0.5
    m_safe = jnp.where(dead, 0.0, m)
    l = jnp.sum(jnp.exp(s - m_safe[..., None]) * nval[None], axis=-1)
    l = jnp.where(l == 0, 1.0, l)
    return jnp.where(dead, LSE_DEAD, m_safe + jnp.log(l))


def _res_biased_partial(metric, q, k, v, nbr, nval, bias_res, lse1_u,
                        kap1, kap2, scale, true_d):
    """Residual partial of the SECOND softmax given the union lse1:
    (out_r [H, N, Dv], lse2_r [H, N]). kap1/kap2 are inverted-dropout
    keep factors (None in eval — every keep multiply is skipped)."""
    from ..sparse import _pp_gather
    k_e, v_e = _pp_gather([k, v], nbr)     # ONE node-major gather
    s, _, _ = _pp_scores_aux(metric, q, k_e, scale, true_d)
    w1 = jnp.where(nval[None],
                   jnp.exp(s - _row_safe(lse1_u)[..., None]), 0.0)
    w1d = w1 if kap1 is None else w1 * kap1
    z = jnp.where(nval[None], w1d + bias_res[None], NEG_INF)
    m2 = jnp.max(z, axis=-1)
    dead = m2 <= NEG_INF * 0.5
    m2s = jnp.where(dead, 0.0, m2)
    e2 = jnp.exp(z - m2s[..., None]) * nval[None]
    l2 = jnp.sum(e2, axis=-1)
    l2s = jnp.where(l2 == 0, 1.0, l2)
    p2 = e2 / l2s[..., None]
    p2d = p2 if kap2 is None else p2 * kap2
    out = jnp.sum(p2d[..., None] * v_e, axis=-2)
    lse2 = jnp.where(dead, LSE_DEAD, m2s + jnp.log(l2s))
    return out, lse2


def _res_bwd_query(metric, q, k, v, g, nbr, nval, bias_res, lse1_u,
                   lse2_u, delta2, kap1, kap2, scale, true_d):
    """Residual backward, query layout: returns (dz [H, N, W] for dB,
    delta1_res [H, N], and a continuation closure that — given the
    union delta1 — yields (dq_r, dscale_r))."""
    from ..sparse import _pp_gather
    k_e, v_e = _pp_gather([k, v], nbr)     # ONE node-major gather
    s, sq, qk = _pp_scores_aux(metric, q, k_e, scale, true_d)
    w1 = jnp.where(nval[None],
                   jnp.exp(s - _row_safe(lse1_u)[..., None]), 0.0)
    z = (w1 if kap1 is None else w1 * kap1) + bias_res[None]
    w2 = jnp.where(nval[None],
                   jnp.exp(z - _row_safe(lse2_u)[..., None]), 0.0)
    dp2 = jnp.sum(g[:, :, None, :] * v_e, axis=-1)
    if kap2 is not None:
        dp2 = dp2 * kap2
    dz = w2 * (dp2 - delta2[..., None])
    dz = jnp.where(nval[None], dz, 0.0)
    dw1 = dz if kap1 is None else kap1 * dz
    delta1_res = jnp.sum(w1 * dw1, axis=-1)

    def finish(delta1_u):
        ds = w1 * (dw1 - delta1_u[..., None])
        ds = jnp.where(nval[None], ds, 0.0)
        dq_r = _pp_chain_drow(metric, ds, s, sq, qk, q, k_e, scale,
                              true_d)
        dsc = _pp_dscale(metric, ds, s, sq, scale)
        return dq_r, dsc

    return dz, delta1_res, finish


def _res_bwd_key(metric, q, k, v, g, inc, inc_slot, ival, bias_res,
                 lse1_u, lse2_u, delta2, kap1, kap2, delta1_u, scale,
                 true_d):
    """Residual backward, transposed key layout (no scatter): returns
    (dk_r, dv_r). Per-edge quantities (queries, output cotangents, the
    four row statistics) ride ONE fused node-major gather over `inc`;
    the SAME keep factors are read via inc_slot (dropout only)."""
    from ..sparse import _pp_gather
    q_e, g_i, stats_i = _pp_gather(
        [q, g, jnp.stack([_row_safe(lse1_u), _row_safe(lse2_u),
                          delta2, delta1_u], axis=-1)], inc)
    s_t, sq_t, qk_t = _pp_scores_aux(metric, k, q_e, scale, true_d)
    lse1_i = stats_i[..., 0]
    lse2_i = stats_i[..., 1]
    delta2_i = stats_i[..., 2]
    delta1_i = stats_i[..., 3]
    if kap1 is not None:
        H = q.shape[0]
        W = kap1.shape[-1]
        idx2 = (inc * W + inc_slot).reshape(-1)

        def _tk(kap):
            nm = jnp.moveaxis(kap, 0, -1).reshape(-1, H)
            return jnp.moveaxis(
                jnp.take(nm, idx2, axis=0).reshape(
                    inc.shape[0], inc.shape[1], H), 2, 0)
        kap1_t = _tk(kap1)
        kap2_t = _tk(kap2)
    else:
        kap1_t = kap2_t = None
    b_t = bias_res[inc, inc_slot][None]
    w1_t = jnp.where(ival[None], jnp.exp(s_t - lse1_i), 0.0)
    z_t = (w1_t if kap1_t is None else w1_t * kap1_t) + b_t
    w2_t = jnp.where(ival[None], jnp.exp(z_t - lse2_i), 0.0)
    dp2_t = jnp.sum(g_i * v[:, :, None, :], axis=-1)
    if kap2_t is not None:
        dp2_t = dp2_t * kap2_t
    dz_t = w2_t * (dp2_t - delta2_i)
    dz_t = jnp.where(ival[None], dz_t, 0.0)
    dw1_t = dz_t if kap1_t is None else kap1_t * dz_t
    ds_t = w1_t * (dw1_t - delta1_i)
    ds_t = jnp.where(ival[None], ds_t, 0.0)
    dk_r = _pp_chain_drow(metric, ds_t, s_t, sq_t, qk_t, k, q_e, scale,
                          true_d)
    w2d_t = w2_t if kap2_t is None else w2_t * kap2_t
    dv_r = jnp.sum(w2d_t[..., None] * g_i, axis=-2)
    return dk_r, dv_r


# ---------------------------------------------------------------------------
# The unified custom_vjp
# ---------------------------------------------------------------------------

@functools.partial(jax.custom_vjp, nondiff_argnums=(21, 22, 23, 24, 25))
def _hybrid_biased(q, k, v, scale, bias_blocks, bias_res, mask_blocks,
                   jlist, jcount, jslot, ilist, icount, islot, nbr,
                   nval, inc, inc_slot, ival, kap1, kap2, seeds,
                   metric, block_m, block_n, bf16, dropout_rate):
    out, _ = _hybrid_biased_fwd(q, k, v, scale, bias_blocks, bias_res,
                                mask_blocks, jlist, jcount, jslot,
                                ilist, icount, islot, nbr, nval, inc,
                                inc_slot, ival, kap1, kap2, seeds,
                                metric, block_m, block_n, bf16,
                                dropout_rate)
    return out


def _hybrid_biased_fwd(q, k, v, scale, bias_blocks, bias_res,
                       mask_blocks, jlist, jcount, jslot, ilist, icount,
                       islot, nbr, nval, inc, inc_slot, ival, kap1,
                       kap2, seeds, metric, block_m, block_n, bf16,
                       dropout_rate):
    from ..sparse import merge_attention_partials
    D = q.shape[-1]
    cplan = (jlist, jcount, jslot)
    lse1_b = _band_lse1(q, k, mask_blocks, cplan, scale, metric=metric,
                        block_m=block_m, block_n=block_n, bf16=bf16)
    lse1_r = _res_lse1(metric, q, k, nbr, nval, scale, D)
    lse1_u = _lse_union(lse1_b, lse1_r)
    band = _band_biased_main(q, k, v, mask_blocks, bias_blocks, lse1_u,
                             cplan, scale, seeds, metric=metric,
                             block_m=block_m, block_n=block_n,
                             bf16=bf16, dropout_rate=dropout_rate)
    res = _res_biased_partial(metric, q, k, v, nbr, nval, bias_res,
                              lse1_u, kap1, kap2, scale, D)
    out, lse2_u = merge_attention_partials([band, res])
    saved = (q, k, v, scale, bias_blocks, bias_res, mask_blocks, jlist,
             jcount, jslot, ilist, icount, islot, nbr, nval, inc,
             inc_slot, ival, kap1, kap2, seeds, lse1_u, lse2_u, out)
    return out, saved


def _hybrid_biased_bwd(metric, block_m, block_n, bf16, dropout_rate,
                       saved, g):
    (q, k, v, scale, bias_blocks, bias_res, mask_blocks, jlist, jcount,
     jslot, ilist, icount, islot, nbr, nval, inc, inc_slot, ival, kap1,
     kap2, seeds, lse1_u, lse2_u, out) = saved
    D = q.shape[-1]
    need_dscale = metric in SCALED_METRICS
    cplan = (jlist, jcount, jslot)
    cplan_t = (ilist, icount, islot)
    delta2 = jnp.sum(g * out, axis=-1)                     # [H, N]

    delta1_b, dbias_blocks = _band_bwd_pre(
        q, k, v, mask_blocks, bias_blocks, g, lse1_u, lse2_u, delta2,
        cplan, scale, seeds, metric=metric, block_m=block_m,
        block_n=block_n, bf16=bf16, dropout_rate=dropout_rate)
    dz_r, delta1_r, finish_q = _res_bwd_query(
        metric, q, k, v, g, nbr, nval, bias_res, lse1_u, lse2_u,
        delta2, kap1, kap2, scale, D)
    delta1_u = delta1_b + delta1_r

    band_grads = _band_bwd_dq_dkv(
        q, k, v, mask_blocks, bias_blocks, g, lse1_u, lse2_u, delta2,
        delta1_u, cplan, cplan_t, scale, seeds, metric=metric,
        block_m=block_m, block_n=block_n, bf16=bf16,
        dropout_rate=dropout_rate, need_dscale=need_dscale)
    if need_dscale:
        dq_b, dk_b, dv_b, dscale_b = band_grads
    else:
        dq_b, dk_b, dv_b = band_grads
        dscale_b = jnp.zeros_like(scale)

    dq_r, dscale_r = finish_q(delta1_u)
    dk_r, dv_r = _res_bwd_key(
        metric, q, k, v, g, inc, inc_slot, ival, bias_res, lse1_u,
        lse2_u, delta2, kap1, kap2, delta1_u, scale, D)

    # bias is head-shared: sum dz over heads. The trash slot (index S)
    # of the band dbias is dropped here.
    dbias_blocks = dbias_blocks[:mask_blocks.shape[0]]
    dbias_res = jnp.sum(jnp.where(nval[None], dz_r, 0.0), axis=0)

    dscale = (dscale_b + dscale_r).astype(scale.dtype) if need_dscale \
        else jnp.zeros_like(scale)
    return (dq_b + dq_r, dk_b + dk_r, dv_b + dv_r, dscale,
            dbias_blocks, dbias_res,
            None, None, None, None, None, None, None, None, None, None,
            None, None, None, None, None)


_hybrid_biased.defvjp(_hybrid_biased_fwd, _hybrid_biased_bwd)


# ---------------------------------------------------------------------------
# Self-contained biased band PARTIAL with an external first-softmax
# logsumexp (round 5, for the biased flash-local ring — VERDICT r4
# item 2). Math: z = drop1(exp(s - lse1_ext)) + B over the walked
# blocks; (out, lse2) = partial second softmax. Its vjp is closed over
# the partial alone:
#     delta2' = g.out - g_lse2          (the lse-cotangent fold)
#     dz      = w2 (dp2 - delta2')
#     ds      = w1 (kap1 dz)            (w1 is an exp, NOT a softmax ->
#                                        no delta1 row subtraction)
#     dlse1   = -sum_j w1 dw1           (walk A's delta1, negated)
# so union statistics assemble OUTSIDE via autodiff through the
# lse-union folds — compositionally identical to the monolithic
# custom_vjp above (the walks are reused verbatim with delta1 = 0).
# ---------------------------------------------------------------------------


@functools.lru_cache(maxsize=None)
def _make_flash_biased_partial(metric, block_m, block_n, bf16,
                               dropout_rate):
    @jax.custom_vjp
    def f(q, k, v, scale, bias_blocks, lse1_ext, mask_blocks, jlist,
          jcount, jslot, ilist, icount, islot, seeds):
        out, _ = f_fwd(q, k, v, scale, bias_blocks, lse1_ext,
                       mask_blocks, jlist, jcount, jslot, ilist,
                       icount, islot, seeds)
        return out

    def f_fwd(q, k, v, scale, bias_blocks, lse1_ext, mask_blocks,
              jlist, jcount, jslot, ilist, icount, islot, seeds):
        cplan = (jlist, jcount, jslot)
        out, lse2 = _band_biased_main(
            q, k, v, mask_blocks, bias_blocks, lse1_ext, cplan, scale,
            seeds, metric=metric, block_m=block_m, block_n=block_n,
            bf16=bf16, dropout_rate=dropout_rate)
        saved = (q, k, v, scale, bias_blocks, lse1_ext, mask_blocks,
                 jlist, jcount, jslot, ilist, icount, islot, seeds,
                 out, lse2)
        return (out, lse2), saved

    def f_bwd(saved, ct):
        (q, k, v, scale, bias_blocks, lse1_ext, mask_blocks, jlist,
         jcount, jslot, ilist, icount, islot, seeds, out, lse2) = saved
        g, g_lse2 = ct
        H, N, _ = q.shape
        need_dscale = metric in SCALED_METRICS
        cplan = (jlist, jcount, jslot)
        cplan_t = (ilist, icount, islot)
        g_lse2 = jnp.where(jnp.abs(lse2) >= 1e29, 0.0, g_lse2)
        delta2p = jnp.sum(g * out, axis=-1) - g_lse2
        delta1, dbias = _band_bwd_pre(
            q, k, v, mask_blocks, bias_blocks, g, lse1_ext, lse2,
            delta2p, cplan, scale, seeds, metric=metric,
            block_m=block_m, block_n=block_n, bf16=bf16,
            dropout_rate=dropout_rate)
        zeros_d1 = jnp.zeros((H, N), jnp.float32)
        grads = _band_bwd_dq_dkv(
            q, k, v, mask_blocks, bias_blocks, g, lse1_ext, lse2,
            delta2p, zeros_d1, cplan, cplan_t, scale, seeds,
            metric=metric, block_m=block_m, block_n=block_n, bf16=bf16,
            dropout_rate=dropout_rate, need_dscale=need_dscale)
        if need_dscale:
            dq, dk, dv, dscale = grads
            dscale = dscale.astype(scale.dtype)
        else:
            dq, dk, dv = grads
            dscale = jnp.zeros_like(scale)
        dbias = dbias[:mask_blocks.shape[0]]
        return (dq, dk, dv, dscale, dbias, -delta1, None, None, None,
                None, None, None, None, None)

    f.defvjp(f_fwd, f_bwd)
    return f


def flash_biased_partial_lse(
    q: jax.Array, k: jax.Array, v: jax.Array,          # [H, N, D]
    mask_blocks: jax.Array,                            # i8[S, BM, mw]
    cplan, cplan_t,                                    # 3-tuples
    bias_blocks: jax.Array,                            # f32[S, BM, BN]
    lse1_ext: jax.Array,                               # f32[H, N]
    metric: str = "scaled_dot_product",
    scale_param: Optional[jax.Array] = None,
    block_m: int = 512, block_n: int = 1024, bf16: bool = False,
    dropout_rate: float = 0.0,
    dropout_seeds: Optional[jax.Array] = None,         # i32[2]
):
    """Differentiable biased band partial given an EXTERNAL (union)
    first-softmax logsumexp: returns ``(out, lse2)`` of the second
    softmax restricted to the walked blocks. Merging with other
    partials over lse2 (`ops.sparse.merge_attention_partials`) and
    folding lse1 partials via logaddexp reproduces the biased union
    double softmax EXACTLY — including gradients, which flow through
    ``lse1_ext``'s cotangent (see the section comment). Pass q/k
    L2-normalized for cosine metrics / factor-space for mahalanobis."""
    if metric not in MXU_METRICS:
        raise NotImplementedError(metric)
    H = q.shape[0]
    if scale_param is None:
        scale_param = jnp.ones((H,), jnp.float32)
    if dropout_rate > 0.0 and dropout_seeds is None:
        raise ValueError("dropout_rate > 0 needs dropout_seeds")
    if dropout_rate > 0.0:
        seeds = jnp.asarray(dropout_seeds, jnp.int32).reshape((-1,))
        if seeds.shape[0] < 2:
            seeds = jnp.concatenate(
                [seeds, seeds ^ jnp.asarray([0x5BD1E995], jnp.int32)])
        seeds = seeds[:2]
    else:
        seeds = jnp.zeros((2,), jnp.int32)
    fn = _make_flash_biased_partial(metric, block_m, block_n, bf16,
                                    dropout_rate)
    return fn(q, k, v, scale_param, bias_blocks, lse1_ext, mask_blocks,
              *cplan, *cplan_t, seeds)


# ---------------------------------------------------------------------------
# Compact degree-bucketed residual (round 5): the biased residual on the
# layout that took the unbiased 131K step 1039.9 -> 738 ms — gather work
# ~1.5x the edge count instead of N*dmax (VERDICT r4 item 1). Buckets
# (`core.graph.compact_padded_residual(edge_ids=...)`) partition the
# query set; per-bucket partials scatter node-major into full-[N] union
# arrays, so the band/residual union statistics flow exactly as in the
# padded path above.
# ---------------------------------------------------------------------------


def _gather_rows(ops, rows, n_lim):
    """Fused node-major row gather: ops [H, n_lim, Dx], rows i32[R]
    (sentinel rows >= n_lim clamp; callers mask their contributions).
    Returns list of [H, R, Dx]."""
    from ..sparse import _pp_gather
    outs = _pp_gather(ops, jnp.minimum(rows, n_lim - 1)[:, None])
    return [o[:, :, 0] for o in outs]


def _res_c_operands(metric, q, k, v, bkt, scale, true_d, need_aux):
    """Per-bucket operand gathers + scores: returns
    (q_c, k_c, v_c, k_e, v_e, s, sq, qk) with s UNMASKED (callers
    apply nval)."""
    N = q.shape[1]
    qid, nbr, nval, kid = bkt[0], bkt[1], bkt[2], bkt[3]
    (q_c,) = _gather_rows([q], qid, N)
    k_c, v_c = _gather_rows([k, v], kid, N)        # ONE fused gather
    from ..sparse import _pp_gather
    k_e, v_e = _pp_gather([k_c, v_c], nbr)         # ONE slots gather
    s, sq, qk = _pp_scores_aux(metric, q_c, k_e, scale, true_d)
    if not need_aux:
        sq = qk = None
    return q_c, k_c, v_c, k_e, v_e, s, sq, qk


def _res_c_lse1(metric, q, k, v, buckets, scale, true_d):
    """Compact first-softmax logsumexp union over all buckets:
    ([H, N] with LSE_DEAD off-residual, per-bucket cache for the
    partial pass)."""
    H, N, _ = q.shape
    acc = jnp.full((N, H), LSE_DEAD, jnp.float32)
    cache = []
    for bkt in buckets:
        qid, nval = bkt[0], bkt[2]
        _, _, _, _, v_e, s, _, _ = _res_c_operands(
            metric, q, k, v, bkt, scale, true_d, need_aux=False)
        sm = jnp.where(nval[None], s, NEG_INF)
        m = jnp.max(sm, axis=-1)
        dead = m <= NEG_INF * 0.5
        m_safe = jnp.where(dead, 0.0, m)
        l = jnp.sum(jnp.exp(sm - m_safe[..., None]) * nval[None],
                    axis=-1)
        l = jnp.where(l == 0, 1.0, l)
        lse_c = jnp.where(dead, LSE_DEAD, m_safe + jnp.log(l))
        acc = acc.at[qid].set(lse_c.T, mode="drop")
        cache.append((s, v_e))
    return acc.T, cache


def _res_c_partial(metric, buckets, biases, kaps, cache, lse1_u, N, Dv):
    """Residual partial of the SECOND softmax on the compact buckets
    (out [H, N, Dv], lse2 [H, N]) given the union lse1; reuses the lse1
    pass's (s, v_e) cache."""
    H = lse1_u.shape[0]
    acc = jnp.concatenate(
        [jnp.zeros((N, H * Dv), jnp.float32),
         jnp.full((N, H), LSE_DEAD, jnp.float32)], axis=-1)
    for bkt, bias_c, (kap1, kap2), (s, v_e) in zip(buckets, biases,
                                                   kaps, cache):
        qid, nval = bkt[0], bkt[2]
        (lse1_c,) = _gather_rows([lse1_u[..., None]], qid, N)
        lse1_c = lse1_c[..., 0]                       # [H, Na]
        w1 = jnp.where(nval[None],
                       jnp.exp(s - _row_safe(lse1_c)[..., None]), 0.0)
        w1d = w1 if kap1 is None else w1 * kap1
        z = jnp.where(nval[None], w1d + bias_c[None], NEG_INF)
        m2 = jnp.max(z, axis=-1)
        dead = m2 <= NEG_INF * 0.5
        m2s = jnp.where(dead, 0.0, m2)
        e2 = jnp.exp(z - m2s[..., None]) * nval[None]
        l2 = jnp.sum(e2, axis=-1)
        l2s = jnp.where(l2 == 0, 1.0, l2)
        p2 = e2 / l2s[..., None]
        p2d = p2 if kap2 is None else p2 * kap2
        out_c = jnp.sum(p2d[..., None] * v_e, axis=-2)  # [H, Na, Dv]
        lse2_c = jnp.where(dead, LSE_DEAD, m2s + jnp.log(l2s))
        val = jnp.concatenate(
            [jnp.moveaxis(out_c, 0, 1).reshape(qid.shape[0], H * Dv),
             lse2_c.T], axis=-1)
        acc = acc.at[qid].set(val, mode="drop")
    out = jnp.moveaxis(acc[:, :H * Dv].reshape(N, H, Dv), 1, 0)
    lse2 = acc[:, H * Dv:].T
    return out, lse2


@functools.lru_cache(maxsize=None)
def _make_hybrid_biased_compact(metric, block_m, block_n, bf16,
                                dropout_rate, n_buckets):
    """custom_vjp factory for the compact-residual biased hybrid (one
    cached instance per static config so jit retracing hits the
    compile cache). Flat arg layout:
        q, k, v, scale, bias_blocks, mask_blocks,
        jlist, jcount, jslot, ilist, icount, islot, seeds,
        then per bucket: qid, nbr, nval, kid, inc, inc_slot, ival,
        bias_c [, kap1, kap2]."""
    train = dropout_rate > 0.0
    nbf = 10 if train else 8

    def unpack(args):
        head = args[:13]
        rest = args[13:]
        raw = [tuple(rest[i * nbf:(i + 1) * nbf])
               for i in range(n_buckets)]
        buckets = [r[:7] for r in raw]
        biases = [r[7] for r in raw]
        kaps = [(r[8], r[9]) if train else (None, None) for r in raw]
        return head, buckets, biases, kaps

    def fwd_impl(args):
        from jax.ad_checkpoint import checkpoint_name
        from ..sparse import merge_attention_partials
        (q, k, v, scale, bias_blocks, mask_blocks, jlist, jcount,
         jslot, ilist, icount, islot, seeds), buckets, biases, kaps = \
            unpack(args)
        D = q.shape[-1]
        Dv = v.shape[-1]
        N = q.shape[1]
        cplan = (jlist, jcount, jslot)
        lse1_b = _band_lse1(q, k, mask_blocks, cplan, scale,
                            metric=metric, block_m=block_m,
                            block_n=block_n, bf16=bf16)
        lse1_r, cache = _res_c_lse1(metric, q, k, v, buckets, scale, D)
        lse1_u = _lse_union(lse1_b, lse1_r)
        band = _band_biased_main(q, k, v, mask_blocks, bias_blocks,
                                 lse1_u, cplan, scale, seeds,
                                 metric=metric, block_m=block_m,
                                 block_n=block_n, bf16=bf16,
                                 dropout_rate=dropout_rate)
        res = _res_c_partial(metric, buckets, biases, kaps, cache,
                             lse1_u, N, Dv)
        out, lse2_u = merge_attention_partials([band, res])
        # name the custom_vjp residuals: under jax.checkpoint with
        # save_only_these_names('hyb_bias_res', ...) the backward then
        # reads them directly instead of re-running the forward walks
        # (~100 MB/pass at 131K — the cheap-to-save / expensive-to-
        # recompute split)
        lse1_u = checkpoint_name(lse1_u, "hyb_bias_res")
        lse2_u = checkpoint_name(lse2_u, "hyb_bias_res")
        out = checkpoint_name(out, "hyb_bias_res")
        return out, (args, lse1_u, lse2_u, out)

    @jax.custom_vjp
    def f(*args):
        out, _ = fwd_impl(args)
        return out

    def f_fwd(*args):
        return fwd_impl(args)

    def f_bwd(saved, g):
        args, lse1_u, lse2_u, out = saved
        (q, k, v, scale, bias_blocks, mask_blocks, jlist, jcount,
         jslot, ilist, icount, islot, seeds), buckets, biases, kaps = \
            unpack(args)
        D = q.shape[-1]
        H, N, _ = q.shape
        need_dscale = metric in SCALED_METRICS
        cplan = (jlist, jcount, jslot)
        cplan_t = (ilist, icount, islot)
        delta2 = jnp.sum(g * out, axis=-1)              # [H, N]

        delta1_b, dbias_blocks = _band_bwd_pre(
            q, k, v, mask_blocks, bias_blocks, g, lse1_u, lse2_u,
            delta2, cplan, scale, seeds, metric=metric,
            block_m=block_m, block_n=block_n, bf16=bf16,
            dropout_rate=dropout_rate)

        # residual query walk per bucket: dz (-> dbias), delta1_res
        d1_acc = jnp.zeros((N, H), jnp.float32)
        bcache = []
        for bkt, bias_c, (kap1, kap2) in zip(buckets, biases, kaps):
            qid, nval = bkt[0], bkt[2]
            q_c, k_c, v_c, k_e, v_e, s, sq, qk = _res_c_operands(
                metric, q, k, v, bkt, scale, D, need_aux=True)
            g_c, st_c = _gather_rows(
                [g, jnp.stack([_row_safe(lse1_u), _row_safe(lse2_u),
                               delta2], axis=-1)], qid, N)
            lse1_c, lse2_c, delta2_c = (st_c[..., 0], st_c[..., 1],
                                        st_c[..., 2])
            w1 = jnp.where(nval[None],
                           jnp.exp(s - lse1_c[..., None]), 0.0)
            z = (w1 if kap1 is None else w1 * kap1) + bias_c[None]
            w2 = jnp.where(nval[None],
                           jnp.exp(z - lse2_c[..., None]), 0.0)
            dp2 = jnp.sum(g_c[:, :, None, :] * v_e, axis=-1)
            if kap2 is not None:
                dp2 = dp2 * kap2
            dz = w2 * (dp2 - delta2_c[..., None])
            dz = jnp.where(nval[None], dz, 0.0)
            dw1 = dz if kap1 is None else kap1 * dz
            delta1_c = jnp.sum(w1 * dw1, axis=-1)       # [H, Na]
            d1_acc = d1_acc.at[qid].add(delta1_c.T, mode="drop")
            bcache.append((q_c, k_c, v_c, k_e, s, sq, qk, w1, dw1, dz,
                           g_c, st_c))
        delta1_u = delta1_b + d1_acc.T

        band_grads = _band_bwd_dq_dkv(
            q, k, v, mask_blocks, bias_blocks, g, lse1_u, lse2_u,
            delta2, delta1_u, cplan, cplan_t, scale, seeds,
            metric=metric, block_m=block_m, block_n=block_n, bf16=bf16,
            dropout_rate=dropout_rate, need_dscale=need_dscale)
        if need_dscale:
            dq_b, dk_b, dv_b, dscale = band_grads
        else:
            dq_b, dk_b, dv_b = band_grads
            dscale = jnp.zeros_like(scale)

        # finish per bucket: dq (query rows) + dk/dv (key rows) + dbias
        Dv = v.shape[-1]
        dq_acc = jnp.zeros((N, H * D), jnp.float32)
        dkv_acc = jnp.zeros((N, H * (D + Dv)), jnp.float32)
        dbiases = []
        for bkt, bias_c, (kap1, kap2), cch in zip(buckets, biases, kaps,
                                                  bcache):
            qid, nbr, nval, kid, inc, inc_slot, ival = bkt
            q_c, k_c, v_c, k_e, s, sq, qk, w1, dw1, dz, g_c, st_c = cch
            (d1_c,) = _gather_rows([delta1_u[..., None]], qid, N)
            d1_c = d1_c[..., 0]
            ds = w1 * (dw1 - d1_c[..., None])
            ds = jnp.where(nval[None], ds, 0.0)
            dq_c = _pp_chain_drow(metric, ds, s, sq, qk, q_c, k_e,
                                  scale, D)
            if need_dscale:
                dscale = dscale + _pp_dscale(metric, ds, s, sq, scale)
            dq_acc = dq_acc.at[qid].add(
                jnp.moveaxis(dq_c, 0, 1).reshape(qid.shape[0], H * D),
                mode="drop")
            dbiases.append(jnp.sum(jnp.where(nval[None], dz, 0.0),
                                   axis=0))

            # transposed key walk on the bucket's compact rows: the
            # per-edge operands (queries, output cotangents, row stats —
            # all cached from the query walk) ride ONE fused gather
            # over `inc`
            from ..sparse import _pp_gather
            q_e, g_i, st_i = _pp_gather(
                [q_c, g_c, jnp.concatenate(
                    [st_c, d1_c[..., None]], axis=-1)], inc)
            s_t, sq_t, qk_t = _pp_scores_aux(metric, k_c, q_e, scale, D)
            lse1_i, lse2_i, delta2_i, delta1_i = (
                st_i[..., 0], st_i[..., 1], st_i[..., 2], st_i[..., 3])
            if kap1 is not None:
                W = kap1.shape[-1]
                idx2 = (inc * W + inc_slot).reshape(-1)

                def _tk(kap):
                    nm = jnp.moveaxis(kap, 0, -1).reshape(-1, H)
                    return jnp.moveaxis(
                        jnp.take(nm, idx2, axis=0).reshape(
                            inc.shape[0], inc.shape[1], H), 2, 0)
                kap1_t = _tk(kap1)
                kap2_t = _tk(kap2)
            else:
                kap1_t = kap2_t = None
            b_t = bias_c[inc, inc_slot][None]
            w1_t = jnp.where(ival[None], jnp.exp(s_t - lse1_i), 0.0)
            z_t = (w1_t if kap1_t is None else w1_t * kap1_t) + b_t
            w2_t = jnp.where(ival[None], jnp.exp(z_t - lse2_i), 0.0)
            dp2_t = jnp.sum(g_i * v_c[:, :, None, :], axis=-1)
            if kap2_t is not None:
                dp2_t = dp2_t * kap2_t
            dz_t = w2_t * (dp2_t - delta2_i)
            dz_t = jnp.where(ival[None], dz_t, 0.0)
            dw1_t = dz_t if kap1_t is None else kap1_t * dz_t
            ds_t = w1_t * (dw1_t - delta1_i)
            ds_t = jnp.where(ival[None], ds_t, 0.0)
            dk_c = _pp_chain_drow(metric, ds_t, s_t, sq_t, qk_t, k_c,
                                  q_e, scale, D)
            w2d_t = w2_t if kap2_t is None else w2_t * kap2_t
            dv_c = jnp.sum(w2d_t[..., None] * g_i, axis=-2)
            dkv_acc = dkv_acc.at[kid].add(
                jnp.concatenate(
                    [jnp.moveaxis(dk_c, 0, 1).reshape(
                        kid.shape[0], H * D),
                     jnp.moveaxis(dv_c, 0, 1).reshape(
                         kid.shape[0], H * Dv)], axis=-1),
                mode="drop")

        dq_r = jnp.moveaxis(dq_acc.reshape(N, H, D), 1, 0)
        dk_r = jnp.moveaxis(dkv_acc[:, :H * D].reshape(N, H, D), 1, 0)
        dv_r = jnp.moveaxis(dkv_acc[:, H * D:].reshape(N, H, Dv), 1, 0)

        dbias_blocks = dbias_blocks[:mask_blocks.shape[0]]
        dscale_out = dscale.astype(scale.dtype) if need_dscale \
            else jnp.zeros_like(scale)
        grads = [dq_b + dq_r, dk_b + dk_r, dv_b + dv_r, dscale_out,
                 dbias_blocks] + [None] * 8
        for db in dbiases:
            grads += [None] * 7 + [db] + ([None, None] if train else [])
        return tuple(grads)

    f.defvjp(f_fwd, f_bwd)
    return f


def hybrid_biased_attention_compact(
    q: jax.Array, k: jax.Array, v: jax.Array,          # [H, N, D]
    mask_blocks: jax.Array,                            # i8[S, BM, mw]
    cplan, cplan_t,                                    # 3-tuples
    buckets,            # per-bucket 7-tuples (compact_padded_residual)
    bias_blocks: jax.Array,                            # f32[S, BM, BN]
    bias_compact,                # list of f32[Na_b, cap_b] per bucket
    metric: str = "scaled_dot_product",
    scale_param: Optional[jax.Array] = None,
    block_m: int = 512, block_n: int = 1024, bf16: bool = False,
    dropout_rate: float = 0.0,
    dropout_seeds: Optional[jax.Array] = None,         # i32[2] band
    dropout_rng: Optional[jax.Array] = None,           # residual keys
) -> jax.Array:
    """`hybrid_biased_attention` with the residual on the degree-
    bucketed COMPACT tables (round 5, VERDICT r4 item 1): same
    union-exact double softmax, but residual gather work ~1.5x the
    edge count instead of N*dmax. ``bias_compact`` carries the
    per-bucket bias values in the compact slot layout (gathered by the
    caller through `SnapshotSequence.hyb_res_cbid` provenance)."""
    if metric not in MXU_METRICS:
        raise NotImplementedError(metric)
    H, N, _ = q.shape
    if scale_param is None:
        scale_param = jnp.ones((H,), jnp.float32)
    if dropout_rate > 0.0 and (dropout_seeds is None
                               or dropout_rng is None):
        raise ValueError("dropout_rate > 0 needs dropout_seeds (band) "
                         "and dropout_rng (residual)")
    train = dropout_rate > 0.0
    if train:
        seeds = jnp.asarray(dropout_seeds, jnp.int32).reshape((-1,))
        if seeds.shape[0] < 2:
            seeds = jnp.concatenate(
                [seeds, seeds ^ jnp.asarray([0x5BD1E995], jnp.int32)])
        seeds = seeds[:2]
        keep_p = 1.0 - dropout_rate
    else:
        seeds = jnp.zeros((2,), jnp.int32)
    args = [q, k, v, scale_param, bias_blocks, mask_blocks,
            *cplan, *cplan_t, seeds]
    for b, (bkt, bias_c) in enumerate(zip(buckets, bias_compact)):
        args += list(bkt[:7]) + [bias_c]
        if train:
            r1, r2 = jax.random.split(jax.random.fold_in(dropout_rng, b))
            shp = (H,) + tuple(bkt[1].shape)
            args.append(jnp.where(jax.random.bernoulli(r1, keep_p, shp),
                                  1.0 / keep_p, 0.0))
            args.append(jnp.where(jax.random.bernoulli(r2, keep_p, shp),
                                  1.0 / keep_p, 0.0))
    fn = _make_hybrid_biased_compact(metric, block_m, block_n, bf16,
                                     dropout_rate, len(buckets))
    return fn(*args)


def hybrid_biased_attention(
    q: jax.Array, k: jax.Array, v: jax.Array,          # [H, N, D]
    mask_blocks: jax.Array,                            # i8[S, BM, mw]
    cplan, cplan_t,                                    # 3-tuples
    res_pad,                          # (nbr, nval, inc, inc_slot, ival)
    bias_blocks: jax.Array,                            # f32[S, BM, BN]
    bias_res: jax.Array,                               # f32[N, dmax]
    metric: str = "scaled_dot_product",
    scale_param: Optional[jax.Array] = None,
    block_m: int = 512, block_n: int = 1024, bf16: bool = False,
    dropout_rate: float = 0.0,
    dropout_seeds: Optional[jax.Array] = None,         # i32[2] band
    dropout_rng: Optional[jax.Array] = None,           # residual keys
) -> jax.Array:
    """Edge-biased hybrid attention (band + residual, union-exact double
    softmax — module docstring). Returns [H, N, Dv] context; rows with
    no edge anywhere come back zero.

    ``bias_blocks`` carries the band edges' head-shared bias values in
    the SAME compact slot layout as ``mask_blocks`` (zero at non-edge
    positions — self loops carry zero bias like the dense diagonal);
    ``bias_res`` the residual values in the padded query layout.
    For the cosine metrics pass q/k L2-normalized (callers run the
    normalization outside so autodiff pulls the chain back); for
    mahalanobis pass factor-space q/k with metric='euclidean'."""
    if metric not in MXU_METRICS:
        raise NotImplementedError(metric)
    H, N, _ = q.shape
    if scale_param is None:
        scale_param = jnp.ones((H,), jnp.float32)
    if dropout_rate > 0.0 and (dropout_seeds is None
                               or dropout_rng is None):
        raise ValueError("dropout_rate > 0 needs dropout_seeds (band) "
                         "and dropout_rng (residual)")
    nbr, nval, inc, inc_slot, ival = res_pad
    if dropout_rate > 0.0:
        seeds = jnp.asarray(dropout_seeds, jnp.int32).reshape((-1,))
        if seeds.shape[0] < 2:
            seeds = jnp.concatenate(
                [seeds, seeds ^ jnp.asarray([0x5BD1E995], jnp.int32)])
        seeds = seeds[:2]
        keep_p = 1.0 - dropout_rate
        r1, r2 = jax.random.split(dropout_rng)
        shp = (H,) + nbr.shape
        kap1 = jnp.where(jax.random.bernoulli(r1, keep_p, shp),
                         1.0 / keep_p, 0.0)
        kap2 = jnp.where(jax.random.bernoulli(r2, keep_p, shp),
                         1.0 / keep_p, 0.0)
    else:
        seeds = jnp.zeros((2,), jnp.int32)
        kap1 = kap2 = None   # eval: skip every keep-factor op
    return _hybrid_biased(q, k, v, scale_param, bias_blocks, bias_res,
                          mask_blocks, *cplan, *cplan_t, nbr, nval, inc,
                          inc_slot, ival, kap1, kap2, seeds, metric,
                          block_m, block_n, bf16, dropout_rate)
