"""Geometric (within-snapshot) multi-head attention.

TPU-native re-design of the reference ``GeometricAttention`` /
``TAGANGraphAttention`` (`/root/reference/src/tagan/layers/geometric_attention.py:228-607`,
`graph_attention.py:15-137`):

* the reference's per-head / per-query Python loops for non-SDP metrics
  (:356-469) become one batched score computation (`ops.distances`),
* the reference's dense adjacency densification (+ self loops,
  graph_attention.py:96-105) is kept as the "dense" backend (edge-masked
  full attention on the MXU — correct and fastest for snapshot sizes up
  to a few thousand nodes), and the same semantics run as an
  SDDMM -> segment-softmax -> SpMM pipeline ("csr" backend, Pallas
  kernels for large graphs),
* layer placement matches exactly: pre-LN -> QKV -> scores -> mask ->
  softmax -> dropout -> (optional geometric-bias re-softmax,
  :567-575) -> attn@V -> out proj -> dropout -> residual -> post-LN
  (:518-598).

Hyperparameters are static dataclass fields; parameters live in a plain
dict pytree (see `core.module`).
"""

from __future__ import annotations

import dataclasses
from typing import Optional, Tuple

import jax
import jax.numpy as jnp

from ..core import module as M
from ..ops import distances as D
from ..ops import sparse as S
from ..ops.masked import masked_softmax


@dataclasses.dataclass(frozen=True)
class GeometricAttention:
    hidden_dim: int
    num_heads: int = 8
    dropout: float = 0.1
    distance_metric: str = "scaled_dot_product"
    use_layer_norm: bool = True
    learnable_distance: bool = False

    def __post_init__(self):
        assert self.hidden_dim % self.num_heads == 0, \
            "Hidden dimension must be divisible by number of heads"

    @property
    def head_dim(self) -> int:
        return self.hidden_dim // self.num_heads

    # -- params ----------------------------------------------------------
    def init(self, key: jax.Array) -> M.Params:
        ks = M.split_keys(key, ["q", "k", "v", "o", "dist"])
        h = self.hidden_dim
        p: M.Params = {
            "q": M.init_linear(ks["q"], h, h),
            "k": M.init_linear(ks["k"], h, h),
            "v": M.init_linear(ks["v"], h, h),
            "o": M.init_linear(ks["o"], h, h),
        }
        if self.use_layer_norm:
            p["ln1"] = M.init_layer_norm(h)
            p["ln2"] = M.init_layer_norm(h)
        if self.learnable_distance:
            if self.distance_metric == "gaussian_kernel":
                # sigma per head = 1.0 (geometric_attention.py:327-328)
                p["distance_param"] = jnp.ones((self.num_heads,))
            elif self.distance_metric == "rbf_kernel":
                # gamma per head = 0.1 (:329-330)
                p["distance_param"] = jnp.full((self.num_heads,), 0.1)
            elif self.distance_metric == "mahalanobis":
                # low-rank cov factors [H, R, Dh], xavier (:296-303)
                rank = min(16, self.hidden_dim // 4)
                p["cov_factors"] = M.xavier_uniform(
                    ks["dist"], (self.num_heads, rank, self.head_dim))
        return p

    # -- score helpers ---------------------------------------------------
    def _metric_params(self, p: M.Params):
        sigma = gamma = cov_inv = None
        if self.learnable_distance:
            if self.distance_metric == "gaussian_kernel":
                sigma = p["distance_param"]
            elif self.distance_metric == "rbf_kernel":
                gamma = p["distance_param"]
            elif self.distance_metric == "mahalanobis":
                f = p["cov_factors"]                       # [H, R, Dh]
                cov_inv = jnp.einsum("hrd,hre->hde", f, f)  # PSD, :447-450
        return sigma, gamma, cov_inv

    def _split_heads(self, x: jax.Array) -> jax.Array:
        # [..., N, hidden] -> [..., H, N, Dh]
        *lead, n, _ = x.shape
        x = x.reshape(*lead, n, self.num_heads, self.head_dim)
        return jnp.moveaxis(x, -2, -3)

    def _merge_heads(self, x: jax.Array) -> jax.Array:
        # [..., H, N, Dh] -> [..., N, hidden]
        x = jnp.moveaxis(x, -3, -2)
        *lead, n, _, _ = x.shape
        return x.reshape(*lead, n, self.hidden_dim)

    # -- forward (dense backend) -----------------------------------------
    def __call__(
        self,
        p: M.Params,
        x: jax.Array,                      # [N, hidden] or [B, N, hidden]
        attention_mask: Optional[jax.Array] = None,   # bool [.., N, N]
        geometric_bias: Optional[jax.Array] = None,   # [.., N, N]
        *,
        deterministic: bool = True,
        rng: Optional[jax.Array] = None,
        return_weights: bool = False,
    ):
        identity = x
        h = M.layer_norm(p["ln1"], x) if self.use_layer_norm else x
        q = self._split_heads(M.linear(p["q"], h))
        k = self._split_heads(M.linear(p["k"], h))
        v = self._split_heads(M.linear(p["v"], h))

        sigma, gamma, cov_inv = self._metric_params(p)
        scores = D.pairwise_scores(self.distance_metric, q, k, sigma=sigma,
                                   gamma=gamma, cov_inv=cov_inv)

        mask = None
        if attention_mask is not None:
            mask = attention_mask
            if mask.ndim == scores.ndim - 1:   # [.., N, N] -> [.., 1, N, N]
                mask = mask[..., None, :, :]
        weights = masked_softmax(scores, mask)

        if not deterministic and rng is not None:
            rng, r1 = jax.random.split(rng)
            weights = M.dropout(weights, self.dropout, deterministic=False,
                                rng=r1)

        if geometric_bias is not None:
            gb = geometric_bias
            if gb.ndim == weights.ndim - 1:
                gb = gb[..., None, :, :]
            # re-softmax restricted to the mask: the reference re-softmaxes
            # unmasked (geometric_attention.py:572-575) but has no padded
            # slots; here an unmasked re-softmax would hand every masked
            # column exp(0) weight and leak attention onto padding
            weights = masked_softmax(weights + gb, mask)
            if not deterministic and rng is not None:
                rng, r2 = jax.random.split(rng)
                weights = M.dropout(weights, self.dropout,
                                    deterministic=False, rng=r2)

        ctx = jnp.einsum("...ij,...jd->...id", weights, v)
        ctx = self._merge_heads(ctx)
        ctx = M.linear(p["o"], ctx)
        if not deterministic and rng is not None:
            rng, r3 = jax.random.split(rng)
            ctx = M.dropout(ctx, self.dropout, deterministic=False, rng=r3)
        out = ctx + identity
        if self.use_layer_norm:
            out = M.layer_norm(p["ln2"], out)
        if return_weights:
            return out, weights
        return out

    # -- forward (Pallas flash backend) ----------------------------------
    def apply_flash(
        self,
        p: M.Params,
        x: jax.Array,                 # [N, hidden] or [T, N, hidden]
        attention_mask: jax.Array,    # bool [N, N] or [T, N, N]
        *,
        deterministic: bool = True,
        rng: Optional[jax.Array] = None,
        block_m: int = 512,
        block_n: int = 1024,
        max_blocks_per_row: Optional[int] = None,
        bf16: bool = False,
        plan=None,
        plan_t=None,
        max_blocks_per_col: Optional[int] = None,
        bias: Optional[jax.Array] = None,   # [N, N] or [T, N, N]
    ) -> jax.Array:
        """Same semantics as the dense path but through the fused Pallas
        flash kernel (ops.pallas.flash_geometric) — the [N, N] score
        matrix never reaches HBM. Attention-weight dropout runs *inside*
        the kernel (hash-PRNG keep mask regenerated by the backward
        kernels); output dropout applies outside as usual.
        ``plan``/``plan_t`` share one precomputed block-sparsity plan
        across layers (see ops.pallas.flash_geometric.make_block_plan).
        ``bias`` is the head-shared additive re-softmax bias of the
        dense path (geometric_attention.py:567-575), served by the
        kernel's edge-biased variant."""
        from ..ops.pallas.flash_geometric import (MXU_METRICS,
                                                  flash_geometric_attention)
        sigma, gamma, _ = self._metric_params(p)
        scale = sigma if sigma is not None else gamma
        metric = self.distance_metric
        if metric not in MXU_METRICS and metric != "mahalanobis":
            # manhattan is not blockwise-MXU expressible
            return self(p, x, attention_mask, geometric_bias=bias,
                        deterministic=deterministic, rng=rng)
        att_rate = 0.0
        att_seed = None
        if not deterministic and rng is not None and self.dropout > 0.0:
            rng, r_att = jax.random.split(rng)
            att_rate = self.dropout
            # one int32 seed per snapshot feeds the kernel's hash PRNG
            n_seeds = x.shape[0] if x.ndim == 3 else 1
            att_seed = jax.random.randint(
                r_att, (n_seeds, 1), 0, jnp.iinfo(jnp.int32).max,
                dtype=jnp.int32)
        identity = x
        h = M.layer_norm(p["ln1"], x) if self.use_layer_norm else x
        q = self._split_heads(M.linear(p["q"], h))
        k = self._split_heads(M.linear(p["k"], h))
        v = self._split_heads(M.linear(p["v"], h))
        if metric == "mahalanobis":
            # maha(q,k; FᵀF) = |Fq − Fk|² — euclidean in factor space
            # (same 1e-8 eps inside the sqrt); F grads flow through the
            # einsum outside the kernel's custom_vjp
            metric = "euclidean"
            if self.learnable_distance:
                f = p["cov_factors"]                       # [H, R, Dh]
                q = jnp.einsum("...hnd,hrd->...hnr", q, f)
                k = jnp.einsum("...hnd,hrd->...hnr", k, f)

        def one(qh, kh, vh, mh, sd=att_seed, bh=bias, pln=plan,
                pln_t=plan_t):
            return flash_geometric_attention(
                qh, kh, vh, mh, metric=metric,
                scale_param=scale, block_m=block_m, block_n=block_n,
                bf16=bf16, max_blocks_per_row=max_blocks_per_row,
                plan=pln, plan_t=pln_t,
                max_blocks_per_col=max_blocks_per_col,
                dropout_rate=att_rate, dropout_seed=sd, bias=bh)

        if x.ndim == 3:   # [T, N, hidden] snapshots
            seed_ax = None if att_seed is None else 0
            bias_ax = None if bias is None else 0
            if plan is not None:
                ctx = jax.vmap(one,
                               in_axes=(0, 0, 0, 0, seed_ax, bias_ax,
                                        0, 0)
                               )(q, k, v, attention_mask, att_seed, bias,
                                 plan, plan_t)
            else:
                ctx = jax.vmap(
                    lambda qh, kh, vh, mh, sd, bh: one(qh, kh, vh, mh,
                                                       sd, bh, None,
                                                       None),
                    in_axes=(0, 0, 0, 0, seed_ax, bias_ax),
                )(q, k, v, attention_mask, att_seed, bias)
        else:
            sd0 = None if att_seed is None else att_seed[0]
            ctx = one(q, k, v, attention_mask, sd0)
        ctx = self._merge_heads(ctx)
        ctx = M.linear(p["o"], ctx)
        if not deterministic and rng is not None:
            ctx = M.dropout(ctx, self.dropout, deterministic=False, rng=rng)
        out = ctx + identity
        if self.use_layer_norm:
            out = M.layer_norm(p["ln2"], out)
        return out

    # -- forward (hybrid band + residual backend) ------------------------
    def apply_hybrid(
        self,
        p: M.Params,
        x: jax.Array,                 # [N, hidden]
        mask_blocks: jax.Array,       # i8[S, BM, BN or BN//8] band store
        band_plan, band_plan_t,       # 3-tuple compact plans
        res_eq: jax.Array,            # i32[Er] residual query node
        res_ek: jax.Array,            # i32[Er] residual key node
        res_em: jax.Array,            # bool[Er]
        node_mask: jax.Array,         # bool[N]
        *,
        deterministic: bool = True,
        rng: Optional[jax.Array] = None,
        block_m: int = 512,
        block_n: int = 1024,
        bf16: bool = False,
        res_pad=None,   # optional padded-degree tables (nbr, nval,
                        # inc, inc_slot, ival) — the scatter-free
                        # residual path; COO args are ignored when set
        band_bias: Optional[jax.Array] = None,  # f32[S, BM, BN] compact
        res_bias: Optional[jax.Array] = None,   # f32[N, dmax] padded
        res_cpad=None,  # degree-bucketed COMPACT tables (preferred on
                        # both paths; core.graph.compact_padded_residual)
        res_cbias=None,  # per-bucket compact bias tables (list of
                         # f32[Na_b, cap_b]) — switches the biased path
                         # onto the compact residual layout
    ) -> jax.Array:
        """Hybrid backend for very large graphs with locality (the
        post-RCM band structure, `core.graph.build_sequence(
        reorder="rcm")`): the BAND edges — the dense near-diagonal
        majority — run through the flash kernel with COMPACT mask
        blocks (HBM scales with occupied blocks, not N²; SURVEY §2.9's
        >HBM-graph mandate, transcending the reference's
        O(N²) densification, graph_attention.py:96-105), while the few
        long-range RESIDUAL edges run through the O(E) csr path. The
        two partial softmaxes merge EXACTLY into the union softmax via
        their logsumexps (`ops.sparse.merge_attention_partials`; the
        flash kernel's lse output is differentiable for this). Self
        loops must live in the band structure (its builder adds them);
        the residual set must be disjoint from the band.

        Attention dropout runs in-kernel on the band part and per-edge
        on the residual part — dropping normalized weights is linear,
        so the merged result is exact union-softmax dropout.

        ``band_bias``/``res_bias`` switch to the edge-biased variant —
        the dense path's geometric-bias DOUBLE softmax computed
        union-exactly across the band/residual split
        (`ops.pallas.hybrid_biased`). band_bias carries the band edges'
        head-shared bias values in the compact slot layout of
        ``mask_blocks``; res_bias the residual values in the padded
        query layout (requires ``res_pad``)."""
        from ..ops.pallas.flash_geometric import (
            MXU_METRICS, flash_geometric_attention_lse)
        metric = self.distance_metric
        if metric not in MXU_METRICS and metric != "mahalanobis":
            raise NotImplementedError(
                f"metric {metric} is not MXU-expressible; the hybrid "
                "backend needs the flash kernel — use 'csr'")
        biased = band_bias is not None
        biased_compact = (biased and res_cpad is not None
                          and res_cbias is not None)
        if biased and res_pad is None and not biased_compact:
            raise ValueError(
                "edge bias on the hybrid backend needs the padded "
                "residual tables (or the compact tables + bias "
                "provenance) — rebuild the plan with "
                "with_hybrid_plan(padded_residual=True)")
        sigma, gamma, _ = self._metric_params(p)
        scale = sigma if sigma is not None else gamma
        att_rate = 0.0
        r_band = r_res = None
        band_seed = None
        if not deterministic and rng is not None and self.dropout > 0.0:
            rng, r_band, r_res = jax.random.split(rng, 3)
            att_rate = self.dropout
            band_seed = jax.random.randint(
                r_band, (2 if biased else 1,), 0,
                jnp.iinfo(jnp.int32).max, dtype=jnp.int32)
        identity = x
        h = M.layer_norm(p["ln1"], x) if self.use_layer_norm else x
        q = self._split_heads(M.linear(p["q"], h))   # [H, N, Dh]
        k = self._split_heads(M.linear(p["k"], h))
        v = self._split_heads(M.linear(p["v"], h))
        if metric == "mahalanobis":
            # factor space on BOTH parts so band and residual scores
            # agree (maha(q,k; FᵀF) = |Fq − Fk|²)
            metric = "euclidean"
            if self.learnable_distance:
                f = p["cov_factors"]                       # [H, R, Dh]
                q = jnp.einsum("...hnd,hrd->...hnr", q, f)
                k = jnp.einsum("...hnd,hrd->...hnr", k, f)
        from ..ops import sparse as S2
        if biased:
            from ..ops.pallas.flash_geometric import _l2_normalize
            from ..ops.pallas.hybrid_biased import (
                hybrid_biased_attention, hybrid_biased_attention_compact)
            if metric in ("cosine_similarity", "cosine_distance"):
                # normalize outside the custom_vjp so autodiff pulls
                # the chain back
                q = _l2_normalize(q)
                k = _l2_normalize(k)
            if biased_compact:
                # (q/k/v stay UN-named: recomputing them is LN/linear
                # glue, and naming them was measured 880 MB over HBM
                # at the 131K bench — the walks still skip recompute
                # because their out/lse residuals are named inside
                # hybrid_biased's fwd)
                ctx = hybrid_biased_attention_compact(
                    q, k, v, mask_blocks, band_plan, band_plan_t,
                    res_cpad, band_bias, res_cbias, metric=metric,
                    scale_param=scale, block_m=block_m, block_n=block_n,
                    bf16=bf16, dropout_rate=att_rate,
                    dropout_seeds=band_seed, dropout_rng=r_res)
            else:
                ctx = hybrid_biased_attention(
                    q, k, v, mask_blocks, band_plan, band_plan_t,
                    res_pad, band_bias, res_bias, metric=metric,
                    scale_param=scale, block_m=block_m, block_n=block_n,
                    bf16=bf16, dropout_rate=att_rate,
                    dropout_seeds=band_seed, dropout_rng=r_res)
        else:
            band = flash_geometric_attention_lse(
                q, k, v, mask_blocks, metric=metric, scale_param=scale,
                block_m=block_m, block_n=block_n, bf16=bf16,
                plan=band_plan, plan_t=band_plan_t,
                dropout_rate=att_rate, dropout_seed=band_seed)
            if res_cpad is not None:
                res = S2.edge_attention_partial_padded_compact(
                    metric, q, k, v, res_cpad,
                    sigma=sigma, gamma=gamma,
                    dropout_rate=att_rate, dropout_rng=r_res)
            elif res_pad is not None:
                nbr, nval, inc, inc_slot, ival = res_pad
                res = S2.edge_attention_partial_padded(
                    metric, q, k, v, nbr, nval, inc, inc_slot, ival,
                    sigma=sigma, gamma=gamma,
                    dropout_rate=att_rate, dropout_rng=r_res)
            else:
                res = S2.edge_attention_partial(
                    metric, q, k, v, res_eq, res_ek, res_em,
                    x.shape[-2], sigma=sigma, gamma=gamma,
                    dropout_rate=att_rate, dropout_rng=r_res)
            ctx, _ = S2.merge_attention_partials([band, res])
        ctx = self._merge_heads(ctx)
        ctx = M.linear(p["o"], ctx)
        if not deterministic and rng is not None:
            ctx = M.dropout(ctx, self.dropout, deterministic=False,
                            rng=rng)
        out = ctx + identity
        if self.use_layer_norm:
            out = M.layer_norm(p["ln2"], out)
        return jnp.where(node_mask[:, None], out, identity)

    # -- forward (ring / edge-partitioned backend) -----------------------
    def apply_ring(
        self,
        p: M.Params,
        x: jax.Array,                 # [N, hidden]
        attn_core,   # (q, k, v, sigma, gamma, cov_inv, rng|None) -> ctx
        node_mask: jax.Array,         # bool[N]
        *,
        deterministic: bool = True,
        rng: Optional[jax.Array] = None,
    ) -> jax.Array:
        """Same semantics over the mesh graph axis: QKV/LN/residual run
        under GSPMD, the attention core (`attn_core`, a closure over a
        shard_map'd ring from dist.edge_partition — full-chunk or
        boundary-only) circulates K/V via ppermute; per-query softmax is
        exact because every edge of a query lives on its owner. Self
        loops must already be in the buckets
        (SnapshotSequence.with_ring_plan adds them). In train mode the
        core receives an rng for per-edge attention dropout (normalized
        weights, like csr/flash) and output dropout applies here; edge
        bias rides as a closure over the core (the model binds the
        per-layer bias buckets via functools.partial — the biased ring
        runs the dense path's double softmax in two passes)."""
        from ..dist.edge_partition import metric_placeholders
        identity = x
        h = M.layer_norm(p["ln1"], x) if self.use_layer_norm else x
        q = self._split_heads(M.linear(p["q"], h))   # [H, N, Dh]
        k = self._split_heads(M.linear(p["k"], h))
        v = self._split_heads(M.linear(p["v"], h))
        sigma, gamma, cov_inv = self._metric_params(p)
        sigma, gamma, cov_inv = metric_placeholders(
            self.num_heads, self.head_dim, x.dtype, sigma, gamma, cov_inv)
        r_att = r_out = None
        if not deterministic and rng is not None and self.dropout > 0.0:
            r_att, r_out = jax.random.split(rng)
        ctx = attn_core(q, k, v, sigma, gamma, cov_inv, r_att)
        ctx = self._merge_heads(ctx)
        ctx = M.linear(p["o"], ctx)
        if r_out is not None:
            ctx = M.dropout(ctx, self.dropout, deterministic=False,
                            rng=r_out)
        out = ctx + identity
        if self.use_layer_norm:
            out = M.layer_norm(p["ln2"], out)
        return jnp.where(node_mask[:, None], out, identity)

    # -- forward (sparse/CSR backend) ------------------------------------
    def apply_sparse(
        self,
        p: M.Params,
        x: jax.Array,                 # [N, hidden]
        edge_q: jax.Array,            # i32[E'] query node per edge
        edge_k: jax.Array,            # i32[E'] key node per edge
        edge_mask: jax.Array,         # bool[E']
        node_mask: jax.Array,         # bool[N]
        *,
        deterministic: bool = True,
        rng: Optional[jax.Array] = None,
        use_pallas: bool = False,
        edge_bias: Optional[jax.Array] = None,     # [E'] per-edge bias
    ) -> jax.Array:
        """Same semantics on an explicit edge list (self loops must already
        be included — see `ops.sparse.add_self_loops`). Padded slots produce
        zeros and are restored to the residual value.

        ``edge_bias`` is the per-edge additive bias of the dense path's
        geometric-bias re-softmax (zeros expected on appended self-loop
        entries, matching the dense path's mask-restricted bias). With
        dropout active, weights are dropped after each softmax exactly
        like the dense op order."""
        identity = x
        h = M.layer_norm(p["ln1"], x) if self.use_layer_norm else x
        q = self._split_heads(M.linear(p["q"], h))   # [H, N, Dh]
        k = self._split_heads(M.linear(p["k"], h))
        v = self._split_heads(M.linear(p["v"], h))
        sigma, gamma, cov_inv = self._metric_params(p)
        n = x.shape[-2]

        att_rate = 0.0
        r_att = None
        if not deterministic and rng is not None and self.dropout > 0.0:
            rng, r_att = jax.random.split(rng)
            att_rate = self.dropout

        if use_pallas:
            if edge_bias is not None or att_rate > 0.0:
                raise NotImplementedError(
                    "fused_edge_attention supports neither edge bias nor "
                    "attention dropout; use the XLA edge path")
            from ..ops.pallas import fused_edge_attention
            ctx = fused_edge_attention(
                self.distance_metric, q, k, v, edge_q, edge_k, edge_mask, n,
                sigma=sigma, gamma=gamma, cov_inv=cov_inv)
        else:
            ctx = S.edge_attention(
                self.distance_metric, q, k, v, edge_q, edge_k, edge_mask, n,
                sigma=sigma, gamma=gamma, cov_inv=cov_inv,
                edge_bias=edge_bias, dropout_rate=att_rate,
                dropout_rng=r_att)

        ctx = self._merge_heads(ctx)
        ctx = M.linear(p["o"], ctx)
        if not deterministic and rng is not None:
            ctx = M.dropout(ctx, self.dropout, deterministic=False, rng=rng)
        out = ctx + identity
        if self.use_layer_norm:
            out = M.layer_norm(p["ln2"], out)
        return jnp.where(node_mask[:, None], out, identity)


@dataclasses.dataclass(frozen=True)
class GraphAttention:
    """Adapter: graph snapshot -> geometric attention (reference
    ``TAGANGraphAttention``, graph_attention.py:15-137). Builds the
    edge-masked attention mask (adjacency + self loops) and, unlike the
    reference (which accepts then ignores edge features, :108-112),
    optionally injects embedded edge features as an additive attention
    bias when `use_edge_bias` is set."""
    hidden_dim: int
    num_heads: int = 8
    dropout: float = 0.1
    distance_metric: str = "scaled_dot_product"
    use_layer_norm: bool = True
    learnable_distance: bool = False
    use_edge_bias: bool = False

    @property
    def inner(self) -> GeometricAttention:
        return GeometricAttention(
            hidden_dim=self.hidden_dim, num_heads=self.num_heads,
            dropout=self.dropout, distance_metric=self.distance_metric,
            use_layer_norm=self.use_layer_norm,
            learnable_distance=self.learnable_distance)

    def init(self, key: jax.Array) -> M.Params:
        k1, k2 = jax.random.split(key)
        p = {"attn": self.inner.init(k1)}
        if self.use_edge_bias:
            p["edge_bias"] = M.init_linear(k2, self.hidden_dim, 1)
        return p

    def __call__(
        self,
        p: M.Params,
        x: jax.Array,                # [N, hidden]
        adj_mask: jax.Array,         # bool[N, N] incl. self loops & validity
        edge_features: Optional[jax.Array] = None,  # dense [N, N, hidden]
        edge_presence: Optional[jax.Array] = None,  # bool[N, N] real edges
        *,
        deterministic: bool = True,
        rng: Optional[jax.Array] = None,
        return_weights: bool = False,
    ):
        bias = None
        if self.use_edge_bias and edge_features is not None:
            bias = M.linear(p["edge_bias"], edge_features)[..., 0]
            # bias exists only where a REAL edge does: the implicit
            # self loops the mask adds carry zero bias (otherwise
            # linear(0-features) hands them the learned offset b,
            # diverging from the csr/flash/ring per-edge convention)
            bias = jnp.where(
                adj_mask if edge_presence is None else edge_presence,
                bias, 0.0)
        return self.inner(p["attn"], x, attention_mask=adj_mask,
                          geometric_bias=bias, deterministic=deterministic,
                          rng=rng, return_weights=return_weights)
