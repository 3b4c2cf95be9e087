"""Core graph data structures for TAGAN-TPU.

The framework's fundamental data type is a **snapshot sequence**: T graph
snapshots over a shared, persistent node-ID space. The reference passes
ragged Python lists of per-snapshot tensors with explicit ``node_ids``
(`/root/reference/src/tagan/model.py:188-230`); under XLA everything must
be static-shape, so we map every sequence into a dense **slot space**:

- the union of node IDs appearing anywhere in the sequence is sorted and
  assigned slots ``0..n_unique-1`` (mirrors the reference's sorted-ID
  mapping, model.py:200-204 / temporal_propagation.py:1263),
- arrays are padded to static ``max_nodes`` / ``max_edges`` with validity
  masks,
- per-snapshot edges are kept both as a dense adjacency mask (the dense
  MXU path — the reference densifies too, graph_attention.py:96-105)
  and as padded COO/CSR (the sparse Pallas path).

All arrays live in one pytree (`SnapshotSequence`) that jit/vmap/pjit
can move as a unit. A batch of sequences is simply a stacked pytree with
a leading batch axis (`batch_sequences`).
"""

from __future__ import annotations

import dataclasses
from typing import Any, Dict, List, Optional, Sequence, Tuple, Union

import jax
import jax.numpy as jnp
import numpy as np


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class SnapshotSequence:
    """One temporal graph sequence in dense slot space. Shapes:

    T = max_time (padded), N = max_nodes (padded), E = max_edges (padded).

    x          f32[T, N, F_node]   node features per snapshot (slot space)
    node_mask  bool[T, N]          node active at step t
    adj        bool[T, N, N]       directed adjacency (no self loops)
    edge_src   i32[T, E]           COO source slot (0 where padded)
    edge_dst   i32[T, E]           COO destination slot
    edge_mask  bool[T, E]          edge validity
    edge_attr  f32[T, E, F_edge]   edge features (F_edge may be 0)
    times      f32[T]              continuous timestamp per snapshot
    time_mask  bool[T]             snapshot validity (sequences shorter than T)
    node_ids   i32[N]              global node ID per slot (-1 = padding)

    Optional ring-partition plan (set by `with_ring_plan`, consumed by
    ``spatial_backend="ring"``): edges bucketed host-side by
    (query-owner, key-owner) shard pair, self loops for active nodes
    included — ring_eq/ring_ek i32[T, G, G, Ep], ring_em bool[T, G, G,
    Ep].
    """
    x: jax.Array
    node_mask: jax.Array
    adj: jax.Array
    edge_src: jax.Array
    edge_dst: jax.Array
    edge_mask: jax.Array
    edge_attr: jax.Array
    times: jax.Array
    time_mask: jax.Array
    node_ids: jax.Array
    ring_eq: Optional[jax.Array] = None
    ring_ek: Optional[jax.Array] = None
    ring_em: Optional[jax.Array] = None
    # boundary-only halo variant (with_ring_plan(boundary=True)):
    # ring_ek is then stored *localized* (diagonal buckets -> shard-local
    # ids, off-diagonal -> positions into the key shard's boundary
    # compaction) and ring_bnd_idx i32[T, G, Bp] lists each shard's
    # exported boundary rows
    ring_bnd_idx: Optional[jax.Array] = None
    # per-bucket provenance i32[T, G, G, Ep]: each slot's original edge
    # position in edge_attr[t] (-1 for self loops / padding) — lets the
    # ring backend gather per-edge feature bias values
    ring_esrc: Optional[jax.Array] = None
    # flash-local ring structures (with_ring_plan(boundary=True), the
    # default): the DIAGONAL bucket (each shard's local edges, the bulk
    # on a local graph) as a per-shard compact occupied-block structure
    # for the flash kernel — (mask i8[T, G, S, BM, BN],
    # jl i32[T, G, n_i, W], jc, js, il i32[T, G, n_j, Wt], ic, isl) —
    # and the OFF-DIAGONAL buckets as rectangular padded-degree tables
    # against each source shard's boundary compaction —
    # (nbr i32[T, G, G, per, dmax], nval, inc i32[T, G, G, Bp, dmax_t],
    # inc_slot, ival). Consumed by
    # dist.edge_partition.make_boundary_ring_flash_attention.
    ring_flash_diag: Optional[Tuple[jax.Array, ...]] = None
    ring_flash_off: Optional[Tuple[jax.Array, ...]] = None
    # compact bipartite boundary-fold structures (round 5): tuple of
    # per-bucket 6-tuples (qid, nbr, nval, inc, inc_slot, ival), each
    # [T, G, G, ...] — the unbiased flash-local folds prefer these
    # over the padded ring_flash_off tables (gather work ~1.5x the
    # cross-edge count instead of per*dmax per hop)
    ring_flash_off_c: Optional[Tuple[Tuple[jax.Array, ...], ...]] = \
        None
    # hybrid band+residual plan (set by `with_hybrid_plan`, consumed by
    # ``spatial_backend="hybrid"``): per snapshot, the near-diagonal
    # BAND edges (incl. self loops) as a compact occupied-block mask
    # store + walk plans for the flash kernel, and the long-range
    # RESIDUAL edges as a padded COO list for the csr partial.
    # hyb_mask_blocks i8[T, S, BM, mw]; hyb_plan/hyb_plan_t 3-tuples of
    # i32 arrays (list [T, n, W], count [T, n], slot [T, n, W]);
    # hyb_res (eq, ek, em) each [T, Er].
    hyb_mask_blocks: Optional[jax.Array] = None
    hyb_plan: Optional[Tuple[jax.Array, jax.Array, jax.Array]] = None
    hyb_plan_t: Optional[Tuple[jax.Array, jax.Array, jax.Array]] = None
    hyb_res: Optional[Tuple[jax.Array, jax.Array, jax.Array]] = None
    # padded-degree residual layout (scatter-free TPU path,
    # ops.sparse.edge_attention_partial_padded): per snapshot,
    # (nbr i32[T, N, dmax], nval bool, inc i32[T, N, dmax_t],
    #  inc_slot i32[T, N, dmax_t], ival bool)
    hyb_res_pad: Optional[Tuple[jax.Array, jax.Array, jax.Array,
                                jax.Array, jax.Array]] = None
    # degree-bucketed COMPACT residual tables (round 4 — gather work
    # ~1.5x the edge count; `compact_padded_residual`): tuple of
    # per-bucket 7-tuples (qid, nbr, nval, kid, inc, inc_slot, ival),
    # each [T, ...]. Preferred by the unbiased hybrid path when present.
    hyb_res_cpad: Optional[Tuple[Tuple[jax.Array, ...], ...]] = None
    # per-bucket bias provenance for the compact residual: tuple of
    # i32[T, Na_b, cap_b] arrays carrying each compact slot's original
    # edge id (-1 padding) — the biased hybrid gathers per-layer bias
    # values through these (round 5; mirrors hyb_res_bid for the
    # plain padded layout)
    hyb_res_cbid: Optional[Tuple[jax.Array, ...]] = None
    # edge-feature provenance for the biased hybrid backend
    # (ops.pallas.hybrid_biased): hyb_band_slot i32[T, E] maps each
    # original edge to its occupied band block slot (-1 = residual /
    # invalid — the model scatters per-layer bias values through it into
    # the compact [S, BM, BN] bias store); hyb_res_bid i32[T, N, dmax]
    # carries each padded residual slot's original edge id (-1 padding)
    hyb_band_slot: Optional[jax.Array] = None
    hyb_res_bid: Optional[jax.Array] = None

    @property
    def num_steps(self) -> int:
        return self.x.shape[0]

    @property
    def max_nodes(self) -> int:
        return self.x.shape[1]

    @property
    def node_feature_dim(self) -> int:
        return self.x.shape[2]

    @property
    def edge_feature_dim(self) -> int:
        return self.edge_attr.shape[2]

    @property
    def has_dense_adj(self) -> bool:
        """False when built with dense_adj=False (large graphs using the
        flash/csr backends, which reconstruct masks from edge lists)."""
        return self.adj.shape[-1] == self.max_nodes

    def attention_mask(self, add_self_loops: bool = True) -> jax.Array:
        """Dense attention mask per snapshot: adjacency (+ self loops for
        active nodes), restricted to active x active slots.

        Mirrors the reference densification + self-loop add
        (graph_attention.py:96-105). Note the reference adds eye() for
        *all* rows; padded slots here are masked off instead, which is
        equivalent on active slots and keeps padding inert.
        """
        if not self.has_dense_adj:
            raise ValueError(
                "sequence was built with dense_adj=False; the dense "
                "attention path needs the adjacency — use the 'flash' or "
                "'csr' spatial backend, or rebuild with dense_adj=True")
        m = self.adj
        if add_self_loops:
            n = self.max_nodes
            eye = jnp.eye(n, dtype=bool)
            m = jnp.logical_or(m, eye[None, :, :])
        pair = self.node_mask[:, :, None] & self.node_mask[:, None, :]
        return jnp.logical_and(m, pair)

    @property
    def ring_shards(self) -> int:
        """Number of graph shards the ring plan was built for (0 when no
        plan is attached)."""
        return 0 if self.ring_eq is None else self.ring_eq.shape[1]

    def with_ring_plan(self, num_shards: int,
                       max_edges_per_bucket: Optional[int] = None,
                       boundary: bool = False,
                       max_boundary: Optional[int] = None,
                       local_flash: Optional[bool] = None,
                       local_block_m: Optional[int] = None,
                       local_block_n: Optional[int] = None,
                       pin: Optional[dict] = None
                       ) -> "SnapshotSequence":
        """Attach the host-side edge partition consumed by
        ``spatial_backend="ring"``: per snapshot, bucket every valid
        edge *plus a self loop for each active node* (the adapter's
        self-loop add, graph_attention.py:102) by (query-owner,
        key-owner) shard pair. Owners are contiguous slot ranges of
        size N / num_shards.

        Pass ``max_edges_per_bucket`` to fix Ep across sequences (so
        batched sequences stack); it must upper-bound every bucket.

        ``boundary=True`` additionally compacts each shard's boundary
        nodes (dist.edge_partition.make_boundary_plan) so the ring
        circulates only the rows other shards reference — per-hop
        traffic x beta instead of the full shard.

        With ``boundary=True``, ``local_flash`` (default on) also
        builds the flash-local structures: each shard's DIAGONAL bucket
        as a compact occupied-block structure (the local math then runs
        through the flash Pallas kernel instead of COO segment folds)
        and the off-diagonal buckets as rectangular padded-degree
        tables against the source shard's boundary compaction
        (scatter-free folds). ``local_block_m``/``n`` pick the kernel
        block geometry (auto: 512x1024 clipped to the shard size).

        ``pin`` (from `ring_plan_dims`, merged across a dataset) fixes
        the plan's static dims so per-sequence plans stack into one
        batch pytree."""
        if pin is not None:
            max_edges_per_bucket = pin["Ep"]
            max_boundary = pin.get("Bp", max_boundary)
            if pin.get("lf") is not None:
                local_block_m = pin["lf"]["block_m"]
                local_block_n = pin["lf"]["block_n"]
            else:
                local_flash = False
        from ..dist.edge_partition import partition_edges_by_query_and_key
        N = self.max_nodes
        if N % num_shards != 0:
            raise ValueError(
                f"max_nodes={N} not divisible by num_shards={num_shards}"
                " — pad max_nodes to a shard multiple at build time")
        eq_t, ek_t, em_t, es_t = [], [], [], []
        src = np.asarray(self.edge_src)
        dst = np.asarray(self.edge_dst)
        em = np.asarray(self.edge_mask)
        nm = np.asarray(self.node_mask)
        diag = np.arange(N, dtype=src.dtype)
        E = src.shape[1]
        # original edge positions; appended self loops carry -1 (no
        # edge_attr row -> zero bias, matching the dense diagonal)
        ids = np.concatenate([np.arange(E, dtype=np.int64),
                              np.full(N, -1, np.int64)])
        # two passes: a sizing pass picks one static Ep for all steps
        per_t = []
        for t in range(self.num_steps):
            s = np.concatenate([src[t], diag])
            d = np.concatenate([dst[t], diag])
            m = np.concatenate([em[t], nm[t]])
            per_t.append((s, d, m))
        if max_edges_per_bucket is None:
            ep = 1
            for (s, d, m) in per_t:
                per = N // num_shards
                bids = (s // per) * num_shards + (d // per)
                counts = np.bincount(bids[m], minlength=num_shards ** 2)
                ep = max(ep, int(counts.max()) if counts.size else 1)
            max_edges_per_bucket = ep
        for (s, d, m) in per_t:
            bq, bk, bm, bs, _ = partition_edges_by_query_and_key(
                s, d, m, N, num_shards,
                max_edges_per_bucket=max_edges_per_bucket,
                edge_ids=ids)
            eq_t.append(bq)
            ek_t.append(bk)
            em_t.append(bm)
            es_t.append(bs)
        bnd_t = None
        if boundary:
            from ..dist.edge_partition import make_boundary_plan
            if max_boundary is None:
                # sizing pass: one static Bp across snapshots
                bp = 1
                for t in range(self.num_steps):
                    _, _, bpt, _ = make_boundary_plan(
                        eq_t[t], ek_t[t], em_t[t], N, num_shards)
                    bp = max(bp, bpt)
                max_boundary = bp
            bnd_t = []
            for t in range(self.num_steps):
                bidx, ek_loc, _, _ = make_boundary_plan(
                    eq_t[t], ek_t[t], em_t[t], N, num_shards,
                    max_boundary=max_boundary)
                bnd_t.append(bidx)
                ek_t[t] = ek_loc
        rf_diag = rf_off = rf_off_c = None
        rf_off_c = None
        if boundary and (local_flash is None or local_flash):
            lf_dims = lf_dims_c = None
            if pin is not None and pin.get("lf") is not None:
                lf = pin["lf"]
                lf_dims = (lf["S"], lf["W"], lf["Wt"], lf["dmax"],
                           lf["dmax_t"])
                # pinned WITHOUT compact caps (e.g. a merge over
                # mixed caps dropped them): skip the compact build so
                # per-sequence dims cannot diverge under one pin
                lf_dims_c = ((lf["caps_c"], lf["cdims_c"])
                             if lf.get("caps_c") is not None
                             else "skip")
            rf_diag, rf_off, rf_off_c = _ring_flash_structs(
                eq_t, ek_t, em_t, N, num_shards, max_boundary,
                local_block_m, local_block_n, dims=lf_dims,
                es_t=es_t, dims_c=lf_dims_c)
        return dataclasses.replace(
            self,
            ring_eq=jnp.asarray(np.stack(eq_t)),
            ring_ek=jnp.asarray(np.stack(ek_t)),
            ring_em=jnp.asarray(np.stack(em_t)),
            ring_bnd_idx=None if bnd_t is None
            else jnp.asarray(np.stack(bnd_t)),
            ring_esrc=jnp.asarray(np.stack(es_t)),
            ring_flash_diag=rf_diag,
            ring_flash_off=rf_off,
            ring_flash_off_c=rf_off_c)


    def with_hybrid_plan(self, band_width: Optional[int] = None,
                         block_m: int = 512, block_n: int = 1024,
                         pack: Optional[bool] = None,
                         band_quantile: float = 0.95,
                         padded_residual: Optional[bool] = None,
                         pin: Optional[dict] = None
                         ) -> "SnapshotSequence":
        """Attach the band + residual split consumed by
        ``spatial_backend="hybrid"`` (host-side, numpy). Edges within
        ``band_width`` slots of the diagonal (|src − dst| <=
        band_width) — the dense majority after RCM slot assignment
        (``build_sequence(reorder="rcm")``) — become the BAND: a
        compact occupied-block mask store + flash walk plans whose HBM
        footprint scales with the occupied blocks, not N². The
        remaining long-range edges become the RESIDUAL, kept as a
        padded COO list for the O(E) csr partial. Self loops of active
        nodes are folded into the band (the dense path's eye-add,
        graph_attention.py:102).

        ``band_width=None`` picks the ``band_quantile`` quantile of
        |src − dst| over all valid edges. ``pack=None`` bit-packs the
        mask store 8x whenever block_n is 1024-divisible (the packed
        lane-dim legality rule).

        ``padded_residual`` controls the scatter-free padded-degree
        residual tables ([T, N, dmax]): ``True`` always builds them,
        ``False`` keeps the O(E) COO residual only, ``None`` (default)
        builds them unless a residual hub node inflates the tables far
        beyond the COO cost crossover (N * dmax > 64 * Er — one
        high-degree off-band node would otherwise cost N*hub_degree
        table entries for an O(E)-sized edge set).

        ``pin`` fixes the plan's STATIC dims (from `hybrid_plan_dims`
        of a previously planned sequence / a dataset maximum) so plans
        built per sequence stack into one batch pytree — the loader's
        two-phase flow. Only shapes are pinned; each sequence keeps its
        own band split and slot contents."""
        if pin is not None:
            block_m = pin.get("block_m", block_m)
            block_n = pin.get("block_n", block_n)
            pack = pin.get("pack", pack)
        N = self.max_nodes
        bm, bn = block_m, block_n
        Np = ((N + max(bm, bn) - 1) // max(bm, bn)) * max(bm, bn)
        n_i, n_j = Np // bm, Np // bn
        if pack is None:
            pack = bn % 1024 == 0
        if pack and bn % 1024 != 0:
            raise ValueError("pack=True needs block_n % 1024 == 0")
        src = np.asarray(self.edge_src)
        dst = np.asarray(self.edge_dst)
        em = np.asarray(self.edge_mask)
        nm = np.asarray(self.node_mask)
        T = self.num_steps
        gap = np.abs(src.astype(np.int64) - dst.astype(np.int64))
        if band_width is None:
            valid = gap[em]
            band_width = int(np.quantile(valid, band_quantile)) \
                if valid.size else bn
        band_sel = em & (gap <= band_width)
        res_sel = em & ~band_sel
        Er = max(int(res_sel.sum(axis=1).max()), 1)
        if pin is not None and pin.get("Er") is not None:
            if Er > pin["Er"]:
                raise ValueError(f"residual edges {Er} > pinned "
                                 f"Er={pin['Er']}")
            Er = pin["Er"]

        # per-snapshot occupancy of band + self loops
        occs = []
        for t in range(T):
            occ = np.zeros((n_i, n_j), bool)
            bs, bd = src[t][band_sel[t]], dst[t][band_sel[t]]
            occ[bs // bm, bd // bn] = True
            d = np.nonzero(nm[t])[0]
            occ[d // bm, d // bn] = True
            occs.append(occ)
        S = max(max(int(o.sum()) for o in occs), 1)
        Wj = max(max(int(o.sum(axis=1).max()) for o in occs), 1)
        Wi = max(max(int(o.sum(axis=0).max()) for o in occs), 1)
        if pin is not None and pin.get("S") is not None:
            if S > pin["S"] or Wj > pin["Wj"] or Wi > pin["Wi"]:
                raise ValueError(
                    f"band occupancy ({S},{Wj},{Wi}) exceeds pinned "
                    f"({pin['S']},{pin['Wj']},{pin['Wi']})")
            S, Wj, Wi = pin["S"], pin["Wj"], pin["Wi"]

        mws = bn // 8 if pack else bn
        mask_blocks = np.zeros((T, S, bm, mws), np.int8)
        jl = np.zeros((T, n_i, Wj), np.int32)
        jc = np.zeros((T, n_i), np.int32)
        js = np.zeros((T, n_i, Wj), np.int32)
        il = np.zeros((T, n_j, Wi), np.int32)
        ic = np.zeros((T, n_j), np.int32)
        isl = np.zeros((T, n_j, Wi), np.int32)
        req = np.zeros((T, Er), np.int32)
        rek = np.zeros((T, Er), np.int32)
        rem = np.zeros((T, Er), bool)
        res_ids = np.full((T, Er), -1, np.int64)
        band_slot = np.full((T, src.shape[1]), -1, np.int32)
        for t in range(T):
            occ = occs[t]
            slot_flat = np.cumsum(occ.reshape(-1)).astype(np.int32) - 1
            jl[t], jc[t] = _rows_plan(occ, Wj)
            il[t], ic[t] = _rows_plan(occ.T, Wi)
            js[t] = np.clip(
                slot_flat[np.arange(n_i)[:, None] * n_j + jl[t]], 0,
                S - 1)
            isl[t] = np.clip(
                slot_flat[il[t] * n_j + np.arange(n_j)[:, None]], 0,
                S - 1)
            # band bits (+ self loops) into their slots
            bs, bd = src[t][band_sel[t]], dst[t][band_sel[t]]
            d = np.nonzero(nm[t])[0]
            rows = np.concatenate([bs, d])
            cols = np.concatenate([bd, d])
            slot_e = slot_flat[(rows // bm) * n_j + cols // bn]
            # per-edge provenance: each band edge's block slot (self
            # loops excluded — they carry zero bias like the dense
            # diagonal)
            band_slot[t, np.nonzero(band_sel[t])[0]] = \
                slot_e[:len(bs)]
            if pack:
                # interleaved bit layout of ops.pallas._pack_mask:
                # within a block's bn columns, col c -> bit c // (bn/8)
                # of byte c % (bn/8)
                byte = (cols % bn) % mws
                bit = (cols % bn) // mws
                np.bitwise_or.at(
                    mask_blocks[t], (slot_e, rows % bm, byte),
                    (1 << bit).astype(np.int8))
            else:
                mask_blocks[t][slot_e, rows % bm, cols % bn] = 1
            r = res_sel[t]
            cntr = int(r.sum())
            req[t, :cntr] = src[t][r]
            rek[t, :cntr] = dst[t][r]
            rem[t, :cntr] = True
            res_ids[t, :cntr] = np.nonzero(r)[0]
        # padded-degree residual tables (scatter-free partial): one
        # static (dmax, dmax_t) across snapshots via a sizing pass
        dmax = dmax_t = 1
        for t in range(T):
            r = res_sel[t]
            if r.any():
                dmax = max(dmax, int(np.bincount(
                    src[t][r], minlength=N).max()))
                dmax_t = max(dmax_t, int(np.bincount(
                    dst[t][r], minlength=N).max()))
        if pin is not None and pin.get("dmax") is not None:
            if dmax > pin["dmax"] or dmax_t > pin["dmax_t"]:
                raise ValueError(
                    f"residual degree ({dmax},{dmax_t}) exceeds pinned "
                    f"({pin['dmax']},{pin['dmax_t']})")
            dmax, dmax_t = pin["dmax"], pin["dmax_t"]
        build_pad = padded_residual
        if pin is not None and pin.get("padded") is not None:
            build_pad = pin["padded"]
        elif build_pad is None:
            # hub guard (ADVICE r3): a single high-degree off-band node
            # makes the [N, dmax] tables N*hub_degree entries for an
            # Er-sized edge set. The COO path pays ~20 ns per serialized
            # scatter update (~50 vector-elements of work per edge), so
            # padded wins until its table is ~64x the edge count — a
            # Poisson-tail dmax on a hub-free graph (N*dmax ~ 10*Er at
            # the 131K bench) stays padded, a true hub falls back
            build_pad = N * max(dmax, dmax_t) <= 64 * Er
        pads_stacked = res_bid = cpad_stacked = None
        if build_pad:
            pads = [pad_residual_edges(req[t], rek[t], rem[t], N,
                                       dmax=dmax, dmax_t=dmax_t,
                                       edge_ids=res_ids[t])
                    for t in range(T)]
            pads_stacked = tuple(
                jnp.asarray(np.stack([p[i] for p in pads]))
                for i in range(5))
            res_bid = jnp.asarray(np.stack([p[5] for p in pads]))
            # degree-bucketed compact tables: caps from the pooled
            # degree histogram, dims maxed across snapshots
            if pin is not None and pin.get("caps") is not None:
                caps = list(pin["caps"])
            else:
                pooled = np.concatenate([
                    np.bincount(req[t][rem[t]], minlength=N)
                    for t in range(T)])
                caps = _bucket_caps(pooled)
            if pin is not None and pin.get("cdims") is not None:
                dims = [tuple(d) for d in pin["cdims"]]
            else:
                dims = None
                for t in range(T):
                    bks, _ = compact_padded_residual(
                        req[t], rek[t], rem[t], N, caps=caps)
                    dt = [(b[0].shape[0], b[3].shape[0], b[4].shape[1])
                          for b in bks]
                    dims = dt if dims is None else [
                        tuple(max(a, c) for a, c in zip(x, y))
                        for x, y in zip(dims, dt)]
            cpads = [compact_padded_residual(
                req[t], rek[t], rem[t], N, caps=caps, dims=dims,
                edge_ids=res_ids[t])[0]
                for t in range(T)]
            cpad_stacked = tuple(
                tuple(jnp.asarray(np.stack([cpads[t][b][i]
                                            for t in range(T)]))
                      for i in range(7))
                for b in range(len(caps)))
            cbid_stacked = tuple(
                jnp.asarray(np.stack([cpads[t][b][7]
                                      for t in range(T)]))
                for b in range(len(caps)))
        else:
            cbid_stacked = None
        return dataclasses.replace(
            self,
            hyb_mask_blocks=jnp.asarray(mask_blocks),
            hyb_plan=(jnp.asarray(jl), jnp.asarray(jc), jnp.asarray(js)),
            hyb_plan_t=(jnp.asarray(il), jnp.asarray(ic),
                        jnp.asarray(isl)),
            hyb_res=(jnp.asarray(req), jnp.asarray(rek),
                     jnp.asarray(rem)),
            hyb_res_pad=pads_stacked,
            hyb_res_cpad=cpad_stacked,
            hyb_res_cbid=cbid_stacked,
            hyb_band_slot=jnp.asarray(band_slot),
            hyb_res_bid=res_bid)


def _ring_flash_structs(eq_t, ek_t, em_t, N, G, Bp,
                        block_m=None, block_n=None, dims=None,
                        es_t=None, dims_c=None):
    """Host-side flash-local ring structures (with_ring_plan docstring):
    per (t, shard) compact occupied-block structure for the diagonal
    bucket (shard-local coordinates; ek already localized by
    make_boundary_plan) + per (t, gq, gk!=gq) rectangular padded-degree
    tables whose keys are positions into shard gk's boundary
    compaction. All dims static via a sizing pass.

    With ``es_t`` (per-snapshot bucket provenance, original edge ids,
    -1 for self loops), two bias-provenance arrays are appended for the
    BIASED flash-local ring (round 5): the diag tuple gains
    ``eslot i32[T, G, Ep]`` (each diagonal-bucket entry's compact block
    slot, -1 invalid) and the off tuple gains
    ``obid i32[T, G, G, per, dmax]`` (each padded table slot's original
    edge id, -1 padding)."""
    per = N // G
    T = len(eq_t)
    bm = block_m or min(512, -(-per // 8) * 8)
    bn = block_n or min(1024, -(-per // 128) * 128)
    Np = -(-per // max(bm, bn)) * max(bm, bn)
    n_i, n_j = Np // bm, Np // bn

    occs = {}
    S_l = W_l = Wt_l = dmax = dmax_t = 1
    for t in range(T):
        eqt, ekt, emt = (np.asarray(a) for a in
                         (eq_t[t], ek_t[t], em_t[t]))
        for g in range(G):
            m = emt[g, g]
            qloc = eqt[g, g][m] - g * per
            kloc = ekt[g, g][m]
            occ = np.zeros((n_i, n_j), bool)
            occ[qloc // bm, kloc // bn] = True
            occs[(t, g)] = occ
            S_l = max(S_l, int(occ.sum()))
            W_l = max(W_l, int(occ.sum(axis=1).max(initial=0)))
            Wt_l = max(Wt_l, int(occ.sum(axis=0).max(initial=0)))
            for gk in range(G):
                if gk == g:
                    continue
                mo = emt[g, gk]
                c1 = np.bincount(eqt[g, gk][mo] - g * per,
                                 minlength=per)
                c2 = np.bincount(ekt[g, gk][mo], minlength=Bp)
                dmax = max(dmax, int(c1.max(initial=0)))
                dmax_t = max(dmax_t, int(c2.max(initial=0)))
    if dims is not None:
        got = (S_l, W_l, Wt_l, dmax, dmax_t)
        if any(a > b for a, b in zip(got, dims)):
            raise ValueError(
                f"flash-local structure {got} exceeds pinned {dims}")
        S_l, W_l, Wt_l, dmax, dmax_t = dims

    dmask = np.zeros((T, G, S_l, bm, bn), np.int8)
    djl = np.zeros((T, G, n_i, W_l), np.int32)
    djc = np.zeros((T, G, n_i), np.int32)
    djs = np.zeros((T, G, n_i, W_l), np.int32)
    dil = np.zeros((T, G, n_j, Wt_l), np.int32)
    dic = np.zeros((T, G, n_j), np.int32)
    dis = np.zeros((T, G, n_j, Wt_l), np.int32)
    onbr = np.zeros((T, G, G, per, dmax), np.int32)
    onval = np.zeros((T, G, G, per, dmax), bool)
    oinc = np.zeros((T, G, G, Bp, dmax_t), np.int32)
    oincs = np.zeros((T, G, G, Bp, dmax_t), np.int32)
    oival = np.zeros((T, G, G, Bp, dmax_t), bool)
    Ep = np.asarray(eq_t[0]).shape[-1]
    deslot = np.full((T, G, Ep), -1, np.int32)
    obid = np.full((T, G, G, per, dmax), -1, np.int32)
    for t in range(T):
        eqt, ekt, emt = (np.asarray(a) for a in
                         (eq_t[t], ek_t[t], em_t[t]))
        est = None if es_t is None else np.asarray(es_t[t])
        for g in range(G):
            occ = occs[(t, g)]
            slot_flat = np.cumsum(occ.reshape(-1)).astype(np.int32) - 1
            djl[t, g], djc[t, g] = _rows_plan(occ, W_l)
            dil[t, g], dic[t, g] = _rows_plan(occ.T, Wt_l)
            djs[t, g] = np.clip(
                slot_flat[np.arange(n_i)[:, None] * n_j + djl[t, g]],
                0, S_l - 1)
            dis[t, g] = np.clip(
                slot_flat[dil[t, g] * n_j + np.arange(n_j)[:, None]],
                0, S_l - 1)
            m = emt[g, g]
            qloc = eqt[g, g][m] - g * per
            kloc = ekt[g, g][m]
            slot_e = slot_flat[(qloc // bm) * n_j + kloc // bn]
            dmask[t, g][slot_e, qloc % bm, kloc % bn] = 1
            deslot[t, g][m] = slot_e
            for gk in range(G):
                if gk == g:
                    continue
                mo = emt[g, gk]
                packed = pad_bipartite_edges(
                    eqt[g, gk] - g * per, ekt[g, gk], mo, per, Bp,
                    dmax=dmax, dmax_t=dmax_t,
                    edge_ids=None if est is None else est[g, gk])
                if est is None:
                    nb, nv, ic_, is_, iv = packed
                else:
                    nb, nv, ic_, is_, iv, bd = packed
                    obid[t, g, gk] = bd
                onbr[t, g, gk], onval[t, g, gk] = nb, nv
                oinc[t, g, gk], oincs[t, g, gk] = ic_, is_
                oival[t, g, gk] = iv
    diag = tuple(jnp.asarray(a)
                 for a in (dmask, djl, djc, djs, dil, dic, dis,
                           deslot))
    off = tuple(jnp.asarray(a)
                for a in (onbr, onval, oinc, oincs, oival, obid))

    # compact bipartite structures for the UNBIASED boundary folds
    # (round 5): the padded [per, dmax] tables pay per*dmax serialized
    # gather indices per hop for edge sets ~25x smaller at scale —
    # degree-bucketed query compaction brings it to ~1.5x the edges.
    # Caps shared across (t, gq, gk) so the per-bucket dims pin.
    if dims_c == "skip":
        return diag, off, None
    pools = []
    for t in range(T):
        eqt, emt = np.asarray(eq_t[t]), np.asarray(em_t[t])
        for g in range(G):
            for gk in range(G):
                if gk == g:
                    continue
                mo = emt[g, gk]
                pools.append(np.bincount(eqt[g, gk][mo] - g * per,
                                         minlength=per))
    if dims_c is not None:
        caps_c, cdims = dims_c
        caps_c = list(caps_c)
        cdims = [tuple(d) for d in cdims]
    else:
        caps_c = _bucket_caps(np.concatenate(pools)) if pools else [1]
        cdims = None
        for t in range(T):
            eqt, ekt, emt = (np.asarray(a) for a in
                             (eq_t[t], ek_t[t], em_t[t]))
            for g in range(G):
                for gk in range(G):
                    if gk == g:
                        continue
                    bks, _ = compact_bipartite_edges(
                        eqt[g, gk] - g * per, ekt[g, gk], emt[g, gk],
                        per, Bp, caps=caps_c)
                    dt_ = [(b[0].shape[0], b[3].shape[1])
                           for b in bks]
                    cdims = dt_ if cdims is None else [
                        tuple(max(a, c) for a, c in zip(x, y))
                        for x, y in zip(cdims, dt_)]
        if cdims is None:
            cdims = [(1, 1) for _ in caps_c]
    oc = [(np.full((T, G, G, na), per, np.int32),
           np.zeros((T, G, G, na, cap), np.int32),
           np.zeros((T, G, G, na, cap), bool),
           np.zeros((T, G, G, Bp, dt_), np.int32),
           np.zeros((T, G, G, Bp, dt_), np.int32),
           np.zeros((T, G, G, Bp, dt_), bool))
          for cap, (na, dt_) in zip(caps_c, cdims)]
    for t in range(T):
        eqt, ekt, emt = (np.asarray(a) for a in
                         (eq_t[t], ek_t[t], em_t[t]))
        for g in range(G):
            for gk in range(G):
                if gk == g:
                    continue
                bks, _ = compact_bipartite_edges(
                    eqt[g, gk] - g * per, ekt[g, gk], emt[g, gk],
                    per, Bp, caps=caps_c, dims=cdims)
                for b, bk in enumerate(bks):
                    for i in range(6):
                        a = np.asarray(bk[i])
                        oc[b][i][t, g, gk, :a.shape[0]] = a
    off_c = tuple(tuple(jnp.asarray(a) for a in b) for b in oc)
    return diag, off, off_c


def hybrid_plan_dims(seq: SnapshotSequence) -> dict:
    """Extract a hybrid plan's STATIC dims as a ``pin`` dict (see
    `SnapshotSequence.with_hybrid_plan`). Merge dicts from several
    sequences with `merge_hybrid_dims` to build stackable plans."""
    if seq.hyb_mask_blocks is None:
        raise ValueError("sequence has no hybrid plan")
    mb = seq.hyb_mask_blocks
    BM = mb.shape[2]
    n_i = seq.hyb_plan[1].shape[1]
    n_j = seq.hyb_plan_t[1].shape[1]
    BN = (n_i * BM) // n_j
    d = dict(block_m=BM, block_n=BN, pack=mb.shape[3] * 8 == BN,
             S=mb.shape[1], Wj=seq.hyb_plan[0].shape[2],
             Wi=seq.hyb_plan_t[0].shape[2],
             Er=seq.hyb_res[0].shape[1],
             padded=seq.hyb_res_pad is not None,
             dmax=1, dmax_t=1, caps=None, cdims=None)
    if seq.hyb_res_pad is not None:
        d["dmax"] = seq.hyb_res_pad[0].shape[2]
        d["dmax_t"] = seq.hyb_res_pad[2].shape[2]
    if seq.hyb_res_cpad is not None:
        d["caps"] = [int(b[1].shape[2]) for b in seq.hyb_res_cpad]
        d["cdims"] = [(int(b[0].shape[1]), int(b[3].shape[1]),
                       int(b[4].shape[2])) for b in seq.hyb_res_cpad]
    return d


def ring_plan_dims(seq: SnapshotSequence) -> dict:
    """Extract a ring plan's static dims as a ``pin`` dict for
    `with_ring_plan(pin=...)`. Merge with `merge_ring_dims`."""
    if seq.ring_eq is None:
        raise ValueError("sequence has no ring plan")
    d = dict(Ep=int(seq.ring_eq.shape[-1]), Bp=None, lf=None)
    if seq.ring_bnd_idx is not None:
        d["Bp"] = int(seq.ring_bnd_idx.shape[-1])
    if seq.ring_flash_diag is not None:
        mask = seq.ring_flash_diag[0]        # [T, G, S, BM, BN]
        d["lf"] = dict(
            block_m=int(mask.shape[3]), block_n=int(mask.shape[4]),
            S=int(mask.shape[2]),
            W=int(seq.ring_flash_diag[1].shape[3]),
            Wt=int(seq.ring_flash_diag[4].shape[3]),
            dmax=int(seq.ring_flash_off[0].shape[-1]),
            dmax_t=int(seq.ring_flash_off[2].shape[-1]),
            caps_c=None, cdims_c=None)
        if seq.ring_flash_off_c is not None:
            d["lf"]["caps_c"] = [int(b[1].shape[-1])
                                 for b in seq.ring_flash_off_c]
            d["lf"]["cdims_c"] = [(int(b[0].shape[-1]),
                                   int(b[3].shape[-1]))
                                  for b in seq.ring_flash_off_c]
    return d


def merge_ring_dims(dims: Sequence[dict]) -> dict:
    """Elementwise max of `ring_plan_dims` dicts; the flash-local
    structures merge only when every sequence has them with one block
    geometry (else they are dropped and the fold ring is used)."""
    out = dict(dims[0])
    out["lf"] = dict(out["lf"]) if out["lf"] else None
    for d in dims[1:]:
        out["Ep"] = max(out["Ep"], d["Ep"])
        if (out["Bp"] is None) != (d["Bp"] is None):
            raise ValueError("mixed boundary/non-boundary plans")
        if out["Bp"] is not None:
            out["Bp"] = max(out["Bp"], d["Bp"])
        if out["lf"] is None or d["lf"] is None:
            out["lf"] = None
        elif (out["lf"]["block_m"], out["lf"]["block_n"]) != \
                (d["lf"]["block_m"], d["lf"]["block_n"]):
            out["lf"] = None
        else:
            for k in ("S", "W", "Wt", "dmax", "dmax_t"):
                out["lf"][k] = max(out["lf"][k], d["lf"][k])
            a, b = out["lf"].get("caps_c"), d["lf"].get("caps_c")
            if a is None or b is None or list(a) != list(b):
                # mixed compact caps: keep flash-local, drop the
                # compact fold tables (model falls back to padded)
                out["lf"]["caps_c"] = out["lf"]["cdims_c"] = None
            else:
                out["lf"]["cdims_c"] = [
                    tuple(max(x, y) for x, y in zip(p_, q_))
                    for p_, q_ in zip(out["lf"]["cdims_c"],
                                      d["lf"]["cdims_c"])]
    return out


def attach_hybrid_plans(seqs: Sequence[SnapshotSequence],
                        pin: Optional[dict] = None, **plan_kwargs):
    """Attach hybrid plans to several sequences with SHARED static dims
    so they stack into one batch pytree. Without ``pin``: three host
    passes — per-sequence plans discover the band dims and pool the
    residual degree histogram for shared compact caps, a re-plan with
    those caps yields mergeable dims, and the final pass pins
    everything. Returns (planned list, pin dict) — reuse the pin for
    later sequences (e.g. a Predictor bucket or an export artifact)."""
    if pin is not None:
        kw = {k: v for k, v in plan_kwargs.items()
              if k not in ("block_m", "block_n", "pack")}
        return [s.with_hybrid_plan(pin=pin, **kw) for s in seqs], pin
    planned = [s.with_hybrid_plan(**plan_kwargs) for s in seqs]
    dims0 = [hybrid_plan_dims(s) for s in planned]
    all_padded = all(d["padded"] for d in dims0)
    caps = None
    if all_padded:
        pools = []
        for s in planned:
            req = np.asarray(s.hyb_res[0])
            rem = np.asarray(s.hyb_res[2])
            for t in range(req.shape[0]):
                pools.append(np.bincount(req[t][rem[t]],
                                         minlength=s.max_nodes))
        caps = _bucket_caps(np.concatenate(pools))
    kw = {k: v for k, v in plan_kwargs.items()
          if k not in ("block_m", "block_n", "pack")}
    pin1 = {"caps": caps, "padded": all_padded,
            "block_m": dims0[0]["block_m"],
            "block_n": dims0[0]["block_n"], "pack": dims0[0]["pack"]}
    replanned = [s.with_hybrid_plan(pin=pin1, **kw) for s in seqs]
    pin = merge_hybrid_dims([hybrid_plan_dims(s) for s in replanned])
    return [s.with_hybrid_plan(pin=pin, **kw) for s in seqs], pin


def merge_hybrid_dims(dims: Sequence[dict]) -> dict:
    """Elementwise max of `hybrid_plan_dims` dicts (same block geometry
    and caps required — the loader fixes caps across its bucket before
    calling this)."""
    out = dict(dims[0])
    for d in dims[1:]:
        if (d["block_m"], d["block_n"], d["pack"]) != \
                (out["block_m"], out["block_n"], out["pack"]):
            raise ValueError("mixed block geometries cannot merge")
        if (d["caps"] is None) != (out["caps"] is None) or \
                (d["caps"] is not None and
                 list(d["caps"]) != list(out["caps"])):
            raise ValueError("mixed compact caps cannot merge — "
                             "re-plan with shared caps")
        out["padded"] = out["padded"] and d["padded"]
        for k in ("S", "Wj", "Wi", "Er", "dmax", "dmax_t"):
            out[k] = max(out[k], d[k])
        if out["cdims"] is not None:
            out["cdims"] = [
                tuple(max(a, b) for a, b in zip(x, y))
                for x, y in zip(out["cdims"], d["cdims"])]
    return out


def _bucket_caps(counts: np.ndarray, max_buckets: int = 3):
    """Pick degree caps c1 < c2 < ... <= dmax minimizing the padded
    table size sum_b rows_b * cap_b over queries bucketed by degree
    (small DP over the degree histogram). `counts` is the per-node
    degree array; returns the cap list (ascending)."""
    degs = counts[counts > 0]
    if degs.size == 0:
        return [1]
    hist = np.bincount(degs)                 # hist[d] = #rows of deg d
    dmax = len(hist) - 1
    cands = np.nonzero(hist)[0]              # only present degrees
    # cost of one bucket covering degrees (lo, hi]: rows * hi
    nrows = np.cumsum(hist)

    def rows_between(lo, hi):
        return nrows[hi] - (nrows[lo] if lo > 0 else 0)

    best = {0: (0.0, [])}                    # by upper degree covered
    for _ in range(max_buckets):
        nxt = {}
        for lo, (cost, caps) in best.items():
            for hi in cands[cands > lo]:
                c = cost + rows_between(lo, hi) * hi
                if hi not in nxt or c < nxt[hi][0]:
                    nxt[hi] = (c, caps + [int(hi)])
        for hi, v in nxt.items():
            if hi not in best or v[0] < best[hi][0]:
                best[hi] = v
    return best[dmax][1] if dmax in best else [int(dmax)]


def compact_padded_residual(eq: np.ndarray, ek: np.ndarray,
                            em: np.ndarray, num_nodes: int,
                            max_buckets: int = 3,
                            caps: Optional[list] = None,
                            dims: Optional[list] = None,
                            edge_ids: Optional[np.ndarray] = None):
    """Host-side: COO residual edges -> degree-bucketed COMPACT padded
    tables for `ops.sparse.edge_attention_partial_padded_compact`.

    The plain [N, dmax] layout pays one serialized gather index per
    TABLE SLOT (~20-30 ns each on TPU); with residual degrees
    Poisson-tailed the padding is ~9x the edge count at the 131K
    bench. Bucketing queries by degree (caps from a small DP) and
    compacting rows to ACTIVE queries/keys brings gather work to
    ~1.5x the edge count. Buckets partition the QUERY set, so each is
    an exact disjoint partial of the residual softmax.

    Returns a list of per-bucket tuples
      (qid i32[Na], nbr i32[Na, cap], nval, kid i32[Nk],
       inc i32[Nk, dt], inc_slot, ival)
    with nbr indexing the bucket's compact key rows and inc its compact
    query rows. ``caps``/``dims`` pin static sizes across snapshots
    (dims = per-bucket (Na, Nk, dt) triples). With ``edge_ids``
    (aligned with ``eq``), each tuple gains an 8th array
    ``bid i32[Na, cap]`` carrying the slot's original edge id (-1 on
    padding) — the bias provenance for the compact biased residual."""
    eq = np.asarray(eq)
    ek = np.asarray(ek)
    em = np.asarray(em).astype(bool)
    vq, vk = eq[em], ek[em]
    vid = None if edge_ids is None else np.asarray(edge_ids)[em]
    counts = np.bincount(vq, minlength=num_nodes)
    if caps is None:
        caps = _bucket_caps(counts, max_buckets)
    elif counts.max(initial=0) > caps[-1]:
        raise ValueError(
            f"residual query degree {int(counts.max())} exceeds the "
            f"largest bucket cap {caps[-1]} — a query would silently "
            "drop edges; recompute caps over the full dataset")
    buckets = []
    lo = 0
    for b, cap in enumerate(caps):
        sel_q = (counts > lo) & (counts <= cap)      # per-node
        lo = cap
        qid = np.nonzero(sel_q)[0].astype(np.int32)
        e_sel = sel_q[vq]
        bq, bk = vq[e_sel], vk[e_sel]
        kid = np.unique(bk).astype(np.int32)
        q_pos = np.full(num_nodes, -1, np.int64)
        q_pos[qid] = np.arange(len(qid))
        k_pos = np.full(num_nodes, -1, np.int64)
        k_pos[kid] = np.arange(len(kid))
        if dims is not None:
            Na, Nk, dt = dims[b]
            if len(qid) > Na or len(kid) > Nk:
                raise ValueError("compact bucket exceeds pinned dims")
        else:
            Na, Nk, dt = len(qid), len(kid), None
        packed = pad_bipartite_edges(
            q_pos[bq], k_pos[bk], np.ones(len(bq), bool),
            max(Na, 1), max(Nk, 1), dmax=cap, dmax_t=dt,
            edge_ids=None if vid is None else vid[e_sel])
        if vid is None:
            nbr, nval, inc, inc_slot, ival = packed
        else:
            nbr, nval, inc, inc_slot, ival, bbid = packed
        # pad row counts to the pinned statics (sentinel qid/kid =
        # num_nodes -> dropped by the runtime scatter / masked rows)
        def _pad_rows(a, n, fill=0):
            if a.shape[0] >= n:
                return a
            pad = np.full((n - a.shape[0],) + a.shape[1:], fill,
                          a.dtype)
            return np.concatenate([a, pad])
        Na = max(Na, 1)
        Nk = max(Nk, 1)
        qid_p = _pad_rows(qid, Na, num_nodes)
        kid_p = _pad_rows(kid, Nk, num_nodes)
        tup = (qid_p.astype(np.int32),
               _pad_rows(nbr, Na), _pad_rows(nval, Na, False),
               kid_p.astype(np.int32),
               _pad_rows(inc, Nk), _pad_rows(inc_slot, Nk),
               _pad_rows(ival, Nk, False))
        if vid is not None:
            tup = tup + (_pad_rows(bbid, Na, -1),)
        buckets.append(tup)
    return buckets, caps


def compact_bipartite_edges(eq: np.ndarray, ek: np.ndarray,
                            em: np.ndarray, n_q: int, n_k: int,
                            caps: Optional[list] = None,
                            dims: Optional[list] = None,
                            max_buckets: int = 3):
    """Degree-bucketed COMPACT bipartite tables (round 5): the
    bipartite analog of `compact_padded_residual` for the ring's
    boundary hop folds. `pad_bipartite_edges`' [n_q, dmax] layout pays
    n_q * dmax serialized gather indices for an edge set that can be
    1000x smaller (at a 131K shard: ~390K table slots per hop for
    ~15K cross edges); bucketing queries by degree and compacting rows
    to ACTIVE queries brings gather work to ~1.5x the edge count.
    Keys stay uncompacted (they index the circulating boundary
    compaction [n_k], already small).

    Returns (buckets, caps): per-bucket 6-tuples
      (qid i32[Na], nbr i32[Na, cap], nval, inc i32[n_k, dt],
       inc_slot, ival)
    with nbr indexing [0, n_k) and inc indexing the bucket's COMPACT
    query rows. ``caps``/``dims`` (per-bucket (Na, dt) pairs) pin
    static sizes across snapshots/shards; sentinel qid rows = n_q."""
    eq = np.asarray(eq)
    ek = np.asarray(ek)
    em = np.asarray(em).astype(bool)
    vq, vk = eq[em], ek[em]
    counts = np.bincount(vq, minlength=n_q)
    if caps is None:
        caps = _bucket_caps(counts, max_buckets)
    elif counts.max(initial=0) > caps[-1]:
        raise ValueError(
            f"bipartite query degree {int(counts.max())} exceeds the "
            f"largest bucket cap {caps[-1]}")
    buckets = []
    lo = 0
    for b, cap in enumerate(caps):
        sel_q = (counts > lo) & (counts <= cap)
        lo = cap
        qid = np.nonzero(sel_q)[0].astype(np.int32)
        e_sel = sel_q[vq]
        bq, bk = vq[e_sel], vk[e_sel]
        q_pos = np.full(n_q, -1, np.int64)
        q_pos[qid] = np.arange(len(qid))
        if dims is not None:
            Na, dt = dims[b]
            if len(qid) > Na:
                raise ValueError("compact bipartite bucket exceeds "
                                 "pinned dims")
        else:
            Na, dt = len(qid), None
        nbr, nval, inc, inc_slot, ival = pad_bipartite_edges(
            q_pos[bq], bk, np.ones(len(bq), bool),
            max(Na, 1), max(n_k, 1), dmax=cap, dmax_t=dt)

        def _pad_rows_(a, n, fill=0):
            if a.shape[0] >= n:
                return a
            pad = np.full((n - a.shape[0],) + a.shape[1:], fill,
                          a.dtype)
            return np.concatenate([a, pad])
        Na = max(Na, 1)
        buckets.append((_pad_rows_(qid, Na, n_q).astype(np.int32),
                        _pad_rows_(nbr, Na),
                        _pad_rows_(nval, Na, False),
                        inc, inc_slot, ival))
    return buckets, caps


def _rows_plan(occ_mat: np.ndarray, W: int):
    """Host-side compacted walk plan from an occupancy matrix: for each
    row, the occupied column indices (padded by repeating the last — the
    pipeline's same-index dedup then skips the DMA) and the count."""
    R = occ_mat.shape[0]
    cnt = occ_mat.sum(axis=1).astype(np.int32)
    lst = np.zeros((R, W), np.int32)
    for r in range(R):
        idx = np.nonzero(occ_mat[r])[0].astype(np.int32)
        if idx.size == 0:
            continue
        take = idx[:W]
        lst[r, :take.size] = take
        lst[r, take.size:] = take[-1]
    return lst, np.minimum(cnt, W)


def pad_bipartite_edges(eq: np.ndarray, ek: np.ndarray, em: np.ndarray,
                        n_q: int, n_k: int,
                        dmax: Optional[int] = None,
                        dmax_t: Optional[int] = None,
                        edge_ids: Optional[np.ndarray] = None):
    """Rectangular variant of `pad_residual_edges`: queries index a
    [n_q]-row table, keys a [n_k]-row one (the ring's boundary
    compaction is shorter than the query shard). Returns
    (nbr i32[n_q, dmax], nval, inc i32[n_k, dmax_t], inc_slot, ival)
    for `ops.sparse._padded_partial` with k/v of length n_k.

    With ``edge_ids`` (aligned with ``eq``), a sixth array
    i32[n_q, dmax] carrying each slot's original edge id (-1 padding)
    is appended — the bias provenance of the compact biased residual."""
    eq = np.asarray(eq)
    ek = np.asarray(ek)
    em = np.asarray(em).astype(bool)
    vq, vk = eq[em], ek[em]
    vid = None if edge_ids is None else np.asarray(edge_ids)[em]
    order = np.argsort(vq, kind="stable")
    sq, sk = vq[order], vk[order]
    if vid is not None:
        vid = vid[order]
    counts = np.bincount(sq, minlength=n_q)
    if dmax is None:
        dmax = max(1, int(counts.max(initial=0)))
    elif counts.max(initial=0) > dmax:
        raise ValueError(f"query degree {int(counts.max())} > {dmax}")
    starts = np.concatenate([[0], np.cumsum(counts)[:-1]])
    pos = np.arange(len(sq)) - starts[sq]
    nbr = np.zeros((n_q, dmax), np.int32)
    nval = np.zeros((n_q, dmax), bool)
    nbr[sq, pos] = sk
    nval[sq, pos] = True
    order2 = np.argsort(sk, kind="stable")
    tq, tk, tslot = sq[order2], sk[order2], pos[order2]
    counts2 = np.bincount(tk, minlength=n_k)
    if dmax_t is None:
        dmax_t = max(1, int(counts2.max(initial=0)))
    elif counts2.max(initial=0) > dmax_t:
        raise ValueError(f"key degree {int(counts2.max())} > {dmax_t}")
    starts2 = np.concatenate([[0], np.cumsum(counts2)[:-1]])
    pos2 = np.arange(len(tk)) - starts2[tk]
    inc = np.zeros((n_k, dmax_t), np.int32)
    inc_slot = np.zeros((n_k, dmax_t), np.int32)
    ival = np.zeros((n_k, dmax_t), bool)
    inc[tk, pos2] = tq
    inc_slot[tk, pos2] = tslot
    ival[tk, pos2] = True
    if vid is not None:
        bid = np.full((n_q, dmax), -1, np.int32)
        bid[sq, pos] = vid
        return nbr, nval, inc, inc_slot, ival, bid
    return nbr, nval, inc, inc_slot, ival


def pad_residual_edges(eq: np.ndarray, ek: np.ndarray, em: np.ndarray,
                       num_nodes: int, dmax: Optional[int] = None,
                       dmax_t: Optional[int] = None,
                       edge_ids: Optional[np.ndarray] = None):
    """Host-side: COO edges -> padded-degree tables for the scatter-free
    residual partial (`ops.sparse.edge_attention_partial_padded`).

    Returns (nbr i32[N, dmax], nval bool, inc i32[N, dmax_t],
    inc_slot i32[N, dmax_t], ival bool): nbr lists each query's key
    nodes; inc lists each key's incident *query* nodes, and inc_slot
    that edge's slot in the query table (so a dropout keep mask drawn
    in the query layout is readable from the key walk). Padded slots
    point at node 0 with valid=False.

    With ``edge_ids`` (ints aligned with ``eq``), a sixth array
    i32[N, dmax] is appended carrying each slot's original edge id
    (-1 on padding) — the provenance the biased hybrid backend gathers
    per-edge bias values through."""
    eq = np.asarray(eq)
    ek = np.asarray(ek)
    em = np.asarray(em).astype(bool)
    vq, vk = eq[em], ek[em]
    vid = None if edge_ids is None else np.asarray(edge_ids)[em]
    order = np.argsort(vq, kind="stable")
    sq, sk = vq[order], vk[order]
    if vid is not None:
        vid = vid[order]
    counts = np.bincount(sq, minlength=num_nodes)
    if dmax is None:
        dmax = max(1, int(counts.max(initial=0)))
    elif counts.max(initial=0) > dmax:
        raise ValueError(
            f"query {int(np.argmax(counts))} has {int(counts.max())} "
            f"residual edges > dmax={dmax}")
    starts = np.concatenate([[0], np.cumsum(counts)[:-1]])
    pos = np.arange(len(sq)) - starts[sq]
    nbr = np.zeros((num_nodes, dmax), np.int32)
    nval = np.zeros((num_nodes, dmax), bool)
    nbr[sq, pos] = sk
    nval[sq, pos] = True
    # transposed table, carrying each edge's query-layout slot
    order2 = np.argsort(sk, kind="stable")
    tq, tk, tslot = sq[order2], sk[order2], pos[order2]
    counts2 = np.bincount(tk, minlength=num_nodes)
    if dmax_t is None:
        dmax_t = max(1, int(counts2.max(initial=0)))
    elif counts2.max(initial=0) > dmax_t:
        raise ValueError(
            f"key {int(np.argmax(counts2))} has {int(counts2.max())} "
            f"residual edges > dmax_t={dmax_t}")
    starts2 = np.concatenate([[0], np.cumsum(counts2)[:-1]])
    pos2 = np.arange(len(tk)) - starts2[tk]
    inc = np.zeros((num_nodes, dmax_t), np.int32)
    inc_slot = np.zeros((num_nodes, dmax_t), np.int32)
    ival = np.zeros((num_nodes, dmax_t), bool)
    inc[tk, pos2] = tq
    inc_slot[tk, pos2] = tslot
    ival[tk, pos2] = True
    if vid is not None:
        bid = np.full((num_nodes, dmax), -1, np.int32)
        bid[sq, pos] = vid
        return nbr, nval, inc, inc_slot, ival, bid
    return nbr, nval, inc, inc_slot, ival


# ---------------------------------------------------------------------------
# Host-side builders
# ---------------------------------------------------------------------------

SnapshotLike = Union[Dict[str, Any], Tuple]


def _unpack_snapshot(snap: SnapshotLike):
    """Accept the reference wire formats: dict with keys
    {'x','edge_index','edge_attr','node_ids'[,'timestep']} or tuple
    (x, edge_index, edge_attr, node_ids) — model.py:188-230."""
    if isinstance(snap, dict):
        x = snap["x"]
        edge_index = snap["edge_index"]
        edge_attr = snap.get("edge_attr", None)
        node_ids = snap["node_ids"]
        t = snap.get("timestep", None)
    elif isinstance(snap, (tuple, list)):
        if len(snap) < 4:
            raise ValueError(
                f"snapshot tuple needs >=4 elements, got {len(snap)}")
        x, edge_index, edge_attr, node_ids = snap[:4]
        t = snap[4] if len(snap) > 4 else None
    else:
        raise ValueError(f"unsupported snapshot type {type(snap)}")
    x = np.asarray(x, dtype=np.float32)
    edge_index = np.asarray(edge_index, dtype=np.int64)
    if edge_index.size == 0:
        edge_index = edge_index.reshape(2, 0)
    if edge_attr is not None:
        edge_attr = np.asarray(edge_attr, dtype=np.float32)
    node_ids = [int(i) for i in node_ids]
    return x, edge_index, edge_attr, node_ids, t


def locality_order(unpacked) -> list:
    """Reverse Cuthill–McKee order of the union graph's node IDs.

    Slot assignment is semantically arbitrary (every slot-space op is
    permutation-equivariant), but it decides *block* structure: RCM
    clusters each node's neighbors into nearby slots, so the flash
    kernel's block-sparsity plans (ops.pallas.flash_geometric) walk far
    fewer occupied [BM, BN] blocks than under sorted-ID slots.

    The BFS runs in the native packer when available (~50x the Python
    fallback at 10K nodes); both produce the identical deterministic
    order (tests/test_native.py)."""
    import collections
    all_ids = sorted({i for (_, _, _, ids, _) in unpacked for i in ids})
    id_arr = np.asarray(all_ids, np.int64)
    srcs, dsts = [], []
    for (xt, ei, ea, ids, tv) in unpacked:
        if ei is None or not np.asarray(ei).size:
            continue
        ids_np = np.asarray(list(ids), np.int64)
        srcs.append(ids_np[np.asarray(ei[0], np.int64)])
        dsts.append(ids_np[np.asarray(ei[1], np.int64)])
    if srcs:
        src = np.searchsorted(id_arr, np.concatenate(srcs))
        dst = np.searchsorted(id_arr, np.concatenate(dsts))
    else:
        src = dst = np.zeros(0, np.int64)

    from .. import native as _native
    try:
        order_idx = _native.rcm_order_native(src, dst, len(id_arr))
    except Exception:
        order_idx = None
    if order_idx is not None:
        return [int(id_arr[i]) for i in order_idx]

    # Python fallback (index space; the semantics oracle)
    n = len(id_arr)
    adjd = [set() for _ in range(n)]
    for a, b in zip(src.tolist(), dst.tolist()):
        if a != b:
            adjd[a].add(b)
            adjd[b].add(a)
    deg = [len(s) for s in adjd]
    visited = [False] * n
    order = []
    for start in sorted(range(n), key=lambda i: (deg[i], i)):
        if visited[start]:
            continue
        visited[start] = True
        queue = collections.deque([start])
        while queue:
            u = queue.popleft()
            order.append(u)
            for w in sorted(adjd[u], key=lambda i: (deg[i], i)):
                if not visited[w]:
                    visited[w] = True
                    queue.append(w)
    return [int(id_arr[i]) for i in order[::-1]]


def build_sequence(
    snapshots: Sequence[SnapshotLike],
    max_nodes: Optional[int] = None,
    max_edges: Optional[int] = None,
    max_time: Optional[int] = None,
    edge_feature_dim: Optional[int] = None,
    use_native: bool = True,
    dense_adj: bool = True,
    reorder: Optional[str] = None,
) -> SnapshotSequence:
    """Convert a ragged snapshot list (reference wire format) into a
    static-shape `SnapshotSequence` (numpy; call `jax.device_put` or let
    jit move it). With ``use_native`` (default) the packing loops run in
    the C++ packer (`tagan_tpu.native`) when the library is available;
    the Python path below is the fallback and semantics oracle.

    ``dense_adj=False`` skips materializing the [T, N, N] adjacency
    (a placeholder [T, 1, 1] is stored) — required for large graphs
    (N >~ 4K), where the flash/csr backends rebuild masks from the edge
    lists and the dense tensor would dominate HBM and host->device
    transfer.

    ``reorder="rcm"`` assigns slots in reverse Cuthill–McKee order of
    the union graph instead of sorted-ID order — numerically identical
    outputs (slot ops are permutation-equivariant), much better block
    sparsity for the flash kernel on graphs with locality.
    """
    T = len(snapshots)
    unpacked = [_unpack_snapshot(s) for s in snapshots]

    orig_order = None
    if reorder is not None:
        if reorder != "rcm":
            raise ValueError(f"unknown reorder {reorder!r} (use 'rcm')")
        order = locality_order(unpacked)
        rank = {nid: r for r, nid in enumerate(order)}
        # remap IDs to their RCM rank; the packers below assign slots in
        # sorted-ID order, which now IS the RCM order. node_ids is
        # rewritten to the original IDs afterwards.
        unpacked = [(xt, ei, ea, [rank[i] for i in ids], tv)
                    for (xt, ei, ea, ids, tv) in unpacked]
        orig_order = np.asarray(order, np.int32)

    def _restore_ids(seq: SnapshotSequence) -> SnapshotSequence:
        if orig_order is None:
            return seq
        ids = np.asarray(seq.node_ids)
        restored = np.where(ids >= 0,
                            orig_order[np.clip(ids, 0, len(orig_order) - 1)],
                            -1).astype(np.int32)
        return dataclasses.replace(seq, node_ids=jnp.asarray(restored))

    if use_native and T > 0:
        from .. import native as _native
        dims = _resolve_dims(unpacked, max_nodes, max_edges, max_time,
                             edge_feature_dim)
        if dims is not None:
            N, Emax, Tmax, Fe = dims
            packed = _native.pack_sequence_native(
                unpacked, N, Emax, Tmax, Fe, dense_adj=dense_adj)
            if packed is not None:
                (x, node_mask, adj, edge_src, edge_dst, edge_mask,
                 edge_attr, times, time_mask, node_ids) = packed
                return _restore_ids(SnapshotSequence(
                    x=jnp.asarray(x), node_mask=jnp.asarray(node_mask),
                    adj=jnp.asarray(adj), edge_src=jnp.asarray(edge_src),
                    edge_dst=jnp.asarray(edge_dst),
                    edge_mask=jnp.asarray(edge_mask),
                    edge_attr=jnp.asarray(edge_attr),
                    times=jnp.asarray(times),
                    time_mask=jnp.asarray(time_mask),
                    node_ids=jnp.asarray(node_ids)))

    all_ids = sorted({i for (_, _, _, ids, _) in unpacked for i in ids})
    id_to_slot = {nid: s for s, nid in enumerate(all_ids)}
    n_unique = len(all_ids)

    N = max_nodes or n_unique
    if n_unique > N:
        raise ValueError(f"sequence has {n_unique} unique nodes > max_nodes={N}")
    Emax = max_edges or max((u[1].shape[1] for u in unpacked), default=1) or 1
    Tmax = max_time or T
    if T > Tmax:
        raise ValueError(f"sequence has {T} steps > max_time={Tmax}")
    F_node = unpacked[0][0].shape[1]
    if edge_feature_dim is None:
        edge_feature_dim = 0
        for (_, _, ea, _, _) in unpacked:
            if ea is not None and ea.ndim == 2:
                edge_feature_dim = ea.shape[1]
                break
    Fe = edge_feature_dim

    x = np.zeros((Tmax, N, F_node), np.float32)
    node_mask = np.zeros((Tmax, N), bool)
    adj = np.zeros((Tmax, N if dense_adj else 1,
                    N if dense_adj else 1), bool)
    edge_src = np.zeros((Tmax, Emax), np.int32)
    edge_dst = np.zeros((Tmax, Emax), np.int32)
    edge_mask = np.zeros((Tmax, Emax), bool)
    edge_attr = np.zeros((Tmax, Emax, Fe), np.float32)
    times = np.zeros((Tmax,), np.float32)
    time_mask = np.zeros((Tmax,), bool)
    node_ids_arr = np.full((N,), -1, np.int32)
    node_ids_arr[:n_unique] = np.asarray(all_ids, np.int32)

    for t, (xt, ei, ea, ids, tv) in enumerate(unpacked):
        slots = np.asarray([id_to_slot[i] for i in ids], np.int32)
        x[t, slots] = xt[: len(ids)]
        node_mask[t, slots] = True
        E = ei.shape[1]
        if E > Emax:
            raise ValueError(f"snapshot {t} has {E} edges > max_edges={Emax}")
        if E > 0:
            # edge endpoints are row indices into the snapshot's x, which
            # correspond to positions in node_ids (reference semantics:
            # edge_index indexes rows of x).
            src = slots[ei[0]]
            dst = slots[ei[1]]
            edge_src[t, :E] = src
            edge_dst[t, :E] = dst
            edge_mask[t, :E] = True
            if dense_adj:
                adj[t, src, dst] = True
            if ea is not None and Fe > 0:
                edge_attr[t, :E, :] = ea[:E, :Fe]
        times[t] = float(tv) if tv is not None else float(t)
        time_mask[t] = True

    return _restore_ids(SnapshotSequence(
        x=jnp.asarray(x), node_mask=jnp.asarray(node_mask),
        adj=jnp.asarray(adj), edge_src=jnp.asarray(edge_src),
        edge_dst=jnp.asarray(edge_dst), edge_mask=jnp.asarray(edge_mask),
        edge_attr=jnp.asarray(edge_attr), times=jnp.asarray(times),
        time_mask=jnp.asarray(time_mask),
        node_ids=jnp.asarray(node_ids_arr)))


def _resolve_dims(unpacked, max_nodes, max_edges, max_time,
                  edge_feature_dim):
    """Resolve padded dims for a sequence (shared by the python and
    native packers). Returns (N, Emax, Tmax, Fe)."""
    all_ids = {i for (_, _, _, ids, _) in unpacked for i in ids}
    n_unique = len(all_ids)
    N = max_nodes or n_unique
    if n_unique > N:
        raise ValueError(
            f"sequence has {n_unique} unique nodes > max_nodes={N}")
    Emax = max_edges or max((u[1].shape[1] for u in unpacked),
                            default=1) or 1
    Tmax = max_time or len(unpacked)
    if len(unpacked) > Tmax:
        raise ValueError(
            f"sequence has {len(unpacked)} steps > max_time={Tmax}")
    if edge_feature_dim is None:
        edge_feature_dim = 0
        for (_, _, ea, _, _) in unpacked:
            if ea is not None and ea.ndim == 2:
                edge_feature_dim = ea.shape[1]
                break
    return N, Emax, Tmax, edge_feature_dim


def batch_sequences(seqs: Sequence[SnapshotSequence]) -> SnapshotSequence:
    """Stack same-shape sequences along a new leading batch axis."""
    return jax.tree_util.tree_map(lambda *xs: jnp.stack(xs, axis=0), *seqs)


def pad_dims_for(
    dataset: Sequence[Sequence[SnapshotLike]],
) -> Tuple[int, int, int, int]:
    """Scan a dataset of ragged sequences and return
    (max_time, max_nodes, max_edges, edge_feature_dim) bucket dims."""
    Tm, Nm, Em, Fe = 1, 1, 1, 0
    for snapshots in dataset:
        Tm = max(Tm, len(snapshots))
        ids = set()
        for s in snapshots:
            _, ei, ea, nid, _ = _unpack_snapshot(s)
            ids.update(nid)
            Em = max(Em, ei.shape[1])
            if ea is not None and ea.ndim == 2:
                Fe = max(Fe, ea.shape[1])
        Nm = max(Nm, len(ids))
    return Tm, Nm, Em, Fe


# ---------------------------------------------------------------------------
# CSR conversion (device-side, sort-based) — feeds the Pallas kernels.
# ---------------------------------------------------------------------------

@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class CSRSnapshots:
    """Per-snapshot CSR with destination-sorted edges.

    The SDDMM/SpMM kernels aggregate *into* destination nodes (attention
    of dst over its in-neighbors, matching dense row=query semantics where
    query i attends over columns j with adj[i, j]=1: here dst=query=i,
    src=key=j, i.e. edges are (i -> j) pairs sorted by query i).

    row_ptr  i32[T, N+1]  CSR offsets over queries
    col      i32[T, E]    key/neighbor slot per edge (sorted by query)
    perm     i32[T, E]    permutation mapping sorted order -> original COO
    edge_mask bool[T, E]
    """
    row_ptr: jax.Array
    col: jax.Array
    perm: jax.Array
    edge_mask: jax.Array


def coo_to_csr(edge_q: jax.Array, edge_k: jax.Array, edge_mask: jax.Array,
               num_nodes: int) -> CSRSnapshots:
    """Sort padded COO edges by query node and build row pointers.

    Works on a [T, E] batch of snapshots (vmapped sort). Padded edges are
    pushed to the end (query index = num_nodes).
    """
    def one(q, k, m):
        E = q.shape[0]
        qkey = jnp.where(m, q, num_nodes)
        order = jnp.argsort(qkey, stable=True)
        q_sorted = qkey[order]
        counts = jnp.zeros((num_nodes + 1,), jnp.int32).at[
            jnp.minimum(q_sorted, num_nodes)].add(
                jnp.where(q_sorted < num_nodes, 1, 0).astype(jnp.int32))
        row_ptr = jnp.concatenate(
            [jnp.zeros((1,), jnp.int32), jnp.cumsum(counts[:num_nodes])])
        return row_ptr, k[order], order.astype(jnp.int32), m[order]

    row_ptr, col, perm, mask = jax.vmap(one)(edge_q, edge_k, edge_mask)
    return CSRSnapshots(row_ptr=row_ptr, col=col, perm=perm, edge_mask=mask)
