"""Flash-local ring: REAL-TPU rate of the shard-local component
(round 5, VERDICT r4 item 3 — round 3's own "done" bar).

The boundary ring's per-shard work is (a) the DIAGONAL bucket — the
shard's local edges, the bulk on a post-RCM graph — and (b) g-1
boundary folds against the circulating compactions. Round 4 wired the
local math through the flash Pallas kernel + scatter-free padded folds
(`dist/edge_partition.py::make_boundary_ring_flash_attention`) but
never measured it on the chip. This bench times exactly that local
component single-chip (communication excluded — ppermute cost is the
separately-accounted ring traffic, `boundary_traffic_report`):

  flash_local   flash_geometric_attention_lse on the diag compact
                structure + `_padded_partial` folds + exact lse merges
  segment_fold  the COO segment-scatter math it replaced
                (`edge_attention_partial` per bucket + merges)

both fwd+bwd (the training path), chained in one jit, at shard sizes
16K and 131K with the same structure as BASELINE config 5 part C
(95% banded local edges, 5% cross-shard spread over g-1 = 7 hops,
boundary compaction beta = 1/3).

    python benchmarks/bench_ring_local.py [quick]
"""
import os as _os, sys as _sys
_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))
import json
import sys
import time

import numpy as np


def _cache():
    import jax
    try:
        jax.config.update("jax_compilation_cache_dir",
                          "/tmp/tagan_jax_cache")
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 5)
    except Exception:
        pass


_cache()

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402


def build_case(N_s, deg, G, seed=0):
    """One shard's local view: banded diag edges + (g-1) incoming hop
    tables against boundary compactions (host-side numpy)."""
    from tagan_tpu.core.graph import pad_bipartite_edges
    rng = np.random.default_rng(seed)
    E_total = N_s * deg
    n_cross = int(E_total * 0.05)
    n_band = E_total - n_cross
    W = max(N_s // 256, 8)
    src = rng.integers(0, N_s, n_band)
    dst = np.clip(src + rng.integers(-W, W + 1, n_band), 0, N_s - 1)
    Bp = N_s // 3                      # part A's measured beta ~ 1/3
    hops = []
    per_hop = max(n_cross // max(G - 1, 1), 1)
    for j in range(G - 1):
        eq = rng.integers(0, N_s, per_hop)
        ek = rng.integers(0, Bp, per_hop)
        hops.append(pad_bipartite_edges(
            eq, ek, np.ones(per_hop, bool), N_s, Bp))
    return (src, dst, W, Bp, hops, n_band, per_hop * (G - 1))


def run_case(N_s, deg, G, H, Dh, quick=False, seed=0):
    from tagan_tpu.ops import sparse as SP
    from tagan_tpu.ops.pallas.flash_geometric import (
        flash_geometric_attention_lse, make_compact_structure_from_edges)
    src, dst, W, Bp, hops, n_band, n_cross = build_case(
        N_s, deg, G, seed)
    E_eff = n_band + n_cross
    BM, BN = (512, 1024) if N_s >= 4096 else (256, 256)
    # host-side occupancy count (the dense mask never exists)
    n_i = -(-N_s // BM) if N_s % max(BM, BN) == 0 else \
        (-(-N_s // max(BM, BN)) * max(BM, BN)) // BM
    Np = -(-N_s // max(BM, BN)) * max(BM, BN)
    n_i, n_j = Np // BM, Np // BN
    occ = np.zeros((n_i, n_j), bool)
    occ[src // BM, dst // BN] = True
    d = np.arange(N_s)
    occ[d // BM, d // BN] = True
    S_slots = max(int(occ.sum()), 1)

    key = jax.random.key(seed + 1)
    q, k, v = jax.random.normal(key, (3, H, N_s, Dh), jnp.float32)
    kb = jax.random.normal(jax.random.key(seed + 2),
                           (G - 1, H, Bp, Dh), jnp.float32)
    vb = jax.random.normal(jax.random.key(seed + 3),
                           (G - 1, H, Bp, Dh), jnp.float32)

    src_j = jnp.asarray(src, jnp.int32)
    dst_j = jnp.asarray(dst, jnp.int32)
    em_j = jnp.ones(src.shape, bool)
    nm_j = jnp.ones((N_s,), bool)
    mask_blocks, cplan, cplan_t = jax.jit(
        lambda a, b, c, d_: make_compact_structure_from_edges(
            a, b, c, d_, N_s, BM, BN, max_slots=S_slots))(
        src_j, dst_j, em_j, nm_j)
    hops_j = [tuple(jnp.asarray(a) for a in hp) for hp in hops]
    ones = jnp.ones((H,), jnp.float32)
    eye = jnp.broadcast_to(jnp.eye(Dh, dtype=jnp.float32), (H, Dh, Dh))

    REPS = 3 if quick else 10

    def timeit(fn, *args):
        # everything rides as jit ARGUMENTS — closed-over arrays become
        # baked constants and overflow the compile relay's request-body
        # limit (HTTP 413)
        jf = jax.jit(fn)
        r = jf(*args)
        float(jnp.sum(r))
        ts = []
        for _ in range(3):
            t0 = time.perf_counter()
            r = jf(*args)
            float(jnp.sum(r))
            ts.append((time.perf_counter() - t0) / REPS * 1e3)
        return float(np.median(ts))

    def flash_local(qkv, mask_blocks, cplan, cplan_t, hops_j, kb, vb):
        def f(c):
            qq, kk, vv = c
            out, lse = flash_geometric_attention_lse(
                qq, kk, vv, mask_blocks, plan=cplan, plan_t=cplan_t,
                block_m=BM, block_n=BN)
            for j, hp in enumerate(hops_j):
                part = SP._padded_partial(
                    "scaled_dot_product", qq, kb[j], vb[j], hp[0],
                    hp[1], hp[2], hp[3], hp[4], None, ones, ones, eye)
                out, lse = SP.merge_attention_partials(
                    [(out, lse), part])
            return jnp.sum(out ** 2)

        def one(c, _):
            g = jax.grad(f)(c)
            return jax.tree_util.tree_map(
                lambda a, b: a + 1e-6 * b, c, g), 0
        c, _ = jax.lax.scan(one, qkv, jnp.arange(REPS))
        return c[0]

    # the segment-fold math the flash-local path replaced: COO partials
    # whose segment_max/segment_sum scatter per edge
    loops = jnp.arange(N_s, dtype=jnp.int32)
    eq_d = jnp.concatenate([src_j, loops])
    ek_d = jnp.concatenate([dst_j, loops])
    em_d = jnp.ones(eq_d.shape, bool)
    hop_coo = []
    for hp in hops:
        nbr, nval = hp[0], hp[1]
        rows, slots = np.nonzero(np.asarray(nval))
        hop_coo.append((jnp.asarray(rows, jnp.int32),
                        jnp.asarray(np.asarray(nbr)[rows, slots],
                                    jnp.int32),
                        jnp.ones(len(rows), bool)))

    def segment_fold(qkv, eq_d, ek_d, em_d, hop_coo, kb, vb):
        def f(c):
            qq, kk, vv = c
            out, lse = SP.edge_attention_partial(
                "scaled_dot_product", qq, kk, vv, eq_d, ek_d, em_d,
                N_s)
            for j, (eqh, ekh, emh) in enumerate(hop_coo):
                part = SP.edge_attention_partial(
                    "scaled_dot_product", qq, kb[j], vb[j], eqh, ekh,
                    emh, N_s)
                out, lse = SP.merge_attention_partials(
                    [(out, lse), part])
            return jnp.sum(out ** 2)

        def one(c, _):
            g = jax.grad(f)(c)
            return jax.tree_util.tree_map(
                lambda a, b: a + 1e-6 * b, c, g), 0
        c, _ = jax.lax.scan(one, qkv, jnp.arange(REPS))
        return c[0]

    fl_ms = timeit(flash_local, (q, k, v), mask_blocks, cplan, cplan_t,
                   hops_j, kb, vb)
    sf_ms = timeit(segment_fold, (q, k, v), eq_d, ek_d, em_d, hop_coo,
                   kb, vb)
    return {
        "shard_nodes": N_s, "deg": deg, "shards_simulated": G,
        "band_width": W, "boundary_Bp": Bp,
        "edges_local": E_eff, "occupied_slots": S_slots,
        "flash_local_ms_per_layerpass": round(fl_ms, 2),
        "segment_fold_ms_per_layerpass": round(sf_ms, 2),
        "flash_local_edges_per_s": round(E_eff / fl_ms * 1e3, 0),
        "segment_fold_edges_per_s": round(E_eff / sf_ms * 1e3, 0),
        "speedup": round(sf_ms / fl_ms, 2),
    }


def main(quick=False):
    H, Dh = 4, 16
    rows = [run_case(16_384, 16, 8, H, Dh, quick=quick, seed=0)]
    if not quick:
        rows.append(run_case(131_072, 16, 8, H, Dh, quick=quick,
                             seed=1))
    out = {
        "what": "flash-local boundary ring, SHARD-LOCAL math on one "
                "real chip (diag compact flash + scatter-free padded "
                "folds vs the COO segment folds it replaced); fwd+bwd",
        "per_edge_reference": "single-chip hybrid at 131K: "
                              "results_partition_hybrid.json",
        "rows": rows,
    }
    print(json.dumps(out))
    path = _os.path.join(_os.path.dirname(_os.path.abspath(__file__)),
                         "results_ring_local.json")
    with open(path, "w") as f:
        json.dump(out, f, indent=1)


if __name__ == "__main__":
    main("quick" in sys.argv[1:])
