"""Hybrid band + residual spatial backend.

The partial-attention merge (flash band with differentiable lse + csr
residual) must equal ONE softmax over the union edge set — the dense
GeometricAttention path is the oracle. Kernels run in interpreter mode
(conftest pins CPU); the real-TPU spot check lives in
benchmarks/bench_partition_stress.py.
"""

import functools

import jax
import jax.flatten_util
import jax.numpy as jnp
import numpy as np
import pytest

import tagan_tpu as tt
from tagan_tpu.ops import sparse as S
from tagan_tpu.ops.pallas import flash_geometric as FG


@pytest.fixture(autouse=True)
def _interpret(monkeypatch):
    import jax.experimental.pallas as pl
    orig = pl.pallas_call
    monkeypatch.setattr(pl, "pallas_call",
                        functools.partial(orig, interpret=True))
    monkeypatch.setattr(FG.pl, "pallas_call",
                        functools.partial(orig, interpret=True))
    yield


def _split_edges(N=96, E=220, seed=5, width=24):
    """Random banded+residual graph: returns (band, residual, union adj
    incl. self loops on live nodes, node_mask)."""
    rng = np.random.default_rng(seed)
    src = rng.integers(0, N, E)
    sel = rng.random(E) < 0.8
    near = np.clip(src + rng.integers(-width, width + 1, E), 0, N - 1)
    far = rng.integers(0, N, E)
    dst = np.where(sel, near, far)
    nm = rng.random(N) < 0.95
    # model invariant (build_sequence): valid edges connect active nodes
    em = (rng.random(E) < 0.9) & nm[src] & nm[dst]
    gap = np.abs(src - dst)
    band = em & (gap <= width)
    res = em & ~band
    adj = np.zeros((N, N), bool)
    adj[src[em], dst[em]] = True
    d = np.arange(N)
    adj[d[nm], d[nm]] = True
    return (src, dst, em, band, res, adj, nm)


def test_partial_plus_merge_equals_union_softmax():
    """csr partials over two disjoint edge subsets merge into exactly
    the one-softmax result over the union (grads included)."""
    N, H, Dh = 60, 2, 8
    src, dst, em, band, res, adj, nm = _split_edges(N=N, E=150, seed=7)
    rng = np.random.default_rng(8)
    q = jnp.asarray(rng.standard_normal((H, N, Dh)), jnp.float32)
    k = jnp.asarray(rng.standard_normal((H, N, Dh)), jnp.float32)
    v = jnp.asarray(rng.standard_normal((H, N, Dh)), jnp.float32)
    eq = jnp.asarray(src, jnp.int32)
    ek = jnp.asarray(dst, jnp.int32)

    def loss_merged(q, k, v):
        p1 = S.edge_attention_partial("scaled_dot_product", q, k, v,
                                      eq, ek, jnp.asarray(band), N)
        p2 = S.edge_attention_partial("scaled_dot_product", q, k, v,
                                      eq, ek, jnp.asarray(res), N)
        out, _ = S.merge_attention_partials([p1, p2])
        return jnp.sum(out ** 2)

    def loss_union(q, k, v):
        out = S.edge_attention("scaled_dot_product", q, k, v, eq, ek,
                               jnp.asarray(em), N)
        return jnp.sum(out ** 2)

    np.testing.assert_allclose(float(loss_merged(q, k, v)),
                               float(loss_union(q, k, v)), rtol=1e-5)
    g1 = jax.grad(loss_merged, argnums=(0, 1, 2))(q, k, v)
    g2 = jax.grad(loss_union, argnums=(0, 1, 2))(q, k, v)
    for a, b in zip(g1, g2):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=2e-4, atol=2e-4)


@pytest.mark.parametrize("metric", ["scaled_dot_product", "euclidean",
                                    "cosine_similarity", "mahalanobis"])
def test_apply_hybrid_matches_dense(metric):
    """apply_hybrid (flash band + csr residual + merge) == the dense
    GeometricAttention on the union adjacency, output and grads."""
    from tagan_tpu.nn import GeometricAttention
    N, BM, BN = 96, 32, 32
    src, dst, em, band, res, adj, nm = _split_edges(N=N, seed=11)
    attn = GeometricAttention(hidden_dim=32, num_heads=2, dropout=0.0,
                              distance_metric=metric,
                              learnable_distance=metric == "mahalanobis")
    params = attn.init(jax.random.key(0))
    rng = np.random.default_rng(12)
    x = jnp.asarray(rng.standard_normal((N, 32)), jnp.float32)

    eqb = jnp.asarray(src, jnp.int32)
    ekb = jnp.asarray(dst, jnp.int32)
    S_slots = FG.occupied_blocks_total(
        _band_adj(src, dst, band, nm, N), BM, BN)
    mask_blocks, cplan, cplan_t = FG.make_compact_structure_from_edges(
        eqb, ekb, jnp.asarray(band), jnp.asarray(nm), N, BM, BN,
        max_slots=S_slots)

    def hyb(pp, xx):
        return attn.apply_hybrid(
            pp, xx, mask_blocks, cplan, cplan_t,
            eqb, ekb, jnp.asarray(res), jnp.asarray(nm),
            block_m=BM, block_n=BN)

    got = hyb(params, x)
    pair = jnp.asarray(nm)[:, None] & jnp.asarray(nm)[None, :]
    want = attn(params, x, jnp.asarray(adj) & pair)
    want = jnp.where(jnp.asarray(nm)[:, None], want, x)
    np.testing.assert_allclose(np.asarray(got)[np.asarray(nm)],
                               np.asarray(want)[np.asarray(nm)],
                               rtol=2e-4, atol=2e-4)
    gh = jax.grad(lambda pp: jnp.sum(hyb(pp, x) ** 2))(params)
    gd = jax.grad(lambda pp: jnp.sum(jnp.where(
        jnp.asarray(nm)[:, None],
        attn(pp, x, jnp.asarray(adj) & pair), x) ** 2))(params)
    flat_h, _ = jax.flatten_util.ravel_pytree(gh)
    flat_d, _ = jax.flatten_util.ravel_pytree(gd)
    np.testing.assert_allclose(np.asarray(flat_h), np.asarray(flat_d),
                               rtol=3e-3, atol=3e-3)


def _band_adj(src, dst, band, nm, N):
    adj = np.zeros((N, N), bool)
    adj[src[band], dst[band]] = True
    d = np.arange(N)
    adj[d[nm], d[nm]] = True
    return adj


def test_with_hybrid_plan_and_model_forward():
    """End-to-end: build_sequence -> with_hybrid_plan -> TAGAN with
    spatial_backend='hybrid' == the same model on the flash backend."""
    rng = np.random.default_rng(21)
    N, T, F = 70, 3, 8
    snaps = []
    for t in range(T):
        E = 160
        src = rng.integers(0, N, E)
        near = np.clip(src + rng.integers(-12, 13, E), 0, N - 1)
        far = rng.integers(0, N, E)
        dst = np.where(rng.random(E) < 0.85, near, far)
        snaps.append({"x": rng.standard_normal((N, F)).astype(np.float32),
                      "edge_index": np.stack([src, dst]),
                      "node_ids": list(range(N)), "timestep": float(t)})
    seq = tt.build_sequence(snaps, max_nodes=N, max_edges=160, max_time=T)
    seq_h = seq.with_hybrid_plan(band_width=12, block_m=32, block_n=32)
    assert seq_h.hyb_mask_blocks is not None
    # residual split actually nonempty and disjoint
    assert bool(seq_h.hyb_res[2].sum()) > 0

    lbl = jnp.asarray(1.0)
    cfgs = [tt.TAGANConfig(hidden_dim=32, num_heads=2, num_layers=2,
                           node_feature_dim=F, output_dim=1,
                           loss_type="bce", dropout=0.0,
                           spatial_backend=b)
            for b in ("hybrid", "flash")]
    models = [tt.TAGAN(c) for c in cfgs]
    params = models[0].init(jax.random.key(3))
    out_h = models[0](params, seq_h, lbl)
    out_f = models[1](params, seq_h, lbl)
    np.testing.assert_allclose(float(out_h.loss), float(out_f.loss),
                               rtol=2e-4)
    np.testing.assert_allclose(np.asarray(out_h.logits),
                               np.asarray(out_f.logits),
                               rtol=2e-3, atol=2e-3)
    # grads flow end-to-end
    g = jax.grad(lambda pp: models[0](pp, seq_h, lbl).loss)(params)
    flat, _ = jax.flatten_util.ravel_pytree(g)
    assert np.isfinite(np.asarray(flat)).all()
    assert float(jnp.sum(jnp.abs(flat))) > 0


def test_hybrid_dropout_trains():
    """Dropout path: in-kernel band dropout + per-edge residual dropout
    produce finite grads and differ from the deterministic output."""
    from tagan_tpu.nn import GeometricAttention
    N, BM, BN = 64, 32, 32
    src, dst, em, band, res, adj, nm = _split_edges(N=N, E=150, seed=31,
                                                    width=16)
    attn = GeometricAttention(hidden_dim=32, num_heads=2, dropout=0.3)
    params = attn.init(jax.random.key(1))
    rng = np.random.default_rng(32)
    x = jnp.asarray(rng.standard_normal((N, 32)), jnp.float32)
    S_slots = FG.occupied_blocks_total(
        _band_adj(src, dst, band, nm, N), BM, BN)
    mask_blocks, cplan, cplan_t = FG.make_compact_structure_from_edges(
        jnp.asarray(src, jnp.int32), jnp.asarray(dst, jnp.int32),
        jnp.asarray(band), jnp.asarray(nm), N, BM, BN,
        max_slots=S_slots)

    def run(rng_key=None):
        return attn.apply_hybrid(
            params, x, mask_blocks, cplan, cplan_t,
            jnp.asarray(src, jnp.int32), jnp.asarray(dst, jnp.int32),
            jnp.asarray(res), jnp.asarray(nm), block_m=BM, block_n=BN,
            deterministic=rng_key is None, rng=rng_key)

    det = run()
    drp = run(jax.random.key(9))
    assert not np.allclose(np.asarray(det), np.asarray(drp), atol=1e-4)
    g = jax.grad(lambda pp: jnp.sum(attn.apply_hybrid(
        pp, x, mask_blocks, cplan, cplan_t,
        jnp.asarray(src, jnp.int32), jnp.asarray(dst, jnp.int32),
        jnp.asarray(res), jnp.asarray(nm), block_m=BM, block_n=BN,
        deterministic=False, rng=jax.random.key(10)) ** 2))(params)
    flat, _ = jax.flatten_util.ravel_pytree(g)
    assert np.isfinite(np.asarray(flat)).all()


@pytest.mark.parametrize("metric,learnable", [
    ("scaled_dot_product", False), ("gaussian_kernel", True),
    ("rbf_kernel", True), ("mahalanobis", True)])
def test_padded_partial_matches_coo(metric, learnable):
    """The scatter-free padded-degree residual partial (custom VJP with
    a transposed key walk) == the COO partial: out, lse, and grads
    through q/k/v and the learnable metric params. The mahalanobis case
    pins the cov_inv[:, None] broadcast helper (_pp_params3) and its
    gradient path (ADVICE r3)."""
    from tagan_tpu.core.graph import pad_residual_edges
    N, H, Dh = 60, 2, 8
    src, dst, em, band, res, adj, nm = _split_edges(N=N, E=150, seed=13)
    rng = np.random.default_rng(14)
    q = jnp.asarray(rng.standard_normal((H, N, Dh)), jnp.float32)
    k = jnp.asarray(rng.standard_normal((H, N, Dh)), jnp.float32)
    v = jnp.asarray(rng.standard_normal((H, N, Dh)), jnp.float32)
    if metric == "mahalanobis":
        # learnable PSD metric F^T F (what nn.geometric builds from its
        # low-rank cov_factors)
        f = rng.standard_normal((H, 4, Dh)).astype(np.float32)
        sigma = jnp.asarray(np.einsum("hrd,hre->hde", f, f))
    else:
        sigma = jnp.asarray(rng.uniform(0.5, 1.5, H), jnp.float32) \
            if learnable else None
    eq = jnp.asarray(src, jnp.int32)
    ek = jnp.asarray(dst, jnp.int32)
    pads = pad_residual_edges(src, dst, res, N)
    pads = tuple(jnp.asarray(p) for p in pads)
    kw = {"gaussian_kernel": dict(sigma=sigma),
          "rbf_kernel": dict(gamma=sigma),
          "mahalanobis": dict(cov_inv=sigma)}.get(metric, {})

    def f_coo(q, k, v, sg):
        kw2 = {kk: sg for kk in kw} if learnable else {}
        out, lse = S.edge_attention_partial(
            metric, q, k, v, eq, ek, jnp.asarray(res), N, **kw2)
        live = jnp.abs(lse) < 1e29
        return out, lse, jnp.sum(out ** 2) + jnp.sum(
            jnp.where(live, lse, 0.0) ** 2)

    def f_pad(q, k, v, sg):
        kw2 = {kk: sg for kk in kw} if learnable else {}
        out, lse = S.edge_attention_partial_padded(
            metric, q, k, v, *pads, **kw2)
        live = jnp.abs(lse) < 1e29
        return out, lse, jnp.sum(out ** 2) + jnp.sum(
            jnp.where(live, lse, 0.0) ** 2)

    o1, l1, s1 = f_coo(q, k, v, sigma)
    o2, l2, s2 = f_pad(q, k, v, sigma)
    np.testing.assert_allclose(np.asarray(o2), np.asarray(o1),
                               rtol=1e-5, atol=1e-6)
    live = np.abs(np.asarray(l1)) < 1e29
    np.testing.assert_allclose(np.asarray(l2)[live],
                               np.asarray(l1)[live], rtol=1e-5,
                               atol=1e-6)
    assert np.array_equal(np.abs(np.asarray(l2)) >= 1e29, ~live)
    args = (0, 1, 2, 3) if learnable else (0, 1, 2)
    g1 = jax.grad(lambda *a: f_coo(*a)[2] if learnable
                  else f_coo(*a, None)[2], argnums=args)(
        *( (q, k, v, sigma) if learnable else (q, k, v) ))
    g2 = jax.grad(lambda *a: f_pad(*a)[2] if learnable
                  else f_pad(*a, None)[2], argnums=args)(
        *( (q, k, v, sigma) if learnable else (q, k, v) ))
    for a, b in zip(g2, g1):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=2e-4, atol=2e-4)


def test_padded_partial_dropout():
    """Dropout on the padded partial: deterministic==no-drop baseline,
    stochastic differs per rng, expectation ~= deterministic, grads
    finite (the key walk reads the SAME keep mask via inc_slot)."""
    from tagan_tpu.core.graph import pad_residual_edges
    N, H, Dh = 40, 2, 8
    src, dst, em, band, res, adj, nm = _split_edges(N=N, E=200, seed=17,
                                                    width=3)
    rng = np.random.default_rng(18)
    q = jnp.asarray(rng.standard_normal((H, N, Dh)), jnp.float32)
    k = jnp.asarray(rng.standard_normal((H, N, Dh)), jnp.float32)
    v = jnp.asarray(rng.standard_normal((H, N, Dh)), jnp.float32)
    pads = tuple(jnp.asarray(p)
                 for p in pad_residual_edges(src, dst, res, N))

    def run(r=None, rate=0.0):
        out, _ = S.edge_attention_partial_padded(
            "scaled_dot_product", q, k, v, *pads,
            dropout_rate=rate, dropout_rng=r)
        return out

    det = run()
    t1 = run(jax.random.key(1), 0.4)
    t2 = run(jax.random.key(2), 0.4)
    assert not np.allclose(np.asarray(t1), np.asarray(t2), atol=1e-6)
    mean = np.mean([np.asarray(run(jax.random.key(i), 0.4))
                    for i in range(300)], axis=0)
    # unbiasedness as a global statement (per-element MC noise at 300
    # draws makes pointwise bounds flaky on single-edge rows)
    err = np.linalg.norm(mean - np.asarray(det))
    assert err < 0.1 * np.linalg.norm(np.asarray(det)), err
    g = jax.grad(lambda qq: jnp.sum(run(jax.random.key(3), 0.4) ** 2
                                    + 0.0 * jnp.sum(qq)))(q)
    g2 = jax.grad(lambda qq: jnp.sum(
        S.edge_attention_partial_padded(
            "scaled_dot_product", qq, k, v, *pads,
            dropout_rate=0.4, dropout_rng=jax.random.key(3))[0] ** 2))(q)
    assert np.all(np.isfinite(np.asarray(g2)))
    assert float(jnp.sum(jnp.abs(g2))) > 0


def test_with_hybrid_plan_hub_falls_back_to_coo():
    """ADVICE r3: a residual hub node (one off-band node referenced by
    most of the graph) must not inflate the padded-degree tables to
    N*hub_degree entries — the auto rule skips hyb_res_pad and the model
    runs the COO residual, still matching flash. padded_residual=True
    forces the tables regardless."""
    rng = np.random.default_rng(51)
    # the hub owns every residual edge, so Er == dmax_t and the auto
    # rule reduces to N > 64 — use N=128 to land clearly past it
    N, T, F = 128, 2, 8
    snaps = []
    for t in range(T):
        # band edges + a hub: node N-1 receives an off-band edge from
        # almost every node
        src_b = np.arange(N - 8)
        dst_b = src_b + rng.integers(1, 4, N - 8)
        src_h = np.arange(N - 16)
        dst_h = np.full(N - 16, N - 1)
        src = np.concatenate([src_b, src_h])
        dst = np.concatenate([dst_b, dst_h])
        snaps.append({"x": rng.standard_normal((N, F)).astype(np.float32),
                      "edge_index": np.stack([src, dst]),
                      "node_ids": list(range(N)), "timestep": float(t)})
    seq = tt.build_sequence(snaps, max_nodes=N, max_edges=src.size,
                            max_time=T)
    auto = seq.with_hybrid_plan(band_width=4, block_m=16, block_n=16)
    # hub degree ~ N-16 -> N*dmax ~ N*(N-16) >> 64*Er (Er ~ N-16)
    assert auto.hyb_res_pad is None
    forced = seq.with_hybrid_plan(band_width=4, block_m=16, block_n=16,
                                  padded_residual=True)
    assert forced.hyb_res_pad is not None

    cfg = tt.TAGANConfig(hidden_dim=32, num_heads=2, num_layers=1,
                         node_feature_dim=F, output_dim=1,
                         loss_type="bce", dropout=0.0,
                         spatial_backend="hybrid")
    model = tt.TAGAN(cfg)
    flash = tt.TAGAN(cfg.replace(spatial_backend="flash"))
    params = model.init(jax.random.key(5))
    lbl = jnp.asarray(1.0)
    out_coo = model(params, auto, lbl)
    out_pad = model(params, forced, lbl)
    out_f = flash(params, auto, lbl)
    np.testing.assert_allclose(np.asarray(out_coo.logits),
                               np.asarray(out_f.logits),
                               rtol=2e-3, atol=2e-3)
    np.testing.assert_allclose(np.asarray(out_coo.logits),
                               np.asarray(out_pad.logits),
                               rtol=1e-4, atol=1e-5)


# ---------------------------------------------------------------------------
# Edge-biased hybrid (VERDICT r3 item 3): union-exact double softmax
# ---------------------------------------------------------------------------

def _biased_setup(seed=7, N=96, BM=32, BN=32, width=24):
    """Deduped banded graph + compact band structures + padded residual
    tables + per-edge bias placed in both layouts."""
    from tagan_tpu.core.graph import pad_residual_edges
    rng = np.random.default_rng(seed)
    E = 220
    src = rng.integers(0, N, E)
    sel = rng.random(E) < 0.8
    near = np.clip(src + rng.integers(-width, width + 1, E), 0, N - 1)
    dst = np.where(sel, near, rng.integers(0, N, E))
    # dedup: the dense mask dedups, the padded tables do not
    uniq = {}
    for i, (a, b) in enumerate(zip(src, dst)):
        uniq[(int(a), int(b))] = i
    keep = sorted(uniq.values())
    src, dst = src[keep], dst[keep]
    E = len(src)
    nm = rng.random(N) < 0.95
    em = (rng.random(E) < 0.9) & nm[src] & nm[dst]
    gap = np.abs(src - dst)
    band = em & (gap <= width)
    res = em & ~band
    b_all = rng.standard_normal(E).astype(np.float32) * 0.7

    d = np.arange(N)
    adj = np.zeros((N, N), bool)
    adj[src[em], dst[em]] = True
    adj[d[nm], d[nm]] = True
    Bd = np.zeros((N, N), np.float32)
    Bd[src[em], dst[em]] = b_all[em]

    band_adj = np.zeros((N, N), bool)
    band_adj[src[band], dst[band]] = True
    band_adj[d[nm], d[nm]] = True
    S_slots = FG.occupied_blocks_total(band_adj, BM, BN)
    mask_blocks, cplan, cplan_t = FG.make_compact_structure_from_edges(
        jnp.asarray(src, jnp.int32), jnp.asarray(dst, jnp.int32),
        jnp.asarray(band), jnp.asarray(nm), N, BM, BN,
        max_slots=S_slots)

    Np = ((N + max(BM, BN) - 1) // max(BM, BN)) * max(BM, BN)
    n_i, n_j = Np // BM, Np // BN
    occ = np.zeros((n_i, n_j), bool)
    bs, bd = src[band], dst[band]
    occ[bs // BM, bd // BN] = True
    occ[d[nm] // BM, d[nm] // BN] = True
    slot_mat = np.cumsum(occ.reshape(-1)).astype(np.int32) - 1
    bias_blocks = np.zeros((S_slots, BM, BN), np.float32)
    slot_e = slot_mat[(bs // BM) * n_j + bd // BN]
    np.add.at(bias_blocks, (slot_e, bs % BM, bd % BN), b_all[band])

    pads = pad_residual_edges(src, dst, res, N, edge_ids=np.arange(E))
    nbr, nval, inc, inc_slot, ival, bid = [np.asarray(x) for x in pads]
    bias_res = np.where(bid >= 0, b_all[np.clip(bid, 0, E - 1)],
                        0.0).astype(np.float32)
    res_pad = tuple(jnp.asarray(x)
                    for x in (nbr, nval, inc, inc_slot, ival))
    return dict(src=src, dst=dst, em=em, band=band, res=res, nm=nm,
                adj=adj, Bd=jnp.asarray(Bd),
                mask_blocks=mask_blocks, cplan=cplan, cplan_t=cplan_t,
                bias_blocks=jnp.asarray(bias_blocks),
                bias_res=jnp.asarray(bias_res), res_pad=res_pad,
                slot_e=slot_e, bid=bid, BM=BM, BN=BN)


@pytest.mark.parametrize("metric,learnable", [
    ("scaled_dot_product", False), ("gaussian_kernel", True),
    ("cosine_similarity", False)])
def test_hybrid_biased_matches_dense_double_softmax(metric, learnable):
    """hybrid_biased_attention == the dense double softmax
    softmax(softmax(s) + B) over the union edge set: forward, q/k/v
    grads, per-edge bias grads in BOTH layouts, and d(scale)."""
    from tagan_tpu.ops.distances import pairwise_scores
    from tagan_tpu.ops.masked import masked_softmax
    from tagan_tpu.ops.pallas.hybrid_biased import hybrid_biased_attention
    st = _biased_setup()
    N, H, Dh = 96, 2, 8
    rng = np.random.default_rng(8)
    q = jnp.asarray(rng.standard_normal((H, N, Dh)), jnp.float32)
    k = jnp.asarray(rng.standard_normal((H, N, Dh)), jnp.float32)
    v = jnp.asarray(rng.standard_normal((H, N, Dh)), jnp.float32)
    scale = jnp.asarray(rng.uniform(0.5, 1.5, H), jnp.float32) \
        if learnable else None
    nm = st["nm"]
    pair = nm[:, None] & nm[None, :]
    mask_d = jnp.asarray(st["adj"] & pair)

    def oracle(q, k, v, Bd, sc_):
        kwx = {"gaussian_kernel": dict(sigma=sc_)}.get(metric, {})
        s = pairwise_scores(metric, q, k, **kwx)
        w1 = masked_softmax(s, mask_d[None])
        w2 = masked_softmax(w1 + Bd[None], mask_d[None])
        return jnp.einsum("hij,hjd->hid", w2, v)

    def hyb(q, k, v, bb, br, sc_):
        if metric.startswith("cosine"):
            q, k = FG._l2_normalize(q), FG._l2_normalize(k)
        return hybrid_biased_attention(
            q, k, v, st["mask_blocks"], st["cplan"], st["cplan_t"],
            st["res_pad"], bb, br, metric=metric, scale_param=sc_,
            block_m=st["BM"], block_n=st["BN"])

    o1 = oracle(q, k, v, st["Bd"], scale)
    o2 = hyb(q, k, v, st["bias_blocks"], st["bias_res"], scale)
    np.testing.assert_allclose(np.asarray(o2)[:, nm],
                               np.asarray(o1)[:, nm],
                               rtol=2e-4, atol=2e-5)

    msk = jnp.asarray(nm)[None, :, None]
    args = (0, 1, 2, 3) + ((5,) if learnable else ())
    go = jax.grad(lambda *a: jnp.sum(jnp.where(
        msk, oracle(a[0], a[1], a[2], a[3], a[5]), 0.0) ** 2),
        argnums=args)(q, k, v, st["Bd"], None, scale)
    gh = jax.grad(lambda *a: jnp.sum(jnp.where(
        msk, hyb(a[0], a[1], a[2], a[3], a[4], a[5]), 0.0) ** 2),
        argnums=(0, 1, 2, 3, 4) + ((5,) if learnable else ()))(
        q, k, v, st["bias_blocks"], st["bias_res"], scale)
    for a, b in zip(go[:3], gh[:3]):
        np.testing.assert_allclose(np.asarray(b), np.asarray(a),
                                   rtol=2e-4, atol=2e-4)
    if learnable:
        np.testing.assert_allclose(np.asarray(gh[5]), np.asarray(go[3 + 1]),
                                   rtol=2e-3, atol=2e-4)
    # bias grads: band slots + residual table positions vs the dense B
    dBd = np.asarray(go[3])
    bs, bd = st["src"][st["band"]], st["dst"][st["band"]]
    db_band = np.asarray(gh[3])[st["slot_e"], bs % st["BM"],
                                bd % st["BN"]]
    np.testing.assert_allclose(db_band, dBd[bs, bd], rtol=2e-4,
                               atol=2e-4)
    bid = st["bid"]
    db_res = np.asarray(gh[4])
    rs_idx = np.nonzero(st["res"])[0]
    vals = {int(bid[i, s]): db_res[i, s] for i in range(N)
            for s in range(bid.shape[1]) if bid[i, s] >= 0}
    if len(rs_idx):
        dr = np.array([vals[int(i)] for i in rs_idx])
        np.testing.assert_allclose(
            dr, dBd[st["src"][st["res"]], st["dst"][st["res"]]],
            rtol=2e-4, atol=2e-4)


@pytest.mark.parametrize("metric,learnable", [
    ("scaled_dot_product", False), ("gaussian_kernel", True)])
def test_hybrid_biased_compact_matches_dense_double_softmax(metric,
                                                            learnable):
    """Round 5 (VERDICT r4 item 1): the biased hybrid on the COMPACT
    degree-bucketed residual == the dense double softmax — forward,
    q/k/v grads, per-edge bias grads in band AND compact-bucket
    layouts, d(scale)."""
    from tagan_tpu.core.graph import compact_padded_residual
    from tagan_tpu.ops.distances import pairwise_scores
    from tagan_tpu.ops.masked import masked_softmax
    from tagan_tpu.ops.pallas.hybrid_biased import \
        hybrid_biased_attention_compact
    st = _biased_setup()
    N, H, Dh = 96, 2, 8
    E = len(st["src"])
    rng = np.random.default_rng(9)
    q = jnp.asarray(rng.standard_normal((H, N, Dh)), jnp.float32)
    k = jnp.asarray(rng.standard_normal((H, N, Dh)), jnp.float32)
    v = jnp.asarray(rng.standard_normal((H, N, Dh)), jnp.float32)
    scale = jnp.asarray(rng.uniform(0.5, 1.5, H), jnp.float32) \
        if learnable else None
    nm = st["nm"]
    pair = nm[:, None] & nm[None, :]
    mask_d = jnp.asarray(st["adj"] & pair)
    b_all = np.zeros(E, np.float32)
    b_all[st["em"]] = np.asarray(st["Bd"])[st["src"][st["em"]],
                                           st["dst"][st["em"]]]

    buckets8, caps = compact_padded_residual(
        st["src"], st["dst"], st["res"], N, edge_ids=np.arange(E))
    assert len(caps) >= 1
    bkts = tuple(tuple(jnp.asarray(a) for a in b[:7]) for b in buckets8)
    bias_cs = tuple(
        jnp.asarray(np.where(b[7] >= 0,
                             b_all[np.clip(b[7], 0, E - 1)], 0.0),
                    jnp.float32) for b in buckets8)

    def oracle(q, k, v, Bd, sc_):
        kwx = {"gaussian_kernel": dict(sigma=sc_)}.get(metric, {})
        s = pairwise_scores(metric, q, k, **kwx)
        w1 = masked_softmax(s, mask_d[None])
        w2 = masked_softmax(w1 + Bd[None], mask_d[None])
        return jnp.einsum("hij,hjd->hid", w2, v)

    def hyb(q, k, v, bb, bcs, sc_):
        if metric.startswith("cosine"):
            q, k = FG._l2_normalize(q), FG._l2_normalize(k)
        return hybrid_biased_attention_compact(
            q, k, v, st["mask_blocks"], st["cplan"], st["cplan_t"],
            bkts, bb, bcs, metric=metric, scale_param=sc_,
            block_m=st["BM"], block_n=st["BN"])

    o1 = oracle(q, k, v, st["Bd"], scale)
    o2 = hyb(q, k, v, st["bias_blocks"], bias_cs, scale)
    np.testing.assert_allclose(np.asarray(o2)[:, nm],
                               np.asarray(o1)[:, nm],
                               rtol=2e-4, atol=2e-5)

    msk = jnp.asarray(nm)[None, :, None]
    go = jax.grad(lambda *a: jnp.sum(jnp.where(
        msk, oracle(a[0], a[1], a[2], a[3], a[5]), 0.0) ** 2),
        argnums=(0, 1, 2, 3) + ((5,) if learnable else ()))(
        q, k, v, st["Bd"], None, scale)
    gh = jax.grad(lambda *a: jnp.sum(jnp.where(
        msk, hyb(a[0], a[1], a[2], a[3], a[4], a[5]), 0.0) ** 2),
        argnums=(0, 1, 2, 3, 4) + ((5,) if learnable else ()))(
        q, k, v, st["bias_blocks"], bias_cs, scale)
    for a, b in zip(go[:3], gh[:3]):
        np.testing.assert_allclose(np.asarray(b), np.asarray(a),
                                   rtol=2e-4, atol=2e-4)
    if learnable:
        np.testing.assert_allclose(np.asarray(gh[5]),
                                   np.asarray(go[4]),
                                   rtol=2e-3, atol=2e-4)
    # bias grads: band slots + compact bucket positions vs the dense B
    dBd = np.asarray(go[3])
    bs, bd = st["src"][st["band"]], st["dst"][st["band"]]
    db_band = np.asarray(gh[3])[st["slot_e"], bs % st["BM"],
                                bd % st["BN"]]
    np.testing.assert_allclose(db_band, dBd[bs, bd], rtol=2e-4,
                               atol=2e-4)
    vals = {}
    for b8, db in zip(buckets8, gh[4]):
        bid_b = b8[7]
        db = np.asarray(db)
        for i in range(bid_b.shape[0]):
            for s_ in range(bid_b.shape[1]):
                if bid_b[i, s_] >= 0:
                    vals[int(bid_b[i, s_])] = db[i, s_]
    rs_idx = np.nonzero(st["res"])[0]
    if len(rs_idx):
        dr = np.array([vals[int(i)] for i in rs_idx])
        np.testing.assert_allclose(
            dr, dBd[st["src"][st["res"]], st["dst"][st["res"]]],
            rtol=2e-4, atol=2e-4)


def test_flash_biased_partial_compositional():
    """Round 5 (for the biased flash-local ring): the self-contained
    biased band partial `flash_biased_partial_lse` + pure-jnp residual
    partial, with lse1 folded by logaddexp and partials merged over
    lse2, == the dense double softmax — forward AND grads assembled by
    plain autodiff (no monolithic custom_vjp). This is the identity
    the distributed biased ring composes per hop."""
    from tagan_tpu.ops.distances import pairwise_scores
    from tagan_tpu.ops.masked import masked_softmax
    from tagan_tpu.ops.pallas import hybrid_biased as HB
    st = _biased_setup()
    N, H, Dh = 96, 2, 8
    rng = np.random.default_rng(21)
    q = jnp.asarray(rng.standard_normal((H, N, Dh)), jnp.float32)
    k = jnp.asarray(rng.standard_normal((H, N, Dh)), jnp.float32)
    v = jnp.asarray(rng.standard_normal((H, N, Dh)), jnp.float32)
    nm = st["nm"]
    pair = nm[:, None] & nm[None, :]
    mask_d = jnp.asarray(st["adj"] & pair)
    ones = jnp.ones((H,), jnp.float32)
    nbr, nval = st["res_pad"][0], st["res_pad"][1]

    def oracle(q, k, v, Bd):
        s = pairwise_scores("scaled_dot_product", q, k)
        w1 = masked_softmax(s, mask_d[None])
        w2 = masked_softmax(w1 + Bd[None], mask_d[None])
        return jnp.einsum("hij,hjd->hid", w2, v)

    def composed(q, k, v, bb, br):
        _, lse1_b = FG.flash_geometric_attention_lse(
            q, k, v, st["mask_blocks"], plan=st["cplan"],
            plan_t=st["cplan_t"], block_m=st["BM"], block_n=st["BN"])
        _, lse1_r = S.edge_attention_partial_padded(
            "scaled_dot_product", q, k, v, *st["res_pad"])
        lse1_u = HB._lse_union(lse1_b, lse1_r)
        band = HB.flash_biased_partial_lse(
            q, k, v, st["mask_blocks"], st["cplan"], st["cplan_t"],
            bb, lse1_u, block_m=st["BM"], block_n=st["BN"])
        res = HB._res_biased_partial(
            "scaled_dot_product", q, k, v, nbr, nval, br, lse1_u,
            None, None, ones, Dh)
        out, _ = S.merge_attention_partials([band, res])
        return out

    o1 = oracle(q, k, v, st["Bd"])
    o2 = composed(q, k, v, st["bias_blocks"], st["bias_res"])
    np.testing.assert_allclose(np.asarray(o2)[:, nm],
                               np.asarray(o1)[:, nm],
                               rtol=2e-4, atol=2e-5)
    msk = jnp.asarray(nm)[None, :, None]
    go = jax.grad(lambda *a: jnp.sum(jnp.where(
        msk, oracle(*a), 0.0) ** 2), argnums=(0, 1, 2, 3))(
        q, k, v, st["Bd"])
    gh = jax.grad(lambda *a: jnp.sum(jnp.where(
        msk, composed(*a), 0.0) ** 2), argnums=(0, 1, 2, 3, 4))(
        q, k, v, st["bias_blocks"], st["bias_res"])
    for a, b in zip(go[:3], gh[:3]):
        np.testing.assert_allclose(np.asarray(b), np.asarray(a),
                                   rtol=2e-4, atol=2e-4)
    dBd = np.asarray(go[3])
    bs, bd = st["src"][st["band"]], st["dst"][st["band"]]
    db_band = np.asarray(gh[3])[st["slot_e"], bs % st["BM"],
                                bd % st["BN"]]
    np.testing.assert_allclose(db_band, dBd[bs, bd], rtol=2e-4,
                               atol=2e-4)
    bid = st["bid"]
    db_res = np.asarray(gh[4])
    rs_idx = np.nonzero(st["res"])[0]
    vals = {int(bid[i, s_]): db_res[i, s_] for i in range(N)
            for s_ in range(bid.shape[1]) if bid[i, s_] >= 0}
    if len(rs_idx):
        dr = np.array([vals[int(i)] for i in rs_idx])
        np.testing.assert_allclose(
            dr, dBd[st["src"][st["res"]], st["dst"][st["res"]]],
            rtol=2e-4, atol=2e-4)


def test_hybrid_biased_compact_dropout():
    """Compact biased path in train mode: stochastic per rng, exact
    expectation structure not asserted (the padded twin covers the
    union-dropout math) — here: differs from eval, grads finite."""
    from tagan_tpu.core.graph import compact_padded_residual
    from tagan_tpu.ops.pallas.hybrid_biased import \
        hybrid_biased_attention_compact
    st = _biased_setup()
    N, H, Dh = 96, 2, 8
    E = len(st["src"])
    rng = np.random.default_rng(10)
    q = jnp.asarray(rng.standard_normal((H, N, Dh)), jnp.float32)
    k = jnp.asarray(rng.standard_normal((H, N, Dh)), jnp.float32)
    v = jnp.asarray(rng.standard_normal((H, N, Dh)), jnp.float32)
    b_all = np.zeros(E, np.float32)
    b_all[st["em"]] = np.asarray(st["Bd"])[st["src"][st["em"]],
                                           st["dst"][st["em"]]]
    buckets8, _ = compact_padded_residual(
        st["src"], st["dst"], st["res"], N, edge_ids=np.arange(E))
    bkts = tuple(tuple(jnp.asarray(a) for a in b[:7]) for b in buckets8)
    bias_cs = tuple(
        jnp.asarray(np.where(b[7] >= 0,
                             b_all[np.clip(b[7], 0, E - 1)], 0.0),
                    jnp.float32) for b in buckets8)

    def run(qq, rate, seeds, rng_r):
        return hybrid_biased_attention_compact(
            qq, k, v, st["mask_blocks"], st["cplan"], st["cplan_t"],
            bkts, st["bias_blocks"], bias_cs,
            block_m=st["BM"], block_n=st["BN"],
            dropout_rate=rate, dropout_seeds=seeds, dropout_rng=rng_r)

    det = run(q, 0.0, None, None)
    s1 = jnp.asarray([3, 5], jnp.int32)
    d1 = run(q, 0.4, s1, jax.random.key(1))
    d2 = run(q, 0.4, jnp.asarray([7, 11], jnp.int32), jax.random.key(2))
    assert not np.allclose(np.asarray(det), np.asarray(d1), atol=1e-5)
    assert not np.allclose(np.asarray(d1), np.asarray(d2), atol=1e-5)
    g = jax.grad(lambda qq: jnp.sum(run(qq, 0.4, s1, jax.random.key(3))
                                    ** 2))(q)
    assert np.isfinite(np.asarray(g)).all()


def _hybrid_edge_feature_seqs(seed=61, num_samples=2):
    from tagan_tpu.data.synthetic import create_synthetic_data
    data = create_synthetic_data(
        num_samples=num_samples, sequence_length=3,
        num_nodes_range=(40, 48), node_feature_dim=8,
        edge_feature_dim=4, seed=seed)
    T_, N, E, Fe = tt.pad_dims_for([s for s, _ in data])
    seqs = [tt.build_sequence(s, max_nodes=N, max_edges=max(E, 1),
                              max_time=T_, edge_feature_dim=Fe)
            .with_hybrid_plan(band_width=8, block_m=16, block_n=16,
                              padded_residual=True)
            for s, _ in data]
    labels = jnp.asarray([float(l) for _, l in data])
    return seqs, labels, Fe


def test_hybrid_model_edge_bias_matches_dense():
    """use_edge_features on the hybrid backend (VERDICT r3 item 3): the
    per-layer bias rides the compact band store + padded residual
    provenance and the model matches the dense backend — logits and one
    SGD step of grads."""
    import optax
    seqs, labels, Fe = _hybrid_edge_feature_seqs()
    base = tt.TAGANConfig(hidden_dim=16, num_heads=2, num_layers=2,
                          node_feature_dim=8, edge_feature_dim=Fe,
                          use_edge_features=True, output_dim=1,
                          loss_type="bce", dropout=0.0)
    dense = tt.TAGAN(base)
    hyb = tt.TAGAN(base.replace(spatial_backend="hybrid"))
    params = dense.init(jax.random.key(0))
    for seq in seqs:
        d = jax.jit(lambda p, s: dense(p, s).logits)(params, seq)
        h = jax.jit(lambda p, s: hyb(p, s).logits)(params, seq)
        np.testing.assert_allclose(np.asarray(h), np.asarray(d),
                                   rtol=2e-4, atol=2e-5)
    tx = optax.sgd(0.1)

    def one_step(model, pp, seq, label):
        loss, g = jax.value_and_grad(
            lambda p_: model(p_, seq, label).loss)(pp)
        upd, _ = tx.update(g, tx.init(pp), pp)
        return loss, optax.apply_updates(pp, upd)

    l_d, p_d = jax.jit(lambda p_: one_step(dense, p_, seqs[0],
                                           labels[0]))(params)
    l_h, p_h = jax.jit(lambda p_: one_step(hyb, p_, seqs[0],
                                           labels[0]))(params)
    np.testing.assert_allclose(float(l_d), float(l_h), rtol=1e-5)
    for (ka, a), (kb, b) in zip(
            jax.tree_util.tree_leaves_with_path(p_d),
            jax.tree_util.tree_leaves_with_path(p_h)):
        np.testing.assert_allclose(np.asarray(b), np.asarray(a),
                                   rtol=5e-3, atol=5e-5,
                                   err_msg=str(ka))


def test_hybrid_model_edge_bias_dropout():
    """Biased hybrid in train mode: eval matches dense, stochastic
    forward differs per rng, grads finite and nonzero."""
    seqs, labels, Fe = _hybrid_edge_feature_seqs(seed=67, num_samples=1)
    seq = seqs[0]
    cfg = tt.TAGANConfig(hidden_dim=16, num_heads=2, num_layers=2,
                         node_feature_dim=8, edge_feature_dim=Fe,
                         use_edge_features=True, output_dim=1,
                         loss_type="bce", dropout=0.4,
                         spatial_backend="hybrid")
    hyb = tt.TAGAN(cfg)
    dense = tt.TAGAN(cfg.replace(spatial_backend="dense"))
    params = hyb.init(jax.random.key(0))
    det = jax.jit(lambda p: hyb(p, seq).logits)(params)
    d = jax.jit(lambda p: dense(p, seq).logits)(params)
    np.testing.assert_allclose(np.asarray(det), np.asarray(d),
                               rtol=2e-4, atol=2e-5)
    tr = jax.jit(lambda p, r: hyb(p, seq, deterministic=False,
                                  rng=r).logits)
    t1, t2 = tr(params, jax.random.key(1)), tr(params, jax.random.key(2))
    assert not np.allclose(np.asarray(det), np.asarray(t1), atol=1e-5)
    assert not np.allclose(np.asarray(t1), np.asarray(t2), atol=1e-5)
    g = jax.jit(jax.grad(
        lambda p, r: hyb(p, seq, labels[0], deterministic=False,
                         rng=r).loss))(params, jax.random.key(3))
    gn = sum(float(jnp.sum(jnp.abs(x)))
             for x in jax.tree_util.tree_leaves(g))
    assert np.isfinite(gn) and gn > 0


def test_compact_bucketed_residual_matches_coo():
    """Round-4 perf layout: the degree-bucketed COMPACT padded tables
    (gather work ~1.5x the edge count) == the COO partial exactly —
    out, lse, dead rows, grads; dropout variant stochastic + finite."""
    from tagan_tpu.core.graph import compact_padded_residual
    rng = np.random.default_rng(73)
    N, H, Dh, E = 150, 2, 8, 260
    src = rng.integers(0, N, E)
    dst = rng.integers(0, N, E)
    src[:30] = 11                      # hub for degree spread
    em = rng.random(E) < 0.85
    q = jnp.asarray(rng.standard_normal((H, N, Dh)), jnp.float32)
    k = jnp.asarray(rng.standard_normal((H, N, Dh)), jnp.float32)
    v = jnp.asarray(rng.standard_normal((H, N, Dh)), jnp.float32)
    buckets, caps = compact_padded_residual(src, dst, em, N)
    assert len(caps) >= 2              # the DP actually bucketed
    bj = tuple(tuple(jnp.asarray(a) for a in b) for b in buckets)

    def f_c(q, k, v):
        out, lse = S.edge_attention_partial_padded_compact(
            "scaled_dot_product", q, k, v, bj)
        live = jnp.abs(lse) < 1e29
        return out, lse, jnp.sum(out ** 2) + jnp.sum(
            jnp.where(live, lse, 0.0) ** 2)

    def f_coo(q, k, v):
        out, lse = S.edge_attention_partial(
            "scaled_dot_product", q, k, v, jnp.asarray(src, jnp.int32),
            jnp.asarray(dst, jnp.int32), jnp.asarray(em), N)
        live = jnp.abs(lse) < 1e29
        return out, lse, jnp.sum(out ** 2) + jnp.sum(
            jnp.where(live, lse, 0.0) ** 2)

    o1, l1, _ = f_coo(q, k, v)
    o2, l2, _ = f_c(q, k, v)
    np.testing.assert_allclose(np.asarray(o2), np.asarray(o1),
                               rtol=1e-5, atol=1e-6)
    live = np.abs(np.asarray(l1)) < 1e29
    np.testing.assert_allclose(np.asarray(l2)[live],
                               np.asarray(l1)[live], rtol=1e-5,
                               atol=1e-6)
    assert np.array_equal(np.abs(np.asarray(l2)) >= 1e29, ~live)
    g1 = jax.grad(lambda *a: f_coo(*a)[2], argnums=(0, 1, 2))(q, k, v)
    g2 = jax.grad(lambda *a: f_c(*a)[2], argnums=(0, 1, 2))(q, k, v)
    for a, b in zip(g2, g1):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=2e-4, atol=2e-4)
    # dropout: stochastic, finite grads
    det = f_c(q, k, v)[0]
    dr = S.edge_attention_partial_padded_compact(
        "scaled_dot_product", q, k, v, bj, dropout_rate=0.4,
        dropout_rng=jax.random.key(5))[0]
    assert not np.allclose(np.asarray(det), np.asarray(dr), atol=1e-5)
    gd = jax.grad(lambda qq: jnp.sum(
        S.edge_attention_partial_padded_compact(
            "scaled_dot_product", qq, k, v, bj, dropout_rate=0.4,
            dropout_rng=jax.random.key(6))[0] ** 2))(q)
    assert np.isfinite(np.asarray(gd)).all()
    assert float(jnp.sum(jnp.abs(gd))) > 0


def test_compact_bipartite_matches_coo():
    """Round-5 ring-fold layout: the degree-bucketed compact BIPARTITE
    tables == the COO partial over the same bipartite edge set — out,
    lse, dead rows, grads; dropout stochastic + finite."""
    from tagan_tpu.core.graph import compact_bipartite_edges
    rng = np.random.default_rng(91)
    Nq, Nk, H, Dh, E = 140, 37, 2, 8, 300
    eq = rng.integers(0, Nq, E)
    ek = rng.integers(0, Nk, E)
    eq[:40] = 7                        # hub for degree spread
    em = rng.random(E) < 0.85
    q = jnp.asarray(rng.standard_normal((H, Nq, Dh)), jnp.float32)
    k = jnp.asarray(rng.standard_normal((H, Nk, Dh)), jnp.float32)
    v = jnp.asarray(rng.standard_normal((H, Nk, Dh)), jnp.float32)
    buckets, caps = compact_bipartite_edges(eq, ek, em, Nq, Nk)
    assert len(caps) >= 2
    bj = tuple(tuple(jnp.asarray(a) for a in b) for b in buckets)

    def f_c(q, k, v):
        out, lse = S.edge_attention_partial_bipartite_compact(
            "scaled_dot_product", q, k, v, bj)
        live = jnp.abs(lse) < 1e29
        return out, lse, jnp.sum(out ** 2) + jnp.sum(
            jnp.where(live, lse, 0.0) ** 2)

    def f_coo(q, k, v):
        out, lse = S.edge_attention_partial(
            "scaled_dot_product", q, k, v, jnp.asarray(eq, jnp.int32),
            jnp.asarray(ek, jnp.int32), jnp.asarray(em), Nq)
        live = jnp.abs(lse) < 1e29
        return out, lse, jnp.sum(out ** 2) + jnp.sum(
            jnp.where(live, lse, 0.0) ** 2)

    o1, l1, _ = f_coo(q, k, v)
    o2, l2, _ = f_c(q, k, v)
    np.testing.assert_allclose(np.asarray(o2), np.asarray(o1),
                               rtol=1e-5, atol=1e-6)
    live = np.abs(np.asarray(l1)) < 1e29
    np.testing.assert_allclose(np.asarray(l2)[live],
                               np.asarray(l1)[live], rtol=1e-5,
                               atol=1e-6)
    assert np.array_equal(np.abs(np.asarray(l2)) >= 1e29, ~live)
    g1 = jax.grad(lambda *a: f_coo(*a)[2], argnums=(0, 1, 2))(q, k, v)
    g2 = jax.grad(lambda *a: f_c(*a)[2], argnums=(0, 1, 2))(q, k, v)
    for a, b in zip(g2, g1):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=2e-4, atol=2e-4)
    det = f_c(q, k, v)[0]
    dr = S.edge_attention_partial_bipartite_compact(
        "scaled_dot_product", q, k, v, bj, dropout_rate=0.4,
        dropout_rng=jax.random.key(5))[0]
    assert not np.allclose(np.asarray(det), np.asarray(dr), atol=1e-5)
    gd = jax.grad(lambda qq: jnp.sum(
        S.edge_attention_partial_bipartite_compact(
            "scaled_dot_product", qq, k, v, bj, dropout_rate=0.4,
            dropout_rng=jax.random.key(6))[0] ** 2))(q)
    assert np.isfinite(np.asarray(gd)).all()
