"""Flash geometric attention kernel vs the XLA oracle.

Runs the Pallas kernel in interpreter mode on CPU (real-TPU runs are
covered by bench.py and the TPU smoke in CI-equivalent driver runs).
"""

import functools

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from tagan_tpu.ops import distances as D
from tagan_tpu.ops.masked import masked_softmax
from tagan_tpu.ops.pallas import flash_geometric as FG


@pytest.fixture(autouse=True)
def _interpret(monkeypatch):
    import jax.experimental.pallas as pl
    orig = pl.pallas_call
    monkeypatch.setattr(pl, "pallas_call",
                        functools.partial(orig, interpret=True))
    # the module imported `pl` itself; patch its reference too
    monkeypatch.setattr(FG.pl, "pallas_call",
                        functools.partial(orig, interpret=True))
    yield


def _data(N=70, H=2, Dh=16, density=0.4, seed=0, dead_row=True):
    rng = np.random.default_rng(seed)
    q = jnp.asarray(rng.standard_normal((H, N, Dh)), jnp.float32)
    k = jnp.asarray(rng.standard_normal((H, N, Dh)), jnp.float32)
    v = jnp.asarray(rng.standard_normal((H, N, Dh)), jnp.float32)
    adj = rng.random((N, N)) < density
    np.fill_diagonal(adj, True)
    if dead_row:
        adj[3, :] = False
    return q, k, v, jnp.asarray(adj)


@pytest.mark.parametrize("metric", FG.MXU_METRICS)
def test_flash_matches_oracle(metric):
    q, k, v, adj = _data()
    scale = jnp.full((2,), 0.7) if metric in ("gaussian_kernel",
                                              "rbf_kernel") else None
    got = FG.flash_geometric_attention.__wrapped__(
        q, k, v, adj, metric=metric, scale_param=scale,
        block_m=32, block_n=32)
    sig = scale if metric == "gaussian_kernel" else None
    gam = scale if metric == "rbf_kernel" else None
    w = masked_softmax(D.pairwise_scores(metric, q, k, sigma=sig,
                                         gamma=gam), adj[None])
    want = jnp.einsum("hij,hjd->hid", w, v)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=2e-4, atol=2e-4)
    # dead row -> zeros
    assert np.all(np.asarray(got)[:, 3] == 0)


def test_flash_block_plan_paths():
    """Plan reuse and max_blocks_per_row grid shrink give identical
    results."""
    q, k, v, adj = _data(N=96, density=0.15, dead_row=False)
    base = FG.flash_geometric_attention.__wrapped__(
        q, k, v, adj, block_m=32, block_n=32)
    plan = FG.make_block_plan.__wrapped__(adj, 32, 32)
    with_plan = FG.flash_geometric_attention.__wrapped__(
        q, k, v, adj, block_m=32, block_n=32, plan=plan)
    np.testing.assert_allclose(np.asarray(base), np.asarray(with_plan),
                               rtol=1e-6)
    K = FG.occupied_blocks_bound(np.asarray(adj), 32, 32)
    shrunk = FG.flash_geometric_attention.__wrapped__(
        q, k, v, adj, block_m=32, block_n=32, max_blocks_per_row=K)
    np.testing.assert_allclose(np.asarray(base), np.asarray(shrunk),
                               rtol=1e-6)


def test_flash_layer_integration():
    """GeometricAttention.apply_flash == dense __call__ path."""
    from tagan_tpu.nn import GeometricAttention
    attn = GeometricAttention(hidden_dim=32, num_heads=2, dropout=0.0)
    params = attn.init(jax.random.key(0))
    rng = np.random.default_rng(1)
    x = jnp.asarray(rng.standard_normal((40, 32)), jnp.float32)
    adj = rng.random((40, 40)) < 0.3
    np.fill_diagonal(adj, True)
    dense = attn(params, x, jnp.asarray(adj))
    flash = attn.apply_flash(params, x, jnp.asarray(adj),
                             block_m=16, block_n=16)
    np.testing.assert_allclose(np.asarray(flash), np.asarray(dense),
                               rtol=2e-4, atol=2e-4)


@pytest.fixture(params=[False, True], ids=["twowalk", "fusedbwd"])
def _bwd_path(request, monkeypatch):
    """Run a backward test under both kernel layouts: the two-walk
    dq + dkv kernels and the fused single-walk kernel (dq partials per
    key strip, masked + summed outside)."""
    monkeypatch.setattr(FG, "FUSED_BWD", request.param)
    return request.param


@pytest.mark.parametrize("metric", FG.BWD_METRICS)
def test_flash_backward_matches_xla_grads(metric, _bwd_path):
    """custom_vjp backward (Pallas dq/dk/dv kernels) vs XLA autodiff of
    the dense oracle — fp32-exact in interpreter mode."""
    q, k, v, adj = _data(N=70, H=2, Dh=16, seed=4)

    def loss_flash(q, k, v):
        out = FG.flash_geometric_attention.__wrapped__(
            q, k, v, adj, metric=metric, block_m=32, block_n=32)
        return jnp.sum(out ** 2)

    def loss_ref(q, k, v):
        return jnp.sum(FG._xla_reference(metric, q, k, v, adj, None) ** 2)

    g1 = jax.grad(loss_flash, argnums=(0, 1, 2))(q, k, v)
    g2 = jax.grad(loss_ref, argnums=(0, 1, 2))(q, k, v)
    for a, b, n in zip(g1, g2, "qkv"):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=2e-3, atol=2e-3,
                                   err_msg=f"{metric} d{n}")


def test_flash_backward_with_shared_plan_and_shrink(_bwd_path):
    """Grads through the differentiable path are identical whether the
    block-sparsity plans are computed internally, passed in, or
    statically shrunk to the occupancy bound."""
    q, k, v, adj = _data(N=96, density=0.12, dead_row=False, seed=7)

    def loss(q, k, v, **kw):
        out = FG.flash_geometric_attention.__wrapped__(
            q, k, v, adj, metric="scaled_dot_product",
            block_m=32, block_n=32, **kw)
        return jnp.sum(out ** 2)

    g_base = jax.grad(loss, argnums=(0, 1, 2))(q, k, v)
    plan = FG.make_block_plan.__wrapped__(adj, 32, 32)
    plan_t = FG.make_block_plan.__wrapped__(adj.T, 32, 32)
    g_plan = jax.grad(lambda *a: loss(*a, plan=plan, plan_t=plan_t),
                      argnums=(0, 1, 2))(q, k, v)
    kr = FG.occupied_blocks_bound(np.asarray(adj), 32, 32)
    kc = FG.occupied_blocks_bound(np.asarray(adj).T, 32, 32)
    g_shrunk = jax.grad(lambda *a: loss(*a, max_blocks_per_row=kr,
                                        max_blocks_per_col=kc),
                        argnums=(0, 1, 2))(q, k, v)
    for a, b, c in zip(g_base, g_plan, g_shrunk):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-6)
        np.testing.assert_allclose(np.asarray(a), np.asarray(c), rtol=1e-6)


def test_flash_backward_bf16_close(_bwd_path):
    """bf16 backward kernels stay within bf16-class tolerance of the
    fp32 grads."""
    q, k, v, adj = _data(N=64, H=2, Dh=16, seed=9)

    def loss(q, k, v, bf16):
        out = FG.flash_geometric_attention.__wrapped__(
            q, k, v, adj, metric="scaled_dot_product",
            block_m=32, block_n=32, bf16=bf16)
        return jnp.sum(out ** 2)

    g32 = jax.grad(lambda *a: loss(*a, bf16=False), argnums=(0, 1, 2))(q, k, v)
    g16 = jax.grad(lambda *a: loss(*a, bf16=True), argnums=(0, 1, 2))(q, k, v)
    for a, b in zip(g32, g16):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=0.05, atol=0.05)


def test_fused_auto_rule_respects_vmem_budget():
    """The FUSED_BWD=None auto rule must NOT pick the fused layout at
    geometries whose scoped-VMEM working set exceeds the 16 MB chip
    limit. Regression for BENCH_r02 rc=1: at the 10K headline config
    (block 512x1024, Dp=128) the fused kernel measured 17.77 MB scoped
    VMEM on v5e and failed to compile — the analytic estimate must
    exclude it while still admitting small-block layouts."""
    # the 10K headline geometry: must exceed the budget -> two-walk
    est = FG._fused_bwd_vmem_bytes(512, 1024, 128)
    assert est > FG.FUSED_VMEM_BUDGET
    # estimate is in the right ballpark of the measured ~17.77M
    # footprint at that geometry (not wildly conservative)
    assert int(16.5 * 2**20) <= est <= int(22 * 2**20)
    # small-block layouts (the fused kernel's home turf) still qualify
    assert FG._fused_bwd_vmem_bytes(512, 512, 128) <= FG.FUSED_VMEM_BUDGET
    assert FG._fused_bwd_vmem_bytes(256, 256, 128) <= FG.FUSED_VMEM_BUDGET


def test_plans_from_edges_match_mask_plans():
    """O(E) edge-list plan construction == the dense-mask plans."""
    rng = np.random.default_rng(11)
    N, E = 96, 150
    eq = rng.integers(0, N, E)
    ek = rng.integers(0, N, E)
    em = rng.random(E) < 0.8
    nm = rng.random(N) < 0.9
    adj = np.zeros((N, N), bool)
    adj[eq[em], ek[em]] = True
    d = np.arange(N)
    adj[d[nm], d[nm]] = True
    plan, plan_t = FG.make_block_plans_from_edges(
        jnp.asarray(eq), jnp.asarray(ek), jnp.asarray(em),
        jnp.asarray(nm), N, 32, 32)
    want = FG.make_block_plan(jnp.asarray(adj), 32, 32)
    want_t = FG.make_block_plan(jnp.asarray(adj.T), 32, 32)
    for a, b in zip(plan + plan_t, want + want_t):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_mask_plans_match_edge_plans_model_construction():
    """make_block_plans_from_mask on the model's packed-adjacency mask
    (eye-select self loops, nn/model.py _mask_and_plans) must equal the
    edge-list plans at multi-block granularity, incl. inactive nodes."""
    rng = np.random.default_rng(5)
    N, E = 200, 500
    eq = jnp.asarray(rng.integers(0, N, E), jnp.int32)
    ek = jnp.asarray(rng.integers(0, N, E), jnp.int32)
    em = jnp.asarray(rng.random(E) < 0.7)
    nm = jnp.asarray(rng.random(N) < 0.85)
    adj = np.zeros((N, N), bool)
    adj[np.asarray(eq)[np.asarray(em)], np.asarray(ek)[np.asarray(em)]] = True
    iota = jnp.arange(N)
    eye = iota[:, None] == iota[None, :]
    mask = (jnp.asarray(adj) | (eye & nm[None, :])).astype(jnp.int8)
    got = FG.make_block_plans_from_mask(mask, 32, 64)
    want = FG.make_block_plans_from_edges(eq, ek, em, nm, N, 32, 64)
    for a, b in zip(got[0] + got[1], want[0] + want[1]):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_flash_mahalanobis_matches_dense():
    """apply_flash routes mahalanobis through the euclidean kernel in
    factor space — matches the dense path, including learnable factors,
    and carries gradients into the factors."""
    from tagan_tpu.nn import GeometricAttention
    for learnable in (False, True):
        attn = GeometricAttention(hidden_dim=32, num_heads=2, dropout=0.0,
                                  distance_metric="mahalanobis",
                                  learnable_distance=learnable)
        params = attn.init(jax.random.key(1))
        rng = np.random.default_rng(3)
        x = jnp.asarray(rng.standard_normal((40, 32)), jnp.float32)
        adj = rng.random((40, 40)) < 0.3
        np.fill_diagonal(adj, True)
        dense = attn(params, x, jnp.asarray(adj))
        flash = attn.apply_flash(params, x, jnp.asarray(adj),
                                 block_m=16, block_n=16)
        np.testing.assert_allclose(np.asarray(flash), np.asarray(dense),
                                   rtol=2e-4, atol=2e-4,
                                   err_msg=f"learnable={learnable}")
        if learnable:
            g = jax.grad(lambda pp: jnp.sum(attn.apply_flash(
                pp, x, jnp.asarray(adj), block_m=16, block_n=16) ** 2))(params)
            gd = jax.grad(lambda pp: jnp.sum(attn(
                pp, x, jnp.asarray(adj)) ** 2))(params)
            np.testing.assert_allclose(
                np.asarray(g["cov_factors"]), np.asarray(gd["cov_factors"]),
                rtol=2e-3, atol=2e-3)
            assert float(jnp.sum(jnp.abs(g["cov_factors"]))) > 0


@pytest.mark.parametrize("metric", ["gaussian_kernel", "rbf_kernel"])
def test_flash_learnable_scale_grads(metric, _bwd_path):
    """Learnable sigma/gamma now train through the flash forward: grads
    (incl. d(scale)) match the dense path."""
    from tagan_tpu.nn import GeometricAttention
    attn = GeometricAttention(hidden_dim=32, num_heads=2, dropout=0.0,
                              distance_metric=metric,
                              learnable_distance=True)
    params = attn.init(jax.random.key(2))
    rng = np.random.default_rng(5)
    x = jnp.asarray(rng.standard_normal((40, 32)), jnp.float32)
    adj = rng.random((40, 40)) < 0.3
    np.fill_diagonal(adj, True)
    adj = jnp.asarray(adj)

    flash = attn.apply_flash(params, x, adj, block_m=16, block_n=16)
    dense = attn(params, x, adj)
    np.testing.assert_allclose(np.asarray(flash), np.asarray(dense),
                               rtol=2e-4, atol=2e-4)
    gf = jax.grad(lambda pp: jnp.sum(attn.apply_flash(
        pp, x, adj, block_m=16, block_n=16) ** 2))(params)
    gd = jax.grad(lambda pp: jnp.sum(attn(pp, x, adj) ** 2))(params)
    np.testing.assert_allclose(np.asarray(gf["distance_param"]),
                               np.asarray(gd["distance_param"]),
                               rtol=2e-3, atol=2e-3)
    assert float(jnp.sum(jnp.abs(gf["distance_param"]))) > 0


# ---------------------------------------------------------------------------
# In-kernel attention dropout
# ---------------------------------------------------------------------------

def _dropout_oracle(metric, q, k, v, adj, rate, seed, scale=None):
    """Dense twin of the kernel's dropout: regenerate the hash keep mask
    for the full matrix (it depends only on global coordinates) and drop
    the normalized weights."""
    H, N, _ = q.shape
    Np = FG._round_up(N, 32)
    sig = scale if metric == "gaussian_kernel" else None
    gam = scale if metric == "rbf_kernel" else None
    w = masked_softmax(D.pairwise_scores(metric, q, k, sigma=sig,
                                         gamma=gam), adj[None])
    thresh = FG._keep_thresh(rate)
    keep = jnp.stack([
        FG._keep_mask(jnp.int32(seed), jnp.int32(h), 0, 0, Np, Np,
                      thresh)[:N, :N] for h in range(H)])
    w = jnp.where(keep, w / (1.0 - rate), 0.0)
    return jnp.einsum("hij,hjd->hid", w, v)


@pytest.mark.parametrize("metric", ["scaled_dot_product", "euclidean",
                                    "cosine_similarity"])
def test_flash_dropout_matches_hash_oracle(metric):
    """Forward with in-kernel dropout == dense attention dropped with
    the same (regenerated) keep mask."""
    q, k, v, adj = _data(N=70, H=2, Dh=16, seed=13)
    rate, seed = 0.4, 1234
    got = FG.flash_geometric_attention.__wrapped__(
        q, k, v, adj, metric=metric, block_m=32, block_n=32,
        dropout_rate=rate, dropout_seed=jnp.asarray([seed], jnp.int32))
    want = _dropout_oracle(metric, q, k, v, adj, rate, seed)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=2e-4, atol=2e-4)
    # dropout actually dropped something (outputs differ from no-drop)
    nodrop = FG.flash_geometric_attention.__wrapped__(
        q, k, v, adj, metric=metric, block_m=32, block_n=32)
    assert not np.allclose(np.asarray(got), np.asarray(nodrop),
                           atol=1e-3)


@pytest.mark.parametrize("metric", ["scaled_dot_product",
                                    "squared_euclidean",
                                    "cosine_distance"])
def test_flash_dropout_backward_matches_hash_oracle(metric, _bwd_path):
    """The backward kernels regenerate the identical keep mask from
    global coordinates (incl. the transposed dk/dv walk): grads match
    XLA autodiff of the same-mask dense oracle."""
    q, k, v, adj = _data(N=70, H=2, Dh=16, seed=14)
    rate, seed = 0.3, 77

    def loss_flash(q, k, v):
        out = FG.flash_geometric_attention.__wrapped__(
            q, k, v, adj, metric=metric, block_m=32, block_n=32,
            dropout_rate=rate,
            dropout_seed=jnp.asarray([seed], jnp.int32))
        return jnp.sum(out ** 2)

    def loss_ref(q, k, v):
        return jnp.sum(_dropout_oracle(metric, q, k, v, adj, rate,
                                       seed) ** 2)

    g1 = jax.grad(loss_flash, argnums=(0, 1, 2))(q, k, v)
    g2 = jax.grad(loss_ref, argnums=(0, 1, 2))(q, k, v)
    for a, b, n in zip(g1, g2, "qkv"):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=2e-3, atol=2e-3,
                                   err_msg=f"{metric} d{n}")


def test_flash_dropout_scaled_metric_grads():
    """Dropout composes with the learnable-scale (dsigma in-kernel)
    path."""
    q, k, v, adj = _data(N=64, H=2, Dh=16, seed=15)
    rate, seed = 0.25, 5
    scale = jnp.asarray([0.8, 1.3])

    def loss_flash(q, k, v, s):
        out = FG.flash_geometric_attention.__wrapped__(
            q, k, v, adj, metric="gaussian_kernel", scale_param=s,
            block_m=32, block_n=32, dropout_rate=rate,
            dropout_seed=jnp.asarray([seed], jnp.int32))
        return jnp.sum(out ** 2)

    def loss_ref(q, k, v, s):
        return jnp.sum(_dropout_oracle("gaussian_kernel", q, k, v, adj,
                                       rate, seed, scale=s) ** 2)

    g1 = jax.grad(loss_flash, argnums=(0, 1, 2, 3))(q, k, v, scale)
    g2 = jax.grad(loss_ref, argnums=(0, 1, 2, 3))(q, k, v, scale)
    for a, b, n in zip(g1, g2, ["q", "k", "v", "scale"]):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=2e-3, atol=2e-3, err_msg=f"d{n}")


def test_flash_dropout_statistics():
    """Keep fraction ~= 1-rate; expectation preserved over seeds."""
    q, k, v, adj = _data(N=64, H=2, Dh=16, seed=16)
    rate = 0.5
    nodrop = FG.flash_geometric_attention.__wrapped__(
        q, k, v, adj, metric="scaled_dot_product", block_m=32, block_n=32)
    acc = np.zeros_like(np.asarray(nodrop))
    S = 24
    for s in range(S):
        acc += np.asarray(FG.flash_geometric_attention.__wrapped__(
            q, k, v, adj, metric="scaled_dot_product", block_m=32,
            block_n=32, dropout_rate=rate,
            dropout_seed=jnp.asarray([s], jnp.int32)))
    mean = acc / S
    # E[dropout(out)] == out; loose tolerance for S=24 seeds
    err = np.abs(mean - np.asarray(nodrop))
    assert np.median(err / (np.abs(np.asarray(nodrop)) + 0.1)) < 0.25
    # raw keep-bit statistics
    bits = np.asarray(FG._keep_mask(jnp.int32(3), jnp.int32(0), 0, 0,
                                    256, 256, FG._keep_thresh(rate)))
    assert abs(bits.mean() - 0.5) < 0.02


# ---------------------------------------------------------------------------
# Edge-biased variant: softmax(drop(softmax(s)) + B) @ v
# ---------------------------------------------------------------------------

def _bias_data(N=70, H=2, Dh=16, seed=0):
    q, k, v, adj = _data(N=N, H=H, Dh=Dh, seed=seed)
    r = np.random.default_rng(seed + 1000)
    B = jnp.asarray(np.where(np.asarray(adj),
                             r.standard_normal((N, N)), 0.0), jnp.float32)
    return q, k, v, adj, B


def _bias_oracle(metric, q, k, v, adj, B, scale=None, rate=0.0,
                 seed=None):
    """Dense twin of the biased kernel: two masked softmaxes with the
    regenerated hash keep masks between/after them."""
    H, N, _ = q.shape
    sig = scale if metric == "gaussian_kernel" else None
    gam = scale if metric == "rbf_kernel" else None
    w1 = masked_softmax(D.pairwise_scores(metric, q, k, sigma=sig,
                                          gamma=gam), adj[None])
    kp = None
    if rate > 0.0:
        Npad = FG._round_up(N, 32)
        th = FG._keep_thresh(rate)
        s2 = seed ^ 0x5BD1E995

        def masks(s):
            return jnp.stack([
                FG._keep_mask(jnp.int32(s), jnp.int32(h), 0, 0, Npad,
                              Npad, th)[:N, :N] for h in range(H)])
        w1 = jnp.where(masks(seed), w1 / (1 - rate), 0.0)
        kp = masks(s2)
    w2 = masked_softmax(w1 + B[None], adj[None])
    if rate > 0.0:
        w2 = jnp.where(kp, w2 / (1 - rate), 0.0)
    return jnp.einsum("hij,hjd->hid", w2, v)


@pytest.mark.parametrize("metric", ["scaled_dot_product", "euclidean",
                                    "cosine_similarity",
                                    "squared_euclidean"])
def test_flash_bias_matches_dense(metric):
    """Biased forward (2-walk: lse1 pass + re-softmax pass) == the dense
    path's double softmax."""
    q, k, v, adj, B = _bias_data(seed=21)
    got = FG.flash_geometric_attention.__wrapped__(
        q, k, v, adj, metric=metric, block_m=32, block_n=32, bias=B)
    want = _bias_oracle(metric, q, k, v, adj, B)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=2e-4, atol=2e-4)
    # bias actually shifts the output
    plain = FG.flash_geometric_attention.__wrapped__(
        q, k, v, adj, metric=metric, block_m=32, block_n=32)
    assert not np.allclose(np.asarray(got), np.asarray(plain), atol=1e-3)


@pytest.mark.parametrize("metric,scaled", [
    ("scaled_dot_product", False), ("euclidean", False),
    ("cosine_distance", False), ("gaussian_kernel", True),
    ("rbf_kernel", True)])
def test_flash_bias_grads(metric, scaled):
    """3-walk biased backward (delta1+dB walk, dq walk, dk/dv walk):
    all grads incl. dbias and dscale match XLA autodiff of the dense
    twin. dbias compared at edge positions only (unoccupied blocks are
    unspecified by contract)."""
    q, k, v, adj, B = _bias_data(seed=22)
    scale = jnp.asarray([0.8, 1.3]) if scaled else None

    def lf(q, k, v, B, s):
        return jnp.sum(FG.flash_geometric_attention.__wrapped__(
            q, k, v, adj, metric=metric, scale_param=s, block_m=32,
            block_n=32, bias=B) ** 2)

    def lr(q, k, v, B, s):
        return jnp.sum(_bias_oracle(metric, q, k, v, adj, B, s) ** 2)

    args = (q, k, v, B, scale)
    nums = (0, 1, 2, 3, 4) if scaled else (0, 1, 2, 3)
    g1 = jax.grad(lf, argnums=nums)(*args)
    g2 = jax.grad(lr, argnums=nums)(*args)
    names = ["q", "k", "v", "B", "scale"]
    m = np.asarray(adj)
    for a, b, n in zip(g1, g2, names):
        aa, bb = np.asarray(a), np.asarray(b)
        if n == "B":
            aa, bb = aa[m], bb[m]
        np.testing.assert_allclose(aa, bb, rtol=2e-3, atol=2e-3,
                                   err_msg=f"{metric} d{n}")


def test_flash_bias_dropout_matches_hash_oracle():
    """Both dropout stages (post-softmax-1 with seed, post-re-softmax
    with the derived second seed) regenerate identically in fwd and all
    three bwd walks."""
    q, k, v, adj, B = _bias_data(seed=23)
    rate, seed = 0.35, 99

    def lf(q, k, v, B):
        return jnp.sum(FG.flash_geometric_attention.__wrapped__(
            q, k, v, adj, metric="scaled_dot_product", block_m=32,
            block_n=32, bias=B, dropout_rate=rate,
            dropout_seed=jnp.asarray([seed], jnp.int32)) ** 2)

    def lr(q, k, v, B):
        return jnp.sum(_bias_oracle("scaled_dot_product", q, k, v, adj,
                                    B, rate=rate, seed=seed) ** 2)

    np.testing.assert_allclose(float(lf(q, k, v, B)),
                               float(lr(q, k, v, B)), rtol=1e-4)
    g1 = jax.grad(lf, argnums=(0, 1, 2, 3))(q, k, v, B)
    g2 = jax.grad(lr, argnums=(0, 1, 2, 3))(q, k, v, B)
    m = np.asarray(adj)
    for a, b, n in zip(g1, g2, "qkvB"):
        aa, bb = np.asarray(a), np.asarray(b)
        if n == "B":
            aa, bb = aa[m], bb[m]
        np.testing.assert_allclose(aa, bb, rtol=3e-3, atol=3e-3,
                                   err_msg=f"d{n}")


def test_flash_bias_dead_rows_zero():
    """Rows with no valid edges produce exactly zero through the biased
    path too."""
    q, k, v, adj, B = _bias_data(seed=24)
    adj = np.array(adj)
    adj[3] = False
    adj = jnp.asarray(adj)
    out = FG.flash_geometric_attention.__wrapped__(
        q, k, v, adj, metric="euclidean", block_m=32, block_n=32, bias=B)
    assert np.all(np.asarray(out)[:, 3] == 0.0)


# ---------------------------------------------------------------------------
# Bit-packed masks (8 key columns per int8, interleaved per key block)
# ---------------------------------------------------------------------------

@pytest.fixture()
def _force_packed(monkeypatch):
    monkeypatch.setattr(FG, "PACK_MASKS", True)


def test_pack_mask_roundtrip():
    r = np.random.default_rng(31)
    for N, bn in ((96, 96), (256, 128), (1024, 1024)):
        m = jnp.asarray(r.random((N, N)) < 0.4)
        p = FG._pack_mask(m, bn)
        assert p.shape == (N, N // 8)
        # unpack every block via the kernel helper (outside pallas:
        # pltpu.repeat works as a plain op in interpret-free tracing)
        for jb in range(N // bn):
            blk = p[:, jb * bn // 8:(jb + 1) * bn // 8]
            got = FG._mask_bits(blk, True)
            np.testing.assert_array_equal(
                np.asarray(got) != 0,
                np.asarray(m[:, jb * bn:(jb + 1) * bn]))


@pytest.mark.parametrize("metric", ["scaled_dot_product",
                                    "gaussian_kernel"])
def test_flash_packed_mask_path(metric, _force_packed):
    """With Np == block_n the kernels take the bit-packed mask path
    (1/8 the mask DMA); outputs and all grads must match the unpacked
    small-block run and the dense oracle."""
    q, k, v, adj = _data(N=70, H=2, Dh=16, seed=41)
    scale = jnp.asarray([0.9, 1.2]) if metric == "gaussian_kernel" \
        else None
    # packed: blocks span the padded graph -> Np == block_n
    assert FG._mask_packable(96, 96)

    def loss(q, k, v, s, bm, bn):
        return jnp.sum(FG.flash_geometric_attention.__wrapped__(
            q, k, v, adj, metric=metric, scale_param=s,
            block_m=bm, block_n=bn) ** 2)

    lp = loss(q, k, v, scale, 96, 96)      # packed
    lu = loss(q, k, v, scale, 32, 32)      # unpacked small blocks
    np.testing.assert_allclose(float(lp), float(lu), rtol=1e-4)
    if scale is not None:
        nums = (0, 1, 2, 3)
        gp = jax.grad(lambda *a: loss(*a, 96, 96), argnums=nums)(
            q, k, v, scale)
        gu = jax.grad(lambda *a: loss(*a, 32, 32), argnums=nums)(
            q, k, v, scale)
    else:
        nums = (0, 1, 2)
        gp = jax.grad(lambda q, k, v: loss(q, k, v, None, 96, 96),
                      argnums=nums)(q, k, v)
        gu = jax.grad(lambda q, k, v: loss(q, k, v, None, 32, 32),
                      argnums=nums)(q, k, v)
    for a, b in zip(gp, gu):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=2e-3, atol=2e-3)


def test_flash_packed_biased_and_dropout(_force_packed):
    """Packed masks compose with the edge-biased variant and in-kernel
    dropout (all walks unpack the identical bits)."""
    q, k, v, adj, B = _bias_data(seed=43)
    rate, seed = 0.3, 17

    def loss(bm, bn):
        return jnp.sum(FG.flash_geometric_attention.__wrapped__(
            q, k, v, adj, metric="euclidean", block_m=bm, block_n=bn,
            bias=B, dropout_rate=rate,
            dropout_seed=jnp.asarray([seed], jnp.int32)) ** 2)

    # NOTE: the hash keep-mask depends on global coordinates only, so
    # packed (96-blocks) and unpacked (32-blocks) drop identical entries
    np.testing.assert_allclose(float(loss(96, 96)), float(loss(32, 32)),
                               rtol=1e-4)


# ---------------------------------------------------------------------------
# Compact occupied-block masks + differentiable lse
# ---------------------------------------------------------------------------

def _edge_data(N=96, E=200, seed=51):
    rng = np.random.default_rng(seed)
    eq = jnp.asarray(rng.integers(0, N, E), jnp.int32)
    ek = jnp.asarray(rng.integers(0, N, E), jnp.int32)
    em = jnp.asarray(rng.random(E) < 0.8)
    nm = jnp.asarray(rng.random(N) < 0.9)
    adj = np.zeros((N, N), bool)
    adj[np.asarray(eq)[np.asarray(em)], np.asarray(ek)[np.asarray(em)]] = True
    d = np.arange(N)
    nm_np = np.asarray(nm)
    adj[d[nm_np], d[nm_np]] = True     # self loops for live nodes
    return eq, ek, em, nm, jnp.asarray(adj)


def test_compact_structure_matches_dense_plans():
    """Compact builder's plans == the dense-mask plans, and the block
    store reassembles into exactly the dense mask."""
    N, BM, BN = 96, 32, 32
    eq, ek, em, nm, adj = _edge_data(N=N)
    S = FG.occupied_blocks_total(np.asarray(adj), BM, BN)
    mask_blocks, cplan, cplan_t = FG.make_compact_structure_from_edges(
        eq, ek, em, nm, N, BM, BN, max_slots=S)
    plan, plan_t = FG.make_block_plans_from_edges(eq, ek, em, nm, N,
                                                 BM, BN)
    np.testing.assert_array_equal(np.asarray(cplan[0]),
                                  np.asarray(plan[0]))
    np.testing.assert_array_equal(np.asarray(cplan[1]),
                                  np.asarray(plan[1]))
    np.testing.assert_array_equal(np.asarray(cplan_t[0]),
                                  np.asarray(plan_t[0]))
    np.testing.assert_array_equal(np.asarray(cplan_t[1]),
                                  np.asarray(plan_t[1]))
    # reassemble: slot order is row-major over occupied blocks
    mb = np.asarray(mask_blocks)
    dense = np.zeros((N, N), np.int8)
    occ = np.asarray(adj).reshape(N // BM, BM, N // BN, BN).sum(
        axis=(1, 3)) > 0
    slot = 0
    for i in range(N // BM):
        for j in range(N // BN):
            if occ[i, j]:
                dense[i * BM:(i + 1) * BM, j * BN:(j + 1) * BN] = \
                    mb[slot]
                slot += 1
    assert slot == S
    np.testing.assert_array_equal(dense != 0, np.asarray(adj))
    # slot arrays point at the right store entries for every walk step
    jl, jc, js = (np.asarray(a) for a in cplan)
    flat_slot = np.cumsum(occ.reshape(-1)) - 1
    for i in range(N // BM):
        for p in range(jc[i]):
            assert js[i, p] == flat_slot[i * (N // BN) + jl[i, p]]


@pytest.mark.parametrize("metric", ["scaled_dot_product", "euclidean",
                                    "gaussian_kernel"])
def test_flash_compact_matches_dense(metric, _bwd_path):
    """Forward, lse and all grads through the compact-mask path match
    the dense-mask path exactly (same blocks, different storage)."""
    N, BM, BN = 96, 32, 32
    eq, ek, em, nm, adj = _edge_data(N=N, seed=61)
    q, k, v, _ = _data(N=N, H=2, Dh=16, seed=62, dead_row=False)
    scale = jnp.asarray([0.8, 1.2]) if metric == "gaussian_kernel" \
        else None
    S = FG.occupied_blocks_total(np.asarray(adj), BM, BN)
    mask_blocks, cplan, cplan_t = FG.make_compact_structure_from_edges(
        eq, ek, em, nm, N, BM, BN, max_slots=S)

    def loss_compact(q, k, v, s):
        out, lse = FG.flash_geometric_attention_lse(
            q, k, v, mask_blocks, metric=metric, scale_param=s,
            block_m=BM, block_n=BN, plan=cplan, plan_t=cplan_t)
        live = lse < FG.LSE_DEAD / 2
        return jnp.sum(out ** 2) + jnp.sum(jnp.where(live, lse, 0.0))

    def loss_dense(q, k, v, s):
        out, lse = FG.flash_geometric_attention_lse(
            q, k, v, adj, metric=metric, scale_param=s,
            block_m=BM, block_n=BN)
        live = lse < FG.LSE_DEAD / 2
        return jnp.sum(out ** 2) + jnp.sum(jnp.where(live, lse, 0.0))

    nums = (0, 1, 2, 3) if scale is not None else (0, 1, 2)
    lc = loss_compact(q, k, v, scale)
    ld = loss_dense(q, k, v, scale)
    np.testing.assert_allclose(float(lc), float(ld), rtol=1e-5)
    gc = jax.grad(loss_compact, argnums=nums)(q, k, v, scale)
    gd = jax.grad(loss_dense, argnums=nums)(q, k, v, scale)
    for a, b in zip(gc, gd):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-5, atol=1e-6)


@pytest.mark.parametrize("metric", ["scaled_dot_product",
                                    "cosine_similarity",
                                    "rbf_kernel"])
def test_flash_lse_grads_match_oracle(metric):
    """(out, lse) and grads THROUGH THE LSE OUTPUT match XLA autodiff of
    the dense oracle's logsumexp — the property the hybrid merge relies
    on."""
    q, k, v, adj = _data(N=70, H=2, Dh=16, seed=63)
    scale = jnp.asarray([0.9, 1.1]) if metric == "rbf_kernel" else None

    def loss_flash(q, k, v, s):
        out, lse = FG.flash_geometric_attention_lse(
            q, k, v, adj, metric=metric, scale_param=s,
            block_m=32, block_n=32)
        live = lse < FG.LSE_DEAD / 2
        return (jnp.sum(out ** 2)
                + jnp.sum(jnp.where(live, jnp.sin(lse), 0.0)))

    def loss_ref(q, k, v, s):
        sig = s if metric == "gaussian_kernel" else None
        gam = s if metric == "rbf_kernel" else None
        scores = D.pairwise_scores(metric, q, k, sigma=sig, gamma=gam)
        sm = jnp.where(adj[None], scores, -jnp.inf)
        lse = jax.scipy.special.logsumexp(sm, axis=-1)
        live = jnp.isfinite(lse)
        w = masked_softmax(scores, adj[None])
        out = jnp.einsum("hij,hjd->hid", w, v)
        return (jnp.sum(out ** 2)
                + jnp.sum(jnp.where(live, jnp.sin(
                    jnp.where(live, lse, 0.0)), 0.0)))

    nums = (0, 1, 2, 3) if scale is not None else (0, 1, 2)
    np.testing.assert_allclose(float(loss_flash(q, k, v, scale)),
                               float(loss_ref(q, k, v, scale)), rtol=1e-4)
    g1 = jax.grad(loss_flash, argnums=nums)(q, k, v, scale)
    g2 = jax.grad(loss_ref, argnums=nums)(q, k, v, scale)
    for a, b in zip(g1, g2):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=2e-3, atol=2e-3)


def test_flash_compact_padding_invariance():
    """Same graph, two paddings (N=70 inside 96- vs 128-slot space):
    live-row outputs identical; N not a block multiple is exercised via
    the 70-node graph in 32-blocks."""
    N = 70
    rng = np.random.default_rng(71)
    E = 180
    eq = jnp.asarray(rng.integers(0, N, E), jnp.int32)
    ek = jnp.asarray(rng.integers(0, N, E), jnp.int32)
    em = jnp.asarray(rng.random(E) < 0.8)
    nm = jnp.asarray(np.ones(N, bool))
    q, k, v, _ = _data(N=N, H=2, Dh=16, seed=72, dead_row=False)

    outs = []
    for pad_to in (96, 128):
        Npad = pad_to
        pq = jnp.pad(q, ((0, 0), (0, Npad - N), (0, 0)))
        pk = jnp.pad(k, ((0, 0), (0, Npad - N), (0, 0)))
        pv = jnp.pad(v, ((0, 0), (0, Npad - N), (0, 0)))
        pnm = jnp.pad(nm, (0, Npad - N))
        adj = np.zeros((Npad, Npad), bool)
        adj[np.asarray(eq)[np.asarray(em)],
            np.asarray(ek)[np.asarray(em)]] = True
        d = np.arange(N)
        adj[d, d] = True
        S = FG.occupied_blocks_total(adj, 32, 32)
        mask_blocks, cplan, cplan_t = \
            FG.make_compact_structure_from_edges(
                eq, ek, em, pnm, Npad, 32, 32, max_slots=S)
        out, lse = FG.flash_geometric_attention_lse(
            pq, pk, pv, mask_blocks, block_m=32, block_n=32,
            plan=cplan, plan_t=cplan_t)
        outs.append((np.asarray(out)[:, :N], np.asarray(lse)[:, :N]))
    np.testing.assert_allclose(outs[0][0], outs[1][0], rtol=1e-6)
    np.testing.assert_allclose(outs[0][1], outs[1][1], rtol=1e-6)
