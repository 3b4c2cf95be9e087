"""BASELINE config 5 (scaled-down validation): edge-partitioned stress.

The real config — 1M nodes / 100M edges over N>=2 hosts — needs a pod
slice this environment doesn't have (one chip, no multi-host). What CAN
be validated here, per VERDICT round 1 item 2:

  part A (virtual 8-device CPU mesh): one full training step through
      spatial_backend="ring" with the boundary-only halo at 100K-node
      scale — proves the >HBM-graph formulation executes end-to-end
      with real shardings, and records the halo traffic accounting
      (bytes full-ring vs boundary-ring, beta). Wall-clock on 2 host
      cores is NOT a throughput claim.

  part B (single real TPU chip): the per-chip memory-budget row of the
      SCALING.md table — a 131K-node / 2M-edge snapshot sequence
      through the O(E) csr backend (dense [N,N] anything is impossible
      at this size), fwd+bwd+Adam, measured edges/s. This is the
      workload one graph shard of the 1M-node config handles.

  part C (single real TPU chip): the same 131K-node scale through the
      round-3 HYBRID backend — band edges (the post-RCM locality
      structure real graphs have, same locality=0.95 premise as part A)
      via the flash kernel with COMPACT occupied-block masks (mask HBM
      scales with occupied blocks, not the impossible 17 GB [N, N]),
      residual long-range edges via the csr partial, merged exactly by
      logsumexp. Reports edges/s vs part B's csr wall.

    python benchmarks/bench_partition_stress.py cpu|tpu|hybrid [quick]
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
        jax.config.update("jax_compilation_cache_dir", "/tmp/tagan_jax_cache")
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 5)
    except Exception:
        pass
_cache()



def _snaps(N, deg, T, F, seed=0, locality=0.0, width=None):
    """locality in [0, 1): that fraction of edges stay within +-width
    of their source (the structure RCM reordering gives real graphs —
    and what makes boundary-only halo exchange pay: only nodes within
    `width` of a shard edge, plus random-edge endpoints, export)."""
    rng = np.random.default_rng(seed)
    E = N * deg
    src = rng.integers(0, N, E).astype(np.int64)
    dst = rng.integers(0, N, E).astype(np.int64)
    if locality > 0:
        w = width or max(N // 256, 8)
        sel = rng.random(E) < locality
        near = np.clip(src + rng.integers(-w, w + 1, E), 0, N - 1)
        dst = np.where(sel, near, dst)
    return [{"x": rng.standard_normal((N, F)).astype(np.float32),
             "edge_index": np.stack([src, dst]),
             "node_ids": list(range(N)), "timestep": float(t)}
            for t in range(T)], E


def part_a_cpu(quick=False):
    _os.environ["XLA_FLAGS"] = (_os.environ.get("XLA_FLAGS", "") +
                                " --xla_force_host_platform_device_count=8")
    import jax
    jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp
    import optax
    import tagan_tpu as tt
    from tagan_tpu.dist.mesh import make_mesh
    from tagan_tpu.dist.edge_partition import boundary_traffic_report

    N, DEG, T, F, G = (4096 if quick else 98_304), 8, 2, 8, 8
    # 95% local edges: the post-RCM structure of real graphs (SCALING.md)
    snaps, E = _snaps(N, DEG, T, F, locality=0.95)
    t0 = time.time()
    seq = tt.build_sequence(snaps, max_nodes=N, max_edges=E, max_time=T,
                            dense_adj=False)
    seq = seq.with_ring_plan(G, boundary=True)
    host_s = time.time() - t0
    Bp = int(seq.ring_bnd_idx.shape[-1])
    per = N // G
    rep = boundary_traffic_report(N, G, Bp, 2, 16, beta=Bp / per)
    print(f"host packing+plan: {host_s:.0f}s, Bp={Bp}/{per} "
          f"(beta_padded={Bp / per:.3f})", flush=True)

    mesh = make_mesh(data=1, graph=G, devices=jax.devices("cpu")[:G])
    cfg = tt.TAGANConfig(hidden_dim=32, num_heads=2, num_layers=1,
                         node_feature_dim=F, output_dim=1,
                         loss_type="bce", dropout=0.0,
                         spatial_backend="ring", remat=True)
    model = tt.TAGAN(cfg, mesh=mesh)
    tx = optax.adam(1e-3)
    params = model.init(jax.random.key(0))
    opt = tx.init(params)
    lbl = jnp.asarray(1.0)

    @jax.jit
    def step(p, o, s):
        loss, g = jax.value_and_grad(lambda pp: model(pp, s, lbl).loss)(p)
        up, o = tx.update(g, o, p)
        return optax.apply_updates(p, up), o, loss

    t0 = time.time()
    p2, o2, loss = step(params, opt, seq)
    loss = float(loss)
    compile_s = time.time() - t0
    t0 = time.time()
    _, _, loss2 = step(p2, o2, seq)
    step_s = max(time.time() - t0, 1e-9)
    assert np.isfinite(loss) and np.isfinite(float(loss2))
    out = {
        "part": "A ring+boundary on 8-virtual-CPU mesh",
        "nodes": N, "edges_per_snapshot": E, "snapshots": T,
        "shards": G, "loss": round(loss, 4),
        "compile_s": round(compile_s, 1),
        "step_s_cpu_2core": round(step_s, 2),
        "edges_per_s_cpu": round(E * T / step_s, 0),
        "halo_traffic": rep,
    }
    print(json.dumps(out))
    return out


def part_b_tpu(quick=False):
    import jax
    import jax.numpy as jnp
    import optax
    import tagan_tpu as tt

    N, DEG, T, F = (8192 if quick else 131_072), 16, 2, 8
    snaps, E = _snaps(N, DEG, T, F)
    seq = tt.build_sequence(snaps, max_nodes=N, max_edges=E, max_time=T,
                            dense_adj=False)
    seq = jax.device_put(seq)
    cfg = tt.TAGANConfig(hidden_dim=64, num_heads=4, num_layers=2,
                         node_feature_dim=F, output_dim=1,
                         loss_type="bce", dropout=0.0,
                         spatial_backend="csr", remat=True)
    model = tt.TAGAN(cfg)
    tx = optax.adam(1e-3)
    params = model.init(jax.random.key(0))
    opt = tx.init(params)
    lbl = jnp.asarray(1.0)
    ITERS = 2 if quick else 5

    @jax.jit
    def many(p, o, s):
        def body(_, carry):
            p, o = carry
            loss, g = jax.value_and_grad(
                lambda pp: model(pp, s, lbl).loss)(p)
            up, o = tx.update(g, o, p)
            return optax.apply_updates(p, up), o
        p, o = jax.lax.fori_loop(0, ITERS, body, (p, o))
        return jax.tree_util.tree_reduce(
            lambda a, b: a + jnp.sum(b.astype(jnp.float32)), p, 0.0)

    chk = float(many(params, opt, seq))
    assert np.isfinite(chk)
    t0 = time.perf_counter()
    float(many(params, opt, seq))
    dt = (time.perf_counter() - t0) / ITERS
    out = {
        "part": "B 131K-node csr single chip (one 1M/8 graph shard)",
        "nodes": N, "edges_per_snapshot": E, "snapshots": T,
        "ms_per_step": round(dt * 1e3, 1),
        "edges_per_s": round(E * T / dt, 0),
    }
    print(json.dumps(out))
    return out


def part_c_hybrid(quick=False):
    """131K nodes through the hybrid band+residual backend on one chip.

    Same 95%-local structure as part A (the post-RCM band of real
    graphs; a uniformly random graph has no locality for ANY sparse
    method to exploit — it occupies every [512, 1024] block, see
    results_partition_tpu.json's csr row for that wall)."""
    import jax
    import jax.numpy as jnp
    import optax
    import tagan_tpu as tt

    N, DEG, T, F = (8192 if quick else 131_072), 16, 2, 8
    W = max(N // 256, 8)
    # BIAS=1: the edge-biased hybrid (double softmax union-exact across
    # the band/residual split) — plans must use block_m=256 (the biased
    # backward's scoped-VMEM rule) and edge features ride the stream
    biased = _os.environ.get("BIAS", "0") == "1"
    snaps, E = _snaps(N, DEG, T, F, locality=0.95, width=W)
    if biased:
        rng_b = np.random.default_rng(1)
        for s in snaps:
            s["edge_attr"] = rng_b.standard_normal(
                (E, 4)).astype(np.float32)
    t0 = time.time()
    # host-side prep stays on the CPU backend: build_sequence commits
    # to the default device, and with_hybrid_plan reads arrays back —
    # a device round-trip through the TPU relay costs ~60 s where the
    # CPU path costs ~0.1 s (CLAUDE.md gotcha)
    with jax.default_device(jax.devices("cpu")[0]):
        seq = tt.build_sequence(snaps, max_nodes=N, max_edges=E,
                                max_time=T, dense_adj=False,
                                edge_feature_dim=4 if biased else None)
        seq = seq.with_hybrid_plan(block_m=256 if biased else 512,
                                   block_n=1024)
    host_s = time.time() - t0
    S = int(seq.hyb_mask_blocks.shape[1])
    n_blocks_full = (N // 512) * ((N + 1023) // 1024)
    mask_mb = float(np.prod(seq.hyb_mask_blocks.shape)) / 2**20
    res_edges = int(seq.hyb_res[2].sum())
    seq = jax.device_put(seq)
    # remat=False: hybrid activations at 131K are ~70 MB/layer-pass
    # (well within HBM) and remat would re-run the expensive sparse
    # forward during backward — measured slower here
    cfg = tt.TAGANConfig(hidden_dim=64, num_heads=4, num_layers=2,
                         node_feature_dim=F, output_dim=1,
                         loss_type="bce", dropout=0.0,
                         edge_feature_dim=4 if biased else 0,
                         use_edge_features=biased,
                         # biased defaults to remat (round 4: without
                         # it the four passes' separate 1 GB bias-store
                         # residuals exceeded HBM, 22.4 G / 15.75 G).
                         # Round 5's one-store-per-snapshot build may
                         # alias across layers — REMAT=0 probes that.
                         spatial_backend="hybrid",
                         remat=(biased and _os.environ.get(
                             "REMAT", "1") == "1"))
    model = tt.TAGAN(cfg)
    tx = optax.adam(1e-3)
    params = model.init(jax.random.key(0))
    opt = tx.init(params)
    lbl = jnp.asarray(1.0)
    ITERS = 2 if quick else 5

    @jax.jit
    def many(p, o, s):
        def body(_, carry):
            p, o = carry
            loss, g = jax.value_and_grad(
                lambda pp: model(pp, s, lbl).loss)(p)
            up, o = tx.update(g, o, p)
            return optax.apply_updates(p, up), o
        p, o = jax.lax.fori_loop(0, ITERS, body, (p, o))
        return jax.tree_util.tree_reduce(
            lambda a, b: a + jnp.sum(b.astype(jnp.float32)), p, 0.0)

    chk = float(many(params, opt, seq))
    assert np.isfinite(chk)
    # median of reps: chip/relay wall-clock varies ±15% between runs
    # (measured round 5) — single-shot timings are not comparable
    dts = []
    for _ in range(1 if quick else 3):
        t0 = time.perf_counter()
        float(many(params, opt, seq))
        dts.append((time.perf_counter() - t0) / ITERS)
    dt = float(np.median(dts))

    import jax.numpy as jnp2
    H, Dh = cfg.num_heads, cfg.hidden_dim // cfg.num_heads
    reps = cfg.num_layers * T * ITERS   # layer-passes per `many`

    def timeit(fn, *args):
        jf = jax.jit(fn)
        r = jf(*args)
        float(jnp2.sum(r[0] if isinstance(r, tuple) else r))
        ts = []
        for _ in range(1 if quick else 3):
            t0 = time.perf_counter()
            r = jf(*args)
            float(jnp2.sum(r[0] if isinstance(r, tuple) else r))
            ts.append((time.perf_counter() - t0) / reps * 1e3)
        return float(np.median(ts))

    if biased:
        # step result FIRST (measured above): persist before the phase
        # timers — their large compiles have crashed the compile relay
        out = {
            "part": "C-biased 131K-node hybrid + edge-feature bias "
                    "(union-exact double softmax) single chip",
            "nodes": N, "edges_per_snapshot": E, "snapshots": T,
            "locality": 0.95, "band_width": W, "block_m": 256,
            "residual_layout": "compact"
            if seq.hyb_res_cbid is not None else "padded",
            "host_prep_s": round(host_s, 1),
            "ms_per_step": round(dt * 1e3, 1),
            "ms_per_step_reps": [round(d * 1e3, 1) for d in dts],
            "edges_per_s": round(E * T / dt, 0),
        }
        print(json.dumps(out), flush=True)
        path = _os.path.join(
            _os.path.dirname(_os.path.abspath(__file__)),
            "results_partition_hybrid_biased.json")
        with open(path, "w") as f:
            json.dump(out, f, indent=1)

        # ---- biased phase attribution (VERDICT r4 item 1): isolated
        # biased layer-pass (compact residual) + the bias plumbing
        # (hoisted L-payload scatter + compact provenance gathers),
        # fwd+bwd chained like the unbiased phases.
        inner = model.graph_attention.inner
        lp0 = params["geometric_layers"]["layer_0"]["attn"]
        S_b = int(seq.hyb_mask_blocks.shape[1])
        BMb = int(seq.hyb_mask_blocks.shape[2])
        n_ib = seq.hyb_plan[1].shape[1]
        n_jb = seq.hyb_plan_t[1].shape[1]
        BNb = (n_ib * BMb) // n_jb
        key = jax.random.key(21)
        x0 = jax.random.normal(key, (N, cfg.hidden_dim), jnp.float32)
        bb0 = jax.random.normal(jax.random.key(22), (S_b, BMb, BNb),
                                jnp.float32) * 0.1
        cp0 = tuple(tuple(a[0] for a in b) for b in seq.hyb_res_cpad)
        rbc0 = tuple(
            jax.random.normal(jax.random.key(23 + i),
                              tuple(b[1].shape[1:]), jnp.float32) * 0.1
            for i, b in enumerate(seq.hyb_res_cpad))
        mb0 = seq.hyb_mask_blocks[0]
        pl0 = tuple(a[0] for a in seq.hyb_plan)
        plt0 = tuple(a[0] for a in seq.hyb_plan_t)
        req0, rek0, rem0 = (a[0] for a in seq.hyb_res)
        rp0 = tuple(a[0] for a in seq.hyb_res_pad)
        nm0 = seq.node_mask[0]

        def biased_layer_fb(x):
            # jax.checkpoint mirrors the model's remat'd shape — the
            # un-remat'd backward graph has repeatedly crashed the
            # remote compile server at this scale
            @jax.checkpoint
            def f(xx):
                out = inner.apply_hybrid(
                    lp0, xx, mb0, pl0, plt0, req0, rek0, rem0, nm0,
                    block_m=BMb, block_n=BNb, res_pad=rp0,
                    band_bias=bb0, res_bias=None, res_cpad=cp0,
                    res_cbias=list(rbc0))
                return jnp2.sum(out ** 2)

            def one(c, _):
                g = jax.grad(f)(c)
                return c + 1e-6 * g, 0
            c, _ = jax.lax.scan(one, x, jnp2.arange(reps))
            return c

        def _try(f, *a):
            try:
                return f(*a)
            except Exception as e:   # phase timers are best-effort
                print(json.dumps({"phase_error": str(e)[:200]}),
                      flush=True)
                return float("nan")

        biased_layer_ms = _try(timeit, biased_layer_fb, x0)

        # bias plumbing: the hoisted all-layer scatter + compact
        # provenance gathers, fwd+bwd, per STEP
        L = cfg.num_layers
        bst0 = jax.random.normal(jax.random.key(31),
                                 (T, E, L), jnp.float32)
        sl_all = jnp.where(seq.hyb_band_slot >= 0, seq.hyb_band_slot,
                           S_b)
        cbid = seq.hyb_res_cbid

        def plumb_fb(bst):
            # the model's round-5 formulation: _scatter_bias_store
            # (L scalar flat scatters fwd / one L-gather bwd) per
            # snapshot + the compact-provenance residual gathers
            from tagan_tpu.nn.model import _scatter_bias_store
            P_ = S_b * BMb * BNb

            def f(bs):
                tot = 0.0
                for t in range(T):
                    bslot_t = seq.hyb_band_slot[t]
                    pos = jnp2.where(
                        bslot_t >= 0,
                        bslot_t * (BMb * BNb)
                        + (seq.edge_src[t] % BMb) * BNb
                        + seq.edge_dst[t] % BNb, P_)
                    bb = _scatter_bias_store(bs[t], pos, P_)
                    tot = tot + jnp2.sum(bb ** 2)
                for cb in cbid:
                    r = jax.vmap(
                        lambda bt, cbt: jnp2.where(
                            (cbt >= 0)[..., None],
                            bt[jnp2.clip(cbt, 0, E - 1)], 0.0))(bs, cb)
                    tot = tot + jnp2.sum(r ** 2)
                return tot

            def one(c, _):
                g = jax.grad(f)(c)
                return c + 1e-6 * g, 0
            c, _ = jax.lax.scan(one, bst, jnp2.arange(ITERS))
            return c

        plumb_ms = _try(timeit, plumb_fb, bst0) * reps / ITERS

        # spatial encode fwd+bwd (full biased attention incl. glue)
        def spatial_fb(p, s):
            def f(pp):
                enc = model.encode_spatial(pp, s)
                return jnp2.sum(enc ** 2)

            def it(c, i):
                g = jax.grad(f)(c)
                return jax.tree_util.tree_map(
                    lambda a, b: a + 1e-9 * b, c, g), 0
            c, _ = jax.lax.scan(it, p, jnp2.arange(ITERS))
            return jax.tree_util.tree_reduce(
                lambda a, b: a + jnp2.sum(b.astype(jnp2.float32)),
                c, 0.0)

        def _spatial():
            jsp = jax.jit(spatial_fb)
            float(jsp(params, seq))
            sps = []
            for _ in range(1 if quick else 3):
                t0 = time.perf_counter()
                float(jsp(params, seq))
                sps.append((time.perf_counter() - t0) / ITERS * 1e3)
            return float(np.median(sps))

        spatial_ms = _try(_spatial)

        phases = {
            "biased_layerpass_ms": round(biased_layer_ms, 2),
            "biased_layerpass_ms_per_step": round(
                biased_layer_ms * cfg.num_layers * T, 1),
            "bias_plumbing_ms_per_step": round(plumb_ms, 1),
            "spatial_encode_ms_per_step": round(spatial_ms, 1),
            "rest_ms_per_step": round(dt * 1e3 - spatial_ms, 1),
        }
        print(json.dumps(phases), flush=True)
        out = {
            "part": "C-biased 131K-node hybrid + edge-feature bias "
                    "(union-exact double softmax) single chip",
            "nodes": N, "edges_per_snapshot": E, "snapshots": T,
            "locality": 0.95, "band_width": W, "block_m": 256,
            "residual_layout": "compact"
            if seq.hyb_res_cbid is not None else "padded",
            "host_prep_s": round(host_s, 1),
            "ms_per_step": round(dt * 1e3, 1),
            "ms_per_step_reps": [round(d * 1e3, 1) for d in dts],
            "edges_per_s": round(E * T / dt, 0),
            "phases": phases,
        }
        print(json.dumps(out))
        path = _os.path.join(
            _os.path.dirname(_os.path.abspath(__file__)),
            "results_partition_hybrid_biased.json")
        with open(path, "w") as f:
            json.dump(out, f, indent=1)
        return out

    # ---- phase breakdown (VERDICT r4 item 2): time the hybrid
    # attention's two partials in isolation (fwd+bwd through the same
    # kernels/layouts the model uses), chained inside one jit like the
    # full step. "rest" = full step minus the spatial encode.
    import jax.numpy as jnp2
    from tagan_tpu.nn.geometric import GeometricAttention
    from tagan_tpu.ops.pallas.flash_geometric import \
        flash_geometric_attention_lse
    from tagan_tpu.ops import sparse as SP
    H, Dh = cfg.num_heads, cfg.hidden_dim // cfg.num_heads
    key = jax.random.key(7)
    qkv = jax.random.normal(key, (3, H, N, Dh), jnp.float32)
    reps = cfg.num_layers * T * ITERS   # layer-passes per `many`

    def timeit(fn, *args):
        jf = jax.jit(fn)
        r = jf(*args)
        float(jnp2.sum(r[0] if isinstance(r, tuple) else r))
        t0 = time.perf_counter()
        r = jf(*args)
        float(jnp2.sum(r[0] if isinstance(r, tuple) else r))
        return (time.perf_counter() - t0) / reps * 1e3

    mb = seq.hyb_mask_blocks
    pl_ = tuple(a for a in seq.hyb_plan)
    plt_ = tuple(a for a in seq.hyb_plan_t)

    def band_fb(qkv):
        def one(c, t):
            def f(qq):
                o, lse = flash_geometric_attention_lse(
                    qq[0], qq[1], qq[2], mb[t],
                    plan=tuple(x[t] for x in pl_),
                    plan_t=tuple(x[t] for x in plt_),
                    block_m=512, block_n=1024)
                return jnp2.sum(o ** 2) + jnp2.sum(
                    jnp2.where(jnp2.abs(lse) < 1e29, lse, 0.0))
            g = jax.grad(f)(c)
            return c + 1e-6 * g, 0

        def layer(c, i):
            c, _ = jax.lax.scan(one, c, jnp2.arange(T))
            return c, 0
        c, _ = jax.lax.scan(layer, qkv,
                            jnp2.arange(cfg.num_layers * ITERS))
        return c

    def res_fb(qkv):
        rp = seq.hyb_res_pad
        cp = seq.hyb_res_cpad

        def one(c, t):
            def f(qq):
                if cp is not None:
                    o, lse = SP.edge_attention_partial_padded_compact(
                        "scaled_dot_product", qq[0], qq[1], qq[2],
                        tuple(tuple(a[t] for a in b) for b in cp))
                else:
                    o, lse = SP.edge_attention_partial_padded(
                        "scaled_dot_product", qq[0], qq[1], qq[2],
                        *(x[t] for x in rp))
                return jnp2.sum(o ** 2) + jnp2.sum(
                    jnp2.where(jnp2.abs(lse) < 1e29, lse, 0.0))
            g = jax.grad(f)(c)
            return c + 1e-6 * g, 0

        def layer(c, i):
            c, _ = jax.lax.scan(one, c, jnp2.arange(T))
            return c, 0
        c, _ = jax.lax.scan(layer, qkv,
                            jnp2.arange(cfg.num_layers * ITERS))
        return c

    band_ms = timeit(band_fb, qkv)
    res_ms = timeit(res_fb, qkv)

    # ---- one level further down (VERDICT r4 item 4): attribute the
    # glue around the two kernels — QKV/LN/head-split, the partial
    # merge, head-merge/out-proj/residual/LN2 — and measure ONE full
    # apply_hybrid layer-pass in isolation so unattributed time is
    # pinned to a named slice instead of "the rest of encode_spatial".
    from tagan_tpu.core import module as M2
    inner = model.graph_attention.inner
    lp0 = params["geometric_layers"]["layer_0"]["attn"]
    x0 = jax.random.normal(jax.random.key(11), (N, cfg.hidden_dim),
                           jnp.float32)
    mb0 = mb[0]
    pl0 = tuple(x[0] for x in pl_)
    plt0 = tuple(x[0] for x in plt_)
    req0, rek0, rem0 = (x[0] for x in seq.hyb_res)
    rp0 = (tuple(x[0] for x in seq.hyb_res_pad)
           if seq.hyb_res_pad is not None else None)
    cp0 = (tuple(tuple(a[0] for a in b) for b in seq.hyb_res_cpad)
           if seq.hyb_res_cpad is not None else None)
    nm0 = seq.node_mask[0]

    def chain(f_scalar, x0):
        """fwd+bwd of f_scalar chained `reps` times with a data dep."""
        def one(c, _):
            g = jax.grad(f_scalar)(c)
            return jax.tree_util.tree_map(
                lambda a, b: a + 1e-6 * b, c, g), 0
        c, _ = jax.lax.scan(one, x0, jnp2.arange(reps))
        return c

    def glue_qkv_fb(x):
        def f(xx):
            h = M2.layer_norm(lp0["ln1"], xx)
            q = inner._split_heads(M2.linear(lp0["q"], h))
            k = inner._split_heads(M2.linear(lp0["k"], h))
            v = inner._split_heads(M2.linear(lp0["v"], h))
            return jnp2.sum(q ** 2) + jnp2.sum(k ** 2) + jnp2.sum(v ** 2)
        return chain(f, x)

    def glue_post_fb(ctx0):
        def f(cc):
            ctx = inner._merge_heads(cc)
            ctx = M2.linear(lp0["o"], ctx)
            out = ctx + x0
            out = M2.layer_norm(lp0["ln2"], out)
            out = jnp2.where(nm0[:, None], out, x0)
            return jnp2.sum(out ** 2)
        return chain(f, ctx0)

    def merge_fb(parts0):
        def f(pp):
            o, lse = SP.merge_attention_partials(
                [(pp[0], pp[2]), (pp[1], pp[3])])
            return jnp2.sum(o ** 2) + jnp2.sum(
                jnp2.where(jnp2.abs(lse) < 1e29, lse, 0.0))
        return chain(f, parts0)

    def apply_hybrid_fb(x):
        def f(xx):
            out = inner.apply_hybrid(
                lp0, xx, mb0, pl0, plt0, req0, rek0, rem0, nm0,
                block_m=512, block_n=1024, res_pad=rp0, res_cpad=cp0)
            return jnp2.sum(out ** 2)
        return chain(f, x)

    glue_qkv_ms = timeit(glue_qkv_fb, x0)
    ctx0 = jax.random.normal(jax.random.key(12), (H, N, Dh), jnp.float32)
    glue_post_ms = timeit(glue_post_fb, ctx0)
    parts0 = (jax.random.normal(jax.random.key(13), (2, H, N, Dh))[0],
              jax.random.normal(jax.random.key(14), (2, H, N, Dh))[0],
              jax.random.normal(jax.random.key(15), (2, H, N))[0],
              jax.random.normal(jax.random.key(16), (2, H, N))[0])
    parts0 = jax.tree_util.tree_map(jnp.asarray, parts0)
    merge_ms = timeit(merge_fb, parts0)
    layer_ms = timeit(apply_hybrid_fb, x0)
    sub = {
        "glue_qkv_ln_split_ms": round(glue_qkv_ms, 2),
        "glue_merge_heads_oproj_ln2_ms": round(glue_post_ms, 2),
        "glue_partial_merge_ms": round(merge_ms, 2),
        "apply_hybrid_layerpass_ms": round(layer_ms, 2),
        "layerpass_unattributed_ms": round(
            layer_ms - band_ms - res_ms - glue_qkv_ms - glue_post_ms
            - merge_ms, 2),
    }
    print(json.dumps(sub), flush=True)

    # spatial encode (the full hybrid attention incl. QKV/LN/merge)
    def spatial_fb(p, s):
        def f(pp):
            enc = model.encode_spatial(pp, s)
            return jnp2.sum(enc ** 2)

        def it(c, i):
            g = jax.grad(f)(c)
            return jax.tree_util.tree_map(
                lambda a, b: a + 1e-9 * b, c, g), 0
        c, _ = jax.lax.scan(it, p, jnp2.arange(ITERS))
        return jax.tree_util.tree_reduce(
            lambda a, b: a + jnp2.sum(b.astype(jnp2.float32)), c, 0.0)

    jsp = jax.jit(spatial_fb)
    float(jsp(params, seq))
    t0 = time.perf_counter()
    float(jsp(params, seq))
    spatial_ms = (time.perf_counter() - t0) / ITERS * 1e3

    phases = {
        "band_flash_ms_per_layerpass": round(band_ms, 2),
        "residual_padded_ms_per_layerpass": round(res_ms, 2),
        "band_flash_ms_per_step": round(band_ms * cfg.num_layers * T, 1),
        "residual_ms_per_step": round(res_ms * cfg.num_layers * T, 1),
        "spatial_encode_ms_per_step": round(spatial_ms, 1),
        "rest_ms_per_step": round(dt * 1e3 - spatial_ms, 1),
        **sub,
    }
    print(json.dumps(phases), flush=True)

    out = {
        "part": "C 131K-node hybrid (band flash w/ compact masks + "
                "csr residual) single chip",
        "nodes": N, "edges_per_snapshot": E, "snapshots": T,
        "locality": 0.95, "band_width": W,
        "occupied_slots": S, "slots_of_full": n_blocks_full,
        "mask_store_mb": round(mask_mb, 1),
        "residual_edges_per_snapshot": res_edges // T,
        # scatter-free padded-degree residual (round-3): dmax/dmax_t
        # bound the gather tables; no segment scatter anywhere
        "residual_layout": "padded" if seq.hyb_res_pad is not None
        else "coo",
        "residual_dmax": int(seq.hyb_res_pad[0].shape[-1])
        if seq.hyb_res_pad is not None else None,
        "residual_dmax_t": int(seq.hyb_res_pad[2].shape[-1])
        if seq.hyb_res_pad is not None else None,
        "host_prep_s": round(host_s, 1),
        "ms_per_step": round(dt * 1e3, 1),
        "edges_per_s": round(E * T / dt, 0),
        "phases": phases,
    }
    print(json.dumps(out))
    return out


if __name__ == "__main__":
    which = sys.argv[1] if len(sys.argv) > 1 else "cpu"
    quick = "quick" in sys.argv[2:]
    fn = {"cpu": part_a_cpu, "tpu": part_b_tpu,
          "hybrid": part_c_hybrid}[which]
    res = fn(quick)
    path = _os.path.join(_os.path.dirname(_os.path.abspath(__file__)),
                         f"results_partition_{which}.json")
    with open(path, "w") as f:
        json.dump(res, f, indent=1)
