"""Ad-hoc probe (round 5, VERDICT r4 item 4): where do the ~280 ms
between 4x apply_hybrid (427 ms) and encode_spatial (709.7 ms) live at
the 131K hybrid bench? Variants measured fwd+bwd, chained in one jit:

  A  encode_spatial, grad wrt params        (the bench's spatial_fb)
  B  encode_spatial, grad wrt x input       (params held constant)
  C  encode_spatial forward only
  D  one_layer variant (num_layers=1)       fixed-overhead solve
  E  hand-rolled encode: same layer math, python loop over T instead
     of lax.map, grad wrt x                 (lax.map suspect)
"""
import os as _os, sys as _sys
_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))
import json
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
from bench_partition_stress import _snaps  # noqa: E402

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402
import tagan_tpu as tt  # noqa: E402

N, DEG, T, F = 131_072, 16, 2, 8
W = max(N // 256, 8)
snaps, E = _snaps(N, DEG, T, F, locality=0.95, width=W)
with jax.default_device(jax.devices("cpu")[0]):
    seq = tt.build_sequence(snaps, max_nodes=N, max_edges=E, max_time=T,
                            dense_adj=False)
    seq = seq.with_hybrid_plan(block_m=512, block_n=1024)
seq = jax.device_put(seq)
cfg = tt.TAGANConfig(hidden_dim=64, num_heads=4, num_layers=2,
                     node_feature_dim=F, output_dim=1, loss_type="bce",
                     dropout=0.0, spatial_backend="hybrid", remat=False)
model = tt.TAGAN(cfg)
params = model.init(jax.random.key(0))
ITERS = 5
STEPS = ITERS  # chained steps inside one jit


def timeit(label, fn, *args):
    jf = jax.jit(fn)
    r = jf(*args)
    float(jnp.sum(r if not isinstance(r, tuple) else r[0]))
    t0 = time.perf_counter()
    r = jf(*args)
    float(jnp.sum(r if not isinstance(r, tuple) else r[0]))
    ms = (time.perf_counter() - t0) / STEPS * 1e3
    print(json.dumps({label: round(ms, 1)}), flush=True)
    return ms


def chain_p(f):
    def run(p):
        def it(c, i):
            g = jax.grad(f)(c)
            return jax.tree_util.tree_map(
                lambda a, b: a + 1e-9 * b, c, g), 0
        c, _ = jax.lax.scan(it, p, jnp.arange(STEPS))
        return jax.tree_util.tree_reduce(
            lambda a, b: a + jnp.sum(b.astype(jnp.float32)), c, 0.0)
    return run


def chain_x(f):
    def run(x):
        def it(c, i):
            g = jax.grad(f)(c)
            return c + 1e-9 * g, 0
        c, _ = jax.lax.scan(it, x, jnp.arange(STEPS))
        return jnp.sum(c)
    return run


# A: grad wrt params
timeit("A_grad_params_ms", chain_p(
    lambda pp: jnp.sum(model.encode_spatial(pp, seq) ** 2)), params)

# B: grad wrt x (inject via node feature input path: differentiate wrt
# a replacement of seq.x)
import dataclasses  # noqa: E402


def f_x(xx):
    s2 = dataclasses.replace(seq, x=xx)
    return jnp.sum(model.encode_spatial(params, s2) ** 2)


timeit("B_grad_x_ms", chain_x(f_x), seq.x)


# C: forward only
def fwd_chain(xx):
    def it(c, i):
        s2 = dataclasses.replace(seq, x=c)
        out = model.encode_spatial(params, s2)
        return c + 1e-9 * out[:, :, :F], 0
    c, _ = jax.lax.scan(it, xx, jnp.arange(STEPS))
    return jnp.sum(c)


timeit("C_forward_only_ms", fwd_chain, seq.x)

# D: one-layer model
cfg1 = dataclasses.replace(cfg, num_layers=1)
model1 = tt.TAGAN(cfg1)
params1 = model1.init(jax.random.key(0))
timeit("D_one_layer_grad_params_ms", chain_p(
    lambda pp: jnp.sum(model1.encode_spatial(pp, seq) ** 2)), params1)


# E: hand-rolled python-loop-over-T encode (no lax.map), grad wrt x
def f_loop(xx):
    c = cfg
    p = params
    from tagan_tpu.core import module as M
    ga = model.graph_attention
    x = M.linear(p["node_embedding"], xx)
    outs = []
    for t in range(T):
        xt = x[t]
        sk = xt
        rp = tuple(a[t] for a in seq.hyb_res_pad)
        cp = tuple(tuple(a[t] for a in b) for b in seq.hyb_res_cpad)
        for i in range(c.num_layers):
            lp = p["geometric_layers"][f"layer_{i}"]
            xt = ga.inner.apply_hybrid(
                lp["attn"], xt, seq.hyb_mask_blocks[t],
                tuple(a[t] for a in seq.hyb_plan),
                tuple(a[t] for a in seq.hyb_plan_t),
                seq.hyb_res[0][t], seq.hyb_res[1][t], seq.hyb_res[2][t],
                seq.node_mask[t], block_m=512, block_n=1024,
                res_pad=rp, res_cpad=cp)
            if i == 0:
                xt = xt + M.layer_norm(p["skip_layer_norm"], sk)
        outs.append(xt)
    return jnp.sum(jnp.stack(outs) ** 2)


timeit("E_unrolled_grad_x_ms", chain_x(f_loop), seq.x)
