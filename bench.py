"""Benchmark driver: prints ONE JSON line
{"metric": ..., "value": N, "unit": ..., "vs_baseline": N}.

Primary metric: edges/s/chip through the per-snapshot geometric
attention (the SDDMM + segment-softmax + SpMM workload — BASELINE.json
north star). vs_baseline compares against the mounted PyTorch
reference's GeometricAttention executing the same edge-masked dense
attention on this host's CPU (the only hardware the reference supports
here; it has no published numbers — BASELINE.md).

Config: the "distance-metric sweep"-shaped stress config — N nodes,
deg-16 random graph, 8 heads — sized for one chip.
"""

import json
import os
import sys
import time

import numpy as np


def bench_tagan_tpu(N=1024, deg=16, T=8, H=128, heads=8, iters=20):
    import jax
    import jax.numpy as jnp
    from tagan_tpu.nn import GeometricAttention

    rng = np.random.default_rng(0)
    E = N * deg
    attn = GeometricAttention(hidden_dim=H, num_heads=heads, dropout=0.0,
                              distance_metric="scaled_dot_product")
    params = attn.init(jax.random.key(0))
    x = jnp.asarray(rng.standard_normal((T, N, H)), jnp.float32)
    adj_np = np.zeros((N, N), bool)
    src = rng.integers(0, N, E)
    dst = rng.integers(0, N, E)
    adj_np[src, dst] = True
    np.fill_diagonal(adj_np, True)
    adj = jnp.asarray(np.broadcast_to(adj_np, (T, N, N)).copy())

    @jax.jit
    def run(x):
        return jax.vmap(lambda xt, at: attn(params, xt, at))(x, adj)

    run(x).block_until_ready()  # compile
    t0 = time.perf_counter()
    for _ in range(iters):
        out = run(x)
    out.block_until_ready()
    dt = (time.perf_counter() - t0) / iters
    n_edges = int(adj_np.sum()) * T
    return n_edges / dt, T / dt, dt


def bench_reference_torch(N=1024, deg=16, T=8, H=128, heads=8, iters=3):
    """Same workload through the reference GeometricAttention (CPU)."""
    sys.path.insert(0, "/root/reference")
    import contextlib, io
    import torch
    with contextlib.redirect_stdout(io.StringIO()):
        from src.tagan.layers.geometric_attention import GeometricAttention
        ref = GeometricAttention(hidden_dim=H, num_heads=heads, dropout=0.0,
                                 distance_metric="scaled_dot_product").eval()
    rng = np.random.default_rng(0)
    E = N * deg
    x = torch.tensor(rng.standard_normal((T, N, H)).astype(np.float32))
    adj_np = np.zeros((N, N), np.float32)
    src = rng.integers(0, N, E)
    dst = rng.integers(0, N, E)
    adj_np[src, dst] = 1
    np.fill_diagonal(adj_np, 1)
    mask = torch.tensor(adj_np)[None]

    with torch.no_grad(), contextlib.redirect_stdout(io.StringIO()):
        for t in range(T):       # warmup one pass
            ref(x[t:t + 1], mask)
        t0 = time.perf_counter()
        for _ in range(iters):
            for t in range(T):   # reference processes snapshots one by one
                ref(x[t:t + 1], mask)
        dt = (time.perf_counter() - t0) / iters
    n_edges = int(adj_np.sum()) * T
    return n_edges / dt


def main():
    edges_per_s, snaps_per_s, dt = bench_tagan_tpu()
    try:
        ref_edges_per_s = bench_reference_torch()
        vs = edges_per_s / ref_edges_per_s
    except Exception:
        vs = 0.0
    print(json.dumps({
        "metric": "edges_per_sec_per_chip",
        "value": round(edges_per_s, 1),
        "unit": "edges/s",
        "vs_baseline": round(vs, 2),
    }))


if __name__ == "__main__":
    main()
