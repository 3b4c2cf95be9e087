"""Benchmark driver: prints ONE JSON line
{"metric": ..., "value": N, "unit": ..., "vs_baseline": N}.

Primary metric: edges/s/chip through the fused per-snapshot geometric
attention (SDDMM + masked segment softmax + SpMM — BASELINE.json north
star), using the Pallas flash kernel. vs_baseline compares against the
mounted PyTorch reference's GeometricAttention executing the same
edge-masked attention on this host's CPU (the only hardware the
reference supports; it publishes no numbers — BASELINE.md).

Timing notes: on this image `block_until_ready` returns before remote
TPU execution completes, so iterations are chained *inside* one jit with
a data dependency and the result is materialized to host.
"""

import json
import os
import sys
import time

import numpy as np


def _workload(N=1024, deg=16, T=8, H=128, heads=8, seed=0):
    rng = np.random.default_rng(seed)
    E = N * deg
    x = rng.standard_normal((T, N, H)).astype(np.float32)
    adj = np.zeros((N, N), bool)
    adj[rng.integers(0, N, E), rng.integers(0, N, E)] = True
    np.fill_diagonal(adj, True)
    n_edges = int(adj.sum()) * T
    return x, adj, n_edges


def bench_tagan_tpu(N=1024, deg=16, T=8, H=128, heads=8, iters=500):
    """Steady-state throughput of the fused attention forward.

    iters is high because this image's TPU relay adds ~26 ms of fixed
    per-call overhead (measured with an empty fori_loop) — at low iter
    counts that fixed cost, not the kernel, dominates the division.
    Block-sparsity plans are precomputed once per graph outside the
    timed loop, exactly as the model uses them (the adjacency is fixed
    per snapshot; plans are shared across layers, steps and fwd/bwd —
    see ops.pallas.flash_geometric.make_block_plan)."""
    import jax
    import jax.numpy as jnp
    from tagan_tpu.nn import GeometricAttention
    from tagan_tpu.ops.pallas.flash_geometric import make_block_plan

    x_np, adj_np, n_edges = _workload(N, deg, T, H, heads)
    attn = GeometricAttention(hidden_dim=H, num_heads=heads, dropout=0.0,
                              distance_metric="scaled_dot_product")
    params = attn.init(jax.random.key(0))
    x = jnp.asarray(x_np)
    adj = jnp.asarray(np.broadcast_to(adj_np, (T, N, N)).copy())
    adj1 = jnp.asarray(adj_np)

    def bcast(plan):   # one per-graph plan, broadcast over the T axis
        return tuple(jnp.broadcast_to(a, (T,) + a.shape) for a in plan)

    plan = bcast(make_block_plan(adj1, 512, 1024))
    plan_t = bcast(make_block_plan(adj1.T, 1024, 512))

    @jax.jit
    def run_many(x, adj, plan, plan_t):
        def body(i, carry):
            out = attn.apply_flash(params, x + carry * 1e-30, adj,
                                   plan=plan, plan_t=plan_t)
            return out[:1, :1, :1] * 0.0 + out[0, 0, 0]
        return jnp.sum(jax.lax.fori_loop(
            0, iters, body, jnp.zeros((1, 1, 1), jnp.float32)))

    float(run_many(x, adj, plan, plan_t))   # compile + warm
    t0 = time.perf_counter()
    float(run_many(x, adj, plan, plan_t))   # host sync forces completion
    dt = (time.perf_counter() - t0) / iters
    return n_edges / dt, T / dt


def bench_reference_torch(N=1024, deg=16, T=8, H=128, heads=8, iters=3):
    """Same workload through the reference GeometricAttention (CPU)."""
    sys.path.insert(0, "/root/reference")
    import contextlib, io
    import torch
    with contextlib.redirect_stdout(io.StringIO()):
        from src.tagan.layers.geometric_attention import GeometricAttention
        ref = GeometricAttention(hidden_dim=H, num_heads=heads, dropout=0.0,
                                 distance_metric="scaled_dot_product").eval()
    x_np, adj_np, n_edges = _workload(N, deg, T, H, heads)
    x = torch.tensor(x_np)
    mask = torch.tensor(adj_np.astype(np.float32))[None]

    with torch.no_grad(), contextlib.redirect_stdout(io.StringIO()):
        for t in range(T):       # warmup
            ref(x[t:t + 1], mask)
        best = float("inf")      # best-of: robust to host CPU contention
        for _ in range(3):
            t0 = time.perf_counter()
            for _ in range(iters):
                for t in range(T):   # reference: snapshots one by one
                    ref(x[t:t + 1], mask)
            best = min(best, (time.perf_counter() - t0) / iters)
    return n_edges / best


def _torch_baseline_subprocess() -> float:
    """Run the torch reference benchmark in a fresh subprocess — torch
    imported after jax/TPU use in the same process deadlocks
    intermittently on this image."""
    import subprocess
    out = subprocess.run(
        [sys.executable, "-c",
         "import bench; print(bench.bench_reference_torch())"],
        capture_output=True, text=True, timeout=300,
        cwd=os.path.dirname(os.path.abspath(__file__)))
    return float(out.stdout.strip().splitlines()[-1])


def main():
    edges_per_s, snaps_per_s = bench_tagan_tpu()
    try:
        ref_edges_per_s = _torch_baseline_subprocess()
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
