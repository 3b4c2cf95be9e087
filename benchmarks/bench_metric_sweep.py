"""BASELINE config 3: distance-metric sweep + time-encoding sweep with
a regression head — full training step (fwd+bwd+Adam) per variant.

Every kernel variant in one run: the 8 MXU metrics through the flash
backend (Pallas fwd AND bwd — learnable sigma/gamma for the kernel
metrics, low-rank learnable mahalanobis riding the euclidean kernel in
factor space), manhattan through the dense path (not blockwise-MXU
expressible), and the 5 TimeEncoding schemes through the asymmetric
temporal attention. Run on the real TPU:

    python benchmarks/bench_metric_sweep.py [quick]

Prints one line per variant + a JSON summary; ~1 compile per variant.
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

import jax
import jax.numpy as jnp
import optax

import tagan_tpu as tt

QUICK = len(sys.argv) > 1 and sys.argv[1] == "quick"
N, DEG, T, H, HEADS, F = (512 if QUICK else 4096), 16, 8, 64, 4, 16
ITERS = 5 if QUICK else 20

METRICS = [
    # (metric, learnable, backend)
    ("scaled_dot_product", False, "flash"),
    ("dot_product", False, "flash"),
    ("euclidean", False, "flash"),
    ("squared_euclidean", False, "flash"),
    ("cosine_similarity", False, "flash"),
    ("cosine_distance", False, "flash"),
    ("gaussian_kernel", True, "flash"),
    ("rbf_kernel", True, "flash"),
    ("mahalanobis", True, "flash"),
    ("manhattan", False, "dense"),
]
TIME_ENCODINGS = ["basis", "sinusoidal", "linear", "log", "fourier"]


def make_seq(seed=0):
    rng = np.random.default_rng(seed)
    E = N * DEG
    src = rng.integers(0, N, E).astype(np.int64)
    dst = rng.integers(0, N, E).astype(np.int64)
    snaps = [{"x": rng.standard_normal((N, F)).astype(np.float32),
              "edge_index": np.stack([src, dst]),
              "node_ids": list(range(N)), "timestep": float(t)}
             for t in range(T)]
    seq = tt.build_sequence(snaps, max_nodes=N, max_edges=E, max_time=T,
                            dense_adj=True)
    return jax.device_put(seq), E * T


def step_time(cfg, seq, n_edges, label):
    model = tt.TAGAN(cfg)
    tx = optax.adam(1e-3)
    params = model.init(jax.random.key(0))
    opt = tx.init(params)

    @jax.jit
    def many(params, opt, seq):
        def body(_, carry):
            p, o = carry
            loss, g = jax.value_and_grad(
                lambda pp: model(pp, seq, label).loss)(p)
            up, o = tx.update(g, o, p)
            return optax.apply_updates(p, up), o
        p, o = jax.lax.fori_loop(0, ITERS, body, (params, opt))
        return jax.tree_util.tree_reduce(
            lambda a, b: a + jnp.sum(b.astype(jnp.float32)), p, 0.0)

    chk = float(many(params, opt, seq))         # compile + warm
    assert np.isfinite(chk), "non-finite params after training steps"
    t0 = time.perf_counter()
    float(many(params, opt, seq))
    dt = (time.perf_counter() - t0) / ITERS
    return dt * 1e3, n_edges / dt


def main():
    seq, n_edges = make_seq()
    label = jnp.asarray(0.37)                   # regression target
    results = {}

    base = dict(hidden_dim=H, num_heads=HEADS, num_layers=2,
                node_feature_dim=F, output_dim=1, loss_type="mse",
                dropout=0.0)

    for metric, learnable, backend in METRICS:
        cfg = tt.TAGANConfig(distance_metric=metric,
                             learnable_distance=learnable,
                             spatial_backend=backend, **base)
        ms, eps = step_time(cfg, seq, n_edges, label)
        results[f"metric/{metric}"] = {
            "ms_per_step": round(ms, 1),
            "edges_per_s": round(eps, 0),
            "backend": backend, "learnable": learnable}
        print(f"metric {metric:<18} ({backend}, learnable={learnable}): "
              f"{ms:7.1f} ms/step  {eps / 1e6:8.2f} M edges/s",
              flush=True)

    for enc in TIME_ENCODINGS:
        cfg = tt.TAGANConfig(distance_metric="scaled_dot_product",
                             spatial_backend="flash",
                             time_encoding_type=enc, **base)
        ms, eps = step_time(cfg, seq, n_edges, label)
        results[f"time_encoding/{enc}"] = {
            "ms_per_step": round(ms, 1), "edges_per_s": round(eps, 0)}
        print(f"time encoding {enc:<12}: {ms:7.1f} ms/step", flush=True)

    out = {"config": f"N={N} deg={DEG} T={T} hidden={H} heads={HEADS} "
                     "regression(mse) fwd+bwd+adam",
           "results": results}
    print(json.dumps(out))
    path = _os.path.join(_os.path.dirname(_os.path.abspath(__file__)),
                         "results_metric_sweep.json")
    with open(path, "w") as f:
        json.dump(out, f, indent=1)


if __name__ == "__main__":
    main()
