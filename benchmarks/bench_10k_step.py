"""10K-node / 160K-edge / 8-snapshot full training step timing,
flash backend: dense_adj=False (edge-scatter structure) vs
dense_adj=True (packed-adjacency structure)."""
import os as _os, sys as _sys
_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))

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

N, DEG, T, H, HEADS, F = 10_000, int(_os.environ.get("DEG", 16)), 8, 64, 4, 16  # DEG env overrides degree
ITERS = 20

rng = np.random.default_rng(0)
E = N * DEG
src = rng.integers(0, N, E).astype(np.int64)
dst = rng.integers(0, N, E).astype(np.int64)
snaps = []
for t in range(T):
    snaps.append({
        "x": rng.standard_normal((N, F)).astype(np.float32),
        "edge_index": np.stack([src, dst]),
        "node_ids": list(range(N)),
        "timestep": float(t),
    })

cfg = tt.TAGANConfig(hidden_dim=H, num_heads=HEADS, num_layers=2,
                     node_feature_dim=F, output_dim=1, loss_type="bce",
                     dropout=0.0, spatial_backend="flash")
model = tt.TAGAN(cfg)
tx = optax.adam(1e-3)


def run(dense_adj: bool) -> float:
    seq = tt.build_sequence(snaps, max_nodes=N, max_edges=E, max_time=T,
                            dense_adj=dense_adj)
    seq = jax.device_put(seq)
    params = model.init(jax.random.key(0))
    opt = tx.init(params)
    lbl = jnp.asarray(1.0)

    @jax.jit
    def many(params, opt, seq):
        def body(_, carry):
            p, o = carry
            loss, g = jax.value_and_grad(
                lambda pp: model(pp, seq, lbl).loss)(p)
            up, o = tx.update(g, o, p)
            return optax.apply_updates(p, up), o
        p, o = jax.lax.fori_loop(0, ITERS, body, (params, opt))
        return jax.tree_util.tree_reduce(
            lambda a, b: a + jnp.sum(b.astype(jnp.float32)), p, 0.0)

    float(many(params, opt, seq))       # compile + warm
    t0 = time.perf_counter()
    float(many(params, opt, seq))
    dt = (time.perf_counter() - t0) / ITERS
    print(f"dense_adj={dense_adj}: {dt * 1e3:.1f} ms/step "
          f"({T / dt:.1f} snapshots/s)")
    return dt


if __name__ == "__main__":
    which = sys.argv[1] if len(sys.argv) > 1 else "both"
    if which in ("both", "false"):
        run(False)
    if which in ("both", "true"):
        run(True)
