"""Fused single-walk vs two-walk flash backward — real-TPU comparison.

The fused layout only qualifies under the FUSED_BWD auto rule when its
analytic scoped-VMEM working set fits (`_fused_bwd_vmem_bytes` <=
FUSED_VMEM_BUDGET): at the 10K headline geometry (block 512x1024) it
exceeds the 16 MB chip limit (17.77M measured, BENCH_r02 rc=1), so this
comparison runs at block 512x512 where both layouts compile. Measures a
full fwd+bwd pass (value_and_grad of a sum-of-squares loss) per layout.

    python benchmarks/bench_fused_bwd.py [quick]
"""
import os as _os, sys as _sys
_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))

import json
import sys
import time

import numpy as np


def main(quick=False):
    import jax
    import jax.numpy as jnp
    try:
        jax.config.update("jax_compilation_cache_dir", "/tmp/tagan_jax_cache")
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 5)
    except Exception:
        pass
    from tagan_tpu.ops.pallas import flash_geometric as FG

    N, H, Dh, DEG = (1024 if quick else 4096), 4, 16, 16
    BM = BN = 512
    ITERS = 2 if quick else 20
    rng = np.random.default_rng(0)
    E = N * DEG
    q = jnp.asarray(rng.standard_normal((H, N, Dh)), jnp.float32)
    k = jnp.asarray(rng.standard_normal((H, N, Dh)), jnp.float32)
    v = jnp.asarray(rng.standard_normal((H, N, Dh)), jnp.float32)
    adj = np.zeros((N, N), bool)
    adj[rng.integers(0, N, E), rng.integers(0, N, E)] = True
    np.fill_diagonal(adj, True)
    adj = jnp.asarray(adj)

    assert FG._fused_bwd_vmem_bytes(BM, BN, 128) <= FG.FUSED_VMEM_BUDGET

    def bench(fused: bool):
        FG.FUSED_BWD = fused

        @jax.jit
        def many(q, k, v):
            def body(_, carry):
                qq, s = carry
                val, (dq, dk, dv) = jax.value_and_grad(
                    lambda a, b, c: jnp.sum(
                        FG.flash_geometric_attention(
                            a, b, c, adj, metric="scaled_dot_product",
                            block_m=BM, block_n=BN) ** 2),
                    argnums=(0, 1, 2))(qq, k, v)
                return qq + dq * 1e-20, s + val
            (_, s) = jax.lax.fori_loop(0, ITERS, body,
                                       (q, jnp.float32(0.0)))
            return s

        float(many(q, k, v))            # compile + warm
        t0 = time.perf_counter()
        float(many(q, k, v))
        return (time.perf_counter() - t0) / ITERS * 1e3

    ms_two = bench(False)
    ms_fused = bench(True)
    FG.FUSED_BWD = None
    out = {
        "config": f"N={N} deg={DEG} H={H} Dh={Dh} block {BM}x{BN} "
                  "fwd+bwd (value_and_grad)",
        "ms_two_walk": round(ms_two, 2),
        "ms_fused": round(ms_fused, 2),
        "fused_speedup": round(ms_two / ms_fused, 3),
    }
    print(json.dumps(out))
    path = _os.path.join(_os.path.dirname(_os.path.abspath(__file__)),
                         "results_fused_bwd.json")
    with open(path, "w") as f:
        json.dump(out, f, indent=1)


if __name__ == "__main__":
    main(quick="quick" in sys.argv[1:])
