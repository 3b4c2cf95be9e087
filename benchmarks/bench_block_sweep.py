"""Joint (block_m x block_n x backward layout x precision) sweep of the
10K-node headline training step (VERDICT r3 items 7 + 9).

Sweeps the flash kernels' block geometry, the two-walk vs fused
backward layout, and f32 vs bf16 at the BASELINE config-2 workload
(10K nodes / deg 16 / 8 snapshots / hidden 64 / 4 heads / 2 layers,
fwd+bwd+Adam). Infeasible points are pruned by the analytic scoped-VMEM
model before touching the chip (`_fused_bwd_vmem_bytes` for fused; the
measured two-walk bf16 rule for 512-row bf16). For every point the
FIRST call's wall time is recorded too — against a fresh compilation
cache this is the cold-compile cost, which is how the fused layout's
"one backward kernel instead of two" compile-time claim is measured
(item 9).

    python benchmarks/bench_block_sweep.py [quick] [fresh-cache]

Dumps results_block_sweep.json.
"""
import os as _os, sys as _sys
_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))

import json
import sys
import tempfile
import time

import numpy as np

QUICK = "quick" in sys.argv[1:]
FRESH = "fresh-cache" in sys.argv[1:]
ONE = None
if "--one" in sys.argv:
    i = sys.argv.index("--one")
    ONE = tuple(int(x) for x in sys.argv[i + 1:i + 5])


def _cache():
    import jax
    path = tempfile.mkdtemp(prefix="sweep_cache_") if FRESH \
        else "/tmp/tagan_jax_cache"
    jax.config.update("jax_compilation_cache_dir", path)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 5)


_cache()

import jax
import jax.numpy as jnp
import optax
import tagan_tpu as tt
from tagan_tpu.ops.pallas import flash_geometric as FG

N, DEG, T, H, HEADS, F = (2048 if QUICK else 10_000), 16, 8, 64, 4, 16
ITERS = 4 if QUICK else 20
rng = np.random.default_rng(0)
E = N * DEG
snaps = [{"x": rng.standard_normal((N, F)).astype(np.float32),
          "edge_index": np.stack([rng.integers(0, N, E),
                                  rng.integers(0, N, E)]),
          "node_ids": list(range(N)), "timestep": float(t)}
         for t in range(T)]
seq = tt.build_sequence(snaps, max_nodes=N, max_edges=E, max_time=T,
                        dense_adj=True)
seq = jax.device_put(seq)
lbl = jnp.asarray(1.0)


def feasible(bm, bn, fused, bf16):
    """Host-side VMEM feasibility (the rules measured on v5e)."""
    Dp = 128
    if fused:
        if FG._fused_bwd_vmem_bytes(bm, bn, Dp, False, False) \
                > FG.FUSED_VMEM_BUDGET:
            return False, "fused scoped-VMEM estimate over budget"
        if bf16:
            # the fused walk adds live bf16 casts on top of its f32
            # windows like the two-walk dkv; only 256-row fits
            return (bm <= 256), "bf16 fused needs block_m <= 256"
    if bf16 and bm > 256:
        return False, "bf16 two-walk dk/dv exceeds scoped VMEM at " \
                      "512-row blocks (measured 17.75 MB)"
    return True, ""


def run(bm, bn, fused, bf16):
    cfg = tt.TAGANConfig(hidden_dim=H, num_heads=HEADS, num_layers=2,
                         node_feature_dim=F, output_dim=1,
                         loss_type="bce", dropout=0.0,
                         # remat OFF: the BASELINE config-2 headline
                         # (bench.py) runs without rematerialization
                         spatial_backend="flash", remat=False,
                         bf16_matmul=bf16, flash_block_m=bm,
                         flash_block_n=bn)
    model = tt.TAGAN(cfg)
    tx = optax.adam(1e-3)
    params = model.init(jax.random.key(0))
    opt = tx.init(params)
    FG.FUSED_BWD = fused

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

    t0 = time.perf_counter()
    chk = float(many(params, opt, seq))
    first_s = time.perf_counter() - t0
    assert np.isfinite(chk), (bm, bn, fused, bf16, chk)
    t0 = time.perf_counter()
    float(many(params, opt, seq))
    step_ms = (time.perf_counter() - t0) / ITERS * 1e3
    FG.FUSED_BWD = None
    return step_ms, first_s


def main():
    if ONE is not None:
        bm, bn, fused, bf16 = ONE[0], ONE[1], bool(ONE[2]), bool(ONE[3])
        step_ms, first_s = run(bm, bn, fused, bf16)
        print("RESULT " + json.dumps({"step_ms": round(step_ms, 1),
                                      "first_call_s": round(first_s, 1)}))
        return
    grid = [(bm, bn, fused, bf16)
            for bm in (256, 512) for bn in (512, 1024)
            for fused in (False, True) for bf16 in (False, True)]
    # measure the incumbent headline geometry first so a truncated run
    # still contains the baseline row
    grid.sort(key=lambda g: (g != (512, 1024, False, False),))
    rows = []
    for bm, bn, fused, bf16 in grid:
        ok, why = feasible(bm, bn, fused, bf16)
        row = {"block_m": bm, "block_n": bn,
               "layout": "fused" if fused else "two-walk",
               "precision": "bf16" if bf16 else "f32"}
        if not ok:
            row.update(feasible=False, reason=why)
            rows.append(row)
            print(json.dumps(row), flush=True)
            _save(rows, None)
            continue
        # each point runs in its own process: measured cross-config
        # interference (a bf16 row landed 28% slow mid-sweep, exactly
        # reproducible standalone at the fast number)
        import subprocess
        try:
            out = subprocess.run(
                [sys.executable, _os.path.abspath(__file__), "--one",
                 str(bm), str(bn), str(int(fused)), str(int(bf16))]
                + (["quick"] if QUICK else []),
                capture_output=True, text=True, timeout=3600)
            line = [ln for ln in out.stdout.splitlines()
                    if ln.startswith("RESULT ")]
            if not line:
                raise RuntimeError(out.stderr[-300:])
            row.update(feasible=True, **json.loads(line[0][7:]))
        except Exception as e:  # measured infeasibility beats the model
            row.update(feasible=False,
                       reason=f"failed on chip: {type(e).__name__}: "
                              f"{str(e)[:200]}")
        rows.append(row)
        print(json.dumps(row), flush=True)
        _save(rows, None)

    ok_rows = [r for r in rows if r.get("feasible") and "step_ms" in r]
    best = min(ok_rows, key=lambda r: r["step_ms"]) if ok_rows else None
    _save(rows, best)
    print(json.dumps({"best": best}))


def _save(rows, best):
    out = {"config": f"N={N} deg={DEG} T={T} hidden={H} heads={HEADS} "
                     f"layers=2 iters={ITERS} fresh_cache={FRESH}",
           "rows": rows, "best": best}
    path = _os.path.join(_os.path.dirname(_os.path.abspath(__file__)),
                         "results_block_sweep.json")
    with open(path, "w") as f:
        json.dump(out, f, indent=1)


if __name__ == "__main__":
    main()
