"""Head-packing lane-bound probe (round 5, VERDICT r4 item 8).

The 10K flash headline's MFU is capped at head_dim/128 = 12.5%: the
QK^T cross term contracts over K = Dh = 16, filling 16 of the MXU's
128 contraction lanes. The only way to "fill" the lanes with the same
per-head semantics is to pack heads block-diagonally:

    A = q_cat [BM, H*Dh]      (H*Dh = 64 here)
    B = blockdiag(k_h^T) [H*Dh, H*BN]
    A @ B [m, (h, n)] = q_h[m] . k_h[n]     (cross terms hit zeros)

which raises lane utilization by H but multiplies the MAC count by H
(the injected zeros are multiplied like real data) — algebraically a
wash; the bigger operands and the B-build cost should make it a LOSS.
This bench measures it instead of asserting it, at the headline's
block shapes, on the real chip:

  per_head   einsum('hmd,hnd->hmn')   (what the kernel does per block)
  packed     q_cat @ blockdiag(k)     (block-diagonal packing)
  k128       einsum with Dh=128      (the lane-bound reference: same
                                      matmul with full lanes — the
                                      speed-of-light the bound names)

    python benchmarks/bench_head_packing.py
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
import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

H, Dh, BM, BN = 4, 16, 512, 1024
REPS = 50
key = jax.random.key(0)
q = jax.random.normal(key, (H, BM, Dh), jnp.float32)
k = jax.random.normal(jax.random.key(1), (H, BN, Dh), jnp.float32)
q128 = jax.random.normal(jax.random.key(2), (H, BM, 128), jnp.float32)
k128 = jax.random.normal(jax.random.key(3), (H, BN, 128), jnp.float32)

# packed operands (built once — charitable to the packed variant: in a
# kernel the block-diag B would be rebuilt per key block)
q_cat = jnp.reshape(jnp.moveaxis(q, 0, 1), (BM, H * Dh))
B = np.zeros((H * Dh, H * BN), np.float32)
k_np = np.asarray(k)
for h in range(H):
    B[h * Dh:(h + 1) * Dh, h * BN:(h + 1) * BN] = k_np[h].T
B = jnp.asarray(B)


def timeit(name, fn, *args):
    def chained(*a):
        def one(c, _):
            r = fn(*((c,) + a[1:]))
            # data dep: fold a cheap reduction of r back into the carry
            return c * (1.0 + 0e-9) + 1e-12 * jnp.sum(r) / r.size, 0
        c, _ = jax.lax.scan(one, a[0], jnp.arange(REPS))
        return c
    jf = jax.jit(chained)
    r = jf(*args)
    float(jnp.sum(r))
    ts = []
    for _ in range(5):
        t0 = time.perf_counter()
        float(jnp.sum(jf(*args)))
        ts.append((time.perf_counter() - t0) / REPS * 1e3)
    ms = float(np.median(ts))
    print(json.dumps({name + "_ms": round(ms, 4)}), flush=True)
    return ms


def per_head(qq, kk):
    return jnp.einsum("hmd,hnd->hmn", qq, kk,
                      preferred_element_type=jnp.float32)


def packed(qc, BB):
    return qc @ BB


def k_full(qq, kk):
    return jnp.einsum("hmd,hnd->hmn", qq, kk,
                      preferred_element_type=jnp.float32)


ph = timeit("per_head_Dh16", per_head, q, k)
pk = timeit("packed_blockdiag", packed, q_cat, B)
kf = timeit("k128_reference", k_full, q128, k128)

flops_ph = 2 * H * BM * BN * Dh
flops_pk = 2 * BM * (H * BN) * (H * Dh)
flops_kf = 2 * H * BM * BN * 128
out = {
    "shapes": f"H={H} Dh={Dh} BM={BM} BN={BN}",
    "per_head_Dh16_ms": round(ph, 4),
    "packed_blockdiag_ms": round(pk, 4),
    "k128_reference_ms": round(kf, 4),
    "per_head_tflops": round(flops_ph / ph / 1e9, 1),
    "packed_tflops_incl_zeros": round(flops_pk / pk / 1e9, 1),
    "k128_tflops": round(flops_kf / kf / 1e9, 1),
    "packed_vs_per_head": round(ph / pk, 2),
    "verdict": None,
}
out["verdict"] = (
    "packing WINS — pursue a packed kernel layout" if pk < ph * 0.9
    else "packing LOSES or ties: the H x MAC inflation of the "
         "block-diagonal zeros cancels the lane gain — Dh/128 is a "
         "real floor for per-head semantics at this head_dim")
print(json.dumps(out))
path = _os.path.join(_os.path.dirname(_os.path.abspath(__file__)),
                     "results_head_packing.json")
with open(path, "w") as f:
    json.dump(out, f, indent=1)
