"""Isolated timing of the flash structure phase (attention mask + block
plans), as the model builds it (nn/model.py _mask_and_plans): edge-list
path vs packed-dense-adjacency path."""
import os as _os, sys as _sys
_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))

import time

import numpy as np
import jax
import jax.numpy as jnp

from tagan_tpu.ops.pallas.flash_geometric import (
    make_block_plans_from_edges, make_block_plans_from_mask)

ITERS = 50
BM, BN = 512, 1024


def run(N, deg):
    rng = np.random.default_rng(0)
    E = N * deg
    eq = jnp.asarray(rng.integers(0, N, E), jnp.int32)
    ek = jnp.asarray(rng.integers(0, N, E), jnp.int32)
    em = jnp.ones((E,), bool)
    nm = jnp.ones((N,), bool)
    adj_np = np.zeros((N, N), bool)
    adj_np[np.asarray(eq), np.asarray(ek)] = True
    adj = jnp.asarray(adj_np)
    iota = jnp.arange(N)
    eye = iota[:, None] == iota[None, :]

    def from_edges(eq, ek, em, nm, zero):
        eq = eq + zero          # loop-carried dep: block XLA hoisting
        mask = jnp.zeros((N, N), jnp.int8)
        mask = mask.at[eq, ek].max(em.astype(jnp.int8))
        mask = jnp.where(eye, nm[None, :].astype(jnp.int8), mask)
        plan, plan_t = make_block_plans_from_edges.__wrapped__(
            eq, ek, em, nm, N, BM, BN)
        return mask, plan, plan_t

    def from_adj(adj, nm, zero):
        mask = ((adj | (eye & nm[None, :])).astype(jnp.int8)
                + zero.astype(jnp.int8))
        plan, plan_t = make_block_plans_from_mask.__wrapped__(mask, BM, BN)
        return mask, plan, plan_t

    def timed(fn, *args):
        @jax.jit
        def many(*args):
            def body(i, acc):
                mask, (jl, jc), (jlt, jct) = fn(*args, acc * 0)
                return acc + mask[0, 0].astype(jnp.int32) + jc[0] + jct[0]
            return jax.lax.fori_loop(0, ITERS, body, jnp.int32(0))
        int(many(*args))
        t0 = time.perf_counter()
        int(many(*args))
        return (time.perf_counter() - t0) / ITERS * 1e3

    t_e = timed(from_edges, eq, ek, em, nm)
    t_a = timed(from_adj, adj, nm)
    print(f"N={N} deg={deg}: edges={t_e:.2f} ms  adj={t_a:.2f} ms  "
          f"ratio={t_e / t_a:.2f}x")


if __name__ == "__main__":
    for n, d in [(2048, 16), (10_000, 16), (10_000, 64)]:
        run(n, d)
