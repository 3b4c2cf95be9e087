"""Fused ring flash attention (Pallas remote DMA + in-kernel compute).

The compute-fused formulation of `dist.edge_partition`'s ring: instead
of `ppermute` (XLA collective) between XLA segment ops, ONE Pallas
kernel both circulates the K/V chunks around the ICI ring
(`make_async_remote_copy`) and folds each resident chunk into the
local flash-attention recurrence — hop s's transfer is started before
hop s's compute and waited after it, so communication hides behind the
MXU work (the refinement admitted at ring_gather.py:8-10; SURVEY §2.9's
overlapped halo exchange).

Differences from the collective ring:
  * block-dense math: each chip's queries attend to each arriving chunk
    through a [per, chunk] mask block (the row shard of the global
    [N, N] mask), scored with the same MXU metric expansion as
    ops.pallas.flash_geometric — edge buckets are not needed;
  * 3-slot communication buffers: with the classic 2-slot ring, the
    neighbor's hop s+1 write targets the very slot our hop-s send is
    still reading (no cross-device ordering exists between them). With
    3 slots, the conflicting write at hop s+2 is transitively ordered
    behind our hop-s send_sem wait (our s+1 send starts only after it,
    and the neighbor needs that send's completion to reach s+2);
  * per-head rings (grid (H, hops)): the accumulators and buffers for
    one head fit VMEM (per <= ~2K rows x 128 lanes); total bytes moved
    are identical to one full-width ring.

Scope: forward-only (serving / large-graph inference and the overlap
demonstrator — training goes through the ppermute ring, whose XLA
autodiff is exact). Like ring_gather, CPU meshes run it in interpreter
mode with emulated remote DMAs; hardware multi-chip validation is
pending (this environment exposes one chip).
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .flash_geometric import (MXU_METRICS, NEG_INF, _block_scores,
                              _l2_normalize, _round_up)


def _ring_flash_kernel(srcs_ref, scale_ref, q_ref, k_ref, v_ref, mask_ref,
                       o_ref, kbuf, vbuf, acc_ref, m_ref, l_ref,
                       send_sem, recv_sem, *, metric: str, g: int,
                       true_d: int, bf16: bool, axis_name: str):
    """Grid (H, g): per head, walk g hops; scratch kbuf/vbuf[3] are the
    communication slots, acc/m/l the flash recurrence."""
    s = pl.program_id(1)
    my = jax.lax.axis_index(axis_name)
    right = jax.lax.rem(my + 1, g)

    @pl.when(s == 0)
    def _seed():
        # own chunk seeds slot 0; fresh accumulators for this head
        kbuf[0] = k_ref[0]
        vbuf[0] = v_ref[0]
        acc_ref[:] = jnp.zeros_like(acc_ref)
        m_ref[:] = jnp.full_like(m_ref, NEG_INF)
        l_ref[:] = jnp.zeros_like(l_ref)

    cur = jax.lax.rem(s, 3)
    nxt = jax.lax.rem(s + 1, 3)

    def _rdma(buf, sem_idx):
        return pltpu.make_async_remote_copy(
            src_ref=buf.at[cur], dst_ref=buf.at[nxt],
            send_sem=send_sem.at[sem_idx], recv_sem=recv_sem.at[sem_idx],
            device_id=right, device_id_type=pltpu.DeviceIdType.LOGICAL)

    @pl.when(s < g - 1)
    def _start():
        _rdma(kbuf, 0).start()
        _rdma(vbuf, 1).start()

    # ---- compute on the resident chunk while the transfer is in flight
    h = pl.program_id(0)
    q = q_ref[0]                        # [per, Dp]
    kc = kbuf[cur]                      # [chunk, Dp]
    vc = vbuf[cur]
    mask = mask_ref[:]                  # [per, chunk] int8 (pre-routed)
    sc = _block_scores(metric, q, kc, scale_ref[h], true_d, bf16)
    sc = jnp.where(mask != 0, sc, NEG_INF)
    m_prev = m_ref[:]
    m_new = jnp.maximum(m_prev, jnp.max(sc, axis=-1, keepdims=True))
    p = jnp.exp(sc - m_new)
    alpha = jnp.exp(m_prev - m_new)
    l_ref[:] = l_ref[:] * alpha + jnp.sum(p, axis=-1, keepdims=True)
    if bf16:
        pv = jnp.dot(p.astype(jnp.bfloat16), vc.astype(jnp.bfloat16),
                     preferred_element_type=jnp.float32)
    else:
        pv = jnp.dot(p, vc, preferred_element_type=jnp.float32)
    acc_ref[:] = acc_ref[:] * alpha + pv
    m_ref[:] = m_new

    @pl.when(s < g - 1)
    def _wait():
        _rdma(kbuf, 0).wait()
        _rdma(vbuf, 1).wait()

    @pl.when(s == g - 1)
    def _fin():
        dead = m_ref[:] <= NEG_INF
        safe = jnp.where(dead, 1.0, l_ref[:])
        o_ref[0] = jnp.where(dead, 0.0,
                             acc_ref[:] / safe).astype(o_ref.dtype)


def ring_flash_attention_local(
    q: jax.Array,            # [H, per, D]  local query shard
    k: jax.Array,            # [H, per, D]  local key shard
    v: jax.Array,            # [H, per, D]
    mask: jax.Array,         # [per, N] row shard of the global mask
    axis_name: str,
    num_devices: int,
    *,
    metric: str = "scaled_dot_product",
    scale_param: Optional[jax.Array] = None,
    bf16: bool = False,
    interpret: bool = False,
) -> jax.Array:
    """Call inside shard_map over `axis_name`. Returns the [H, per, D]
    context for the local queries. The mask's column blocks are routed
    per hop via a scalar-prefetched src table (no rolled copy)."""
    if metric not in MXU_METRICS:
        raise NotImplementedError(metric)
    H, per, D = q.shape
    g = num_devices
    if metric in ("cosine_similarity", "cosine_distance"):
        q = _l2_normalize(q)
        k = _l2_normalize(k)
    if scale_param is None:
        scale_param = jnp.ones((H,), jnp.float32)
    Dp = _round_up(D, 128)
    if Dp != D:
        q = jnp.pad(q, ((0, 0), (0, 0), (0, Dp - D)))
        k = jnp.pad(k, ((0, 0), (0, 0), (0, Dp - D)))
        v = jnp.pad(v, ((0, 0), (0, 0), (0, Dp - D)))
    mask = mask.astype(jnp.int8)
    my = jax.lax.axis_index(axis_name)
    # the chunk resident at hop s originated at shard (my - s) mod g
    srcs = jax.lax.rem(my - jnp.arange(g, dtype=jnp.int32) + g, g)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(H, g),
        in_specs=[
            pl.BlockSpec((1, per, Dp), lambda h, s, *_: (h, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, per, Dp), lambda h, s, *_: (h, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, per, Dp), lambda h, s, *_: (h, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((per, per),
                         lambda h, s, srcs, sc: (0, srcs[s]),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, per, Dp), lambda h, s, *_: (h, 0, 0),
                               memory_space=pltpu.VMEM),
        scratch_shapes=[
            pltpu.VMEM((3, per, Dp), q.dtype),     # k comm slots
            pltpu.VMEM((3, per, Dp), v.dtype),     # v comm slots
            pltpu.VMEM((per, Dp), jnp.float32),    # acc
            pltpu.VMEM((per, 1), jnp.float32),     # running max
            pltpu.VMEM((per, 1), jnp.float32),     # running sum
            pltpu.SemaphoreType.DMA((2,)),          # send (k, v)
            pltpu.SemaphoreType.DMA((2,)),          # recv (k, v)
        ],
    )
    out = pl.pallas_call(
        functools.partial(_ring_flash_kernel, metric=metric, g=g,
                          true_d=D, bf16=bf16, axis_name=axis_name),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((H, per, Dp), q.dtype),
        compiler_params=pltpu.CompilerParams(has_side_effects=True,
                                             collective_id=1),
        interpret=interpret,
    )(srcs, scale_param.astype(jnp.float32), q, k, v, mask)
    return out[:, :, :D]


def ring_flash_attention(
    mesh: Mesh,
    q: jax.Array,            # [H, N, D]
    k: jax.Array,
    v: jax.Array,
    mask: jax.Array,         # [N, N] (incl. self loops / validity)
    axis: str = "graph",
    *,
    metric: str = "scaled_dot_product",
    scale_param: Optional[jax.Array] = None,
    bf16: bool = False,
    interpret: Optional[bool] = None,
) -> jax.Array:
    """Sharded wrapper: rows of q/k/v/mask sharded over `axis`; returns
    the full [H, N, D] context sharded by query owner."""
    g = mesh.shape[axis]
    if interpret is None:
        interpret = mesh.devices.flat[0].platform == "cpu"
    H, N, D = q.shape
    assert N % g == 0, (N, g)

    if scale_param is None:
        scale_param = jnp.ones((H,), jnp.float32)

    def local(q_l, k_l, v_l, m_l, scale):
        return ring_flash_attention_local(
            q_l, k_l, v_l, m_l, axis, g, metric=metric,
            scale_param=scale, bf16=bf16, interpret=interpret)

    fn = jax.shard_map(
        local, mesh=mesh,
        in_specs=(P(None, axis, None), P(None, axis, None),
                  P(None, axis, None), P(axis, None), P()),
        out_specs=P(None, axis, None), check_vma=False)
    return fn(q, k, v, mask, scale_param)
