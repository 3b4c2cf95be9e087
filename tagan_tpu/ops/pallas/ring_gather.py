"""Ring all-gather over the graph mesh axis (Pallas remote DMA).

The communication primitive behind edge-partitioned attention
(`dist/edge_partition.py`): every chip owns a node-feature shard
[N/G, D] and needs the full [N, D] K/V matrix. `jax.lax.all_gather`
does this through XLA's collective; this kernel is the hand-scheduled
ICI version — a double-buffered ring of `make_async_remote_copy` sends
(the SNIPPETS.md [1][2] pattern), which a later revision can interleave
chunk-by-chunk with local SDDMM/SpMM so boundary traffic hides behind
aggregation.

Runs under `shard_map` over the mesh axis; on CPU meshes the kernel
executes in interpreter mode (remote DMAs are emulated), which is how
`tests/test_ring_gather.py` validates it without multi-chip hardware.
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu
from jax.sharding import Mesh, PartitionSpec as P


def _ring_kernel(x_ref, out_ref, comm_ref, send_sem, recv_sem, copy_sem,
                 *, axis_name: str, num_devices: int, chunk: int):
    """out[(my - step) % G] = chunk received after `step` hops.

    Buffered ring: while chunk s is being forwarded to the right
    neighbor, chunk s-1 (already received) is copied into the output —
    communication and local copies overlap. THREE comm slots, not two:
    with 2 slots the neighbor's hop s+1 write targets the very slot our
    hop-s send still reads, and no cross-device ordering exists between
    them; with 3 slots the conflicting write (hop s+2) is transitively
    ordered behind our hop-s send_sem wait (our s+1 send starts only
    after it, and the neighbor needs that send's completion to reach
    s+2).
    """
    my = jax.lax.axis_index(axis_name)

    # own chunk -> output slot `my`, and seed the first send buffer
    own_copy = pltpu.make_async_copy(
        x_ref, out_ref.at[pl.ds(my * chunk, chunk), :], copy_sem)
    own_copy.start()
    seed_copy = pltpu.make_async_copy(x_ref, comm_ref.at[0], copy_sem)
    seed_copy.start()
    own_copy.wait()
    seed_copy.wait()

    right = jax.lax.rem(my + 1, num_devices)

    def body(step, _):
        send_slot = jax.lax.rem(step, 3)
        recv_slot = jax.lax.rem(step + 1, 3)
        rdma = pltpu.make_async_remote_copy(
            src_ref=comm_ref.at[send_slot],
            dst_ref=comm_ref.at[recv_slot],
            send_sem=send_sem.at[send_slot],
            recv_sem=recv_sem.at[recv_slot],
            device_id=right,
            device_id_type=pltpu.DeviceIdType.LOGICAL,
        )
        rdma.start()
        rdma.wait()
        # the chunk that just arrived originated `step + 1` hops to the
        # left of this device
        src = jax.lax.rem(my - (step + 1) + num_devices * 2, num_devices)
        out_copy = pltpu.make_async_copy(
            comm_ref.at[recv_slot],
            out_ref.at[pl.ds(src * chunk, chunk), :], copy_sem)
        out_copy.start()
        out_copy.wait()
        return 0

    jax.lax.fori_loop(0, num_devices - 1, body, 0)


def ring_all_gather(
    x: jax.Array,            # local shard [chunk, D] (inside shard_map)
    axis_name: str,
    num_devices: int,
    *,
    interpret: bool = False,
) -> jax.Array:
    """All-gather the leading axis over `axis_name` via a remote-DMA
    ring. Returns [num_devices * chunk, D]. Call inside shard_map."""
    chunk, d = x.shape
    out = pl.pallas_call(
        functools.partial(_ring_kernel, axis_name=axis_name,
                          num_devices=num_devices, chunk=chunk),
        out_shape=jax.ShapeDtypeStruct((num_devices * chunk, d), x.dtype),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        scratch_shapes=[
            pltpu.VMEM((3, chunk, d), x.dtype),     # comm slots (see race note)
            pltpu.SemaphoreType.DMA((3,)),           # send
            pltpu.SemaphoreType.DMA((3,)),           # recv
            pltpu.SemaphoreType.DMA(()),             # local copies
        ],
        compiler_params=pltpu.CompilerParams(has_side_effects=True,
                                             collective_id=0),
        interpret=interpret,
    )(x)
    return out


def ring_all_gather_sharded(mesh: Mesh, x: jax.Array, axis: str,
                            *, interpret: Optional[bool] = None
                            ) -> jax.Array:
    """Convenience wrapper: x sharded [N, D] over `axis` -> replicated
    gathered [N, D] via the ring kernel."""
    g = mesh.shape[axis]
    if interpret is None:
        interpret = mesh.devices.flat[0].platform == "cpu"

    def local(x_l):
        return ring_all_gather(x_l, axis, g, interpret=interpret)

    fn = jax.shard_map(local, mesh=mesh, in_specs=P(axis),
                       out_specs=P(), check_vma=False)
    return fn(x)
