"""Pallas TPU kernels for the sparse attention path.

`fused_edge_attention` is the kernel-backed equivalent of
`ops.sparse.edge_attention` (SDDMM -> segment softmax -> SpMM). Until the
Mosaic kernels land for every metric, unsupported cases fall back to the
XLA oracle implementation transparently.
"""

from ..sparse import edge_attention as _xla_edge_attention
from .ring_flash import ring_flash_attention, ring_flash_attention_local
from .ring_gather import ring_all_gather, ring_all_gather_sharded


def fused_edge_attention(metric, q, k, v, edge_q, edge_k, edge_mask,
                         num_nodes, *, sigma=None, gamma=None, cov_inv=None):
    try:
        from .edge_attn import pallas_edge_attention
        return pallas_edge_attention(metric, q, k, v, edge_q, edge_k,
                                     edge_mask, num_nodes, sigma=sigma,
                                     gamma=gamma, cov_inv=cov_inv)
    except (ImportError, NotImplementedError):
        return _xla_edge_attention(metric, q, k, v, edge_q, edge_k,
                                   edge_mask, num_nodes, sigma=sigma,
                                   gamma=gamma, cov_inv=cov_inv)
