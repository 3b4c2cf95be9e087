"""Spatial backend equivalence: dense vs csr (XLA) in the full model.
(The flash backend is TPU-only; it is equivalence-tested at the kernel
level in tests/test_flash_kernel.py via interpret mode.)"""

import jax
import numpy as np
import pytest

import tagan_tpu as tt
from tagan_tpu.data.synthetic import (create_dynamic_synthetic_data,
                                      create_synthetic_data)
from tagan_tpu.nn.model import TAGAN


@pytest.mark.parametrize("churn", [False, True])
def test_dense_vs_csr_model(churn):
    if churn:
        data = create_dynamic_synthetic_data(
            num_samples=2, sequence_length=4, num_nodes_range=(6, 9),
            node_feature_dim=8, seed=0)
    else:
        data = create_synthetic_data(
            num_samples=2, sequence_length=4, node_feature_dim=8,
            edge_feature_dim=0, seed=0)
    T, N, E, _ = tt.pad_dims_for([s for s, _ in data])
    seqs = [tt.build_sequence(s, max_nodes=N, max_edges=max(E, 1),
                              max_time=T) for s, _ in data]

    base = tt.TAGANConfig(hidden_dim=16, num_heads=2, num_layers=2,
                          node_feature_dim=8, output_dim=1,
                          loss_type="bce", dropout=0.0)
    dense_model = TAGAN(base)
    csr_model = TAGAN(base.replace(spatial_backend="csr"))
    params = dense_model.init(jax.random.key(0))

    for seq in seqs:
        d = jax.jit(lambda p, s: dense_model(p, s).logits)(params, seq)
        c = jax.jit(lambda p, s: csr_model(p, s).logits)(params, seq)
        np.testing.assert_allclose(np.asarray(d), np.asarray(c),
                                   rtol=2e-4, atol=2e-5)


def test_flash_backend_config_accepted():
    cfg = tt.TAGANConfig(spatial_backend="flash")
    assert cfg.spatial_backend == "flash"
    with pytest.raises(ValueError):
        tt.TAGANConfig(spatial_backend="nope")
