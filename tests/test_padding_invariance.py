"""Padding invariance: outputs must not depend on how much static
padding a sequence carries (time padding from bucketed loaders, slot
padding from max_nodes, edge padding) — regression tests for the
padding-leak bugs found in review.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import tagan_tpu as tt
from tagan_tpu.data.synthetic import create_synthetic_data
from tagan_tpu.nn.model import TAGAN


@pytest.fixture(scope="module")
def raw_seq():
    data = create_synthetic_data(num_samples=1, sequence_length=3,
                                 num_nodes_range=(7, 7),
                                 node_feature_dim=8, edge_feature_dim=0,
                                 seed=0)
    return data[0][0]


def _model(**kw):
    cfg = tt.TAGANConfig(hidden_dim=16, num_heads=2, num_layers=1,
                         node_feature_dim=8, output_dim=1,
                         loss_type="bce", dropout=0.0, **kw)
    return TAGAN(cfg)


@pytest.mark.parametrize("kw", [
    {},                                   # dense backend
    {"bidirectional": True},              # backward pass over padding
    {"spatial_backend": "csr"},
])
def test_time_padding_invariance(raw_seq, kw):
    model = _model(**kw)
    seq_a = tt.build_sequence(raw_seq, max_nodes=10, max_edges=40,
                              max_time=3)
    seq_b = tt.build_sequence(raw_seq, max_nodes=10, max_edges=40,
                              max_time=7)
    params = model.init(jax.random.key(0))
    oa = jax.jit(lambda p, s: model(p, s))(params, seq_a)
    ob = jax.jit(lambda p, s: model(p, s))(params, seq_b)
    np.testing.assert_allclose(np.asarray(oa.logits),
                               np.asarray(ob.logits), rtol=1e-5,
                               atol=1e-6, err_msg=str(kw))
    np.testing.assert_allclose(np.asarray(oa.memory.states),
                               np.asarray(ob.memory.states), rtol=1e-5,
                               atol=1e-6)
    np.testing.assert_array_equal(np.asarray(oa.memory.valid),
                                  np.asarray(ob.memory.valid))


def test_node_padding_invariance(raw_seq):
    model = _model()
    seq_a = tt.build_sequence(raw_seq, max_nodes=7, max_edges=40,
                              max_time=3)
    seq_b = tt.build_sequence(raw_seq, max_nodes=16, max_edges=80,
                              max_time=3)
    params = model.init(jax.random.key(0))
    oa = jax.jit(lambda p, s: model(p, s))(params, seq_a)
    ob = jax.jit(lambda p, s: model(p, s))(params, seq_b)
    np.testing.assert_allclose(np.asarray(oa.logits),
                               np.asarray(ob.logits), rtol=1e-5,
                               atol=1e-6)


def test_geometric_bias_does_not_leak_to_padding():
    """Edge-feature bias re-softmax must stay inside the adjacency mask
    (padded slots previously absorbed most of the attention mass)."""
    from tagan_tpu.nn import GeometricAttention
    rng = np.random.default_rng(0)
    attn = GeometricAttention(hidden_dim=16, num_heads=2, dropout=0.0)
    params = attn.init(jax.random.key(0))
    N, act = 12, 4
    x = jnp.asarray(rng.standard_normal((N, 16)), jnp.float32)
    adj = np.zeros((N, N), bool)
    adj[:act, :act] = rng.random((act, act)) > 0.3
    np.fill_diagonal(adj[:act, :act], True)
    bias = np.zeros((N, N), np.float32)
    bias[:act, :act] = rng.standard_normal((act, act))
    _, w = attn(params, x, jnp.asarray(adj), jnp.asarray(bias),
                return_weights=True)
    w = np.asarray(w)
    # all attention mass of active queries stays on active keys
    leak = w[:, :act, act:].sum()
    assert leak < 1e-6, leak


def test_frozen_time_encoding_has_no_params():
    from tagan_tpu.nn import TimeEncoding
    te = TimeEncoding(d_model=8, encoding_type="sinusoidal",
                      learnable=False)
    assert te.init(jax.random.key(0)) == {}
    # still computes the same table as the learnable variant's init
    tel = TimeEncoding(d_model=8, encoding_type="sinusoidal",
                      learnable=True)
    p = tel.init(jax.random.key(0))
    tv = jnp.asarray([[0.0, 1.0, 2.0]])
    np.testing.assert_allclose(np.asarray(te({}, tv)),
                               np.asarray(tel(p, tv)), rtol=1e-6)
