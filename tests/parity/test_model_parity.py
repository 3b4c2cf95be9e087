"""Oracle-A parity: the full reference TAGAN.forward (its *executed*
path, bugs and all — SURVEY.md §7.4) vs tagan_tpu in
``compat_mode='executed'`` with converted weights.
"""

import numpy as np
import pytest
import jax
import jax.numpy as jnp
import torch

from . import torch_ref as TR
import tagan_tpu as tt
from tagan_tpu.nn.model import TAGAN as MyTAGAN


def _ref_model(output_dim=1, loss_type="bce", Fn=16):
    with TR.quiet():
        from src.tagan.model import TAGAN as RefTAGAN
        from src.tagan.utils.config import TAGANConfig as RefConfig
        cfg = RefConfig(node_feature_dim=Fn, edge_feature_dim=0,
                        output_dim=output_dim, loss_type=loss_type,
                        dropout=0.0, device="cpu")
        return RefTAGAN(cfg).eval(), cfg


def convert_model(ref):
    """Reference TAGAN state -> tagan_tpu param pytree."""
    p = {"node_embedding": TR.lin(ref.node_embedding)}
    if ref.edge_embedding is not None:
        p["edge_embedding"] = TR.lin(ref.edge_embedding)
    p["geometric_layers"] = {
        f"layer_{i}": {"attn": TR.convert_geometric_attention(
            layer.geometric_attention)}
        for i, layer in enumerate(ref.geometric_attention_layers)}
    tp = ref.temporal_propagation
    prop = {"evolution": TR.convert_evolution_layer(tp.evolution_layer),
            "out_proj": TR.lin(tp.output_proj)}
    if tp.use_skip_connection:
        prop["skip"] = TR.convert_skip_connection(tp.skip_connection)
    if tp.use_gating:
        prop["gating"] = TR.convert_gating_unit(tp.gating_unit)
    if tp.use_layer_norm:
        prop["ln"] = TR.ln(tp.layer_norm)
    p["temporal_propagation"] = prop
    p["temporal_attention"] = TR.convert_asymmetric_temporal_attention(
        ref.temporal_attention)
    p["classification_head"] = TR.convert_classification_head(
        ref.classification_head.classification_head)
    if ref.skip_layer_norm is not None:
        p["skip_layer_norm"] = TR.ln(ref.skip_layer_norm)
    return p


def _sequence(T=4, n=7, Fn=16, seed=0):
    """Constant node set (as the reference synthetic generator produces,
    data_utils.py:78) so positional and slot alignment coincide."""
    rng = np.random.default_rng(seed)
    seq = []
    ei = np.asarray([[i, (i + 1) % n] for i in range(n)]
                    + [[(i + 1) % n, i] for i in range(n)]).T
    for t in range(T):
        x = rng.standard_normal((n, Fn)).astype(np.float32)
        seq.append((x, ei, None, list(range(n))))
    return seq


@pytest.mark.parametrize("T,n", [(4, 7), (6, 10)])
def test_executed_path_end_to_end(T, n):
    ref, cfg = _ref_model()
    params = convert_model(ref)

    seq_raw = _sequence(T=T, n=n)
    # reference forward
    torch_seq = [(torch.tensor(x), torch.tensor(ei),
                  None, ids) for x, ei, _, ids in seq_raw]
    with torch.no_grad(), TR.quiet():
        ref_out = ref(torch_seq)

    my_cfg = tt.TAGANConfig(
        node_feature_dim=16, edge_feature_dim=0, output_dim=1,
        loss_type="bce", dropout=0.0, compat_mode="executed")
    model = MyTAGAN(my_cfg)
    seq = tt.build_sequence(seq_raw)
    out = model(params, seq)

    TR.allclose(out.logits, ref_out["logits"].numpy().reshape(-1),
                rtol=1e-3, atol=1e-4)
    TR.allclose(out.predictions,
                ref_out["predictions"].numpy().reshape(-1),
                rtol=1e-3, atol=1e-4)


def test_executed_path_loss():
    ref, cfg = _ref_model()
    params = convert_model(ref)
    seq_raw = _sequence()
    torch_seq = [(torch.tensor(x), torch.tensor(ei), None, ids)
                 for x, ei, _, ids in seq_raw]
    label = torch.tensor([1.0])
    with torch.no_grad(), TR.quiet():
        ref_out = ref(torch_seq, labels=label)
    my_cfg = tt.TAGANConfig(
        node_feature_dim=16, edge_feature_dim=0, output_dim=1,
        loss_type="bce", dropout=0.0, compat_mode="executed")
    model = MyTAGAN(my_cfg)
    out = model(params, tt.build_sequence(seq_raw),
                labels=jnp.asarray([1.0]))
    TR.allclose(out.loss, ref_out["loss"].numpy(), rtol=1e-3, atol=1e-4)


def test_intended_mode_differs_and_is_finite():
    """The intended pipeline (propagation + memory active) must produce
    different, finite outputs vs the executed fallback."""
    ref, _ = _ref_model()
    params = convert_model(ref)
    seq = tt.build_sequence(_sequence())
    exec_model = MyTAGAN(tt.TAGANConfig(
        node_feature_dim=16, output_dim=1, loss_type="bce", dropout=0.0,
        compat_mode="executed"))
    int_model = MyTAGAN(tt.TAGANConfig(
        node_feature_dim=16, output_dim=1, loss_type="bce", dropout=0.0,
        compat_mode="intended"))
    o1 = exec_model(params, seq)
    o2 = int_model(params, seq)
    assert np.all(np.isfinite(np.asarray(o2.logits)))
    assert not np.allclose(np.asarray(o1.logits), np.asarray(o2.logits))
    assert int(o2.memory.size) > 0
