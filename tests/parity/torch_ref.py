"""Helpers for loading the mounted PyTorch reference layers and
converting their weights into tagan_tpu param pytrees.

The reference (`/root/reference/src/tagan/layers/*`) is the numerical
oracle (SURVEY.md §7.4 Oracle B): each layer class imports fine
standalone even though the repo's data/trainer path is broken. These
tests run reference layers in eval mode with debug prints suppressed and
compare allclose against tagan_tpu layers holding the converted weights.
"""

from __future__ import annotations

import contextlib
import io
import sys

import jax.numpy as jnp
import numpy as np

REF_PATH = "/root/reference"
if REF_PATH not in sys.path:
    sys.path.insert(0, REF_PATH)


@contextlib.contextmanager
def quiet():
    """Suppress the reference's hard-coded debug prints (SURVEY.md B10)."""
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        yield


def t2j(t):
    return jnp.asarray(t.detach().cpu().numpy())


def lin(mod):
    """torch nn.Linear -> {'w': [in,out], 'b': [out]}"""
    p = {"w": t2j(mod.weight).T}
    if mod.bias is not None:
        p["b"] = t2j(mod.bias)
    return p


def ln(mod):
    return {"g": t2j(mod.weight), "b": t2j(mod.bias)}


def seq_mlp(seq_module, use_layer_norm=True):
    """torch Sequential of [Linear, (LayerNorm), (act), (Dropout)]* ->
    tagan_tpu _build_mlp param dict."""
    import torch.nn as nn
    out = {}
    li = 0
    ni = 0
    for m in seq_module:
        if isinstance(m, nn.Linear):
            out[f"linear_{li}"] = lin(m)
            li += 1
        elif isinstance(m, nn.LayerNorm):
            out[f"ln_{ni}"] = ln(m)
            ni += 1
    return out


# ---------------------------------------------------------------------------
# Per-layer converters
# ---------------------------------------------------------------------------

def convert_geometric_attention(mod):
    p = {"q": lin(mod.q_linear), "k": lin(mod.k_linear),
         "v": lin(mod.v_linear), "o": lin(mod.output_proj)}
    if mod.use_layer_norm:
        p["ln1"] = ln(mod.layer_norm1)
        p["ln2"] = ln(mod.layer_norm2)
    if getattr(mod, "learnable_distance", False):
        if hasattr(mod, "distance_param"):
            p["distance_param"] = t2j(mod.distance_param)
        if hasattr(mod, "cov_factors"):
            p["cov_factors"] = t2j(mod.cov_factors)
    return p


def convert_time_encoding(mod):
    if mod.encoding_type == "basis":
        return {"basis_mu": t2j(mod.basis_mu),
                "basis_sigma": t2j(mod.basis_sigma),
                "basis_proj": lin(mod.basis_proj)}
    pe = t2j(mod.pe)
    if pe.ndim == 3:
        pe = pe[0]
    return {"pe": pe}


def convert_temporal_attention(mod):
    p = {"q": lin(mod.q_linear), "k": lin(mod.k_linear),
         "v": lin(mod.v_linear), "o": lin(mod.output_proj)}
    if mod.use_layer_norm:
        p["ln1"] = ln(mod.layer_norm1)
        p["ln2"] = ln(mod.layer_norm2)
    return p


def convert_asymmetric_temporal_attention(mod):
    p = convert_temporal_attention(mod)
    if mod.relative_position_bias:
        p["relative_pos_table"] = t2j(mod.relative_pos_table)
    if mod.time_aware:
        p["time_encoding"] = convert_time_encoding(mod.time_encoding)
        p["time_q_proj"] = lin(mod.time_q_proj)
    p["asymmetric_kernel"] = t2j(mod.asymmetric_kernel)
    return p


def convert_gru_cell(mod):
    p = {"reset": lin(mod.reset_gate), "update": lin(mod.update_gate),
         "candidate": lin(mod.candidate)}
    if mod.use_layer_norm:
        p["ln_x"] = ln(mod.layer_norm_x)
        p["ln_h"] = ln(mod.layer_norm_h)
        p["ln_out"] = ln(mod.layer_norm_out)
    return p


def convert_evolution_layer(mod):
    p = {"forward_cell": convert_gru_cell(mod.forward_cell),
         "proj": lin(mod.output_projection)}
    if mod.bidirectional:
        p["backward_cell"] = convert_gru_cell(mod.backward_cell)
    if mod.use_layer_norm:
        p["ln"] = ln(mod.layer_norm)
    return p


def convert_skip_connection(mod):
    p = {"in_proj": lin(mod.input_proj), "out_proj": lin(mod.output_proj)}
    if mod.use_layer_norm:
        p["ln1"] = ln(mod.layer_norm1)
        p["ln2"] = ln(mod.layer_norm2)
    return p


def convert_gating_unit(mod):
    p = {"update_gate": lin(mod.update_gate),
         "reset_gate": lin(mod.reset_gate),
         "output_gate": lin(mod.output_gate)}
    if mod.use_layer_norm:
        p["ln_in1"] = ln(mod.layer_norm_in1)
        p["ln_in2"] = ln(mod.layer_norm_in2)
        p["ln_out"] = ln(mod.layer_norm_out)
    return p


def convert_classification_head(mod):
    p = {"classifier": seq_mlp(mod.classifier)}
    if mod.pooling_type == "attention":
        import torch.nn as nn
        linears = [m for m in mod.attention if isinstance(m, nn.Linear)]
        p["attention"] = {"w1": lin(linears[0]), "w2": lin(linears[1])}
    return p


def convert_regression_module(mod):
    p = {"regressor": seq_mlp(mod.regressor)}
    if mod.pooling_type == "attention":
        import torch.nn as nn
        linears = [m for m in mod.attention if isinstance(m, nn.Linear)]
        p["attention"] = {"w1": lin(linears[0]), "w2": lin(linears[1])}
    return p


def convert_prediction_head(mod):
    return seq_mlp(mod.model)


def convert_temporal_gru(mod):
    p = {}
    names = ["W_z", "U_z", "W_r", "U_r", "W_h", "U_h"]
    for n in names:
        p[n] = lin(getattr(mod, n))
    if mod.bidirectional:
        for n in names:
            p[n + "_backward"] = lin(getattr(mod, n + "_backward"))
        p["output_proj"] = lin(mod.output_proj)
    if mod.time_aware:
        p["W_t"] = lin(mod.W_t)
        for n in ["W_zt", "W_rt", "W_ht"]:
            p[n] = lin(getattr(mod, n))
        if mod.bidirectional:
            for n in ["W_zt", "W_rt", "W_ht"]:
                p[n + "_backward"] = lin(getattr(mod, n + "_backward"))
    if mod.asymmetric_weights:
        p["past_weight"] = t2j(mod.past_weight)
        p["future_weight"] = t2j(mod.future_weight)
        p["time_decay"] = t2j(mod.time_decay)
    if mod.use_layer_norm:
        p["ln_in"] = ln(mod.layer_norm_input)
        p["ln_h"] = ln(mod.layer_norm_hidden)
        p["ln_out"] = ln(mod.layer_norm_output)
    return p


def convert_asymmetric_cell(mod):
    p = {"forward_reset": lin(mod.forward_reset_gate),
         "forward_update": lin(mod.forward_update_gate),
         "forward_candidate": lin(mod.forward_candidate),
         "backward_reset": lin(mod.backward_reset_gate),
         "backward_update": lin(mod.backward_update_gate),
         "backward_candidate": lin(mod.backward_candidate),
         "forward_weight": t2j(mod.forward_weight),
         "backward_weight": t2j(mod.backward_weight)}
    if mod.time_aware:
        p["time_modulation"] = lin(mod.time_modulation)
        p["time_gate"] = lin(mod.time_gate)
    if mod.use_layer_norm:
        p["ln_in"] = ln(mod.layer_norm_input)
        p["ln_out"] = ln(mod.layer_norm_output)
    return p


def allclose(a, b, rtol=2e-4, atol=2e-5, msg=""):
    a = np.asarray(a)
    b = np.asarray(b)
    np.testing.assert_allclose(a, b, rtol=rtol, atol=atol, err_msg=msg)
