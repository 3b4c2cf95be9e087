"""Parity for the reference's auxiliary (unwired) modules:
GeometricDistanceModule, SpatialPositionEncoding,
GeometricTemporalAttention, MultiTimeScaleAttention.
"""

import sys

import numpy as np
import pytest
import jax
import jax.numpy as jnp
import torch

from . import torch_ref as TR
from tagan_tpu.nn import (GeometricDistanceModule, SpatialPositionEncoding,
                          GeometricTemporalAttention,
                          MultiTimeScaleAttention)

H = 32
HEADS = 4
B, S = 2, 6


def _x(*shape, seed=0):
    return np.random.default_rng(seed).standard_normal(shape).astype(
        np.float32)


@pytest.mark.parametrize("feature_based", [True, False])
def test_geometric_distance_module_parity(feature_based):
    with TR.quiet():
        from src.tagan.layers.geometric_attention import (
            GeometricDistanceModule as RefGDM)
        ref = RefGDM(hidden_dim=H, distance_metric="euclidean",
                     trainable=True, feature_based=feature_based).eval()
    mine = GeometricDistanceModule(hidden_dim=H,
                                   distance_metric="euclidean",
                                   trainable=True,
                                   feature_based=feature_based)
    p = {"log_temperature": TR.t2j(ref.log_temperature)}
    if feature_based:
        p["distance_projection"] = TR.lin(ref.distance_projection)
    else:
        p["coordinate_projection"] = TR.lin(ref.coordinate_projection)
    x = _x(B, S, H, seed=1)
    with torch.no_grad(), TR.quiet():
        want = ref(torch.tensor(x))
    got = mine(p, jnp.asarray(x))
    TR.allclose(got, want.numpy(), rtol=5e-4, atol=5e-5)


@pytest.mark.parametrize("enc", ["sinusoidal", "linear", "learned",
                                 "basis"])
def test_spatial_position_encoding_parity(enc):
    with TR.quiet():
        from src.tagan.layers.geometric_attention import (
            SpatialPositionEncoding as RefSPE)
        ref = RefSPE(d_model=H, encoding_type=enc, dropout=0.0,
                     num_bases=8).eval()
    mine = SpatialPositionEncoding(d_model=H, encoding_type=enc,
                                   dropout=0.0, num_bases=8)
    if enc == "sinusoidal":
        p = {"freq_bands": TR.t2j(ref.freq_bands)}
    elif enc == "learned":
        p = {"pos_enc": TR.t2j(ref.pos_enc)}
    elif enc == "basis":
        p = {"basis_mu": TR.t2j(ref.basis_mu),
             "basis_sigma": TR.t2j(ref.basis_sigma),
             "basis_proj": TR.lin(ref.basis_proj)}
    else:
        p = {}
    pos = np.abs(_x(B, S, seed=2)) * 50.0
    with torch.no_grad(), TR.quiet():
        want = ref(torch.tensor(pos))
    got = mine(p, jnp.asarray(pos))
    TR.allclose(got, want.numpy(), rtol=5e-4, atol=1e-5,
                msg=f"type={enc}")


@pytest.mark.parametrize("fusion", ["parallel", "sequential", "gated"])
def test_geometric_temporal_attention_parity(fusion):
    # the reference module does `from tagan.layers...` (an absolute
    # import of a package that doesn't exist on disk) — alias it so the
    # module is constructible at all
    import src.tagan as _tagan_pkg
    sys.modules.setdefault("tagan", _tagan_pkg)
    import src.tagan.layers.temporal_attention as _ta
    sys.modules.setdefault("tagan.layers", _tagan_pkg.layers
                           if hasattr(_tagan_pkg, "layers") else None)
    sys.modules["tagan.layers.temporal_attention"] = _ta
    with TR.quiet():
        from src.tagan.layers.geometric_attention import (
            GeometricTemporalAttention as RefGTA)
        ref = RefGTA(hidden_dim=H, num_heads=HEADS, dropout=0.0,
                     distance_metric="euclidean",
                     fusion_type=fusion).eval()
    mine = GeometricTemporalAttention(hidden_dim=H, num_heads=HEADS,
                                      dropout=0.0,
                                      distance_metric="euclidean",
                                      fusion_type=fusion)
    p = {"geometric": TR.convert_geometric_attention(
            ref.geometric_attention),
         "temporal": TR.convert_asymmetric_temporal_attention(
            ref.temporal_attention)}
    if fusion == "parallel":
        p["fusion_weights"] = TR.t2j(ref.fusion_weights)
    elif fusion == "gated":
        p["gate"] = TR.lin(ref.gate_net[0])
    if ref.use_layer_norm:
        p["ln"] = TR.ln(ref.layer_norm)
    x = _x(B, S, H, seed=3)
    ts = np.cumsum(np.abs(_x(B, S, seed=4)) * 6.0, axis=1).astype(
        np.float32)
    with torch.no_grad(), TR.quiet():
        want = ref(torch.tensor(x), time_stamps=torch.tensor(ts))
    got = mine(p, jnp.asarray(x), time_stamps=jnp.asarray(ts))
    TR.allclose(got, want.numpy(), rtol=1e-3, atol=1e-4,
                msg=f"fusion={fusion}")


@pytest.mark.parametrize("fusion", ["concat", "sum", "weighted_sum",
                                    "attention"])
def test_multi_time_scale_parity(fusion):
    with TR.quiet():
        from src.tagan.layers.temporal_attention import (
            MultiTimeScaleAttention as RefMTS)
        ref = RefMTS(hidden_dim=H, num_scales=2, scale_factors=[1, 2],
                     num_heads=HEADS, dropout=0.0, time_aware=False,
                     fusion_type=fusion).eval()
    mine = MultiTimeScaleAttention(hidden_dim=H, num_scales=2,
                                   scale_factors=(1, 2),
                                   num_heads=HEADS, dropout=0.0,
                                   time_aware=False, fusion_type=fusion)
    p = {"scales": {
        "scale_1": TR.convert_asymmetric_temporal_attention(
            ref.attention_modules[0]),
        "scale_2": TR.convert_asymmetric_temporal_attention(
            ref.attention_modules[1])}}
    if fusion == "concat":
        p["fusion"] = TR.lin(ref.fusion)
    elif fusion == "weighted_sum":
        p["scale_weights"] = TR.t2j(ref.scale_weights)
    elif fusion == "attention":
        p["fusion_attention"] = TR.lin(ref.fusion_attention)
    if ref.use_layer_norm:
        p["ln"] = TR.ln(ref.layer_norm)
    # T=7: non-divisible by scale 2 exercises truncation (test_fix.py
    # :105-146 territory)
    x = _x(B, 7, H, seed=5)
    with torch.no_grad(), TR.quiet():
        want = ref(torch.tensor(x))
    got = mine(p, jnp.asarray(x))
    TR.allclose(got, want.numpy(), rtol=5e-4, atol=5e-5,
                msg=f"fusion={fusion}")
