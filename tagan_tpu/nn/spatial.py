"""Auxiliary spatial modules.

Vectorized re-designs of the reference's unwired geometric components
(`/root/reference/src/tagan/layers/geometric_attention.py:610-1210`):

* ``GeometricDistanceModule`` (:610-767) — pairwise distance matrix from
  projected features or (learned) coordinates with a learnable
  log-temperature. The reference computes this with a per-batch,
  per-row Python double loop (:703-748); here it is one broadcast.
* ``SpatialPositionEncoding`` (:770-1026) — spatial PE in 4 flavors:
  sinusoidal (learnable frequency bands), linear, learned table with
  linear interpolation, RBF basis.
* ``GeometricTemporalAttention`` (:1029-1210) — fuses geometric and
  asymmetric temporal attention with parallel / sequential / gated
  fusion.
"""

from __future__ import annotations

import dataclasses
import math
from typing import Optional

import jax
import jax.numpy as jnp

from ..core import module as M
from ..ops import distances as D
from .geometric import GeometricAttention
from .temporal_attention import AsymmetricTemporalAttention


@dataclasses.dataclass(frozen=True)
class GeometricDistanceModule:
    hidden_dim: int
    distance_metric: str = "euclidean"
    trainable: bool = True
    feature_based: bool = True
    coordinate_dim: int = 2
    temperature: float = 1.0

    def init(self, key: jax.Array) -> M.Params:
        p: M.Params = {}
        if self.feature_based and self.trainable:
            p["distance_projection"] = M.init_linear(
                key, self.hidden_dim, self.hidden_dim // 2)
        elif not self.feature_based and self.trainable:
            p["coordinate_projection"] = M.init_linear(
                key, self.hidden_dim, self.coordinate_dim)
        if self.trainable:
            p["log_temperature"] = jnp.asarray(
                math.log(self.temperature), jnp.float32)
        return p

    def __call__(self, p: M.Params, x: jax.Array,
                 coordinates: Optional[jax.Array] = None) -> jax.Array:
        """[B, S, H] (+optional coords) -> scaled distances [B, S, S].
        Distance-type metrics return raw distances (not negated) —
        matching the reference's direct use of DistanceMetric fns."""
        if self.feature_based:
            feats = M.linear(p["distance_projection"], x) \
                if self.trainable else x
        else:
            if coordinates is None:
                if not self.trainable:
                    raise ValueError(
                        "Coordinates must be provided when "
                        "feature_based=False and trainable=False")
                feats = M.linear(p["coordinate_projection"], x)
            else:
                feats = coordinates
        raw = D.pairwise_scores(self.distance_metric, feats, feats)
        if self.distance_metric in D.DISTANCE_LIKE:
            raw = -raw    # pairwise_scores negates distances; undo
        temperature = jnp.exp(p["log_temperature"]) if self.trainable \
            else self.temperature
        return raw / temperature


@dataclasses.dataclass(frozen=True)
class SpatialPositionEncoding:
    d_model: int
    encoding_type: str = "sinusoidal"
    max_spatial_distance: float = 100.0
    num_bases: int = 16
    learnable: bool = False
    dropout: float = 0.1
    table_size: int = 1000

    def init(self, key: jax.Array) -> M.Params:
        t = self.encoding_type
        if t == "sinusoidal":
            return {"freq_bands": jnp.arange(0, self.d_model, 2,
                                             dtype=jnp.float32)
                    * (-math.log(10000.0) / self.d_model)}
        if t == "learned":
            # table initialized sinusoidal over [0, max_dist] (:826-838)
            rng = jnp.linspace(0.0, self.max_spatial_distance,
                               self.table_size)
            pe = jnp.zeros((self.table_size, self.d_model))
            div = jnp.exp(jnp.arange(0, self.d_model, 2,
                                     dtype=jnp.float32)
                          * (-math.log(10000.0) / self.d_model))
            pe = pe.at[:, 0::2].set(jnp.sin(rng[:, None] * div))
            pe = pe.at[:, 1::2].set(
                jnp.cos(rng[:, None] * div[: self.d_model // 2]))
            return {"pos_enc": pe}
        if t == "basis":
            return {"basis_mu": jnp.linspace(0.0, 1.0, self.num_bases),
                    "basis_sigma": jnp.full((self.num_bases,), 0.1),
                    "basis_proj": M.init_linear(key, self.num_bases,
                                                self.d_model)}
        return {}

    def __call__(self, p: M.Params, positions: jax.Array,
                 x: Optional[jax.Array] = None, *,
                 deterministic: bool = True,
                 rng: Optional[jax.Array] = None) -> jax.Array:
        t = self.encoding_type
        if t == "sinusoidal":
            pos = jnp.clip(positions / self.max_spatial_distance, 0.0, 1.0)
            freqs = jnp.exp(p["freq_bands"])
            angles = pos[..., None] * freqs
            enc = jnp.zeros((*pos.shape, self.d_model))
            enc = enc.at[..., 0::2].set(jnp.sin(angles))
            enc = enc.at[..., 1::2].set(
                jnp.cos(angles[..., : self.d_model // 2]))
        elif t == "linear":
            pos = jnp.clip(positions / self.max_spatial_distance, 0.0, 1.0)
            enc = jnp.broadcast_to(pos[..., None],
                                   (*pos.shape, self.d_model))
        elif t == "learned":
            pos = jnp.clip(positions, 0.0, self.max_spatial_distance)
            idx = pos / self.max_spatial_distance * (self.table_size - 1)
            lo = jnp.clip(jnp.floor(idx).astype(jnp.int32), 0,
                          self.table_size - 1)
            hi = jnp.clip(jnp.ceil(idx).astype(jnp.int32), 0,
                          self.table_size - 1)
            w_hi = (idx - lo.astype(idx.dtype))[..., None]
            enc = (1.0 - w_hi) * p["pos_enc"][lo] + w_hi * p["pos_enc"][hi]
        elif t == "basis":
            pos = jnp.clip(positions / self.max_spatial_distance, 0.0, 1.0)
            vals = jnp.exp(-jnp.square(pos[..., None] - p["basis_mu"])
                           / (2.0 * jnp.square(p["basis_sigma"])))
            enc = M.linear(p["basis_proj"], vals)
        else:
            raise ValueError(f"Unknown encoding type: {t}")
        if not deterministic and rng is not None:
            enc = M.dropout(enc, self.dropout, deterministic=False, rng=rng)
        if x is not None:
            return x + enc
        return enc


@dataclasses.dataclass(frozen=True)
class GeometricTemporalAttention:
    hidden_dim: int
    num_heads: int = 8
    dropout: float = 0.1
    use_layer_norm: bool = True
    distance_metric: str = "euclidean"
    fusion_type: str = "parallel"
    geometric_weight: float = 0.5
    learnable_fusion: bool = True

    @property
    def geometric(self) -> GeometricAttention:
        return GeometricAttention(
            hidden_dim=self.hidden_dim, num_heads=self.num_heads,
            dropout=self.dropout, distance_metric=self.distance_metric,
            use_layer_norm=self.use_layer_norm, learnable_distance=True)

    @property
    def temporal(self) -> AsymmetricTemporalAttention:
        return AsymmetricTemporalAttention(
            hidden_dim=self.hidden_dim, num_heads=self.num_heads,
            dropout=self.dropout, causal=False, time_aware=True,
            use_layer_norm=self.use_layer_norm,
            asymmetric_window_size=5, future_discount=0.8)

    def init(self, key: jax.Array) -> M.Params:
        ks = M.split_keys(key, ["geo", "temp", "fusion"])
        p: M.Params = {"geometric": self.geometric.init(ks["geo"]),
                       "temporal": self.temporal.init(ks["temp"])}
        if self.fusion_type == "parallel":
            p["fusion_weights"] = jnp.asarray(
                [self.geometric_weight, 1.0 - self.geometric_weight])
        elif self.fusion_type == "gated":
            p["gate"] = M.init_linear(ks["fusion"], 2 * self.hidden_dim,
                                      self.hidden_dim)
        if self.use_layer_norm:
            p["ln"] = M.init_layer_norm(self.hidden_dim)
        return p

    def __call__(self, p: M.Params, x: jax.Array,
                 time_stamps: Optional[jax.Array] = None,
                 coordinates: Optional[jax.Array] = None,
                 attention_mask: Optional[jax.Array] = None,
                 geometric_bias: Optional[jax.Array] = None, *,
                 deterministic: bool = True,
                 rng: Optional[jax.Array] = None) -> jax.Array:
        del coordinates  # accepted for API parity; unused (as reference)
        identity = x
        r1 = r2 = r3 = None
        if not deterministic and rng is not None:
            rng, r1, r2, r3 = jax.random.split(rng, 4)

        if self.fusion_type == "parallel":
            geo = self.geometric(p["geometric"], x, attention_mask,
                                 geometric_bias,
                                 deterministic=deterministic, rng=r1)
            temp = self.temporal(p["temporal"], x, time_stamps,
                                 attention_mask,
                                 deterministic=deterministic, rng=r2)
            w = jax.nn.softmax(p["fusion_weights"])
            out = w[0] * geo + w[1] * temp
        elif self.fusion_type == "sequential":
            geo = self.geometric(p["geometric"], x, attention_mask,
                                 geometric_bias,
                                 deterministic=deterministic, rng=r1)
            out = self.temporal(p["temporal"], geo, time_stamps,
                                attention_mask,
                                deterministic=deterministic, rng=r2)
        elif self.fusion_type == "gated":
            geo = self.geometric(p["geometric"], x, attention_mask,
                                 geometric_bias,
                                 deterministic=deterministic, rng=r1)
            temp = self.temporal(p["temporal"], x, time_stamps,
                                 attention_mask,
                                 deterministic=deterministic, rng=r2)
            gates = jax.nn.sigmoid(M.linear(
                p["gate"], jnp.concatenate([geo, temp], axis=-1)))
            out = gates * geo + (1.0 - gates) * temp
        else:
            raise ValueError(f"Unknown fusion type: {self.fusion_type}")

        if not deterministic and r3 is not None:
            out = M.dropout(out, self.dropout, deterministic=False, rng=r3)
        out = out + identity
        if self.use_layer_norm:
            out = M.layer_norm(p["ln"], out)
        return out
