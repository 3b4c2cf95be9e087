"""Temporal attention over the snapshot axis.

TPU-native re-design of the reference temporal attention stack
(`/root/reference/src/tagan/layers/temporal_attention.py`):

* ``TemporalAttention`` (:309-621) — pre-LN multi-head attention over
  time. The reference accepts ragged lists of per-snapshot tensors and
  pads positionally (:421-467); in this framework alignment happens
  upstream in slot space (`core.graph`), so the layer is a pure function
  on dense ``[B, T, hidden]`` (B = node slots or sequences).
* ``AsymmetricTemporalAttention`` (:624-1217) — adds (a) a relative
  -position bias table (:683-692, :1011-1021), (b) the learned
  asymmetric past/future kernel with the exact reference initialization
  (:713-730), (c) continuous-time additive scores via `TimeEncoding`
  (:792-871, :1029-1039), (d) the |Δt| <= max_time_diff time mask
  (:873-903), (e) optional causal masking (:1072-1076).
* ``MultiTimeScaleAttention`` (:1220-1542) — mean-pool downsample,
  per-scale asymmetric attention (window 3·scale), repeat-upsample,
  concat/sum/weighted_sum/attention fusion.

Masking is explicit and boolean. The reference's defensive mask-coercion
cascade (:1079-1172) is intentionally NOT reproduced here (SURVEY.md
§7.4); the single executed-path quirk that changes numerics — an
all-ones mask being coerced to causal (:1143-1148) — is available as
``coerce_permissive_to_causal`` for Oracle-A parity runs.
"""

from __future__ import annotations

import dataclasses
import math
from typing import Dict, Optional, Sequence, Tuple, Union

import jax
import jax.numpy as jnp

from ..core import module as M
from ..ops.masked import masked_softmax
from .time_encoding import TimeEncoding


def causal_mask(seq_len: int) -> jax.Array:
    """Lower-triangular causal mask (temporal_attention.py:385-398)."""
    return jnp.tril(jnp.ones((seq_len, seq_len), bool))


@dataclasses.dataclass(frozen=True)
class TemporalAttention:
    hidden_dim: int
    num_heads: int = 8
    dropout: float = 0.1
    causal: bool = False
    use_layer_norm: bool = True

    def __post_init__(self):
        assert self.hidden_dim % self.num_heads == 0

    @property
    def head_dim(self) -> int:
        return self.hidden_dim // self.num_heads

    def init(self, key: jax.Array) -> M.Params:
        ks = M.split_keys(key, ["q", "k", "v", "o"])
        h = self.hidden_dim
        p: M.Params = {
            "q": M.init_linear(ks["q"], h, h),
            "k": M.init_linear(ks["k"], h, h),
            "v": M.init_linear(ks["v"], h, h),
            "o": M.init_linear(ks["o"], h, h),
        }
        if self.use_layer_norm:
            p["ln1"] = M.init_layer_norm(h)
            p["ln2"] = M.init_layer_norm(h)
        return p

    def _qkv(self, p: M.Params, x: jax.Array):
        *lead, t, _ = x.shape

        def split(y):
            y = y.reshape(*lead, t, self.num_heads, self.head_dim)
            return jnp.moveaxis(y, -2, -3)     # [..., H, T, Dh]
        return (split(M.linear(p["q"], x)), split(M.linear(p["k"], x)),
                split(M.linear(p["v"], x)))

    def _finish(self, p: M.Params, weights: jax.Array, v: jax.Array,
                identity: jax.Array, *, deterministic: bool,
                rng: Optional[jax.Array]):
        ctx = jnp.einsum("...ij,...jd->...id", weights, v)
        ctx = jnp.moveaxis(ctx, -3, -2)
        *lead, t, _, _ = ctx.shape
        ctx = ctx.reshape(*lead, t, self.hidden_dim)
        ctx = M.linear(p["o"], ctx)
        if not deterministic and rng is not None:
            ctx = M.dropout(ctx, self.dropout, deterministic=False, rng=rng)
        out = ctx + identity
        if self.use_layer_norm:
            out = M.layer_norm(p["ln2"], out)
        return out

    def __call__(
        self,
        p: M.Params,
        x: jax.Array,                                # [B, T, hidden]
        attention_mask: Optional[jax.Array] = None,  # bool [T,T] or [B,T,T]
        *,
        deterministic: bool = True,
        rng: Optional[jax.Array] = None,
        return_weights: bool = False,
    ):
        t = x.shape[-2]
        identity = x
        h = M.layer_norm(p["ln1"], x) if self.use_layer_norm else x
        q, k, v = self._qkv(p, h)
        scores = jnp.einsum("...id,...jd->...ij", q, k) \
            / math.sqrt(self.head_dim)

        mask = attention_mask
        if self.causal:
            cm = causal_mask(t)
            mask = cm if mask is None else jnp.logical_and(mask, cm)
        if mask is not None and mask.ndim == scores.ndim - 1:
            mask = mask[..., None, :, :]
        weights = masked_softmax(scores, mask)
        if not deterministic and rng is not None:
            rng, r = jax.random.split(rng)
            weights = M.dropout(weights, self.dropout, deterministic=False,
                                rng=r)
        out = self._finish(p, weights, v, identity,
                           deterministic=deterministic, rng=rng)
        if return_weights:
            return out, weights
        return out


@dataclasses.dataclass(frozen=True)
class AsymmetricTemporalAttention:
    hidden_dim: int
    num_heads: int = 8
    dropout: float = 0.1
    causal: bool = False
    time_aware: bool = True
    use_layer_norm: bool = True
    asymmetric_window_size: int = 5
    future_discount: float = 0.8
    relative_position_bias: bool = True
    max_relative_position: int = 32
    time_encoding_type: str = "basis"
    use_time_masks: bool = True
    max_time_diff: float = 10.0
    coerce_permissive_to_causal: bool = False   # Oracle-A quirk (:1143-1148)
    # The reference's init comments say "past context gets higher
    # weight", but its table is indexed by rel = i - j, so the indices
    # its init loop treats as "past" (i < center ↔ rel < 0 ↔ j > i) are
    # actually FUTURE keys — the orientation is flipped (latent bug
    # B11, temporal_attention.py:713-730). False = replicate the
    # reference exactly (parity); True = the documented intent: keys in
    # the query's past start with the higher weight.
    orient_past_high: bool = False

    @property
    def base(self) -> TemporalAttention:
        return TemporalAttention(self.hidden_dim, self.num_heads,
                                 self.dropout, self.causal,
                                 self.use_layer_norm)

    @property
    def time_encoding(self) -> TimeEncoding:
        # model wiring: learnable=True, num_bases=hidden//4 (:696-701)
        return TimeEncoding(d_model=self.hidden_dim, learnable=True,
                            encoding_type=self.time_encoding_type,
                            num_bases=self.hidden_dim // 4,
                            dropout=self.dropout)

    def init(self, key: jax.Array) -> M.Params:
        ks = M.split_keys(key, ["base", "relpos", "tenc", "tq", "tk"])
        p = self.base.init(ks["base"])
        if self.relative_position_bias:
            # xavier-uniform table [(2*maxrel+1), H] (:687-692)
            p["relative_pos_table"] = M.xavier_uniform(
                ks["relpos"],
                (2 * self.max_relative_position + 1, self.num_heads))
        if self.time_aware:
            p["time_encoding"] = self.time_encoding.init(ks["tenc"])
            p["time_q_proj"] = M.init_linear(ks["tq"], self.hidden_dim,
                                             self.num_heads)
            # NOTE: the reference also creates time_k_proj (:705) but never
            # uses it (:848 only applies time_q_proj); we omit the dead
            # parameter.
        p["asymmetric_kernel"] = self._init_asymmetric_kernel()
        return p

    def _init_asymmetric_kernel(self) -> jax.Array:
        """Reference init values (:713-730): 1-0.5*d/W on one side,
        discount*(1-0.5*d/W) on the other, center 1. Orientation per
        `orient_past_high` (see B11 note above): False replicates the
        reference byte-for-byte (high weights land on future keys);
        True realizes the documented intent (high weights on past keys,
        i.e. table indices with rel = i - j > 0)."""
        w = self.asymmetric_window_size
        idx = jnp.arange(2 * w + 1)
        dist = jnp.abs(idx - w).astype(jnp.float32)
        base = 1.0 - 0.5 * (dist / w)
        high_side = (idx > w) if self.orient_past_high else (idx < w)
        low_side = (idx < w) if self.orient_past_high else (idx > w)
        vals = jnp.where(high_side, base,
                         jnp.where(low_side, self.future_discount * base,
                                   1.0))
        return jnp.repeat(vals[:, None], self.num_heads, axis=1)

    # -- score components -------------------------------------------------
    def _relative_positions(self, t: int) -> jax.Array:
        pos = jnp.arange(t)
        rel = pos[:, None] - pos[None, :]
        return jnp.clip(rel + self.max_relative_position, 0,
                        2 * self.max_relative_position)

    def _asymmetric_kernel_values(self, p: M.Params, t: int) -> jax.Array:
        """[T, T, H] kernel values, zero outside the window (:756-790)."""
        w = self.asymmetric_window_size
        pos = jnp.arange(t)
        rel = pos[:, None] - pos[None, :]
        within = (rel >= -w) & (rel <= w)
        idx = jnp.clip(rel + w, 0, 2 * w)
        vals = p["asymmetric_kernel"][idx]          # [T, T, H]
        return vals * within[..., None].astype(vals.dtype)

    def _time_scores(self, p: M.Params, time_diffs: jax.Array,
                     *, deterministic: bool, rng) -> jax.Array:
        """Δt [B, T, T] -> additive per-head scores [B, H, T, T]
        (:792-871). Normalization of Δt is global over the tensor,
        matching the reference's flatten-then-encode."""
        enc = self.time_encoding(p["time_encoding"], time_diffs,
                                 deterministic=deterministic, rng=rng)
        logits = M.linear(p["time_q_proj"], enc)     # [B, T, T, H]
        return jnp.moveaxis(logits, -1, -3)          # [B, H, T, T]

    def time_mask(self, time_stamps: jax.Array) -> jax.Array:
        """|Δt| <= max_time_diff boolean mask [B, T, T] (:873-903)."""
        td = jnp.abs(time_stamps[..., :, None] - time_stamps[..., None, :])
        return td <= self.max_time_diff

    # -- forward ----------------------------------------------------------
    def __call__(
        self,
        p: M.Params,
        x: jax.Array,                                # [B, T, hidden]
        time_stamps: Optional[jax.Array] = None,     # [B, T]
        attention_mask: Optional[jax.Array] = None,  # bool [T,T] or [B,T,T]
        *,
        deterministic: bool = True,
        rng: Optional[jax.Array] = None,
        return_weights: bool = False,
    ):
        t = x.shape[-2]
        base = self.base
        identity = x
        h = M.layer_norm(p["ln1"], x) if self.use_layer_norm else x
        q, k, v = base._qkv(p, h)
        scores = jnp.einsum("...id,...jd->...ij", q, k) \
            / math.sqrt(base.head_dim)               # [B, H, T, T]

        if self.relative_position_bias:
            rel = self._relative_positions(t)
            rel_bias = p["relative_pos_table"][rel]  # [T, T, H]
            scores = scores + jnp.moveaxis(rel_bias, -1, 0)

        kern = self._asymmetric_kernel_values(p, t)  # [T, T, H]
        scores = scores + jnp.moveaxis(kern, -1, 0)

        mask = attention_mask
        if mask is not None and mask.dtype != bool:
            mask = mask != 0

        if self.time_aware and time_stamps is not None:
            time_diffs = time_stamps[..., :, None] - time_stamps[..., None, :]
            trng = None
            if not deterministic and rng is not None:
                rng, trng = jax.random.split(rng)
            scores = scores + self._time_scores(
                p, time_diffs, deterministic=deterministic, rng=trng)
            if self.use_time_masks:
                tm = self.time_mask(time_stamps)
                mask = tm if mask is None else jnp.logical_and(mask, tm)

        if self.causal:
            cm = causal_mask(t)
            mask = cm if mask is None else jnp.logical_and(mask, cm)

        if mask is not None and self.coerce_permissive_to_causal:
            # Reference quirk: a matching-shape all-ones mask gets tril
            # applied (:1143-1148). Only exercised in Oracle-A parity runs.
            all_ones = jnp.all(mask)
            mask = jnp.logical_and(
                mask, jnp.where(all_ones, causal_mask(t), True))

        if mask is not None and mask.ndim == scores.ndim - 1:
            mask = mask[..., None, :, :]
        weights = masked_softmax(scores, mask)
        if not deterministic and rng is not None:
            rng, r = jax.random.split(rng)
            weights = M.dropout(weights, self.dropout, deterministic=False,
                                rng=r)
        out = base._finish(p, weights, v, identity,
                           deterministic=deterministic, rng=rng)
        if return_weights:
            return out, weights
        return out


@dataclasses.dataclass(frozen=True)
class MultiTimeScaleAttention:
    """Multi-resolution temporal attention (:1220-1542)."""
    hidden_dim: int
    num_scales: int = 3
    scale_factors: Tuple[int, ...] = (1, 2, 4)
    num_heads: int = 8
    dropout: float = 0.1
    use_layer_norm: bool = True
    time_aware: bool = True
    fusion_type: str = "concat"

    def _scales(self) -> Tuple[int, ...]:
        s = list(self.scale_factors)
        for i in range(len(s), self.num_scales):
            s.append(2 ** i)
        return tuple(s[: self.num_scales])

    def _module(self, scale: int) -> AsymmetricTemporalAttention:
        return AsymmetricTemporalAttention(
            hidden_dim=self.hidden_dim, num_heads=self.num_heads,
            dropout=self.dropout, causal=False, time_aware=self.time_aware,
            use_layer_norm=self.use_layer_norm,
            asymmetric_window_size=3 * scale)   # :1284

    def init(self, key: jax.Array) -> M.Params:
        scales = self._scales()
        ks = jax.random.split(key, len(scales) + 1)
        p: M.Params = {"scales": {
            f"scale_{s}": self._module(s).init(ks[i])
            for i, s in enumerate(scales)}}
        if self.fusion_type == "concat":
            p["fusion"] = M.init_linear(
                ks[-1], self.hidden_dim * len(scales), self.hidden_dim)
        elif self.fusion_type == "weighted_sum":
            p["scale_weights"] = jnp.ones((len(scales),))
        elif self.fusion_type == "attention":
            p["fusion_attention"] = M.init_linear(
                ks[-1], self.hidden_dim, len(scales))
        if self.use_layer_norm:
            p["ln"] = M.init_layer_norm(self.hidden_dim)
        return p

    @staticmethod
    def _downsample(x: jax.Array, s: int) -> jax.Array:
        """Truncate-to-divisible mean pooling (:1321-1357)."""
        if s == 1:
            return x
        b, t, h = x.shape
        t2 = (t // s) * s
        if t2 == 0:
            return x[:, :0]
        return x[:, :t2].reshape(b, t2 // s, s, h).mean(axis=2)

    @staticmethod
    def _upsample(x: jax.Array, target_len: int, s: int) -> jax.Array:
        """Repeat-upsample, pad/truncate to target (:1359-1404)."""
        b, t, h = x.shape
        if s != 1:
            x = jnp.repeat(x, s, axis=1)
            t = t * s
        if t < target_len:
            pad = jnp.zeros((b, target_len - t, h), x.dtype)
            return jnp.concatenate([x, pad], axis=1)
        return x[:, :target_len]

    def __call__(
        self,
        p: M.Params,
        x: jax.Array,                                # [B, T, hidden]
        time_stamps: Optional[jax.Array] = None,
        attention_mask: Optional[jax.Array] = None,
        *,
        deterministic: bool = True,
        rng: Optional[jax.Array] = None,
        return_weights: bool = False,
    ):
        b, t, h = x.shape
        scales = self._scales()
        outs = []
        all_w: Dict[str, jax.Array] = {}
        for s in scales:
            xd = self._downsample(x, s)
            td = None
            if time_stamps is not None:
                td = self._downsample(time_stamps[..., None], s)[..., 0]
            # note: mask downsampling in the reference is lossy
            # (:1451-1459); we drop the mask at coarser scales as the
            # reference effectively does after its float-mean rounding.
            md = attention_mask if s == 1 else None
            mod = self._module(s)
            r = None
            if not deterministic and rng is not None:
                rng, r = jax.random.split(rng)
            res = mod(p["scales"][f"scale_{s}"], xd, time_stamps=td,
                      attention_mask=md, deterministic=deterministic, rng=r,
                      return_weights=return_weights)
            if return_weights:
                res, w = res
                all_w[f"scale_{s}"] = w
            outs.append(self._upsample(res, t, s))

        if self.fusion_type == "concat":
            out = M.linear(p["fusion"], jnp.concatenate(outs, axis=-1))
        elif self.fusion_type == "sum":
            out = sum(outs)
        elif self.fusion_type == "weighted_sum":
            w = jax.nn.softmax(p["scale_weights"])
            out = sum(w[i] * o for i, o in enumerate(outs))
        elif self.fusion_type == "attention":
            stacked = jnp.stack(outs, axis=2)            # [B, T, S, H]
            fw = jax.nn.softmax(M.linear(p["fusion_attention"], x), axis=-1)
            out = jnp.sum(stacked * fw[..., None], axis=2)
        else:
            out = jnp.mean(jnp.stack(outs), axis=0)

        if not deterministic and rng is not None:
            rng, r = jax.random.split(rng)
            out = M.dropout(out, self.dropout, deterministic=False, rng=r)
        if self.use_layer_norm:
            out = M.layer_norm(p["ln"], out)
        if return_weights:
            return out, all_w
        return out
