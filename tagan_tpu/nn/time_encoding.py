"""Time encodings (5 types) for temporal attention.

Functional re-design of the reference ``TimeEncoding``
(`/root/reference/src/tagan/layers/temporal_attention.py:15-306`):

  sinusoidal  Transformer PE table                       (:63-76)
  linear      position / max_len, repeated over d        (:78-91)
  log         log(position)/log(max_len), repeated       (:93-106)
  learned     free [max_len, d] parameter                (:108-110)
  basis       learnable RBF centers/widths + projection  (:112-116, :122-220)

Continuous time values are min-max normalized over the whole input
tensor, then either basis-evaluated (basis) or quantized to table rows
(others), exactly as the reference does (:241-269). The reference's
NaN/overflow guards (:137-206) are kept where they change numerics
(sigma clamp at 1e-7, exponent clamp at +-88); its print/try-except
scaffolding is dropped (SURVEY.md B10).
"""

from __future__ import annotations

import dataclasses
import math
from typing import Optional

import jax
import jax.numpy as jnp

from ..core import module as M


def sinusoidal_table(max_len: int, d_model: int) -> jnp.ndarray:
    pe = jnp.zeros((max_len, d_model))
    position = jnp.arange(max_len, dtype=jnp.float32)[:, None]
    div_term = jnp.exp(jnp.arange(0, d_model, 2, dtype=jnp.float32)
                       * (-math.log(10000.0) / d_model))
    pe = pe.at[:, 0::2].set(jnp.sin(position * div_term))
    n_cos = d_model // 2
    pe = pe.at[:, 1::2].set(jnp.cos(position * div_term[:n_cos]))
    return pe


@dataclasses.dataclass(frozen=True)
class TimeEncoding:
    d_model: int
    max_len: int = 5000
    learnable: bool = False
    encoding_type: str = "sinusoidal"
    dropout: float = 0.1
    num_bases: int = 16
    scale: float = 1.0

    def _fixed_table(self) -> jnp.ndarray:
        """The deterministic PE table for table-type encodings."""
        t = self.encoding_type
        if t == "sinusoidal":
            return sinusoidal_table(self.max_len, self.d_model)
        if t == "linear":
            pos = jnp.arange(self.max_len, dtype=jnp.float32) / self.max_len
            return jnp.repeat(pos[:, None], self.d_model, axis=1)
        if t == "log":
            pos = jnp.log(jnp.arange(1, self.max_len + 1,
                                     dtype=jnp.float32)
                          ) / math.log(self.max_len)
            return jnp.repeat(pos[:, None], self.d_model, axis=1)
        return jnp.zeros((self.max_len, self.d_model))

    def init(self, key: jax.Array) -> M.Params:
        t = self.encoding_type
        if t == "basis":
            k1, k2 = jax.random.split(key)
            return {
                "basis_mu": jnp.linspace(0.0, 1.0, self.num_bases),
                "basis_sigma": jnp.full((self.num_bases,), 0.1),
                "basis_proj": M.init_linear(k2, self.num_bases, self.d_model),
            }
        if t == "learned":
            return {"pe": jax.random.normal(key,
                                            (self.max_len, self.d_model))}
        if self.learnable:
            return {"pe": self._fixed_table()}
        # non-learnable table types hold NO parameters — the table is a
        # compile-time constant (the reference registers a frozen buffer,
        # temporal_attention.py:73-76; a param here would silently drift
        # under the optimizer's weight decay)
        return {}

    def _basis_encode(self, p: M.Params, time_norm: jax.Array) -> jax.Array:
        """RBF basis evaluation on already-normalized times [...]->[..., d]."""
        mu = p["basis_mu"]
        sigma_safe = jnp.maximum(p["basis_sigma"], 1e-7)   # :174
        dist = jnp.square(time_norm[..., None] - mu)       # [..., K]
        exponent = jnp.clip(-(dist / (2.0 * sigma_safe ** 2)), -88.0, 88.0)
        vals = jnp.exp(exponent)
        vals = jnp.nan_to_num(vals, nan=0.0)
        enc = M.linear(p["basis_proj"], vals)
        return jnp.nan_to_num(enc, nan=0.0)

    def __call__(
        self,
        p: M.Params,
        time_values: Optional[jax.Array] = None,   # [...]
        x: Optional[jax.Array] = None,             # [..., S, d]
        *,
        deterministic: bool = True,
        rng: Optional[jax.Array] = None,
    ) -> jax.Array:
        """Returns the encoding (shape of `time_values` + [d]) or
        x + encoding when `x` is given (:277-281)."""
        if self.encoding_type == "basis" and time_values is None:
            # undefined in the reference (falls into an unassigned-name
            # except that returns x unchanged, :260-290); defined here as
            # basis encoding of [0,1]-normalized integer positions.
            if x is None:
                raise ValueError("Either time_values or x must be provided")
            s = x.shape[-2]
            pos = jnp.broadcast_to(
                jnp.arange(s, dtype=x.dtype) / max(s - 1, 1), x.shape[:-1])
            encoding = self._basis_encode(p, pos)
        elif self.encoding_type == "basis" and time_values is not None:
            tv = jnp.nan_to_num(time_values, nan=0.0)
            tmin, tmax = jnp.min(tv), jnp.max(tv)
            rng_ok = (tmax - tmin) > 1e-7
            time_norm = jnp.where(rng_ok, (tv - tmin)
                                  / jnp.where(rng_ok, tmax - tmin, 1.0), 0.0)
            encoding = self._basis_encode(p, time_norm)
        else:
            if time_values is not None:
                tmin, tmax = jnp.min(time_values), jnp.max(time_values)
                ok = tmax > tmin
                pos = jnp.where(
                    ok,
                    ((time_values - tmin) / jnp.where(ok, tmax - tmin, 1.0)
                     * (self.max_len - 1)),
                    0.0).astype(jnp.int32)
                pos = jnp.clip(pos, 0, self.max_len - 1)
            elif x is not None:
                s = x.shape[-2]
                pos = jnp.broadcast_to(jnp.arange(s), x.shape[:-1])
            else:
                raise ValueError("Either time_values or x must be provided")
            table = p["pe"] if "pe" in p else self._fixed_table()
            encoding = jnp.take(table, pos, axis=0)

        encoding = encoding * self.scale
        if not deterministic and rng is not None:
            encoding = M.dropout(encoding, self.dropout, deterministic=False,
                                 rng=rng)
        if x is not None:
            return x + encoding
        return encoding
