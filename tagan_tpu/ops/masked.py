"""Masked softmax and pooling primitives.

The reference masks attention with ``masked_fill(mask==0, -inf)`` followed
by softmax (`/root/reference/src/tagan/layers/geometric_attention.py:504-511`).
Under padding, fully-masked rows would produce NaN; `masked_softmax` keeps
the same math on rows with >=1 valid entry and returns zeros on dead rows
(padded slots), which downstream masking makes inert.
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp

NEG_INF = -1e30


def masked_softmax(scores: jax.Array, mask: Optional[jax.Array],
                   axis: int = -1) -> jax.Array:
    """softmax(where(mask, scores, -inf)) with zero output on all-masked
    rows instead of NaN."""
    if mask is None:
        return jax.nn.softmax(scores, axis=axis)
    neg = jnp.asarray(NEG_INF, scores.dtype)
    masked = jnp.where(mask, scores, neg)
    m = jnp.max(masked, axis=axis, keepdims=True)
    # guard rows where everything is masked
    m = jnp.where(m <= neg * 0.5, 0.0, m)
    # no post-exp re-mask needed: masked entries hold NEG_INF, and with
    # m >= 0 on dead rows / m >= the row max elsewhere, exp(NEG_INF - m)
    # underflows to exactly 0 (saves a convert+multiply pass over the
    # full score tensor — the dense path is HBM-bound)
    e = jnp.exp(masked - m)
    denom = jnp.sum(e, axis=axis, keepdims=True)
    return e / jnp.where(denom == 0, 1.0, denom)


def masked_mean(x: jax.Array, mask: Optional[jax.Array], axis: int,
                eps: float = 1e-10) -> jax.Array:
    """Mean over `axis` counting only masked-in entries
    (classification.py:871-879 semantics, denom + 1e-10)."""
    if mask is None:
        return jnp.mean(x, axis=axis)
    m = jnp.expand_dims(mask.astype(x.dtype), -1) if mask.ndim == x.ndim - 1 \
        else mask.astype(x.dtype)
    s = jnp.sum(x * m, axis=axis)
    d = jnp.sum(m, axis=axis)
    return s / (d + eps)


def masked_max(x: jax.Array, mask: Optional[jax.Array], axis: int
               ) -> jax.Array:
    """Max with masked-out entries at -1e9 (classification.py:881-889)."""
    if mask is None:
        return jnp.max(x, axis=axis)
    m = jnp.expand_dims(mask.astype(x.dtype), -1) if mask.ndim == x.ndim - 1 \
        else mask.astype(x.dtype)
    return jnp.max(x * m + (1.0 - m) * -1e9, axis=axis)
