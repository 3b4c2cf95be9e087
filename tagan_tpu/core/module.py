"""Minimal functional parameter system for TAGAN-TPU.

Everything in this framework is a pure function over explicit parameter
pytrees (nested dicts of jnp arrays). This module provides the primitive
building blocks: parameter initializers and the tiny set of "layers"
(linear / layer-norm / mlp / dropout) that the model stack composes.

Design: no module objects own state. ``init_*`` functions build param
dicts from a PRNG key; ``*_apply`` functions are pure. This maps cleanly
onto jit/pjit/scan and makes checkpointing a plain pytree dump.

Initialization semantics mirror the reference implementation
(`/root/reference/src/tagan/layers/*.py`): Xavier/Glorot-uniform weights,
zero (or explicitly constant) biases, LayerNorm gamma=1/beta=0.
"""

from __future__ import annotations

import math
from typing import Any, Dict, Optional, Sequence

import jax
import jax.numpy as jnp

Params = Dict[str, Any]


# ---------------------------------------------------------------------------
# Initializers
# ---------------------------------------------------------------------------

def xavier_uniform(key: jax.Array, shape: Sequence[int],
                   dtype=jnp.float32) -> jax.Array:
    """Glorot/Xavier uniform init.

    For a 2D weight of shape [fan_in, fan_out] the bound is
    sqrt(6 / (fan_in + fan_out)) — identical to torch's
    ``nn.init.xavier_uniform_`` (which uses [fan_out, fan_in] layout; the
    bound is symmetric in the two fans so layouts agree numerically).
    For >2D weights (e.g. per-head tables) the trailing two dims are the
    fans and leading dims are receptive field, matching torch.
    """
    if len(shape) < 2:
        # torch xavier requires >=2D; treat vector as [1, n]
        fan_in, fan_out = 1, shape[0]
    else:
        receptive = 1
        for s in shape[:-2]:
            receptive *= s
        # torch convention: fan_in = shape[1] * receptive, fan_out = shape[0] * receptive
        # for our [in, out] layout: fan_in = shape[-2], fan_out = shape[-1]
        fan_in, fan_out = shape[-2] * receptive, shape[-1] * receptive
    bound = math.sqrt(6.0 / (fan_in + fan_out))
    return jax.random.uniform(key, tuple(shape), dtype, -bound, bound)


def zeros(shape: Sequence[int], dtype=jnp.float32) -> jax.Array:
    return jnp.zeros(tuple(shape), dtype)


def ones(shape: Sequence[int], dtype=jnp.float32) -> jax.Array:
    return jnp.ones(tuple(shape), dtype)


# ---------------------------------------------------------------------------
# Linear
# ---------------------------------------------------------------------------

def init_linear(key: jax.Array, in_dim: int, out_dim: int,
                bias: bool = True, bias_init: float = 0.0,
                dtype=jnp.float32) -> Params:
    """Linear layer params. Weight layout [in_dim, out_dim] (JAX convention)."""
    p: Params = {"w": xavier_uniform(key, (in_dim, out_dim), dtype)}
    if bias:
        p["b"] = jnp.full((out_dim,), bias_init, dtype)
    return p


def linear(p: Params, x: jax.Array) -> jax.Array:
    y = x @ p["w"]
    if "b" in p:
        y = y + p["b"]
    return y


# ---------------------------------------------------------------------------
# LayerNorm (matches torch nn.LayerNorm: eps inside sqrt, biased variance)
# ---------------------------------------------------------------------------

def init_layer_norm(dim: int, dtype=jnp.float32) -> Params:
    return {"g": ones((dim,), dtype), "b": zeros((dim,), dtype)}


def layer_norm(p: Params, x: jax.Array, eps: float = 1e-5) -> jax.Array:
    mu = jnp.mean(x, axis=-1, keepdims=True)
    var = jnp.mean(jnp.square(x - mu), axis=-1, keepdims=True)
    y = (x - mu) * jax.lax.rsqrt(var + eps)
    return y * p["g"] + p["b"]


# ---------------------------------------------------------------------------
# Dropout — explicit rng; identity when deterministic.
# ---------------------------------------------------------------------------

def dropout(x: jax.Array, rate: float, *, deterministic: bool = True,
            rng: Optional[jax.Array] = None) -> jax.Array:
    if deterministic or rate <= 0.0:
        return x
    if rng is None:
        raise ValueError("dropout with deterministic=False requires an rng key")
    keep = 1.0 - rate
    mask = jax.random.bernoulli(rng, keep, x.shape)
    return jnp.where(mask, x / keep, 0.0)


# ---------------------------------------------------------------------------
# Activation registry (mirrors reference activation menus,
# classification.py:88-99)
# ---------------------------------------------------------------------------

def activation(name: str):
    return {
        "relu": jax.nn.relu,
        "leaky_relu": lambda x: jax.nn.leaky_relu(x, 0.01),
        "gelu": jax.nn.gelu,  # torch nn.GELU default = exact erf
        "gelu_exact": lambda x: jax.nn.gelu(x, approximate=False),
        "elu": jax.nn.elu,
        "tanh": jnp.tanh,
        "sigmoid": jax.nn.sigmoid,
    }.get(name, jax.nn.relu)


# torch nn.GELU uses the exact erf formulation; jax.nn.gelu defaults to tanh
# approximation. Use exact for parity.
def gelu_exact(x: jax.Array) -> jax.Array:
    return jax.nn.gelu(x, approximate=False)


# ---------------------------------------------------------------------------
# RNG helper: deterministic named key splitting
# ---------------------------------------------------------------------------

def split_keys(key: jax.Array, names: Sequence[str]) -> Dict[str, jax.Array]:
    ks = jax.random.split(key, len(names))
    return {n: k for n, k in zip(names, ks)}
