"""Checkpointing backends.

SURVEY.md §5 calls for a single checkpoint containing params, optimizer
state, AND the functional memory-bank pytree (fixing the reference's
split/broken persistence, trainer.py:520-561 + model.py:624-640). Two
backends behind one API:

* ``pickle`` — single-file, dependency-free (what `TAGANTrainer` uses
  internally).
* ``orbax`` — directory-based `orbax.checkpoint` for large pytrees,
  async-friendly and multi-host-aware on real pods.
"""

from __future__ import annotations

import os
import pickle
from typing import Any, Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np


def save_checkpoint(path: str, payload: Dict[str, Any],
                    backend: str = "pickle") -> None:
    """payload: arbitrary pytree dict (params / opt_state / memory /
    config dicts / scalars)."""
    host = jax.tree_util.tree_map(
        lambda x: np.asarray(x) if hasattr(x, "shape") else x, payload)
    if backend == "pickle":
        os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
        with open(path, "wb") as f:
            pickle.dump(host, f)
        return
    if backend == "orbax":
        import orbax.checkpoint as ocp
        path = os.path.abspath(path)
        ckptr = ocp.PyTreeCheckpointer()
        ckptr.save(path, host, force=True)
        return
    raise ValueError(f"unknown checkpoint backend {backend}")


def load_checkpoint(path: str, backend: str = "pickle",
                    to_device: bool = True) -> Dict[str, Any]:
    if backend == "pickle":
        with open(path, "rb") as f:
            payload = pickle.load(f)
    elif backend == "orbax":
        import orbax.checkpoint as ocp
        ckptr = ocp.PyTreeCheckpointer()
        payload = ckptr.restore(os.path.abspath(path))
    else:
        raise ValueError(f"unknown checkpoint backend {backend}")
    if to_device:
        payload = jax.tree_util.tree_map(
            lambda x: jnp.asarray(x)
            if isinstance(x, np.ndarray) and x.dtype != object else x,
            payload)
    return payload
