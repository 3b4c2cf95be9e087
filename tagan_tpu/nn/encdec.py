"""Encoder / decoder split of TAGAN.

The reference ships ``TAGANEncoder`` / ``TAGANDecoder`` /
``TAGANEncoderDecoder`` (`/root/reference/src/tagan/model.py:663-1068`)
but all three are dead on arrival: the encoder constructs
``TemporalPropagation``/``TemporalAttention`` with kwargs their
``__init__``s don't accept (:716-734 — TypeError), and the decoder
references undefined ``ClassificationHead``/``TAGANLoss`` names
(:901-914 — NameError). This module implements the *intended* design as
working components:

* ``TAGANEncoder`` — spatial encoding per snapshot (+first-layer skip),
  streaming temporal propagation with the functional memory bank, and
  asymmetric temporal attention aggregation; returns per-slot temporal
  representations [N, T, H] (optionally pooled) plus the updated memory.
* ``TAGANDecoder`` — the intended ``ClassificationHead`` as an MLP with
  hidden dims [2H, H] (:904) plus the loss family.
* ``TAGANEncoderDecoder`` — composition with ``infer`` and explicit
  temporal-state threading (fixing the reference's broken
  reset/save/load_temporal_state, model.py:619-640 — bug B5).
"""

from __future__ import annotations

import dataclasses
from typing import Any, Dict, NamedTuple, Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..core import module as M
from ..core.config import TAGANConfig
from ..core.graph import SnapshotSequence
from ..core.memory import MemoryState, init_memory
from .heads import temporal_loss
from .model import TAGAN


class EncodedSequence(NamedTuple):
    node_temporal: jax.Array      # [N, T, hidden] per-slot representation
    pooled: jax.Array             # [hidden] sequence-level representation
    memory: MemoryState


@dataclasses.dataclass(frozen=True)
class TAGANEncoder:
    config: TAGANConfig

    @property
    def _model(self) -> TAGAN:
        return TAGAN(self.config)

    def init(self, key: jax.Array) -> M.Params:
        p = self._model.init(key)
        # the encoder owns everything up to (and incl.) temporal attention
        p.pop("classification_head", None)
        return p

    def __call__(
        self,
        p: M.Params,
        seq: SnapshotSequence,
        memory: Optional[MemoryState] = None,
        *,
        deterministic: bool = True,
        rng: Optional[jax.Array] = None,
        return_attention_weights: bool = False,
    ):
        c = self.config
        model = self._model
        T, N = seq.x.shape[0], seq.x.shape[1]
        r_sp = r_prop = r_ta = None
        if not deterministic and rng is not None:
            rng, r_sp, r_prop, r_ta = jax.random.split(rng, 4)

        enc = model.encode_spatial(p, seq, deterministic=deterministic,
                                   rng=r_sp,
                                   return_weights=return_attention_weights)
        if return_attention_weights:
            x, geo_w = enc
        else:
            x, geo_w = enc, None
        x = jnp.where(seq.node_mask[..., None], x, 0.0)

        prop = model.temporal_propagation
        out = prop(p["temporal_propagation"], x, seq.node_mask,
                   seq.times if c.time_aware else None, memory,
                   time_mask=seq.time_mask,
                   deterministic=deterministic, rng=r_prop)
        x = jnp.where(seq.node_mask[..., None], out.features, 0.0)

        nt = jnp.swapaxes(x, 0, 1)                  # [N, T, hidden]
        ta = model.temporal_attention
        ts = jnp.broadcast_to(seq.times[None, :], (N, T))
        tmask = seq.time_mask[None, :] & seq.time_mask[:, None]
        res = ta(p["temporal_attention"], nt, time_stamps=ts,
                 attention_mask=tmask,
                 deterministic=deterministic, rng=r_ta,
                 return_weights=return_attention_weights)
        if return_attention_weights:
            nt, temp_w = res
        else:
            nt, temp_w = res, None

        # masked mean over active (node, time) cells -> pooled repr
        m = (seq.node_mask.T[..., None]).astype(nt.dtype)   # [N, T, 1]
        pooled = jnp.sum(nt * m, axis=(0, 1)) \
            / jnp.maximum(jnp.sum(m, axis=(0, 1)), 1.0)

        encoded = EncodedSequence(node_temporal=nt, pooled=pooled,
                                  memory=out.memory)
        if return_attention_weights:
            return encoded, {"geometric_attention_weights": geo_w,
                             "temporal_attention_weights": temp_w}
        return encoded

    def init_memory(self, max_nodes: int) -> MemoryState:
        return init_memory(max_nodes, self.config.hidden_dim)


@dataclasses.dataclass(frozen=True)
class TAGANDecoder:
    """Intended ClassificationHead: MLP [H -> 2H -> H -> out] (:904) +
    loss family dispatch (the undefined ``TAGANLoss``)."""
    config: TAGANConfig

    def init(self, key: jax.Array) -> M.Params:
        c = self.config
        ks = jax.random.split(key, 3)
        dims = [c.hidden_dim, c.hidden_dim * 2, c.hidden_dim, c.output_dim]
        p: M.Params = {}
        for i in range(3):
            p[f"linear_{i}"] = M.init_linear(ks[i], dims[i], dims[i + 1])
            if c.use_layer_norm and i < 2:
                p[f"ln_{i}"] = M.init_layer_norm(dims[i + 1])
        return p

    def __call__(self, p: M.Params, encoded: jax.Array,
                 labels: Optional[jax.Array] = None,
                 *, deterministic: bool = True,
                 rng: Optional[jax.Array] = None) -> Dict[str, Any]:
        c = self.config
        x = encoded
        for i in range(3):
            x = M.linear(p[f"linear_{i}"], x)
            if i < 2:
                if c.use_layer_norm:
                    x = M.layer_norm(p[f"ln_{i}"], x)
                x = jax.nn.relu(x)
                if not deterministic and rng is not None:
                    rng, r = jax.random.split(rng)
                    x = M.dropout(x, c.dropout, deterministic=False, rng=r)
        logits = x
        loss = None
        if labels is not None:
            task = {"ce": "multi_class", "bce": "classification"}.get(
                c.loss_type, c.loss_type)
            lg = logits if logits.ndim > 1 else logits[None]
            lb = labels if labels.ndim > 0 else labels[None]
            if c.output_dim == 1 and task in ("classification", "focal"):
                sq = lg[..., 0] if lg.ndim == lb.ndim + 1 else lg
                loss = temporal_loss(sq, lb.astype(sq.dtype),
                                     task_type=task,
                                     focal_alpha=c.focal_alpha,
                                     focal_gamma=c.focal_gamma)
            else:
                loss = temporal_loss(lg, lb, task_type=task,
                                     focal_alpha=c.focal_alpha,
                                     focal_gamma=c.focal_gamma)
        if c.output_dim == 1:
            predictions = jax.nn.sigmoid(logits)
        else:
            predictions = jax.nn.softmax(logits, axis=-1)
        return {"logits": logits, "predictions": predictions, "loss": loss}


@dataclasses.dataclass(frozen=True)
class TAGANEncoderDecoder:
    config: TAGANConfig

    @property
    def encoder(self) -> TAGANEncoder:
        return TAGANEncoder(self.config)

    @property
    def decoder(self) -> TAGANDecoder:
        return TAGANDecoder(self.config)

    def init(self, key: jax.Array) -> M.Params:
        k1, k2 = jax.random.split(key)
        return {"encoder": self.encoder.init(k1),
                "decoder": self.decoder.init(k2)}

    def __call__(self, p: M.Params, seq: SnapshotSequence,
                 labels: Optional[jax.Array] = None,
                 memory: Optional[MemoryState] = None,
                 *, deterministic: bool = True,
                 rng: Optional[jax.Array] = None,
                 return_attention_weights: bool = False) -> Dict[str, Any]:
        r1 = r2 = None
        if not deterministic and rng is not None:
            r1, r2 = jax.random.split(rng)
        enc = self.encoder(p["encoder"], seq, memory,
                           deterministic=deterministic, rng=r1,
                           return_attention_weights=return_attention_weights)
        if return_attention_weights:
            enc, attn = enc
        out = self.decoder(p["decoder"], enc.pooled, labels,
                           deterministic=deterministic, rng=r2)
        out["memory"] = enc.memory
        out["node_temporal"] = enc.node_temporal
        if return_attention_weights:
            out.update(attn)
        return out

    def infer(self, p: M.Params, seq: SnapshotSequence,
              return_probs: bool = True,
              threshold: float = 0.5) -> Dict[str, Any]:
        out = self(p, seq, deterministic=True)
        preds = out["predictions"]
        if not return_probs:
            if self.config.output_dim == 1:
                preds = (preds > threshold).astype(jnp.float32)
            else:
                preds = jnp.argmax(preds, axis=-1)
        return {"predictions": preds, "logits": out["logits"]}


# ---------------------------------------------------------------------------
# Temporal-state persistence (fixes B5: the reference's
# save/load_temporal_state call methods that don't exist)
# ---------------------------------------------------------------------------

def save_temporal_state(memory: MemoryState, filepath: str) -> None:
    np.savez(filepath,
             states=np.asarray(memory.states),
             valid=np.asarray(memory.valid),
             last_seen=np.asarray(memory.last_seen),
             inactivity=np.asarray(memory.inactivity),
             frequency=np.asarray(memory.frequency))


def load_temporal_state(filepath: str) -> MemoryState:
    z = np.load(filepath if filepath.endswith(".npz")
                else filepath + ".npz")
    return MemoryState(states=jnp.asarray(z["states"]),
                       valid=jnp.asarray(z["valid"]),
                       last_seen=jnp.asarray(z["last_seen"]),
                       inactivity=jnp.asarray(z["inactivity"]),
                       frequency=jnp.asarray(z["frequency"]))
