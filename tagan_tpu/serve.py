"""Production inference / serving for TAGAN-TPU.

The reference has no serving story at all — inference is
``model.infer()`` called eagerly per sequence inside scripts
(`/root/reference/src/tagan/model.py:475-536`,
`run_tagan_social_media.py:352-569`). This module is the TPU-native
deployment path the task mandates:

* :class:`Predictor` — shape-bucketed, jit-cached **batched** inference
  over ragged snapshot sequences (reference wire format in, numpy
  probabilities out). One compile per shape bucket; ragged inputs are
  padded into the bucket and batched, so steady-state serving issues a
  single device program per batch instead of the reference's
  one-Python-call-per-sequence loop.
* :class:`StreamingSession` — online inference over an unbounded
  snapshot stream: chunks of T snapshots at a time, the functional
  memory bank carried between calls (what the reference's broken
  ``save/load_temporal_state`` was meant to enable, model.py:619-640).
* :func:`export_artifact` / :func:`load_artifact` — ahead-of-time
  compiled model artifacts via ``jax.export`` (StableHLO): the saved
  directory (``predict.jaxexport`` + ``params.npz`` + ``meta.json``)
  reloads and serves **without the model's Python code**, pinned to the
  exact program that was validated.

All entry points run ``deterministic=True`` (no dropout) and compute
probabilities; hard-label thresholding is a single explicit parameter
(the reference uses 0.65/0.25/0.5/0.7 at different call sites — bug B8,
SURVEY.md §2.10 — not replicated).
"""

from __future__ import annotations

import json
import os
import pickle
from typing import Any, Dict, List, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from .core.config import TAGANConfig
from .core.graph import (SnapshotSequence, batch_sequences, build_sequence,
                         pad_dims_for)
from .core.memory import MemoryState
from .nn.model import TAGAN, batched_forward

ARTIFACT_VERSION = 1


# ---------------------------------------------------------------------------
# Predictor: jit-cached batched inference
# ---------------------------------------------------------------------------

class Predictor:
    """Batched inference over ragged snapshot sequences.

    Parameters
    ----------
    model, params:
        A :class:`~tagan_tpu.nn.model.TAGAN` and its parameter pytree.
    dims:
        Static bucket ``(max_time, max_nodes, max_edges, edge_feature_dim)``
        every input is padded into. ``None`` computes it per call
        (convenient, but a new shape means a new compile — pin it for
        serving).
    batch_size:
        Sequences per device program. Short final batches are padded
        (pad rows are dropped from the output).
    dense_adj:
        Materialize dense adjacency when packing. Defaults False for the
        flash/csr backends: unlike training (where a sequence transfers
        once and is reused every step, making the packed-adjacency
        structure path a win — see benchmarks/bench_10k_step.py), a
        served request pays the ``[T, N, N]`` host->device transfer every
        call, which dwarfs the ~0.1 ms structure-phase saving.
    """

    def __init__(self, model: TAGAN, params, *,
                 dims: Optional[Tuple[int, int, int, int]] = None,
                 batch_size: int = 8, dense_adj: Optional[bool] = None,
                 reorder: Optional[str] = None,
                 plan_pin: Optional[dict] = None,
                 plan_kwargs: Optional[dict] = None):
        if model.config.spatial_backend == "ring":
            raise ValueError(
                "spatial_backend='ring' cannot be served by Predictor: "
                "the ring is a multi-chip shard_map program over a "
                "device mesh — serve the same weights on one chip with "
                "spatial_backend='hybrid' (same semantics, >HBM-graph "
                "capable) or run distributed inference through "
                "dist.spmd.make_eval_step on the training mesh")
        self.model = model
        self.params = params
        self.dims = dims
        self.batch_size = int(batch_size)
        if dense_adj is None:
            dense_adj = model.config.spatial_backend == "dense"
        self.dense_adj = dense_adj
        self.reorder = reorder
        # hybrid serving: plans attach at pack time with PINNED static
        # dims (one compile per bucket). plan_pin from
        # core.graph.hybrid_plan_dims / a loader's discovered pin; when
        # None the first call discovers it from its own sequences.
        self.plan_pin = plan_pin
        self.plan_kwargs = dict(plan_kwargs or {})
        self._compiled: Dict[Any, Any] = {}

    # -- construction ------------------------------------------------------
    @classmethod
    def from_checkpoint(cls, path: str, **kw) -> "Predictor":
        """Build from a trainer checkpoint (``TAGANTrainer.save_checkpoint``)."""
        with open(path, "rb") as f:
            payload = pickle.load(f)
        cfg = TAGANConfig.from_dict(payload["config"])
        params = jax.tree_util.tree_map(jnp.asarray, payload["params"])
        return cls(TAGAN(cfg), params, **kw)

    # -- compile cache -----------------------------------------------------
    def _fn(self, batch: SnapshotSequence):
        key = tuple(batch.x.shape) + (batch.edge_src.shape[-1],
                                      batch.edge_attr.shape[-1])
        fn = self._compiled.get(key)
        if fn is None:
            model = self.model

            @jax.jit
            def fn(params, b):
                out = batched_forward(model, params, b)
                return out.logits, out.predictions

            self._compiled[key] = fn
        return fn

    def _pack(self, sequences) -> List[SnapshotSequence]:
        if isinstance(sequences, SnapshotSequence):
            # pre-built: single sequence or stacked batch
            return [sequences] if sequences.x.ndim == 3 else \
                [jax.tree_util.tree_map(lambda a: a[i], sequences)
                 for i in range(sequences.x.shape[0])]
        dims = self.dims or pad_dims_for(sequences)
        T, N, E, Fe = dims
        seqs = [build_sequence(s, max_nodes=N, max_edges=max(E, 1),
                               max_time=T, edge_feature_dim=Fe,
                               dense_adj=self.dense_adj,
                               reorder=self.reorder)
                for s in sequences]
        if self.model.config.spatial_backend == "hybrid":
            from .core.graph import attach_hybrid_plans
            cpu = jax.devices("cpu")[0]
            with jax.default_device(cpu):   # host-side plan build
                seqs, pin = attach_hybrid_plans(
                    seqs, pin=self.plan_pin, **self.plan_kwargs)
            if self.plan_pin is None:
                self.plan_pin = pin          # stable bucket from now on
        return seqs

    # -- inference ---------------------------------------------------------
    def predict_proba(self, sequences) -> np.ndarray:
        """Probabilities per sequence: ``[num, 1]`` sigmoid for binary,
        ``[num, C]`` softmax for multi-class."""
        seqs = self._pack(sequences)
        n = len(seqs)
        bs = self.batch_size
        probs = []
        for i in range(0, n, bs):
            chunk = seqs[i:i + bs]
            valid = len(chunk)
            while len(chunk) < bs:       # pad the final batch
                chunk.append(chunk[0])
            batch = batch_sequences(chunk)
            _, p = self._fn(batch)(self.params, batch)
            probs.append(np.asarray(p)[:valid])
        out = np.concatenate(probs, axis=0)
        return out.reshape(n, -1)

    def predict(self, sequences, threshold: float = 0.5) -> np.ndarray:
        """Hard labels: binary via ``proba > threshold``, multi-class via
        argmax."""
        p = self.predict_proba(sequences)
        if p.shape[-1] == 1:
            return (p[:, 0] > threshold).astype(np.int32)
        return np.argmax(p, axis=-1).astype(np.int32)

    __call__ = predict_proba

    def warmup(self, num_sequences: int = 1) -> None:
        """Force compilation of the bucket program before serving traffic.
        Requires ``dims`` to be pinned."""
        if self.dims is None:
            raise ValueError("warmup needs pinned dims")
        T, N, E, Fe = self.dims
        x = np.zeros((2, self.model.config.node_feature_dim), np.float32)
        ei = np.zeros((2, 1), np.int64)
        ea = np.zeros((1, Fe), np.float32) if Fe else None
        snap = {"x": x, "edge_index": ei, "edge_attr": ea,
                "node_ids": [0, 1], "timestep": 0.0}
        self.predict_proba([[snap]] * max(num_sequences, 1))


# ---------------------------------------------------------------------------
# Streaming inference with memory carry
# ---------------------------------------------------------------------------

def _remap_slots(seq: SnapshotSequence, perm: np.ndarray
                 ) -> SnapshotSequence:
    """Permute a sequence's node-slot axis: chunk slot ``s`` moves to
    slot ``perm[s]``. Every slot-space op in the model is
    permutation-equivariant, so outputs are unchanged — but the *memory
    rows* now line up with a caller-chosen (persistent) slot layout."""
    import dataclasses

    perm = np.asarray(perm, np.int32)
    inv = np.argsort(perm)                      # new slot -> old slot
    x = np.asarray(seq.x)[:, inv]
    node_mask = np.asarray(seq.node_mask)[:, inv]
    node_ids = np.asarray(seq.node_ids)[inv]
    edge_src = perm[np.asarray(seq.edge_src)]
    edge_dst = perm[np.asarray(seq.edge_dst)]
    adj = np.asarray(seq.adj)
    if seq.has_dense_adj:
        adj = adj[:, inv][:, :, inv]
    return dataclasses.replace(
        seq, x=jnp.asarray(x), node_mask=jnp.asarray(node_mask),
        adj=jnp.asarray(adj), edge_src=jnp.asarray(edge_src),
        edge_dst=jnp.asarray(edge_dst), node_ids=jnp.asarray(node_ids))


class StreamingSession:
    """Online inference over an unbounded snapshot stream.

    Feed chunks of snapshots; the functional memory bank (node states,
    last-seen, inactivity — `core.memory`) carries across chunks, so a
    node reappearing in a later chunk is blended with its decayed state
    exactly as within one sequence. This is the working version of the
    reference's broken ``save/load_temporal_state`` round trip
    (model.py:619-640 calls methods that do not exist — bug B5).

    Memory is keyed by **global node ID** (like the reference
    ``NodeMemoryBank``): the session maintains a persistent
    global-ID -> slot assignment and permutes each packed chunk into it,
    so a node reappearing in a later chunk with a different surrounding
    node set still meets *its own* decayed state. Slots of nodes whose
    memory has been pruned (``max_inactivity`` exceeded -> ``valid``
    cleared) are recycled when the ID space outgrows ``max_nodes``.
    """

    def __init__(self, model: TAGAN, params, *,
                 dims: Tuple[int, int, int, int],
                 dense_adj: Optional[bool] = None):
        if model.config.compat_mode == "executed":
            raise ValueError("streaming needs the intended pipeline "
                             "(executed mode never updates memory)")
        self.model = model
        self.params = params
        self.dims = dims
        if dense_adj is None:
            dense_adj = model.config.spatial_backend == "dense"
        self.dense_adj = dense_adj
        self.memory = model.init_memory(dims[1])
        self._slot_of: Dict[int, int] = {}      # global node id -> slot
        model_ = model

        @jax.jit
        def _step(params, seq, memory):
            out = model_(params, seq, None, memory, deterministic=True)
            return out.predictions, out.memory

        self._step = _step

    def _assign_slots(self, seq: SnapshotSequence) -> np.ndarray:
        """Extend the persistent id->slot map with this chunk's new IDs
        and return the chunk-slot -> persistent-slot permutation."""
        N = self.dims[1]
        ids = np.asarray(seq.node_ids)
        new_ids = [int(g) for g in ids if g >= 0
                   and int(g) not in self._slot_of]
        if new_ids:
            used = set(self._slot_of.values())
            free = [s for s in range(N) if s not in used]
            if len(free) < len(new_ids):
                # recycle slots whose memory was pruned (valid == False)
                valid = np.asarray(self.memory.valid)
                freeable = sorted(
                    (g for g, s in self._slot_of.items() if not valid[s]),
                    key=lambda g: self._slot_of[g])
                for g in freeable[: len(new_ids) - len(free)]:
                    free.append(self._slot_of.pop(g))
                free.sort()
            if len(free) < len(new_ids):
                raise ValueError(
                    f"stream has more live global node IDs than "
                    f"max_nodes={N} slots; raise dims[1] or let inactive "
                    f"nodes age past max_inactivity before reusing IDs")
            for g, s in zip(new_ids, free):
                self._slot_of[g] = s
        # occupied chunk slots go to their persistent slot; padded chunk
        # slots fill the remaining positions (injective -> a permutation)
        perm = np.full((len(ids),), -1, np.int32)
        taken = set()
        for s, g in enumerate(ids):
            if g >= 0:
                perm[s] = self._slot_of[int(g)]
                taken.add(int(perm[s]))
        spare = iter(s for s in range(len(ids)) if s not in taken)
        for s in range(len(ids)):
            if perm[s] < 0:
                perm[s] = next(spare)
        return perm

    def update(self, snapshots) -> np.ndarray:
        """Ingest one chunk (<= max_time snapshots); returns the current
        prediction probabilities given everything seen so far."""
        T, N, E, Fe = self.dims
        seq = build_sequence(snapshots, max_nodes=N, max_edges=max(E, 1),
                             max_time=T, edge_feature_dim=Fe,
                             dense_adj=self.dense_adj)
        seq = _remap_slots(seq, self._assign_slots(seq))
        preds, self.memory = self._step(self.params, seq, self.memory)
        return np.asarray(preds)

    @property
    def slot_of(self) -> Dict[int, int]:
        """Read-only view of the persistent global-ID -> slot map."""
        return dict(self._slot_of)

    def reset(self) -> None:
        self.memory = self.model.init_memory(self.dims[1])
        self._slot_of = {}

    def save_state(self, path: str) -> None:
        from .nn.encdec import save_temporal_state
        save_temporal_state(self.memory, path)
        with open(path + ".slots.json", "w") as f:
            json.dump({str(g): s for g, s in self._slot_of.items()}, f)

    def load_state(self, path: str) -> None:
        from .nn.encdec import load_temporal_state
        self.memory = load_temporal_state(path)
        slots_path = path + ".slots.json"
        if os.path.exists(slots_path):
            with open(slots_path) as f:
                self._slot_of = {int(g): int(s)
                                 for g, s in json.load(f).items()}


# ---------------------------------------------------------------------------
# AOT export: serve without the model's Python code
# ---------------------------------------------------------------------------

def _flatten_params(params) -> Dict[str, np.ndarray]:
    flat = {}
    for path, leaf in jax.tree_util.tree_flatten_with_path(params)[0]:
        key = "/".join(str(getattr(k, "key", getattr(k, "idx", k)))
                       for k in path)
        flat[key] = np.asarray(leaf)
    return flat


def _unflatten_params(flat: Dict[str, np.ndarray]):
    out: Dict[str, Any] = {}
    for key, val in flat.items():
        node = out
        parts = key.split("/")
        for p in parts[:-1]:
            node = node.setdefault(p, {})
        node[parts[-1]] = jnp.asarray(val)
    return out


def _template_batch(model: TAGAN, dims, batch_size: int,
                    dense_adj: bool, plan_pin: Optional[dict],
                    plan_kwargs: dict) -> SnapshotSequence:
    """A zero-filled stacked batch with the artifact's exact structure
    (incl. hybrid plan arrays when the backend needs them) — its leaves
    define the export's positional ABI on both sides."""
    T, N, E, Fe = dims
    x = np.zeros((2, model.config.node_feature_dim), np.float32)
    ei = np.zeros((2, 1), np.int64)
    ea = np.zeros((1, Fe), np.float32) if Fe else None
    snap = {"x": x, "edge_index": ei, "edge_attr": ea,
            "node_ids": [0, 1], "timestep": 0.0}
    seq = build_sequence([snap], max_nodes=N, max_edges=max(E, 1),
                         max_time=T, edge_feature_dim=Fe,
                         dense_adj=dense_adj)
    if model.config.spatial_backend == "hybrid":
        from .core.graph import attach_hybrid_plans
        if plan_pin is None:
            raise ValueError(
                "exporting a hybrid artifact needs plan_pin (the "
                "hybrid plan's static dims — core.graph."
                "hybrid_plan_dims of a planned sequence, or the "
                "loader's discovered pin)")
        (seq,), _ = attach_hybrid_plans([seq], pin=plan_pin,
                                        **plan_kwargs)
    return batch_sequences([seq] * batch_size)


def export_artifact(model: TAGAN, params, dims: Tuple[int, int, int, int],
                    path: str, *, batch_size: int = 8,
                    platforms: Optional[Sequence[str]] = None,
                    plan_pin: Optional[dict] = None,
                    plan_kwargs: Optional[dict] = None) -> None:
    """Serialize an ahead-of-time compiled predict function.

    Writes ``path/`` containing:

    * ``predict.jaxexport`` — ``jax.export`` StableHLO program for
      ``(params, batch) -> (logits, probabilities)`` at the pinned
      ``dims``/``batch_size`` shapes,
    * ``params.npz`` — flattened parameter arrays,
    * ``meta.json`` — artifact version, model config, dims, batch size.

    ``platforms`` defaults to ``("cpu", "tpu")`` so one artifact serves
    both — except for the Pallas kernel backends (flash/hybrid), whose
    kernels only lower for TPU, where the default is ``("tpu",)``. Pass
    ``platforms`` explicitly to override.

    ``spatial_backend="hybrid"`` artifacts additionally need
    ``plan_pin`` (the hybrid plan's pinned static dims) and reuse
    ``plan_kwargs`` at serve-time pack; the plan arrays cross the
    export boundary as extra leaves of the positional ABI.
    ``spatial_backend="ring"`` cannot be exported (multi-chip shard_map
    program — see :class:`Predictor`'s error for the alternatives).
    """
    from jax import export as jexport

    if model.config.spatial_backend == "ring":
        raise ValueError(
            "spatial_backend='ring' cannot be exported: the ring is a "
            "multi-chip shard_map program over a device mesh; export "
            "the same weights with spatial_backend='hybrid' for "
            "single-chip serving at >HBM-graph scale")
    dense_adj = model.config.spatial_backend == "dense"
    if platforms is None and model.config.spatial_backend in (
            "flash", "hybrid"):
        platforms = ("tpu",)
    plan_kwargs = dict(plan_kwargs or {})

    # the batch crosses the export boundary as a flat tuple of arrays
    # (jax.export cannot serialize custom pytree nodes); both sides
    # flatten a structurally identical template, so leaf order matches
    template = _template_batch(model, dims, batch_size, dense_adj,
                               plan_pin, plan_kwargs)
    leaves, treedef = jax.tree_util.tree_flatten(template)
    batch_specs = tuple(jax.ShapeDtypeStruct(a.shape, a.dtype)
                        for a in leaves)
    params_spec = jax.tree_util.tree_map(
        lambda a: jax.ShapeDtypeStruct(a.shape, a.dtype), params)

    def predict(p, *leaves):
        batch = jax.tree_util.tree_unflatten(treedef, leaves)
        out = batched_forward(model, p, batch)
        return out.logits, out.predictions

    if platforms is None:
        platforms = ("cpu", "tpu")
    exported = jexport.export(jax.jit(predict), platforms=tuple(platforms))(
        params_spec, *batch_specs)

    os.makedirs(path, exist_ok=True)
    with open(os.path.join(path, "predict.jaxexport"), "wb") as f:
        f.write(exported.serialize())
    np.savez(os.path.join(path, "params.npz"), **_flatten_params(params))
    with open(os.path.join(path, "meta.json"), "w") as f:
        json.dump({
            "artifact_version": ARTIFACT_VERSION,
            "config": model.config.to_dict(),
            "dims": list(dims),
            "batch_size": batch_size,
            "platforms": list(platforms),
            "dense_adj": dense_adj,
            "output_dim": model.config.output_dim,
            "plan_pin": plan_pin,
            "plan_kwargs": plan_kwargs,
        }, f, indent=2)


class ExportedPredictor:
    """A reloaded AOT artifact. Same predict API as :class:`Predictor`
    but executes the serialized StableHLO program — no model code, no
    retracing, bit-stable across processes."""

    def __init__(self, exported, params, meta: Dict[str, Any]):
        self._exported = exported
        self._params = params
        self.meta = meta
        self.dims = tuple(meta["dims"])
        self.batch_size = int(meta["batch_size"])
        self.dense_adj = bool(meta["dense_adj"])
        self.plan_pin = meta.get("plan_pin")
        self.plan_kwargs = dict(meta.get("plan_kwargs") or {})
        self._hybrid = (self.plan_pin is not None)

    def _pack(self, sequences) -> List[SnapshotSequence]:
        if isinstance(sequences, SnapshotSequence):
            # mirror Predictor._pack: unstack a pre-built stacked batch
            return [sequences] if sequences.x.ndim == 3 else \
                [jax.tree_util.tree_map(lambda a: a[i], sequences)
                 for i in range(sequences.x.shape[0])]
        T, N, E, Fe = self.dims
        seqs = [build_sequence(s, max_nodes=N, max_edges=max(E, 1),
                               max_time=T, edge_feature_dim=Fe,
                               dense_adj=self.dense_adj)
                for s in sequences]
        if self._hybrid:
            from .core.graph import attach_hybrid_plans
            pin = dict(self.plan_pin)
            if pin.get("cdims") is not None:
                pin["cdims"] = [tuple(d) for d in pin["cdims"]]
            cpu = jax.devices("cpu")[0]
            with jax.default_device(cpu):
                seqs, _ = attach_hybrid_plans(seqs, pin=pin,
                                              **self.plan_kwargs)
        return seqs

    def predict_proba(self, sequences) -> np.ndarray:
        seqs = self._pack(sequences)
        n = len(seqs)
        bs = self.batch_size
        probs = []
        for i in range(0, n, bs):
            chunk = seqs[i:i + bs]
            valid = len(chunk)
            while len(chunk) < bs:
                chunk.append(chunk[0])
            batch = batch_sequences(chunk)
            # same positional ABI as the export side: the leaves of a
            # structurally identical batch pytree
            leaves = jax.tree_util.tree_leaves(batch)
            _, p = self._exported.call(self._params, *leaves)
            probs.append(np.asarray(p)[:valid])
        return np.concatenate(probs, axis=0).reshape(n, -1)

    def predict(self, sequences, threshold: float = 0.5) -> np.ndarray:
        p = self.predict_proba(sequences)
        if p.shape[-1] == 1:
            return (p[:, 0] > threshold).astype(np.int32)
        return np.argmax(p, axis=-1).astype(np.int32)

    __call__ = predict_proba


def load_artifact(path: str) -> ExportedPredictor:
    """Reload an :func:`export_artifact` directory."""
    from jax import export as jexport

    with open(os.path.join(path, "meta.json")) as f:
        meta = json.load(f)
    if meta.get("artifact_version") != ARTIFACT_VERSION:
        raise ValueError(
            f"artifact version {meta.get('artifact_version')} != "
            f"{ARTIFACT_VERSION}")
    with open(os.path.join(path, "predict.jaxexport"), "rb") as f:
        exported = jexport.deserialize(f.read())
    flat = np.load(os.path.join(path, "params.npz"))
    params = _unflatten_params({k: flat[k] for k in flat.files})
    return ExportedPredictor(exported, params, meta)
