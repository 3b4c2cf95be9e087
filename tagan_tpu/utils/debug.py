"""Debugging, profiling, and diagnostics.

TPU-native replacement for the reference ``TAGANDebugger``
(`/root/reference/src/tagan/utils/debug_utils.py:24-544`) and the
diagnostic harness in `debug_tagan.py`:

* named wall-clock timers with device-memory deltas (:72-99, :182-205)
  — here backed by `jax.profiler` device memory stats;
* NaN/Inf tensor checks (:101-132) — `check_finite` over whole pytrees,
  plus `nan_debug()` enabling jax's global NaN debugging;
* sequence-format inspection (:207-249);
* forward-pass profiler (:251-289) — stage-by-stage timing of the
  tagan_tpu model with honest host synchronization;
* temporal-asymmetry analysis (debug_tagan.py:341-494): the
  `mean |A[i,j] - A[j,i]|` score over attention matrices and
  past/future mass from a focus step.

Unlike the reference (opt-in singleton with print side effects in hot
paths — SURVEY.md B10), everything here is explicit, returns data, and
never touches the compiled hot path unless asked.
"""

from __future__ import annotations

import contextlib
import logging
import time
from typing import Any, Dict, List, Optional

import jax
import jax.numpy as jnp
import numpy as np

logger = logging.getLogger("tagan_tpu.debug")


def device_memory_stats() -> Dict[str, int]:
    """Bytes in use / limit on the default device (best effort)."""
    try:
        stats = jax.devices()[0].memory_stats() or {}
        return {"bytes_in_use": stats.get("bytes_in_use", 0),
                "bytes_limit": stats.get("bytes_limit", 0),
                "peak_bytes_in_use": stats.get("peak_bytes_in_use", 0)}
    except Exception:
        return {"bytes_in_use": 0, "bytes_limit": 0,
                "peak_bytes_in_use": 0}


class TAGANDebugger:
    """Named timers + memory deltas + NaN checks (debug_utils.py:24-313).
    Explicit instance — no global singleton, but `get_debugger()` offers
    the reference's accessor pattern."""

    def __init__(self, enabled: bool = True):
        self.enabled = enabled
        self.timings: Dict[str, List[float]] = {}
        self.memory_deltas: Dict[str, List[int]] = {}

    @contextlib.contextmanager
    def timer(self, name: str, sync: Any = None):
        """Time a block; pass the block's output pytree via
        `sync=lambda: result` is not possible in a ctx manager, so call
        `jax.block_until_ready`/materialize inside the block for honest
        device timing."""
        if not self.enabled:
            yield
            return
        m0 = device_memory_stats()["bytes_in_use"]
        t0 = time.perf_counter()
        yield
        dt = time.perf_counter() - t0
        dm = device_memory_stats()["bytes_in_use"] - m0
        self.timings.setdefault(name, []).append(dt)
        self.memory_deltas.setdefault(name, []).append(dm)

    def report(self) -> Dict[str, Dict[str, float]]:
        out = {}
        for name, ts in self.timings.items():
            out[name] = {
                "calls": len(ts),
                "total_s": float(np.sum(ts)),
                "mean_s": float(np.mean(ts)),
                "mean_mem_delta": float(np.mean(
                    self.memory_deltas.get(name, [0]))),
            }
        return out

    # -- NaN / Inf checks (:101-132) --------------------------------------
    @staticmethod
    def check_tensor(x, name: str = "tensor") -> Dict[str, Any]:
        x = np.asarray(x)
        return {"name": name, "shape": tuple(x.shape),
                "dtype": str(x.dtype),
                "has_nan": bool(np.isnan(x).any()),
                "has_inf": bool(np.isinf(x).any()),
                "min": float(np.nanmin(x)) if x.size else 0.0,
                "max": float(np.nanmax(x)) if x.size else 0.0}

    @staticmethod
    def check_finite(pytree, prefix: str = "") -> List[str]:
        """Return paths of non-finite leaves (empty = clean)."""
        bad = []
        for path, leaf in jax.tree_util.tree_flatten_with_path(pytree)[0]:
            arr = np.asarray(leaf)
            if arr.dtype.kind == "f" and not np.isfinite(arr).all():
                bad.append(prefix + jax.tree_util.keystr(path))
        return bad

    # -- sequence inspection (:207-249) -----------------------------------
    @staticmethod
    def inspect_sequence(graph_sequence) -> Dict[str, Any]:
        from ..core.graph import _unpack_snapshot
        info = {"num_steps": len(graph_sequence), "steps": []}
        for t, snap in enumerate(graph_sequence):
            x, ei, ea, ids, tv = _unpack_snapshot(snap)
            info["steps"].append({
                "t": t, "num_nodes": x.shape[0],
                "feature_dim": x.shape[1], "num_edges": ei.shape[1],
                "edge_attr_dim": 0 if ea is None else ea.shape[1],
                "node_ids_sample": ids[:5], "timestep": tv})
        all_ids = {i for s in info["steps"] for i in s["node_ids_sample"]}
        info["unique_nodes_sampled"] = len(all_ids)
        return info


_debugger: Optional[TAGANDebugger] = None


def get_debugger(enabled: bool = True) -> TAGANDebugger:
    """Reference accessor pattern (debug_utils.py:292-313)."""
    global _debugger
    if _debugger is None:
        _debugger = TAGANDebugger(enabled)
    return _debugger


@contextlib.contextmanager
def nan_debug():
    """Enable jax NaN debugging for a block (replaces the reference's
    scattered NaN prints with the platform mechanism)."""
    old = jax.config.read("jax_debug_nans")
    jax.config.update("jax_debug_nans", True)
    try:
        yield
    finally:
        jax.config.update("jax_debug_nans", old)


@contextlib.contextmanager
def profiler_trace(log_dir: str):
    """jax.profiler trace for TensorBoard/xprof (replaces the
    reference's manual wall-clock profiling of hot loops)."""
    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


def profile_forward(model, params, seq, labels=None,
                    iters: int = 3) -> Dict[str, float]:
    """Stage-by-stage forward profiling (debug_utils.py:251-289):
    compile time, steady-state latency (host-materialized), and output
    finiteness."""
    import jax.numpy as jnp

    fwd = jax.jit(lambda p, s: model(p, s, labels))
    t0 = time.perf_counter()
    out = fwd(params, seq)
    _ = float(jnp.sum(out.logits))
    compile_s = time.perf_counter() - t0
    t0 = time.perf_counter()
    for _i in range(iters):
        out = fwd(params, seq)
        _ = float(jnp.sum(out.logits))
    steady = (time.perf_counter() - t0) / iters
    return {"compile_s": compile_s, "steady_state_s": steady,
            "logits_finite": bool(np.isfinite(
                np.asarray(out.logits)).all())}


# ---------------------------------------------------------------------------
# Temporal asymmetry analysis (debug_tagan.py:341-494)
# ---------------------------------------------------------------------------

def temporal_asymmetry_score(attention_weights) -> float:
    """mean |A[i, j] - A[j, i]| over the (head-averaged) attention
    matrix — the reference's asymmetry diagnostic."""
    w = np.asarray(attention_weights)
    while w.ndim > 2:
        w = w.mean(axis=0)
    return float(np.mean(np.abs(w - w.T)))


def past_future_attention(attention_weights,
                          focus_step: Optional[int] = None
                          ) -> Dict[str, float]:
    """Attention mass on past vs future keys from a focus timestep."""
    w = np.asarray(attention_weights)
    while w.ndim > 2:
        w = w.mean(axis=0)
    T = w.shape[0]
    t0 = focus_step if focus_step is not None else T // 2
    row = w[t0]
    return {"past": float(row[:t0].sum()),
            "present": float(row[t0]),
            "future": float(row[t0 + 1:].sum()),
            "focus_step": t0}
