"""Functional node-memory state for TAGAN-TPU.

The reference keeps per-node state in Python dicts keyed by node ID
(`/root/reference/src/tagan/utils/memory_bank.py:14-360`), mutated inside
Python loops. On TPU the same state machine becomes a fixed-size pytree
over the slot space, updated with pure masked vector ops inside
``lax.scan`` (SURVEY.md §3.5 restatement):

    states      f32[N, H]   decayed hidden state per slot
    valid       bool[N]     slot currently holds a live state
    last_seen   i32[N]      timestep of last activity (-1 = never)
    inactivity  i32[N]      steps since last activity
    frequency   i32[N]      total activations (survives pruning, like the
                            reference's `frequency` dict)

Update semantics are a line-for-line functional restatement of
``NodeMemoryBank.update`` (memory_bank.py:65-173):
  * every live slot's inactivity increments first (:88-90)
  * active nodes: frequency+=1; reappearing nodes (last_seen < t-1) blend
    ``w·prev + (1-w)·cur`` with ``w = max(0.4, decay^min(Δt,3))``
    (:120-132); continuing/new nodes take the current state (:133-135)
  * NaN states recover from the previous state when one exists, else a
    small constant (reference uses tiny random values, :108-118 — we use
    a deterministic 0.005 fill so jit needs no RNG plumbing)
  * inactive live slots decay by ``decay^inactivity`` (:148-153,
    compounding across steps exactly as the reference does)
  * slots with inactivity > max_inactivity are pruned: zeroed +
    invalidated, frequency retained (:155-166)

`TemporalMemoryState` is the functional analog of the reference's
(unwired) ``TemporalMemoryBank`` (memory_bank.py:363-682): a bounded
per-slot history ring with decayed backfill and fractional-time linear
interpolation.
"""

from __future__ import annotations

import dataclasses
from typing import Optional, Tuple

import jax
import jax.numpy as jnp


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class MemoryState:
    states: jax.Array      # f32[N, H]
    valid: jax.Array       # bool[N]
    last_seen: jax.Array   # i32[N]
    inactivity: jax.Array  # i32[N]
    frequency: jax.Array   # i32[N]

    @property
    def size(self) -> jax.Array:
        """Number of live slots (reference `size`, memory_bank.py:63)."""
        return jnp.sum(self.valid.astype(jnp.int32))


def init_memory(max_nodes: int, hidden_dim: int,
                dtype=jnp.float32) -> MemoryState:
    return MemoryState(
        states=jnp.zeros((max_nodes, hidden_dim), dtype),
        valid=jnp.zeros((max_nodes,), bool),
        last_seen=jnp.full((max_nodes,), -1, jnp.int32),
        inactivity=jnp.zeros((max_nodes,), jnp.int32),
        frequency=jnp.zeros((max_nodes,), jnp.int32),
    )


def memory_update(
    mem: MemoryState,
    active: jax.Array,          # bool[N] — nodes present at this step
    new_states: jax.Array,      # f32[N, H] — their fresh states (slot space)
    timestep: jax.Array,        # i32 scalar (traced ok)
    decay_factor: float = 0.8,
    max_inactivity: int = 5,
    reappear_min_weight: float = 0.4,
    reappear_max_gap: int = 3,
) -> MemoryState:
    """One memory-bank update step (see module docstring for the mapping
    onto memory_bank.py:65-173). Pure; shapes static; scan/jit friendly."""
    t = jnp.asarray(timestep, jnp.int32)

    # 1. inactivity += 1 for all live slots (:88-90)
    inactivity = jnp.where(mem.valid, mem.inactivity + 1, mem.inactivity)

    # 2. NaN recovery for incoming states (:108-118)
    has_nan = jnp.any(jnp.isnan(new_states), axis=-1, keepdims=True)
    recovered = jnp.where(mem.valid[:, None], mem.states,
                          jnp.full_like(new_states, 0.005))
    cur = jnp.where(has_nan, recovered, new_states)

    # 3. reappearance blending (:120-132)
    reappearing = mem.valid & (mem.last_seen < t - 1) & active
    gap = jnp.clip(t - mem.last_seen, 0, reappear_max_gap).astype(cur.dtype)
    w = jnp.maximum(reappear_min_weight, decay_factor ** gap)[:, None]
    blended = w * mem.states + (1.0 - w) * cur
    written = jnp.where(reappearing[:, None], blended, cur)

    states = jnp.where(active[:, None], written, mem.states)
    frequency = jnp.where(active, mem.frequency + 1, mem.frequency)
    inactivity = jnp.where(active, 0, inactivity)
    last_seen = jnp.where(active, t, mem.last_seen)
    valid = mem.valid | active

    # 4. decay inactive live slots by decay^inactivity (:148-153)
    inactive_live = valid & ~active
    d = decay_factor ** inactivity.astype(states.dtype)
    states = jnp.where(inactive_live[:, None], states * d[:, None], states)

    # 5. prune (:155-166): zero + invalidate, keep frequency
    pruned = inactivity > max_inactivity
    states = jnp.where(pruned[:, None], 0.0, states)
    valid = valid & ~pruned
    last_seen = jnp.where(pruned, -1, last_seen)
    inactivity = jnp.where(pruned, 0, inactivity)

    return MemoryState(states=states, valid=valid, last_seen=last_seen,
                       inactivity=inactivity, frequency=frequency)


def memory_read(mem: MemoryState, slots_mask: Optional[jax.Array] = None
                ) -> Tuple[jax.Array, jax.Array]:
    """Batch read (reference ``get_states``, memory_bank.py:187-211):
    returns (states, has_state). Missing slots read as zeros. Unlike the
    reference this does NOT insert zero states as a side effect — the
    caller decides what to write back."""
    has = mem.valid if slots_mask is None else (mem.valid & slots_mask)
    return jnp.where(has[:, None], mem.states, 0.0), has


def memory_decay_all(mem: MemoryState, decay_factor: float = 0.8
                     ) -> MemoryState:
    """Reference ``decay_all`` (memory_bank.py:222-225)."""
    return dataclasses.replace(
        mem, states=jnp.where(mem.valid[:, None], mem.states * decay_factor,
                              mem.states))


def memory_reset(mem: MemoryState) -> MemoryState:
    """Reference ``reset`` (memory_bank.py:227-233)."""
    return init_memory(mem.states.shape[0], mem.states.shape[1],
                       mem.states.dtype)


def memory_stats(mem: MemoryState) -> dict:
    """Reference ``get_memory_stats`` (memory_bank.py:334-353)."""
    n = mem.size
    denom = jnp.maximum(n, 1).astype(jnp.float32)
    norms = jnp.linalg.norm(mem.states, axis=-1) * mem.valid
    return {
        "num_nodes": n,
        "mean_state_norm": jnp.sum(norms) / denom,
        "max_inactivity": jnp.max(jnp.where(mem.valid, mem.inactivity, 0)),
        "mean_frequency": jnp.sum(jnp.where(mem.valid, mem.frequency, 0))
                          / denom,
    }


# ---------------------------------------------------------------------------
# Temporal (history) memory — functional TemporalMemoryBank
# ---------------------------------------------------------------------------

@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class TemporalMemoryState:
    """Bounded history of per-slot states (memory_bank.py:363-682).

    history    f32[N, K, H]  ring buffer of states (K = max_history)
    times      f32[N, K]     timestamp of each entry (NaN-free; -inf = empty)
    count      i32[N]        number of valid entries per slot
    head       i32[N]        ring write position per slot
    """
    history: jax.Array
    times: jax.Array
    count: jax.Array
    head: jax.Array

    @property
    def max_history(self) -> int:
        return self.history.shape[1]


def init_temporal_memory(max_nodes: int, max_history: int, hidden_dim: int,
                         dtype=jnp.float32) -> TemporalMemoryState:
    return TemporalMemoryState(
        history=jnp.zeros((max_nodes, max_history, hidden_dim), dtype),
        times=jnp.full((max_nodes, max_history), -jnp.inf, dtype),
        count=jnp.zeros((max_nodes,), jnp.int32),
        head=jnp.zeros((max_nodes,), jnp.int32),
    )


def temporal_memory_append(tm: TemporalMemoryState, active: jax.Array,
                           states: jax.Array, time: jax.Array
                           ) -> TemporalMemoryState:
    """Append states at `time` for active slots; ring truncation mirrors
    the reference's max_history list truncation (memory_bank.py:458-460)."""
    K = tm.max_history
    n = tm.history.shape[0]
    rows = jnp.arange(n)
    pos = tm.head
    new_hist = tm.history.at[rows, pos].set(
        jnp.where(active[:, None], states, tm.history[rows, pos]))
    new_times = tm.times.at[rows, pos].set(
        jnp.where(active, jnp.asarray(time, tm.times.dtype),
                  tm.times[rows, pos]))
    head = jnp.where(active, (pos + 1) % K, pos)
    count = jnp.where(active, jnp.minimum(tm.count + 1, K), tm.count)
    return TemporalMemoryState(history=new_hist, times=new_times,
                               count=count, head=head)


def temporal_memory_interpolate(tm: TemporalMemoryState, query_time: jax.Array,
                                decay_factor: float = 0.9
                                ) -> Tuple[jax.Array, jax.Array]:
    """Fractional-time read with linear interpolation between the two
    nearest stored entries (memory_bank.py:557-587); queries beyond the
    last entry backfill with a decayed last state (:444-453).

    Returns (states f32[N, H], has bool[N]).
    """
    qt = jnp.asarray(query_time, tm.times.dtype)
    has = tm.count > 0
    t = tm.times                                    # [N, K]
    # nearest entry at or before qt, and at or after qt
    before_mask = t <= qt
    after_mask = t >= qt
    neg_inf = jnp.asarray(-jnp.inf, t.dtype)
    t_before = jnp.max(jnp.where(before_mask, t, neg_inf), axis=1)
    t_after = jnp.min(jnp.where(after_mask, t, jnp.inf), axis=1)
    idx_before = jnp.argmax(jnp.where(before_mask, t, neg_inf), axis=1)
    idx_after = jnp.argmin(jnp.where(after_mask, t, jnp.inf), axis=1)
    rows = jnp.arange(t.shape[0])
    s_before = tm.history[rows, idx_before]
    s_after = tm.history[rows, idx_after]

    have_before = jnp.isfinite(t_before)
    have_after = jnp.isfinite(t_after)
    span = jnp.where(have_before & have_after,
                     jnp.maximum(t_after - t_before, 1e-8), 1.0)
    frac = jnp.clip((qt - t_before) / span, 0.0, 1.0)
    interp = s_before + frac[:, None] * (s_after - s_before)

    # beyond last entry: decayed backfill, decay^(qt - t_last)
    gap = jnp.maximum(qt - t_before, 0.0)
    decayed = s_before * (decay_factor ** gap)[:, None]

    out = jnp.where((have_before & have_after)[:, None], interp,
                    jnp.where(have_before[:, None], decayed,
                              jnp.where(have_after[:, None], s_after, 0.0)))
    return jnp.where(has[:, None], out, 0.0), has
