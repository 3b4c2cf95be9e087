"""Temporal propagation: GRU evolution, window skips, gating, memory.

TPU-native re-design of `/root/reference/src/tagan/layers/temporal_propagation.py`.
The reference walks Python lists and loops over nodes per step
(:1365-1485); here every stage is a static-shape op over the slot space
``[T, N, H]``:

* ``TemporalGRUCell`` (:402-558) — one gated step; scanned over T.
* ``TemporalEvolutionLayer`` (:561-765) — ``lax.scan`` of the cell
  (forward; optional backward pass + concat for bidirectional).
* ``TemporalSkipConnection`` (:768-957) — +-window aggregation expressed
  as one [T, T] banded operator (mean/sum) or a masked max.
* ``TemporalGatingUnit`` (:960-1075) — GRU-style feature gate. The
  reference's propagation loop passes ``memory_bias=`` which its
  signature does not accept (bug B3, SURVEY.md §2.10); here the
  parameter is implemented as intended: an additive logit bias
  ``log(b/(1-b))`` on the update gate, steering the output toward the
  memory-informed candidate.
* ``TemporalPropagation`` (:1078-1522) — the orchestrator. The
  reference's per-node Python memory loop (:1365-1485) becomes a second
  ``lax.scan`` over time carrying the functional `MemoryState`
  (`core.memory`): reappearing nodes are gated with the adaptive bias
  ``max(0.5, 0.9 - 0.1*min(gap, 4))`` (:1421), continuing nodes with
  bias 0.6 (:1454), and the memory write is a stop-gradient state plus
  the reference's ``0.01*t`` timestep marker (:1461-1478). Note: the
  reference calls the bank's ``update_state`` once per node which
  compounds the bank's own inactivity/decay bookkeeping N times per
  step; the functional restatement applies one batched
  ``memory_update`` per timestep (the intended state machine,
  SURVEY.md §3.5).
* ``TemporalGRU`` (:15-399) and ``AsymmetricTemporalCell`` (:1525-1738)
  — the reference's unwired cells, kept as first-class capabilities.
"""

from __future__ import annotations

import dataclasses
from typing import NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp

from ..core import module as M
from ..core.memory import MemoryState, init_memory, memory_read, memory_update


# ---------------------------------------------------------------------------
# GRU cell
# ---------------------------------------------------------------------------

@dataclasses.dataclass(frozen=True)
class TemporalGRUCell:
    input_dim: int
    hidden_dim: int
    dropout: float = 0.1
    use_layer_norm: bool = True

    def init(self, key: jax.Array) -> M.Params:
        ks = M.split_keys(key, ["r", "z", "c"])
        d = self.input_dim + self.hidden_dim
        p: M.Params = {
            # gate biases init to 1.0 (temporal_propagation.py:472-473)
            "reset": M.init_linear(ks["r"], d, self.hidden_dim, bias_init=1.0),
            "update": M.init_linear(ks["z"], d, self.hidden_dim,
                                    bias_init=1.0),
            "candidate": M.init_linear(ks["c"], d, self.hidden_dim),
        }
        if self.use_layer_norm:
            p["ln_x"] = M.init_layer_norm(self.input_dim)
            p["ln_h"] = M.init_layer_norm(self.hidden_dim)
            p["ln_out"] = M.init_layer_norm(self.hidden_dim)
        return p

    def __call__(
        self,
        p: M.Params,
        x: jax.Array,                         # [B, input_dim]
        h: Optional[jax.Array] = None,        # [B, hidden_dim]
        time_diff: Optional[jax.Array] = None,  # [B]
        *,
        h_is_initial: bool = False,
        deterministic: bool = True,
        rng: Optional[jax.Array] = None,
    ) -> jax.Array:
        """One GRU step (:475-551). ``h_is_initial`` marks the zero
        initial state, which the reference does NOT layer-normalize
        (:502-506)."""
        if self.use_layer_norm:
            x = M.layer_norm(p["ln_x"], x)
        if h is None:
            h = jnp.zeros((*x.shape[:-1], self.hidden_dim), x.dtype)
            h_is_initial = True
        elif self.use_layer_norm and not h_is_initial:
            h = M.layer_norm(p["ln_h"], h)
        if time_diff is not None:
            # larger gap -> prior state shrunk by exp(-clamp(dt,0,10)) (:508-514)
            scale = jnp.exp(-jnp.clip(time_diff, 0.0, 10.0))[..., None]
            h = h * scale
        xh = jnp.concatenate([x, h], axis=-1)
        r = jax.nn.sigmoid(M.linear(p["reset"], xh))
        z = jax.nn.sigmoid(M.linear(p["update"], xh))
        xrh = jnp.concatenate([x, r * h], axis=-1)
        h_tilde = jnp.tanh(M.linear(p["candidate"], xrh))
        h_new = (1.0 - z) * h + z * h_tilde
        if not deterministic and rng is not None:
            h_new = M.dropout(h_new, self.dropout, deterministic=False,
                              rng=rng)
        if self.use_layer_norm:
            h_new = M.layer_norm(p["ln_out"], h_new)
        return h_new


# ---------------------------------------------------------------------------
# Evolution layer: scan the cell over the time axis
# ---------------------------------------------------------------------------

@dataclasses.dataclass(frozen=True)
class TemporalEvolutionLayer:
    input_dim: int
    hidden_dim: int
    dropout: float = 0.1
    time_aware: bool = True
    bidirectional: bool = False
    use_layer_norm: bool = True
    residual: bool = True

    @property
    def cell_dim(self) -> int:
        return self.hidden_dim // 2 if self.bidirectional else self.hidden_dim

    def init(self, key: jax.Array) -> M.Params:
        ks = M.split_keys(key, ["fwd", "bwd", "proj"])
        cell = TemporalGRUCell(self.input_dim, self.cell_dim, self.dropout,
                               self.use_layer_norm)
        p: M.Params = {"forward_cell": cell.init(ks["fwd"])}
        if self.bidirectional:
            p["backward_cell"] = cell.init(ks["bwd"])
            p["proj"] = M.init_linear(ks["proj"], self.hidden_dim,
                                      self.hidden_dim)
        else:
            p["proj"] = M.init_linear(ks["proj"], self.cell_dim,
                                      self.hidden_dim)
        if self.use_layer_norm:
            p["ln"] = M.init_layer_norm(self.hidden_dim)
        return p

    def _scan_cell(self, cp: M.Params, xs: jax.Array, tds: jax.Array,
                   *, deterministic: bool, rng,
                   valid: Optional[jax.Array] = None) -> jax.Array:
        """Scan TemporalGRUCell over leading time axis of xs [T, B, F].
        tds [T, B] are per-step time diffs (0 at the first step, where the
        reference passes None — decay by exp(0)=1 on a zero state is a
        no-op, so semantics agree). `valid` bool[T] (padded snapshots)
        or bool[T, B] (per-node activity): invalid steps carry the
        hidden state through unchanged and emit zeros. Per-node gating
        matches the reference, which only ran its GRU over each step's
        ACTIVE nodes — and it is also what keeps gradients sane: running
        the cell on inactive slots feeds exactly-zero rows into the
        cell's LayerNorms, whose backward at zero variance amplifies by
        rsqrt(eps) PER STEP (~316x, measured 1e21 after 6 steps on
        churn-heavy data — enough to eat the whole clipped global
        norm)."""
        cell = TemporalGRUCell(self.input_dim, self.cell_dim, self.dropout,
                               self.use_layer_norm)
        T, B = xs.shape[0], xs.shape[1]
        rngs = (jax.random.split(rng, T) if (rng is not None and
                                             not deterministic) else None)
        # `started` tracks, per node, whether any valid step has run
        # yet, so the first valid step takes the reference's h=None path
        # (no LN on the zero initial state, :502-506)
        if valid is None:
            valid = jnp.ones((T, B), bool)
        elif valid.ndim == 1:
            valid = jnp.broadcast_to(valid[:, None], (T, B))

        def step(carry, inp):
            h, started = carry
            if rngs is None:
                x_t, td_t, v_t = inp
                r = None
            else:
                x_t, td_t, v_t, r = inp
            # the reference's first step passes h=None (zeros, NOT
            # layer-normalized, :502-506); emulate with one cell call by
            # pre-normalizing the carry only once a valid step has run
            if self.use_layer_norm:
                h_in = jnp.where(started[:, None],
                                 M.layer_norm(cp["ln_h"], h), 0.0)
            else:
                h_in = jnp.where(started[:, None], h, 0.0)
            h_new = cell(cp, x_t, h_in, td_t, h_is_initial=True,
                         deterministic=deterministic, rng=r)
            h_out = jnp.where(v_t[:, None], h_new, h)
            emitted = jnp.where(v_t[:, None], h_new, 0.0)
            return (h_out, started | v_t), emitted

        h_init = jnp.zeros((B, self.cell_dim), xs.dtype)
        inps = (xs, tds, valid) if rngs is None else (xs, tds, valid, rngs)
        (_, _), out = jax.lax.scan(
            step, (h_init, jnp.zeros((B,), bool)), inps)
        return out

    def __call__(
        self,
        p: M.Params,
        x_seq: jax.Array,                       # [T, B, input_dim]
        time_stamps: Optional[jax.Array] = None,  # [T]
        time_mask: Optional[jax.Array] = None,    # bool[T]
        node_mask: Optional[jax.Array] = None,    # bool[T, B]
        *,
        deterministic: bool = True,
        rng: Optional[jax.Array] = None,
    ) -> jax.Array:
        T, B, _ = x_seq.shape
        if time_stamps is not None and self.time_aware:
            td = jnp.concatenate(
                [jnp.zeros((1,), x_seq.dtype),
                 time_stamps[1:] - time_stamps[:-1]])
        else:
            td = jnp.zeros((T,), x_seq.dtype)
        tds = jnp.broadcast_to(td[:, None], (T, B))

        # per-node activity gating (reference: GRU runs on each step's
        # active nodes only) folded with the padded-snapshot mask
        valid = node_mask
        if time_mask is not None:
            valid = time_mask[:, None] if valid is None \
                else jnp.logical_and(valid, time_mask[:, None])

        r1 = r2 = r3 = None
        if not deterministic and rng is not None:
            rng, r1, r2, r3 = jax.random.split(rng, 4)

        fwd = self._scan_cell(p["forward_cell"], x_seq, tds,
                              deterministic=deterministic, rng=r1,
                              valid=valid)
        if self.bidirectional:
            # backward diffs: td_bwd[t] = times[t+1] - times[t] (:695-708)
            if time_stamps is not None and self.time_aware:
                tdb = jnp.concatenate(
                    [time_stamps[1:] - time_stamps[:-1],
                     jnp.zeros((1,), x_seq.dtype)])
            else:
                tdb = jnp.zeros((T,), x_seq.dtype)
            tdsb = jnp.broadcast_to(tdb[:, None], (T, B))
            # padded steps sit at the sequence tail, i.e. at the HEAD of
            # the reversed scan: valid-gating carries h through them
            # untouched so the first real step starts from a clean state
            bwd = self._scan_cell(
                p["backward_cell"], x_seq[::-1], tdsb[::-1],
                deterministic=deterministic, rng=r2,
                valid=None if valid is None else valid[::-1])[::-1]
            h = jnp.concatenate([fwd, bwd], axis=-1)
        else:
            h = fwd

        out = M.linear(p["proj"], h)
        if not deterministic and rng is not None:
            out = M.dropout(out, self.dropout, deterministic=False, rng=r3)
        if self.residual and self.input_dim == self.hidden_dim:
            out = out + x_seq
        if self.use_layer_norm:
            out = M.layer_norm(p["ln"], out)
        if valid is not None:
            # inactive slots contribute exactly zero (not the proj/LN
            # bias row) — keeps them inert in the banded skip window AND
            # keeps gradients off the var=0 LayerNorm backward
            out = jnp.where(valid[..., None], out, 0.0)
        return out


# ---------------------------------------------------------------------------
# Skip connection over a temporal window
# ---------------------------------------------------------------------------

@dataclasses.dataclass(frozen=True)
class TemporalSkipConnection:
    input_dim: int
    hidden_dim: Optional[int] = None
    window_size: int = 3
    aggregation: str = "mean"
    dropout: float = 0.1
    use_layer_norm: bool = True
    apply_activation: bool = True
    residual: bool = True

    @property
    def h_dim(self) -> int:
        return self.hidden_dim if self.hidden_dim is not None \
            else self.input_dim

    def init(self, key: jax.Array) -> M.Params:
        k1, k2 = jax.random.split(key)
        p: M.Params = {
            "in_proj": M.init_linear(k1, self.input_dim, self.h_dim),
            "out_proj": M.init_linear(k2, self.h_dim, self.input_dim),
        }
        if self.use_layer_norm:
            p["ln1"] = M.init_layer_norm(self.h_dim)
            p["ln2"] = M.init_layer_norm(self.input_dim)
        return p

    def _window_operator(self, T: int, dtype,
                         time_mask: Optional[jax.Array] = None) -> jax.Array:
        """Banded [T, T] operator: row t has weight over steps in
        [t-w, t+w] clipped to range (and restricted to valid steps);
        1/count for mean, 1 for sum."""
        idx = jnp.arange(T)
        band = jnp.abs(idx[:, None] - idx[None, :]) <= self.window_size
        if time_mask is not None:
            band = jnp.logical_and(band, time_mask[None, :])
        band = band.astype(dtype)
        if self.aggregation == "mean":
            band = band / jnp.maximum(
                jnp.sum(band, axis=1, keepdims=True), 1.0)
        return band

    def __call__(
        self,
        p: M.Params,
        x_seq: jax.Array,          # [T, B, input_dim]
        time_mask: Optional[jax.Array] = None,    # bool[T]
        *,
        deterministic: bool = True,
        rng: Optional[jax.Array] = None,
    ) -> jax.Array:
        T = x_seq.shape[0]
        r1 = r2 = None
        if not deterministic and rng is not None:
            r1, r2 = jax.random.split(rng)
        # project: GELU (exact, torch nn.GELU) -> LN -> dropout (:865-877)
        proj = M.linear(p["in_proj"], x_seq)
        if self.apply_activation:
            proj = M.gelu_exact(proj)
        if self.use_layer_norm:
            proj = M.layer_norm(p["ln1"], proj)
        if not deterministic and r1 is not None:
            proj = M.dropout(proj, self.dropout, deterministic=False, rng=r1)

        if self.aggregation == "max":
            idx = jnp.arange(T)
            band = jnp.abs(idx[:, None] - idx[None, :]) <= self.window_size
            if time_mask is not None:
                band = jnp.logical_and(band, time_mask[None, :])
            big_neg = jnp.asarray(-1e30, proj.dtype)
            expanded = jnp.where(band[:, :, None, None], proj[None, :, :, :],
                                 big_neg)
            agg = jnp.max(expanded, axis=1)
        else:  # mean or sum via banded matmul
            op = self._window_operator(T, proj.dtype, time_mask)
            agg = jnp.einsum("ts,sbh->tbh", op, proj)

        out = M.linear(p["out_proj"], M.gelu_exact(agg))   # :928-931
        if not deterministic and r2 is not None:
            out = M.dropout(out, self.dropout, deterministic=False, rng=r2)
        if self.residual:
            out = out + x_seq
        if self.use_layer_norm:
            out = M.layer_norm(p["ln2"], out)
        return out


# ---------------------------------------------------------------------------
# Gating unit (with a real memory_bias — fixes reference bug B3)
# ---------------------------------------------------------------------------

@dataclasses.dataclass(frozen=True)
class TemporalGatingUnit:
    input_dim: int
    hidden_dim: Optional[int] = None
    dropout: float = 0.1
    use_layer_norm: bool = True
    residual: bool = True

    def init(self, key: jax.Array) -> M.Params:
        ks = M.split_keys(key, ["u", "r", "o"])
        d = self.input_dim
        p: M.Params = {
            "update_gate": M.init_linear(ks["u"], 2 * d, d),
            "reset_gate": M.init_linear(ks["r"], 2 * d, d),
            "output_gate": M.init_linear(ks["o"], 2 * d, d),
        }
        if self.use_layer_norm:
            p["ln_in1"] = M.init_layer_norm(d)
            p["ln_in2"] = M.init_layer_norm(d)
            p["ln_out"] = M.init_layer_norm(d)
        return p

    def __call__(
        self,
        p: M.Params,
        current_feat: jax.Array,        # [B, input_dim]
        previous_feat: jax.Array,       # [B, input_dim]
        memory_bias: Optional[jax.Array] = None,  # scalar or [B] in (0, 1)
        *,
        deterministic: bool = True,
        rng: Optional[jax.Array] = None,
    ) -> jax.Array:
        """GRU-style merge of current features with memory (:1022-1067).

        ``memory_bias`` realizes the reference's *intended* parameter
        (passed at :1428/:1454 but absent from the signature — bug B3):
        the update-gate logits receive an additive ``logit(memory_bias)``
        so a bias of 0.5 is neutral and larger values steer the output
        toward the candidate, which carries the memory signal through
        ``reset * previous``."""
        if self.use_layer_norm:
            current_feat = M.layer_norm(p["ln_in1"], current_feat)
            previous_feat = M.layer_norm(p["ln_in2"], previous_feat)
        combined = jnp.concatenate([current_feat, previous_feat], axis=-1)
        update_logits = M.linear(p["update_gate"], combined)
        if memory_bias is not None:
            b = jnp.clip(jnp.asarray(memory_bias), 1e-4, 1.0 - 1e-4)
            logit = jnp.log(b) - jnp.log1p(-b)
            update_logits = update_logits + jnp.reshape(
                logit, logit.shape + (1,) * (update_logits.ndim - logit.ndim))
        update = jax.nn.sigmoid(update_logits)
        reset = jax.nn.sigmoid(M.linear(p["reset_gate"], combined))
        combined_reset = jnp.concatenate(
            [current_feat, reset * previous_feat], axis=-1)
        candidate = jnp.tanh(M.linear(p["output_gate"], combined_reset))
        output = (1.0 - update) * current_feat + update * candidate
        if not deterministic and rng is not None:
            output = M.dropout(output, self.dropout, deterministic=False,
                               rng=rng)
        if self.residual:
            output = output + current_feat
        if self.use_layer_norm:
            output = M.layer_norm(p["ln_out"], output)
        return output


# ---------------------------------------------------------------------------
# Orchestrator
# ---------------------------------------------------------------------------

class PropagationOutput(NamedTuple):
    features: jax.Array        # [T, N, hidden]
    memory: MemoryState


@dataclasses.dataclass(frozen=True)
class TemporalPropagation:
    input_dim: int
    hidden_dim: int
    dropout: float = 0.1
    time_aware: bool = True
    bidirectional: bool = False
    use_layer_norm: bool = True
    use_skip_connection: bool = True
    use_gating: bool = True
    window_size: int = 3
    aggregation: str = "mean"
    residual: bool = True
    memory_decay_factor: float = 0.8
    max_inactivity: int = 5
    add_timestep_marker: bool = True   # the +0.01*t write marker (:1467-1469)

    @property
    def evolution(self) -> TemporalEvolutionLayer:
        return TemporalEvolutionLayer(
            self.input_dim, self.hidden_dim, self.dropout, self.time_aware,
            self.bidirectional, self.use_layer_norm, self.residual)

    @property
    def skip(self) -> TemporalSkipConnection:
        return TemporalSkipConnection(
            input_dim=self.hidden_dim, window_size=self.window_size,
            aggregation=self.aggregation, dropout=self.dropout,
            use_layer_norm=self.use_layer_norm, residual=self.residual)

    @property
    def gating(self) -> TemporalGatingUnit:
        return TemporalGatingUnit(
            input_dim=self.hidden_dim, dropout=self.dropout,
            use_layer_norm=self.use_layer_norm, residual=self.residual)

    def init(self, key: jax.Array) -> M.Params:
        ks = M.split_keys(key, ["evo", "skip", "gate", "out"])
        p: M.Params = {"evolution": self.evolution.init(ks["evo"]),
                       "out_proj": M.init_linear(ks["out"], self.hidden_dim,
                                                 self.hidden_dim)}
        if self.use_skip_connection:
            p["skip"] = self.skip.init(ks["skip"])
        if self.use_gating:
            p["gating"] = self.gating.init(ks["gate"])
        if self.use_layer_norm:
            p["ln"] = M.init_layer_norm(self.hidden_dim)
        return p

    def __call__(
        self,
        p: M.Params,
        x_seq: jax.Array,                        # [T, N, input_dim]
        node_mask: Optional[jax.Array] = None,   # bool[T, N]
        time_stamps: Optional[jax.Array] = None,  # [T]
        memory: Optional[MemoryState] = None,
        time_mask: Optional[jax.Array] = None,    # bool[T]
        *,
        deterministic: bool = True,
        rng: Optional[jax.Array] = None,
    ) -> PropagationOutput:
        T, N, _ = x_seq.shape
        if node_mask is None:
            node_mask = jnp.ones((T, N), bool)
        if time_mask is not None:
            # padded snapshots must be fully inert: no active nodes, no
            # memory bookkeeping, no skip-window contribution
            node_mask = jnp.logical_and(node_mask, time_mask[:, None])
        if memory is None:
            memory = init_memory(N, self.hidden_dim, x_seq.dtype)

        r_evo = r_skip = r_gate = r_out = None
        if not deterministic and rng is not None:
            rng, r_evo, r_skip, r_gate, r_out = jax.random.split(rng, 5)

        evolved = self.evolution(p["evolution"], x_seq, time_stamps,
                                 time_mask, node_mask,
                                 deterministic=deterministic, rng=r_evo)
        if self.use_skip_connection:
            evolved = self.skip(p["skip"], evolved, time_mask,
                                deterministic=deterministic, rng=r_skip)

        # ---- memory pass: scan over time (:1357-1485, vectorized) ------
        gating = self.gating if self.use_gating else None
        gate_params = p.get("gating")
        gate_rngs = (jax.random.split(r_gate, T)
                     if r_gate is not None else None)

        def step(carry, inp):
            mem, last_seen, seen = carry
            if gate_rngs is None:
                feats, active, t, valid_t = inp
                gr = None
            else:
                feats, active, t, valid_t, gr = inp
            prev, has_prev = memory_read(mem)

            # local bookkeeping mirrors node_last_seen (:1359, :1411)
            gap = t - jnp.where(seen, last_seen, 0)
            reappearing = active & has_prev & ~(seen & (last_seen == t - 1))
            continuing = active & has_prev & seen & (last_seen == t - 1)

            gapf = gap.astype(feats.dtype)
            bias_reappear = jnp.maximum(
                0.5, 0.9 - 0.1 * jnp.minimum(gapf, 4.0))       # :1421
            if gating is not None:
                # one gating pass with a per-node bias vector (the two
                # reference branches differ only in the bias value:
                # adaptive for reappearing nodes, 0.6 for continuing)
                bias = jnp.where(reappearing, bias_reappear, 0.6)  # :1454
                gated = gating(gate_params, feats, prev,
                               memory_bias=bias,
                               deterministic=deterministic, rng=gr)
                merged = jnp.where((reappearing | continuing)[:, None],
                                   gated, feats)
            else:
                w_mem = jnp.maximum(
                    0.4, 0.9 - 0.1 * jnp.minimum(gapf, 5.0))   # :1442
                blend = w_mem[:, None] * prev \
                    + (1.0 - w_mem[:, None]) * feats
                merged = jnp.where(reappearing[:, None], blend, feats)

            # memory write: detached state + 0.01*t marker (:1461-1478)
            write = jax.lax.stop_gradient(merged)
            if self.add_timestep_marker:
                write = write + 0.01 * jnp.asarray(t, write.dtype) \
                    * (t > 0).astype(write.dtype)
            mem_new = memory_update(mem, active, write, t,
                                    decay_factor=self.memory_decay_factor,
                                    max_inactivity=self.max_inactivity)
            # padded (invalid) timesteps are full no-ops on the bank —
            # otherwise every pad step would tick inactivity/decay/prune
            mem = jax.tree_util.tree_map(
                lambda new, old: jnp.where(valid_t, new, old),
                mem_new, mem)
            last_seen = jnp.where(active, t, last_seen)
            seen = seen | active
            return (mem, last_seen, seen), merged

        ts = jnp.arange(T, dtype=jnp.int32)
        tvalid = jnp.ones((T,), bool) if time_mask is None else time_mask
        init_carry = (memory,
                      jnp.zeros((N,), jnp.int32),
                      jnp.zeros((N,), bool))
        inps = (evolved, node_mask, ts, tvalid) if gate_rngs is None else \
            (evolved, node_mask, ts, tvalid, gate_rngs)
        (memory, _, _), merged = jax.lax.scan(step, init_carry, inps)

        out = M.linear(p["out_proj"], merged)
        if not deterministic and r_out is not None:
            out = M.dropout(out, self.dropout, deterministic=False, rng=r_out)
        if self.use_layer_norm:
            out = M.layer_norm(p["ln"], out)
        return PropagationOutput(features=out, memory=memory)


# ---------------------------------------------------------------------------
# Full-sequence asymmetric GRU (reference TemporalGRU, :15-399; unwired
# there, first-class here)
# ---------------------------------------------------------------------------

@dataclasses.dataclass(frozen=True)
class TemporalGRU:
    hidden_dim: int
    input_dim: Optional[int] = None
    dropout: float = 0.1
    time_aware: bool = True
    bidirectional: bool = False
    use_layer_norm: bool = True
    asymmetric_weights: bool = True

    @property
    def in_dim(self) -> int:
        return self.input_dim if self.input_dim is not None \
            else self.hidden_dim

    @property
    def direction_factor(self) -> int:
        return 2 if self.bidirectional else 1

    def init(self, key: jax.Array) -> M.Params:
        names = ["W_z", "U_z", "W_r", "U_r", "W_h", "U_h",
                 "W_zb", "U_zb", "W_rb", "U_rb", "W_hb", "U_hb",
                 "W_t", "W_zt", "W_rt", "W_ht", "W_ztb", "W_rtb", "W_htb",
                 "out_proj"]
        ks = M.split_keys(key, names)
        h, d = self.hidden_dim, self.in_dim
        p: M.Params = {
            "W_z": M.init_linear(ks["W_z"], d, h),
            "U_z": M.init_linear(ks["U_z"], h, h, bias=False),
            "W_r": M.init_linear(ks["W_r"], d, h),
            "U_r": M.init_linear(ks["U_r"], h, h, bias=False),
            "W_h": M.init_linear(ks["W_h"], d, h),
            "U_h": M.init_linear(ks["U_h"], h, h, bias=False),
        }
        if self.bidirectional:
            p.update({
                "W_z_backward": M.init_linear(ks["W_zb"], d, h),
                "U_z_backward": M.init_linear(ks["U_zb"], h, h, bias=False),
                "W_r_backward": M.init_linear(ks["W_rb"], d, h),
                "U_r_backward": M.init_linear(ks["U_rb"], h, h, bias=False),
                "W_h_backward": M.init_linear(ks["W_hb"], d, h),
                "U_h_backward": M.init_linear(ks["U_hb"], h, h, bias=False),
                "output_proj": M.init_linear(ks["out_proj"], 2 * h, h),
            })
        if self.time_aware:
            p.update({
                "W_t": M.init_linear(ks["W_t"], d, h),
                "W_zt": M.init_linear(ks["W_zt"], 1, h, bias=False),
                "W_rt": M.init_linear(ks["W_rt"], 1, h, bias=False),
                "W_ht": M.init_linear(ks["W_ht"], 1, h, bias=False),
            })
            if self.bidirectional:
                p.update({
                    "W_zt_backward": M.init_linear(ks["W_ztb"], 1, h,
                                                   bias=False),
                    "W_rt_backward": M.init_linear(ks["W_rtb"], 1, h,
                                                   bias=False),
                    "W_ht_backward": M.init_linear(ks["W_htb"], 1, h,
                                                   bias=False),
                })
        if self.asymmetric_weights:
            p["past_weight"] = jnp.ones((1,))
            p["future_weight"] = jnp.full((1,), 0.8)
            p["time_decay"] = jnp.full((1,), 0.9)
        if self.use_layer_norm:
            p["ln_in"] = M.init_layer_norm(h)
            p["ln_h"] = M.init_layer_norm(h)
            # NOTE: the reference sizes this LN as hidden*direction_factor
            # (:120) but applies it AFTER the bidirectional output_proj
            # back to hidden (:377, :387) — a crash (bidirectional
            # TemporalGRU is unusable there). Sized correctly here.
            p["ln_out"] = M.init_layer_norm(h)
        return p

    @staticmethod
    def _time_deltas(time_stamps: jax.Array, reverse: bool) -> jax.Array:
        """[B, S] -> normalized positive deltas [B, S, 1] (:147-186)."""
        ts = time_stamps[:, ::-1] if reverse else time_stamps
        s = ts.shape[1]
        if s > 1:
            d = ts[:, 1:] - ts[:, :-1]
            d = jnp.concatenate([d[:, :1], d], axis=1)
        else:
            d = jnp.ones_like(ts)
        d = jnp.abs(d) + 1e-6
        d = d / jnp.max(d, axis=1, keepdims=True)
        return d[..., None]

    def _direction(self, p: M.Params, xs: jax.Array, tds, suffix: str,
                   *, deterministic: bool, rng) -> jax.Array:
        """One direction pass over xs [B, S, D] (already input-LN'd and
        flipped for backward). Returns [B, S, H]."""
        sfx = "_backward" if suffix == "b" else ""
        b, s, _ = xs.shape
        rngs = (jax.random.split(rng, s)
                if rng is not None and not deterministic else None)

        def step(h, inp):
            if rngs is None:
                x_t, td_t = inp
            else:
                x_t, td_t, r = inp
                x_t = M.dropout(x_t, self.dropout, deterministic=False,
                                rng=r)
            z = jax.nn.sigmoid(M.linear(p["W_z" + sfx], x_t)
                               + M.linear(p["U_z" + sfx], h))
            r_g = jax.nn.sigmoid(M.linear(p["W_r" + sfx], x_t)
                                 + M.linear(p["U_r" + sfx], h))
            if self.time_aware and tds is not None:
                z = z + jax.nn.sigmoid(M.linear(p["W_zt" + sfx], td_t))
                r_g = r_g + jax.nn.sigmoid(M.linear(p["W_rt" + sfx], td_t))
            h_tilde = jnp.tanh(M.linear(p["W_h" + sfx], x_t)
                               + M.linear(p["U_h" + sfx], r_g * h))
            if self.time_aware and tds is not None:
                h_tilde = h_tilde + jnp.tanh(
                    M.linear(p["W_ht" + sfx], td_t))
            h = (1 - z) * h + z * h_tilde
            if self.use_layer_norm:
                h = M.layer_norm(p["ln_h"], h)
            return h, h

        xs_t = jnp.swapaxes(xs, 0, 1)                # [S, B, D]
        td_t = jnp.swapaxes(tds, 0, 1) if tds is not None \
            else jnp.zeros((s, b, 1), xs.dtype)
        h0 = jnp.zeros((b, self.hidden_dim), xs.dtype)
        inps = (xs_t, td_t) if rngs is None else (xs_t, td_t, rngs)
        _, outs = jax.lax.scan(step, h0, inps)
        return jnp.swapaxes(outs, 0, 1)              # [B, S, H]

    def __call__(
        self,
        p: M.Params,
        inputs: jax.Array,                        # [B, S, in_dim]
        hidden: Optional[jax.Array] = None,
        time_stamps: Optional[jax.Array] = None,  # [B, S]
        *,
        deterministic: bool = True,
        rng: Optional[jax.Array] = None,
    ) -> Tuple[jax.Array, jax.Array]:
        del hidden  # reference zero-initializes; custom h0 unsupported here
        x = inputs
        if self.use_layer_norm:
            x = M.layer_norm(p["ln_in"], x)

        tdf = tdb = None
        if time_stamps is not None and self.time_aware:
            tdf = self._time_deltas(time_stamps, reverse=False)
            if self.bidirectional:
                tdb = self._time_deltas(time_stamps, reverse=True)

        r1 = r2 = None
        if not deterministic and rng is not None:
            r1, r2 = jax.random.split(rng)

        out_f = self._direction(p, x, tdf, "f", deterministic=deterministic,
                                rng=r1)
        final_f = out_f[:, -1]   # reference final_hidden = raw h_forward
        if self.asymmetric_weights:
            w = p["past_weight"]
            if tdf is not None:
                w = w * jnp.power(p["time_decay"], tdf)
            out_f = out_f * w

        if self.bidirectional:
            out_b = self._direction(p, x[:, ::-1], tdb[:, ::-1]
                                    if tdb is not None else None, "b",
                                    deterministic=deterministic, rng=r2)
            out_b = out_b[:, ::-1]
            final_b = out_b[:, 0]
            if self.asymmetric_weights:
                w = p["future_weight"]
                if tdb is not None:
                    w = w * jnp.power(p["time_decay"], tdb)
                out_b = out_b * w
            outs = jnp.concatenate([out_f, out_b], axis=-1)
            outs = M.linear(p["output_proj"], outs)
            final = jnp.concatenate([final_f, final_b], axis=-1)
        else:
            outs = out_f
            final = final_f
        if self.use_layer_norm:
            outs = M.layer_norm(p["ln_out"], outs)
        return outs, final


# ---------------------------------------------------------------------------
# Asymmetric bidirectional cell (reference :1525-1738)
# ---------------------------------------------------------------------------

@dataclasses.dataclass(frozen=True)
class AsymmetricTemporalCell:
    input_dim: int
    hidden_dim: int
    dropout: float = 0.1
    time_aware: bool = True
    use_layer_norm: bool = True
    asymmetry_factor: float = 0.7
    forward_decay: float = 0.9
    backward_decay: float = 0.8
    bias: bool = True

    def init(self, key: jax.Array) -> M.Params:
        ks = M.split_keys(key, ["fr", "fu", "fc", "br", "bu", "bc",
                                "tm", "tg"])
        d = self.input_dim + self.hidden_dim
        h = self.hidden_dim
        bi = 1.0 if self.bias else 0.0
        p: M.Params = {
            "forward_reset": M.init_linear(ks["fr"], d, h, bias=self.bias,
                                           bias_init=bi),
            "forward_update": M.init_linear(ks["fu"], d, h, bias=self.bias,
                                            bias_init=bi),
            "forward_candidate": M.init_linear(ks["fc"], d, h,
                                               bias=self.bias),
            "backward_reset": M.init_linear(ks["br"], d, h, bias=self.bias,
                                            bias_init=bi),
            "backward_update": M.init_linear(ks["bu"], d, h, bias=self.bias,
                                             bias_init=bi),
            "backward_candidate": M.init_linear(ks["bc"], d, h,
                                                bias=self.bias),
            "forward_weight": jnp.full((1,), self.asymmetry_factor),
            "backward_weight": jnp.full((1,), 1.0 - self.asymmetry_factor),
        }
        if self.time_aware:
            p["time_modulation"] = M.init_linear(ks["tm"], 1, h, bias=False)
            p["time_gate"] = M.init_linear(ks["tg"], 1, h, bias=False)
        if self.use_layer_norm:
            p["ln_in"] = M.init_layer_norm(self.input_dim)
            p["ln_out"] = M.init_layer_norm(h)
        return p

    def _branch(self, p: M.Params, x, h, time_diff, prefix: str,
                decay: float):
        inp = jnp.concatenate([x, h], axis=-1)
        reset = jax.nn.sigmoid(M.linear(p[f"{prefix}_reset"], inp))
        update = jax.nn.sigmoid(M.linear(p[f"{prefix}_update"], inp))
        if self.time_aware and time_diff is not None:
            reset = reset + jax.nn.sigmoid(
                M.linear(p["time_modulation"], time_diff))
            update = update + jax.nn.sigmoid(
                M.linear(p["time_gate"], time_diff))
        cand_in = jnp.concatenate([x, reset * h], axis=-1)
        cand = jnp.tanh(M.linear(p[f"{prefix}_candidate"], cand_in))
        if time_diff is not None:
            cand = cand * jnp.power(decay, jnp.clip(time_diff, 0.0, 10.0))
        return (1 - update) * h + update * cand

    def __call__(
        self,
        p: M.Params,
        x: jax.Array,                              # [B, input_dim]
        h_prev: Optional[jax.Array] = None,
        h_next: Optional[jax.Array] = None,
        time_diff: Optional[jax.Array] = None,     # [B, 1]
        *,
        deterministic: bool = True,
        rng: Optional[jax.Array] = None,
    ) -> jax.Array:
        b = x.shape[0]
        if self.use_layer_norm:
            x = M.layer_norm(p["ln_in"], x)
        if h_prev is None:
            h_prev = jnp.zeros((b, self.hidden_dim), x.dtype)
        if h_next is None:
            h_next = jnp.zeros((b, self.hidden_dim), x.dtype)
        if not deterministic and rng is not None:
            x = M.dropout(x, self.dropout, deterministic=False, rng=rng)
        h_f = self._branch(p, x, h_prev, time_diff, "forward",
                           self.forward_decay)
        h_b = self._branch(p, x, h_next, time_diff, "backward",
                           self.backward_decay)
        out = p["forward_weight"] * h_f + p["backward_weight"] * h_b
        if self.use_layer_norm:
            out = M.layer_norm(p["ln_out"], out)
        return out
