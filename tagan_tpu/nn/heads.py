"""Prediction heads and loss families.

TPU-native re-design of `/root/reference/src/tagan/layers/classification.py`:

* ``TemporalPredictionHead`` (:15-179) — MLP head for classification /
  regression / multi_class / multi_label / sequence tasks, including the
  reference's deliberate +0.5 final-bias init for binary classification
  (:131-138).
* ``MultiTaskPredictionHead`` (:182-346) — shared trunk + per-task heads.
* ``temporal_loss`` (:349-592) — the full loss family: BCE-with-logits,
  multi-class CE, multi-label BCE, MSE, sequence-MSE, focal
  (binary + multi-class), Huber, quantile; optional element mask and
  time weights; none/mean/sum reductions with mask-aware mean.
* ``TemporalLossModule`` (:595-740) — multi-task wrapper with weights.
* ``TemporalClassificationHead`` (:743-975) — temporal pooling
  (attention/mean/max/last/first) + MLP classifier; the wired head.
* ``AsymmetricFocalLoss`` (:978-1066).
* ``ClassificationModule`` (:1069-1231) and ``RegressionModule``
  (:1234-1459) — facades.
"""

from __future__ import annotations

import dataclasses
from typing import Any, Dict, Optional, Tuple, Union

import jax
import jax.numpy as jnp

from ..core import module as M
from ..ops.masked import masked_mean, masked_max


# ---------------------------------------------------------------------------
# Loss primitives (torch.nn.functional parity)
# ---------------------------------------------------------------------------

def bce_with_logits(logits: jax.Array, targets: jax.Array,
                    pos_weight: Optional[jax.Array] = None) -> jax.Array:
    """Elementwise BCE-with-logits, numerically stable (matches
    F.binary_cross_entropy_with_logits with reduction='none')."""
    log_p = jax.nn.log_sigmoid(logits)
    log_not_p = jax.nn.log_sigmoid(-logits)
    if pos_weight is not None:
        return -(pos_weight * targets * log_p + (1.0 - targets) * log_not_p)
    return -(targets * log_p + (1.0 - targets) * log_not_p)


def cross_entropy(logits: jax.Array, targets: jax.Array,
                  class_weights: Optional[jax.Array] = None) -> jax.Array:
    """Per-example CE with integer targets (matches F.cross_entropy
    reduction='none', including weight semantics)."""
    logp = jax.nn.log_softmax(logits, axis=-1)
    t = targets.astype(jnp.int32)
    nll = -jnp.take_along_axis(logp, t[..., None], axis=-1)[..., 0]
    if class_weights is not None:
        nll = nll * class_weights[t]
    return nll


def mse(pred: jax.Array, target: jax.Array) -> jax.Array:
    return jnp.square(pred - target)


def mae(pred: jax.Array, target: jax.Array) -> jax.Array:
    return jnp.abs(pred - target)


def smooth_l1(pred: jax.Array, target: jax.Array,
              beta: float = 1.0) -> jax.Array:
    """F.smooth_l1_loss semantics with beta (Huber/beta scaling)."""
    d = jnp.abs(pred - target)
    return jnp.where(d < beta, 0.5 * d * d / beta, d - 0.5 * beta)


def quantile_loss(pred: jax.Array, target: jax.Array,
                  tau: float = 0.5) -> jax.Array:
    diff = target - pred
    return jnp.maximum(tau * diff, (tau - 1.0) * diff)


def temporal_loss(
    predictions: jax.Array,
    targets: jax.Array,
    task_type: str = "classification",
    *,
    reduction: str = "mean",
    pos_weight: Optional[jax.Array] = None,
    class_weights: Optional[jax.Array] = None,
    focal_gamma: float = 2.0,
    focal_alpha: Optional[float] = None,
    huber_delta: float = 1.0,
    quantile_tau: float = 0.5,
    time_weights: Optional[jax.Array] = None,
    mask: Optional[jax.Array] = None,
) -> jax.Array:
    """The reference ``TemporalLossFunction.__call__`` (:401-592) minus its
    dynamic shape-coercion cascade (:420-450) — shapes must already agree
    (squeeze trailing singleton dims before calling)."""
    p, t = predictions, targets

    if task_type in ("classification", "bce"):
        loss = bce_with_logits(p, t, pos_weight)
    elif task_type in ("multi_class", "ce"):
        if p.shape[-1] == (t.shape[-1] if t.ndim == p.ndim else -1):
            t = jnp.argmax(t, axis=-1)   # one-hot -> indices (:464-466)
        loss = cross_entropy(p, t, class_weights)
    elif task_type == "multi_label":
        loss = bce_with_logits(p, t)
    elif task_type in ("regression", "mse"):
        loss = mse(p, t)
    elif task_type == "sequence":
        loss = mse(p, t)
    elif task_type == "focal":
        if p.ndim == 1 or p.shape[-1] == 1:
            # binary focal (:499-508, :538-541). NOTE: the reference's
            # binary branch is unreachable — its shape coercion squeezes
            # [B,1] preds to [B] (:424-426) before the size(-1)==1 check;
            # here 1-D/[B,1] inputs take the intended binary path.
            probs = jax.nn.sigmoid(p)
            p_t = jnp.where(t == 1, probs, 1.0 - probs)
            if focal_alpha is not None:
                alpha_t = jnp.where(t == 1, focal_alpha, 1.0 - focal_alpha)
            else:
                alpha_t = jnp.ones_like(p_t)
            base = bce_with_logits(p, t)
        else:
            # multi-class focal (:509-546): targets may be class indices
            # [B] or one-hot/probabilistic [B, C]
            probs = jax.nn.softmax(p, axis=-1)
            if t.ndim == p.ndim - 1:
                one_hot = jax.nn.one_hot(t.astype(jnp.int32), p.shape[-1],
                                         dtype=p.dtype)
            else:
                one_hot = t.astype(p.dtype)
            p_t = jnp.sum(probs * one_hot, axis=-1)
            if focal_alpha is not None:
                alpha_t = jnp.full_like(p_t, focal_alpha)
            else:
                alpha_t = jnp.ones_like(p_t)
            logp = jax.nn.log_softmax(p, axis=-1)
            w = class_weights if class_weights is not None \
                else jnp.ones((p.shape[-1],), p.dtype)
            base = -jnp.sum(one_hot * logp * w, axis=-1)
        loss = alpha_t * jnp.power(1.0 - p_t, focal_gamma) * base
    elif task_type == "huber":
        loss = smooth_l1(p, t, huber_delta)
    elif task_type == "quantile":
        loss = quantile_loss(p, t, quantile_tau)
    else:
        loss = mse(p, t)

    if mask is not None:
        loss = loss * mask
    if time_weights is not None:
        tw = time_weights
        while tw.ndim < loss.ndim:
            tw = tw[..., None]
        loss = loss * tw

    if reduction == "mean":
        if mask is not None:
            return jnp.sum(loss) / (jnp.sum(mask) + 1e-8)
        return jnp.mean(loss)
    if reduction == "sum":
        return jnp.sum(loss)
    return loss


def asymmetric_focal_loss(
    predictions: jax.Array, targets: jax.Array,
    gamma_pos: float = 0.0, gamma_neg: float = 4.0, clip: float = 0.05,
    reduction: str = "mean", eps: float = 1e-8,
    weights: Optional[jax.Array] = None,
) -> jax.Array:
    """Asymmetric focal loss for imbalanced multi-label classification
    (classification.py:978-1066)."""
    probs = jax.nn.sigmoid(predictions)
    if clip > 0:
        probs = jnp.clip(probs, clip, 1.0 - clip)
    pos_mask = (targets == 1).astype(probs.dtype)
    neg_mask = (targets == 0).astype(probs.dtype)
    pos_loss = pos_mask * jnp.power(1.0 - probs, gamma_pos) \
        * jnp.log(probs + eps)
    neg_loss = neg_mask * jnp.power(probs, gamma_neg) \
        * jnp.log(1.0 - probs + eps)
    loss = -(pos_loss + neg_loss)
    if weights is not None:
        loss = loss * weights[..., None]
    if reduction == "mean":
        return jnp.mean(loss)
    if reduction == "sum":
        return jnp.sum(loss)
    return loss


@dataclasses.dataclass(frozen=True)
class TemporalLossModule:
    """Multi-task loss wrapper (:595-740). task_configs maps task name ->
    dict with 'task_type' and optional loss params / 'loss_weight'."""
    task_configs: Tuple[Tuple[str, Tuple[Tuple[str, Any], ...]], ...]
    default_task_type: str = "classification"
    default_reduction: str = "mean"
    focal_alpha: Optional[float] = None
    focal_gamma: float = 2.0
    huber_delta: float = 1.0
    quantile_tau: float = 0.5

    @classmethod
    def create(cls, task_configs: Dict[str, Dict[str, Any]],
               loss_config: Optional[Dict[str, Any]] = None,
               default_task_type: str = "classification",
               default_reduction: str = "mean") -> "TemporalLossModule":
        lc = loss_config or {}
        frozen = tuple(sorted(
            (name, tuple(sorted(cfg.items())))
            for name, cfg in task_configs.items()))
        return cls(task_configs=frozen,
                   default_task_type=default_task_type,
                   default_reduction=lc.get("reduction", default_reduction),
                   focal_alpha=lc.get("focal_alpha"),
                   focal_gamma=lc.get("focal_gamma", 2.0),
                   huber_delta=lc.get("huber_delta", 1.0),
                   quantile_tau=lc.get("quantile_tau", 0.5))

    def _cfg(self, name: str) -> Dict[str, Any]:
        for n, items in self.task_configs:
            if n == name:
                return dict(items)
        return {}

    def __call__(
        self,
        predictions: Union[jax.Array, Dict[str, jax.Array]],
        targets: Union[jax.Array, Dict[str, jax.Array]],
        return_task_losses: bool = False,
    ):
        if isinstance(predictions, dict) and isinstance(targets, dict):
            task_losses = {}
            for name, pred in predictions.items():
                if name not in targets:
                    continue
                cfg = self._cfg(name)
                loss = temporal_loss(
                    pred, targets[name],
                    task_type=cfg.get("task_type", self.default_task_type),
                    reduction=cfg.get("reduction", self.default_reduction),
                    focal_gamma=cfg.get("focal_gamma", self.focal_gamma),
                    focal_alpha=cfg.get("focal_alpha", self.focal_alpha),
                    huber_delta=cfg.get("huber_delta", self.huber_delta),
                    quantile_tau=cfg.get("quantile_tau", self.quantile_tau))
                task_losses[name] = cfg.get("loss_weight", 1.0) * loss
        else:
            task_losses = {"default": temporal_loss(
                predictions, targets, task_type=self.default_task_type,
                reduction=self.default_reduction)}
        combined = sum(task_losses.values())
        if return_task_losses:
            return combined, task_losses
        return combined


# ---------------------------------------------------------------------------
# Temporal pooling (shared by heads; classification.py:856-929)
# ---------------------------------------------------------------------------

def init_attention_pool(key: jax.Array, hidden_dim: int) -> M.Params:
    k1, k2 = jax.random.split(key)
    return {"w1": M.init_linear(k1, hidden_dim, hidden_dim),
            "w2": M.init_linear(k2, hidden_dim, 1, bias=False)}


def pool_temporal(pooling_type: str, x: jax.Array,
                  mask: Optional[jax.Array] = None,
                  attn_params: Optional[M.Params] = None) -> jax.Array:
    """Pool [B, T, H] -> [B, H] (classification.py:856-929)."""
    if pooling_type == "mean":
        return masked_mean(x, mask, axis=1)
    if pooling_type == "max":
        return masked_max(x, mask, axis=1)
    if pooling_type == "last":
        if mask is not None:
            lengths = jnp.maximum(
                jnp.sum(mask.astype(jnp.int32), axis=1) - 1, 0)
            return jnp.take_along_axis(
                x, lengths[:, None, None].repeat(x.shape[-1], -1), axis=1
            )[:, 0]
        return x[:, -1]
    if pooling_type == "first":
        return x[:, 0]
    if pooling_type == "attention":
        assert attn_params is not None
        scores = M.linear(attn_params["w2"],
                          jnp.tanh(M.linear(attn_params["w1"], x)))  # [B,T,1]
        if mask is not None:
            m = mask[..., None].astype(x.dtype)
            scores = scores * m + (1.0 - m) * -1e9
        w = jax.nn.softmax(scores, axis=1)
        return jnp.sum(x * w, axis=1)
    return jnp.mean(x, axis=1)


# ---------------------------------------------------------------------------
# MLP head builders
# ---------------------------------------------------------------------------

def _build_mlp(key: jax.Array, in_dim: int, hidden_dim: int, out_dim: int,
               num_layers: int, use_layer_norm: bool,
               final_bias_init: float = 0.0) -> M.Params:
    ks = jax.random.split(key, num_layers)
    layers = {}
    for i in range(num_layers):
        fi = in_dim if i == 0 else hidden_dim
        fo = out_dim if i == num_layers - 1 else hidden_dim
        bias_init = final_bias_init if i == num_layers - 1 else 0.0
        layers[f"linear_{i}"] = M.init_linear(ks[i], fi, fo,
                                              bias_init=bias_init)
        if use_layer_norm and i < num_layers - 1:
            layers[f"ln_{i}"] = M.init_layer_norm(fo)
    return layers


def _apply_mlp(p: M.Params, x: jax.Array, num_layers: int,
               use_layer_norm: bool, act: str, dropout_rate: float,
               *, deterministic: bool = True,
               rng: Optional[jax.Array] = None) -> jax.Array:
    fn = M.activation(act)
    for i in range(num_layers):
        x = M.linear(p[f"linear_{i}"], x)
        if i < num_layers - 1:
            if use_layer_norm:
                x = M.layer_norm(p[f"ln_{i}"], x)
            x = fn(x)
            if not deterministic and rng is not None:
                rng, r = jax.random.split(rng)
                x = M.dropout(x, dropout_rate, deterministic=False, rng=r)
    return x


@dataclasses.dataclass(frozen=True)
class TemporalPredictionHead:
    """MLP prediction head (:15-179)."""
    hidden_dim: int
    output_dim: int
    task_type: str = "classification"
    num_layers: int = 2
    dropout: float = 0.1
    activation: str = "relu"
    use_layer_norm: bool = True

    def init(self, key: jax.Array) -> M.Params:
        # binary classification: final bias = 0.5 (:135-138)
        fb = 0.5 if (self.task_type == "classification"
                     and self.output_dim == 1) else 0.0
        return _build_mlp(key, self.hidden_dim, self.hidden_dim,
                          self.output_dim, self.num_layers,
                          self.use_layer_norm, final_bias_init=fb)

    def __call__(self, p: M.Params, x: jax.Array, *,
                 deterministic: bool = True,
                 rng: Optional[jax.Array] = None) -> jax.Array:
        y = _apply_mlp(p, x, self.num_layers, self.use_layer_norm,
                       self.activation, self.dropout,
                       deterministic=deterministic, rng=rng)
        if self.task_type in ("classification", "multi_label"):
            y = jax.nn.sigmoid(y)   # :108-109
        return y


@dataclasses.dataclass(frozen=True)
class MultiTaskPredictionHead:
    """Shared trunk + per-task heads (:182-346)."""
    hidden_dim: int
    task_configs: Tuple[Tuple[str, Tuple[Tuple[str, Any], ...]], ...]
    shared_layers: int = 1
    dropout: float = 0.1
    activation: str = "relu"
    use_layer_norm: bool = True

    @classmethod
    def create(cls, hidden_dim: int, task_configs: Dict[str, Dict[str, Any]],
               **kw) -> "MultiTaskPredictionHead":
        frozen = tuple(sorted((n, tuple(sorted(c.items())))
                              for n, c in task_configs.items()))
        return cls(hidden_dim=hidden_dim, task_configs=frozen, **kw)

    def _task_head(self, cfg: Dict[str, Any]) -> TemporalPredictionHead:
        return TemporalPredictionHead(
            hidden_dim=self.hidden_dim,
            output_dim=cfg.get("output_dim", 1),
            task_type=cfg.get("task_type", "classification"),
            num_layers=cfg.get("num_layers", 1),
            dropout=self.dropout, activation=self.activation,
            use_layer_norm=self.use_layer_norm)

    def init(self, key: jax.Array) -> M.Params:
        names = [n for n, _ in self.task_configs]
        ks = M.split_keys(key, ["shared"] + names)
        shared = {}
        sk = jax.random.split(ks["shared"], max(self.shared_layers, 1))
        for i in range(self.shared_layers):
            shared[f"linear_{i}"] = M.init_linear(sk[i], self.hidden_dim,
                                                  self.hidden_dim)
            if self.use_layer_norm:
                shared[f"ln_{i}"] = M.init_layer_norm(self.hidden_dim)
        heads = {n: self._task_head(dict(c)).init(ks[n])
                 for n, c in self.task_configs}
        return {"shared": shared, "heads": heads}

    def __call__(self, p: M.Params, x: jax.Array, *,
                 deterministic: bool = True,
                 rng: Optional[jax.Array] = None) -> Dict[str, jax.Array]:
        fn = M.activation(self.activation)
        h = x
        for i in range(self.shared_layers):
            h = M.linear(p["shared"][f"linear_{i}"], h)
            if self.use_layer_norm:
                h = M.layer_norm(p["shared"][f"ln_{i}"], h)
            h = fn(h)
            if not deterministic and rng is not None:
                rng, r = jax.random.split(rng)
                h = M.dropout(h, self.dropout, deterministic=False, rng=r)
        out = {}
        for n, c in self.task_configs:
            out[n] = self._task_head(dict(c))(p["heads"][n], h,
                                              deterministic=deterministic,
                                              rng=rng)
        return out


@dataclasses.dataclass(frozen=True)
class TemporalClassificationHead:
    """The wired head: temporal pooling + MLP classifier (:743-975)."""
    hidden_dim: int
    num_classes: int
    pooling_type: str = "attention"
    dropout: float = 0.1
    activation: str = "relu"
    num_layers: int = 2
    use_layer_norm: bool = True
    multi_label: bool = False

    def init(self, key: jax.Array) -> M.Params:
        k1, k2 = jax.random.split(key)
        p: M.Params = {"classifier": _build_mlp(
            k2, self.hidden_dim, self.hidden_dim, self.num_classes,
            self.num_layers, self.use_layer_norm)}
        if self.pooling_type == "attention":
            p["attention"] = init_attention_pool(k1, self.hidden_dim)
        return p

    def __call__(
        self, p: M.Params, x: jax.Array,
        mask: Optional[jax.Array] = None,
        labels: Optional[jax.Array] = None,
        class_weights: Optional[jax.Array] = None,
        *, deterministic: bool = True, rng: Optional[jax.Array] = None,
    ):
        pooled = pool_temporal(self.pooling_type, x, mask,
                               p.get("attention"))
        logits = _apply_mlp(p["classifier"], pooled, self.num_layers,
                            self.use_layer_norm, self.activation,
                            self.dropout, deterministic=deterministic,
                            rng=rng)
        if labels is not None:
            if self.multi_label:
                t = labels
                if t.ndim == 1:
                    t = jax.nn.one_hot(t.astype(jnp.int32), self.num_classes,
                                       dtype=logits.dtype)
                loss = jnp.mean(bce_with_logits(logits, t, class_weights))
            else:
                loss = jnp.mean(cross_entropy(logits, labels, class_weights))
            return loss, logits
        return logits


@dataclasses.dataclass(frozen=True)
class ClassificationModule:
    """Facade (:1069-1231): single task -> TemporalClassificationHead,
    multi task -> MultiTaskPredictionHead."""
    hidden_dim: int
    output_dim: int = 1
    task_type: str = "classification"
    pooling_type: str = "attention"
    dropout: float = 0.1
    activation: str = "relu"
    num_layers: int = 2
    use_layer_norm: bool = True
    multi_task: bool = False
    task_configs: Optional[Tuple[Tuple[str, Tuple[Tuple[str, Any], ...]],
                                 ...]] = None

    @property
    def head(self) -> TemporalClassificationHead:
        return TemporalClassificationHead(
            hidden_dim=self.hidden_dim, num_classes=self.output_dim,
            pooling_type=self.pooling_type, dropout=self.dropout,
            activation=self.activation, num_layers=self.num_layers,
            use_layer_norm=self.use_layer_norm,
            multi_label=(self.task_type == "multi_label"))

    @property
    def multi_head(self) -> MultiTaskPredictionHead:
        assert self.task_configs is not None
        return MultiTaskPredictionHead(
            hidden_dim=self.hidden_dim, task_configs=self.task_configs,
            shared_layers=1, dropout=self.dropout,
            activation=self.activation, use_layer_norm=self.use_layer_norm)

    def init(self, key: jax.Array) -> M.Params:
        if self.multi_task:
            return self.multi_head.init(key)
        return self.head.init(key)

    def __call__(self, p: M.Params, x: jax.Array,
                 mask: Optional[jax.Array] = None,
                 labels=None, *, deterministic: bool = True,
                 rng: Optional[jax.Array] = None):
        if self.multi_task:
            preds = self.multi_head(p, x, deterministic=deterministic,
                                    rng=rng)
            if labels is not None and isinstance(labels, dict):
                losses = {}
                for name, pr in preds.items():
                    if name in labels:
                        cfg = dict(dict(self.task_configs)[name])
                        tt = cfg.get("task_type", "classification")
                        if tt in ("classification", "multi_label"):
                            # TemporalPredictionHead already applied
                            # sigmoid for these task types (:108-109), so
                            # the loss is probability-space BCE. (The
                            # reference feeds the probabilities to
                            # bce_with_logits — a double sigmoid,
                            # classification.py:1210 — not reproduced.)
                            pclip = jnp.clip(pr, 1e-7, 1.0 - 1e-7)
                            t = labels[name]
                            losses[name] = jnp.mean(
                                -(t * jnp.log(pclip)
                                  + (1.0 - t) * jnp.log1p(-pclip)))
                        elif tt == "multi_class":
                            losses[name] = jnp.mean(
                                cross_entropy(pr, labels[name]))
                        else:
                            losses[name] = jnp.mean(mse(pr, labels[name]))
                if losses:
                    return sum(losses.values()), preds
            return preds
        return self.head(p, x, mask, labels, deterministic=deterministic,
                         rng=rng)


@dataclasses.dataclass(frozen=True)
class RegressionModule:
    """Regression facade (:1234-1459)."""
    hidden_dim: int
    output_dim: int = 1
    pooling_type: str = "attention"
    dropout: float = 0.1
    activation: str = "relu"
    num_layers: int = 2
    use_layer_norm: bool = True
    loss_type: str = "mse"
    huber_delta: float = 1.0

    def init(self, key: jax.Array) -> M.Params:
        k1, k2 = jax.random.split(key)
        p: M.Params = {"regressor": _build_mlp(
            k2, self.hidden_dim, self.hidden_dim, self.output_dim,
            self.num_layers, self.use_layer_norm)}
        if self.pooling_type == "attention":
            p["attention"] = init_attention_pool(k1, self.hidden_dim)
        return p

    def __call__(self, p: M.Params, x: jax.Array,
                 mask: Optional[jax.Array] = None,
                 targets: Optional[jax.Array] = None,
                 *, deterministic: bool = True,
                 rng: Optional[jax.Array] = None):
        pooled = pool_temporal(self.pooling_type, x, mask,
                               p.get("attention"))
        preds = _apply_mlp(p["regressor"], pooled, self.num_layers,
                           self.use_layer_norm, self.activation,
                           self.dropout, deterministic=deterministic,
                           rng=rng)
        if targets is not None:
            if self.loss_type == "mae":
                loss = jnp.mean(mae(preds, targets))
            elif self.loss_type == "huber":
                loss = jnp.mean(smooth_l1(preds, targets, self.huber_delta))
            else:
                loss = jnp.mean(mse(preds, targets))
            return loss, preds
        return preds
