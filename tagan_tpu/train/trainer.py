"""Training loop for TAGAN-TPU.

TPU-native re-design of the reference ``TAGANTrainer``
(`/root/reference/src/tagan/training/trainer.py:26-649`): the same
capabilities — Adam + weight decay (:81-88), gradient clipping (:307-309),
early stopping on validation F1 with patience (:197-222), LR schedulers
including reduce-on-plateau (:224-229), checkpointing with best-model
tracking (:520-561), metric histories (:343) — but as one jitted update
step over pytrees (optax), with the functional memory bank threaded
explicitly and checkpoints saved as a single pytree (params + optimizer
+ memory), fixing the reference's split/broken save story (B5).
"""

from __future__ import annotations

import json
import logging
import os
import pickle
import time
from typing import Any, Callable, Dict, List, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
import optax

from ..core.config import ExperimentConfig, TAGANConfig
from ..core.graph import SnapshotSequence
from ..nn.model import TAGAN, batched_forward
from .metrics import MetricsTracker, calculate_metrics

logger = logging.getLogger("tagan_tpu")


def make_optimizer(cfg: TAGANConfig, exp: ExperimentConfig,
                   steps_per_epoch: int = 100) -> optax.GradientTransformation:
    """Adam + weight decay + clipping (trainer.py:81-88, :307-309)."""
    sched: Any = cfg.learning_rate
    if exp.lr_scheduler == "cosine":
        sched = optax.cosine_decay_schedule(
            cfg.learning_rate, exp.num_epochs * steps_per_epoch)
    elif exp.lr_scheduler == "step":
        sched = optax.exponential_decay(
            cfg.learning_rate, steps_per_epoch * exp.lr_scheduler_step_size,
            exp.lr_scheduler_factor, staircase=True)
    tx = optax.chain(
        optax.clip_by_global_norm(cfg.gradient_clip_val)
        if cfg.gradient_clip_val > 0 else optax.identity(),
        optax.adamw(sched, weight_decay=cfg.weight_decay),
    )
    return tx


class TAGANTrainer:
    """Epoch-driven trainer with a jitted step (reference API surface:
    train/evaluate/test/predict, trainer.py:143/347/430/459)."""

    def __init__(self, model: TAGAN,
                 experiment: Optional[ExperimentConfig] = None,
                 params=None, rng: Optional[jax.Array] = None,
                 mesh=None):
        """``mesh``: optional `jax.sharding.Mesh` with ('data', 'graph')
        axes (see dist.mesh.make_mesh). When given, every jitted step
        runs SPMD: batches shard over 'data', node slots over 'graph',
        params/optimizer replicated — GSPMD inserts the gradient
        all-reduce and attention collectives (dist/spmd.py recipe). The
        math is identical to single-device."""
        self.model = model
        self.config = model.config
        self.mesh = mesh
        self.experiment = experiment or ExperimentConfig(model=model.config)
        self.log_file: Optional[str] = None
        if self.experiment.log_dir:
            self._setup_logging(self.experiment.log_dir)
        self.rng = rng if rng is not None else jax.random.key(
            self.experiment.seed)
        if params is None:
            self.rng, k = jax.random.split(self.rng)
            params = model.init(k)
        self.params = params
        self.tx = make_optimizer(self.config, self.experiment)
        self.opt_state = self.tx.init(self.params)
        self.tracker = MetricsTracker(
            primary_metric=self.experiment.early_stopping_metric)
        self.epoch = 0
        self.global_step = 0
        self._plateau_lr_scale = 1.0
        self._plateau_best = -np.inf
        self._plateau_wait = 0
        self._build_steps()

    # -- logging (reference trainer.py:113-141) ---------------------------
    def _setup_logging(self, log_dir: str):
        """Timestamped log file + console, like the reference's
        `_setup_logging`: every `logger` line during training also lands
        in ``<log_dir>/training_<timestamp>.log``."""
        os.makedirs(log_dir, exist_ok=True)
        ts = time.strftime("%Y%m%d_%H%M%S")
        self.log_file = os.path.join(log_dir, f"training_{ts}.log")
        fmt = logging.Formatter(
            "%(asctime)s - %(name)s - %(levelname)s - %(message)s")
        fh = logging.FileHandler(self.log_file)
        fh.setFormatter(fmt)
        logger.addHandler(fh)
        if not any(type(h) is logging.StreamHandler
                   for h in logger.handlers):
            ch = logging.StreamHandler()
            ch.setFormatter(fmt)
            logger.addHandler(ch)
        if logger.level > logging.INFO or logger.level == logging.NOTSET:
            logger.setLevel(logging.INFO)

    # -- jitted steps -----------------------------------------------------
    def _build_steps(self):
        model, tx = self.model, self.tx

        def train_step(params, opt_state, batch, labels, mask, rng,
                       lr_scale):
            def masked_loss(p):
                out = jax.vmap(lambda s, l, r: model(
                    p, s, l, deterministic=False, rng=r))(
                        batch, labels, jax.random.split(rng,
                                                        labels.shape[0]))
                m = mask.astype(out.loss.dtype)
                loss = jnp.sum(out.loss * m) / jnp.maximum(jnp.sum(m), 1.0)
                return loss, out
            (loss, out), grads = jax.value_and_grad(masked_loss,
                                                    has_aux=True)(params)
            updates, opt_state = tx.update(grads, opt_state, params)
            # plateau scheduler scales the final update (Adam's step size
            # is invariant to gradient scaling, so scale updates instead)
            updates = jax.tree_util.tree_map(lambda u: u * lr_scale, updates)
            params = optax.apply_updates(params, updates)
            return params, opt_state, loss, out.predictions

        def eval_step(params, batch, labels):
            out = jax.vmap(lambda s, l: model(params, s, l,
                                              deterministic=True))(
                batch, labels)
            return out.loss, out.predictions

        def predict_step(params, batch):
            # label-free: no loss is computed, so unlabeled loaders work
            out = jax.vmap(lambda s: model(params, s, None,
                                           deterministic=True))(batch)
            return out.predictions

        if self.mesh is not None:
            from jax.sharding import NamedSharding, PartitionSpec as P
            from ..dist.spmd import batch_specs
            from ..dist.mesh import DATA_AXIS
            mesh = self.mesh
            repl = NamedSharding(mesh, P())
            bspec = jax.tree_util.tree_map(
                lambda s: NamedSharding(mesh, s), batch_specs(mesh),
                is_leaf=lambda s: isinstance(s, P))
            dvec = NamedSharding(mesh, P(DATA_AXIS))
            self._train_step = jax.jit(
                train_step,
                in_shardings=(repl, repl, bspec, dvec, dvec, repl, repl),
                out_shardings=(repl, repl, repl, dvec))
            self._eval_step = jax.jit(
                eval_step, in_shardings=(repl, bspec, dvec),
                out_shardings=(dvec, dvec))
            self._predict_step = jax.jit(
                predict_step, in_shardings=(repl, bspec),
                out_shardings=dvec)
        else:
            self._train_step = jax.jit(train_step)
            self._eval_step = jax.jit(eval_step)
            self._predict_step = jax.jit(predict_step)

        def train_scan(params, opt_state, batches, labels, masks, rng,
                       lr_scale):
            """lax.scan of train_step over stacked batches — one device
            program per epoch chunk instead of one per step. On TPU this
            removes per-step launch latency entirely (host only sees the
            final state); through this image's relay it is the only
            honest way to chain steps (CLAUDE.md timing notes)."""
            def body(carry, inp):
                params, opt_state, rng = carry
                batch, lab, msk = inp
                rng, sr = jax.random.split(rng)
                params, opt_state, loss, preds = train_step(
                    params, opt_state, batch, lab, msk, sr, lr_scale)
                return (params, opt_state, rng), (loss, preds)
            (params, opt_state, rng), (losses, preds) = jax.lax.scan(
                body, (params, opt_state, rng), (batches, labels, masks))
            return params, opt_state, rng, losses, preds

        if self.mesh is not None:
            # stacked-epoch shapes get a leading scan axis
            sspec = jax.tree_util.tree_map(
                lambda s: NamedSharding(mesh, P(None, *s)),
                batch_specs(mesh), is_leaf=lambda s: isinstance(s, P))
            sdvec = NamedSharding(mesh, P(None, DATA_AXIS))
            self._train_scan = jax.jit(
                train_scan,
                in_shardings=(repl, repl, sspec, sdvec, sdvec, repl, repl),
                out_shardings=(repl, repl, repl, repl, sdvec))
        else:
            self._train_scan = jax.jit(train_scan)

    # -- epoch loops ------------------------------------------------------
    def _run_epoch_fused(self, loader) -> Tuple[float, Dict[str, float]]:
        """Training epoch as lax.scan'd device programs: batches are
        stacked host-side (grouped by shape — size buckets scan
        separately) and the whole group runs as ONE dispatch. Identical
        math to the per-step path."""
        groups: Dict[Any, list] = {}
        for batch, labels, mask in loader:
            key = tuple((tuple(l.shape), str(l.dtype))
                        for l in jax.tree_util.tree_leaves(batch))
            groups.setdefault(key, []).append((batch, labels, mask))

        losses, all_preds, all_labels = [], [], []
        for items in groups.values():
            bs = jax.tree_util.tree_map(
                lambda *xs: jnp.stack(xs), *[b for b, _, _ in items])
            ls = jnp.stack([l for _, l, _ in items])
            ms = jnp.stack([m for _, _, m in items])
            self.rng, sr = jax.random.split(self.rng)
            self.params, self.opt_state, _, step_losses, preds = \
                self._train_scan(self.params, self.opt_state, bs, ls, ms,
                                 sr, jnp.asarray(self._plateau_lr_scale))
            self.global_step += len(items)
            m_np = np.asarray(ms)
            losses.extend(np.asarray(step_losses).tolist())
            all_preds.append(np.asarray(preds)[m_np])
            all_labels.append(np.asarray(ls)[m_np])
        preds = np.concatenate(all_preds) if all_preds else np.zeros((0, 1))
        labels = np.concatenate(all_labels) if all_labels else np.zeros((0,))
        if self.config.output_dim == 1:
            metrics = calculate_metrics(preds.reshape(-1), labels,
                                        threshold=0.5)
        else:
            metrics = calculate_metrics(preds, labels)
        return float(np.mean(losses)) if losses else 0.0, metrics

    def _run_epoch(self, loader, train: bool
                   ) -> Tuple[float, Dict[str, float]]:
        if train and self.experiment.fused_epochs:
            return self._run_epoch_fused(loader)
        losses, all_preds, all_labels = [], [], []
        for batch, labels, mask in loader:
            if train:
                self.rng, step_rng = jax.random.split(self.rng)
                self.params, self.opt_state, loss, preds = self._train_step(
                    self.params, self.opt_state, batch, labels, mask,
                    step_rng, jnp.asarray(self._plateau_lr_scale))
                self.global_step += 1
            else:
                loss, preds = self._eval_step(self.params, batch, labels)
                # mask out padded duplicate rows of the final partial
                # batch, as the train path does
                mw = mask.astype(loss.dtype)
                loss = jnp.sum(loss * mw) / jnp.maximum(jnp.sum(mw), 1.0)
            m = np.asarray(mask)
            losses.append(float(loss))
            all_preds.append(np.asarray(preds)[m])
            all_labels.append(np.asarray(labels)[m])
        preds = np.concatenate(all_preds) if all_preds else np.zeros((0, 1))
        labels = np.concatenate(all_labels) if all_labels else np.zeros((0,))
        if self.config.output_dim == 1:
            metrics = calculate_metrics(preds.reshape(-1), labels,
                                        threshold=0.5)
        else:
            metrics = calculate_metrics(preds, labels)
        return float(np.mean(losses)) if losses else 0.0, metrics

    def train(self, train_loader, val_loader=None,
              num_epochs: Optional[int] = None,
              checkpoint_dir: Optional[str] = None,
              verbose: bool = True) -> Dict[str, Any]:
        """Full training run with early stopping on val F1
        (trainer.py:143-271)."""
        exp = self.experiment
        num_epochs = num_epochs or exp.num_epochs
        ckpt_dir = checkpoint_dir or exp.checkpoint_dir
        patience = exp.early_stopping_patience
        best_metric = -np.inf
        best_epoch = -1
        wait = 0
        history: Dict[str, List[float]] = {
            "train_loss": [], "val_loss": [], "train_f1": [], "val_f1": []}

        for epoch in range(num_epochs):
            self.epoch = epoch
            t0 = time.time()
            train_loss, train_metrics = self._run_epoch(train_loader, True)
            self.tracker.update("train", {**train_metrics,
                                          "loss": train_loss})
            history["train_loss"].append(train_loss)
            history["train_f1"].append(train_metrics.get("f1", 0.0))

            val_metrics = {}
            if val_loader is not None:
                val_loss, val_metrics = self._run_epoch(val_loader, False)
                self.tracker.update("val", {**val_metrics, "loss": val_loss})
                history["val_loss"].append(val_loss)
                history["val_f1"].append(val_metrics.get("f1", 0.0))
                monitored = val_metrics.get(exp.early_stopping_metric, 0.0)

                # reduce-on-plateau (trainer.py:224-229)
                if exp.lr_scheduler == "plateau":
                    if monitored > self._plateau_best + 1e-6:
                        self._plateau_best = monitored
                        self._plateau_wait = 0
                    else:
                        self._plateau_wait += 1
                        if self._plateau_wait >= exp.lr_scheduler_patience:
                            self._plateau_lr_scale *= exp.lr_scheduler_factor
                            self._plateau_wait = 0

                if monitored > best_metric:
                    best_metric = monitored
                    best_epoch = epoch
                    wait = 0
                    if ckpt_dir:
                        self.save_checkpoint(
                            os.path.join(ckpt_dir, "best_model.ckpt"),
                            metrics=val_metrics)
                else:
                    wait += 1
            if verbose:
                msg = (f"epoch {epoch}: train_loss={train_loss:.4f} "
                       f"f1={train_metrics.get('f1', 0):.3f}")
                if val_metrics:
                    msg += (f" val_f1={val_metrics.get('f1', 0):.3f}"
                            f" ({time.time()-t0:.1f}s)")
                logger.info(msg)
            if ckpt_dir and exp.checkpoint_every \
                    and (epoch + 1) % exp.checkpoint_every == 0:
                self.save_checkpoint(
                    os.path.join(ckpt_dir, f"epoch_{epoch}.ckpt"))
            if val_loader is not None and wait >= patience:
                logger.info(f"early stopping at epoch {epoch} "
                            f"(best {exp.early_stopping_metric}="
                            f"{best_metric:.4f} @ {best_epoch})")
                break
        if ckpt_dir and exp.plot_history:
            # curve dump at end of training (reference trainer.py:591-638
            # plot_training_curves) + raw history JSON next to it
            try:
                self.plot_history(
                    history, os.path.join(ckpt_dir,
                                          "training_history.png"))
                with open(os.path.join(ckpt_dir,
                                       "training_history.json"),
                          "w") as f:
                    json.dump(history, f)
            except Exception as e:   # plotting must never kill a run
                logger.warning(f"history plot failed: {e}")
        return {"history": history, "best_metric": best_metric,
                "best_epoch": best_epoch, "tracker": self.tracker}

    @staticmethod
    def plot_history(history: Dict[str, List[float]], save_path: str):
        """Training-curve figure (viz.plot_training_history)."""
        from ..viz.performance_vis import plot_training_history
        os.makedirs(os.path.dirname(save_path) or ".", exist_ok=True)
        return plot_training_history(history, save_path=save_path)

    def evaluate(self, loader) -> Dict[str, float]:
        loss, metrics = self._run_epoch(loader, False)
        return {**metrics, "loss": loss}

    def test(self, loader) -> Dict[str, float]:
        metrics = self.evaluate(loader)
        self.tracker.update("test", metrics)
        return metrics

    def predict(self, loader) -> np.ndarray:
        """Label-free inference (reference trainer.py:459-518): the
        loader's labels (dummy zeros for unlabeled datasets) are never
        read — predictions come from a loss-free jitted step."""
        preds = []
        for item in loader:
            batch, mask = item[0], item[-1]
            p = self._predict_step(self.params, batch)
            preds.append(np.asarray(p)[np.asarray(mask)])
        return np.concatenate(preds) if preds else np.zeros((0,))

    # -- checkpointing (single pytree: params + opt + config) ------------
    def save_checkpoint(self, path: str,
                        metrics: Optional[Dict[str, float]] = None):
        os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
        payload = {
            "epoch": self.epoch,
            "global_step": self.global_step,
            "params": jax.tree_util.tree_map(np.asarray, self.params),
            "opt_state": jax.tree_util.tree_map(np.asarray, self.opt_state),
            "config": self.config.to_dict(),
            "experiment": self.experiment.to_dict(),
            "metrics": metrics or {},
        }
        with open(path, "wb") as f:
            pickle.dump(payload, f)

    def load_checkpoint(self, path: str):
        with open(path, "rb") as f:
            payload = pickle.load(f)
        self.params = jax.tree_util.tree_map(jnp.asarray, payload["params"])
        self.opt_state = jax.tree_util.tree_map(jnp.asarray,
                                                payload["opt_state"])
        self.epoch = payload.get("epoch", 0)
        self.global_step = payload.get("global_step", 0)
        return payload.get("metrics", {})


def cross_validate(model: TAGAN, dataset, experiment: ExperimentConfig,
                   num_epochs: Optional[int] = None,
                   loader_kwargs: Optional[Dict[str, Any]] = None,
                   verbose: bool = False) -> Dict[str, Any]:
    """K-fold cross-validation over a ``TemporalGraphDataset``.

    The reference declares ``num_folds`` in its experiment config
    (`/root/reference/src/tagan/utils/config.py:386`) but ships no CV
    loop; this is the working implementation. Each fold trains a fresh
    parameter set (fold-specific seed) on k-1 folds and evaluates on the
    held-out fold. Loaders pad all folds to the full dataset's dims so
    every fold reuses the same compiled step.

    Returns {"folds": [per-fold val metrics], "mean": {...}, "std": {...}}.
    """
    from ..data.dataset import TemporalGraphDataLoader, pad_dims_for

    kw = dict(loader_kwargs or {})
    Tm, Nm, Em, Fe = pad_dims_for(dataset.sequences)
    kw.setdefault("max_time", Tm)
    kw.setdefault("max_nodes", Nm)
    kw.setdefault("max_edges", max(Em, 1))
    kw.setdefault("edge_feature_dim", Fe)
    kw.setdefault("batch_size", experiment.batch_size)

    fold_metrics: List[Dict[str, float]] = []
    for f, (train_ds, val_ds) in enumerate(
            dataset.kfold(experiment.num_folds, seed=experiment.seed)):
        exp_f = experiment.replace(seed=experiment.seed + f,
                                   checkpoint_dir="")
        trainer = TAGANTrainer(model, exp_f)
        train_loader = TemporalGraphDataLoader(
            train_ds, shuffle=experiment.shuffle, seed=exp_f.seed, **kw)
        val_loader = TemporalGraphDataLoader(val_ds, **kw)
        trainer.train(train_loader, val_loader, num_epochs=num_epochs,
                      checkpoint_dir="", verbose=verbose)
        metrics = trainer.evaluate(val_loader)
        fold_metrics.append(metrics)
        logger.info(f"fold {f}: " + " ".join(
            f"{k}={v:.4f}" for k, v in metrics.items()
            if isinstance(v, float)))

    keys = [k for k, v in fold_metrics[0].items()
            if isinstance(v, (int, float))]
    mean = {k: float(np.mean([m[k] for m in fold_metrics])) for k in keys}
    std = {k: float(np.std([m[k] for m in fold_metrics])) for k in keys}
    return {"folds": fold_metrics, "mean": mean, "std": std}
