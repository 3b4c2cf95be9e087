"""Trained-accuracy parity: the mounted PyTorch reference vs TAGAN-TPU
on identical synthetic data (the BASELINE.md accuracy target — the
reference publishes no numbers, so this experiment establishes them).

The reference cannot run as shipped: its `src/tagan/data/` package is
missing (SURVEY.md B1). This script injects a minimal dataset/loader
implementing the contract inferred from the call sites
(`example.py:105-127`, `trainer.py:295-300`) — batch_size=1 to stay off
the row-0 pooling bug (B4) — then trains the reference with its own
TAGANTrainer, trains TAGAN-TPU on the same data, and reports both test
accuracies. No reference code is copied; the mounted repo is executed.

Usage: python benchmarks/accuracy_parity.py [quick]  (CPU)

Statistics (VERDICT r2 item 6): the easy task is a 1-seed sanity row;
the HARD task runs 10 seeds x n_test=200 per pipeline and reports
mean +/- 95% t-CI (the accuracy_churn.py rigor), dumped to
results_parity.json.
"""
import contextlib
import io
import json
import os as _os
import sys as _sys
import tempfile
import types

_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))

import numpy as np

SAMPLES, SEQ_LEN, NODE_F, EDGE_F, EPOCHS = 320, 6, 16, 8, 5
SPLIT = (100, 20, 200)


def run_reference(data, seed=0):
    import torch
    from torch import nn  # noqa: F401 (ensure torch fully imported first)

    _sys.path.insert(0, "/root/reference")

    # ---- inject the missing data package (inferred contract, B1) ----
    class RefDataset:
        def __init__(self, data=None, labels=None):
            self.data, self.labels = data, labels

        def __len__(self):
            return len(self.data)

        def __getitem__(self, i):
            return self.data[i], self.labels[i]

    class RefLoader:
        def __init__(self, dataset, batch_size=1, shuffle=False):
            self.dataset, self.shuffle = dataset, shuffle

        def __len__(self):
            return len(self.dataset)

        def __iter__(self):
            idx = np.arange(len(self.dataset))
            if self.shuffle:
                np.random.shuffle(idx)
            for i in idx:
                seq, label = self.dataset[int(i)]
                yield seq, torch.tensor([float(label)])

    dl = types.ModuleType("src.tagan.data.data_loader")
    dl.TemporalGraphDataset = RefDataset
    dl.TemporalGraphDataLoader = RefLoader
    pkg = types.ModuleType("src.tagan.data")
    pkg.data_loader = dl
    _sys.modules["src.tagan.data"] = pkg
    _sys.modules["src.tagan.data.data_loader"] = dl

    with contextlib.redirect_stdout(io.StringIO()):
        from src.tagan.model import TAGAN as RefTAGAN
        from src.tagan.training.trainer import TAGANTrainer as RefTrainer
        from src.tagan.utils.config import TAGANConfig as RefConfig

    torch.manual_seed(seed)
    cfg = RefConfig(node_feature_dim=NODE_F, edge_feature_dim=EDGE_F,
                    hidden_dim=64, output_dim=1, num_heads=4, num_layers=2,
                    dropout=0.1, learning_rate=1e-3, weight_decay=1e-5,
                    device="cpu", loss_type="bce")
    with contextlib.redirect_stdout(io.StringIO()):
        model = RefTAGAN(cfg)

    n_tr, n_va, _ = SPLIT
    mk = lambda rows, sh=False: RefLoader(
        RefDataset([s for s, _ in rows], [l for _, l in rows]), shuffle=sh)
    tmp = tempfile.mkdtemp(prefix="ref_tagan_")
    trainer = RefTrainer(model=model, config=cfg,
                         checkpoint_dir=_os.path.join(tmp, "ckpt"),
                         log_dir=_os.path.join(tmp, "logs"))
    np.random.seed(seed)  # shuffle order (both frameworks shuffle train)
    with contextlib.redirect_stdout(io.StringIO()), \
            contextlib.redirect_stderr(io.StringIO()):
        trainer.train(train_loader=mk(data[:n_tr], sh=True),
                      val_loader=mk(data[n_tr:n_tr + n_va]),
                      num_epochs=EPOCHS, validate_every=1, save_best=False)
        res = trainer.evaluate(mk(data[n_tr + n_va:]))
    return {k: float(res["metrics"][k])
            for k in ("accuracy", "f1", "precision", "recall")}


def run_tagan_tpu(data, compat_mode="intended", seed=0):
    import jax
    jax.config.update("jax_platforms", "cpu")
    import tagan_tpu as tt
    from tagan_tpu.data import TemporalGraphDataset, TemporalGraphDataLoader
    from tagan_tpu.nn.model import TAGAN
    from tagan_tpu.train import TAGANTrainer, calculate_metrics

    # reference wire format (torch 4-tuples) converts directly
    seqs = [[tuple(np.asarray(x) if hasattr(x, "numpy") else x
                   for x in snap) for snap in seq] for seq, _ in data]
    labels = [float(l) for _, l in data]
    n_tr, n_va, _ = SPLIT
    mk = lambda lo, hi, sh: TemporalGraphDataLoader(
        TemporalGraphDataset(list(zip(seqs[lo:hi], labels[lo:hi]))),
        batch_size=1, shuffle=sh, seed=seed)

    cfg = tt.TAGANConfig(node_feature_dim=NODE_F, edge_feature_dim=EDGE_F,
                         hidden_dim=64, output_dim=1, num_heads=4,
                         num_layers=2, dropout=0.1, learning_rate=1e-3,
                         weight_decay=1e-5, loss_type="bce",
                         compat_mode=compat_mode)
    model = TAGAN(cfg)
    exp = tt.ExperimentConfig(model=cfg, batch_size=1, num_epochs=EPOCHS,
                              early_stopping_patience=EPOCHS + 1,
                              seed=seed)
    trainer = TAGANTrainer(model, exp)
    trainer.train(mk(0, n_tr, True), val_loader=mk(n_tr, n_tr + n_va, False),
                  verbose=False)
    preds = trainer.predict(mk(n_tr + n_va, len(seqs), False)).reshape(-1)
    y = np.asarray(labels[n_tr + n_va:])
    m = calculate_metrics(preds, y, threshold=0.5)
    return {k: float(m[k]) for k in ("accuracy", "f1", "precision", "recall")}


def _make_data(seed):
    """Identical data for both frameworks, torch-made (reference
    format): the easy task plus the noise-buried hard variant."""
    import torch
    torch.manual_seed(seed)
    np.random.seed(seed)
    _sys.path.insert(0, "/root/reference")
    with contextlib.redirect_stdout(io.StringIO()):
        from src.tagan.utils.data_utils import create_synthetic_data
    data = create_synthetic_data(
        num_samples=SAMPLES, num_nodes_range=(10, 20),
        num_edges_per_node=2, node_feature_dim=NODE_F,
        edge_feature_dim=EDGE_F, sequence_length=SEQ_LEN,
        num_classes=2, balanced=True)
    gen = torch.Generator().manual_seed(seed + 1)
    hard = [([(x + torch.cat(
        [8.0 * torch.randn(x.shape[0], 1, generator=gen),
         torch.zeros(x.shape[0], x.shape[1] - 1)], dim=1),
        ei, ea, ids) for (x, ei, ea, ids) in seq], l)
        for seq, l in data]   # bury the feature-0 label signal in noise
    return data, hard


def ci95(vals):
    v = np.asarray(vals, float)
    if len(v) < 2:
        return float(v.mean()), 0.0
    t = {2: 12.71, 3: 4.303, 4: 3.182, 5: 2.776, 6: 2.571, 7: 2.447,
         8: 2.365, 9: 2.306, 10: 2.262}.get(len(v), 1.96)
    return float(v.mean()), float(t * v.std(ddof=1) / np.sqrt(len(v)))


PIPELINES = [
    # executed-compat reproduces the reference's executed pipeline
    # (B2 fallback etc.) — the apples-to-apples parity number; the
    # intended pipeline (propagation + memory active) is the default
    ("reference_torch_cpu", lambda d, s: run_reference(d, seed=s)),
    ("tagan_tpu_executed_compat",
     lambda d, s: run_tagan_tpu(d, "executed", seed=s)),
    ("tagan_tpu_intended",
     lambda d, s: run_tagan_tpu(d, "intended", seed=s)),
]


def main():
    quick = len(_sys.argv) > 1 and _sys.argv[1] == "quick"
    n_seeds = 2 if quick else 10
    out = {"n_seeds_hard": n_seeds, "n_test": SPLIT[2],
           "epochs": EPOCHS, "train": SPLIT[0]}

    # easy task: 1-seed sanity row (all pipelines saturate it)
    easy, _ = _make_data(0)
    out["easy"] = {name: fn(easy, 0) for name, fn in PIPELINES}
    print(json.dumps({"easy": out["easy"]}), flush=True)

    # hard task: n_seeds independent (data, init, shuffle) draws per
    # pipeline -> mean +/- 95% t-CI (accuracy_churn.py rigor)
    per = {name: [] for name, _ in PIPELINES}
    for s in range(n_seeds):
        _, hard = _make_data(s)
        for name, fn in PIPELINES:
            m = fn(hard, s)
            per[name].append(m)
            print(json.dumps({"seed": s, name: m}), flush=True)
    out["hard"] = {}
    for name, _ in PIPELINES:
        row = {}
        for k in ("accuracy", "f1"):
            mean, half = ci95([m[k] for m in per[name]])
            row[f"{k}_mean"] = round(mean, 4)
            row[f"{k}_ci95"] = round(half, 4)
        row["per_seed_accuracy"] = [round(m["accuracy"], 4)
                                    for m in per[name]]
        out["hard"][name] = row
    print(json.dumps(out, indent=2))
    path = _os.path.join(_os.path.dirname(_os.path.abspath(__file__)),
                         "results_parity.json")
    with open(path, "w") as f:
        json.dump(out, f, indent=1)


if __name__ == "__main__":
    main()
