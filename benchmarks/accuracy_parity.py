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

Usage: python benchmarks/accuracy_parity.py  (CPU, ~5 min)
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

SAMPLES, SEQ_LEN, NODE_F, EDGE_F, EPOCHS = 150, 6, 16, 8, 5
SPLIT = (100, 20, 30)


def run_reference(data):
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

    torch.manual_seed(0)
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
    np.random.seed(0)   # shuffle order (both frameworks shuffle train)
    with contextlib.redirect_stdout(io.StringIO()), \
            contextlib.redirect_stderr(io.StringIO()):
        trainer.train(train_loader=mk(data[:n_tr], sh=True),
                      val_loader=mk(data[n_tr:n_tr + n_va]),
                      num_epochs=EPOCHS, validate_every=1, save_best=False)
        res = trainer.evaluate(mk(data[n_tr + n_va:]))
    return {k: float(res["metrics"][k])
            for k in ("accuracy", "f1", "precision", "recall")}


def run_tagan_tpu(data, compat_mode="intended"):
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
        batch_size=1, shuffle=sh, seed=0)

    cfg = tt.TAGANConfig(node_feature_dim=NODE_F, edge_feature_dim=EDGE_F,
                         hidden_dim=64, output_dim=1, num_heads=4,
                         num_layers=2, dropout=0.1, learning_rate=1e-3,
                         weight_decay=1e-5, loss_type="bce",
                         compat_mode=compat_mode)
    model = TAGAN(cfg)
    exp = tt.ExperimentConfig(model=cfg, batch_size=1, num_epochs=EPOCHS,
                              early_stopping_patience=EPOCHS + 1)
    trainer = TAGANTrainer(model, exp)
    trainer.train(mk(0, n_tr, True), val_loader=mk(n_tr, n_tr + n_va, False),
                  verbose=False)
    preds = trainer.predict(mk(n_tr + n_va, len(seqs), False)).reshape(-1)
    y = np.asarray(labels[n_tr + n_va:])
    m = calculate_metrics(preds, y, threshold=0.5)
    return {k: float(m[k]) for k in ("accuracy", "f1", "precision", "recall")}


def main():
    # identical data for both frameworks, torch-made (reference format)
    import torch
    torch.manual_seed(0)
    np.random.seed(0)
    _sys.path.insert(0, "/root/reference")
    with contextlib.redirect_stdout(io.StringIO()):
        from src.tagan.utils.data_utils import create_synthetic_data
    data = create_synthetic_data(
        num_samples=SAMPLES, num_nodes_range=(10, 20),
        num_edges_per_node=2, node_feature_dim=NODE_F,
        edge_feature_dim=EDGE_F, sequence_length=SEQ_LEN,
        num_classes=2, balanced=True)

    out = {}
    gen = torch.Generator().manual_seed(1)
    hard = [([(x + torch.cat(
        [8.0 * torch.randn(x.shape[0], 1, generator=gen),
         torch.zeros(x.shape[0], x.shape[1] - 1)], dim=1),
        ei, ea, ids) for (x, ei, ea, ids) in seq], l)
        for seq, l in data]   # bury the feature-0 label signal in noise
    for name, d in [("easy", data), ("hard", hard)]:
        out[name] = {
            "reference_torch_cpu": run_reference(d),
            # executed-compat reproduces the reference's executed pipeline
            # (B2 fallback etc.) — the apples-to-apples parity number
            "tagan_tpu_executed_compat": run_tagan_tpu(d, "executed"),
            # the intended pipeline (propagation + memory active) is the
            # default; extra capacity, slightly more data-hungry on tiny
            # noisy tasks
            "tagan_tpu_intended": run_tagan_tpu(d, "intended"),
        }
    print(json.dumps(out, indent=2))


if __name__ == "__main__":
    main()
