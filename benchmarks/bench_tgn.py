"""BASELINE config 4: TGN-style temporal interaction graph at
Wikipedia/Reddit scale (~10K nodes, ~600K temporal events) with recency
neighbor sampling per snapshot — training throughput + accuracy on the
state-change prediction task, single chip.

    python benchmarks/bench_tgn.py [quick]

Stream -> sliding-window sequences via data.tgn (the loader BASELINE
names); label = whether the window contains a state change (rate tuned
for class balance). Reports events/s through training, epoch time, and
val/test accuracy/F1/AUC; dumps results_tgn.json.
"""
import os as _os, sys as _sys
_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))

import json
import sys
import time

import numpy as np

def _cache():
    import jax
    try:
        jax.config.update("jax_compilation_cache_dir", "/tmp/tagan_jax_cache")
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 5)
    except Exception:
        pass
_cache()


import tagan_tpu as tt
from tagan_tpu.data.dataset import TemporalGraphDataLoader, pad_dims_for
from tagan_tpu.data.tgn import create_tgn_synthetic, stream_to_sequences
from tagan_tpu.train.trainer import TAGANTrainer

QUICK = len(sys.argv) > 1 and sys.argv[1] == "quick"

if QUICK:
    N_USERS, N_ITEMS, N_EVENTS = 300, 150, 20_000
    EPOCHS, SNAPSHOTS = 2, 6
else:
    N_USERS, N_ITEMS, N_EVENTS = 9_000, 4_000, 600_000
    EPOCHS, SNAPSHOTS = 20, 8


def main():
    t0 = time.time()
    stream = create_tgn_synthetic(
        num_users=N_USERS, num_items=N_ITEMS, num_events=N_EVENTS,
        time_span=1e6, edge_feat_dim=4, state_change_rate=0.0,
        # learnable churn-burst labels: ~45% of the 200 windows contain
        # one user's labeled activity burst (observable degree spike)
        num_churn_bursts=90 if not QUICK else 12,
        burst_len=48, burst_span=1e6 / 400.0, burst_feat_shift=4.0,
        seed=0)
    span = 1e6 / 200.0
    # half-span stride -> ~400 (overlapping) windows: more training
    # signal and a less noisy eval split at the same stream size
    ds = stream_to_sequences(stream, num_snapshots=SNAPSHOTS,
                             seq_span=span, stride=span / 2,
                             max_degree=16, node_feature_dim=8)
    n_pos = sum(1 for l in ds.labels if l > 0.5)
    print(f"stream: {stream.num_events} events, {stream.num_nodes} nodes"
          f" -> {len(ds)} sequences ({n_pos} positive)"
          f" [{time.time() - t0:.0f}s host-side]", flush=True)

    train_ds, val_ds, test_ds = ds.split((0.7, 0.15, 0.15), seed=0)
    Tm, Nm, Em, Fe = pad_dims_for(ds.sequences)
    kw = dict(max_time=Tm, max_nodes=Nm, max_edges=max(Em, 1),
              edge_feature_dim=Fe, batch_size=8)
    print(f"padded dims: T={Tm} N={Nm} E={Em} Fe={Fe}", flush=True)

    # csr/flash: the sparse edge-bias paths — the dense backend would
    # build the [B, T, N, N, hidden] edge-feature tensor (23 GB here)
    backend = _os.environ.get("BACKEND", "csr")
    # Needle task (one bursting node among ~800 decides the label):
    # measured round-3 ablations (N=842, 4 seeds each) — mean/attention
    # feature pooling stall at the base rate (all-positive collapse,
    # AUC~0.5); MAX pooling trains (held AUC 0.85-1.0) because the hard
    # winner-takes-all routes the whole gradient to the burst node, but
    # discovery is still init-seed-dependent, so the bench trains
    # RESTARTS and picks by val ROC-AUC (collapse ~0.5 vs success ~1.0
    # separates cleanly); dropout adds discovery noise on this needle
    # and is off
    cfg = tt.TAGANConfig(
        hidden_dim=64, num_heads=4, num_layers=2, node_feature_dim=8,
        edge_feature_dim=Fe, use_edge_features=Fe > 0, output_dim=1,
        loss_type="bce", dropout=0.0, learning_rate=3e-3,
        node_pooling="max", spatial_backend=backend)
    train_loader = TemporalGraphDataLoader(train_ds, shuffle=True,
                                           seed=0, **kw)
    val_loader = TemporalGraphDataLoader(val_ds, **kw)
    test_loader = TemporalGraphDataLoader(test_ds, **kw)

    # count real (unpadded) training events per epoch
    ev_per_epoch = sum(
        int(np.asarray(s.edge_mask).sum()) for s in (
            tt.build_sequence(x, max_nodes=Nm, max_edges=max(Em, 1),
                              max_time=Tm, edge_feature_dim=Fe)
            for x in train_ds.sequences))

    def _labels_of(loader):
        out = []
        for item in loader:
            out.append(np.asarray(item[1])[np.asarray(item[-1])])
        return np.concatenate(out)

    from tagan_tpu.train.metrics import calculate_metrics
    import tempfile
    val_labels = _labels_of(val_loader)
    RESTARTS = 1 if QUICK else 3
    t0 = time.time()
    best = None
    restart_aucs = []
    for r in range(RESTARTS):
        exp = tt.ExperimentConfig(model=cfg, batch_size=8,
                                  num_epochs=EPOCHS, checkpoint_dir="",
                                  early_stopping_patience=EPOCHS + 1,
                                  seed=r)
        trainer = TAGANTrainer(tt.TAGAN(cfg), exp)
        ckdir = tempfile.mkdtemp(prefix=f"tgn_ck{r}_")
        res = trainer.train(train_loader, val_loader,
                            num_epochs=EPOCHS, checkpoint_dir=ckdir,
                            verbose=True)
        # evaluate the best-val-F1 checkpoint, not the final epoch
        bp = _os.path.join(ckdir, "best_model.ckpt")
        if _os.path.exists(bp):
            trainer.load_checkpoint(bp)
        val_preds = trainer.predict(val_loader)
        auc = calculate_metrics(val_preds, val_labels,
                                threshold=0.5)["roc_auc"]
        restart_aucs.append(round(float(auc), 4))
        print(f"restart {r}: val AUC {auc:.4f}", flush=True)
        if best is None or auc > best[0]:
            best = (auc, trainer, res, val_preds)
    dt = time.time() - t0
    _, trainer, res, val_preds = best

    # decision threshold tuned on VAL F1 (the reference leaves four
    # inconsistent hardcoded thresholds around, B8; tuning on val is the
    # principled version), then applied to test
    ths = np.linspace(0.05, 0.95, 19)
    f1s = [calculate_metrics(val_preds, val_labels, threshold=t)["f1"]
           for t in ths]
    best_th = float(ths[int(np.argmax(f1s))])
    test_preds = trainer.predict(test_loader)
    test_labels = _labels_of(test_loader)
    test_metrics = calculate_metrics(test_preds, test_labels,
                                     threshold=best_th)
    test_metrics["threshold"] = best_th
    loss_only = trainer.test(test_loader)
    test_metrics["loss"] = loss_only.get("loss", float("nan"))

    out = {
        "config": f"users={N_USERS} items={N_ITEMS} events={N_EVENTS} "
                  f"snapshots={SNAPSHOTS} maxdeg=16 hidden=64",
        "sequences": len(ds),
        "padded_dims": {"T": Tm, "N": Nm, "E": Em},
        "train_events_per_epoch": ev_per_epoch,
        "epochs": EPOCHS,
        "restarts": RESTARTS,
        "restart_val_aucs": restart_aucs,
        "train_seconds": round(dt, 1),
        "events_per_sec_train": round(
            ev_per_epoch * EPOCHS * RESTARTS / dt, 0),
        "best_val_f1": round(res["best_metric"], 4),
        "test": {k: round(float(v), 4) for k, v in test_metrics.items()},
    }
    print(json.dumps(out))
    path = _os.path.join(_os.path.dirname(_os.path.abspath(__file__)),
                         "results_tgn.json")
    with open(path, "w") as f:
        json.dump(out, f, indent=1)


if __name__ == "__main__":
    main()
