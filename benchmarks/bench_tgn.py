"""BASELINE config 4: TGN-style temporal interaction graph at
Wikipedia/Reddit scale (~10K nodes, ~600K temporal events) with recency
neighbor sampling per snapshot — training throughput + accuracy on the
state-change prediction task, single chip.

    python benchmarks/bench_tgn.py [quick]

Stream -> sliding-window sequences via data.tgn (the loader BASELINE
names); label = whether the window contains a churn burst. Round 4
(VERDICT r3 weak #3): the needle result is now a STATISTIC — >=5
independent data seeds x n>=200 test windows per seed, mean +- 95%
t-CI for AUC/F1/specificity, with the node_pooling="logit" MIL readout
(the which-node-fired capability) as a compared variant at full scale.
Dumps results_tgn.json with per-seed rows + the CI table.
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
    EPOCHS, SNAPSHOTS, SEEDS, RESTARTS = 2, 6, 2, 1
    POOLINGS = ("max",)
else:
    N_USERS, N_ITEMS, N_EVENTS = 9_000, 4_000, 600_000
    EPOCHS, SNAPSHOTS, SEEDS, RESTARTS = 16, 8, 5, 2
    POOLINGS = ("max", "logit")

# calibration overrides (difficulty dials live in run_one)
SEEDS = int(_os.environ.get("TGN_CAL_SEEDS", SEEDS))
if _os.environ.get("TGN_CAL_POOL"):
    POOLINGS = tuple(_os.environ["TGN_CAL_POOL"].split(","))


def run_one(data_seed, pooling, dims=None):
    """One full train/eval at one data seed + pooling: build the
    stream, train RESTARTS val-AUC-picked restarts, tune the threshold
    on val, report test metrics. `dims` pins padded (T, N, E) across
    seeds so every run reuses one compiled step."""
    import tempfile
    from tagan_tpu.train.metrics import calculate_metrics
    t0 = time.time()
    # Round 5 (VERDICT r4 weak #4): the task is RE-ARMED off the
    # ceiling — round 4's AUC 1.0000 +- 0.0001 could neither catch
    # regressions nor rank readouts. Difficulty dials: weaker feature
    # signature, an equal population of DECOY bursts (same activity
    # spike, unshifted features, label 0 — kills the pure-activity
    # shortcut), and 7% per-burst label noise (irreducible error).
    shift = float(_os.environ.get("TGN_SHIFT", "1.0"))
    decoys = int(_os.environ.get("TGN_DECOYS",
                                 "90" if not QUICK else "12"))
    lnoise = float(_os.environ.get("TGN_LNOISE", "0.07"))
    stream = create_tgn_synthetic(
        num_users=N_USERS, num_items=N_ITEMS, num_events=N_EVENTS,
        time_span=1e6, edge_feat_dim=4, state_change_rate=0.0,
        num_churn_bursts=90 if not QUICK else 12,
        burst_len=48, burst_span=1e6 / 400.0, burst_feat_shift=shift,
        num_decoy_bursts=decoys, decoy_feat_shift=0.0,
        burst_label_noise=lnoise, seed=data_seed)
    span = 1e6 / 200.0
    # quarter-span stride -> ~800 windows: test split n >= 200
    ds = stream_to_sequences(stream, num_snapshots=SNAPSHOTS,
                             seq_span=span, stride=span / 4,
                             max_degree=16, node_feature_dim=8)
    train_ds, val_ds, test_ds = ds.split((0.6, 0.1, 0.3),
                                         seed=data_seed)
    Tm, Nm, Em, Fe = pad_dims_for(ds.sequences)
    if dims is not None:
        Tm = max(Tm, dims[0])
        Nm = max(Nm, dims[1])
        Em = max(Em, dims[2])
    # bucket to 64 so every seed compiles the same shapes
    Nm = -(-Nm // 64) * 64
    Em = -(-max(Em, 1) // 64) * 64
    kw = dict(max_time=Tm, max_nodes=Nm, max_edges=Em,
              edge_feature_dim=Fe, batch_size=8)
    backend = _os.environ.get("BACKEND", "csr")
    cfg = tt.TAGANConfig(
        hidden_dim=64, num_heads=4, num_layers=2, node_feature_dim=8,
        edge_feature_dim=Fe, use_edge_features=Fe > 0, output_dim=1,
        loss_type="bce", dropout=0.0, learning_rate=3e-3,
        node_pooling=pooling, spatial_backend=backend)
    train_loader = TemporalGraphDataLoader(train_ds, shuffle=True,
                                           seed=data_seed, **kw)
    val_loader = TemporalGraphDataLoader(val_ds, **kw)
    test_loader = TemporalGraphDataLoader(test_ds, **kw)

    def _labels_of(loader):
        out = []
        for item in loader:
            out.append(np.asarray(item[1])[np.asarray(item[-1])])
        return np.concatenate(out)

    val_labels = _labels_of(val_loader)
    ev_per_epoch = sum(
        int(np.asarray(s.edge_mask).sum()) for s in (
            tt.build_sequence(x, max_nodes=Nm, max_edges=Em,
                              max_time=Tm, edge_feature_dim=Fe)
            for x in train_ds.sequences))
    best = None
    restart_aucs = []
    for r in range(RESTARTS):
        exp = tt.ExperimentConfig(model=cfg, batch_size=8,
                                  num_epochs=EPOCHS, checkpoint_dir="",
                                  early_stopping_patience=EPOCHS + 1,
                                  seed=data_seed * 10 + r)
        trainer = TAGANTrainer(tt.TAGAN(cfg), exp)
        ckdir = tempfile.mkdtemp(prefix=f"tgn_s{data_seed}r{r}_")
        trainer.train(train_loader, val_loader, num_epochs=EPOCHS,
                      checkpoint_dir=ckdir, verbose=False)
        bp = _os.path.join(ckdir, "best_model.ckpt")
        if _os.path.exists(bp):
            trainer.load_checkpoint(bp)
        val_preds = trainer.predict(val_loader)
        auc = calculate_metrics(val_preds, val_labels,
                                threshold=0.5)["roc_auc"]
        restart_aucs.append(round(float(auc), 4))
        if best is None or auc > best[0]:
            best = (auc, trainer, val_preds)
    _, trainer, val_preds = best
    ths = np.linspace(0.05, 0.95, 19)
    f1s = [calculate_metrics(val_preds, val_labels, threshold=t)["f1"]
           for t in ths]
    best_th = float(ths[int(np.argmax(f1s))])
    test_preds = trainer.predict(test_loader)
    test_labels = _labels_of(test_loader)
    tm = calculate_metrics(test_preds, test_labels, threshold=best_th)
    dt = time.time() - t0
    row = {
        "data_seed": data_seed, "pooling": pooling,
        "n_test": int(len(test_labels)),
        "restart_val_aucs": restart_aucs,
        "threshold": best_th,
        "padded_dims": {"T": Tm, "N": Nm, "E": Em},
        "train_events_per_epoch": ev_per_epoch,
        "wall_seconds": round(dt, 1),
        "events_per_sec_train": round(
            ev_per_epoch * EPOCHS * RESTARTS / dt, 0),
        "test": {k: round(float(v), 4) for k, v in tm.items()},
    }
    print(json.dumps(row), flush=True)
    return row, (Tm, Nm, Em)


def _ci(vals):
    """mean +- 95% t-CI half width."""
    v = np.asarray(vals, np.float64)
    n = len(v)
    if n < 2:
        return float(v.mean()), 0.0
    tcrit = {2: 12.71, 3: 4.303, 4: 3.182, 5: 2.776,
             6: 2.571}.get(n - 1, 2.0)
    return float(v.mean()), float(tcrit * v.std(ddof=1) / np.sqrt(n))


def main():
    rows = []
    dims = None
    for pooling in POOLINGS:
        for ds_seed in range(SEEDS):
            row, d = run_one(ds_seed, pooling, dims=dims)
            dims = d if dims is None else tuple(
                max(a, b) for a, b in zip(dims, d))
            rows.append(row)
    summary = {}
    for pooling in POOLINGS:
        sel = [r for r in rows if r["pooling"] == pooling]
        summary[pooling] = {
            "seeds": len(sel),
            "n_test_total": sum(r["n_test"] for r in sel),
        }
        for m in ("roc_auc", "f1", "specificity", "accuracy",
                  "average_precision"):
            mean, half = _ci([r["test"][m] for r in sel])
            summary[pooling][m] = {"mean": round(mean, 4),
                                   "ci95": round(half, 4)}
    out = {
        "config": f"users={N_USERS} items={N_ITEMS} events={N_EVENTS} "
                  f"snapshots={SNAPSHOTS} maxdeg=16 hidden=64 "
                  f"epochs={EPOCHS} restarts={RESTARTS} "
                  f"shift={_os.environ.get('TGN_SHIFT', '1.0')} "
                  f"decoys={_os.environ.get('TGN_DECOYS', '90')} "
                  f"label_noise={_os.environ.get('TGN_LNOISE', '0.07')}",
        "methodology": "per seed: independent stream + window split "
                       "(train 60% / val 10% / test 30%, n_test>=200), "
                       "RESTARTS restarts picked by val ROC-AUC, "
                       "decision threshold tuned on val F1, test held "
                       "out; mean +- 95% t-CI across data seeds",
        "per_seed": rows,
        "summary": summary,
    }
    print(json.dumps(out["summary"]))
    path = _os.path.join(_os.path.dirname(_os.path.abspath(__file__)),
                         "results_tgn.json")
    with open(path, "w") as f:
        json.dump(out, f, indent=1)


if __name__ == "__main__":
    main()
