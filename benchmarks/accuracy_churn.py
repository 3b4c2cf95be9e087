"""Accuracy case for the intended pipeline (VERDICT round-1 item 5).

Task: `create_order_churn_data` — the label lives in TEMPORAL ORDER
(+signal then -signal on feature 0, vs the reverse) under node churn;
the time-mean of the signal is ~0, so a pipeline without temporal
structure has no first-order signal. The intended pipeline (temporal
propagation + memory bank + time-aware causal attention) is compared
against compat_mode="executed" (the reference's actually-executed path:
propagation bypassed, un-timed attention, view-scramble pooling) over
>=10 seeds with a >=250-sequence eval split.

    python benchmarks/accuracy_churn.py [quick]

Reports mean accuracy / ROC-AUC with 95% t-CIs per pipeline and dumps
results_churn.json. CPU-friendly (small graphs).
"""
import os as _os, sys as _sys
_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))

import json
import sys
import time

import numpy as np


def run_one(pipeline: str, seed: int, n_train: int, n_eval: int,
            epochs: int):
    import jax
    jax.config.update("jax_platforms", "cpu")   # leave the TPU free
    import tagan_tpu as tt
    from tagan_tpu.data.dataset import (TemporalGraphDataLoader,
                                        TemporalGraphDataset,
                                        pad_dims_for)
    from tagan_tpu.data.synthetic import create_order_churn_data
    from tagan_tpu.train.trainer import TAGANTrainer

    data = create_order_churn_data(
        num_samples=n_train + n_eval, sequence_length=8, signal=1.0,
        node_feature_dim=10, seed=1000 + seed)
    train = TemporalGraphDataset(data[:n_train])
    evald = TemporalGraphDataset(data[n_train:])
    Tm, Nm, Em, Fe = pad_dims_for([s for s, _ in data])
    kw = dict(max_time=Tm, max_nodes=Nm, max_edges=max(Em, 1),
              edge_feature_dim=Fe, batch_size=16)

    cfg = tt.TAGANConfig(
        hidden_dim=32, num_heads=4, num_layers=1, node_feature_dim=10,
        output_dim=1, loss_type="bce", dropout=0.0, learning_rate=3e-3,
        pooling_type="last", compat_mode=pipeline)
    exp = tt.ExperimentConfig(model=cfg, batch_size=16,
                              num_epochs=epochs, checkpoint_dir="",
                              early_stopping_patience=epochs + 1,
                              seed=seed, fused_epochs=True)
    trainer = TAGANTrainer(tt.TAGAN(cfg), exp,
                           rng=jax.random.key(seed))
    train_loader = TemporalGraphDataLoader(train, shuffle=True,
                                           seed=seed, **kw)
    eval_loader = TemporalGraphDataLoader(evald, **kw)
    trainer.train(train_loader, num_epochs=epochs, checkpoint_dir="",
                  verbose=False)
    m = trainer.evaluate(eval_loader)
    return float(m.get("accuracy", 0.0)), float(m.get("roc_auc", 0.5))


def ci95(vals):
    v = np.asarray(vals, np.float64)
    n = len(v)
    # t multiplier for 95% two-sided (df = n-1); table for small n
    ttab = {4: 3.182, 5: 2.776, 7: 2.447, 9: 2.306, 10: 2.262, 11: 2.228,
            14: 2.145, 19: 2.093}
    t = ttab.get(n - 1, 2.0 if n > 20 else 2.262)
    half = t * v.std(ddof=1) / np.sqrt(n)
    return float(v.mean()), float(half)


def main():
    quick = len(sys.argv) > 1 and sys.argv[1] == "quick"
    seeds = range(2) if quick else range(10)
    n_train, n_eval, epochs = (40, 32, 2) if quick else (300, 256, 8)

    results = {}
    for pipeline in ("intended", "executed"):
        accs, aucs = [], []
        for s in seeds:
            t0 = time.time()
            acc, auc = run_one(pipeline, s, n_train, n_eval, epochs)
            accs.append(acc)
            aucs.append(auc)
            print(f"{pipeline} seed {s}: acc={acc:.3f} auc={auc:.3f} "
                  f"[{time.time() - t0:.0f}s]", flush=True)
        am, ah = ci95(accs)
        um, uh = ci95(aucs)
        results[pipeline] = {
            "acc_mean": round(am, 4), "acc_ci95": round(ah, 4),
            "auc_mean": round(um, 4), "auc_ci95": round(uh, 4),
            "accs": [round(a, 4) for a in accs],
            "aucs": [round(a, 4) for a in aucs]}
        print(f"== {pipeline}: acc {am:.3f} +- {ah:.3f}, "
              f"auc {um:.3f} +- {uh:.3f}", flush=True)

    gap = results["intended"]["acc_mean"] - results["executed"]["acc_mean"]
    sep = gap - (results["intended"]["acc_ci95"]
                 + results["executed"]["acc_ci95"])
    out = {"task": "order-churn (signal +s then -s vs -s then +s, "
                   "churn 0.3/0.5, pooling=last)",
           "n_seeds": len(list(seeds)), "n_eval": n_eval,
           "results": results,
           "acc_gap_intended_minus_executed": round(gap, 4),
           "ci_separated": bool(sep > 0)}
    print(json.dumps(out))
    path = _os.path.join(_os.path.dirname(_os.path.abspath(__file__)),
                         "results_churn.json")
    with open(path, "w") as f:
        json.dump(out, f, indent=1)


if __name__ == "__main__":
    main()
