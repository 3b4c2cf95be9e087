"""TGN-style temporal interaction graph training.

BASELINE config 4: a Wikipedia/Reddit-shaped bipartite interaction
stream (load a real JODIE CSV with --csv, or generate a synthetic one),
sliced into snapshot sequences with recency neighbor sampling, trained
for window-level state-change detection.

Usage:
  python examples/run_tgn.py [--csv wikipedia.csv] [--events 50000] [--cpu]
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--csv", default=None,
                    help="JODIE-format CSV (user,item,ts,label,feats...)")
    ap.add_argument("--events", type=int, default=20000)
    ap.add_argument("--epochs", type=int, default=5)
    ap.add_argument("--snapshots", type=int, default=8)
    ap.add_argument("--max-degree", type=int, default=16)
    ap.add_argument("--cpu", action="store_true")
    args = ap.parse_args()

    import jax
    if args.cpu:
        jax.config.update("jax_platforms", "cpu")

    import numpy as np
    import tagan_tpu as tt
    from tagan_tpu.data import (TemporalGraphDataLoader, create_tgn_synthetic,
                                load_jodie_csv, stream_to_sequences)
    from tagan_tpu.nn.model import TAGAN
    from tagan_tpu.train import TAGANTrainer

    if args.csv:
        print(f"loading {args.csv}...")
        stream = load_jodie_csv(args.csv)
    else:
        print("generating synthetic interaction stream...")
        stream = create_tgn_synthetic(num_users=600, num_items=300,
                                      num_events=args.events, seed=0)
    print(f"  {stream.num_events} events over {stream.num_nodes} nodes")

    ds = stream_to_sequences(stream, num_snapshots=args.snapshots,
                             max_degree=args.max_degree)
    print(f"  {len(ds)} sequences; labels mean "
          f"{np.mean(ds.labels):.3f}")
    if len(ds) < 6:
        print("not enough sequences — increase --events")
        return
    train_ds, val_ds, test_ds = ds.split((0.7, 0.15, 0.15), seed=0)

    dims = tt.pad_dims_for(ds.sequences)
    kw = dict(max_time=dims[0], max_nodes=dims[1],
              max_edges=max(dims[2], 1))
    Fn = ds.sequences[0][0]["x"].shape[1]
    Fe = dims[3]
    cfg = tt.TAGANConfig(hidden_dim=64, num_heads=4, num_layers=2,
                         node_feature_dim=Fn, edge_feature_dim=Fe,
                         use_edge_features=Fe > 0, output_dim=1,
                         loss_type="bce", dropout=0.1)
    model = TAGAN(cfg)
    exp = tt.ExperimentConfig(model=cfg, batch_size=8,
                              num_epochs=args.epochs,
                              early_stopping_patience=4)
    trainer = TAGANTrainer(model, exp)
    train_loader = TemporalGraphDataLoader(train_ds, batch_size=8,
                                           shuffle=True, **kw)
    val_loader = TemporalGraphDataLoader(val_ds, batch_size=8, **kw) \
        if len(val_ds) else None
    trainer.train(train_loader, val_loader, verbose=True)
    if len(test_ds):
        metrics = trainer.test(
            TemporalGraphDataLoader(test_ds, batch_size=8, **kw))
        print("test metrics:", {k: round(v, 4)
                                for k, v in metrics.items()
                                if isinstance(v, float)})


if __name__ == "__main__":
    main()
