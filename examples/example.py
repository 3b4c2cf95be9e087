"""End-to-end TAGAN-TPU demo on synthetic temporal graphs.

The working equivalent of the reference's `example.py` (which cannot run
— it imports the missing data package, SURVEY.md B1): generate synthetic
sequences, train with early stopping, evaluate, and visualize attention.

Usage:  python examples/example.py [--epochs N] [--cpu]
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--epochs", type=int, default=10)
    ap.add_argument("--samples", type=int, default=60)
    ap.add_argument("--cpu", action="store_true",
                    help="force the CPU backend")
    ap.add_argument("--outdir", default="example_outputs")
    args = ap.parse_args()

    import jax
    if args.cpu:
        jax.config.update("jax_platforms", "cpu")

    import numpy as np
    import tagan_tpu as tt
    from tagan_tpu.data import (TemporalGraphDataset,
                                TemporalGraphDataLoader,
                                create_synthetic_data)
    from tagan_tpu.nn.model import TAGAN
    from tagan_tpu.train import TAGANTrainer
    from tagan_tpu.viz import (plot_training_history,
                               plot_temporal_graph_attention,
                               plot_confusion_matrix)

    os.makedirs(args.outdir, exist_ok=True)

    # 1. data — the reference example's config (example.py:131-159):
    # ~100-node graphs, 16-d node features, binary labels
    print("generating synthetic data...")
    data = create_synthetic_data(
        num_samples=args.samples, num_nodes_range=(20, 40),
        node_feature_dim=16, edge_feature_dim=0, sequence_length=6,
        num_classes=2, balanced=True, seed=0)
    dataset = TemporalGraphDataset(data)
    train_ds, val_ds, test_ds = dataset.split((0.7, 0.15, 0.15), seed=0)
    print(f"  train={len(train_ds)} val={len(val_ds)} test={len(test_ds)}")

    # 2. model + trainer
    cfg = tt.TAGANConfig(hidden_dim=64, num_heads=4, num_layers=2,
                         node_feature_dim=16, edge_feature_dim=0,
                         output_dim=1, loss_type="bce", dropout=0.1,
                         learning_rate=1e-3)
    model = TAGAN(cfg)
    exp = tt.ExperimentConfig(model=cfg, batch_size=8,
                              num_epochs=args.epochs,
                              early_stopping_patience=5,
                              checkpoint_dir=os.path.join(args.outdir,
                                                          "ckpts"))
    trainer = TAGANTrainer(model, exp)

    dims = tt.pad_dims_for(dataset.sequences)
    loader_kw = dict(max_time=dims[0], max_nodes=dims[1],
                     max_edges=max(dims[2], 1))
    train_loader = TemporalGraphDataLoader(train_ds, batch_size=8,
                                           shuffle=True, **loader_kw)
    val_loader = TemporalGraphDataLoader(val_ds, batch_size=8, **loader_kw)
    test_loader = TemporalGraphDataLoader(test_ds, batch_size=8,
                                          **loader_kw)

    # 3. train
    print("training...")
    result = trainer.train(train_loader, val_loader, verbose=True)

    # 4. evaluate
    test_metrics = trainer.test(test_loader)
    print("test metrics:", {k: round(v, 4)
                            for k, v in test_metrics.items()
                            if isinstance(v, float)})

    # 5. visualize
    plot_training_history(result["history"],
                          save_path=os.path.join(args.outdir,
                                                 "history.png"))
    preds = trainer.predict(test_loader)
    labels = np.asarray(test_ds.labels)
    plot_confusion_matrix(labels, (preds.reshape(-1) > 0.5).astype(int),
                          save_path=os.path.join(args.outdir, "cm.png"))

    seq = tt.build_sequence(test_ds.sequences[0], max_nodes=dims[1],
                            max_edges=max(dims[2], 1), max_time=dims[0])
    inf = model.infer_with_attention(trainer.params, seq)
    w = np.asarray(inf["temporal_attention_weights"])
    plot_temporal_graph_attention(
        w, save_path=os.path.join(args.outdir, "temporal_attention.png"))
    print(f"plots written to {args.outdir}/")


if __name__ == "__main__":
    main()
