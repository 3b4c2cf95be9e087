"""Multi-chip TAGAN-TPU training demo (SPMD over a data×graph mesh).

The reference has no distributed code of any kind (SURVEY.md §2.9); this
is the TPU-native scaling story: pick a mesh, hand it to the trainer,
GSPMD inserts the collectives. On a machine without a TPU slice, run
with virtual devices:

  python examples/run_distributed.py --virtual 8 --data 2 --graph 4

On a real slice, drop --virtual and set data×graph = number of chips.
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--virtual", type=int, default=0,
                    help="force N virtual CPU devices (testing without a slice)")
    ap.add_argument("--data", type=int, default=2, help="data-parallel axis")
    ap.add_argument("--graph", type=int, default=4, help="graph-partition axis")
    ap.add_argument("--epochs", type=int, default=6)
    ap.add_argument("--samples", type=int, default=32)
    args = ap.parse_args()

    if args.virtual:
        os.environ["XLA_FLAGS"] = (
            os.environ.get("XLA_FLAGS", "")
            + f" --xla_force_host_platform_device_count={args.virtual}")
    import jax
    if args.virtual:
        jax.config.update("jax_platforms", "cpu")

    import tagan_tpu as tt
    from tagan_tpu.data import TemporalGraphDataset, TemporalGraphDataLoader
    from tagan_tpu.data.synthetic import create_synthetic_data
    from tagan_tpu.dist import make_mesh
    from tagan_tpu.train import TAGANTrainer

    print(f"devices: {len(jax.devices())} "
          f"-> mesh(data={args.data}, graph={args.graph})")
    mesh = make_mesh(data=args.data, graph=args.graph)

    data = create_synthetic_data(
        num_samples=args.samples, num_nodes_range=(8, 12),
        node_feature_dim=16, edge_feature_dim=0, sequence_length=6,
        balanced=True, seed=0)
    ds = TemporalGraphDataset(data)
    train_ds, val_ds, _ = ds.split((0.75, 0.25, 0.0))

    cfg = tt.TAGANConfig(hidden_dim=32, num_heads=4, num_layers=2,
                         node_feature_dim=16, edge_feature_dim=0,
                         output_dim=1, loss_type="bce", dropout=0.0,
                         learning_rate=5e-3)
    exp = tt.ExperimentConfig(model=cfg, batch_size=8,
                              num_epochs=args.epochs, fused_epochs=True)
    model = tt.TAGAN(cfg)
    trainer = TAGANTrainer(model, exp, mesh=mesh)

    train_loader = TemporalGraphDataLoader(train_ds, batch_size=8,
                                           shuffle=True)
    val_loader = TemporalGraphDataLoader(val_ds, batch_size=8)
    res = trainer.train(train_loader, val_loader, checkpoint_dir="",
                        verbose=True)
    print(f"best val {exp.early_stopping_metric}: "
          f"{res['best_metric']:.3f} @ epoch {res['best_epoch']}")


if __name__ == "__main__":
    main()
