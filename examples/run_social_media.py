"""Social-media controversial-thread detection pipeline.

Working equivalent of the reference's `run_tagan_social_media.py`
(unrunnable there — missing data package, SURVEY.md B1): generate
synthetic conversation threads, build temporal reply graphs, train a
TAGAN classifier on the controversial label, and visualize attention.

Usage:  python examples/run_social_media.py [--threads N] [--cpu]
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--threads", type=int, default=60)
    ap.add_argument("--users", type=int, default=40)
    ap.add_argument("--epochs", type=int, default=10)
    ap.add_argument("--cpu", action="store_true")
    ap.add_argument("--outdir", default="social_outputs")
    args = ap.parse_args()

    import jax
    if args.cpu:
        jax.config.update("jax_platforms", "cpu")

    import numpy as np
    import tagan_tpu as tt
    from tagan_tpu.data import (SocialMediaDataGenerator,
                                SocialMediaGraphProcessor,
                                TemporalGraphDataLoader)
    from tagan_tpu.nn.model import TAGAN
    from tagan_tpu.train import TAGANTrainer
    from tagan_tpu.viz import plot_training_history, plot_roc_curve

    os.makedirs(args.outdir, exist_ok=True)

    # 1. generate conversation threads
    print("generating threads...")
    gen = SocialMediaDataGenerator(num_users=args.users,
                                   num_threads=args.threads, seed=0)
    posts = gen.generate_data()
    print("  stats:", gen.analyze_data(posts))

    # 2. preprocess: text embeddings + temporal reply graphs
    print("preprocessing...")
    proc = SocialMediaGraphProcessor()
    train_ds, val_ds, test_ds = proc.process_data(posts, gen.users)
    print(f"  train={len(train_ds)} val={len(val_ds)} test={len(test_ds)}"
          f"  node_feature_dim={proc.node_feature_dim}")

    # 3. model
    cfg = tt.TAGANConfig(hidden_dim=64, num_heads=4, num_layers=2,
                         node_feature_dim=proc.node_feature_dim,
                         output_dim=1, loss_type="bce", dropout=0.1,
                         learning_rate=1e-3)
    model = TAGAN(cfg)
    exp = tt.ExperimentConfig(model=cfg, batch_size=8,
                              num_epochs=args.epochs,
                              early_stopping_patience=5)
    trainer = TAGANTrainer(model, exp)

    all_seqs = (train_ds.sequences + val_ds.sequences + test_ds.sequences)
    dims = tt.pad_dims_for(all_seqs)
    kw = dict(max_time=dims[0], max_nodes=dims[1],
              max_edges=max(dims[2], 1))
    train_loader = TemporalGraphDataLoader(train_ds, batch_size=8,
                                           shuffle=True, **kw)
    val_loader = TemporalGraphDataLoader(val_ds, batch_size=8, **kw) \
        if len(val_ds) else None
    test_loader = TemporalGraphDataLoader(test_ds, batch_size=8, **kw)

    # 4. train + evaluate
    result = trainer.train(train_loader, val_loader, verbose=True)
    metrics = trainer.test(test_loader)
    print("test metrics:", {k: round(v, 4) for k, v in metrics.items()
                            if isinstance(v, float)})

    # 5. plots
    plot_training_history(result["history"],
                          save_path=os.path.join(args.outdir,
                                                 "history.png"))
    preds = trainer.predict(test_loader).reshape(-1)
    labels = np.asarray(test_ds.labels)
    if len(set(labels.tolist())) > 1:
        plot_roc_curve(labels, preds,
                       save_path=os.path.join(args.outdir, "roc.png"))
    print(f"outputs in {args.outdir}/")


if __name__ == "__main__":
    main()
