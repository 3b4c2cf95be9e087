"""Dataset and loader for temporal graph sequences.

The reference imports ``TemporalGraphDataset`` / ``TemporalGraphDataLoader``
from a ``src/tagan/data`` package that does not exist in the repo (bug B1,
SURVEY.md §2.7); their contracts are reconstructed from the call sites
(`/root/reference/example.py:105-127`, `run_tagan_social_media.py:365`,
`training/trainer.py:295-300`) and implemented here TPU-first:

* ``TemporalGraphDataset`` — holds ragged sequences + labels;
  ``__getitem__`` -> (sequence, label); ``get_statistics()``.
* ``TemporalGraphDataLoader`` — batches sequences into **static-shape
  padded `SnapshotSequence` pytrees** (bucketed to the dataset's max
  dims so every batch compiles once), yields
  ``(SnapshotSequence batch, labels f32/i32[B])``.

Unlike a torch loader, batches here are jit-ready device arrays; the
loader pads the final partial batch to full size with a validity mask so
XLA sees one batch shape per epoch.
"""

from __future__ import annotations

from typing import Iterator, List, Optional, Sequence, Tuple

import jax.numpy as jnp
import numpy as np

from ..core.graph import (SnapshotSequence, batch_sequences, build_sequence,
                          pad_dims_for)


class TemporalGraphDataset:
    """Sequences + labels (reconstructed contract, example.py:105-107)."""

    def __init__(self, data: Sequence, labels: Optional[Sequence] = None):
        if labels is None:
            items = list(data)
            if items and isinstance(items[0], (tuple, list)) \
                    and len(items[0]) == 2 \
                    and not isinstance(items[0][1], (tuple, list)):
                # [(sequence, label)] pairs — a raw 2-snapshot sequence
                # would have a snapshot tuple in slot 1, not a scalar
                self.sequences = [s for s, _ in items]
                self.labels = [l for _, l in items]
            else:
                # unlabeled sequences (inference-only datasets fed to
                # TAGANTrainer.predict — labels are dummies, never read)
                self.sequences = items
                self.labels = [0.0] * len(items)
        else:
            self.sequences = list(data)
            self.labels = list(labels)
        assert len(self.sequences) == len(self.labels)

    def __len__(self) -> int:
        return len(self.sequences)

    def __getitem__(self, idx: int):
        return self.sequences[idx], self.labels[idx]

    def get_statistics(self) -> dict:
        """Dataset stats (run_tagan_social_media.py:107 contract)."""
        Tm, Nm, Em, Fe = pad_dims_for(self.sequences)
        num_steps = [len(s) for s in self.sequences]
        labels = np.asarray(self.labels, dtype=np.float64)
        return {
            "num_sequences": len(self.sequences),
            "max_time_steps": Tm,
            "mean_time_steps": float(np.mean(num_steps)) if num_steps else 0,
            "max_nodes": Nm,
            "max_edges": Em,
            "edge_feature_dim": Fe,
            "label_mean": float(labels.mean()) if len(labels) else 0.0,
            "label_counts": {float(v): int(c) for v, c in
                             zip(*np.unique(labels, return_counts=True))},
        }

    def split(self, fractions=(0.7, 0.15, 0.15), seed: int = 42):
        """70/15/15 split (preprocess_social_media.py:423-444 semantics)."""
        n = len(self)
        idx = np.random.default_rng(seed).permutation(n)
        n_train = int(fractions[0] * n)
        n_val = int(fractions[1] * n)
        parts = (idx[:n_train], idx[n_train:n_train + n_val],
                 idx[n_train + n_val:])
        return tuple(self.subset(part) for part in parts)

    def subset(self, indices) -> "TemporalGraphDataset":
        """New dataset holding the given sample indices."""
        return TemporalGraphDataset([self.sequences[i] for i in indices],
                                    [self.labels[i] for i in indices])

    def kfold(self, num_folds: int = 5, seed: int = 42):
        """Yield (train_dataset, val_dataset) pairs for k-fold
        cross-validation (the reference's ``TAGANExperimentConfig``
        declares ``num_folds`` at `config.py:386` but ships no CV loop —
        this is the working implementation)."""
        n = len(self)
        if num_folds < 2 or num_folds > n:
            raise ValueError(f"num_folds must be in [2, {n}], "
                             f"got {num_folds}")
        idx = np.random.default_rng(seed).permutation(n)
        folds = np.array_split(idx, num_folds)
        for f in range(num_folds):
            val_idx = folds[f]
            train_idx = np.concatenate(
                [folds[j] for j in range(num_folds) if j != f])
            yield self.subset(train_idx), self.subset(val_idx)


class TemporalGraphDataLoader:
    """Static-shape batching loader (reconstructed contract,
    example.py:111-127 / trainer.py:295-300).

    Yields (SnapshotSequence stacked batch, labels, sample_mask) where
    sample_mask marks real (non-pad) sequences in the final batch.

    ``num_buckets > 1`` groups sequences into size buckets by node count
    (each bucket padded to its own max dims), cutting padding waste on
    heterogeneous datasets at the cost of one XLA compile per distinct
    bucket shape. Batches never mix buckets.

    ``num_workers > 0`` builds upcoming batches on a thread pool with
    ``prefetch`` batches in flight (the reference experiment config
    declares ``num_workers`` at `config.py:390`; torch's loader would
    fork processes — here the hot packing loops run in the C++ packer
    outside the GIL, so threads overlap host packing with device
    compute). Batch order and contents are identical to the synchronous
    path.

    ``dense_adj=False`` skips packing the [T, N, N] adjacency per sample
    (large graphs: the dense tensor would dominate HBM and transfer; the
    flash/csr backends rebuild structure from the edge lists instead).
    """

    def __init__(self, dataset: TemporalGraphDataset, batch_size: int = 16,
                 shuffle: bool = False, seed: int = 0,
                 max_time: Optional[int] = None,
                 max_nodes: Optional[int] = None,
                 max_edges: Optional[int] = None,
                 edge_feature_dim: Optional[int] = None,
                 drop_remainder: bool = False,
                 num_buckets: int = 1,
                 num_workers: int = 0,
                 prefetch: int = 2,
                 reorder: Optional[str] = None,
                 dense_adj: bool = True,
                 plan: Optional[str] = None,
                 plan_kwargs: Optional[dict] = None):
        self.dataset = dataset
        self.batch_size = batch_size
        self.shuffle = shuffle
        self.seed = seed
        self.drop_remainder = drop_remainder
        Tm, Nm, Em, Fe = pad_dims_for(dataset.sequences) \
            if len(dataset) else (1, 1, 1, 0)
        self.max_time = max_time or Tm
        self.max_nodes = max_nodes or Nm
        self.max_edges = max_edges or max(Em, 1)
        self.edge_feature_dim = Fe if edge_feature_dim is None \
            else edge_feature_dim
        self._epoch = 0
        self._cache: List[Optional[SnapshotSequence]] = [None] * len(dataset)
        self.num_buckets = max(1, num_buckets)
        self.num_workers = max(0, num_workers)
        self.prefetch = max(1, prefetch)
        self.reorder = reorder   # 'rcm' = locality slot order (flash perf)
        # dense_adj=False skips the [T, N, N] adjacency per sample —
        # required for large graphs where it would blow HBM; with it the
        # flash backend's structure phase falls back to edge scatters
        self.dense_adj = dense_adj
        # plan="hybrid"/"ring": attach the spatial-backend plan at pack
        # time (host-side — plan building reads arrays back, so it runs
        # under the CPU device; a TPU-relay round trip costs ~60 s
        # where the CPU path costs ~0.1 s). Plans built per sequence
        # stack into batches via per-bucket PINNED static dims: the
        # first request in a bucket plans every member once to discover
        # the dims (and, for hybrid's compact residual, shared degree
        # caps), then re-plans pinned.
        if plan not in (None, "hybrid", "ring"):
            raise ValueError(f"unknown plan {plan!r} "
                             "(use 'hybrid' or 'ring')")
        self.plan = plan
        self.plan_kwargs = dict(plan_kwargs or {})
        self._plan_pin: dict = {}
        self._bucket_of, self._bucket_dims = self._assign_buckets()

    def _seq_node_count(self, i: int) -> int:
        ids = set()
        for s in self.dataset.sequences[i]:
            if isinstance(s, dict):
                ids.update(s["node_ids"])
            else:
                ids.update(s[3])
        return len(ids)

    def _assign_buckets(self):
        n = len(self.dataset)
        if self.num_buckets <= 1 or n == 0:
            return ([0] * n,
                    {0: (self.max_time, self.max_nodes, self.max_edges)})
        counts = np.asarray([self._seq_node_count(i) for i in range(n)])
        order = np.argsort(counts)
        bucket_of = [0] * n
        dims = {}
        per = (n + self.num_buckets - 1) // self.num_buckets
        for b in range(self.num_buckets):
            members = order[b * per:(b + 1) * per]
            if len(members) == 0:
                continue
            sub = [self.dataset.sequences[int(i)] for i in members]
            Tm, Nm, Em, _ = pad_dims_for(sub)
            dims[b] = (min(Tm, self.max_time) if self.max_time else Tm,
                       Nm, max(Em, 1))
            for i in members:
                bucket_of[int(i)] = b
        return bucket_of, dims

    def _base_built(self, i: int) -> SnapshotSequence:
        Tm, Nm, Em = self._bucket_dims[self._bucket_of[i]]
        return build_sequence(
            self.dataset.sequences[i], max_nodes=Nm,
            max_edges=Em, max_time=Tm,
            edge_feature_dim=self.edge_feature_dim,
            reorder=self.reorder, dense_adj=self.dense_adj)

    def _ensure_bucket_plans(self, b: int):
        """Plan every member of bucket ``b`` with SHARED static dims
        (two planning passes; host-side under the CPU device)."""
        import jax
        from ..core.graph import (attach_hybrid_plans, merge_ring_dims,
                                  ring_plan_dims)
        members = [i for i in range(len(self.dataset))
                   if self._bucket_of[i] == b]
        cpu = jax.devices("cpu")[0]
        with jax.default_device(cpu):
            bases = {i: self._base_built(i) for i in members}
            if self.plan == "ring":
                planned = {i: s.with_ring_plan(**self.plan_kwargs)
                           for i, s in bases.items()}
                pin = merge_ring_dims(
                    [ring_plan_dims(s) for s in planned.values()])
                self._plan_pin[b] = pin
                kw = {k: v for k, v in self.plan_kwargs.items()
                      if k not in ("max_edges_per_bucket",
                                   "max_boundary", "local_block_m",
                                   "local_block_n")}
                for i in members:
                    self._cache[i] = bases[i].with_ring_plan(
                        pin=pin, **kw)
                return
            planned, pin = attach_hybrid_plans(
                [bases[i] for i in members], **self.plan_kwargs)
            self._plan_pin[b] = pin
            for i, s in zip(members, planned):
                self._cache[i] = s

    def _built(self, i: int) -> SnapshotSequence:
        if self._cache[i] is None:
            if self.plan is not None:
                self._ensure_bucket_plans(self._bucket_of[i])
            else:
                self._cache[i] = self._base_built(i)
        return self._cache[i]

    def __len__(self) -> int:
        total = 0
        for b in self._bucket_dims:
            n = sum(1 for x in self._bucket_of if x == b)
            if self.drop_remainder:
                total += n // self.batch_size
            else:
                total += (n + self.batch_size - 1) // self.batch_size
        return total

    def __iter__(self) -> Iterator[Tuple[SnapshotSequence, jnp.ndarray,
                                         jnp.ndarray]]:
        n = len(self.dataset)
        rng = np.random.default_rng(self.seed + self._epoch)
        self._epoch += 1
        bs = self.batch_size
        labels_np = np.asarray(self.dataset.labels)
        label_dtype = jnp.int32 if np.issubdtype(labels_np.dtype,
                                                 np.integer) else jnp.float32

        batches = []
        for b in self._bucket_dims:
            members = np.asarray([i for i in range(n)
                                  if self._bucket_of[i] == b])
            if self.shuffle:
                members = rng.permutation(members)
            for start in range(0, len(members), bs):
                idx = members[start:start + bs]
                if len(idx) < bs:
                    if self.drop_remainder:
                        continue
                    idx_full = np.concatenate(
                        [idx, np.repeat(idx[-1:], bs - len(idx))])
                    mask = np.zeros(bs, bool)
                    mask[: len(idx)] = True
                else:
                    idx_full = idx
                    mask = np.ones(bs, bool)
                batches.append((idx_full, mask))
        if self.shuffle:
            rng.shuffle(batches)

        def make(idx_full, mask):
            seqs = [self._built(int(i)) for i in idx_full]
            batch = batch_sequences(seqs)
            labels = jnp.asarray(labels_np[idx_full], dtype=label_dtype)
            return batch, labels, jnp.asarray(mask)

        if self.num_workers <= 0:
            for idx_full, mask in batches:
                yield make(idx_full, mask)
            return

        # prefetching path: up to `prefetch` batches in flight, yielded
        # in order
        from collections import deque
        from concurrent.futures import ThreadPoolExecutor
        with ThreadPoolExecutor(self.num_workers) as ex:
            pending = deque()
            it = iter(batches)
            for nb in (next(it, None) for _ in range(self.prefetch)):
                if nb is None:
                    break
                pending.append(ex.submit(make, *nb))
            while pending:
                fut = pending.popleft()
                nb = next(it, None)
                if nb is not None:
                    pending.append(ex.submit(make, *nb))
                yield fut.result()
