"""Host-side data loaders producing fixed-shape padded batches.

Replaces torch DataLoader + DistributedSampler (reference
pointcept/datasets/dataloader.py:23-112): samples are prepared by a thread
pool, collated into padded [B, N, ...] numpy batches, and (optionally)
interleaved across sub-datasets by their loop ratios like the reference
MultiDatasetDataloader. Device placement/sharding happens in the trainer via
parallel.mesh.shard_batch.
"""

from __future__ import annotations

import queue
import threading
from concurrent.futures import ThreadPoolExecutor
from typing import Dict, Iterator, List, Optional, Sequence

import numpy as np

from .collate import collate_padded
from .transforms import seed_transforms


class Loader:
    """Epoch-based shuffling loader over one dataset."""

    def __init__(
        self,
        dataset,
        batch_size: int,
        num_points: int,
        mix_prob: float = 0.0,
        shuffle: bool = True,
        seed: int = 0,
        num_workers: int = 4,
        drop_last: bool = True,
        collate_fn=None,
        process_index: Optional[int] = None,
        process_count: Optional[int] = None,
    ):
        self.dataset = dataset
        self.batch_size = batch_size
        self.num_points = num_points
        self.mix_prob = mix_prob
        self.shuffle = shuffle
        self.seed = seed
        self.num_workers = max(1, num_workers)
        self.drop_last = drop_last
        self.collate_fn = collate_fn
        self.epoch = 0
        # Multi-host: batch_size is GLOBAL; every process computes the same
        # shuffled index order and fetches only its contiguous row block
        # (parallel/mesh.py:local_batch_slice — reference DistributedSampler
        # semantics, each rank loads 1/world_size of every batch). Defaults
        # resolve from the jax runtime at iteration time; explicit args make
        # the slicing unit-testable without a multi-process run.
        self._process_index = process_index
        self._process_count = process_count
        # Mix3D consumes two source samples per batch slot (see collate)
        self.samples_per_batch = batch_size * (2 if mix_prob > 0 else 1)

    def _process_rank(self):
        if self._process_count is not None:
            return self._process_index or 0, self._process_count
        try:
            import jax

            return jax.process_index(), jax.process_count()
        except Exception:
            return 0, 1

    def set_epoch(self, epoch: int):
        self.epoch = epoch

    def __len__(self):
        n = len(self.dataset)
        spb = self.samples_per_batch
        return n // spb if self.drop_last else -(-n // spb)

    def _index_order(self) -> np.ndarray:
        idx = np.arange(len(self.dataset))
        if self.shuffle:
            rng = np.random.default_rng(self.seed + self.epoch)
            rng.shuffle(idx)
        return idx

    def _fetch(self, i: int):
        # per-sample thread-local seeding: augmentation draws are a pure
        # function of (seed, epoch, sample index), independent of worker
        # count / thread scheduling (the reference gets this from
        # per-process workers + worker_init_fn, engines/defaults.py:142-152)
        seed_transforms((self.seed, self.epoch, i, 0))
        return self.dataset[i]

    def __iter__(self) -> Iterator[Dict[str, np.ndarray]]:
        order = self._index_order()
        nb = len(self)
        pid, pc = self._process_rank()
        spb = self.samples_per_batch
        if pc > 1:
            assert spb % pc == 0, (
                f"global batch of {spb} samples must divide {pc} processes"
            )
            assert self.drop_last, (
                "multi-host training requires drop_last (a short final batch "
                "cannot split evenly across processes)"
            )
        local_spb = spb // pc
        with ThreadPoolExecutor(self.num_workers) as pool:
            pending = queue.Queue()

            def submit(bi):
                batch_idx = order[bi * spb : (bi + 1) * spb]
                batch_idx = batch_idx[pid * local_spb : (pid + 1) * local_spb]
                futures = [pool.submit(self._fetch, int(i)) for i in batch_idx]
                pending.put(futures)

            ahead = min(2, nb)
            for bi in range(ahead):
                submit(bi)
            for bi in range(nb):
                futures = pending.get()
                if bi + ahead < nb:
                    submit(bi + ahead)
                samples = [f.result() for f in futures]
                # main-thread stream for collate's Mix3D / downsample draws
                seed_transforms((self.seed, self.epoch, bi, 1))
                if self.collate_fn is not None:
                    yield self.collate_fn(samples)
                else:
                    yield collate_padded(
                        samples, self.num_points, mix_prob=self.mix_prob
                    )


class MultiDatasetLoader:
    """Interleaves batches of a ConcatDataset's children by loop ratio
    (reference datasets/dataloader.py:23-112). Every batch is drawn from a
    single child (so per-dataset statistics like BN condition hold), and
    children appear in proportion to their configured ``loop``."""

    def __init__(
        self,
        concat_dataset,
        batch_size: int,
        num_points: int,
        mix_prob: float = 0.0,
        seed: int = 0,
        num_workers: int = 4,
    ):
        self.children = concat_dataset.datasets
        self.loaders = [
            Loader(
                ds,
                batch_size=batch_size,
                num_points=num_points,
                mix_prob=mix_prob,
                shuffle=True,
                seed=seed + 31 * i,
                num_workers=num_workers,
            )
            for i, ds in enumerate(self.children)
        ]
        self.ratios = [max(1, int(getattr(ds, "loop", 1))) for ds in self.children]
        # the ConcatDataset's own loop is the per-epoch data-pass multiplier
        # (reference defaults.py:123 sets data.train.loop = epoch // eval_epoch)
        self.loop = max(1, int(getattr(concat_dataset, "loop", 1)))
        self.epoch = 0

    def set_epoch(self, epoch: int):
        self.epoch = epoch

    def __len__(self):
        return self.loop * sum(len(ld) for ld in self.loaders)

    def __iter__(self):
        # each data pass reshuffles children with a distinct epoch index
        for rep in range(self.loop):
            for loader in self.loaders:
                loader.set_epoch(self.epoch * self.loop + rep)
            iters = [iter(ld) for ld in self.loaders]
            remaining = [len(ld) for ld in self.loaders]
            # round-robin weighted by ratio until all children exhausted
            while any(r > 0 for r in remaining):
                for i, ratio in enumerate(self.ratios):
                    for _ in range(ratio):
                        if remaining[i] <= 0:
                            break
                        yield next(iters[i])
                        remaining[i] -= 1


def prefetch_to_device(iterator, mesh=None, size: int = 2):
    """Wrap a host batch iterator with a background device-transfer thread."""
    import jax

    from scenesplat_tpu.parallel.mesh import shard_batch

    q: "queue.Queue" = queue.Queue(maxsize=size)
    stop = object()

    def worker():
        try:
            for batch in iterator:
                if mesh is not None:
                    batch = shard_batch(batch, mesh)
                else:
                    batch = jax.tree_util.tree_map(jax.device_put, batch)
                q.put(batch)
        finally:
            q.put(stop)

    threading.Thread(target=worker, daemon=True).start()
    while True:
        item = q.get()
        if item is stop:
            return
        yield item
