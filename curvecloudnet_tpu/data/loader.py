"""Threaded prefetching data loader.

The reference runs its DataLoaders with ``num_workers=0`` (main.py:31-34) —
the CPU-side curve extraction stalls the GPU between batches.  Feeding a TPU
the same way would starve it (SURVEY.md §7 'hard parts'), so the host
pipeline here overlaps sample preparation with device compute: a thread pool
prepares padded batches ahead of consumption into a bounded queue, and an
optional double-buffering stage moves the next batch to device while the
current one computes.
"""

from __future__ import annotations

import queue
import threading
from typing import Callable, Iterator, Optional

import numpy as np

from .datasets import CurveDataset, pad_sample


class PrefetchLoader:
    """Iterate padded numpy batches prepared by worker threads."""

    def __init__(self, dataset: CurveDataset, batch_size: int,
                 shuffle: bool = False, seed: int = 0, augment: bool = False,
                 drop_last: bool = True, num_workers: int = 4,
                 prefetch: int = 4, shard_by_process: bool = True):
        self.dataset = dataset
        self.batch_size = batch_size
        self.shuffle = shuffle
        self.seed = seed
        self.augment = augment
        self.drop_last = drop_last
        self.num_workers = max(1, num_workers)
        self.prefetch = prefetch
        # Multi-host data sharding (SURVEY §2.11 'host data loading sharded
        # per process'): every process shuffles the SAME global order (seed
        # is shared) and reads only its contiguous slice of it, so the hosts
        # jointly cover each epoch without overlap.
        self.shard_by_process = shard_by_process

    def _shard(self) -> range:
        if not self.shard_by_process:
            return range(len(self.dataset))
        from ..parallel.mesh import process_shard_range

        return process_shard_range(len(self.dataset))

    def _shard_len(self) -> int:
        if not self.shard_by_process:
            return len(self.dataset)
        # Lockstep SPMD requires every process to run the SAME number of
        # steps per epoch (unequal shards deadlock at the epoch boundary),
        # so the global order is wrap-padded to process_count * per before
        # slicing — every shard has exactly `per` items.
        import jax

        return -(-len(self.dataset) // jax.process_count())

    def __len__(self):
        n = self._shard_len()
        return n // self.batch_size if self.drop_last else -(-n // self.batch_size)

    def _batch_indices(self, epoch_seed: int):
        order = np.arange(len(self.dataset))
        if self.shuffle:
            np.random.default_rng(epoch_seed).shuffle(order)
        if self.shard_by_process:
            import jax

            per = self._shard_len()
            pad = per * jax.process_count() - len(order)
            if pad:
                # wrap-pad may need MULTIPLE repetitions when the dataset
                # is smaller than the process count (pad > len(order)) —
                # a short concat would leave later processes with empty
                # shards and deadlock the lockstep epoch
                reps = 1 + (-(-pad // len(order)))
                order = np.concatenate([order] * reps)[
                    :per * jax.process_count()]
            p = jax.process_index()
            order = order[p * per:(p + 1) * per]
        stop = (len(order) - self.batch_size + 1 if self.drop_last
                else len(order))
        for s in range(0, max(stop, 0), self.batch_size):
            yield order[s:s + self.batch_size]

    def epoch(self, epoch: int = 0) -> Iterator[dict]:
        """Yield batches for one epoch, prepared by a worker pool."""
        batches = list(self._batch_indices(self.seed + epoch))
        out_q: "queue.Queue" = queue.Queue(maxsize=self.prefetch)
        task_q: "queue.Queue" = queue.Queue()
        for bi, idxs in enumerate(batches):
            task_q.put((bi, idxs))
        results = {}
        lock = threading.Lock()
        stop = threading.Event()

        def worker(wid: int):
            rng = np.random.default_rng(
                (self.seed + epoch) * 1000003 + wid)
            while not stop.is_set():
                try:
                    bi, idxs = task_q.get_nowait()
                except queue.Empty:
                    return
                # a worker exception must surface in the consumer, not
                # kill the daemon thread silently (the consumer would
                # otherwise spin forever waiting for results[bi])
                try:
                    raw = [self.dataset.get(int(i), rng=rng,
                                            augment=self.augment)
                           for i in idxs]
                    samples = [pad_sample(s, self.dataset.n_pad)
                               for s in raw]
                    batch = {k: np.stack([s[k] for s in samples])
                             for k in samples[0]}
                    metas = [getattr(s, "meta", None) for s in raw]
                    if any(m is not None for m in metas):
                        batch["_meta"] = metas
                except BaseException as e:  # noqa: BLE001
                    with lock:
                        results[bi] = e
                    return
                with lock:
                    results[bi] = batch

        threads = [threading.Thread(target=worker, args=(w,), daemon=True)
                   for w in range(self.num_workers)]
        for t in threads:
            t.start()
        try:
            for bi in range(len(batches)):
                while True:
                    with lock:
                        if bi in results:
                            got = results.pop(bi)
                            break
                    threading.Event().wait(0.002)
                if isinstance(got, BaseException):
                    raise got
                yield got
        finally:
            stop.set()
            for t in threads:
                t.join(timeout=1.0)
