"""Host→TPU input pipeline: batching, background prefetch, device transfer.

Replaces the reference's torch DataLoader + worker processes
(reference: train.py:287-293, lib/utils/data/dataloader.py) with a
thread-based prefetcher: PIL decode/augment runs on host threads while the
TPU executes the previous step; batches are transferred with the mesh 'data'
sharding so each chip receives only its shard.
"""

from __future__ import annotations

import queue
import threading
from typing import Callable, Iterator

import numpy as np


class PrefetchLoader:
    """Iterate (shuffled) dataset indices, assemble batches, prefetch."""

    def __init__(self, dataset, batch_size: int, collate: Callable,
                 shuffle: bool = True, seed: int = 0, prefetch: int = 2,
                 drop_last: bool = True, num_threads: int = 2,
                 host_id: int = 0, host_count: int = 1):
        self.dataset = dataset
        self.batch_size = batch_size
        self.collate = collate
        self.shuffle = shuffle
        self.seed = seed
        self.prefetch = prefetch
        self.drop_last = drop_last
        self.num_threads = max(1, num_threads)
        # multi-host sharding (the reference's vendored DistributedSampler,
        # lib/utils/data/distributed.py): each host consumes a disjoint
        # stride of the (identically shuffled) index stream
        self.host_id = host_id
        self.host_count = host_count
        self.epoch = 0

    def __len__(self):
        n = len(self.dataset)
        return n // self.batch_size if self.drop_last \
            else -(-n // self.batch_size)

    def _index_batches(self):
        n = len(self.dataset)
        order = np.arange(n)
        if self.shuffle:
            np.random.default_rng(self.seed + self.epoch).shuffle(order)
        if self.host_count > 1:
            order = order[self.host_id::self.host_count]
            n = len(order)
        end = n - n % self.batch_size if self.drop_last else n
        for s in range(0, end, self.batch_size):
            yield order[s:s + self.batch_size]

    def __iter__(self) -> Iterator:
        q: queue.Queue = queue.Queue(maxsize=self.prefetch)
        batches = list(self._index_batches())
        if hasattr(self.dataset, "set_epoch"):
            # key per-item augmentation draws by epoch (exact mid-epoch
            # preemption resume — see datasets._item_rng_handles)
            self.dataset.set_epoch(self.epoch)
        self.epoch += 1

        def worker():
            try:
                for idxs in batches:
                    items = [self.dataset[int(i)] for i in idxs]
                    q.put(("item", self.collate(items)))
                q.put(("end", None))
            except Exception as e:  # surface loader errors to the consumer
                q.put(("error", e))

        t = threading.Thread(target=worker, daemon=True)
        t.start()
        while True:
            kind, payload = q.get()
            if kind == "end":
                return
            if kind == "error":
                raise payload
            yield payload


def collate_frames(items):
    """[(img [H,W,3], label [H,W])...] → {'img': [N,H,W,3], 'label': [N,H,W]}."""
    imgs = np.stack([it[0] for it in items]).astype(np.float32)
    labels = np.stack([it[1] for it in items]).astype(np.int32)
    return {"img": imgs, "label": labels}


def make_collate_target_last(target_idx: int):
    """Collate clips ([imgs...], [labels...]) → [T, N, ...] stacks with the
    frame at ``target_idx`` moved to the END (the reference batch-concats
    context frames then the target frame, e.g. clip_psp.py:142-143;
    the target is clip[0] for long clips and the middle frame for
    contiguous clips — train_clip2.py:50-82)."""

    def collate(items):
        t = len(items[0][0])
        order = [k for k in range(t) if k != target_idx] + [target_idx]
        imgs = np.stack([np.stack([it[0][k] for it in items])
                         for k in order]).astype(np.float32)
        labels = np.stack([np.stack([it[1][k] for it in items])
                           for k in order]).astype(np.int32)
        return {"img": imgs, "labels": labels}

    return collate


# long-clip convention: anchor (target) is sample frame 0
collate_clips_target_last = make_collate_target_last(0)


def collate_clips_in_order(items):
    """Clip samples stacked [T, N, ...] preserving sample frame order."""
    t = len(items[0][0])
    imgs = np.stack([np.stack([it[0][k] for it in items])
                     for k in range(t)]).astype(np.float32)
    labels = np.stack([np.stack([it[1][k] for it in items])
                       for k in range(t)]).astype(np.int32)
    return {"img": imgs, "labels": labels}
