"""Batched data loader: dataset + pipeline → device-ready numpy batches.

Replaces the reference's torch DataLoader + GroupSampler stack
(mmdet/datasets/builder.py:61-128, samplers/group_sampler.py): epoch-
seeded deterministic shuffle inside aspect-ratio groups with each
group padded to a batch multiple (so every batch is single-group),
per-host sharding by WHOLE batches padded to a shard-uniform count
(the DistributedGroupSampler rank-padding invariant — unequal per-host
batch counts would deadlock the per-step psum collectives), threaded
decode workers (cv2 releases the GIL).
"""

from __future__ import annotations

from concurrent.futures import ThreadPoolExecutor

import numpy as np

from .pipeline import collate_batch


class GroupedLoader:
    def __init__(self, dataset, pipeline, batch_size: int,
                 shuffle: bool = True, seed: int = 0,
                 num_workers: int = 4,
                 num_shards: int = 1, shard_id: int = 0,
                 drop_last: bool = True, prefetch: int = 2):
        self.dataset = dataset
        self.pipeline = pipeline
        self.batch_size = batch_size
        self.shuffle = shuffle
        self.seed = seed
        self.num_workers = num_workers
        self.num_shards = num_shards
        self.shard_id = shard_id
        self.drop_last = drop_last
        self.prefetch = max(1, prefetch)
        self.epoch = 0

    def set_epoch(self, epoch: int):
        self.epoch = epoch

    def _chunks(self):
        """This shard's list of batch-index chunks for the epoch."""
        n = len(self.dataset)
        idx = np.arange(n)
        bs = self.batch_size
        if self.shuffle:
            rng = np.random.RandomState(self.seed + self.epoch)
            flags = getattr(self.dataset, "flag",
                            np.zeros(n, np.uint8))
            # shuffle within aspect-ratio groups, pad each group to a
            # batch multiple (GroupSampler parity,
            # group_sampler.py:10-47) so every chunk is single-group,
            # then shuffle the chunk order
            chunks = []
            for g in np.unique(flags):
                sel = idx[flags == g]
                rng.shuffle(sel)
                extra = -len(sel) % bs
                if extra:
                    sel = np.concatenate([sel, sel[:extra]])
                chunks += [sel[i:i + bs]
                           for i in range(0, len(sel), bs)]
            order = rng.permutation(len(chunks))
            chunks = [chunks[i] for i in order]
        else:
            nb = n // bs if self.drop_last and n >= bs \
                else -(-n // bs)
            chunks = [idx[i * bs:(i + 1) * bs] for i in range(nb)]
        if self.num_shards > 1 and chunks:
            # shard by WHOLE batches, padded so every shard sees the
            # same batch count (DistributedGroupSampler's rank-uniform
            # total_size): a host with one extra batch would block
            # forever in that step's gradient psum, and differing
            # len(loader) values silently desync the LR schedules
            extra = -len(chunks) % self.num_shards
            chunks = chunks + chunks[:extra]
            chunks = chunks[self.shard_id::self.num_shards]
        return chunks

    def _indices(self):
        chunks = self._chunks()
        return (np.concatenate(chunks) if chunks
                else np.zeros(0, np.int64))

    def _load(self, i):
        import cv2
        img = cv2.imread(self.dataset.img_path(i))
        if img is None:  # missing file → zeros (keeps smoke tests hermetic)
            h = self.dataset.img_infos[i].get("height", 512)
            w = self.dataset.img_infos[i].get("width", 512)
            img = np.zeros((h, w, 3), np.uint8)
        return self.pipeline(img, self.dataset.parse_anns(i))

    def __iter__(self):
        """Yield collated batches, produced by a background thread so
        host decode/augment overlaps the (async-dispatched) device
        step — without prefetch the loop alternates host 100% / chip
        100% and both wait on each other."""
        import queue
        import threading

        bs = self.batch_size
        q: queue.Queue = queue.Queue(maxsize=self.prefetch)
        stop = threading.Event()
        SENTINEL = object()

        def produce():
            try:
                with ThreadPoolExecutor(self.num_workers) as pool:
                    for chunk in self._chunks():
                        samples = list(pool.map(self._load, chunk))
                        while len(samples) < bs:  # pad final partial
                            samples.append(samples[-1])
                        batch = collate_batch(samples)
                        while not stop.is_set():
                            try:
                                q.put(batch, timeout=0.5)
                                break
                            except queue.Full:
                                continue
                        if stop.is_set():
                            return
            except BaseException as e:  # surface worker errors
                q.put(e)
                return
            q.put(SENTINEL)

        t = threading.Thread(target=produce, daemon=True,
                             name="loader-prefetch")
        t.start()
        try:
            while True:
                item = q.get()
                if item is SENTINEL:
                    break
                if isinstance(item, BaseException):
                    raise item
                yield item
        finally:
            stop.set()

    def __len__(self):
        return len(self._chunks())
