"""Batched data loader: dataset + pipeline → device-ready numpy batches.

Replaces the reference's torch DataLoader + GroupSampler stack
(mmdet/datasets/builder.py:61-128, samplers/group_sampler.py): epoch-
seeded deterministic shuffle inside aspect-ratio groups, per-host
sharding by process index (the jax.process_index() analog of
DistributedGroupSampler rank sharding), threaded decode workers (cv2
releases the GIL).
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
                 drop_last: bool = True):
        self.dataset = dataset
        self.pipeline = pipeline
        self.batch_size = batch_size
        self.shuffle = shuffle
        self.seed = seed
        self.num_workers = num_workers
        self.num_shards = num_shards
        self.shard_id = shard_id
        self.drop_last = drop_last
        self.epoch = 0

    def set_epoch(self, epoch: int):
        self.epoch = epoch

    def _indices(self):
        n = len(self.dataset)
        idx = np.arange(n)
        if self.shuffle:
            rng = np.random.RandomState(self.seed + self.epoch)
            flags = getattr(self.dataset, "flag",
                            np.zeros(n, np.uint8))
            # shuffle within aspect-ratio groups then interleave groups
            # (GroupSampler parity, group_sampler.py:10-47)
            out = []
            for g in np.unique(flags):
                sel = idx[flags == g]
                rng.shuffle(sel)
                out.append(sel)
            idx = np.concatenate(out)
            chunks = [idx[i:i + self.batch_size]
                      for i in range(0, len(idx), self.batch_size)]
            order = rng.permutation(len(chunks))
            idx = np.concatenate([chunks[i] for i in order])
        idx = idx[self.shard_id::self.num_shards]
        return idx

    def _load(self, i):
        import cv2
        img = cv2.imread(self.dataset.img_path(i))
        if img is None:  # missing file → zeros (keeps smoke tests hermetic)
            h = self.dataset.img_infos[i].get("height", 512)
            w = self.dataset.img_infos[i].get("width", 512)
            img = np.zeros((h, w, 3), np.uint8)
        return self.pipeline(img, self.dataset.parse_anns(i))

    def __iter__(self):
        idx = self._indices()
        bs = self.batch_size
        nb = len(idx) // bs if self.drop_last else -(-len(idx) // bs)
        with ThreadPoolExecutor(self.num_workers) as pool:
            for b in range(nb):
                chunk = idx[b * bs:(b + 1) * bs]
                samples = list(pool.map(self._load, chunk))
                while len(samples) < bs:   # pad final partial batch
                    samples.append(samples[-1])
                yield collate_batch(samples)

    def __len__(self):
        n = len(self._indices())
        return n // self.batch_size if self.drop_last \
            else -(-n // self.batch_size)
