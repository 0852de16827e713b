"""Multi-dataset mixing (host-side).

Parity target: /root/reference/ggrt/data_loaders/create_training_dataset.py
— name-parsed dataset composition ('llff+ibrnet_collected'), weighted
sampling across datasets, and per-host sharding for multi-host input
pipelines (replacing DistributedSamplerWrapper: each host takes a
deterministic strided slice of the sample stream).
"""
from __future__ import annotations

import numpy as np


class WeightedMixDataset:
    """Sample from several datasets with given probabilities."""

    def __init__(self, datasets: list, weights: list[float], seed: int = 0):
        assert len(datasets) == len(weights) and len(datasets) > 0
        self.datasets = datasets
        w = np.asarray(weights, np.float64)
        self.weights = w / w.sum()
        self.rng = np.random.RandomState(seed)

    def __len__(self):
        return sum(len(d) for d in self.datasets)

    def __getitem__(self, idx):
        d = self.rng.choice(len(self.datasets), p=self.weights)
        ds = self.datasets[d]
        return ds[self.rng.randint(len(ds))]

    def host_shard_iter(self, host_id: int, num_hosts: int, seed: int = 0):
        """Deterministic per-host sample stream (DistributedSamplerWrapper
        equivalent): every host draws from the same seeded stream and keeps
        its stride-slice, so streams are disjoint and reproducible."""
        rng = np.random.RandomState(seed)
        i = 0
        while True:
            d = rng.choice(len(self.datasets), p=self.weights)
            j = rng.randint(len(self.datasets[d]))
            if i % num_hosts == host_id:
                yield self.datasets[d][j]
            i += 1


def create_training_dataset(cfg, dataset_classes: dict, mode: str = "train"):
    """Build the (possibly mixed) training dataset from cfg.train_dataset,
    e.g. 'llff+ibrnet_collected' with cfg.dataset_weights."""
    names = cfg.train.train_dataset.split("+")
    datasets = []
    for name in names:
        if name not in dataset_classes:
            raise KeyError(f"unknown dataset: {name} (have {list(dataset_classes)})")
        datasets.append(dataset_classes[name](cfg, mode))
    if len(datasets) == 1:
        return datasets[0]
    return WeightedMixDataset(datasets, list(cfg.train.dataset_weights), seed=cfg.train.seed)
