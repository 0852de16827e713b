"""Cross-iteration Gaussian cache (host-level state).

Parity target: /root/reference/ggrt/model/pixelsplat/pixelsplat.py:177-199
— per-reference-frame Gaussians memoized across train iterations keyed by
dataset frame index, evicting frames that left the context window; cached
entries are read back *detached* so gradients only flow through pairs
encoded in the current step.

JAX re-design: the cache lives OUTSIDE jit as concrete device arrays. Each
step the runner determines which adjacent pairs are cache hits, encodes
only the misses with a fixed-shape jitted encoder (one pair per call —
the steady-state miss count is 1, matching the reference's sliding
window), and concatenates cached + fresh Gaussians for decoding.
"""
from __future__ import annotations

from typing import Callable, Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..models.gaussian_adapter import Gaussians


class GaussianCache:
    def __init__(self, capacity: int = 32):
        self.capacity = capacity
        self.store: dict[int, Gaussians] = {}

    def evict_unused(self, current_ids) -> None:
        current = {int(i) for i in current_ids}
        for key in list(self.store):
            if key not in current:
                del self.store[key]
        while len(self.store) > self.capacity:
            self.store.pop(next(iter(self.store)))

    def get(self, frame_id: int) -> Optional[Gaussians]:
        g = self.store.get(int(frame_id))
        if g is None:
            return None
        return Gaussians(*(jax.lax.stop_gradient(t) for t in g))

    def put(self, frame_id: int, gaussians: Gaussians) -> None:
        self.store[int(frame_id)] = gaussians

    def __len__(self):
        return len(self.store)


class CachedPairEncoder:
    """Encode adjacent context pairs with caching.

    `encode_pair_fn(context_pair_batch) -> Gaussians` must be a jitted
    fixed-shape function over a single (b=1, 2-view) pair.
    """

    def __init__(self, encode_pair_fn: Callable, capacity: int = 32):
        self.encode_pair = encode_pair_fn
        self.cache = GaussianCache(capacity)
        self.hits = 0
        self.misses = 0

    def __call__(self, context: dict) -> Gaussians:
        """context arrays (1, v, ...); returns merged Gaussians (1, n, ...)."""
        index = np.asarray(context["index"][0])
        order = np.argsort(index)
        self.cache.evict_unused(index[order[:-1]])

        parts = []
        for k in range(len(order) - 1):
            key = int(index[order[k]])
            cached = self.cache.get(key)
            if cached is not None:
                self.hits += 1
                parts.append(cached)
                continue
            self.misses += 1
            pair = {
                name: jnp.stack(
                    [arr[:, order[k]], arr[:, order[k + 1]]], axis=1
                )
                for name, arr in context.items()
            }
            g = self.encode_pair(pair)
            self.cache.put(key, g)
            parts.append(g)

        return Gaussians(*(jnp.concatenate(ts, axis=1) for ts in zip(*parts)))
