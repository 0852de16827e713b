"""Device mesh construction for multi-chip TPU training.

Replaces the reference's NCCL DDP (SURVEY.md §2.9, §5.8) with a
`jax.sharding.Mesh`:
  * axis "dp"  — data parallelism over target views (the reference's only
    strategy: one target view per device, grads all-reduced);
  * axis "tp"  — tile parallelism over screen tiles for large images
    (new capability; Waymo-scale rendering).

Collectives ride ICI via XLA (psum/pmean inside shard_map).
"""
from __future__ import annotations

import jax
import numpy as np
from jax.sharding import Mesh


def make_mesh(data_parallel: int = 0, tile_parallel: int = 1, devices=None) -> Mesh:
    """Build a (dp, tp) mesh. data_parallel=0 uses all remaining devices."""
    devices = np.asarray(devices if devices is not None else jax.devices())
    n = devices.size
    if data_parallel <= 0:
        assert n % tile_parallel == 0
        data_parallel = n // tile_parallel
    assert data_parallel * tile_parallel <= n, (
        f"mesh {data_parallel}x{tile_parallel} exceeds {n} devices"
    )
    grid = devices[: data_parallel * tile_parallel].reshape(data_parallel, tile_parallel)
    return Mesh(grid, axis_names=("dp", "tp"))
