"""Prototype: compact valid (gaussian, tile) pairs BEFORE the binning sort.

At bench scale the packed-key sort covers g*max_dup = 6.88M entries, padded
to 8.4M by the TPU sort — but only ~1.34M pairs are valid (BENCH_r02
binning_overflow.pairs_wanted). Compacting valid pairs into a static 2^21
(= 2.10M) buffer first should cut the sort ~4x (~20 ms -> ~5).

Compaction without scatter: per-gaussian kept counts (nxw*nyw) ->
exclusive cumsum `base` -> for each output position p, the source gaussian
is searchsorted(base, p, 'right')-1 and the slot is p - base[g]. Both maps
are monotone; everything is gathers.

Measures on the current backend (TPU if attached):
  A. current bin_gaussians (sort of g*max_dup keys)
  B. compacted variant
and checks the per-tile lists are bit-identical.

Usage: python tools/diag_compact_sort.py [--iters 20]
"""
import argparse
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import jax

jax.config.update("jax_compilation_cache_dir", "/tmp/jax_tpu_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
import jax.numpy as jnp
import numpy as np

from bench import build_inputs
from ggrt_official_tpu.ops.rasterizer import tiling
from ggrt_official_tpu.ops.rasterizer.projection import project_gaussians


def compact_bin(pg, image_shape, max_dup=8, max_per_tile=1024,
                tile_h=tiling.TILE_H, tile_w=tiling.TILE_W, capacity=1 << 21):
    h, w = image_shape
    ntx = -(-w // tile_w)
    nty = -(-h // tile_h)
    num_tiles = ntx * nty
    g = pg.mean2d.shape[0]

    x0, x1, y0, y1, visible = tiling._tile_aabb(pg, ntx, nty, tile_w, tile_h)
    x0w, y0w, nxw, nyw = tiling._dup_window(pg, x0, x1, y0, y1, tile_w, tile_h, max_dup)
    kept = jnp.where(visible, nxw * nyw, 0)          # (g,)
    base = jnp.cumsum(kept) - kept                    # exclusive prefix
    total = base[-1] + kept[-1]

    # Map output position p -> (gaussian, slot): jnp.repeat implements the
    # monotone expansion via scatter+cummax (searchsorted lowers to a
    # sequential binary-search loop: 300 ms for 2M queries on TPU).
    gid = jnp.repeat(
        jnp.arange(g, dtype=jnp.int32), kept, total_repeat_length=capacity
    )
    p = jnp.arange(capacity, dtype=jnp.int32)
    slot = p - base[gid]
    valid = p < total

    nx_safe = jnp.maximum(nxw[gid], 1)
    dy, dx = tiling._enum_tiles(slot, nx_safe)
    ty = y0w[gid] + dy
    tx = x0w[gid] + dx
    tile_id = jnp.where(valid, ty * ntx + tx, num_tiles).astype(jnp.int32)

    tile_bits = (num_tiles + 1).bit_length()
    qbits = min(tiling.DEPTH_BITS, 31 - tile_bits)
    q = tiling._quantize_depth(pg.depth, visible, qbits)
    packed = (tile_id << qbits) | jnp.where(valid, q[gid], (1 << qbits) - 1)
    didx = gid * max_dup + slot
    packed_sorted, didx_sorted = jax.lax.sort((packed, didx), num_keys=1)

    tile_range = jnp.arange(num_tiles + 1, dtype=jnp.int32)
    starts = jnp.searchsorted(packed_sorted, tile_range << qbits, side="left").astype(jnp.int32)
    counts = jnp.minimum(starts[1:] - starts[:-1], max_per_tile)
    k = jnp.arange(max_per_tile, dtype=jnp.int32)
    positions = jnp.clip(starts[:-1, None] + k[None, :], 0, capacity - 1)
    in_seg = k[None, :] < counts[:, None]
    didx_at = didx_sorted[positions]
    ids = jnp.where(in_seg, didx_at // max_dup, -1)
    return tiling.TileBinning(ids, counts, nty, ntx), total


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--iters", type=int, default=20)
    args = ap.parse_args()

    H, W = 320, 448
    means, cov, sh, opa, extr, intr, near, far, bg = build_inputs(jax, jnp, H, W)
    pg = project_gaussians(
        means[0], cov[0], sh[0], opa[0], extr[0], intr[0], near[0], far[0], (H, W)
    )
    print("projected", means.shape[1], "gaussians; device:", jax.devices()[0])

    f_cur = jax.jit(lambda pg: tiling.bin_gaussians(pg, (H, W), 8, 1024))
    f_new = jax.jit(lambda pg: compact_bin(pg, (H, W), 8, 1024))

    cur = f_cur(pg)
    new, total = f_new(pg)
    print("total kept pairs:", int(total))
    same_ids = bool(jnp.all(cur.gaussian_ids == new.gaussian_ids))
    same_counts = bool(jnp.all(cur.counts == new.counts))
    print("bit-identical: ids", same_ids, "counts", same_counts)

    for name, f in (("current", f_cur), ("compact", f_new)):
        out = f(pg)
        jax.block_until_ready(out)
        t0 = time.perf_counter()
        for _ in range(args.iters):
            out = f(pg)
        jax.block_until_ready(out)
        dt = (time.perf_counter() - t0) / args.iters * 1000
        print(f"{name}: {dt:.2f} ms")


if __name__ == "__main__":
    main()
