"""Tile-parallel rendering over the "tp" mesh axis.

New capability beyond the reference (SURVEY.md §5.7): within one view, the
screen-tile compositing loop is sharded across chips — Gaussians are
replicated (projection/binning are cheap and replicated), each chip
composites its slice of tiles, and the image tiles come back with an
all-gather over ICI. For Waymo-scale images this is the axis that scales
pixels/s beyond one chip.
"""
from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P

from ..ops.rasterizer import composite, tiling
from ..ops.rasterizer.projection import ProjectedGaussians, project_gaussians


def render_tile_parallel(
    mesh: Mesh,
    means, covariances, sh_coeffs, opacities,
    extrinsics, intrinsics, near, far,
    image_shape: tuple[int, int],
    background,
    max_dup: int = 8,
    max_per_tile: int = 1024,
    tile_chunk: int = 16,
    backend: str = "tiled",
):
    """Render one view with tiles sharded over mesh axis 'tp'.

    Single-view arguments (no batch dim). Returns (3, h, w), replicated.
    backend "tiled" shards the XLA compositor; "pallas" shards the Pallas
    kernel itself (each chip runs the kernel over its tile range).
    """
    if backend == "pallas":
        return _render_tile_parallel_pallas(
            mesh, means, covariances, sh_coeffs, opacities,
            extrinsics, intrinsics, near, far, image_shape, background,
            max_dup, max_per_tile,
        )
    tp = mesh.shape["tp"]

    pg = project_gaussians(
        means, covariances, sh_coeffs, opacities,
        extrinsics, intrinsics, near, far, image_shape,
    )
    binning = tiling.bin_gaussians(
        pg, image_shape, max_dup=max_dup, max_per_tile=max_per_tile
    )
    nty, ntx = binning.num_tiles_y, binning.num_tiles_x
    num_tiles = nty * ntx

    # Pad the tile axis to a multiple of tp, gather records (replicated
    # gaussians -> tile-major arrays), then shard tiles.
    pad = (-num_tiles) % tp
    ids = jnp.pad(binning.gaussian_ids, ((0, pad), (0, 0)), constant_values=-1)
    tile_ids = jnp.pad(jnp.arange(num_tiles), (0, pad))

    mean2d, conic, color, opacity = composite.gather_tile_records(pg, ids)
    pixels = composite._tile_pixel_grid_from_ids(
        tile_ids, ntx, tiling.TILE_H, tiling.TILE_W, mean2d.dtype
    )

    @partial(
        jax.shard_map,
        mesh=mesh,
        in_specs=(P("tp"), P("tp"), P("tp"), P("tp"), P("tp"), P()),
        out_specs=P(),
        check_vma=False,
    )
    def sharded_composite(m2d, con, col, opa, pix, bg):
        local = composite.composite_gathered(m2d, con, col, opa, pix, bg, tile_chunk)
        return jax.lax.all_gather(local, "tp", axis=0, tiled=True)

    tile_colors = sharded_composite(mean2d, conic, color, opacity, pixels, background)
    tile_colors = tile_colors[:num_tiles]
    return composite.tiles_to_image(tile_colors, nty, ntx, image_shape)


def _render_tile_parallel_pallas(
    mesh, means, covariances, sh_coeffs, opacities,
    extrinsics, intrinsics, near, far, image_shape, background,
    max_dup, max_per_tile,
):
    """Shard the Pallas compositor over 'tp': projection/binning/record
    construction are replicated (cheap), each chip runs the kernel over its
    slice of the tile-major record tensors, and the composited tiles come
    back with an all-gather. Differentiable: the kernel's custom VJP runs
    per-shard; the gather transposes to a slice."""
    from ..ops.rasterizer import pallas_composite as pc

    tp = mesh.shape["tp"]
    h, w = image_shape

    pg = project_gaussians(
        means, covariances, sh_coeffs, opacities,
        extrinsics, intrinsics, near, far, image_shape,
    )
    binning = tiling.bin_gaussians(
        pg, image_shape, max_dup=max_dup, max_per_tile=max_per_tile
    )
    nty, ntx = binning.num_tiles_y, binning.num_tiles_x
    num_tiles = nty * ntx

    records, colors, counts = pc.build_records(pg, binning)
    pad = (-num_tiles) % tp
    if pad:
        records = jnp.pad(records, ((0, pad), (0, 0), (0, 0)))
        colors = jnp.pad(colors, ((0, pad), (0, 0), (0, 0)))
        counts = jnp.pad(counts, ((0, pad), (0, 0)))

    @partial(
        jax.shard_map,
        mesh=mesh,
        in_specs=(P("tp"), P("tp"), P("tp")),
        out_specs=(P(), P()),
        check_vma=False,
    )
    def sharded_core(rec, col, cnt):
        acc, tfin = pc._composite_core(rec, col, cnt)
        return (
            jax.lax.all_gather(acc, "tp", axis=0, tiled=True),
            jax.lax.all_gather(tfin, "tp", axis=0, tiled=True),
        )

    acc, tfin = sharded_core(records, colors, counts)
    acc, tfin = acc[:num_tiles], tfin[:num_tiles]
    # acc is (t, P, 4) channel-minor: move channels to axis 1 before mixing
    # in the background (slicing axis 1 directly would take pixels).
    img = jnp.swapaxes(acc[..., :3], 1, 2) + jnp.swapaxes(tfin, 1, 2) * background[None, :, None]
    img = img.reshape(nty, ntx, 3, tiling.TILE_H, tiling.TILE_W)
    img = img.transpose(2, 0, 3, 1, 4).reshape(3, nty * tiling.TILE_H, ntx * tiling.TILE_W)
    return img[:, :h, :w]
