"""Per-tile alpha compositing (XLA path), differentiable, memory-bounded.

Consumes the output of `tiling.bin_gaussians`. The compositing math is
identical to `reference.composite_pixels` but operates on per-tile
fixed-capacity Gaussian lists, vectorized so every tile's pixel block is a
(tile_h, tile_w) = (8, 128) vector register. Tiles are processed in chunks
under `jax.lax.map` + `jax.checkpoint`, bounding activation memory to one
chunk while AD recomputes the cumprods in the backward pass.

This is the correctness/fallback path; `pallas_composite` provides the
speed-of-light kernel with a handwritten VJP, validated against this one.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

from .projection import ALPHA_MAX, ALPHA_MIN, T_EPS, ProjectedGaussians
from .tiling import TILE_H, TILE_W, TileBinning


def _tile_pixel_grid_from_ids(tile_ids: jnp.ndarray, ntx: int, tile_h: int, tile_w: int, dtype):
    """Pixel-center coordinates for flat tile ids: (len(ids), th*tw, 2)."""
    ty = tile_ids // ntx
    tx = tile_ids % ntx
    tile_origin = jnp.stack([tx * tile_w, ty * tile_h], axis=-1).astype(dtype)
    py = jnp.arange(tile_h)
    px = jnp.arange(tile_w)
    pyy, pxx = jnp.meshgrid(py, px, indexing="ij")
    local = jnp.stack([pxx.reshape(-1), pyy.reshape(-1)], axis=-1).astype(dtype)
    return tile_origin[:, None, :] + local[None, :, :]


def _tile_pixel_grid(nty: int, ntx: int, tile_h: int, tile_w: int, dtype):
    """Pixel-center coordinates per tile: (num_tiles, tile_h*tile_w, 2)."""
    ids = jnp.arange(nty * ntx)
    return _tile_pixel_grid_from_ids(ids, ntx, tile_h, tile_w, dtype)


def gather_tile_records(
    pg: ProjectedGaussians, gaussian_ids: jnp.ndarray, inv_pos: jnp.ndarray | None = None
):
    """Gather per-tile Gaussian records (t, K, ...). Gradients flow back
    through the gathers to the projected Gaussians — via the binning's
    inverse map when given (gather-based pullback, no scatter-add; see
    pallas_composite._gather_rows), else via JAX AD's scatter-add."""
    dtype = pg.mean2d.dtype
    safe_ids = jnp.maximum(gaussian_ids, 0)
    present = (gaussian_ids >= 0).astype(dtype)
    # Fused single gather (see pallas_composite.build_records): one
    # (g, 9)-row gather + one scatter-add transpose instead of four each.
    comp = jnp.concatenate(
        [pg.mean2d, pg.conic, pg.color, pg.opacity[:, None]], axis=-1
    )
    del inv_pos  # no longer needed: the pullback scatters live rows only
    from .pallas_composite import _gather_rows

    gath = _gather_rows(comp, gaussian_ids)
    return (
        gath[..., 0:2],
        gath[..., 2:5],
        gath[..., 5:8],
        gath[..., 8] * present,
    )


def composite_gathered(
    mean2d, conic, color, opacity, pixels, background, tile_chunk: int = 16
) -> jnp.ndarray:
    """Composite gathered per-tile records; returns (t, P, 3) tile colors.

    All inputs tile-major: records (t, K, ...), pixels (t, P, 2). This is
    the unit the tile-parallel ("tp" mesh axis) renderer shards.
    """
    num_tiles = mean2d.shape[0]
    dtype = mean2d.dtype
    num_chunks = -(-num_tiles // tile_chunk)
    pad = num_chunks * tile_chunk - num_tiles

    def pad0(x):
        return jnp.pad(x, [(0, pad)] + [(0, 0)] * (x.ndim - 1))

    mean2d, conic, color, opacity, pixels = map(
        pad0, (mean2d, conic, color, opacity, pixels)
    )

    def chunk_fn(args):
        m2d, con, col, opa, pix = args  # (c, K, ...) / (c, P, 2)
        d = pix[:, None, :, :] - m2d[:, :, None, :]  # (c, K, P, 2)
        dx, dy = d[..., 0], d[..., 1]
        power = (
            -0.5 * (con[:, :, None, 0] * dx * dx + con[:, :, None, 2] * dy * dy)
            - con[:, :, None, 1] * dx * dy
        )
        alpha = jnp.minimum(ALPHA_MAX, opa[:, :, None] * jnp.exp(power))
        alpha = jnp.where((power <= 0.0) & (alpha >= ALPHA_MIN), alpha, 0.0)

        one_minus = 1.0 - alpha
        T_after = jnp.cumprod(one_minus, axis=1)
        T_before = T_after / one_minus
        live = jnp.cumprod((T_after >= T_EPS).astype(dtype), axis=1)
        weight = live * alpha * T_before  # (c, K, P)
        # HIGHEST precision: a default-precision einsum runs the MXU in bf16
        # passes on TPU and cost this path 2.3e-4 mean image error vs a
        # float64 oracle (tools/diag_f64_oracle.py adjudicated: the Pallas
        # kernel's VPU reductions were at 2e-7, this path was the wrong one).
        out = jnp.einsum(
            "ckp,ckd->cpd", weight, col, precision=jax.lax.Precision.HIGHEST
        )
        T_final = jnp.prod(jnp.where(live > 0, one_minus, 1.0), axis=1)  # (c, P)
        return out + T_final[..., None] * background[None, None, :]

    chunked = lambda a: a.reshape(num_chunks, tile_chunk, *a.shape[1:])
    out = jax.lax.map(
        jax.checkpoint(chunk_fn),
        (chunked(mean2d), chunked(conic), chunked(color), chunked(opacity), chunked(pixels)),
    )  # (num_chunks, tile_chunk, P, 3)
    P = pixels.shape[1]
    return out.reshape(num_chunks * tile_chunk, P, 3)[:num_tiles]


def tiles_to_image(tile_colors: jnp.ndarray, nty: int, ntx: int,
                   image_shape: tuple[int, int],
                   tile_h: int = TILE_H, tile_w: int = TILE_W) -> jnp.ndarray:
    """(num_tiles, th*tw, 3) -> (3, h, w)."""
    h, w = image_shape
    out = tile_colors.reshape(nty, ntx, tile_h, tile_w, 3)
    img = out.transpose(4, 0, 2, 1, 3).reshape(3, nty * tile_h, ntx * tile_w)
    return img[:, :h, :w]


def composite_tiles(
    pg: ProjectedGaussians,
    binning: TileBinning,
    background: jnp.ndarray,
    image_shape: tuple[int, int],
    tile_h: int = TILE_H,
    tile_w: int = TILE_W,
    tile_chunk: int = 16,
) -> jnp.ndarray:
    """Composite all tiles; returns (3, h, w).

    Args:
      tile_chunk: tiles processed per lax.map step (memory knob).
    """
    nty, ntx = binning.num_tiles_y, binning.num_tiles_x
    dtype = pg.mean2d.dtype
    mean2d, conic, color, opacity = gather_tile_records(
        pg, binning.gaussian_ids, binning.inv_pos
    )
    pixels = _tile_pixel_grid(nty, ntx, tile_h, tile_w, dtype)
    tile_colors = composite_gathered(
        mean2d, conic, color, opacity, pixels, background, tile_chunk
    )
    return tiles_to_image(tile_colors, nty, ntx, image_shape, tile_h, tile_w)
