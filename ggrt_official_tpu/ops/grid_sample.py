"""Bilinear grid sampling (pure jnp, gather-based).

TPU-native replacement for the reference's uses of F.grid_sample:
  * epipolar feature sampling (epipolar_sampler.py:109-115):
    mode=bilinear, padding_mode=zeros, align_corners=False;
  * photometric warping / cost volumes (depth_pose_network.py:85,
    photometric_loss.py:106-138): align_corners=True, padding zeros.

Coordinates follow torch convention: grid values in [-1, 1], x indexes
width. Implemented as explicit corner gathers + lerp — XLA fuses the
gathers; no scatter in the backward (AD produces scatter-adds which XLA
handles on TPU).
"""
from __future__ import annotations

import jax.numpy as jnp


def _unnormalize(coord: jnp.ndarray, size: int, align_corners: bool) -> jnp.ndarray:
    if align_corners:
        return (coord + 1.0) / 2.0 * (size - 1)
    return ((coord + 1.0) * size - 1.0) / 2.0


def grid_sample(
    image: jnp.ndarray,
    grid: jnp.ndarray,
    align_corners: bool = False,
) -> jnp.ndarray:
    """Bilinear sample with zero padding.

    Args:
      image: (b, c, h, w)
      grid: (b, ho, wo, 2) with xy in [-1, 1] (torch convention).
    Returns:
      (b, c, ho, wo)
    """
    b, c, h, w = image.shape
    x = _unnormalize(grid[..., 0], w, align_corners)
    y = _unnormalize(grid[..., 1], h, align_corners)

    x0 = jnp.floor(x)
    y0 = jnp.floor(y)
    x1 = x0 + 1
    y1 = y0 + 1

    wx1 = x - x0
    wx0 = 1.0 - wx1
    wy1 = y - y0
    wy0 = 1.0 - wy1

    def gather(ix, iy):
        in_bounds = (ix >= 0) & (ix <= w - 1) & (iy >= 0) & (iy <= h - 1)
        ixc = jnp.clip(ix, 0, w - 1).astype(jnp.int32)
        iyc = jnp.clip(iy, 0, h - 1).astype(jnp.int32)
        flat = image.reshape(b, c, h * w)
        idx = (iyc * w + ixc).reshape(b, -1)
        vals = jnp.take_along_axis(flat, idx[:, None, :], axis=2)
        vals = vals.reshape(b, c, *ix.shape[1:])
        return vals * in_bounds[:, None].astype(image.dtype)

    out = (
        gather(x0, y0) * (wx0 * wy0)[:, None]
        + gather(x1, y0) * (wx1 * wy0)[:, None]
        + gather(x0, y1) * (wx0 * wy1)[:, None]
        + gather(x1, y1) * (wx1 * wy1)[:, None]
    )
    return out
