"""Reference (oracle) Gaussian compositor — O(pixels x gaussians), pure jnp.

Implements exactly the per-pixel front-to-back alpha compositing of the
CUDA rasterizer (SURVEY.md §2.1: sort by depth, alpha = min(0.99,
o*exp(-0.5 dᵀ conic d)), skip alpha < 1/255, stop when transmittance drops
below 1e-4). Used as the numerical golden for the tiled/Pallas paths and
for tiny-scene tests; differentiable end-to-end including camera gradients.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

from .projection import ALPHA_MAX, ALPHA_MIN, T_EPS, ProjectedGaussians, project_gaussians


def composite_pixels(
    pg: ProjectedGaussians,
    pixel_xy: jnp.ndarray,
    background: jnp.ndarray,
    tile_shape: tuple[int, int] | None = None,
) -> jnp.ndarray:
    """Alpha-composite all Gaussians at the given pixel centers.

    Args:
      pg: projected gaussians (depth-unsorted; sorted internally).
      pixel_xy: (p, 2) pixel-center coordinates.
      background: (3,).
      tile_shape: optional (tile_h, tile_w). When given, replicates the CUDA
        kernel's tile-granular culling: a Gaussian only contributes to pixels
        whose tile lies inside its radius AABB (getRect semantics). Without
        it, every Gaussian reaches every pixel (pure math oracle).
    Returns:
      (p, 3) colors.
    """
    order = jnp.argsort(jnp.where(pg.valid, pg.depth, jnp.inf))
    mean2d = pg.mean2d[order]
    conic = pg.conic[order]
    color = pg.color[order]
    opacity = pg.opacity[order]
    extent = pg.extent[order]
    valid = pg.valid[order] & (extent[:, 0] > 0.0) & (extent[:, 1] > 0.0)

    d = pixel_xy[:, None, :] - mean2d[None, :, :]  # (p, g, 2)
    dx, dy = d[..., 0], d[..., 1]

    if tile_shape is not None:
        # Tile-granular culling with the SAME extent AABB the production
        # binning uses (tiling._tile_aabb): the exact bounding box of the
        # alpha >= 1/255 contribution ellipse, so culled (gaussian, tile)
        # pairs contribute exactly zero and the oracle's image equals the
        # binned backends' bit-for-bit (up to cap overflow).
        th, tw = tile_shape
        ptx = (pixel_xy[:, 0] // tw).astype(jnp.int32)
        pty = (pixel_xy[:, 1] // th).astype(jnp.int32)
        ex, ey = extent[:, 0], extent[:, 1]
        gx0 = ((mean2d[:, 0] - ex) / tw).astype(jnp.int32)
        gx1 = jnp.floor((mean2d[:, 0] + ex + tw - 1) / tw).astype(jnp.int32)
        gy0 = ((mean2d[:, 1] - ey) / th).astype(jnp.int32)
        gy1 = jnp.floor((mean2d[:, 1] + ey + th - 1) / th).astype(jnp.int32)
        in_tile = (
            (ptx[:, None] >= gx0[None, :]) & (ptx[:, None] < gx1[None, :])
            & (pty[:, None] >= gy0[None, :]) & (pty[:, None] < gy1[None, :])
        )
        valid = valid[None, :] & in_tile
    else:
        valid = valid[None, :]
    power = -0.5 * (conic[None, :, 0] * dx * dx + conic[None, :, 2] * dy * dy) \
        - conic[None, :, 1] * dx * dy
    alpha = jnp.minimum(ALPHA_MAX, opacity[None, :] * jnp.exp(power))
    alpha = jnp.where((power <= 0.0) & valid & (alpha >= ALPHA_MIN), alpha, 0.0)

    one_minus = 1.0 - alpha
    T_after = jnp.cumprod(one_minus, axis=1)           # T_{i+1} per gaussian
    T_before = T_after / one_minus                      # T_i (alpha < 0.99 -> safe)
    live = T_after >= T_EPS                             # CUDA: skip once T would drop below eps
    live = jnp.cumprod(live.astype(alpha.dtype), axis=1)  # prefix property

    weight = live * alpha * T_before                    # (p, g)
    out = jnp.einsum(
        "pg,gc->pc", weight, color, precision=jax.lax.Precision.HIGHEST
    )
    T_final = jnp.prod(jnp.where(live > 0, one_minus, 1.0), axis=1)
    return out + T_final[:, None] * background[None, :]


def render_reference(
    means: jnp.ndarray,
    covariances: jnp.ndarray,
    sh_coeffs: jnp.ndarray,
    opacities: jnp.ndarray,
    extrinsics: jnp.ndarray,
    intrinsics: jnp.ndarray,
    near: jnp.ndarray,
    far: jnp.ndarray,
    image_shape: tuple[int, int],
    background: jnp.ndarray,
    tile_shape: tuple[int, int] | None = None,
) -> jnp.ndarray:
    """Render one view, (3, h, w). Single-camera; callers vmap over views."""
    h, w = image_shape
    pg = project_gaussians(
        means, covariances, sh_coeffs, opacities, extrinsics, intrinsics, near, far, image_shape
    )
    ys, xs = jnp.meshgrid(jnp.arange(h), jnp.arange(w), indexing="ij")
    pixel_xy = jnp.stack([xs, ys], axis=-1).reshape(-1, 2).astype(means.dtype)
    colors = composite_pixels(pg, pixel_xy, background, tile_shape=tile_shape)
    return colors.reshape(h, w, 3).transpose(2, 0, 1)
