"""Pinhole camera ops in *pixel* coordinates (pure jnp).

Functional re-design of the reference's differentiable Camera class
(/root/reference/ggrt/geometry/camera.py). Used by the IPO-Net cost volume
and the multi-view photometric loss. Unlike `geometry.projection` (which
works in normalized [0,1] image coordinates, pixelSplat convention), these
helpers use pixel-indexed intrinsics like the reference Camera.

Conventions:
  * K is a (..., 3, 3) pixel intrinsics matrix.
  * `Twc` is the world->camera transform (the reference constructs
    Camera(Twc=pose) with pose = target->ref transform and calls it on
    world points that live in the target frame).
"""
from __future__ import annotations

import jax.numpy as jnp

from .projection import invert_intrinsics, invert_se3


def scale_intrinsics(K: jnp.ndarray, x_scale, y_scale) -> jnp.ndarray:
    """Rescale pixel intrinsics (ref camera.py:78-84, incl. the ±0.5 shift)."""
    fx = K[..., 0, 0] * x_scale
    fy = K[..., 1, 1] * y_scale
    cx = (K[..., 0, 2] + 0.5) * x_scale - 0.5
    cy = (K[..., 1, 2] + 0.5) * y_scale - 0.5
    out = K
    out = out.at[..., 0, 0].set(fx)
    out = out.at[..., 1, 1].set(fy)
    out = out.at[..., 0, 2].set(cx)
    out = out.at[..., 1, 2].set(cy)
    return out


def pixel_grid(h: int, w: int, dtype=jnp.float32) -> jnp.ndarray:
    """(3, h, w) homogeneous pixel-index grid (x, y, 1); x = column index."""
    xs = jnp.arange(w, dtype=dtype)
    ys = jnp.arange(h, dtype=dtype)
    yy, xx = jnp.meshgrid(ys, xs, indexing="ij")
    return jnp.stack([xx, yy, jnp.ones_like(xx)], axis=0)


def reconstruct(depth: jnp.ndarray, K: jnp.ndarray, Twc: jnp.ndarray | None = None) -> jnp.ndarray:
    """Depth map -> world points (ref camera.py:183-229).

    Args:
      depth: (b, 1, h, w)
      K: (b, 3, 3) pixel intrinsics
      Twc: optional (b, 4, 4) world->camera; identity (camera frame == world).
    Returns:
      (b, 3, h, w) points in the world frame.
    """
    b, _, h, w = depth.shape
    grid = pixel_grid(h, w, depth.dtype).reshape(3, -1)
    xnorm = jnp.einsum("bij,jn->bin", invert_intrinsics(K), grid)
    Xc = xnorm.reshape(b, 3, h, w) * depth
    if Twc is None:
        return Xc
    Tcw = invert_se3(Twc)
    Rcw, tcw = Tcw[..., :3, :3], Tcw[..., :3, 3]
    Xw = jnp.einsum("bij,bjn->bin", Rcw, Xc.reshape(b, 3, -1)) + tcw[..., None]
    return Xw.reshape(b, 3, h, w)


def project(
    X: jnp.ndarray,
    K: jnp.ndarray,
    Twc: jnp.ndarray | None = None,
    normalize: bool = True,
) -> jnp.ndarray:
    """World points -> pixel (or [-1,1]-normalized) coordinates (ref camera.py:231-278).

    Args:
      X: (b, 3, h, w) world points.
    Returns:
      (b, h, w, 2) coordinates; normalized to [-1, 1] if `normalize`.
    """
    b, _, h, w = X.shape
    Xf = X.reshape(b, 3, -1)
    if Twc is not None:
        Rwc, twc = Twc[..., :3, :3], Twc[..., :3, 3]
        Xf = jnp.einsum("bij,bjn->bin", Rwc, Xf) + twc[..., None]
    Xc = jnp.einsum("bij,bjn->bin", K, Xf)
    x = Xc[:, 0]
    y = Xc[:, 1]
    z = jnp.clip(Xc[:, 2], a_min=1e-5)
    if normalize:
        xn = 2.0 * (x / z) / (w - 1) - 1.0
        yn = 2.0 * (y / z) / (h - 1) - 1.0
    else:
        xn = x / z
        yn = y / z
    return jnp.stack([xn, yn], axis=-1).reshape(b, h, w, 2)
