"""Depth / disparity conversions (pure jnp).

Parity targets: /root/reference/ggrt/geometry/depth.py and
/root/reference/ggrt/model/pixelsplat/encoder/epipolar/conversions.py.
"""
from __future__ import annotations

import jax.numpy as jnp


def inv2depth(inv_depth: jnp.ndarray) -> jnp.ndarray:
    """Inverse depth -> depth; non-positive inputs map to 0 (ref depth.py:21-37)."""
    depth = 1.0 / jnp.clip(inv_depth, a_min=1e-6)
    return jnp.where(inv_depth <= 0.0, 0.0, depth)


def depth2inv(depth: jnp.ndarray) -> jnp.ndarray:
    inv_depth = 1.0 / jnp.clip(depth, a_min=1e-6)
    return jnp.where(depth <= 0.0, 0.0, inv_depth)


def disp_to_depth(disp: jnp.ndarray, min_depth: float, max_depth: float):
    """Sigmoid output -> (scaled_disp, depth) (ref depth.py:66-76)."""
    min_disp = 1.0 / max_depth
    max_disp = 1.0 / min_depth
    scaled_disp = min_disp + (max_disp - min_disp) * disp
    depth = 1.0 / scaled_disp
    return scaled_disp, depth


def relative_disparity_to_depth(
    relative_disparity: jnp.ndarray,
    near: jnp.ndarray,
    far: jnp.ndarray,
    eps: float = 1e-10,
) -> jnp.ndarray:
    """0 = near, 1 = far (ref conversions.py:5-14)."""
    disp_near = 1.0 / (near + eps)
    disp_far = 1.0 / (far + eps)
    return 1.0 / ((1.0 - relative_disparity) * (disp_near - disp_far) + disp_far + eps)


def depth_to_relative_disparity(
    depth: jnp.ndarray,
    near: jnp.ndarray,
    far: jnp.ndarray,
    eps: float = 1e-10,
) -> jnp.ndarray:
    disp_near = 1.0 / (near + eps)
    disp_far = 1.0 / (far + eps)
    disp = 1.0 / (depth + eps)
    return 1.0 - (disp - disp_far) / (disp_near - disp_far + eps)


def gradient_x(image: jnp.ndarray) -> jnp.ndarray:
    """x-gradient for (..., h, w) images."""
    return image[..., :, :-1] - image[..., :, 1:]


def gradient_y(image: jnp.ndarray) -> jnp.ndarray:
    return image[..., :-1, :] - image[..., 1:, :]


def calc_smoothness(inv_depth: jnp.ndarray, image: jnp.ndarray):
    """Edge-aware smoothness terms (ref depth.py:139-170, single scale).

    Args:
      inv_depth: (b, 1, h, w)
      image: (b, 3, h, w)
    Returns:
      (smoothness_x, smoothness_y)
    """
    mean_inv = jnp.mean(inv_depth, axis=(2, 3), keepdims=True)
    norm_inv = inv_depth / jnp.clip(mean_inv, a_min=1e-6)
    dx = gradient_x(norm_inv)
    dy = gradient_y(norm_inv)
    wx = jnp.exp(-jnp.mean(jnp.abs(gradient_x(image)), axis=1, keepdims=True))
    wy = jnp.exp(-jnp.mean(jnp.abs(gradient_y(image)), axis=1, keepdims=True))
    return dx * wx, dy * wy
