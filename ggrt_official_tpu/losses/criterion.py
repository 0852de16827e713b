"""RGB / depth training criteria (pure jnp).

Parity target: /root/reference/ggrt/loss/criterion.py.
"""
from __future__ import annotations

import jax.numpy as jnp

from ..geometry.depth import depth2inv

TINY = 1e-6


def img2mse(x: jnp.ndarray, y: jnp.ndarray, mask: jnp.ndarray | None = None) -> jnp.ndarray:
    if mask is None:
        return jnp.mean((x - y) ** 2)
    return jnp.sum((x - y) ** 2 * mask[..., None]) / (jnp.sum(mask) * x.shape[-1] + TINY)


def mse2psnr(mse) -> jnp.ndarray:
    return -10.0 * jnp.log10(jnp.maximum(mse, 1e-10))


def masked_l2_image_loss(outputs: dict, gt: dict) -> jnp.ndarray:
    """MSE between predicted and GT rgb (ref criterion.py:23-40)."""
    return img2mse(outputs["rgb"], gt["rgb"], outputs.get("mask"))


def self_sup_depth_loss(inv_depth_prior, rendered_depth, min_depth, max_depth) -> jnp.ndarray:
    """L1 between the IPO-Net inverse-depth prior and the rendered depth,
    inside the valid disparity band (ref criterion.py:82-94)."""
    min_disp = 1.0 / max_depth
    max_disp = 1.0 / min_depth
    valid = (inv_depth_prior > min_disp) & (inv_depth_prior < max_disp)
    valid = jnp.asarray(valid, inv_depth_prior.dtype)
    inv_rendered = depth2inv(rendered_depth)
    return jnp.mean(valid * jnp.abs(inv_depth_prior - inv_rendered))


def sup_depth_loss(inv_depths, gt_depth, min_depth, max_depth, gamma: float = 0.85) -> jnp.ndarray:
    """Iteration-weighted supervised depth loss (ref criterion.py:97-117).

    inv_depths: (n_iters, ...) stacked inverse depth predictions.
    """
    n = inv_depths.shape[0]
    min_disp = 1.0 / max_depth
    max_disp = 1.0 / min_depth
    gt_inv = depth2inv(gt_depth)
    valid = jnp.asarray((gt_inv > min_disp) & (gt_inv < max_disp), inv_depths.dtype)
    weights = gamma ** (n - 1 - jnp.arange(n))
    per_iter = jnp.mean(
        valid[None] * jnp.abs(gt_inv[None] - inv_depths), axis=tuple(range(1, inv_depths.ndim))
    )
    return jnp.sum(weights * per_iter) / jnp.sum(weights)
