"""SSIM (pure jnp).

Two variants for parity with the reference:
  * `ssim_photometric`: 3x3 average-pool + reflection padding, C1=1e-4,
    C2=9e-4 — matches the photometric-loss SSIM
    (/root/reference/ggrt/loss/photometric_loss.py:143-182).
  * `ssim_metric`: 11x11 Gaussian window — matches the eval metric
    (/root/reference/ggrt/loss/ssim_torch.py).
"""
from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np


def _avg_pool3(x: jnp.ndarray) -> jnp.ndarray:
    """3x3/stride-1 average pool after reflection padding; (b, c, h, w)."""
    x = jnp.pad(x, ((0, 0), (0, 0), (1, 1), (1, 1)), mode="reflect")
    k = jnp.ones((3, 3), x.dtype) / 9.0
    return jax.lax.conv_general_dilated(
        x,
        jnp.broadcast_to(k, (x.shape[1], 1, 3, 3)),
        window_strides=(1, 1),
        padding="VALID",
        feature_group_count=x.shape[1],
        dimension_numbers=("NCHW", "OIHW", "NCHW"),
    )


def ssim_photometric(x: jnp.ndarray, y: jnp.ndarray, C1: float = 1e-4, C2: float = 9e-4) -> jnp.ndarray:
    """Per-pixel SSIM map (b, c, h, w), photometric-loss flavor."""
    mu_x = _avg_pool3(x)
    mu_y = _avg_pool3(y)
    mu_xy = mu_x * mu_y
    mu_xx = mu_x * mu_x
    mu_yy = mu_y * mu_y
    sigma_x = _avg_pool3(x * x) - mu_xx
    sigma_y = _avg_pool3(y * y) - mu_yy
    sigma_xy = _avg_pool3(x * y) - mu_xy
    v1 = 2.0 * sigma_xy + C2
    v2 = sigma_x + sigma_y + C2
    return ((2.0 * mu_xy + C1) * v1) / ((mu_xx + mu_yy + C1) * v2)


def _gaussian_window(size: int, sigma: float) -> np.ndarray:
    g = np.exp(-((np.arange(size) - size // 2) ** 2) / (2.0 * sigma**2))
    g = g / g.sum()
    return np.outer(g, g)


def ssim_metric(img1: jnp.ndarray, img2: jnp.ndarray, window_size: int = 11) -> jnp.ndarray:
    """Mean SSIM over an image pair (b, c, h, w), values in [0, 1]."""
    c = img1.shape[1]
    window = jnp.asarray(_gaussian_window(window_size, 1.5), img1.dtype)
    kernel = jnp.broadcast_to(window, (c, 1, window_size, window_size))
    pad = window_size // 2

    def filt(x):
        return jax.lax.conv_general_dilated(
            x,
            kernel,
            window_strides=(1, 1),
            padding=[(pad, pad), (pad, pad)],
            feature_group_count=c,
            dimension_numbers=("NCHW", "OIHW", "NCHW"),
        )

    mu1 = filt(img1)
    mu2 = filt(img2)
    mu1_sq = mu1 * mu1
    mu2_sq = mu2 * mu2
    mu12 = mu1 * mu2
    sigma1 = filt(img1 * img1) - mu1_sq
    sigma2 = filt(img2 * img2) - mu2_sq
    sigma12 = filt(img1 * img2) - mu12
    C1, C2 = 0.01**2, 0.03**2
    ssim_map = ((2 * mu12 + C1) * (2 * sigma12 + C2)) / (
        (mu1_sq + mu2_sq + C1) * (sigma1 + sigma2 + C2)
    )
    return jnp.mean(ssim_map)
