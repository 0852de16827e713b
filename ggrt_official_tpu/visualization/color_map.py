"""Scalar-image colormapping.

Parity target: /root/reference/ggrt/visualization/color_map.py
(apply_color_map / apply_color_map_to_image via matplotlib colormaps).
The LUT is baked once per cmap and applied with a jnp gather, so mapped
images can stay on device inside jit (the reference round-trips through
matplotlib per call).
"""
from __future__ import annotations

import functools

import jax.numpy as jnp
import numpy as np


@functools.lru_cache(maxsize=None)
def _lut(cmap: str, n: int = 256) -> np.ndarray:
    import matplotlib

    cm = matplotlib.colormaps[cmap]
    return cm(np.linspace(0.0, 1.0, n))[:, :3].astype(np.float32)


def apply_color_map(x, cmap: str = "inferno"):
    """Values in [0, 1] (any shape) -> (..., 3) colors."""
    lut = jnp.asarray(_lut(cmap))
    idx = jnp.clip(jnp.asarray(x) * (lut.shape[0] - 1), 0, lut.shape[0] - 1)
    return lut[idx.astype(jnp.int32)]


def apply_color_map_to_image(image, cmap: str = "inferno"):
    """(..., h, w) scalar image -> (..., 3, h, w) color image."""
    colors = apply_color_map(image, cmap)                  # (..., h, w, 3)
    return jnp.moveaxis(colors, -1, -3)
