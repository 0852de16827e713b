"""Feature-map visualization via PCA projection to RGB.

Parity target: /root/reference/ggrt/visualization/feature_visualizer.py
(per-map PCA of (c, h, w) features onto 3 principal components, robust
percentile normalization). jnp SVD instead of sklearn.
"""
from __future__ import annotations

import jax.numpy as jnp


def visualize_features(features: jnp.ndarray, clip_pct: float = 2.0) -> jnp.ndarray:
    """(c, h, w) features -> (3, h, w) PCA-RGB in [0, 1]."""
    c, h, w = features.shape
    x = features.reshape(c, h * w).T                       # (p, c)
    x = x - x.mean(axis=0, keepdims=True)
    # Principal directions from the (c, c) covariance eigendecomposition.
    cov = x.T @ x / x.shape[0]
    _, vecs = jnp.linalg.eigh(cov)
    proj = x @ vecs[:, -3:][:, ::-1]                       # (p, 3) top-3
    lo = jnp.percentile(proj, clip_pct, axis=0)
    hi = jnp.percentile(proj, 100.0 - clip_pct, axis=0)
    proj = jnp.clip((proj - lo) / jnp.maximum(hi - lo, 1e-8), 0.0, 1.0)
    return proj.T.reshape(3, h, w)


def visualize_attention(attn: jnp.ndarray, image: jnp.ndarray, alpha: float = 0.6,
                        cmap: str = "inferno") -> jnp.ndarray:
    """Overlay an (h, w) attention/probability map on a (3, H, W) image."""
    import jax

    from .color_map import apply_color_map_to_image

    a = attn / jnp.maximum(attn.max(), 1e-8)
    heat = apply_color_map_to_image(a, cmap)               # (3, h, w)
    heat = jax.image.resize(heat, image.shape, method="bilinear")
    a_up = jax.image.resize(a[None], (1, *image.shape[1:]), method="bilinear")
    return image * (1.0 - alpha * a_up) + heat * (alpha * a_up)
