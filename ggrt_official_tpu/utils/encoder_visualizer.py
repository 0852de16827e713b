"""Encoder visualization dumps (host-side numpy).

Parity target: /root/reference/ggrt/model/pixelsplat/encoder/visualization/
encoder_visualizer_epipolar.py — epipolar sample overlays, predicted depth
maps, and Gaussian statistics, emitted as plain images/arrays instead of
wandb panels.
"""
from __future__ import annotations

import numpy as np

from .visualization import colorize_depth


def visualize_depth_maps(gaussians_means: np.ndarray, extrinsics: np.ndarray,
                         image_shape: tuple[int, int], gaussians_per_pixel: int) -> np.ndarray:
    """Per-pixel mean Gaussian depth as a colorized image.

    gaussians_means: (v*h*w*spp, 3) in encoder emission order; extrinsics
    (v, 4, 4). Returns (v, h, w, 3) color maps.
    """
    h, w = image_shape
    v = extrinsics.shape[0]
    means = gaussians_means.reshape(v, h, w, gaussians_per_pixel, 3)
    out = []
    for i in range(v):
        w2c = np.linalg.inv(extrinsics[i])
        pts = means[i].reshape(-1, 3) @ w2c[:3, :3].T + w2c[:3, 3]
        depth = pts[:, 2].reshape(h, w, gaussians_per_pixel).mean(-1)
        out.append(colorize_depth(depth))
    return np.stack(out)


def overlay_epipolar_samples(
    image: np.ndarray,            # (3, h, w) the view samples are drawn FROM
    xy_samples: np.ndarray,       # (r_sel, s, 2) normalized xy of samples
    color=(1.0, 0.2, 0.2),
) -> np.ndarray:
    """Scatter epipolar sample points onto an image (returns (3, h, w))."""
    out = np.array(image, copy=True)
    _, h, w = out.shape
    xs = np.clip((xy_samples[..., 0] * w).astype(int), 0, w - 1)
    ys = np.clip((xy_samples[..., 1] * h).astype(int), 0, h - 1)
    for c in range(3):
        out[c, ys.reshape(-1), xs.reshape(-1)] = color[c]
    return out


def gaussian_statistics(gaussians) -> dict:
    """Summary stats of an encoder output (means/scales/opacities)."""
    means = np.asarray(gaussians.means)
    opac = np.asarray(gaussians.opacities)
    scales = np.asarray(gaussians.scales)
    return {
        "n_gaussians": int(means.reshape(-1, 3).shape[0]),
        "mean_opacity": float(opac.mean()),
        "p95_opacity": float(np.percentile(opac, 95)),
        "mean_scale": float(scales.mean()),
        "max_scale": float(scales.max()),
        "means_bbox_min": means.reshape(-1, 3).min(0).tolist(),
        "means_bbox_max": means.reshape(-1, 3).max(0).tolist(),
    }


def visualize_attention(attn: np.ndarray, image_shape: tuple[int, int]) -> np.ndarray:
    """Per-head epipolar attention entropy maps (ref :130-203 simplified).

    attn: (r, heads, s) softmax weights per downscaled pixel token.
    Returns (heads, h, w, 3) colorized entropy (low entropy = peaky match).
    """
    h, w = image_shape
    r, heads, s = attn.shape
    assert r == h * w, (r, h, w)
    p = np.clip(attn, 1e-9, 1.0)
    entropy = -(p * np.log(p)).sum(-1) / np.log(s)    # (r, heads)
    return np.stack(
        [colorize_depth(entropy[:, i].reshape(h, w), cmap_name="viridis")
         for i in range(heads)]
    )


def visualize_overlaps(valid: np.ndarray, image_shape: tuple[int, int]) -> np.ndarray:
    """Fraction of other views whose epipolar segment overlaps each pixel
    (ref :231-269). valid: (v, ov, r) bool. Returns (v, h, w, 3)."""
    h, w = image_shape
    frac = np.asarray(valid, np.float32).mean(1)      # (v, r)
    return np.stack(
        [colorize_depth(f.reshape(h, w), cmap_name="magma") for f in frac]
    )


def visualize_probabilities(pdf: np.ndarray, image_shape: tuple[int, int]) -> np.ndarray:
    """Depth-bucket PDF summaries (ref :302-374): expectation and peakiness
    maps. pdf: (r, s). Returns (2, h, w, 3)."""
    h, w = image_shape
    r, s = pdf.shape
    buckets = (np.arange(s) + 0.5) / s
    expectation = (pdf * buckets).sum(-1) / np.clip(pdf.sum(-1), 1e-9, None)
    peak = pdf.max(-1)
    return np.stack([
        colorize_depth(expectation.reshape(h, w), cmap_name="turbo"),
        colorize_depth(peak.reshape(h, w), cmap_name="viridis"),
    ])


def visualize_gaussians(gaussians, image_shape: tuple[int, int], v: int,
                        gaussians_per_pixel: int) -> np.ndarray:
    """Opacity / scale maps per view (ref :270-301). Returns (v, 2, h, w, 3)."""
    h, w = image_shape
    opac = np.asarray(gaussians.opacities).reshape(v, h, w, -1).mean(-1)
    scales = np.asarray(gaussians.scales).reshape(v, h, w, -1, 3).mean((-1, -2))
    out = []
    for i in range(v):
        out.append(np.stack([
            colorize_depth(opac[i], cmap_name="viridis"),
            colorize_depth(scales[i], cmap_name="magma"),
        ]))
    return np.stack(out)
