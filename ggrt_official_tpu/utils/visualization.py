"""Visualization helpers (host-side numpy).

Parity targets: /root/reference/utils_loc.py colorize, and
/root/reference/ggrt/visualization/ (depth colormaps, camera frusta for
pose visualization — emitted as plain line-segment arrays instead of
visdom objects).
"""
from __future__ import annotations

import numpy as np


def colorize_depth(depth: np.ndarray, cmap_name: str = "jet", mask: np.ndarray | None = None) -> np.ndarray:
    """Depth map (h, w) -> color image (h, w, 3) float in [0, 1]."""
    import matplotlib.cm as cm

    depth = np.asarray(depth, np.float32)
    if mask is None:
        mask = np.isfinite(depth)
    vmin = depth[mask].min() if mask.any() else 0.0
    vmax = depth[mask].max() if mask.any() else 1.0
    norm = (depth - vmin) / max(vmax - vmin, 1e-8)
    cmap = cm.get_cmap(cmap_name)
    out = cmap(np.clip(norm, 0, 1))[..., :3]
    out[~mask] = 0.0
    return out.astype(np.float32)


def camera_frustum_lines(c2w: np.ndarray, intrinsics: np.ndarray, scale: float = 0.1) -> np.ndarray:
    """Line segments (n, 2, 3) drawing a camera frustum in world space.

    intrinsics normalized (3, 3); c2w (4, 4). Replaces the visdom camera
    visualizer (ref visualization/pose_visualizer.py) with raw geometry
    usable by any plotting frontend.
    """
    fx, fy = intrinsics[0, 0], intrinsics[1, 1]
    cx, cy = intrinsics[0, 2], intrinsics[1, 2]
    corners_img = np.array([[0, 0], [1, 0], [1, 1], [0, 1]], np.float32)
    dirs = np.stack(
        [(corners_img[:, 0] - cx) / fx, (corners_img[:, 1] - cy) / fy, np.ones(4)], axis=-1
    )
    corners_cam = dirs * scale
    corners_w = corners_cam @ c2w[:3, :3].T + c2w[:3, 3]
    center = np.broadcast_to(c2w[:3, 3], (4, 3))

    segments = []
    for i in range(4):
        segments.append([center[i], corners_w[i]])                 # rays
        segments.append([corners_w[i], corners_w[(i + 1) % 4]])    # image frame
    return np.asarray(segments, np.float32)


def side_by_side(*images: np.ndarray) -> np.ndarray:
    """Concatenate (3, h, w) images horizontally for logging."""
    return np.concatenate([np.asarray(im) for im in images], axis=-1)
