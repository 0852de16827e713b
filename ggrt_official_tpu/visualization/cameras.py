"""Camera-frustum drawing and 3D scene projections.

Parity targets: /root/reference/ggrt/visualization/drawing/cameras.py
(draw_cameras: three axis-aligned orthographic views with frusta,
near/far planes, per-camera colors + axis labels) and
validation_in_3d.py (render_projections: project gaussians/points onto
the same three planes). Rebuilt on the jnp SDF drawing library
(drawing.py) — single fused pass per plane instead of the reference's
MSAA refinement.
"""
from __future__ import annotations

import jax.numpy as jnp
import numpy as np

from ..geometry.projection import unproject
from .annotation import add_label
from .drawing import draw_lines, draw_points
from .layout import hcat


def unproject_frustum_corners(extrinsics, intrinsics, depth):
    """(b, 4, 4), (b, 3, 3) normalized, (b,) depth -> (b, 4, 3) world
    corners (ref drawing/cameras.py:unproject_frustum_corners)."""
    corners = jnp.asarray(
        [[0.0, 0.0], [1.0, 0.0], [1.0, 1.0], [0.0, 1.0]], jnp.float32
    )
    b = extrinsics.shape[0]
    xy = jnp.broadcast_to(corners[None], (b, 4, 2))
    z = jnp.broadcast_to(jnp.asarray(depth, jnp.float32).reshape(-1, 1), (b, 4))
    cam = unproject(xy, z, intrinsics[:, None])
    world = jnp.einsum("bij,bpj->bpi", extrinsics[:, :3, :3], cam)
    return world + extrinsics[:, None, :3, 3]


def compute_aabb(extrinsics, intrinsics, near=None, far=None):
    """Scene AABB over camera origins and frustum corners
    (ref drawing/cameras.py:compute_aabb)."""
    pts = [extrinsics[:, :3, 3]]
    for d in (near, far):
        if d is not None:
            pts.append(
                unproject_frustum_corners(
                    extrinsics, intrinsics,
                    jnp.broadcast_to(jnp.asarray(d, jnp.float32), (extrinsics.shape[0],)),
                ).reshape(-1, 3)
            )
    allp = jnp.concatenate(pts, axis=0)
    return allp.min(axis=0), allp.max(axis=0)


def _equal_aabb_with_margin(minima, maxima, margin=0.1):
    midpoint = (maxima + minima) * 0.5
    span = (maxima - minima).max() * (1.0 + margin)
    return midpoint - 0.5 * span, midpoint + 0.5 * span


def draw_cameras(
    resolution: int,
    extrinsics,
    intrinsics,
    color,
    near=None,
    far=None,
    margin: float = 0.1,
    frustum_scale: float = 0.05,
) -> jnp.ndarray:
    """Render the camera set onto the three axis-aligned planes.

    Returns (3, 3, resolution, resolution): [projected axis, rgb, h, w],
    hcat-able; mirrors ref drawing/cameras.py:draw_cameras.
    """
    extrinsics = jnp.asarray(extrinsics, jnp.float32)
    intrinsics = jnp.asarray(intrinsics, jnp.float32)
    minima, maxima = compute_aabb(extrinsics, intrinsics, near, far)
    lo, hi = _equal_aabb_with_margin(minima, maxima, margin)
    views = _draw_camera_planes(
        resolution, extrinsics, intrinsics, color, near, far, lo, hi,
        frustum_scale, label=True,
    )
    h = min(v.shape[1] for v in views)
    return jnp.stack([v[:, :h] for v in views])


def _draw_camera_planes(
    resolution, extrinsics, intrinsics, color, near, far, lo, hi,
    frustum_scale, label: bool,
):
    """Camera frusta on the three axis planes within a CALLER-SUPPLIED
    AABB (lo, hi) — so overlays (render_projections) can draw points and
    frusta in one shared coordinate frame (ADVICE r3: computing separate
    AABBs left the composited frusta geometrically misaligned)."""
    b = extrinsics.shape[0]
    color = jnp.broadcast_to(jnp.asarray(color, jnp.float32).reshape(-1, 3), (b, 3))
    span = (hi - lo).max()

    corner_depth = jnp.full((b,), span * frustum_scale)
    frustum = unproject_frustum_corners(extrinsics, intrinsics, corner_depth)
    origins = extrinsics[:, :3, 3]

    views = []
    for axis in range(3):
        ax_x, ax_y = (axis + 1) % 3, (axis + 2) % 3

        def proj(p):
            return jnp.stack([p[..., ax_x], p[..., ax_y]], axis=-1)

        x_range = (float(lo[ax_x]), float(hi[ax_x]))
        y_range = (float(lo[ax_y]), float(hi[ax_y]))
        img = jnp.zeros((3, resolution, resolution), jnp.float32)

        fr = proj(frustum)                                  # (b, 4, 2)
        rolled = jnp.roll(fr, 1, axis=1)
        # Frustum base edges.
        img = draw_lines(
            img, fr.reshape(-1, 2), rolled.reshape(-1, 2),
            jnp.repeat(color, 4, axis=0), width=2,
            x_range=x_range, y_range=y_range,
        )
        # Apex-to-corner edges.
        apex = jnp.repeat(proj(origins), 4, axis=0)
        img = draw_lines(
            img, apex, fr.reshape(-1, 2), jnp.repeat(color, 4, axis=0),
            width=2, x_range=x_range, y_range=y_range,
        )
        # Near/far planes in dim gray (ref draws them at color 0.25).
        for d in (near, far):
            if d is not None:
                pc = proj(unproject_frustum_corners(
                    extrinsics, intrinsics,
                    jnp.broadcast_to(jnp.asarray(d, jnp.float32), (b,)),
                ))
                img = draw_lines(
                    img, pc.reshape(-1, 2), jnp.roll(pc, 1, axis=1).reshape(-1, 2),
                    0.25, width=1, x_range=x_range, y_range=y_range,
                )
        axis_name = "xyz"[ax_x] + "xyz"[ax_y]
        views.append(
            jnp.asarray(add_label(img, f"plane {axis_name}")) if label else img
        )
    return views


def render_projections(
    points,
    resolution: int,
    extrinsics=None,
    intrinsics=None,
    color=(0.35, 0.65, 1.0),
    radius: float = 1.0,
    margin: float = 0.1,
) -> jnp.ndarray:
    """Project a 3D point set (n, 3) (gaussian means) onto the three
    axis-aligned planes, optionally with camera frusta on top — the
    offline analogue of ref validation_in_3d.py:render_projections.

    Returns (3, 3, resolution, resolution)."""
    points = jnp.asarray(points, jnp.float32)
    # ONE shared AABB over points AND camera frusta (ADVICE r3: separate
    # frames left the overlaid frusta misaligned with the points).
    pts_min, pts_max = points.min(axis=0), points.max(axis=0)
    if extrinsics is not None and intrinsics is not None:
        extrinsics = jnp.asarray(extrinsics, jnp.float32)
        intrinsics = jnp.asarray(intrinsics, jnp.float32)
        cam_min, cam_max = compute_aabb(extrinsics, intrinsics)
        pts_min = jnp.minimum(pts_min, cam_min)
        pts_max = jnp.maximum(pts_max, cam_max)
    lo, hi = _equal_aabb_with_margin(pts_min, pts_max, margin)

    views = []
    for axis in range(3):
        ax_x, ax_y = (axis + 1) % 3, (axis + 2) % 3
        xy = jnp.stack([points[:, ax_x], points[:, ax_y]], axis=-1)
        img = jnp.zeros((3, resolution, resolution), jnp.float32)
        img = draw_points(
            img, xy, color, radius=radius,
            x_range=(float(lo[ax_x]), float(hi[ax_x])),
            y_range=(float(lo[ax_y]), float(hi[ax_y])),
        )
        views.append(img)
    out = jnp.stack(views)
    if extrinsics is not None and intrinsics is not None:
        # Label-free planes in the SAME frame; no crop needed (the label
        # strip previously chopped the frustum image bottom, ADVICE r3).
        cams = jnp.stack(_draw_camera_planes(
            resolution, extrinsics, intrinsics,
            jnp.ones((extrinsics.shape[0], 3)), None, None, lo, hi,
            frustum_scale=0.05, label=False,
        ))
        out = jnp.maximum(out, cams)
    return out


def side_by_side(views) -> jnp.ndarray:
    """(3, 3, h, w) plane stack -> one (3, h, 3w+gaps) strip."""
    return hcat(*[views[i] for i in range(views.shape[0])])


def plot_cameras_matplotlib(c2ws: np.ndarray, out_path: str | None = None,
                            gt_c2ws: np.ndarray | None = None):
    """3D matplotlib camera plot — interactive replacement for the
    reference's visdom pose viewer (ref base/trainer.py:142-156). Kept
    host-side; see utils/visualization.py:plot_cameras for the legacy
    wrapper."""
    from ..utils.visualization import plot_cameras as _plot

    return _plot(c2ws, out_path=out_path, gt_c2ws=gt_c2ws)
