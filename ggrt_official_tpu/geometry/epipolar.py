"""Epipolar line projection (pure jnp, fully branch-free).

Re-design of the reference's case-analysis implementation
(/root/reference/ggrt/geometry/epipolar_lines.py:157-251). The reference
builds the result with boolean-mask writes over the 4 (min_valid, max_valid)
cases; here the same case analysis is expressed with `jnp.where` so a single
traced expression covers every ray — the XLA/TPU-friendly formulation.
"""
from __future__ import annotations

from typing import NamedTuple, Optional

import jax.numpy as jnp

from .projection import (
    get_world_rays,
    homogenize_points,
    homogenize_vectors,
    intersect_rays,
    invert_se3,
    project_camera_space,
)


class PointProjection(NamedTuple):
    t: jnp.ndarray        # ray parameter
    xy: jnp.ndarray       # normalized image xy
    valid: jnp.ndarray    # in-bounds & in-front & positive-t


class RaySegmentProjection(NamedTuple):
    t_min: jnp.ndarray
    t_max: jnp.ndarray
    xy_min: jnp.ndarray
    xy_max: jnp.ndarray
    overlaps_image: jnp.ndarray


def _is_in_bounds(xy: jnp.ndarray, epsilon: float = 1e-6) -> jnp.ndarray:
    return jnp.all(xy >= -epsilon, axis=-1) & jnp.all(xy <= 1 + epsilon, axis=-1)


def _is_in_front_of_camera(xyz: jnp.ndarray, epsilon: float = 1e-6) -> jnp.ndarray:
    return xyz[..., -1] > -epsilon


def _is_positive_t(t: jnp.ndarray, epsilon: float = 1e-6) -> jnp.ndarray:
    return t > -epsilon


def _intersect_image_coordinate(
    intrinsics: jnp.ndarray,
    origins: jnp.ndarray,
    directions: jnp.ndarray,
    dim: int,
    coordinate_value: float,
) -> PointProjection:
    """Intersect the projected ray with an image-frame line x=v or y=v.

    Math parity with reference epipolar_lines.py:55-104. `dim` is 0 for a
    vertical line (fixed x), 1 for a horizontal line (fixed y).
    """
    other_dim = 1 - dim
    fs = intrinsics[..., dim, dim]
    fo = intrinsics[..., other_dim, other_dim]
    cs = intrinsics[..., dim, 2]
    co = intrinsics[..., other_dim, 2]
    os_ = origins[..., dim]
    oo = origins[..., other_dim]
    ds = directions[..., dim]
    do = directions[..., other_dim]
    oz = origins[..., 2]
    dz = directions[..., 2]
    c = (coordinate_value - cs) / fs

    t = (c * oz - os_) / (ds - c * dz)
    coord_other = co + fo * (oo * (c * dz - ds) + do * (os_ - c * oz)) / (dz * os_ - ds * oz)
    coord_same = jnp.full_like(coord_other, coordinate_value)
    if dim == 0:
        xy = jnp.stack([coord_same, coord_other], axis=-1)
    else:
        xy = jnp.stack([coord_other, coord_same], axis=-1)
    xyz = origins + t[..., None] * directions
    valid = _is_in_bounds(xy) & _is_in_front_of_camera(xyz) & _is_positive_t(t)
    # Invalid entries may hold inf/nan; sanitize so downstream arithmetic
    # (lerp between min/max) stays finite.
    t = jnp.nan_to_num(t, posinf=1e10, neginf=-1e10)
    xy = jnp.nan_to_num(xy, posinf=1e4, neginf=-1e4)
    return PointProjection(t, xy, valid)


def _reduce_projections(projections: list[PointProjection], reduction: str) -> PointProjection:
    """Pick, per-ray, the intersection with the min/max t among the valid ones."""
    t = jnp.stack([p.t for p in projections], axis=0)
    xy = jnp.stack([p.xy for p in projections], axis=0)
    valid = jnp.stack([p.valid for p in projections], axis=0)

    lowest = jnp.inf if reduction == "min" else -jnp.inf
    t_masked = jnp.where(valid, t, lowest)
    selector = jnp.argmin(t_masked, axis=0) if reduction == "min" else jnp.argmax(t_masked, axis=0)

    take = lambda arr: jnp.take_along_axis(arr, selector[None, ...], axis=0)[0]
    take2 = lambda arr: jnp.take_along_axis(arr, selector[None, ..., None], axis=0)[0]
    return PointProjection(take(t_masked), take2(xy), take(valid))


def _compute_point_projection(
    xyz: jnp.ndarray, t: jnp.ndarray, intrinsics: jnp.ndarray
) -> PointProjection:
    xy = project_camera_space(xyz, intrinsics)
    valid = _is_in_bounds(xy) & _is_in_front_of_camera(xyz) & _is_positive_t(t)
    return PointProjection(t, xy, valid)


def project_rays(
    origins: jnp.ndarray,
    directions: jnp.ndarray,
    extrinsics: jnp.ndarray,
    intrinsics: jnp.ndarray,
    near: Optional[jnp.ndarray] = None,
    far: Optional[jnp.ndarray] = None,
    epsilon: float = 1e-6,
) -> RaySegmentProjection:
    """Project world-space rays into another camera, clipping the epipolar
    segment to the image frame (and optionally to the near/far planes).

    Shapes broadcast: origins/directions (..., 3), extrinsics (..., 4, 4),
    intrinsics (..., 3, 3), near/far (...).
    """
    world_to_cam = invert_se3(extrinsics)
    origins_cam = jnp.einsum("...ij,...j->...i", world_to_cam, homogenize_points(origins))[..., :3]
    directions_cam = jnp.einsum(
        "...ij,...j->...i", world_to_cam, homogenize_vectors(directions)
    )[..., :3]

    frame_intersections = [
        _intersect_image_coordinate(intrinsics, origins_cam, directions_cam, 0, 0.0),
        _intersect_image_coordinate(intrinsics, origins_cam, directions_cam, 0, 1.0),
        _intersect_image_coordinate(intrinsics, origins_cam, directions_cam, 1, 0.0),
        _intersect_image_coordinate(intrinsics, origins_cam, directions_cam, 1, 1.0),
    ]
    fi_min = _reduce_projections(frame_intersections, "min")
    fi_max = _reduce_projections(frame_intersections, "max")

    batch_shape = fi_min.t.shape

    if near is None:
        # Projection at zero depth; substitute the direction when the origin
        # coincides with the camera (ray starts at the camera center).
        mask_depth_zero = origins_cam[..., -1] < epsilon
        mask_at_camera = jnp.linalg.norm(origins_cam, axis=-1) < epsilon
        origins_for_projection = jnp.where(
            mask_at_camera[..., None], directions_cam, origins_cam
        )
        at_zero = _compute_point_projection(
            origins_for_projection, jnp.zeros(batch_shape, origins_cam.dtype), intrinsics
        )
        at_zero = at_zero._replace(
            valid=at_zero.valid & ~(mask_depth_zero & ~mask_at_camera)
        )
    else:
        t_near = jnp.broadcast_to(near, batch_shape)
        at_zero = _compute_point_projection(
            origins_cam + t_near[..., None] * directions_cam, t_near, intrinsics
        )

    if far is None:
        # Projection at infinite depth == projecting the direction vector.
        at_infinity = _compute_point_projection(
            directions_cam, jnp.full(batch_shape, jnp.inf, origins_cam.dtype), intrinsics
        )
    else:
        t_far = jnp.broadcast_to(far, batch_shape)
        at_infinity = _compute_point_projection(
            origins_cam + t_far[..., None] * directions_cam, t_far, intrinsics
        )

    # Case analysis via where: if the endpoint projection is valid use it,
    # otherwise fall back to the frame intersection.
    def pick(valid, endpoint: PointProjection, frame: PointProjection):
        t = jnp.where(valid, endpoint.t, frame.t)
        xy = jnp.where(valid[..., None], endpoint.xy, frame.xy)
        ok = jnp.where(valid, endpoint.valid, frame.valid)
        return t, xy, ok

    t_min, xy_min, min_ok = pick(at_zero.valid, at_zero, fi_min)
    t_max, xy_max, max_ok = pick(at_infinity.valid, at_infinity, fi_max)

    return RaySegmentProjection(
        t_min=t_min,
        t_max=t_max,
        xy_min=xy_min,
        xy_max=xy_max,
        overlaps_image=min_ok & max_ok,
    )


def lift_to_3d(
    origins: jnp.ndarray,
    directions: jnp.ndarray,
    xy: jnp.ndarray,
    extrinsics: jnp.ndarray,
    intrinsics: jnp.ndarray,
) -> jnp.ndarray:
    """3D positions of 2D points on the epipolar lines (ref :264-277)."""
    xy_origins, xy_directions = get_world_rays(xy, extrinsics, intrinsics)
    return intersect_rays(origins, directions, xy_origins, xy_directions)


def get_depth(
    origins: jnp.ndarray,
    directions: jnp.ndarray,
    xy: jnp.ndarray,
    extrinsics: jnp.ndarray,
    intrinsics: jnp.ndarray,
) -> jnp.ndarray:
    """Depths (distance from ray origin) of 2D epipolar samples (ref :280-292)."""
    xyz = lift_to_3d(origins, directions, xy, extrinsics, intrinsics)
    return jnp.linalg.norm(xyz - origins, axis=-1)
