"""Ray/point projection library (pure jnp).

TPU-native re-design of the reference's torch projection helpers
(/root/reference/ggrt/geometry/projection.py). All functions are
shape-polymorphic over leading batch dims, differentiable, and jit-safe
(no data-dependent control flow).

Conventions (identical to the reference):
  * Intrinsics are *normalized* 3x3 matrices: focal lengths and principal
    point are expressed in units of image size, so pixel coordinates live
    in [0, 1] x [0, 1] with x = column/width.
  * Extrinsics are camera-to-world (c2w) 4x4 matrices.
"""
from __future__ import annotations

import jax.numpy as jnp

_F32_EPS = float(jnp.finfo(jnp.float32).eps)


def homogenize_points(points: jnp.ndarray) -> jnp.ndarray:
    """(..., d) xyz -> (..., d+1) xyz1."""
    return jnp.concatenate([points, jnp.ones_like(points[..., :1])], axis=-1)


def homogenize_vectors(vectors: jnp.ndarray) -> jnp.ndarray:
    """(..., d) xyz -> (..., d+1) xyz0."""
    return jnp.concatenate([vectors, jnp.zeros_like(vectors[..., :1])], axis=-1)


def transform_rigid(homogeneous: jnp.ndarray, transformation: jnp.ndarray) -> jnp.ndarray:
    """Apply a rigid transform to homogeneous points/vectors: T @ x."""
    return jnp.einsum("...ij,...j->...i", transformation, homogeneous)


def transform_cam2world(homogeneous: jnp.ndarray, extrinsics: jnp.ndarray) -> jnp.ndarray:
    return transform_rigid(homogeneous, extrinsics)


def transform_world2cam(homogeneous: jnp.ndarray, extrinsics: jnp.ndarray) -> jnp.ndarray:
    return transform_rigid(homogeneous, invert_se3(extrinsics))


def invert_se3(T: jnp.ndarray) -> jnp.ndarray:
    """Closed-form inverse of an SE(3) matrix (..., 4, 4).

    Cheaper and better-conditioned than a general matrix inverse, and
    keeps the bottom row exact.
    """
    R = T[..., :3, :3]
    t = T[..., :3, 3]
    Rt = jnp.swapaxes(R, -1, -2)
    t_inv = -jnp.einsum("...ij,...j->...i", Rt, t)
    top = jnp.concatenate([Rt, t_inv[..., None]], axis=-1)
    bottom = jnp.broadcast_to(
        jnp.array([0.0, 0.0, 0.0, 1.0], dtype=T.dtype), (*top.shape[:-2], 1, 4)
    )
    return jnp.concatenate([top, bottom], axis=-2)


def invert_intrinsics(K: jnp.ndarray) -> jnp.ndarray:
    """Closed-form inverse of a pinhole intrinsics matrix (..., 3, 3)."""
    fx = K[..., 0, 0]
    fy = K[..., 1, 1]
    cx = K[..., 0, 2]
    cy = K[..., 1, 2]
    zeros = jnp.zeros_like(fx)
    ones = jnp.ones_like(fx)
    row0 = jnp.stack([1.0 / fx, zeros, -cx / fx], axis=-1)
    row1 = jnp.stack([zeros, 1.0 / fy, -cy / fy], axis=-1)
    row2 = jnp.stack([zeros, zeros, ones], axis=-1)
    return jnp.stack([row0, row1, row2], axis=-2)


def project_camera_space(
    points: jnp.ndarray,
    intrinsics: jnp.ndarray,
    epsilon: float = _F32_EPS,
    infinity: float = 1e8,
) -> jnp.ndarray:
    """Perspective-divide camera-space points and apply intrinsics.

    Parity with reference projection.py:47-56 (nan_to_num on infinities).
    """
    points = points / (points[..., -1:] + epsilon)
    points = jnp.nan_to_num(points, posinf=infinity, neginf=-infinity)
    points = jnp.einsum("...ij,...j->...i", intrinsics, points)
    return points[..., :-1]


def project(
    points: jnp.ndarray,
    extrinsics: jnp.ndarray,
    intrinsics: jnp.ndarray,
    epsilon: float = _F32_EPS,
) -> tuple[jnp.ndarray, jnp.ndarray]:
    """World points -> normalized image xy + in-front-of-camera mask."""
    points = homogenize_points(points)
    points = transform_world2cam(points, extrinsics)[..., :-1]
    in_front = points[..., -1] >= 0
    return project_camera_space(points, intrinsics, epsilon=epsilon), in_front


def unproject(coordinates: jnp.ndarray, z: jnp.ndarray, intrinsics: jnp.ndarray) -> jnp.ndarray:
    """Normalized image xy + depth -> camera-space points."""
    coordinates = homogenize_points(coordinates)
    directions = jnp.einsum("...ij,...j->...i", invert_intrinsics(intrinsics), coordinates)
    return directions * z[..., None]


def get_world_rays(
    coordinates: jnp.ndarray,
    extrinsics: jnp.ndarray,
    intrinsics: jnp.ndarray,
) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Normalized image xy -> world-space ray (origins, unit directions)."""
    directions = unproject(coordinates, jnp.ones_like(coordinates[..., 0]), intrinsics)
    directions = directions / jnp.linalg.norm(directions, axis=-1, keepdims=True)
    directions = transform_cam2world(homogenize_vectors(directions), extrinsics)[..., :-1]
    origins = jnp.broadcast_to(extrinsics[..., :-1, -1], directions.shape)
    return origins, directions


def sample_image_grid(shape: tuple[int, int], dtype=jnp.float32) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Pixel-center coordinates for an image.

    Returns:
      coordinates: (h, w, 2) float xy in (0, 1), x along width.
      indices: (h, w, 2) integer (row, col).
    """
    h, w = shape
    rows = jnp.arange(h)
    cols = jnp.arange(w)
    rr, cc = jnp.meshgrid(rows, cols, indexing="ij")
    indices = jnp.stack([rr, cc], axis=-1)
    x = (cc.astype(dtype) + 0.5) / w
    y = (rr.astype(dtype) + 0.5) / h
    coordinates = jnp.stack([x, y], axis=-1)
    return coordinates, indices


def intersect_rays(
    origins_x: jnp.ndarray,
    directions_x: jnp.ndarray,
    origins_y: jnp.ndarray,
    directions_y: jnp.ndarray,
    eps: float = 1e-5,
    inf: float = 1e10,
) -> jnp.ndarray:
    """Least-squares intersection of two ray bundles (parallel -> inf).

    Branch-free re-design of reference projection.py:176-230: instead of
    boolean-mask removal of parallel pairs (dynamic shapes), parallel pairs
    are solved anyway and overwritten with `inf` via a mask.
    """
    shape = jnp.broadcast_shapes(
        origins_x.shape, directions_x.shape, origins_y.shape, directions_y.shape
    )
    ox = jnp.broadcast_to(origins_x, shape)
    dx = jnp.broadcast_to(directions_x, shape)
    oy = jnp.broadcast_to(origins_y, shape)
    dy = jnp.broadcast_to(directions_y, shape)

    parallel = jnp.sum(dx * dy, axis=-1) > 1 - eps

    eye = jnp.eye(3, dtype=ox.dtype)

    def normal_mat(d):
        return d[..., :, None] * d[..., None, :] - eye

    nx = normal_mat(dx)
    ny = normal_mat(dy)
    lhs = nx + ny
    rhs = jnp.einsum("...ij,...j->...i", nx, ox) + jnp.einsum("...ij,...j->...i", ny, oy)
    # Regularize so parallel (singular) systems remain solvable; their result
    # is discarded by the mask below.
    lhs = lhs + jnp.where(parallel, 1.0, 0.0)[..., None, None] * eye
    solution = jnp.linalg.solve(lhs, rhs[..., None])[..., 0]
    return jnp.where(parallel[..., None], inf, solution)


def get_fov(intrinsics: jnp.ndarray) -> jnp.ndarray:
    """Field of view (fov_x, fov_y) from normalized intrinsics (..., 3, 3)."""
    k_inv = invert_intrinsics(intrinsics)

    def bearing(v):
        v = jnp.einsum("...ij,j->...i", k_inv, jnp.asarray(v, dtype=intrinsics.dtype))
        return v / jnp.linalg.norm(v, axis=-1, keepdims=True)

    left = bearing([0.0, 0.5, 1.0])
    right = bearing([1.0, 0.5, 1.0])
    top = bearing([0.5, 0.0, 1.0])
    bottom = bearing([0.5, 1.0, 1.0])
    fov_x = jnp.arccos(jnp.clip(jnp.sum(left * right, axis=-1), -1.0, 1.0))
    fov_y = jnp.arccos(jnp.clip(jnp.sum(top * bottom, axis=-1), -1.0, 1.0))
    return jnp.stack([fov_x, fov_y], axis=-1)
