"""SE(3)/SO(3) utilities (pure jnp).

Covers the reference's pose math (/root/reference/ggrt/pose_util.py): the
6-vector pose parameterization used by IPO-Net (translation ‖ euler angles,
`Pose.from_vec` at pose_util.py:143-158), axis-angle & euler conversions,
and Lie exp/log maps with Taylor fallbacks near theta=0.
"""
from __future__ import annotations

import jax.numpy as jnp


def skew(w: jnp.ndarray) -> jnp.ndarray:
    """(..., 3) -> (..., 3, 3) skew-symmetric matrix."""
    w0, w1, w2 = w[..., 0], w[..., 1], w[..., 2]
    zeros = jnp.zeros_like(w0)
    return jnp.stack(
        [
            jnp.stack([zeros, -w2, w1], axis=-1),
            jnp.stack([w2, zeros, -w0], axis=-1),
            jnp.stack([-w1, w0, zeros], axis=-1),
        ],
        axis=-2,
    )


def _safe_theta(theta_sq, eps=1e-8):
    """sqrt with a NaN-free gradient branch: the small-angle Taylor paths
    consume theta_sq directly, so the sqrt is only evaluated (and
    differentiated) where theta_sq is safely positive."""
    small = theta_sq < eps
    return small, jnp.sqrt(jnp.where(small, 1.0, theta_sq))


def _taylor_A_sq(theta_sq):
    """sin(θ)/θ as a function of θ², smooth (and AD-safe) at 0."""
    small, theta = _safe_theta(theta_sq)
    return jnp.where(small, 1.0 - theta_sq / 6.0, jnp.sin(theta) / theta)


def _taylor_B_sq(theta_sq):
    """(1-cos(θ))/θ² as a function of θ², AD-safe at 0."""
    small, theta = _safe_theta(theta_sq)
    ts_safe = jnp.where(small, 1.0, theta_sq)
    return jnp.where(small, 0.5 - theta_sq / 24.0, (1.0 - jnp.cos(theta)) / ts_safe)


def _taylor_C_sq(theta_sq):
    """(θ-sin(θ))/θ³ as a function of θ², AD-safe at 0."""
    small, theta = _safe_theta(theta_sq)
    ts_safe = jnp.where(small, 1.0, theta_sq)
    return jnp.where(
        small, 1.0 / 6.0 - theta_sq / 120.0, (theta - jnp.sin(theta)) / (ts_safe * theta)
    )


def _taylor_A(x):
    return _taylor_A_sq(x * x)


def _taylor_B(x):
    return _taylor_B_sq(x * x)


def _taylor_C(x):
    return _taylor_C_sq(x * x)


def axis_angle_to_R(v: jnp.ndarray) -> jnp.ndarray:
    """Axis-angle (..., 3) -> rotation matrix (..., 3, 3) (Rodrigues)."""
    theta_sq = jnp.sum(v * v, axis=-1)[..., None, None]
    wx = skew(v)
    eye = jnp.eye(3, dtype=v.dtype)
    return eye + _taylor_A_sq(theta_sq) * wx + _taylor_B_sq(theta_sq) * (wx @ wx)


def euler_angle_to_R(angle: jnp.ndarray) -> jnp.ndarray:
    """Euler angles (..., 3) = (x, y, z) -> R = Rx @ Ry @ Rz.

    Matches the reference convention (pose_util.py:52-81): rot_mat =
    xmat @ ymat @ zmat with each mat the standard rotation about its axis
    with the signs used there.
    """
    x, y, z = angle[..., 0], angle[..., 1], angle[..., 2]
    zeros = jnp.zeros_like(x)
    ones = jnp.ones_like(x)

    cz, sz = jnp.cos(z), jnp.sin(z)
    zmat = jnp.stack(
        [cz, -sz, zeros, sz, cz, zeros, zeros, zeros, ones], axis=-1
    ).reshape(*x.shape, 3, 3)

    cy, sy = jnp.cos(y), jnp.sin(y)
    ymat = jnp.stack(
        [cy, zeros, sy, zeros, ones, zeros, -sy, zeros, cy], axis=-1
    ).reshape(*x.shape, 3, 3)

    cx, sx = jnp.cos(x), jnp.sin(x)
    xmat = jnp.stack(
        [ones, zeros, zeros, zeros, cx, -sx, zeros, sx, cx], axis=-1
    ).reshape(*x.shape, 3, 3)

    return xmat @ ymat @ zmat


def pose_from_vec(vec: jnp.ndarray) -> jnp.ndarray:
    """6-vector (..., 6) = (tvec ‖ euler xyz) -> 4x4 SE(3) matrix.

    Parity with reference Pose.from_vec (pose_util.py:143-158): the first
    three entries are the translation, the last three euler angles.
    """
    tvec, rot = vec[..., :3], vec[..., 3:]
    R = euler_angle_to_R(rot)
    top = jnp.concatenate([R, tvec[..., None]], axis=-1)
    bottom = jnp.broadcast_to(
        jnp.array([0.0, 0.0, 0.0, 1.0], dtype=vec.dtype), (*top.shape[:-2], 1, 4)
    )
    return jnp.concatenate([top, bottom], axis=-2)


def so3_exp(w: jnp.ndarray) -> jnp.ndarray:
    return axis_angle_to_R(w)


def so3_log(R: jnp.ndarray, eps: float = 1e-7) -> jnp.ndarray:
    """SO(3) -> so(3) (..., 3). Safe away from theta = pi."""
    trace = R[..., 0, 0] + R[..., 1, 1] + R[..., 2, 2]
    theta = jnp.arccos(jnp.clip((trace - 1.0) / 2.0, -1.0 + eps, 1.0 - eps))[..., None, None]
    lnR = 0.5 / jnp.maximum(_taylor_A(theta), eps) * (R - jnp.swapaxes(R, -1, -2))
    return jnp.stack([lnR[..., 2, 1], lnR[..., 0, 2], lnR[..., 1, 0]], axis=-1)


def se3_exp(wu: jnp.ndarray) -> jnp.ndarray:
    """se(3) 6-vector (w ‖ u) -> SE(3) 4x4 matrix."""
    w, u = wu[..., :3], wu[..., 3:]
    wx = skew(w)
    theta_sq = jnp.sum(w * w, axis=-1)[..., None, None]
    eye = jnp.eye(3, dtype=wu.dtype)
    R = eye + _taylor_A_sq(theta_sq) * wx + _taylor_B_sq(theta_sq) * (wx @ wx)
    V = eye + _taylor_B_sq(theta_sq) * wx + _taylor_C_sq(theta_sq) * (wx @ wx)
    t = jnp.einsum("...ij,...j->...i", V, u)
    top = jnp.concatenate([R, t[..., None]], axis=-1)
    bottom = jnp.broadcast_to(
        jnp.array([0.0, 0.0, 0.0, 1.0], dtype=wu.dtype), (*top.shape[:-2], 1, 4)
    )
    return jnp.concatenate([top, bottom], axis=-2)


def se3_log(T: jnp.ndarray, eps: float = 1e-8) -> jnp.ndarray:
    """SE(3) -> se(3) 6-vector (w ‖ u)."""
    R, t = T[..., :3, :3], T[..., :3, 3]
    w = so3_log(R)
    wx = skew(w)
    theta = jnp.linalg.norm(w, axis=-1)[..., None, None]
    eye = jnp.eye(3, dtype=T.dtype)
    A = _taylor_A(theta)
    B = _taylor_B(theta)
    invV = eye - 0.5 * wx + (1.0 - A / (2.0 * B)) / (theta**2 + eps) * (wx @ wx)
    u = jnp.einsum("...ij,...j->...i", invV, t)
    return jnp.concatenate([w, u], axis=-1)


def compose(pose_a: jnp.ndarray, pose_b: jnp.ndarray) -> jnp.ndarray:
    """pose_new(x) = pose_b(pose_a(x)); both (..., 4, 4)."""
    return pose_b @ pose_a


def rotation_distance(R1: jnp.ndarray, R2: jnp.ndarray, eps: float = 1e-7) -> jnp.ndarray:
    """Angular distance between rotation matrices (radians)."""
    R_diff = R1 @ jnp.swapaxes(R2, -1, -2)
    trace = R_diff[..., 0, 0] + R_diff[..., 1, 1] + R_diff[..., 2, 2]
    return jnp.arccos(jnp.clip((trace - 1.0) / 2.0, -1.0 + eps, 1.0 - eps))


def relative_to_source_c2w(target_c2w: jnp.ndarray, rel_pose_vec: jnp.ndarray) -> jnp.ndarray:
    """Convert predicted target->source relative poses into source c2w matrices.

    Parity with reference Projector.get_train_poses (projection.py:44-64):
      R_ref = R_target @ R_rel^T ; t_ref = t_target - R_ref @ t_rel.

    Args:
      target_c2w: (..., 4, 4) target camera-to-world.
      rel_pose_vec: (..., 6) relative pose vectors (tvec ‖ euler).
    """
    rel = pose_from_vec(rel_pose_vec)
    R_rel, t_rel = rel[..., :3, :3], rel[..., :3, 3]
    R_t, t_t = target_c2w[..., :3, :3], target_c2w[..., :3, 3]
    R_ref = R_t @ jnp.swapaxes(R_rel, -1, -2)
    t_ref = t_t - jnp.einsum("...ij,...j->...i", R_ref, t_rel)
    top = jnp.concatenate([R_ref, t_ref[..., None]], axis=-1)
    bottom = jnp.broadcast_to(
        jnp.array([0.0, 0.0, 0.0, 1.0], dtype=target_c2w.dtype), (*top.shape[:-2], 1, 4)
    )
    return jnp.concatenate([top, bottom], axis=-2)
