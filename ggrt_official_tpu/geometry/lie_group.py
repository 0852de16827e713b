"""Quaternion / Lie-group library (functional JAX port of the reference's
class-based lib at /root/reference/ggrt/geometry/lie_group/: so3.py, so3q.py,
se3.py, se3q.py, se3_common.py — SO(3)/SE(3) in both matrix and quaternion
parametrizations, with the analytic Jacobians the reference exposes for
pose-graph optimization).

Design departures from the reference (which wraps torch tensors in
LieGroupBase subclasses with in-place `make_valid` etc.): everything here is
a pure function over batched jnp arrays — `(..., 4)` unit quaternions
(w, x, y, z), `(..., 7)` quat+trans vectors, `(..., 3, 3)` / `(..., 4, 4)`
matrices — so every op jits, vmaps, and differentiates. Small-angle branches
use the same Taylor guards as geometry/se3.py.
"""
from __future__ import annotations

import jax.numpy as jnp

from .se3 import (
    _taylor_A_sq,
    _taylor_B_sq,
    _taylor_C_sq,
    se3_exp,
    se3_log,
    skew,
    so3_exp,
    so3_log,
)

# ---------------------------------------------------------------------------
# Quaternions (w, x, y, z), scalar-first like the reference
# (lie_group/so3q.py and se3_common.py:78-99 use pytorch3d's convention).


def quat_identity(shape=()) -> jnp.ndarray:
    q = jnp.zeros(shape + (4,))
    return q.at[..., 0].set(1.0)


def quat_normalize(q: jnp.ndarray, eps: float = 1e-12) -> jnp.ndarray:
    n = jnp.linalg.norm(q, axis=-1, keepdims=True)
    q = q / jnp.maximum(n, eps)
    # Canonical hemisphere (w >= 0), matching normalize_quat_trans
    # (se3_common.py:12-21) so log maps stay in (-pi, pi].
    return jnp.where(q[..., 0:1] < 0, -q, q)


def quat_mul(a: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    aw, ax, ay, az = (a[..., i] for i in range(4))
    bw, bx, by, bz = (b[..., i] for i in range(4))
    return jnp.stack(
        [
            aw * bw - ax * bx - ay * by - az * bz,
            aw * bx + ax * bw + ay * bz - az * by,
            aw * by - ax * bz + ay * bw + az * bx,
            aw * bz + ax * by - ay * bx + az * bw,
        ],
        axis=-1,
    )


def quat_conj(q: jnp.ndarray) -> jnp.ndarray:
    return q * jnp.array([1.0, -1.0, -1.0, -1.0])


def quat_rotate(q: jnp.ndarray, v: jnp.ndarray) -> jnp.ndarray:
    """Rotate points `v` (..., 3) by unit quaternion(s) `q` (..., 4)."""
    qv = q[..., 1:]
    w = q[..., 0:1]
    t = 2.0 * jnp.cross(qv, v)
    return v + w * t + jnp.cross(qv, t)


def quat_to_R(q: jnp.ndarray) -> jnp.ndarray:
    """Unit quaternion -> rotation matrix (se3_common.py quattrans2mat)."""
    w, x, y, z = (q[..., i] for i in range(4))
    xx, yy, zz = x * x, y * y, z * z
    wx, wy, wz = w * x, w * y, w * z
    xy, xz, yz = x * y, x * z, y * z
    return jnp.stack(
        [
            jnp.stack([1 - 2 * (yy + zz), 2 * (xy - wz), 2 * (xz + wy)], -1),
            jnp.stack([2 * (xy + wz), 1 - 2 * (xx + zz), 2 * (yz - wx)], -1),
            jnp.stack([2 * (xz - wy), 2 * (yz + wx), 1 - 2 * (xx + yy)], -1),
        ],
        axis=-2,
    )


def R_to_quat(R: jnp.ndarray) -> jnp.ndarray:
    """Rotation matrix -> unit quaternion, branch-free Shepperd variant
    (replaces the reference's pytorch3d matrix_to_quaternion used by
    se3_common.py mat2quattrans). Stable for all trace signs."""
    m00, m01, m02 = R[..., 0, 0], R[..., 0, 1], R[..., 0, 2]
    m10, m11, m12 = R[..., 1, 0], R[..., 1, 1], R[..., 1, 2]
    m20, m21, m22 = R[..., 2, 0], R[..., 2, 1], R[..., 2, 2]
    # Four candidate 4*|q_i|^2 magnitudes.
    qw2 = jnp.maximum(1 + m00 + m11 + m22, 0.0)
    qx2 = jnp.maximum(1 + m00 - m11 - m22, 0.0)
    qy2 = jnp.maximum(1 - m00 + m11 - m22, 0.0)
    qz2 = jnp.maximum(1 - m00 - m11 + m22, 0.0)
    # Candidate quaternions assembled from each pivot (unnormalized).
    qw = jnp.stack([qw2, m21 - m12, m02 - m20, m10 - m01], -1)
    qx = jnp.stack([m21 - m12, qx2, m01 + m10, m02 + m20], -1)
    qy = jnp.stack([m02 - m20, m01 + m10, qy2, m12 + m21], -1)
    qz = jnp.stack([m10 - m01, m02 + m20, m12 + m21, qz2], -1)
    mags = jnp.stack([qw2, qx2, qy2, qz2], -1)
    best = jnp.argmax(mags, axis=-1)
    cands = jnp.stack([qw, qx, qy, qz], axis=-2)  # (..., 4 pivots, 4)
    q = jnp.take_along_axis(cands, best[..., None, None].repeat(4, -1), -2)[..., 0, :]
    return quat_normalize(q)


def quat_exp(w: jnp.ndarray) -> jnp.ndarray:
    """so(3) tangent (..., 3) -> unit quaternion: q = [cos θ/2, sin(θ/2)·ŵ].

    Taylor-guarded sinc keeps gradients finite at θ=0 (so3q.py exp)."""
    theta_sq = jnp.sum(w * w, axis=-1, keepdims=True)
    half_sq = theta_sq / 4.0
    # cos(θ/2) and sin(θ/2)/θ, Taylor-guarded near 0 (cos∘sqrt is 0/0 in
    # the gradient at exactly θ=0 — same hazard class as se3._safe_theta).
    small = theta_sq < 1e-8
    theta_safe = jnp.sqrt(jnp.where(small, 1.0, theta_sq))
    cos_half = jnp.where(
        small, 1.0 - half_sq / 2.0 + half_sq * half_sq / 24.0,
        jnp.cos(theta_safe / 2.0),
    )
    sinc_half = _taylor_A_sq(half_sq) / 2.0
    return quat_normalize(jnp.concatenate([cos_half, sinc_half * w], axis=-1))


def quat_log(q: jnp.ndarray, eps: float = 1e-8) -> jnp.ndarray:
    """Unit quaternion -> so(3) tangent (..., 3) (so3q.py log)."""
    q = quat_normalize(q)
    w = jnp.clip(q[..., 0:1], -1.0, 1.0)
    v = q[..., 1:]
    vn = jnp.linalg.norm(v, axis=-1, keepdims=True)
    half = jnp.arctan2(vn, w)  # in [0, pi/2] after hemisphere fix
    scale = jnp.where(vn > eps, 2.0 * half / jnp.maximum(vn, eps), 2.0 / jnp.maximum(w, eps))
    return scale * v


# ---------------------------------------------------------------------------
# SE(3) as quat+trans 7-vectors [qw qx qy qz tx ty tz] (se3q.py data layout).


def se3q_identity(shape=()) -> jnp.ndarray:
    v = jnp.zeros(shape + (7,))
    return v.at[..., 0].set(1.0)


def se3q_from_matrix(T: jnp.ndarray) -> jnp.ndarray:
    return jnp.concatenate([R_to_quat(T[..., :3, :3]), T[..., :3, 3]], axis=-1)


def se3q_to_matrix(v: jnp.ndarray) -> jnp.ndarray:
    R = quat_to_R(quat_normalize(v[..., :4]))
    T = jnp.zeros(v.shape[:-1] + (4, 4))
    T = T.at[..., :3, :3].set(R)
    T = T.at[..., :3, 3].set(v[..., 4:])
    return T.at[..., 3, 3].set(1.0)


def se3q_mul(a: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    q = quat_mul(a[..., :4], b[..., :4])
    t = quat_rotate(a[..., :4], b[..., 4:]) + a[..., 4:]
    return jnp.concatenate([quat_normalize(q), t], axis=-1)


def se3q_inv(v: jnp.ndarray) -> jnp.ndarray:
    qi = quat_conj(quat_normalize(v[..., :4]))
    return jnp.concatenate([qi, -quat_rotate(qi, v[..., 4:])], axis=-1)


def se3q_transform(v: jnp.ndarray, pts: jnp.ndarray) -> jnp.ndarray:
    return quat_rotate(v[..., None, :4], pts) + v[..., None, 4:]


def se3q_exp(wu: jnp.ndarray) -> jnp.ndarray:
    """se(3) tangent (..., 6) [ω‖u] -> quat+trans (matches se3_exp)."""
    return se3q_from_matrix(se3_exp(wu))


def se3q_log(v: jnp.ndarray) -> jnp.ndarray:
    return se3_log(se3q_to_matrix(v))


# ---------------------------------------------------------------------------
# Retractions & analytic Jacobians (liegroupbase.py boxplus_*, se3.py:183-233).


def so3_left_jacobian(w: jnp.ndarray) -> jnp.ndarray:
    """J_l(ω): d/dδ log(exp(δ)·exp(ω)) at δ=0 is J_l(ω)^{-1}; exp(ω+J_l δ) ≈
    exp(δ)exp(ω). Closed form A'/B'/C' series shared with se3_exp's V."""
    theta_sq = jnp.sum(w * w, axis=-1)[..., None, None]
    W = skew(w)
    I = jnp.broadcast_to(jnp.eye(3), W.shape)
    return I + _taylor_B_sq(theta_sq) * W + _taylor_C_sq(theta_sq) * (W @ W)


def so3_right_jacobian(w: jnp.ndarray) -> jnp.ndarray:
    return jnp.swapaxes(so3_left_jacobian(w), -1, -2)


def boxplus_left(T: jnp.ndarray, delta: jnp.ndarray) -> jnp.ndarray:
    """exp(δ) · T for (..., 4, 4) poses, δ (..., 6) (liegroupbase.py:51)."""
    return se3_exp(delta) @ T


def boxplus_right(T: jnp.ndarray, delta: jnp.ndarray) -> jnp.ndarray:
    """T · exp(δ) (liegroupbase.py:58)."""
    return T @ se3_exp(delta)


def se3_adjoint(T: jnp.ndarray) -> jnp.ndarray:
    """Ad_T (6×6): maps right-tangent to left-tangent, [R 0; [t]×R R]."""
    R = T[..., :3, :3]
    t = T[..., :3, 3]
    top = jnp.concatenate([R, jnp.zeros_like(R)], axis=-1)
    bot = jnp.concatenate([skew(t) @ R, R], axis=-1)
    return jnp.concatenate([top, bot], axis=-2)


def jacob_expeD_de(D: jnp.ndarray) -> jnp.ndarray:
    """d vec(exp(ε)·D) / dε at ε=0 — (..., 12, 6), row-major over D's top
    3×4 block (reference se3.py:183-209 jacob_expeD_de).

    exp(ε)·D to first order is (I + [ω]× , u applied)·D: row i of the
    rotation block differentiates to -[D_row]× wrt ω; the translation
    column adds I wrt u."""
    R = D[..., :3, :3]
    t = D[..., :3, 3:4]
    M = jnp.concatenate([R, t], axis=-1)  # (..., 3, 4) columns
    batch = D.shape[:-2]
    J = jnp.zeros(batch + (3, 4, 6))
    # d(exp(ε)D)[i, j] / dω = (-[col_j]× applied to row i) → for each column
    # j of M: d col_j / dω = -skew(col_j), d col_j / du = I for j == 3.
    cols = jnp.swapaxes(M, -1, -2)  # (..., 4, 3)
    dcol_dw = -skew(cols)  # (..., 4, 3, 3)
    J = J.at[..., :, :, :3].set(jnp.swapaxes(dcol_dw, -3, -2))
    J = J.at[..., :, 3, 3:].set(jnp.broadcast_to(jnp.eye(3), batch + (3, 3)))
    return J.reshape(batch + (12, 6))


def jacob_Dexpe_de(D: jnp.ndarray) -> jnp.ndarray:
    """d vec(D·exp(ε)) / dε at ε=0 — (..., 12, 6) (se3.py:211-232)."""
    R = D[..., :3, :3]
    batch = D.shape[:-2]
    J = jnp.zeros(batch + (3, 4, 6))
    # D·exp(ε) ≈ D + D·[ε]^: rotation cols perturb by R·(-[e_j]× ...)
    # column j<3 of the rotation block: d/dω = R @ d([ω]×)[:, j]/dω.
    # d([ω]× e_j)/dω = -skew(e_j)
    eye3 = jnp.eye(3)
    for j in range(3):
        dcol = R @ (-skew(eye3[j]))  # (..., 3, 3)
        J = J.at[..., :, j, :3].set(dcol)
    J = J.at[..., :, 3, 3:].set(R)
    return J.reshape(batch + (12, 6))
