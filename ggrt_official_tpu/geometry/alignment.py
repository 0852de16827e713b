"""Trajectory alignment and pose-error metrics (pure jnp/numpy).

Parity target: /root/reference/ggrt/geometry/align_poses.py (Umeyama sim3
ATE alignment, align_ate_c2b_use_a2b) and the pose-error protocol of
eval_ggrt.py:277-282 / train_ggrt_stable.py:212-240.
"""
from __future__ import annotations

import jax.numpy as jnp

from .se3 import rotation_distance


def align_umeyama(model: jnp.ndarray, data: jnp.ndarray, known_scale: bool = False):
    """Umeyama least-squares sim3: model ≈ s * R @ data + t.

    Args:
      model, data: (n, 3) point sets.
    Returns:
      (s, R, t) with scalar s, (3, 3) R, (3,) t.
    """
    mu_m = model.mean(axis=0)
    mu_d = data.mean(axis=0)
    model_c = model - mu_m
    data_c = data - mu_d
    n = model.shape[0]

    C = (model_c.T @ data_c) / n
    sigma2 = jnp.mean(jnp.sum(data_c * data_c, axis=-1))
    U, D, Vt = jnp.linalg.svd(C)

    sign = jnp.sign(jnp.linalg.det(U) * jnp.linalg.det(Vt.T))
    S = jnp.diag(jnp.array([1.0, 1.0, 1.0]) * jnp.array([1.0, 1.0, sign]))
    R = U @ S @ Vt
    s = 1.0 if known_scale else jnp.trace(jnp.diag(D) @ S) / sigma2
    t = mu_m - s * (R @ mu_d)
    return s, R, t


def align_ate_c2b_use_a2b(
    traj_a: jnp.ndarray, traj_b: jnp.ndarray, traj_c: jnp.ndarray | None = None
) -> jnp.ndarray:
    """Align trajectory c to b using the sim3 fitted from a to b.

    All trajectories are (n, 4, 4) c2w matrices. Returns aligned (n, 4, 4).
    Parity with reference align_poses.py:142+: fits gt = s R est + t on the
    camera centers, then maps each c2w pose accordingly (rotation gets R @ R_c,
    translation s * R @ t_c + t; scale does not touch the rotation).
    """
    if traj_c is None:
        traj_c = traj_a
    s, R, t = align_umeyama(traj_b[:, :3, 3], traj_a[:, :3, 3])

    R_c = traj_c[:, :3, :3]
    t_c = traj_c[:, :3, 3]
    R_new = jnp.einsum("ij,njk->nik", R, R_c)
    t_new = s * jnp.einsum("ij,nj->ni", R, t_c) + t
    top = jnp.concatenate([R_new, t_new[..., None]], axis=-1)
    bottom = jnp.broadcast_to(
        jnp.array([0.0, 0.0, 0.0, 1.0], dtype=traj_c.dtype), (traj_c.shape[0], 1, 4)
    )
    return jnp.concatenate([top, bottom], axis=-2)


def evaluate_camera_alignment(aligned_pred: jnp.ndarray, poses_gt: jnp.ndarray) -> dict:
    """R/t error stats between aligned predictions and GT (both (n, 4, 4)).

    Returns degrees for rotation, same protocol as train_ggrt_stable.py:226-240.
    """
    R_err = rotation_distance(aligned_pred[:, :3, :3], poses_gt[:, :3, :3])
    t_err = jnp.linalg.norm(aligned_pred[:, :3, 3] - poses_gt[:, :3, 3], axis=-1)
    deg = 180.0 / jnp.pi
    return {
        "R_error_mean": jnp.mean(R_err) * deg,
        "R_error_med": jnp.median(R_err) * deg,
        "t_error_mean": jnp.mean(t_err),
        "t_error_med": jnp.median(t_err),
    }
