"""Camera trajectory generators (pure jnp/numpy).

Parity targets: /root/reference/ggrt/model/pixelsplat/wobble.py
(generate_wobble), .../interpolatation.py (pose/intrinsic interpolation),
and ggrt/visualization/camera_trajectory (spiral paths for the video
renderers eval/render_llff_video.py).
"""
from __future__ import annotations

import jax.numpy as jnp
import numpy as np

from ..geometry.se3 import so3_exp, so3_log


def generate_wobble_transformation(radius, t, num_rotations: int = 1,
                                   scale_radius_with_t: bool = True) -> jnp.ndarray:
    """(t,) times -> (t, 4, 4) wobble transforms (ref wobble.py)."""
    tf = jnp.broadcast_to(jnp.eye(4), (t.shape[0], 4, 4))
    radius = radius * (t if scale_radius_with_t else 1.0)
    x = jnp.cos(2 * jnp.pi * num_rotations * t) * radius
    y = jnp.sin(2 * jnp.pi * num_rotations * t) * radius
    return tf.at[:, 0, 3].set(x).at[:, 1, 3].set(y)


def generate_wobble(extrinsics: jnp.ndarray, radius, t) -> jnp.ndarray:
    """Wobble around a base camera: (4, 4), scalar-ish radius, (t,) -> (t, 4, 4)."""
    tf = generate_wobble_transformation(radius, t)
    return extrinsics[None] @ tf


def interpolate_intrinsics(k0: jnp.ndarray, k1: jnp.ndarray, t: jnp.ndarray) -> jnp.ndarray:
    """Linear intrinsics interpolation (t, 3, 3)."""
    return k0[None] * (1 - t)[:, None, None] + k1[None] * t[:, None, None]


def interpolate_extrinsics(e0: jnp.ndarray, e1: jnp.ndarray, t: jnp.ndarray) -> jnp.ndarray:
    """Geodesic pose interpolation: slerp on SO(3) + lerp on translation."""
    R0, R1 = e0[:3, :3], e1[:3, :3]
    w = so3_log(R0.T @ R1)
    Rt = jnp.einsum("ij,tjk->tik", R0, so3_exp(w[None] * t[:, None]))
    trans = e0[:3, 3][None] * (1 - t)[:, None] + e1[:3, 3][None] * t[:, None]
    out = jnp.broadcast_to(jnp.eye(4), (t.shape[0], 4, 4))
    return out.at[:, :3, :3].set(Rt).at[:, :3, 3].set(trans)


def spiral_path(c2w_avg: np.ndarray, up: np.ndarray, rads: np.ndarray, focal: float,
                zrate: float = 0.5, rots: int = 2, n_frames: int = 120) -> np.ndarray:
    """LLFF-style spiral render path (ref llff_data_utils.render_path_spiral)."""
    from ..data.llff import normalize, viewmatrix

    render_poses = []
    rads = np.asarray(list(rads) + [1.0])
    for theta in np.linspace(0.0, 2.0 * np.pi * rots, n_frames + 1)[:-1]:
        c = c2w_avg[:3, :4] @ (
            np.array([np.cos(theta), -np.sin(theta), -np.sin(theta * zrate), 1.0]) * rads
        )
        z = normalize(c - c2w_avg[:3, :4] @ np.array([0, 0, -focal, 1.0]))
        pose = np.eye(4)
        pose[:3, :4] = viewmatrix(z, up, c)
        render_poses.append(pose)
    return np.stack(render_poses)


def cosine_ease(n_frames: int) -> jnp.ndarray:
    """The reference's smooth time parameterization (pixelsplat.py:214-215)."""
    t = jnp.linspace(0, 1, n_frames)
    return (jnp.cos(jnp.pi * (t + 1)) + 1) / 2
