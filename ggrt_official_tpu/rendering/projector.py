"""Projection of 3D ray samples into source views (pure jnp).

Parity target: /root/reference/ggrt/projection.py (Projector.compute,
compute_projections, compute_angle): project samples with the packed
34-vector cameras, bilinearly gather rgb + deep features with
align_corners=True, build ray-angle features (direction difference + dot)
and validity masks.
"""
from __future__ import annotations

import jax.numpy as jnp

from ..geometry.se3 import relative_to_source_c2w
from ..ops.grid_sample import grid_sample


def _inbound(pix, h, w):
    return (
        (pix[..., 0] <= w - 1.0) & (pix[..., 0] >= 0.0)
        & (pix[..., 1] <= h - 1.0) & (pix[..., 1] >= 0.0)
    )


def compute_projections(xyz, train_intrinsics, train_poses):
    """xyz (n, 3); intrinsics/poses (v, 4, 4) -> pixel locations (v, n, 2),
    in-front mask (v, n)."""
    xyz_h = jnp.concatenate([xyz, jnp.ones_like(xyz[:, :1])], axis=-1)  # (n, 4)
    proj = jnp.einsum(
        "vij,vjk,nk->vni", train_intrinsics, jnp.linalg.inv(train_poses), xyz_h
    )
    pix = proj[..., :2] / jnp.clip(proj[..., 2:3], a_min=1e-8)
    pix = jnp.clip(pix, -1e6, 1e6)
    in_front = proj[..., 2] > 0
    return pix, in_front


def compute_angle(xyz, query_pose, train_poses):
    """Ray-angle features (v, n, 4) (ref projection.py:95-124)."""
    ray2tar = query_pose[:3, 3][None, None] - xyz[None]
    ray2tar = ray2tar / (jnp.linalg.norm(ray2tar, axis=-1, keepdims=True) + 1e-6)
    ray2train = train_poses[:, None, :3, 3] - xyz[None]
    ray2train = ray2train / (jnp.linalg.norm(ray2train, axis=-1, keepdims=True) + 1e-6)
    ray_diff = ray2tar - ray2train
    norm = jnp.linalg.norm(ray_diff, axis=-1, keepdims=True)
    dot = jnp.sum(ray2tar * ray2train, axis=-1, keepdims=True)
    direction = ray_diff / jnp.clip(norm, a_min=1e-6)
    return jnp.concatenate([direction, dot], axis=-1)


def project_and_gather(
    pts: jnp.ndarray,          # (n_rays, n_samples, 3)
    query_camera: jnp.ndarray,  # (34,)
    src_rgbs: jnp.ndarray,      # (v, h, w, 3)
    src_cameras: jnp.ndarray,   # (v, 34)
    feat_maps: jnp.ndarray,     # (v, hf, wf, d)
    rel_poses: jnp.ndarray | None = None,  # (v, 6) predicted target->src
):
    """Returns (rgb_feat (r, s, v, 3+d), ray_diff (r, s, v, 4), mask (r, s, v, 1))."""
    r, s, _ = pts.shape
    xyz = pts.reshape(-1, 3)
    v = src_cameras.shape[0]
    h, w = src_cameras[0, 0], src_cameras[0, 1]
    train_intrinsics = src_cameras[:, 2:18].reshape(-1, 4, 4)
    train_poses = src_cameras[:, 18:34].reshape(-1, 4, 4)
    query_pose = query_camera[18:34].reshape(4, 4)

    if rel_poses is not None:
        train_poses = relative_to_source_c2w(
            jnp.broadcast_to(query_pose, (v, 4, 4)), rel_poses
        )

    pix, in_front = compute_projections(xyz, train_intrinsics, train_poses)
    resize = jnp.stack([w - 1.0, h - 1.0])
    grid = 2.0 * pix / resize - 1.0  # (v, n, 2)

    rgb = grid_sample(
        src_rgbs.transpose(0, 3, 1, 2), grid[:, :, None, :], align_corners=True
    )[..., 0].transpose(0, 2, 1)  # (v, n, 3)
    feat = grid_sample(
        feat_maps.transpose(0, 3, 1, 2), grid[:, :, None, :], align_corners=True
    )[..., 0].transpose(0, 2, 1)  # (v, n, d)
    rgb_feat = jnp.concatenate([rgb, feat], axis=-1)

    ray_diff = compute_angle(xyz, query_pose, train_poses)
    mask = (_inbound(pix, h, w) & in_front).astype(rgb_feat.dtype)

    to_rsv = lambda t: t.transpose(1, 0, 2).reshape(r, s, v, -1)
    return (
        to_rsv(rgb_feat),
        to_rsv(ray_diff),
        mask.T.reshape(r, s, v, 1),
    )
