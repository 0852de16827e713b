"""Pose-convention pinning tests (VERDICT round-1 weak#3).

Round 1's held-out eval showed R_error_mean 145° (worse than random),
which suggested a convention inconsistency somewhere along
dataset extrinsics -> IPO-Net relative poses -> relative_to_source_c2w ->
ATE alignment -> rotation errors. These tests pin every link:

  * perfect relative poses fed through the exact eval-harness formula
    reproduce the dataset's GT source c2w and give ≈0° / ≈0 errors;
  * the photometric warp convention (pose = target-cam -> ref-cam frame,
    reference Camera semantics where `Twc` maps world->camera) is the
    inverse of the injection convention, verified by warping a textured
    plane between two synthetic cameras;
  * ATE alignment is invariant to a global sim3 disturbance.
"""
from __future__ import annotations

import numpy as np
from scipy.spatial.transform import Rotation as ScipyR

import jax.numpy as jnp

from ggrt_official_tpu.data.datasets import (
    SyntheticPlanesDataset,
    SyntheticSceneSpec,
    collate_batch,
)
from ggrt_official_tpu.evaluation.metrics import evaluate_pose_errors
from ggrt_official_tpu.geometry.se3 import (
    euler_angle_to_R,
    pose_from_vec,
    relative_to_source_c2w,
)


def rel_vec_from_c2ws(target_c2w: np.ndarray, src_c2w: np.ndarray) -> np.ndarray:
    """The 6-vector the IPO-Net would have to predict for a source view.

    Inverts relative_to_source_c2w: T_src = T_t @ rel^-1  =>
    rel = T_src^-1 @ T_t (the target-cam -> source-cam transform)."""
    rel = np.linalg.inv(src_c2w) @ target_c2w
    # euler_angle_to_R composes R = Rx @ Ry @ Rz (se3.py:77); scipy's
    # intrinsic 'XYZ' decomposition matches that composition order.
    eul = ScipyR.from_matrix(rel[:3, :3]).as_euler("XYZ")
    return np.concatenate([rel[:3, 3], eul]).astype(np.float32)


def _batch(n_src=3, n_views=9):
    ds = SyntheticPlanesDataset(
        SyntheticSceneSpec(n_views=n_views, image_size=(32, 48)),
        num_source_views=n_src,
    )
    return collate_batch(ds[0])


class TestEvalPoseChain:
    def test_perfect_rel_poses_give_zero_error(self):
        batch = _batch()
        target_pose = np.asarray(batch["camera"][0, -16:]).reshape(4, 4)
        gt_c2w = np.asarray(batch["context"]["extrinsics"][0])
        nv = gt_c2w.shape[0]

        vecs = np.stack([rel_vec_from_c2ws(target_pose, gt_c2w[i]) for i in range(nv)])

        # Round-trip sanity: pose_from_vec(vec) == T_src^-1 @ T_t.
        rel_mats = np.asarray(pose_from_vec(jnp.asarray(vecs)))
        for i in range(nv):
            expect = np.linalg.inv(gt_c2w[i]) @ target_pose
            np.testing.assert_allclose(rel_mats[i], expect, atol=1e-5)

        # The eval-harness formula (evaluation/harness.py:73).
        pred_c2w = relative_to_source_c2w(
            jnp.broadcast_to(jnp.asarray(target_pose), (nv, 4, 4)),
            jnp.asarray(vecs),
        )
        np.testing.assert_allclose(np.asarray(pred_c2w), gt_c2w, atol=1e-5)

        err = evaluate_pose_errors(pred_c2w, jnp.asarray(gt_c2w))
        assert float(err["R_error_mean"]) < 0.1, dict(err)
        assert float(err["t_error_mean"]) < 1e-4, dict(err)

    def test_ate_alignment_removes_global_sim3(self):
        batch = _batch()
        gt_c2w = np.asarray(batch["context"]["extrinsics"][0]).copy()
        # Disturb globally: rotate + scale + translate the whole trajectory.
        R = ScipyR.from_euler("XYZ", [0.3, -0.2, 0.5]).as_matrix().astype(np.float32)
        s, t = 1.7, np.array([0.4, -0.2, 0.9], np.float32)
        disturbed = gt_c2w.copy()
        disturbed[:, :3, :3] = np.einsum("ij,njk->nik", R, gt_c2w[:, :3, :3])
        disturbed[:, :3, 3] = s * np.einsum("ij,nj->ni", R, gt_c2w[:, :3, 3]) + t

        err = evaluate_pose_errors(jnp.asarray(disturbed), jnp.asarray(gt_c2w))
        assert float(err["R_error_mean"]) < 0.1, dict(err)
        assert float(err["t_error_mean"]) < 1e-3, dict(err)

    def test_warp_convention_roundtrip(self):
        """pose vec consistent with relative_to_source_c2w must also warp
        source pixels onto the target (shared world plane at depth z0)."""
        from ggrt_official_tpu.geometry import camera as cam
        from ggrt_official_tpu.ops.grid_sample import grid_sample

        h, w = 24, 32
        K = np.array([[[30.0, 0, (w - 1) / 2], [0, 30.0, (h - 1) / 2], [0, 0, 1.0]]],
                     np.float32)
        T_t = np.eye(4, dtype=np.float32)
        T_s = np.eye(4, dtype=np.float32)
        T_s[:3, 3] = [0.2, -0.1, 0.05]
        T_s[:3, :3] = ScipyR.from_euler("XYZ", [0.02, -0.04, 0.03]).as_matrix()

        vec = rel_vec_from_c2ws(T_t, T_s)
        pose_mat = pose_from_vec(jnp.asarray(vec)[None])  # target-cam -> src-cam

        # World plane z = z0 (target frame == world since T_t = I).
        z0 = 4.0
        depth = jnp.full((1, 1, h, w), z0)
        world = cam.reconstruct(depth, jnp.asarray(K))
        coords = cam.project(world, jnp.asarray(K), Twc=pose_mat, normalize=True)

        # Paint the plane with a smooth world-coordinate texture and image
        # it from the source camera; warping source->target must reproduce
        # the target's own rendering of the plane.
        def plane_image(c2w):
            w2c = np.linalg.inv(c2w)
            # Rasterize by projecting each target pixel's world point.
            Xw = np.asarray(world)[0].reshape(3, -1)  # plane points (world)
            return Xw  # world coords serve as the texture lookup

        # Source-view image of the plane: for each source pixel, intersect
        # its ray with the plane and color by world xy.
        ys, xs = np.meshgrid(np.arange(h), np.arange(w), indexing="ij")
        pix = np.stack([xs, ys, np.ones_like(xs)], 0).reshape(3, -1).astype(np.float32)
        Kinv = np.linalg.inv(K[0])
        rays_c = Kinv @ pix
        R_s, t_s = T_s[:3, :3], T_s[:3, 3]
        rays_w = R_s @ rays_c
        lam = (z0 - t_s[2]) / rays_w[2]
        Xw_src = t_s[:, None] + rays_w * lam
        src_img = np.stack(
            [np.sin(Xw_src[0] * 3), np.cos(Xw_src[1] * 3), Xw_src[0] * 0 + 0.5], 0
        ).reshape(1, 3, h, w).astype(np.float32)

        warped = grid_sample(jnp.asarray(src_img), coords, align_corners=True)

        Xw_t = np.asarray(world)[0].reshape(3, -1)
        tgt_img = np.stack(
            [np.sin(Xw_t[0] * 3), np.cos(Xw_t[1] * 3), Xw_t[0] * 0 + 0.5], 0
        ).reshape(1, 3, h, w).astype(np.float32)

        # Compare away from borders (warp sampling is undefined outside).
        inner = np.s_[:, :, 4:-4, 4:-4]
        np.testing.assert_allclose(
            np.asarray(warped)[inner], tgt_img[inner], atol=2e-2
        )
