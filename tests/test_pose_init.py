"""PoseInitializer: MST rotation chaining + least-squares positions
(ref pose_util.py:309-619; the reference's position estimator is dead code
— see geometry/pose_init.py docstring)."""
import numpy as np
from scipy.spatial.transform import Rotation

import jax.numpy as jnp

from ggrt_official_tpu.evaluation.metrics import evaluate_pose_errors
from ggrt_official_tpu.geometry.pose_init import (
    PoseInitializer,
    init_poses_from_noisy_gt,
    mst_rotations,
    solve_positions,
)


def _random_w2c(n, seed=0):
    rs = np.random.RandomState(seed)
    T = np.tile(np.eye(4, dtype=np.float64), (n, 1, 1))
    for i in range(n):
        T[i, :3, :3] = Rotation.from_rotvec(rs.randn(3) * 0.4).as_matrix()
        T[i, :3, 3] = rs.randn(3)
    return T


def _edges_from_poses(T, pairs, inliers=100):
    """Exact relative measurements T_j = T_ij @ T_i."""
    return {
        (i, j): ((T[j] @ np.linalg.inv(T[i])).astype(np.float32), inliers)
        for (i, j) in pairs
    }


class TestMST:
    def test_exact_graph_recovers_poses(self):
        n = 8
        T = _random_w2c(n)
        # Chain + a few extra edges with varying weights.
        pairs = [(i, i + 1) for i in range(n - 1)] + [(0, 3), (2, 6), (1, 7)]
        edges = _edges_from_poses(T, pairs)

        init = PoseInitializer(edges, n, ref_id=0, ref_pose_w2c=T[0].astype(np.float32),
                               metric_scale=True)
        c2w = init.init_poses_from_mst()

        gt_c2w = np.linalg.inv(T).astype(np.float32)
        err = evaluate_pose_errors(jnp.asarray(c2w), jnp.asarray(gt_c2w))
        assert float(err["R_error_mean"]) < 0.1, dict(err)
        assert float(err["t_error_mean"]) < 1e-3, dict(err)

    def test_mst_prefers_high_inlier_edges(self):
        n = 3
        T = _random_w2c(n, seed=1)
        edges = _edges_from_poses(T, [(0, 1), (1, 2)], inliers=1000)
        # A corrupt low-inlier shortcut must lose to the good chain.
        bad = np.eye(4, dtype=np.float32)
        edges[(0, 2)] = (bad, 1)
        R = mst_rotations(
            {k: (v[0][:3, :3], v[1]) for k, v in edges.items()}, n, 0, T[0][:3, :3]
        )
        np.testing.assert_allclose(R[2], T[2][:3, :3], atol=1e-4)

    def test_positions_least_squares_consistent(self):
        n = 6
        T = _random_w2c(n, seed=2)
        pairs = [(i, j) for i in range(n) for j in range(i + 1, n)]
        edges = _edges_from_poses(T, pairs)
        R = np.stack([t[:3, :3] for t in T]).astype(np.float32)
        t = solve_positions(edges, R, ref_id=0, ref_position=T[0][:3, 3], metric_scale=True)
        np.testing.assert_allclose(t, np.stack([x[:3, 3] for x in T]), atol=1e-3)


class TestNoisyGT:
    def test_noise_statistics(self):
        gt = np.linalg.inv(_random_w2c(40, seed=3)).astype(np.float32)
        noisy = init_poses_from_noisy_gt(
            gt, noise_level=0.1, outlier_ratio=0.25,
            rng=np.random.RandomState(0),
        )
        # Rotations perturbed but still valid.
        R = noisy[:, :3, :3]
        rtr = np.einsum("nij,nkj->nik", R, R)
        np.testing.assert_allclose(rtr, np.tile(np.eye(3), (40, 1, 1)), atol=1e-4)
        ang = np.linalg.norm(
            Rotation.from_matrix(
                np.einsum("nij,nkj->nik", R, gt[:, :3, :3])
            ).as_rotvec(), axis=-1,
        )
        # Inliers perturbed ~noise_level; outliers much more.
        assert np.median(ang) < 0.4
        assert ang.max() > 0.3
