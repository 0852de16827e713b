"""Offline SfM pipeline on a rendered synthetic scene with known poses.

Renders a noise-textured plane from a ring of cameras (rich SIFT
features), runs retrieval -> two-view geometry -> geodesic disambiguation
-> g2o + MST pose init, and checks the recovered global rotations against
GT after ATE alignment. Also unit-tests the disambiguation filter on a
synthetic corrupted view graph."""
import os

import numpy as np
import pytest
from scipy.spatial.transform import Rotation

import jax.numpy as jnp


def _render_plane_views(out_dir, n_views=6, hw=(240, 320), seed=0):
    """Homography-render a textured plane z=0 viewed from a camera arc.

    Returns (K, c2w list). Texture is smooth noise (SIFT-friendly)."""
    import cv2

    rs = np.random.RandomState(seed)
    # Multi-frequency texture: SIFT needs blob-scale structure, not just
    # pixel noise (which vanishes under the renderer's resampling).
    tex = np.zeros((720, 960, 3), np.float32)
    for sigma, amp in [(2, 0.5), (6, 0.7), (16, 1.0)]:
        layer = cv2.GaussianBlur(rs.rand(720, 960, 3).astype(np.float32), (0, 0), sigma)
        layer = (layer - layer.min()) / (np.ptp(layer) + 1e-6)
        tex += amp * layer
    tex = ((tex - tex.min()) / (np.ptp(tex) + 1e-6) * 255).astype(np.uint8)
    th, tw = tex.shape[:2]
    # Plane spans [-1, 1] x [-0.75, 0.75] at z = 0; texture pixel mapping.
    T_plane = np.array([[tw / 2.0, 0, tw / 2.0], [0, th / 1.5, th / 2.0], [0, 0, 1]])

    h, w = hw
    K = np.array([[300.0, 0, w / 2], [0, 300.0, h / 2], [0, 0, 1]])
    poses = []
    os.makedirs(out_dir, exist_ok=True)
    for i in range(n_views):
        ang = (i - n_views / 2) * 0.08
        R = Rotation.from_euler("XYZ", [0.0, ang, 0.0]).as_matrix()
        center = np.array([0.8 * np.sin(ang), 0.05 * i, -2.5 * np.cos(ang)])
        c2w = np.eye(4)
        c2w[:3, :3] = R
        c2w[:3, 3] = center
        poses.append(c2w)

        # Two textured planes at different depths: a single plane is
        # DEGENERATE for essential-matrix estimation (homography ambiguity
        # — the reference notes the same FIXME at
        # extract_relative_poses.py:124). x_img = K [r1 r2 (t + z0*r3)].
        w2c = np.linalg.inv(c2w)
        img = np.zeros((h, w, 3), np.uint8)
        for z0, texture in ((0.0, tex), (-0.9, tex[::-1, ::-1])):
            t_eff = w2c[:3, 3:4] + z0 * w2c[:3, 2:3]
            H = K @ np.concatenate([w2c[:3, 0:1], w2c[:3, 1:2], t_eff], axis=1)
            layer = cv2.warpPerspective(texture, H @ np.linalg.inv(T_plane), (w, h))
            mask = layer.sum(-1) > 0
            img[mask] = layer[mask]
        cv2.imwrite(os.path.join(out_dir, f"{i:03d}.png"), img)
    return K, poses


class TestPipeline:
    def test_end_to_end_rotations(self, tmp_path):
        from ggrt_official_tpu.evaluation.metrics import evaluate_pose_errors
        from ggrt_official_tpu.sfm import run_sfm_pipeline

        img_dir = str(tmp_path / "images")
        K, gt_c2w = _render_plane_views(img_dir)
        out = run_sfm_pipeline(
            img_dir, str(tmp_path / "sfm"), K, num_matches=5,
            min_inliers=20, disambiguate=True,
        )
        assert len(out["geometries"]) >= len(gt_c2w) - 1
        assert os.path.exists(tmp_path / "sfm" / "view_graph.g2o")
        assert out["poses_c2w"] is not None
        assert os.path.exists(tmp_path / "sfm" / "poses_bounds.npy")

        # Evaluate RELATIVE rotations (alignment-free: global gauge is
        # arbitrary and the near-collinear camera centers make sim3
        # alignment ill-conditioned on this tiny scene).
        pred = out["poses_c2w"]
        gt = np.stack(gt_c2w)
        errs = []
        for a in range(len(gt)):
            for b in range(a + 1, len(gt)):
                Rp = pred[b][:3, :3].T @ pred[a][:3, :3]
                Rg = gt[b][:3, :3].T @ gt[a][:3, :3]
                errs.append(np.degrees(np.linalg.norm(
                    Rotation.from_matrix(Rp @ Rg.T).as_rotvec())))
        assert float(np.mean(errs)) < 5.0, errs

    def test_g2o_parses_back(self, tmp_path):
        from ggrt_official_tpu.evaluation.pose_accuracy import read_g2o_file
        from ggrt_official_tpu.sfm import run_sfm_pipeline

        img_dir = str(tmp_path / "images")
        K, gt = _render_plane_views(img_dir, n_views=4)
        run_sfm_pipeline(img_dir, str(tmp_path / "sfm"), K, num_matches=3,
                         min_inliers=20)
        absolute, pairs, rels = read_g2o_file(str(tmp_path / "sfm" / "view_graph.g2o"))
        assert len(absolute) == 4
        assert len(pairs) >= 3 and len(rels) == len(pairs)


class TestDisambiguation:
    def test_corrupt_edges_filtered(self):
        from ggrt_official_tpu.sfm.disambiguation import (
            filter_edges,
            geodesic_consistency_scores,
        )
        from ggrt_official_tpu.sfm.two_view import TwoViewGeometry

        rs = np.random.RandomState(0)
        n = 8
        R_gt = [Rotation.from_rotvec(rs.randn(3) * 0.2).as_matrix() for _ in range(n)]
        geoms = []
        for i in range(n):
            for j in range(i + 1, min(i + 4, n)):
                geoms.append(TwoViewGeometry(
                    i, j, R_gt[j] @ R_gt[i].T, np.zeros(3), 100
                ))
        # Corrupt two edges (repeated-structure style wrong matches).
        bad = Rotation.from_euler("XYZ", [1.2, 0.5, -0.8]).as_matrix()
        geoms[0] = geoms[0]._replace(R=bad)
        geoms[7] = geoms[7]._replace(R=bad.T)

        scores = geodesic_consistency_scores(geoms, n)
        kept = filter_edges(geoms, scores, filter_type="threshold", threshold=0.5)
        kept_edges = {(g.i, g.j) for g in kept}
        assert (geoms[0].i, geoms[0].j) not in kept_edges
        assert (geoms[7].i, geoms[7].j) not in kept_edges
        # Healthy edges survive.
        assert len(kept) >= len(geoms) - 3
