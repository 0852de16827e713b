"""Tests for trajectories, pose-accuracy protocol, visualization, verifier."""
import numpy as np
import jax
import jax.numpy as jnp
import pytest


class TestTrajectories:
    def test_interpolate_extrinsics_endpoints(self):
        from ggrt_official_tpu.geometry.se3 import so3_exp
        from ggrt_official_tpu.utils.trajectories import interpolate_extrinsics

        e0 = jnp.eye(4)
        e1 = jnp.eye(4).at[:3, :3].set(so3_exp(jnp.array([0.2, -0.1, 0.4]))).at[:3, 3].set(
            jnp.array([1.0, 2.0, 3.0])
        )
        t = jnp.array([0.0, 0.5, 1.0])
        out = interpolate_extrinsics(e0, e1, t)
        np.testing.assert_allclose(np.asarray(out[0]), np.asarray(e0), atol=1e-5)
        np.testing.assert_allclose(np.asarray(out[2]), np.asarray(e1), atol=1e-5)
        # Midpoint rotation must be a valid rotation.
        R = np.asarray(out[1, :3, :3])
        np.testing.assert_allclose(R @ R.T, np.eye(3), atol=1e-5)

    def test_wobble_radius(self):
        from ggrt_official_tpu.utils.trajectories import generate_wobble

        base = jnp.eye(4)
        t = jnp.linspace(0, 1, 8)
        out = generate_wobble(base, 0.5, t)
        d = jnp.linalg.norm(out[-1, :2, 3])
        np.testing.assert_allclose(float(d), 0.5, atol=1e-5)

    def test_spiral_path_shape(self):
        from ggrt_official_tpu.utils.trajectories import spiral_path

        poses = spiral_path(np.eye(4)[:3], np.array([0, 1.0, 0]), [0.2, 0.2, 0.1], 2.0, n_frames=10)
        assert poses.shape == (10, 4, 4)
        for p in poses:
            np.testing.assert_allclose(p[:3, :3] @ p[:3, :3].T, np.eye(3), atol=1e-6)


class TestPoseAccuracy:
    def test_g2o_roundtrip(self, tmp_path):
        from ggrt_official_tpu.evaluation.pose_accuracy import (
            evaluate_g2o_pose_accuracy, read_g2o_file,
        )

        # Synthesize a g2o file of 6 identity-ish poses.
        rng = np.random.RandomState(0)
        lines = []
        for i in range(6):
            t = rng.randn(3) * 0.5
            lines.append(
                f"VERTEX_SE3:QUAT {i} {t[0]} {t[1]} {t[2]} 0 0 0 1"
            )
        path = tmp_path / "poses_n6_e0.g2o"
        path.write_text("\n".join(lines) + "\n")

        absolute, pairs, rels = read_g2o_file(str(path))
        assert absolute.shape == (6, 7)
        np.testing.assert_allclose(absolute[:, 0], 1.0)  # qw

        stats = evaluate_g2o_pose_accuracy(str(path), str(path))
        assert stats["R_error_mean"] < 0.1
        assert stats["t_error_mean"] < 1e-4
        assert stats["n_poses"] == 6


class TestVisualization:
    def test_colorize_depth(self):
        from ggrt_official_tpu.utils.visualization import colorize_depth

        d = np.linspace(1, 5, 12).reshape(3, 4)
        img = colorize_depth(d)
        assert img.shape == (3, 4, 3)
        assert img.min() >= 0 and img.max() <= 1

    def test_camera_frustum(self):
        from ggrt_official_tpu.utils.visualization import camera_frustum_lines

        K = np.array([[1.0, 0, 0.5], [0, 1.0, 0.5], [0, 0, 1]])
        segs = camera_frustum_lines(np.eye(4), K)
        assert segs.shape == (8, 2, 3)


class TestVerifier:
    def test_synthetic_scene_passes(self):
        from ggrt_official_tpu.data.datasets import SyntheticPlanesDataset, SyntheticSceneSpec
        from ggrt_official_tpu.data.verifier import verify_example

        ds = SyntheticPlanesDataset(
            SyntheticSceneSpec(n_views=6, image_size=(32, 48)), num_source_views=3
        )
        report = verify_example(ds[0], num_rays=16)
        assert report["ok"], report


class TestBenchmarker:
    def test_timing_and_dump(self, tmp_path):
        import time

        from ggrt_official_tpu.utils.benchmarker import Benchmarker

        b = Benchmarker()
        with b.time("op"):
            time.sleep(0.01)
        b.dump(tmp_path / "times.json")
        assert (tmp_path / "times.json").exists()
        assert b.execution_times["op"][0] >= 0.01


class TestTrackBuilder:
    def test_union_and_filtering(self):
        from ggrt_official_tpu.geometry.tracks import TrackBuilder

        tb = TrackBuilder()
        tb.add_matches((0, 1), [(5, 7)])
        tb.add_matches((1, 2), [(7, 9)])     # chains into a 3-view track
        tb.add_matches((0, 2), [(6, 11)])    # separate 2-view track
        tb.add_matches((0, 1), [(3, 4)])
        tb.add_matches((0, 1), [(3, 8)])     # feature 3 matches two feats in img1 -> inconsistent? no: two obs in img1
        tracks = tb.build()
        assert [(0, 5), (1, 7), (2, 9)] in tracks
        assert [(0, 6), (2, 11)] in tracks
        # the (0,3)-(1,4)-(1,8) group has two observations in image 1 -> dropped
        assert not any((0, 3) in t for t in tracks)
