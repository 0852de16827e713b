"""Unit tests for the pure-jnp geometry core."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from ggrt_official_tpu.geometry import alignment, camera, depth, projection, se3


def random_pose(key, scale=1.0):
    k1, k2 = jax.random.split(key)
    w = jax.random.normal(k1, (3,)) * 0.5
    t = jax.random.normal(k2, (3,)) * scale
    R = se3.so3_exp(w)
    T = jnp.eye(4).at[:3, :3].set(R).at[:3, 3].set(t)
    return T


def normalized_intrinsics(fx=1.2, fy=1.1, cx=0.5, cy=0.5):
    return jnp.array([[fx, 0.0, cx], [0.0, fy, cy], [0.0, 0.0, 1.0]])


class TestProjection:
    def test_invert_se3(self):
        T = random_pose(jax.random.PRNGKey(0))
        np.testing.assert_allclose(
            projection.invert_se3(T), jnp.linalg.inv(T), rtol=1e-5, atol=1e-5
        )

    def test_invert_intrinsics(self):
        K = normalized_intrinsics()
        np.testing.assert_allclose(
            projection.invert_intrinsics(K), jnp.linalg.inv(K), rtol=1e-6, atol=1e-6
        )

    def test_project_unproject_roundtrip(self):
        K = normalized_intrinsics()
        xy = jnp.array([[0.3, 0.7], [0.5, 0.5], [0.9, 0.1]])
        z = jnp.array([2.0, 3.0, 0.5])
        pts_cam = projection.unproject(xy, z, K)
        xy_back = projection.project_camera_space(pts_cam, K)
        np.testing.assert_allclose(xy_back, xy, rtol=1e-5, atol=1e-5)

    def test_world_rays_hit_unprojected_points(self):
        T = random_pose(jax.random.PRNGKey(1))
        K = normalized_intrinsics()
        xy = jnp.array([[0.25, 0.75]])
        origins, directions = projection.get_world_rays(xy, T, K)
        # March along the ray; reproject must recover xy.
        pts = origins + 2.5 * directions
        xy_back, in_front = projection.project(pts, T, K)
        assert bool(in_front[0])
        np.testing.assert_allclose(xy_back, xy, rtol=1e-5, atol=1e-5)

    def test_sample_image_grid(self):
        coords, indices = projection.sample_image_grid((4, 8))
        assert coords.shape == (4, 8, 2)
        assert indices.shape == (4, 8, 2)
        np.testing.assert_allclose(coords[0, 0], [0.5 / 8, 0.5 / 4])
        np.testing.assert_allclose(coords[3, 7], [7.5 / 8, 3.5 / 4])
        assert indices[2, 5, 0] == 2 and indices[2, 5, 1] == 5

    def test_intersect_rays(self):
        p = jnp.array([1.0, 2.0, 3.0])
        o1 = jnp.array([0.0, 0.0, 0.0])
        d1 = p / jnp.linalg.norm(p)
        o2 = jnp.array([5.0, 0.0, 0.0])
        d2 = (p - o2) / jnp.linalg.norm(p - o2)
        out = projection.intersect_rays(o1, d1, o2, d2)
        np.testing.assert_allclose(out, p, rtol=1e-4, atol=1e-4)

    def test_intersect_rays_parallel_inf(self):
        d = jnp.array([0.0, 0.0, 1.0])
        out = projection.intersect_rays(
            jnp.zeros(3), d, jnp.array([1.0, 0.0, 0.0]), d
        )
        assert bool(jnp.all(out > 1e9))

    def test_get_fov(self):
        # fx = 0.5 / tan(fov_x / 2) for a centered camera.
        fov_x_expected = jnp.deg2rad(60.0)
        fx = 0.5 / jnp.tan(fov_x_expected / 2)
        K = normalized_intrinsics(fx=fx, fy=fx)[None]
        fov = projection.get_fov(K)[0]
        np.testing.assert_allclose(fov[0], fov_x_expected, rtol=1e-5)


class TestSE3:
    def test_exp_log_roundtrip(self):
        wu = jax.random.normal(jax.random.PRNGKey(2), (5, 6)) * 0.4
        T = se3.se3_exp(wu)
        wu_back = se3.se3_log(T)
        np.testing.assert_allclose(wu_back, wu, rtol=1e-4, atol=1e-4)

    def test_exp_near_zero(self):
        T = se3.se3_exp(jnp.zeros(6))
        np.testing.assert_allclose(T, jnp.eye(4), atol=1e-6)
        grads = jax.jacobian(lambda v: se3.se3_exp(v))(jnp.zeros(6))
        assert bool(jnp.all(jnp.isfinite(grads)))

    def test_pose_from_vec_identity(self):
        T = se3.pose_from_vec(jnp.zeros(6))
        np.testing.assert_allclose(T, jnp.eye(4), atol=1e-7)

    def test_pose_from_vec_translation_first(self):
        v = jnp.array([1.0, 2.0, 3.0, 0.0, 0.0, 0.0])
        T = se3.pose_from_vec(v)
        np.testing.assert_allclose(T[:3, 3], [1.0, 2.0, 3.0])

    def test_euler_composition_order(self):
        # R = Rx @ Ry @ Rz per the reference convention.
        ang = jnp.array([0.3, -0.2, 0.5])
        Rx = se3.euler_angle_to_R(jnp.array([ang[0], 0.0, 0.0]))
        Ry = se3.euler_angle_to_R(jnp.array([0.0, ang[1], 0.0]))
        Rz = se3.euler_angle_to_R(jnp.array([0.0, 0.0, ang[2]]))
        np.testing.assert_allclose(
            se3.euler_angle_to_R(ang), Rx @ Ry @ Rz, rtol=1e-5, atol=1e-6
        )

    def test_rotation_distance(self):
        R1 = se3.so3_exp(jnp.array([0.0, 0.0, 0.0]))
        R2 = se3.so3_exp(jnp.array([0.0, 0.0, 0.3]))
        np.testing.assert_allclose(se3.rotation_distance(R1, R2), 0.3, rtol=1e-4)

    def test_relative_to_source_c2w(self):
        # If rel pose maps target-cam points to source-cam points, then the
        # source c2w must satisfy: source_c2w = target_c2w @ rel^-1.
        key = jax.random.PRNGKey(3)
        target_c2w = random_pose(key)
        vec = jnp.array([0.1, -0.2, 0.3, 0.05, -0.1, 0.2])
        rel = se3.pose_from_vec(vec)
        expected = target_c2w @ projection.invert_se3(rel)
        got = se3.relative_to_source_c2w(target_c2w, vec)
        np.testing.assert_allclose(got, expected, rtol=1e-5, atol=1e-5)


class TestCamera:
    def test_reconstruct_project_roundtrip(self):
        h, w = 12, 16
        K = jnp.array([[20.0, 0.0, 7.5], [0.0, 18.0, 5.5], [0.0, 0.0, 1.0]])[None]
        depth_map = jnp.full((1, 1, h, w), 2.0)
        pts = camera.reconstruct(depth_map, K)
        coords = camera.project(pts, K, normalize=False)
        grid = camera.pixel_grid(h, w)
        np.testing.assert_allclose(coords[0, ..., 0], grid[0], rtol=1e-4, atol=1e-4)
        np.testing.assert_allclose(coords[0, ..., 1], grid[1], rtol=1e-4, atol=1e-4)

    def test_reconstruct_with_pose_consistency(self):
        h, w = 6, 8
        K = jnp.array([[10.0, 0.0, 3.5], [0.0, 10.0, 2.5], [0.0, 0.0, 1.0]])[None]
        Twc = random_pose(jax.random.PRNGKey(4))[None]
        depth_map = jnp.full((1, 1, h, w), 3.0)
        # World points seen from camera with pose Twc, reprojected through the
        # same camera, must land back on the pixel grid.
        pts_w = camera.reconstruct(depth_map, K, Twc)
        coords = camera.project(pts_w, K, Twc, normalize=False)
        grid = camera.pixel_grid(h, w)
        np.testing.assert_allclose(coords[0, ..., 0], grid[0], rtol=1e-3, atol=1e-3)


class TestDepth:
    def test_inv2depth_roundtrip(self):
        d = jnp.array([0.5, 1.0, 10.0])
        np.testing.assert_allclose(depth.inv2depth(depth.depth2inv(d)), d, rtol=1e-5)

    def test_disp_to_depth_range(self):
        scaled, d = depth.disp_to_depth(jnp.array([0.0, 1.0]), 0.1, 100.0)
        np.testing.assert_allclose(d, [100.0, 0.1], rtol=1e-5)

    def test_relative_disparity_endpoints(self):
        near, far = jnp.array(1.0), jnp.array(50.0)
        np.testing.assert_allclose(
            depth.relative_disparity_to_depth(jnp.array(0.0), near, far), near, rtol=1e-4
        )
        np.testing.assert_allclose(
            depth.relative_disparity_to_depth(jnp.array(1.0), near, far), far, rtol=1e-4
        )

    def test_disparity_depth_roundtrip(self):
        near, far = jnp.array(1.0), jnp.array(20.0)
        rd = jnp.linspace(0.05, 0.95, 7)
        d = depth.relative_disparity_to_depth(rd, near, far)
        rd_back = depth.depth_to_relative_disparity(d, near, far)
        np.testing.assert_allclose(rd_back, rd, rtol=1e-4, atol=1e-5)


class TestAlignment:
    def test_umeyama_recovers_sim3(self):
        key = jax.random.PRNGKey(5)
        pts = jax.random.normal(key, (30, 3))
        R_true = se3.so3_exp(jnp.array([0.2, -0.4, 0.1]))
        s_true, t_true = 1.7, jnp.array([1.0, -2.0, 0.5])
        transformed = s_true * pts @ R_true.T + t_true
        s, R, t = alignment.align_umeyama(transformed, pts)
        np.testing.assert_allclose(s, s_true, rtol=1e-4)
        np.testing.assert_allclose(R, R_true, rtol=1e-4, atol=1e-4)
        np.testing.assert_allclose(t, t_true, rtol=1e-4, atol=1e-4)

    def test_ate_alignment_zeroes_error(self):
        key = jax.random.PRNGKey(6)
        keys = jax.random.split(key, 8)
        gt = jnp.stack([random_pose(k, scale=2.0) for k in keys])
        R_g = se3.so3_exp(jnp.array([0.1, 0.2, -0.1]))
        s_g, t_g = 2.0, jnp.array([0.3, 0.1, -0.2])
        # Apply a global sim3 to the gt trajectory to fabricate predictions.
        pred_R = jnp.einsum("ij,njk->nik", R_g.T, gt[:, :3, :3])
        pred_t = (gt[:, :3, 3] - t_g) @ R_g / s_g
        pred = (
            jnp.tile(jnp.eye(4), (8, 1, 1))
            .at[:, :3, :3].set(pred_R)
            .at[:, :3, 3].set(pred_t)
        )
        aligned = alignment.align_ate_c2b_use_a2b(pred, gt)
        err = alignment.evaluate_camera_alignment(aligned, gt)
        # f32 arccos noise near identity dominates; 0.1 deg is ~zero here.
        assert float(err["R_error_mean"]) < 0.1
        assert float(err["t_error_mean"]) < 1e-3


class TestEpipolar:
    def test_segment_contains_projected_point(self):
        from ggrt_official_tpu.geometry import epipolar

        K = normalized_intrinsics(fx=1.0, fy=1.0)
        # Camera B is translated along +x, looking the same way.
        T_b = jnp.eye(4).at[0, 3].set(1.0)
        origin = jnp.array([0.0, 0.0, 0.0])
        direction = jnp.array([0.0, 0.0, 1.0])

        seg = epipolar.project_rays(origin, direction, T_b, K, near=jnp.array(0.5), far=jnp.array(100.0))
        assert bool(seg.overlaps_image)

        # A point at depth 2 on the ray, projected into B, must lie between
        # xy_min and xy_max (up to ordering along each axis).
        p = origin + 2.0 * direction
        xy_p, _ = projection.project(p, T_b, K)
        lo = jnp.minimum(seg.xy_min, seg.xy_max) - 1e-4
        hi = jnp.maximum(seg.xy_min, seg.xy_max) + 1e-4
        assert bool(jnp.all((xy_p >= lo) & (xy_p <= hi)))

    def test_get_depth_matches_construction(self):
        from ggrt_official_tpu.geometry import epipolar

        K = normalized_intrinsics(fx=1.0, fy=1.0)
        T_b = jnp.eye(4).at[0, 3].set(1.0).at[1, 3].set(0.2)
        origin = jnp.array([0.0, 0.0, 0.0])
        direction = jnp.array([0.0, 0.0, 1.0])
        depth_true = 3.0
        p = origin + depth_true * direction
        xy_p, _ = projection.project(p, T_b, K)
        d = epipolar.get_depth(origin, direction, xy_p, T_b, K)
        np.testing.assert_allclose(d, depth_true, rtol=1e-3)

    def test_no_overlap_behind_camera(self):
        from ggrt_official_tpu.geometry import epipolar

        K = normalized_intrinsics(fx=1.0, fy=1.0)
        # Camera B looks along +z from z=+10; the ray segment [0.5, 1] along
        # +z from the origin is far behind B's image plane... actually in
        # front; instead place B rotated 180° so the ray is behind it.
        R_flip = se3.so3_exp(jnp.array([0.0, jnp.pi, 0.0]))
        T_b = jnp.eye(4).at[:3, :3].set(R_flip).at[2, 3].set(-1.0)
        origin = jnp.array([0.0, 0.0, 5.0])
        direction = jnp.array([0.0, 0.0, 1.0])
        seg = epipolar.project_rays(
            origin, direction, T_b, K, near=jnp.array(0.1), far=jnp.array(100.0)
        )
        assert not bool(seg.overlaps_image)
