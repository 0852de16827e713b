"""Tests for the legacy IBRNet volume-rendering path."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from ggrt_official_tpu.rendering import volume, projector, rays


class TestSamplePdf:
    def test_importance_concentrates(self):
        # A pdf peaked in one bin must place most samples there.
        bins = jnp.linspace(0.0, 1.0, 11)[None].repeat(4, 0)  # (4, 11)
        weights = jnp.zeros((4, 10)).at[:, 5].set(100.0)
        samples = volume.sample_pdf(jax.random.PRNGKey(0), bins, weights, 32)
        frac = np.mean((np.asarray(samples) >= 0.5) & (np.asarray(samples) <= 0.6))
        assert frac > 0.9

    def test_deterministic_uniform_pdf(self):
        bins = jnp.linspace(0.0, 1.0, 5)[None]
        weights = jnp.ones((1, 4))
        s = volume.sample_pdf(jax.random.PRNGKey(0), bins, weights, 9, det=True)
        np.testing.assert_allclose(np.asarray(s[0]), np.linspace(0, 1, 9), atol=1e-5)


class TestSampling:
    def test_uniform_depth_range(self):
        ro = jnp.zeros((5, 3))
        rd = jnp.tile(jnp.array([0.0, 0.0, 1.0]), (5, 1))
        pts, z = volume.sample_along_camera_ray(
            jax.random.PRNGKey(0), ro, rd, jnp.array([2.0, 10.0]), 16, det=True
        )
        np.testing.assert_allclose(float(z[0, 0]), 2.0, rtol=1e-5)
        np.testing.assert_allclose(float(z[0, -1]), 10.0, rtol=1e-5)
        np.testing.assert_allclose(np.asarray(pts[0, 0]), [0, 0, 2.0], atol=1e-5)

    def test_inv_uniform(self):
        ro = jnp.zeros((2, 3))
        rd = jnp.tile(jnp.array([0.0, 0.0, 1.0]), (2, 1))
        _, z = volume.sample_along_camera_ray(
            jax.random.PRNGKey(0), ro, rd, jnp.array([1.0, 100.0]), 8,
            inv_uniform=True, det=True,
        )
        # Inverse-depth uniform: more samples near the near plane.
        assert float(z[0, 1] - z[0, 0]) < float(z[0, -1] - z[0, -2])


class TestRaw2Outputs:
    def test_opaque_front_sample(self):
        r, s = 3, 8
        raw = jnp.zeros((r, s, 4))
        raw = raw.at[:, 2, 3].set(1e9)          # infinite density at sample 2
        raw = raw.at[:, 2, :3].set(jnp.array([1.0, 0.0, 0.5]))
        z = jnp.broadcast_to(jnp.linspace(1, 5, s), (r, s))
        out = volume.raw2outputs(raw, z, jnp.ones((r, s, 1)))
        np.testing.assert_allclose(np.asarray(out["rgb"][0]), [1.0, 0.0, 0.5], atol=1e-4)
        np.testing.assert_allclose(float(out["depth"][0]), float(z[0, 2]), rtol=1e-4)


def make_ray_scene(key, v=3, h=24, w=32):
    from tests.test_models import tiny_context

    ctx = tiny_context(key, v=v)
    K4 = np.eye(4, dtype=np.float32)
    K = np.asarray(ctx["intrinsics"][0, 0]) * np.array([[w, 0, w], [0, h, h], [0, 0, 1]])
    K4[:3, :3] = K
    cams = []
    for i in range(v):
        c2w = np.asarray(ctx["extrinsics"][0, i])
        cams.append(np.concatenate([[h, w], K4.flatten(), c2w.flatten()]))
    return jnp.asarray(np.stack(cams), jnp.float32)


class TestProjector:
    def test_projection_roundtrip(self):
        # Points along the camera axis of view 0 must project to its center.
        h, w = 24, 32
        cams = make_ray_scene(jax.random.PRNGKey(0), h=h, w=w)
        K = cams[0, 2:18].reshape(4, 4)
        pose = cams[0, 18:34].reshape(4, 4)
        pix, in_front = projector.compute_projections(
            jnp.array([[0.0, 0.0, 3.0]]) + pose[:3, 3],
            K[None], pose[None],
        )
        assert bool(in_front[0, 0])
        np.testing.assert_allclose(np.asarray(pix[0, 0]), [K[0, 2], K[1, 2]], rtol=1e-4)

    def test_gather_shapes(self):
        h, w = 24, 32
        v = 3
        cams = make_ray_scene(jax.random.PRNGKey(0), v=v, h=h, w=w)
        src_rgbs = jax.random.uniform(jax.random.PRNGKey(1), (v, h, w, 3))
        feat = jax.random.normal(jax.random.PRNGKey(2), (v, h // 2, w // 2, 8))
        pts = jax.random.uniform(jax.random.PRNGKey(3), (10, 6, 3), minval=-0.5, maxval=0.5) + jnp.array([0, 0, 3.0])
        rgb_feat, ray_diff, mask = projector.project_and_gather(
            pts, cams[0], src_rgbs, cams, feat
        )
        assert rgb_feat.shape == (10, 6, v, 11)
        assert ray_diff.shape == (10, 6, v, 4)
        assert mask.shape == (10, 6, v, 1)
        # Unit-ish direction + dot in [-1, 1].
        assert float(jnp.abs(ray_diff[..., 3]).max()) <= 1.0 + 1e-5


class TestIBRNetEndToEnd:
    @pytest.mark.slow
    def test_render_rays(self):
        from ggrt_official_tpu.config import GGRtConfig
        from ggrt_official_tpu.models.dbarf import IBRNetModel

        h, w, v = 24, 32, 3
        cams = make_ray_scene(jax.random.PRNGKey(0), v=v, h=h, w=w)
        src_rgbs = jax.random.uniform(jax.random.PRNGKey(1), (v, h, w, 3))

        cfg = GGRtConfig()
        model = IBRNetModel(cfg, coarse_feat_dim=16, coarse_only=True, n_samples=8)

        # Init via the combined entry.
        dummy_feat = jnp.zeros((4, 2, v, 16 + 3))
        dummy_diff = jnp.zeros((4, 2, v, 4))
        dummy_mask = jnp.ones((4, 2, v, 1))
        params = model.init(jax.random.PRNGKey(2), src_rgbs, dummy_feat, dummy_diff, dummy_mask)

        feats = model.apply(params, src_rgbs, method="extract_features")
        assert feats[0].shape == (v, h // 2, w // 2, 16)

        K = cams[0, 2:18].reshape(4, 4)[None]
        c2w = cams[0, 18:34].reshape(4, 4)[None]
        ray_o, ray_d = rays.get_rays_single_image(h, w, K, c2w, render_stride=4)
        ray_batch = {
            "ray_o": ray_o,
            "ray_d": ray_d,
            "depth_range": jnp.array([1.0, 10.0]),
            "camera": cams[0],
            "src_rgbs": src_rgbs,
            "src_cameras": cams,
        }
        out = volume.render_rays(
            jax.random.PRNGKey(3),
            ray_batch,
            lambda f, d, m: model.apply(params, f, d, m, method="coarse"),
            (feats[0], None),
            n_samples=8,
            det=True,
        )
        rgb = out["outputs_coarse"]["rgb"]
        assert rgb.shape == (ray_o.shape[0], 3)
        assert np.isfinite(np.asarray(rgb)).all()
        assert 0.0 <= float(rgb.min()) and float(rgb.max()) <= 1.0 + 1e-4
