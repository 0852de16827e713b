"""Tests for the vestigial NeRF/BARF models."""
import jax
import jax.numpy as jnp
import numpy as np


class TestPositionalEncoding:
    def test_shapes_and_range(self):
        from ggrt_official_tpu.models.nerf import positional_encoding

        x = jnp.array([[0.1, -0.2, 0.3]])
        enc = positional_encoding(x, 4)
        assert enc.shape == (1, 3 * 2 * 4)
        assert float(jnp.abs(enc).max()) <= 1.0 + 1e-6

    def test_barf_annealing(self):
        from ggrt_official_tpu.models.nerf import barf_annealing_weights

        w0 = barf_annealing_weights(8, 0.0)
        w1 = barf_annealing_weights(8, 1.0)
        np.testing.assert_allclose(np.asarray(w0), 0.0, atol=1e-7)
        np.testing.assert_allclose(np.asarray(w1), 1.0, atol=1e-7)
        w_half = barf_annealing_weights(8, 0.5)
        assert float(w_half[0]) == 1.0 and float(w_half[-1]) == 0.0


class TestNeRF:
    def test_render_smoke(self):
        from ggrt_official_tpu.models.nerf import NeRFMLP, render_nerf_rays

        mlp = NeRFMLP(depth=2, width=32, num_freqs_xyz=4, num_freqs_dir=2, skip_layer=1)
        xyz = jnp.zeros((4, 8, 3))
        dirs = jnp.tile(jnp.array([0.0, 0.0, 1.0]), (4, 8, 1))
        params = mlp.init(jax.random.PRNGKey(0), xyz, dirs)

        rays_o = jnp.zeros((4, 3))
        rays_d = jnp.tile(jnp.array([0.0, 0.0, 1.0]), (4, 1))
        out = render_nerf_rays(
            lambda p, d: mlp.apply(params, p, d), rays_o, rays_d, 1.0, 5.0, n_samples=8
        )
        assert out["rgb"].shape == (4, 3)
        assert np.isfinite(np.asarray(out["rgb"])).all()
        assert 0.0 <= float(out["rgb"].min()) and float(out["rgb"].max()) <= 1.0


class TestBARF:
    def test_pose_refine_grad(self):
        from ggrt_official_tpu.models.nerf import BARFModel

        model = BARFModel(num_cameras=3, depth=2, width=32, num_freqs_xyz=4)
        xyz = jnp.zeros((2, 4, 3))
        dirs = jnp.tile(jnp.array([0.0, 0.0, 1.0]), (2, 4, 1))
        params = model.init(jax.random.PRNGKey(0), xyz, dirs)

        base = jnp.eye(4)

        def loss(p):
            c2w = model.apply(p, 0, base, method="corrected_pose")
            return jnp.sum(c2w[:3, 3] ** 2) + jnp.sum(
                model.apply(p, xyz, dirs, progress=0.5) ** 2
            )

        g = jax.grad(loss)(params)
        leaves = jax.tree_util.tree_leaves(g)
        assert all(np.isfinite(np.asarray(l)).all() for l in leaves)
        # Identity correction at init.
        c2w = model.apply(params, 1, base, method="corrected_pose")
        np.testing.assert_allclose(np.asarray(c2w), np.eye(4), atol=1e-6)
