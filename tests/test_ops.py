"""Tests for compute ops: SH eval/rotation, grid_sample, SSIM."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from ggrt_official_tpu.geometry import se3
from ggrt_official_tpu.ops import grid_sample, sh, ssim


class TestSH:
    @pytest.mark.parametrize("degree", [0, 1, 2, 3, 4])
    def test_basis_orthonormality(self, degree):
        # Monte-Carlo: \int Y_i Y_j dOmega = delta_ij (4*pi weight / N samples).
        key = jax.random.PRNGKey(0)
        v = jax.random.normal(key, (200_000, 3))
        v = v / jnp.linalg.norm(v, axis=-1, keepdims=True)
        # Undo the 3DGS sign quirks to test orthonormality of magnitudes only.
        basis = sh.eval_sh_basis(v, degree)
        gram = (basis.T @ basis) * (4 * jnp.pi / v.shape[0])
        np.testing.assert_allclose(np.asarray(gram), np.eye(basis.shape[1]), atol=0.05)

    @pytest.mark.parametrize("degree", [1, 2, 3, 4])
    def test_rotation_consistency(self, degree):
        """rotate_sh must satisfy: eval(rotate(c, R), d) == eval(c, R^T d)."""
        key = jax.random.PRNGKey(1)
        n = (degree + 1) ** 2
        coeffs = jax.random.normal(key, (3, n)) * 0.5
        R = se3.so3_exp(jnp.array([0.4, -0.7, 0.2]))
        dirs = jax.random.normal(jax.random.PRNGKey(2), (50, 3))
        dirs = dirs / jnp.linalg.norm(dirs, axis=-1, keepdims=True)

        rotated = sh.rotate_sh(coeffs, R)
        lhs = sh.eval_sh(jnp.broadcast_to(rotated, (50, 3, n)), dirs)
        rhs = sh.eval_sh(jnp.broadcast_to(coeffs, (50, 3, n)), dirs @ R)
        np.testing.assert_allclose(np.asarray(lhs), np.asarray(rhs), atol=1e-4, rtol=1e-4)

    def test_rotation_identity(self):
        coeffs = jax.random.normal(jax.random.PRNGKey(3), (3, 25))
        out = sh.rotate_sh(coeffs, jnp.eye(3))
        np.testing.assert_allclose(np.asarray(out), np.asarray(coeffs), atol=1e-5)

    def test_rotation_composition(self):
        coeffs = jax.random.normal(jax.random.PRNGKey(4), (3, 16))
        Ra = se3.so3_exp(jnp.array([0.3, 0.1, -0.2]))
        Rb = se3.so3_exp(jnp.array([-0.1, 0.5, 0.4]))
        once = sh.rotate_sh(sh.rotate_sh(coeffs, Ra), Rb)
        both = sh.rotate_sh(coeffs, Rb @ Ra)
        np.testing.assert_allclose(np.asarray(once), np.asarray(both), atol=1e-4, rtol=1e-4)

    def test_rotation_differentiable(self):
        coeffs = jnp.ones((3, 9))
        g = jax.grad(lambda w: jnp.sum(sh.rotate_sh(coeffs, se3.so3_exp(w))))(
            jnp.array([0.1, 0.2, 0.3])
        )
        assert np.isfinite(np.asarray(g)).all()


def _torch_grid_sample(image, grid, align_corners):
    import torch
    import torch.nn.functional as F

    out = F.grid_sample(
        torch.from_numpy(np.asarray(image)),
        torch.from_numpy(np.asarray(grid)),
        mode="bilinear",
        padding_mode="zeros",
        align_corners=align_corners,
    )
    return out.numpy()


class TestGridSample:
    @pytest.mark.parametrize("align_corners", [False, True])
    def test_matches_torch(self, align_corners):
        key = jax.random.PRNGKey(0)
        image = jax.random.normal(key, (2, 3, 9, 13))
        grid = jax.random.uniform(jax.random.PRNGKey(1), (2, 5, 7, 2), minval=-1.3, maxval=1.3)
        ours = grid_sample.grid_sample(image, grid, align_corners=align_corners)
        theirs = _torch_grid_sample(image, grid, align_corners)
        np.testing.assert_allclose(np.asarray(ours), theirs, atol=1e-5, rtol=1e-4)

    def test_differentiable(self):
        image = jnp.ones((1, 1, 4, 4))
        grid = jnp.zeros((1, 2, 2, 2))
        g = jax.grad(lambda im: jnp.sum(grid_sample.grid_sample(im, grid)))(image)
        assert np.isfinite(np.asarray(g)).all()


class TestSSIM:
    def test_identical_images(self):
        img = jax.random.uniform(jax.random.PRNGKey(0), (1, 3, 32, 32))
        assert float(ssim.ssim_metric(img, img)) > 0.999
        np.testing.assert_allclose(
            np.asarray(ssim.ssim_photometric(img, img)), 1.0, atol=1e-4
        )

    def test_different_images_lower(self):
        img = jax.random.uniform(jax.random.PRNGKey(0), (1, 3, 32, 32))
        noise = img + 0.3 * jax.random.normal(jax.random.PRNGKey(1), img.shape)
        assert float(ssim.ssim_metric(img, noise)) < 0.9
