"""Pallas compositing kernels vs the XLA tiled backend (interpret mode on CPU)."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from jax.experimental.pallas import tpu as pltpu

from tests.test_rasterizer import SHAPE, make_scene, render_with


def render_pallas(scene, **kw):
    from ggrt_official_tpu.ops.rasterizer import api

    return api.render(
        scene["extrinsics"], scene["intrinsics"], scene["near"], scene["far"],
        SHAPE, scene["background"], scene["means"], scene["covariances"],
        scene["sh_coeffs"], scene["opacities"], backend="pallas", **kw,
    )


@pytest.fixture(autouse=True)
def interpret_mode():
    with pltpu.force_tpu_interpret_mode():
        yield


class TestPallasForward:
    def test_matches_tiled(self):
        scene = make_scene(jax.random.PRNGKey(0), n=100)
        tiled = render_with(scene, "tiled", max_per_tile=128)
        pallas = render_pallas(scene, max_per_tile=128)
        np.testing.assert_allclose(
            np.asarray(pallas), np.asarray(tiled), atol=1e-5, rtol=1e-4
        )

    def test_background(self):
        scene = make_scene(jax.random.PRNGKey(1), n=5)
        scene["background"] = jnp.full((1, 3), 0.4)
        tiled = render_with(scene, "tiled", max_per_tile=32)
        pallas = render_pallas(scene, max_per_tile=32)
        np.testing.assert_allclose(
            np.asarray(pallas), np.asarray(tiled), atol=1e-5, rtol=1e-4
        )


class TestPallasBackward:
    def test_grads_match_tiled(self):
        scene = make_scene(jax.random.PRNGKey(2), n=40)
        target = jnp.full((1, 3, *SHAPE), 0.3)

        def loss_fn(backend):
            from ggrt_official_tpu.ops.rasterizer import api

            def f(means, cov, sh, opa, extr):
                img = api.render(
                    extr, scene["intrinsics"], scene["near"], scene["far"],
                    SHAPE, scene["background"], means, cov, sh, opa,
                    backend=backend, max_per_tile=64,
                )
                return jnp.mean((img - target) ** 2)

            return f

        args = (
            scene["means"], scene["covariances"], scene["sh_coeffs"],
            scene["opacities"], scene["extrinsics"],
        )
        g_tiled = jax.grad(loss_fn("tiled"), argnums=(0, 1, 2, 3, 4))(*args)
        g_pallas = jax.grad(loss_fn("pallas"), argnums=(0, 1, 2, 3, 4))(*args)
        for name, a, b in zip(["means", "cov", "sh", "opa", "extr"], g_tiled, g_pallas):
            a, b = np.asarray(a), np.asarray(b)
            assert np.isfinite(b).all(), name
            scale = np.abs(a).max() + 1e-8
            np.testing.assert_allclose(b / scale, a / scale, atol=5e-4, err_msg=name)
