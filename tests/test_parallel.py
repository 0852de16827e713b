"""Multi-device tests on the 8-device virtual CPU mesh."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from jax.sharding import Mesh

from ggrt_official_tpu.parallel.mesh import make_mesh


class TestMesh:
    def test_axes(self):
        mesh = make_mesh(data_parallel=4, tile_parallel=2)
        assert mesh.shape["dp"] == 4 and mesh.shape["tp"] == 2

    def test_default_fill(self):
        mesh = make_mesh(tile_parallel=2)
        assert mesh.shape["dp"] * mesh.shape["tp"] == 8


class TestTileParallelRender:
    @pytest.mark.slow
    def test_matches_unsharded(self):
        from tests.test_rasterizer import SHAPE, make_scene, render_with
        from ggrt_official_tpu.parallel.tile_parallel import render_tile_parallel

        scene = make_scene(jax.random.PRNGKey(0), n=150)
        ref = render_with(scene, "tiled", max_per_tile=256)

        mesh = make_mesh(data_parallel=1, tile_parallel=8)
        img = render_tile_parallel(
            mesh,
            scene["means"][0], scene["covariances"][0], scene["sh_coeffs"][0],
            scene["opacities"][0],
            scene["extrinsics"][0], scene["intrinsics"][0],
            # scale-invariance applied by render(); apply the same here
            scene["near"][0], scene["far"][0],
            SHAPE, scene["background"][0],
            max_dup=32, max_per_tile=256,
        )
        # render() applies the near=1 world rescale; our scene already has
        # near == 1 so results must match directly.
        np.testing.assert_allclose(
            np.asarray(img), np.asarray(ref[0]), atol=1e-5, rtol=1e-4
        )

    @pytest.mark.slow
    def test_pallas_backend_matches_unsharded(self):
        # Value check for the sharded-Pallas-kernel path: this is the exact
        # spot where a channel/pixel axis mixup shipped silently when only
        # the "tiled" backend was value-checked.
        from jax.experimental.pallas import tpu as pltpu

        from tests.test_rasterizer import SHAPE, make_scene, render_with
        from ggrt_official_tpu.parallel.tile_parallel import render_tile_parallel

        scene = make_scene(jax.random.PRNGKey(0), n=150)
        ref = render_with(scene, "tiled", max_per_tile=256)

        mesh = make_mesh(data_parallel=1, tile_parallel=8)
        with pltpu.force_tpu_interpret_mode():
            img = render_tile_parallel(
                mesh,
                scene["means"][0], scene["covariances"][0], scene["sh_coeffs"][0],
                scene["opacities"][0],
                scene["extrinsics"][0], scene["intrinsics"][0],
                scene["near"][0], scene["far"][0],
                SHAPE, scene["background"][0],
                max_dup=32, max_per_tile=256, backend="pallas",
            )
        np.testing.assert_allclose(
            np.asarray(img), np.asarray(ref[0]), atol=1e-4, rtol=1e-4
        )

    def test_grads_flow_through_shard_map(self):
        from tests.test_rasterizer import SHAPE, make_scene
        from ggrt_official_tpu.parallel.tile_parallel import render_tile_parallel

        scene = make_scene(jax.random.PRNGKey(1), n=50)
        mesh = make_mesh(data_parallel=1, tile_parallel=8)

        def loss(means):
            img = render_tile_parallel(
                mesh, means, scene["covariances"][0], scene["sh_coeffs"][0],
                scene["opacities"][0], scene["extrinsics"][0], scene["intrinsics"][0],
                scene["near"][0], scene["far"][0], SHAPE, scene["background"][0],
                max_per_tile=64,
            )
            return jnp.mean(img**2)

        g = jax.jit(jax.grad(loss))(scene["means"][0])
        assert np.isfinite(np.asarray(g)).all()
        assert np.abs(np.asarray(g)).max() > 0
