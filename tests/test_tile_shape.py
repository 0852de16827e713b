"""Tile-shape parameterization (round 4, VERDICT r3 #4 prep).

The compositor's (P, CH) layout puts pixels on SUBLANES and gaussian
chunks on lanes, so the screen-tile shape is a free knob: P = th*tw only
needs sublane (8) alignment, not the 128-lane width. Smaller tiles cut
the per-(gaussian, tile)-pair pixel work (the CUDA reference composites
256-px 16x16 tiles, cuda_splatting.py / SURVEY §2.1 step 3; our default
8x128 = 1024 px evaluates 4x the pixels per pair).

Tiling is work PARTITIONING: at capacities covering demand, the rendered
image must be identical for every tile shape. These tests pin that, plus
pallas-vs-XLA parity at non-default shapes.
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from jax.experimental.pallas import tpu as pltpu

from tests.test_rasterizer import SHAPE, make_scene, render_with


@pytest.mark.parametrize("tile_shape", [(8, 32), (16, 16), (8, 16)])
def test_tiled_matches_oracle_at_tile_shape(tile_shape):
    """Culling is tile-granular (a gaussian reaches exactly the tiles its
    extent AABB overlaps), so the oracle must be evaluated at the SAME tile
    shape; under that contract the tiled backend is exact."""
    scene = make_scene(jax.random.PRNGKey(3), n=150)
    ref = render_with(scene, "reference", tile_shape=tile_shape)
    alt = render_with(scene, "tiled", max_per_tile=256, tile_shape=tile_shape)
    np.testing.assert_allclose(np.asarray(alt), np.asarray(ref), atol=2e-5, rtol=1e-4)


def test_tile_shape_boundary_effect_is_small():
    """Across tile shapes images agree except at beyond-extent boundary
    pixels (the same class of deviation the CUDA 3-sigma square has):
    bound it."""
    scene = make_scene(jax.random.PRNGKey(3), n=150)
    base = np.asarray(render_with(scene, "tiled", max_per_tile=256))
    alt = np.asarray(
        render_with(scene, "tiled", max_per_tile=256, tile_shape=(16, 16))
    )
    diff = np.abs(alt - base)
    assert float(diff.mean()) < 2e-4 and float((diff > 1e-3).mean()) < 0.02


@pytest.mark.parametrize("binning", ["sort", "banked", "counting"])
def test_binning_modes_match_at_small_tiles(binning):
    scene = make_scene(jax.random.PRNGKey(4), n=120)
    base = render_with(scene, "tiled", max_per_tile=256, tile_shape=(8, 32))
    alt = render_with(
        scene, "tiled", max_per_tile=256, tile_shape=(8, 32),
        binning_mode=binning, max_dup=8,
    )
    np.testing.assert_allclose(np.asarray(alt), np.asarray(base), atol=2e-5, rtol=1e-4)


class TestPallasTileShape:
    @pytest.fixture(autouse=True)
    def interpret_mode(self):
        with pltpu.force_tpu_interpret_mode():
            yield

    @pytest.mark.parametrize("tile_shape", [(8, 32), (16, 16)])
    def test_forward_matches_tiled(self, tile_shape):
        scene = make_scene(jax.random.PRNGKey(5), n=100)
        tiled = render_with(scene, "tiled", max_per_tile=128, tile_shape=tile_shape)
        pallas = render_with(scene, "pallas", max_per_tile=128, tile_shape=tile_shape)
        np.testing.assert_allclose(
            np.asarray(pallas), np.asarray(tiled), atol=1e-5, rtol=1e-4
        )

    def test_grads_match_tiled(self):
        scene = make_scene(jax.random.PRNGKey(6), n=60)
        args = (
            scene["means"], scene["covariances"], scene["sh_coeffs"],
            scene["opacities"], scene["extrinsics"],
        )

        def loss(backend):
            def f(means, cov, sh, opa, extr):
                from ggrt_official_tpu.ops.rasterizer import api

                img = api.render(
                    extr, scene["intrinsics"], scene["near"], scene["far"],
                    SHAPE, scene["background"], means, cov, sh, opa,
                    backend=backend, max_per_tile=128, tile_shape=(8, 32),
                )
                return jnp.mean(img**2)

            return jax.grad(f, argnums=(0, 1, 2, 3, 4))(*args)

        gt = loss("tiled")
        gp = loss("pallas")
        for a, b in zip(gt, gp):
            np.testing.assert_allclose(
                np.asarray(b), np.asarray(a), atol=2e-5, rtol=2e-3
            )
