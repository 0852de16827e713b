"""Crop-tiled eval: stitched tile renders must reproduce the full render.

VERDICT round-1 item 7 acceptance: "stitched large-image eval reproduces
full-image render within tolerance on synthetic data". The tiles are
rendered through principal-point-shifted intrinsics (the reference's
eval_crop random_crop math), so any mismatch would expose an intrinsics
convention error.
"""
import jax
import jax.numpy as jnp
import numpy as np

from ggrt_official_tpu.evaluation.crop_eval import (
    crop_batch,
    crop_centers,
    eval_crop_view,
    psnr_compare,
    stitch_tiles,
)
from ggrt_official_tpu.ops.rasterizer import api as raster


def test_crop_centers_cover_and_clamp():
    cs = crop_centers(70, 100, 32, 48)
    assert len(cs) == 3 * 3
    for i, j, ch, cw in cs:
        assert 16 <= ch <= 70 - 16
        assert 24 <= cw <= 100 - 24


def test_stitch_roundtrip():
    rs = np.random.RandomState(0)
    h, w, ch, cw = 70, 100, 32, 48
    img = rs.rand(h, w, 3).astype(np.float32)
    tiles = {}
    for i, j, cy, cx in crop_centers(h, w, ch, cw):
        y0, x0 = cy - ch // 2, cx - cw // 2
        tiles[(i, j)] = img[y0 : y0 + ch, x0 : x0 + cw]
    out = stitch_tiles(tiles, h, w, ch, cw)
    np.testing.assert_array_equal(out, img)
    assert psnr_compare(out, img) > 50


def test_tiled_render_matches_full():
    key = jax.random.PRNGKey(0)
    n = 200
    ks = jax.random.split(key, 5)
    means = jnp.stack(
        [
            jax.random.uniform(ks[0], (1, n), minval=-1.0, maxval=1.0),
            jax.random.uniform(ks[1], (1, n), minval=-0.7, maxval=0.7),
            jax.random.uniform(ks[2], (1, n), minval=2.0, maxval=6.0),
        ],
        axis=-1,
    )
    cov = jnp.broadcast_to(jnp.eye(3) * 0.001, (1, n, 3, 3))
    sh = jax.random.normal(ks[3], (1, n, 3, 1)) * 0.4
    opa = jax.random.uniform(ks[4], (1, n), minval=0.3, maxval=0.9)
    extr = jnp.eye(4)[None]
    near, far = jnp.full((1,), 1.0), jnp.full((1,), 10.0)
    bg = jnp.zeros((1, 3))

    h, w = 64, 96
    intr = jnp.array([[[1.1, 0.0, 0.5], [0.0, 1.1, 0.5], [0.0, 0.0, 1.0]]])

    full = raster.render(
        extr, intr, near, far, (h, w), bg, means, cov, sh, opa,
        backend="tiled", max_per_tile=256,
    )

    batch = {
        "context": {
            "image": np.zeros((1, 1, 3, h, w), np.float32),
            "intrinsics": np.asarray(intr)[None],
        },
        "target": {
            "image": np.asarray(full)[None],
            "intrinsics": np.asarray(intr)[None],
        },
    }

    def render_fn(cropped):
        K = jnp.asarray(cropped["target"]["intrinsics"][0], jnp.float32)
        chc, cwc = cropped["target"]["image"].shape[-2:]
        img = raster.render(
            extr, K, near, far, (chc, cwc), bg, means, cov, sh, opa,
            backend="tiled", max_per_tile=256,
        )
        return img[0]

    stitched, psnr = eval_crop_view(render_fn, batch, 32, 32)
    gt = np.asarray(full)[0].transpose(1, 2, 0)
    # Crops shift the principal point, which changes the EWA focal (computed
    # from the now-asymmetric frustum via get_fov) exactly as the reference
    # CUDA path does (cuda_splatting.py:58-64) — sub-percent alpha
    # differences on off-axis Gaussians bound the stitched-vs-full PSNR.
    assert psnr > 35, psnr
    assert np.mean(np.abs(stitched - gt)) < 8e-3
