"""Visualization suite: drawing, layout, colormaps, cameras."""
import jax.numpy as jnp
import numpy as np
import pytest

from ggrt_official_tpu.visualization import (
    add_border, add_label, apply_color_map_to_image, draw_cameras,
    draw_lines, draw_points, hcat, render_projections, resize, vcat,
    visualize_attention, visualize_features,
)


class TestDrawing:
    def test_horizontal_line_covers_expected_pixels(self):
        img = jnp.zeros((3, 32, 64))
        out = draw_lines(img, [[8.0, 16.0]], [[56.0, 16.0]], (1.0, 0.0, 0.0), width=3)
        out = np.asarray(out)
        assert out[0, 16, 32] > 0.9          # on the line: red
        assert out[1, 16, 32] < 1e-6         # no green
        assert out[0, 16, 2] < 1e-6          # before the start cap
        assert out[0, 4, 32] < 1e-6          # far from the line

    def test_antialiasing_partial_coverage(self):
        img = jnp.zeros((3, 32, 32))
        out = np.asarray(
            draw_lines(img, [[4.0, 10.75]], [[28.0, 10.75]], 1.0, width=1.0)
        )
        col = out[0, :, 16]
        # Line center sits between pixel rows 10 and 11: both get partial
        # coverage (the analytic feather), summing to ~the line width.
        assert 0.05 < col[10] < 1.0 and 0.05 < col[11] < 1.0
        assert 0.8 < col[10] + col[11] < 1.2

    def test_painter_order_last_on_top(self):
        img = jnp.zeros((3, 16, 16))
        out = draw_lines(
            img,
            [[0.0, 8.0], [8.0, 0.0]],
            [[16.0, 8.0], [8.0, 16.0]],
            [[1.0, 0.0, 0.0], [0.0, 1.0, 0.0]],
            width=3,
        )
        out = np.asarray(out)
        assert out[1, 8, 8] > 0.9            # crossing pixel: green (later)

    def test_points_and_ring(self):
        img = jnp.zeros((3, 32, 32))
        out = np.asarray(draw_points(img, [[16.0, 16.0]], 1.0, radius=5.0))
        assert out[0, 16, 16] > 0.99
        ring = np.asarray(
            draw_points(img, [[16.0, 16.0]], 1.0, radius=6.0, inner_radius=3.0)
        )
        assert ring[0, 16, 16] < 0.05 and ring[0, 16, 21] > 0.5

    def test_world_range_mapping(self):
        img = jnp.zeros((3, 20, 20))
        out = np.asarray(
            draw_points(img, [[0.0, 0.0]], 1.0, radius=2.0,
                        x_range=(-1.0, 1.0), y_range=(-1.0, 1.0))
        )
        assert out[0, 10, 10] > 0.9          # world origin -> image center


class TestLayout:
    def test_hcat_vcat_shapes(self):
        a = jnp.zeros((3, 10, 4))
        b = jnp.zeros((3, 6, 8))
        h = hcat(a, b, gap=2)
        assert h.shape == (3, 10, 14)
        v = vcat(a, b, gap=3)
        assert v.shape == (3, 19, 8)

    def test_border_and_resize(self):
        a = jnp.zeros((3, 10, 10))
        assert add_border(a, 4).shape == (3, 18, 18)
        assert resize(a, width=20).shape == (3, 20, 20)
        assert resize(a, shape=(5, 7)).shape == (3, 5, 7)

    def test_align_center_pads_evenly(self):
        a = jnp.zeros((3, 4, 4))
        b = jnp.zeros((3, 8, 4))
        out = np.asarray(hcat(a, b, align="center", gap=0, gap_color=1.0))
        assert out.shape == (3, 8, 8)
        assert out[0, 0, 0] == 1.0 and out[0, 4, 0] == 0.0


class TestColorAndFeatures:
    def test_color_map_shapes(self):
        x = jnp.linspace(0, 1, 12).reshape(3, 4)
        out = apply_color_map_to_image(x, "viridis")
        assert out.shape == (3, 3, 4)
        assert float(out.min()) >= 0.0 and float(out.max()) <= 1.0

    def test_feature_pca(self):
        import jax

        f = jax.random.normal(jax.random.PRNGKey(0), (16, 12, 10))
        out = visualize_features(f)
        assert out.shape == (3, 12, 10)
        assert np.isfinite(np.asarray(out)).all()

    def test_attention_overlay(self):
        import jax

        img = jnp.zeros((3, 16, 16))
        attn = jax.random.uniform(jax.random.PRNGKey(1), (4, 4))
        out = visualize_attention(attn, img)
        assert out.shape == (3, 16, 16)
        assert float(out.max()) > 0.0

    def test_add_label(self):
        img = jnp.zeros((3, 20, 64))
        out = add_label(img, "hello")
        assert out.shape[0] == 3 and out.shape[2] == 64
        assert out.shape[1] > 20


class TestCameras:
    def _cams(self):
        e = np.stack([np.eye(4, dtype=np.float32) for _ in range(3)])
        e[1, 0, 3] = 1.0
        e[2, 2, 3] = -1.0
        k = np.array([[[0.8, 0, 0.5], [0, 0.8, 0.5], [0, 0, 1]]] * 3, np.float32)
        return jnp.asarray(e), jnp.asarray(k)

    def test_draw_cameras(self):
        e, k = self._cams()
        views = draw_cameras(64, e, k, jnp.ones((3, 3)), near=0.5, far=3.0)
        assert views.shape[0] == 3 and views.shape[1] == 3
        v = np.asarray(views)
        assert np.isfinite(v).all() and v.max() > 0.1

    def test_render_projections(self):
        import jax

        e, k = self._cams()
        pts = jax.random.normal(jax.random.PRNGKey(2), (200, 3))
        views = render_projections(pts, 64, extrinsics=e, intrinsics=k)
        assert views.shape == (3, 3, 64, 64)
        assert np.asarray(views).max() > 0.1
