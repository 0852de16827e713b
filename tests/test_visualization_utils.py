"""Visualization layer: layout/drawing/pose plots + encoder dumps
(ref ggrt/visualization/ + encoder_visualizer_epipolar.py surfaces)."""
import numpy as np

from ggrt_official_tpu.utils import encoder_visualizer as ev
from ggrt_official_tpu.utils import visualization as vis


class TestLayout:
    def test_hcat_vcat_border(self):
        a = np.zeros((3, 8, 10), np.float32)
        b = np.ones((12, 6, 3), np.float32)
        h = vis.hcat(a, b)
        assert h.ndim == 3 and h.shape[-1] == 3
        assert h.shape[0] == 12 and h.shape[1] == 10 + 2 + 6
        v = vis.vcat(a, b)
        assert v.shape[1] == 10 and v.shape[0] == 8 + 2 + 12
        bb = vis.add_border(a, width=3)
        assert bb.shape == (14, 16, 3)

    def test_draw(self):
        img = np.zeros((16, 16, 3), np.float32)
        out = vis.draw_points(img, np.array([[0.5, 0.5]]), color=(0, 1, 0))
        assert out[8, 8, 1] == 1.0
        out2 = vis.draw_lines(img, np.array([[0.0, 0.0]]), np.array([[1.0, 1.0]]))
        assert out2.max() == 1.0 and np.isfinite(out2).all()

    def test_plot_cameras(self, tmp_path):
        poses = np.tile(np.eye(4, dtype=np.float32), (3, 1, 1))
        poses[:, 0, 3] = [0.0, 0.5, 1.0]
        path = str(tmp_path / "cams.png")
        vis.plot_cameras(poses, out_path=path, gt_c2ws=poses)
        import os

        assert os.path.exists(path) and os.path.getsize(path) > 0


class TestEncoderDumps:
    def test_attention(self):
        attn = np.random.RandomState(0).dirichlet(np.ones(8), size=(4 * 6, 2))
        out = ev.visualize_attention(attn, (4, 6))
        assert out.shape == (2, 4, 6, 3) and np.isfinite(out).all()

    def test_overlaps(self):
        valid = np.random.RandomState(1).rand(2, 1, 24) > 0.3
        out = ev.visualize_overlaps(valid, (4, 6))
        assert out.shape == (2, 4, 6, 3)

    def test_probabilities(self):
        pdf = np.random.RandomState(2).dirichlet(np.ones(16), size=24)
        out = ev.visualize_probabilities(pdf, (4, 6))
        assert out.shape == (2, 4, 6, 3)

    def test_gaussians(self):
        from ggrt_official_tpu.models.gaussian_adapter import Gaussians

        v, h, w, spp = 2, 4, 6, 3
        n = v * h * w * spp
        f = np.full
        g = Gaussians(
            means=f((1, n, 3), 0.5), covariances=f((1, n, 3, 3), 0.1),
            harmonics=f((1, n, 3, 4), 0.2), opacities=f((1, n), 0.7),
            scales=f((1, n, 3), 0.02), rotations=f((1, n, 4), 0.5),
        )
        out = ev.visualize_gaussians(g, (h, w), v, spp)
        assert out.shape == (v, 2, h, w, 3)


class TestEncoderDumpDriver:
    def test_dump_encoder_visualizations(self, tmp_path):
        """The flax-intermediates dump driver (reference
        encoder_visualizer_epipolar.py:36-128 equivalent) emits attention
        entropy + depth-pdf maps + the rendered rgb, and writes PNGs."""
        import jax

        from ggrt_official_tpu.data.datasets import (
            SyntheticPlanesDataset, SyntheticSceneSpec, collate_batch,
        )
        from ggrt_official_tpu.training.trainer import GGRtTrainer
        from tests.test_models import tiny_cfg

        cfg = tiny_cfg()
        ds = SyntheticPlanesDataset(
            SyntheticSceneSpec(n_views=8, image_size=(32, 64)), num_source_views=3
        )
        trainer = GGRtTrainer(cfg)
        batch_raw = collate_batch(ds[0])
        trainer.init_full(batch_raw)
        batch = trainer.prepare_batch(batch_raw)

        dumps = ev.dump_encoder_visualizations(
            trainer.model, trainer.state.params, batch, step=0,
            image_shape=(32, 64), out_dir=str(tmp_path),
        )
        assert any(k.startswith("attention_") for k in dumps), dumps.keys()
        assert any(k.startswith("depth_pdf_") for k in dumps), dumps.keys()
        assert "rendered_rgb" in dumps
        for v in dumps.values():
            assert np.isfinite(np.asarray(v)).all()
        import os

        pngs = [f for f in os.listdir(tmp_path) if f.endswith(".png")]
        assert pngs, "expected at least one PNG dump"
