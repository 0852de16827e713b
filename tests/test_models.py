"""Smoke + shape tests for the flax model stack on tiny inputs."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from ggrt_official_tpu import config as cfg_mod
from ggrt_official_tpu.models import epipolar_sampler


def tiny_cfg():
    cfg = cfg_mod.GGRtConfig()
    cfg.encoder.d_feature = 32
    cfg.encoder.num_monocular_samples = 8
    cfg.encoder.gaussians_per_pixel = 2
    cfg.encoder.backbone.model = "resnet18"
    cfg.encoder.backbone.num_layers = 3
    cfg.encoder.backbone.d_out = 32
    cfg.encoder.gaussian_adapter.sh_degree = 1
    et = cfg.encoder.epipolar_transformer
    et.num_samples = 4
    et.num_octaves = 4
    et.num_layers = 1
    et.num_heads = 2
    et.d_dot = 16
    et.d_mlp = 32
    et.downscale = 4
    et.self_attention.patch_size = 2
    et.self_attention.num_octaves = 4
    et.self_attention.num_layers = 1
    et.self_attention.num_heads = 2
    et.self_attention.d_token = 16
    et.self_attention.d_dot = 16
    et.self_attention.d_mlp = 32
    cfg.decoder.backend = "tiled"
    cfg.decoder.max_per_tile = 128
    cfg.decoder.tile_chunk = 4
    cfg.iponet.iters = 4
    cfg.iponet.seq_len = 2
    cfg.iponet.foutput_dim = 32
    cfg.iponet.hidden_dim = 32
    cfg.iponet.context_dim = 8
    return cfg


H, W = 32, 64  # divisible by downscale*patch_size = 8 and by feat_ratio


def tiny_context(key, b=1, v=2):
    ks = jax.random.split(key, 3)
    images = jax.random.uniform(ks[0], (b, v, 3, H, W))
    extr = jnp.broadcast_to(jnp.eye(4), (b, v, 4, 4))
    # Spread cameras along x.
    offsets = jnp.linspace(0.0, 0.5, v)
    extr = extr.at[:, :, 0, 3].set(offsets[None])
    intr = jnp.broadcast_to(
        jnp.array([[1.0, 0.0, 0.5], [0.0, 1.0, 0.5], [0.0, 0.0, 1.0]]), (b, v, 3, 3)
    )
    near = jnp.full((b, v), 0.5)
    far = jnp.full((b, v), 20.0)
    index = jnp.broadcast_to(jnp.arange(v), (b, v))
    return dict(image=images, extrinsics=extr, intrinsics=intr, near=near, far=far, index=index)


class TestEpipolarSampler:
    def test_heterogeneous_indices(self):
        s, o = epipolar_sampler.generate_heterogeneous_index(4)
        assert s.shape == (4, 3) and o.shape == (4, 3)
        for i in range(4):
            assert i not in o[i]
            assert sorted(o[i]) == sorted(set(range(4)) - {i})

    def test_transpose_roundtrip(self):
        x = jax.random.normal(jax.random.PRNGKey(0), (2, 4, 3, 5))
        once = epipolar_sampler.transpose_other_views(x)
        twice = epipolar_sampler.transpose_other_views(once)
        np.testing.assert_allclose(np.asarray(twice), np.asarray(x))

    def test_sampling_shapes(self):
        ctx = tiny_context(jax.random.PRNGKey(1), v=3)
        feats = jax.random.normal(jax.random.PRNGKey(2), (1, 3, 8, 16, 6))
        out = epipolar_sampler.sample_epipolar(
            feats, ctx["extrinsics"], ctx["intrinsics"], ctx["near"], ctx["far"], 4
        )
        assert out.features.shape == (1, 3, 2, 8 * 16, 4, 6)
        assert out.valid.shape == (1, 3, 2, 8 * 16)


class TestEncoder:
    @pytest.mark.slow
    def test_encoder_produces_gaussians(self):
        from ggrt_official_tpu.models.encoder_epipolar import EncoderEpipolar

        cfg = tiny_cfg()
        ctx = tiny_context(jax.random.PRNGKey(0))
        enc = EncoderEpipolar(cfg.encoder)
        params = enc.init(
            {"params": jax.random.PRNGKey(1)}, ctx, 0, deterministic=True
        )
        g = enc.apply(params, ctx, 0, deterministic=True)
        v, r, srf, spp = 2, H * W, 1, 1  # deterministic -> 1 gaussian/pixel
        n = v * r * srf * spp
        assert g.means.shape == (1, n, 3)
        assert g.covariances.shape == (1, n, 3, 3)
        assert g.harmonics.shape == (1, n, 3, 4)  # sh_degree 1
        assert g.opacities.shape == (1, n)
        assert np.isfinite(np.asarray(g.means)).all()
        # Covariances must be PSD.
        eigs = np.linalg.eigvalsh(np.asarray(g.covariances[0, :50]))
        assert (eigs > -1e-10).all()

    @pytest.mark.slow
    def test_encoder_crop_matches_full(self):
        """Crop mode approximates the corresponding slice of full-image
        Gaussians. Exact equality is impossible (image self-attention sees
        only the crop; conv padding at crop borders; discrete depth-bucket
        top-k flips) — the reference behaves the same way. Deferred BP only
        needs the crop graph to be a good local approximation."""
        from ggrt_official_tpu.models.encoder_epipolar import EncoderEpipolar

        cfg = tiny_cfg()
        ctx = tiny_context(jax.random.PRNGKey(0))
        enc = EncoderEpipolar(cfg.encoder)
        params = enc.init({"params": jax.random.PRNGKey(1)}, ctx, 0, deterministic=True)

        full = enc.apply(params, ctx, 0, deterministic=True)
        feats = enc.apply(params, ctx, 0, just_return_features=True)
        crop = enc.apply(
            params, ctx, 0, features=feats, crop=(0, 1, 2), deterministic=True
        )
        # crop (0,1) of a 2x2 grid: rows 0..H/2, cols W/2..W.
        hc, wc = H // 2, W // 2
        full_means = np.asarray(full.means).reshape(1, 2, H, W, 3)
        crop_means = np.asarray(crop.means).reshape(1, 2, hc, wc, 3)
        assert np.isfinite(crop_means).all()
        diff = np.abs(crop_means - full_means[:, :, :hc, wc:]).reshape(-1, 3)
        # Most gaussians should agree closely; a minority flips depth bucket.
        med = np.median(np.linalg.norm(diff, axis=-1))
        assert med < 0.1, f"median crop-vs-full mean deviation too large: {med}"


class TestIPONet:
    def test_forward_shapes(self):
        from ggrt_official_tpu.models.iponet import IPONet

        cfg = tiny_cfg()
        nv = 3
        tgt = jax.random.uniform(jax.random.PRNGKey(0), (1, 3, H, W))
        refs = jax.random.uniform(jax.random.PRNGKey(1), (nv, 3, H, W))
        K = jnp.array([[[W * 1.0, 0, W / 2], [0, W * 1.0, H / 2], [0, 0, 1]]])
        ref_K = jnp.broadcast_to(K, (nv, 3, 3))
        net = IPONet(cfg.iponet)
        params = net.init(jax.random.PRNGKey(2), tgt, refs, K, ref_K)
        out = net.apply(params, tgt, refs, K, ref_K)
        n_preds = cfg.iponet.iters // cfg.iponet.seq_len + 1
        assert out.inv_depths.shape == (n_preds, 1, 1, H, W)
        assert out.rel_poses.shape == (1, nv, n_preds, 6)
        assert np.isfinite(np.asarray(out.inv_depths)).all()
        assert np.isfinite(np.asarray(out.rel_poses)).all()
        # inverse depths must lie in the (min_depth, max_depth) disparity band
        inv = np.asarray(out.inv_depths)
        assert (inv >= 1.0 / cfg.iponet.max_depth - 1e-5).all()
        assert (inv <= 1.0 / cfg.iponet.min_depth + 1e-5).all()


class TestPixelSplat:
    def test_end_to_end_forward(self):
        from ggrt_official_tpu.models.pixelsplat import PixelSplat

        cfg = tiny_cfg()
        ctx = tiny_context(jax.random.PRNGKey(0), v=3)
        tgt = tiny_context(jax.random.PRNGKey(1), v=1)
        batch = {"context": ctx, "target": tgt}
        model = PixelSplat(cfg.encoder, cfg.decoder)
        params = model.init(
            {"params": jax.random.PRNGKey(2)}, batch, 0, deterministic=True
        )
        ret, gt = model.apply(params, batch, 0, deterministic=True)
        assert ret["rgb"].shape == (1, 1, 3, H, W)
        assert ret["depth"].shape == (1, 1, H, W)
        assert np.isfinite(np.asarray(ret["rgb"])).all()
        assert gt["rgb"].shape == (1, 1, 3, H, W)


class TestLosses:
    def test_photometric_loss_zero_for_identity(self):
        """Identical target/ref + identity pose + any depth -> warp is
        identity, so the non-automask residual is ~0."""
        from ggrt_official_tpu.losses.photometric import photometric_decay_loss

        img = jax.random.uniform(jax.random.PRNGKey(0), (1, 3, 16, 24))
        refs = img  # (1, 3, h, w) as single ref view
        inv_depths = jnp.full((2, 1, 1, 16, 24), 0.5)
        K = jnp.array([[[20.0, 0, 12], [0, 20.0, 8], [0, 0, 1]]])
        poses = jnp.zeros((1, 1, 2, 6))
        out = photometric_decay_loss(
            img, refs, inv_depths, K, K, poses, smooth_weight=0.0
        )
        assert float(out["loss"]) < 1e-4

    def test_photometric_loss_grad(self):
        from ggrt_official_tpu.losses.photometric import photometric_decay_loss

        img = jax.random.uniform(jax.random.PRNGKey(0), (1, 3, 16, 24))
        ref = jax.random.uniform(jax.random.PRNGKey(1), (1, 3, 16, 24))
        K = jnp.array([[[20.0, 0, 12], [0, 20.0, 8], [0, 0, 1]]])

        def f(poses, inv_depths):
            return photometric_decay_loss(img, ref, inv_depths, K, K, poses)["loss"]

        poses = jnp.full((1, 1, 1, 6), 0.01)
        inv_depths = jnp.full((1, 1, 1, 16, 24), 0.5)
        gp, gd = jax.grad(f, argnums=(0, 1))(poses, inv_depths)
        assert np.isfinite(np.asarray(gp)).all() and np.abs(np.asarray(gp)).max() > 0
        assert np.isfinite(np.asarray(gd)).all()
