"""Rasterizer tests: tiled/pallas backends vs the O(P*G) reference oracle."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from ggrt_official_tpu.geometry import se3
from ggrt_official_tpu.ops.rasterizer import api
from ggrt_official_tpu.ops.rasterizer import projection as rproj


def make_scene(key, n=200, batch=1, d_sh=4, spread=1.5):
    """Random Gaussians in front of a camera at the origin looking +z."""
    ks = jax.random.split(key, 6)
    means = jnp.stack(
        [
            jax.random.uniform(ks[0], (batch, n), minval=-spread, maxval=spread),
            jax.random.uniform(ks[1], (batch, n), minval=-spread, maxval=spread),
            jax.random.uniform(ks[2], (batch, n), minval=2.0, maxval=8.0),
        ],
        axis=-1,
    )
    scales = jax.random.uniform(ks[3], (batch, n, 3), minval=0.02, maxval=0.15)
    quats = jax.random.normal(ks[4], (batch, n, 4))
    quats = quats / jnp.linalg.norm(quats, axis=-1, keepdims=True)
    # R S S^T R^T
    i, j, k, r = quats[..., 0], quats[..., 1], quats[..., 2], quats[..., 3]
    two = 2.0
    R = jnp.stack(
        [
            1 - two * (j * j + k * k), two * (i * j - k * r), two * (i * k + j * r),
            two * (i * j + k * r), 1 - two * (i * i + k * k), two * (j * k - i * r),
            two * (i * k - j * r), two * (j * k + i * r), 1 - two * (i * i + j * j),
        ],
        axis=-1,
    ).reshape(batch, n, 3, 3)
    S = scales[..., None] * jnp.eye(3)
    cov = R @ S @ jnp.swapaxes(S, -1, -2) @ jnp.swapaxes(R, -1, -2)
    sh = jax.random.normal(ks[5], (batch, n, 3, d_sh)) * 0.3
    opa = jax.random.uniform(key, (batch, n), minval=0.2, maxval=0.95)

    extr = jnp.broadcast_to(jnp.eye(4), (batch, 4, 4))
    intr = jnp.broadcast_to(
        jnp.array([[1.2, 0.0, 0.5], [0.0, 1.2, 0.5], [0.0, 0.0, 1.0]]), (batch, 3, 3)
    )
    near = jnp.full((batch,), 1.0)
    far = jnp.full((batch,), 20.0)
    bg = jnp.zeros((batch, 3))
    return dict(
        extrinsics=extr, intrinsics=intr, near=near, far=far, background=bg,
        means=means, covariances=cov, sh_coeffs=sh, opacities=opa,
    )


SHAPE = (24, 32)


def render_with(scene, backend, **kw):
    return api.render(
        scene["extrinsics"], scene["intrinsics"], scene["near"], scene["far"],
        SHAPE, scene["background"], scene["means"], scene["covariances"],
        scene["sh_coeffs"], scene["opacities"], backend=backend, **kw,
    )


class TestForwardParity:
    def test_tiled_matches_reference(self):
        scene = make_scene(jax.random.PRNGKey(0))
        ref = render_with(scene, "reference")
        tiled = render_with(scene, "tiled", max_per_tile=256)
        assert ref.shape == (1, 3, *SHAPE)
        np.testing.assert_allclose(np.asarray(tiled), np.asarray(ref), atol=1e-5, rtol=1e-4)

    def test_nonzero_and_background(self):
        scene = make_scene(jax.random.PRNGKey(1), n=20)
        scene["background"] = jnp.full((1, 3), 0.7)
        img = render_with(scene, "tiled", max_per_tile=64)
        img = np.asarray(img)
        assert img.std() > 1e-3  # gaussians rendered
        # Corner pixels far from all gaussians should be ~background.
        assert abs(img[0, 0, 0, 0] - 0.7) < 0.3

    def test_occlusion_order(self):
        # An opaque red gaussian at z=2 must occlude a green one at z=4.
        base = make_scene(jax.random.PRNGKey(2), n=2)
        means = jnp.array([[[0.0, 0.0, 2.0], [0.0, 0.0, 4.0]]])
        cov = jnp.broadcast_to(jnp.eye(3) * 0.04, (1, 2, 3, 3))
        # SH DC for pure colors: color = C0*sh + 0.5 -> sh = (c - 0.5)/C0
        c0 = 0.28209479177387814
        sh = jnp.array(
            [[[[ (1.0 - 0.5) / c0], [(0.0 - 0.5) / c0], [(0.0 - 0.5) / c0]],
              [[ (0.0 - 0.5) / c0], [(1.0 - 0.5) / c0], [(0.0 - 0.5) / c0]]]]
        )
        opa = jnp.array([[0.99, 0.99]])
        for backend in ("reference", "tiled"):
            img = api.render(
                base["extrinsics"], base["intrinsics"], base["near"], base["far"],
                SHAPE, base["background"], means, cov, sh, opa, backend=backend,
            )
            center = np.asarray(img[0, :, SHAPE[0] // 2, SHAPE[1] // 2])
            assert center[0] > 0.8, f"{backend}: red not dominant: {center}"
            assert center[1] < 0.2, f"{backend}: green leaked: {center}"

    def test_tile_cap_behavior(self):
        # Cap >= occupancy: exact parity. Cap < occupancy: drops the
        # *farthest* (most-occluded) gaussians tile-globally — mean error
        # stays small and output stays finite, but individual pixels whose
        # only cover was far gaussians may differ (fundamental static-cap
        # recall tradeoff, SURVEY.md §7.3 #1).
        scene = make_scene(jax.random.PRNGKey(3), n=300)
        scene["opacities"] = jnp.clip(scene["opacities"] + 0.5, 0, 0.99)
        ref = render_with(scene, "reference")
        exact = render_with(scene, "tiled", max_per_tile=512)
        np.testing.assert_allclose(np.asarray(exact), np.asarray(ref), atol=1e-5, rtol=1e-4)

        truncated = render_with(scene, "tiled", max_per_tile=128)
        assert np.isfinite(np.asarray(truncated)).all()
        mean_err = np.abs(np.asarray(truncated) - np.asarray(ref)).mean()
        assert mean_err < 0.03, f"cap-truncation mean error too large: {mean_err}"


class TestGradients:
    def test_grads_match_reference(self):
        scene = make_scene(jax.random.PRNGKey(4), n=60)
        target = render_with(scene, "reference") * 0.0 + 0.3

        def loss_fn(backend):
            def f(means, cov, sh, opa, extr):
                img = api.render(
                    extr, scene["intrinsics"], scene["near"], scene["far"],
                    SHAPE, scene["background"], means, cov, sh, opa,
                    backend=backend, max_per_tile=128,
                )
                return jnp.mean((img - target) ** 2)
            return f

        args = (
            scene["means"], scene["covariances"], scene["sh_coeffs"],
            scene["opacities"], scene["extrinsics"],
        )
        g_ref = jax.grad(loss_fn("reference"), argnums=(0, 1, 2, 3, 4))(*args)
        g_tiled = jax.grad(loss_fn("tiled"), argnums=(0, 1, 2, 3, 4))(*args)
        names = ["means", "cov", "sh", "opacity", "extrinsics"]
        for name, a, b in zip(names, g_ref, g_tiled):
            a, b = np.asarray(a), np.asarray(b)
            assert np.isfinite(a).all() and np.isfinite(b).all(), name
            scale = np.abs(a).max() + 1e-8
            np.testing.assert_allclose(b / scale, a / scale, atol=2e-4, err_msg=name)

    def test_pose_gradient_nonzero(self):
        scene = make_scene(jax.random.PRNGKey(5), n=40)

        def f(pose_vec):
            extr = (se3.se3_exp(pose_vec)[None] @ scene["extrinsics"])
            img = api.render(
                extr, scene["intrinsics"], scene["near"], scene["far"],
                SHAPE, scene["background"], scene["means"], scene["covariances"],
                scene["sh_coeffs"], scene["opacities"], backend="tiled", max_per_tile=128,
            )
            return jnp.mean(img**2)

        g = jax.grad(f)(jnp.zeros(6))
        assert np.isfinite(np.asarray(g)).all()
        assert np.abs(np.asarray(g)).max() > 1e-6

    @pytest.mark.parametrize("backend", ["tiled", "pallas"])
    def test_degenerate_pose_grads_finite(self, backend):
        # Joint training injects PREDICTED poses before the pose net
        # converges; a garbage pose must produce zero-ish gradients, never
        # NaN (observed: cov2d overflow -> det = inf - inf poisoning a whole
        # training step). Giant translation + near-zero depths + huge
        # covariances exercise the projection/record clamps.
        from jax.experimental.pallas import tpu as pltpu

        scene = make_scene(jax.random.PRNGKey(8), n=40)
        # Keep the gaussians in front of the camera (a culled scene never
        # reaches the record math) but blow the covariance up to where
        # cov2d entries exceed sqrt(f32 max): without the projection clamps
        # det = a*c - b*b = inf - inf = NaN.
        cov = scene["covariances"] * 1e22
        extr = scene["extrinsics"]

        def f(means, cov, sh, opa, extr):
            img = api.render(
                extr, scene["intrinsics"], scene["near"], scene["far"],
                SHAPE, scene["background"], means, cov, sh, opa,
                backend=backend, max_per_tile=128,
            )
            return jnp.mean(img**2)

        import contextlib

        ctx = (
            pltpu.force_tpu_interpret_mode()
            if backend == "pallas"
            else contextlib.nullcontext()
        )
        with ctx:
            grads = jax.grad(f, argnums=(0, 1, 2, 3, 4))(
                scene["means"], cov, scene["sh_coeffs"], scene["opacities"], extr
            )
        for name, g in zip(["means", "cov", "sh", "opa", "extr"], grads):
            assert np.isfinite(np.asarray(g)).all(), name


class TestDepthRendering:
    def test_depth_of_single_gaussian(self):
        base = make_scene(jax.random.PRNGKey(6), n=1)
        means = jnp.array([[[0.0, 0.0, 3.0]]])
        cov = jnp.broadcast_to(jnp.eye(3) * 0.05, (1, 1, 3, 3))
        opa = jnp.array([[0.99]])
        d = api.render_depth(
            base["extrinsics"], base["intrinsics"], base["near"], base["far"],
            SHAPE, means, cov, opa, backend="tiled", max_per_tile=32,
        )
        center = float(d[0, SHAPE[0] // 2, SHAPE[1] // 2])
        # Center depth ~ 3 * alpha-coverage (single splat, black background).
        assert 2.0 < center < 3.1, center


class TestCountingBinning:
    def test_matches_sort_binning(self):
        import jax.numpy as jnp

        from ggrt_official_tpu.ops.rasterizer import tiling
        from ggrt_official_tpu.ops.rasterizer.projection import project_gaussians

        scene = make_scene(jax.random.PRNGKey(7), n=400)
        pg = project_gaussians(
            scene["means"][0], scene["covariances"][0], scene["sh_coeffs"][0],
            scene["opacities"][0], scene["extrinsics"][0], scene["intrinsics"][0],
            scene["near"][0], scene["far"][0], SHAPE,
        )
        a = tiling.bin_gaussians(pg, SHAPE, max_dup=8, max_per_tile=128)
        b = tiling.bin_gaussians_counting(pg, SHAPE, max_dup=8, max_per_tile=128)
        np.testing.assert_array_equal(np.asarray(a.counts), np.asarray(b.counts))
        np.testing.assert_array_equal(
            np.asarray(a.gaussian_ids), np.asarray(b.gaussian_ids)
        )

    def test_render_with_counting(self):
        scene = make_scene(jax.random.PRNGKey(8), n=150)
        ref = render_with(scene, "tiled", max_per_tile=256, binning_mode="sort")
        got = render_with(scene, "tiled", max_per_tile=256, binning_mode="counting")
        np.testing.assert_allclose(np.asarray(got), np.asarray(ref), atol=1e-6)


class TestOverflowStats:
    def test_recall_reporting(self):
        from ggrt_official_tpu.ops.rasterizer.projection import project_gaussians
        from ggrt_official_tpu.ops.rasterizer.tiling import binning_overflow_stats

        scene = make_scene(jax.random.PRNGKey(5), n=200)
        pg = project_gaussians(
            scene["means"][0], scene["covariances"][0], scene["sh_coeffs"][0],
            scene["opacities"][0], scene["extrinsics"][0], scene["intrinsics"][0],
            scene["near"][0], scene["far"][0], SHAPE,
        )
        generous = binning_overflow_stats(pg, SHAPE, max_dup=64, max_per_tile=4096)
        assert float(generous["recall"]) == 1.0
        tight = binning_overflow_stats(pg, SHAPE, max_dup=1, max_per_tile=8)
        assert float(tight["recall"]) < 1.0
        assert float(tight["dropped_by_max_dup"]) > 0
        total = float(tight["pairs_wanted"])
        kept = total - float(tight["dropped_by_max_dup"]) - float(tight["dropped_by_max_per_tile"])
        assert abs(kept / total - float(tight["recall"])) < 1e-6


class TestCapPolicy:
    """Demand-driven per-tile capacity (VERDICT r2 #4): the recommended K
    must hold render quality >= 45 dB vs effectively-uncapped across
    populations with different depth complexity — not just the bench scene."""

    def _population(self, kind, key, n=3000):
        ks = jax.random.split(key, 6)
        if kind == "shallow":
            z = jax.random.uniform(ks[2], (1, n), minval=2.8, maxval=3.2)
            opa_rng = (0.3, 0.9)
        elif kind == "deep":
            # driving-scene-like: long depth column stacked onto few tiles
            z = jax.random.uniform(ks[2], (1, n), minval=1.2, maxval=18.0)
            opa_rng = (0.2, 0.9)
        else:  # "faint": tiny opacities -> long transmittance horizon
            z = jax.random.uniform(ks[2], (1, n), minval=1.5, maxval=8.0)
            opa_rng = (0.02, 0.12)
        means = jnp.stack(
            [
                jax.random.uniform(ks[0], (1, n), minval=-0.6, maxval=0.6) * z,
                jax.random.uniform(ks[1], (1, n), minval=-0.4, maxval=0.4) * z,
                z,
            ],
            axis=-1,
        )
        scales = jax.random.uniform(ks[3], (1, n, 3), minval=0.01, maxval=0.06)
        cov = jnp.eye(3)[None, None] * scales[..., None] ** 2
        sh = jax.random.normal(ks[4], (1, n, 3, 4)) * 0.3
        opa = jax.random.uniform(ks[5], (1, n), minval=opa_rng[0], maxval=opa_rng[1])
        extr = jnp.eye(4)[None]
        intr = jnp.array([[[1.0, 0.0, 0.5], [0.0, 1.0, 0.5], [0.0, 0.0, 1.0]]])
        return dict(
            extrinsics=extr, intrinsics=intr, near=jnp.full((1,), 1.0),
            far=jnp.full((1,), 25.0), background=jnp.zeros((1, 3)),
            means=means, covariances=cov, sh_coeffs=sh, opacities=opa,
        )

    @pytest.mark.parametrize("kind", ["shallow", "deep", "faint"])
    def test_recommended_cap_holds_45db(self, kind):
        from ggrt_official_tpu.ops.rasterizer.projection import project_gaussians
        from ggrt_official_tpu.ops.rasterizer.tiling import recommend_max_per_tile

        shape = (32, 128)  # one tile column: concentrates per-tile demand
        scene = self._population(kind, jax.random.PRNGKey(7))
        pg = project_gaussians(
            scene["means"][0], scene["covariances"][0], scene["sh_coeffs"][0],
            scene["opacities"][0], scene["extrinsics"][0], scene["intrinsics"][0],
            scene["near"][0], scene["far"][0], shape,
        )
        rec = recommend_max_per_tile(pg, shape, max_dup=8)
        assert rec["max_per_tile"] >= 256
        assert not rec["clipped"]
        uncapped_k = max(
            2 << (int(rec["max_tile_demand"]) - 1).bit_length(), rec["max_per_tile"]
        )

        def rend(k):
            return api.render(
                scene["extrinsics"], scene["intrinsics"], scene["near"],
                scene["far"], shape, scene["background"], scene["means"],
                scene["covariances"], scene["sh_coeffs"], scene["opacities"],
                backend="tiled", max_dup=8, max_per_tile=int(k),
            )

        img_rec = rend(rec["max_per_tile"])
        img_full = rend(uncapped_k)
        mse = float(jnp.mean((img_rec - img_full) ** 2))
        psnr = 10.0 * np.log10(1.0 / max(mse, 1e-12))
        assert psnr >= 45.0, (kind, rec, psnr)

    @pytest.mark.parametrize("kind", ["shallow", "deep"])
    def test_quality_aware_chooser(self, kind):
        """choose_max_per_tile (VERDICT r3 weak #3): the chosen K must (a)
        actually meet the dB target it reports, verified by an independent
        render at that static K, and (b) never exceed the demand policy."""
        from ggrt_official_tpu.ops.rasterizer.api import choose_max_per_tile

        shape = (32, 128)
        scene = self._population(kind, jax.random.PRNGKey(11))
        pol = choose_max_per_tile(
            scene["extrinsics"], scene["intrinsics"], scene["near"],
            scene["far"], shape, scene["background"], scene["means"],
            scene["covariances"], scene["sh_coeffs"], scene["opacities"],
            target_db=45.0, max_dup=8, floor=64,
        )
        assert pol["max_per_tile"] <= pol["k_ref"]
        assert not pol["clipped"], pol

        def rend(k):
            return api.render(
                scene["extrinsics"], scene["intrinsics"], scene["near"],
                scene["far"], shape, scene["background"], scene["means"],
                scene["covariances"], scene["sh_coeffs"], scene["opacities"],
                backend="tiled", max_dup=8, max_per_tile=int(k),
            )

        img_k = rend(pol["max_per_tile"])
        img_ref = rend(pol["k_ref"])
        mse = float(jnp.mean((img_k - img_ref) ** 2))
        psnr = 10.0 * np.log10(1.0 / max(mse, 1e-12))
        assert psnr >= 45.0, (kind, pol, psnr)


class TestBankedBinning:
    """bin_gaussians_banked == bin_gaussians whenever nothing truncates:
    small-extent population (windows coincide with the adaptive ones) and a
    K large enough that no stream hits its budget. Render-quality at
    truncating K is covered on-device (BENCH_NOTES round 3: 48.9 dB vs
    uncapped at the bench population)."""

    def test_matches_sort_binning_untruncated(self):
        from ggrt_official_tpu.ops.rasterizer import tiling
        from ggrt_official_tpu.ops.rasterizer.projection import project_gaussians

        key = jax.random.PRNGKey(0)
        ks = jax.random.split(key, 6)
        n = 4000
        z = jax.random.uniform(ks[2], (n,), minval=1.5, maxval=8.0)
        means = jnp.stack(
            [
                jax.random.uniform(ks[0], (n,), minval=-0.5, maxval=0.5) * z,
                jax.random.uniform(ks[1], (n,), minval=-0.35, maxval=0.35) * z,
                z,
            ],
            -1,
        )
        scales = jax.random.uniform(ks[3], (n, 3), minval=0.005, maxval=0.02)
        cov = jnp.eye(3)[None] * scales[..., None] ** 2
        sh = jax.random.normal(ks[4], (n, 3, 4)) * 0.3
        opa = jax.random.uniform(ks[5], (n,), minval=0.1, maxval=0.9)
        intr = jnp.array([[1.0, 0.0, 0.5], [0.0, 1.0, 0.5], [0.0, 0.0, 1.0]])
        shape = (64, 256)
        pg = project_gaussians(
            means, cov, sh, opa, jnp.eye(4), intr,
            jnp.float32(1.0), jnp.float32(25.0), shape,
        )
        # K large enough that even the K//8-budget side streams cover
        # their raw segment lengths (max group ~500 on this scene).
        a = jax.jit(lambda pg: tiling.bin_gaussians(pg, shape, 8, 8192))(pg)
        b = jax.jit(lambda pg: tiling.bin_gaussians_banked(pg, shape, 8, 8192))(pg)
        assert bool(jnp.all(a.counts == b.counts))
        assert bool(jnp.all(a.gaussian_ids == b.gaussian_ids))


class TestBankedFlatMerge:
    """The flat packed-key merge sort must be bit-identical to the
    per-tile 2-key lax.sort merge on a TRUNCATING population (budgets and
    K exceeded) — per-tile (q, gid) order is strict, so any deviation is
    a packing bug."""

    def test_flat_equals_sort_merge(self):
        from ggrt_official_tpu.ops.rasterizer import tiling
        from ggrt_official_tpu.ops.rasterizer.projection import project_gaussians

        key = jax.random.PRNGKey(7)
        ks = jax.random.split(key, 6)
        n = 20000
        z = jax.random.uniform(ks[2], (n,), minval=1.2, maxval=6.0)
        means = jnp.stack(
            [
                jax.random.uniform(ks[0], (n,), minval=-0.6, maxval=0.6) * z,
                jax.random.uniform(ks[1], (n,), minval=-0.4, maxval=0.4) * z,
                z,
            ],
            -1,
        )
        scales = jax.random.uniform(ks[3], (n, 3), minval=0.01, maxval=0.06)
        cov = jnp.eye(3)[None] * scales[..., None] ** 2
        sh = jax.random.normal(ks[4], (n, 3, 4)) * 0.3
        opa = jax.random.uniform(ks[5], (n,), minval=0.1, maxval=0.9)
        intr = jnp.array([[1.0, 0.0, 0.5], [0.0, 1.0, 0.5], [0.0, 0.0, 1.0]])
        shape = (64, 256)
        pg = project_gaussians(
            means, cov, sh, opa, jnp.eye(4), intr,
            jnp.float32(1.0), jnp.float32(25.0), shape,
        )
        for k in (64, 256):
            a = jax.jit(
                lambda pg: tiling.bin_gaussians_banked(pg, shape, 8, k, merge="sort")
            )(pg)
            b = jax.jit(
                lambda pg: tiling.bin_gaussians_banked(pg, shape, 8, k, merge="flat")
            )(pg)
            assert bool(jnp.all(a.counts == b.counts)), k
            assert bool(jnp.all(a.gaussian_ids == b.gaussian_ids)), k
