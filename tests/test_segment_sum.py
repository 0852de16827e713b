"""scatter_add_rows (sorted pallas segment-sum) vs the XLA scatter oracle."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.experimental.pallas import tpu as pltpu

from ggrt_official_tpu.ops.rasterizer.segment_sum import scatter_add_rows


@pytest.fixture(autouse=True)
def interpret_mode():
    with pltpu.force_tpu_interpret_mode():
        yield


def oracle(ids, vals, g):
    c = vals.shape[1]
    return jnp.zeros((g + 1, c)).at[ids].add(vals, mode="drop")[:g]


def run_case(seed, n, g, c, dump_frac=0.3):
    key = jax.random.PRNGKey(seed)
    k1, k2, k3 = jax.random.split(key, 3)
    ids = jax.random.randint(k1, (n,), 0, g).astype(jnp.int32)
    dump = jax.random.uniform(k2, (n,)) < dump_frac
    ids = jnp.where(dump, g, ids)
    vals = jax.random.normal(k3, (n, c), jnp.float32)
    got = scatter_add_rows(ids, vals, jnp.zeros((g, c), jnp.float32))
    want = oracle(ids, vals, g)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=1e-5, rtol=1e-5)


class TestScatterAddRows:
    def test_small(self):
        run_case(0, n=500, g=300, c=9)

    def test_block_boundaries(self):
        # g spans multiple output blocks; ids concentrated near boundaries.
        g = 5000
        ids = jnp.concatenate([
            jnp.full((64,), 2047, jnp.int32),
            jnp.full((64,), 2048, jnp.int32),
            jnp.full((64,), 4095, jnp.int32),
            jnp.full((64,), g, jnp.int32),       # dump
            jnp.zeros((64,), jnp.int32),
        ])
        vals = jnp.ones((ids.shape[0], 3), jnp.float32)
        got = scatter_add_rows(ids, vals, jnp.zeros((g, 3), jnp.float32))
        want = oracle(ids, vals, g)
        np.testing.assert_allclose(np.asarray(got), np.asarray(want))

    def test_empty_live(self):
        g = 100
        ids = jnp.full((256,), g, jnp.int32)     # everything dumped
        vals = jnp.ones((256, 4), jnp.float32)
        got = scatter_add_rows(ids, vals, jnp.zeros((g, 4), jnp.float32))
        assert float(jnp.abs(got).max()) == 0.0

    def test_max_dup_like_population(self):
        # Bench-shaped: each id appears at most 8 times (dup-window bound).
        g = 4000
        key = jax.random.PRNGKey(7)
        base = jax.random.permutation(key, g)[:1000]
        ids = jnp.repeat(base, 8).astype(jnp.int32)
        vals = jax.random.normal(jax.random.PRNGKey(8), (ids.shape[0], 9))
        got = scatter_add_rows(ids, vals, jnp.zeros((g, 9), jnp.float32))
        want = oracle(ids, vals, g)
        np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=1e-5, rtol=1e-5)

    def test_wide_values_fall_back(self):
        # c > _LANES exceeds the kernel's sublane group: must take the XLA
        # scatter fallback (same semantics), not crash (VERDICT r3 #2).
        run_case(5, n=400, g=200, c=24)

    def test_vmap(self):
        g, n, c = 300, 400, 5
        k = jax.random.PRNGKey(3)
        ids = jax.random.randint(k, (2, n), 0, g + 1).astype(jnp.int32)
        vals = jax.random.normal(jax.random.PRNGKey(4), (2, n, c), jnp.float32)
        got = jax.vmap(scatter_add_rows)(ids, vals, jnp.zeros((2, g, c)))
        for b in range(2):
            want = oracle(ids[b], vals[b], g)
            np.testing.assert_allclose(
                np.asarray(got[b]), np.asarray(want), atol=1e-5, rtol=1e-5
            )

    def test_grad_path_through_render(self):
        """End-to-end: pallas render grads (which route through the new
        scatter) still match the tiled backend."""
        from tests.test_rasterizer import SHAPE, make_scene
        from ggrt_official_tpu.ops.rasterizer import api

        scene = make_scene(jax.random.PRNGKey(5), n=60)

        def loss(backend, means):
            img = api.render(
                scene["extrinsics"], scene["intrinsics"], scene["near"],
                scene["far"], SHAPE, scene["background"], means,
                scene["covariances"], scene["sh_coeffs"], scene["opacities"],
                backend=backend, max_per_tile=64,
            )
            return jnp.sum(img * img)

        g_tiled = jax.grad(lambda m: loss("tiled", m))(scene["means"])
        g_pallas = jax.grad(lambda m: loss("pallas", m))(scene["means"])
        np.testing.assert_allclose(
            np.asarray(g_pallas), np.asarray(g_tiled), atol=2e-4, rtol=1e-3
        )


class TestBankedGatherKernel:
    """banked_gather kernel path vs the XLA gather path (interpret mode):
    identical lists on a truncating population."""

    def test_kernel_matches_xla_path(self):
        from ggrt_official_tpu.ops.rasterizer import tiling
        from ggrt_official_tpu.ops.rasterizer.projection import project_gaussians

        key = jax.random.PRNGKey(11)
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
            # interpret fixture active -> _pallas_available() True -> kernel
            a = jax.jit(
                lambda pg: tiling.bin_gaussians_banked(pg, shape, 8, k, merge="auto")
            )(pg)
            # force the XLA path
            b = jax.jit(
                lambda pg: tiling.bin_gaussians_banked(pg, shape, 8, k, merge="sort")
            )(pg)
            assert bool(jnp.all(a.counts == b.counts)), k
            assert bool(jnp.all(a.gaussian_ids == b.gaussian_ids)), k

    def test_kernel_matches_xla_path_ntx1(self):
        """ntx == 1 -> win_x = 1, win_y = max_dup: the tall-window regime
        whose win_pack (up to 1 | max_dup<<2 = 33) overflowed the old 5-bit
        payload packing and silently dropped whole dup rows (ADVICE r3).
        The flagship's 64x96 images live here."""
        from ggrt_official_tpu.ops.rasterizer import tiling
        from ggrt_official_tpu.ops.rasterizer.projection import project_gaussians

        key = jax.random.PRNGKey(23)
        ks = jax.random.split(key, 6)
        n = 6000
        z = jax.random.uniform(ks[2], (n,), minval=1.2, maxval=6.0)
        means = jnp.stack(
            [
                jax.random.uniform(ks[0], (n,), minval=-0.6, maxval=0.6) * z,
                jax.random.uniform(ks[1], (n,), minval=-0.6, maxval=0.6) * z,
                z,
            ],
            -1,
        )
        # Large scales so windows span many tile ROWS (deep dy offsets).
        scales = jax.random.uniform(ks[3], (n, 3), minval=0.05, maxval=0.25)
        cov = jnp.eye(3)[None] * scales[..., None] ** 2
        sh = jax.random.normal(ks[4], (n, 3, 4)) * 0.3
        opa = jax.random.uniform(ks[5], (n,), minval=0.1, maxval=0.9)
        intr = jnp.array([[1.0, 0.0, 0.5], [0.0, 1.0, 0.5], [0.0, 0.0, 1.0]])
        shape = (64, 96)  # ntx = 1, nty = 8
        pg = project_gaussians(
            means, cov, sh, opa, jnp.eye(4), intr,
            jnp.float32(1.0), jnp.float32(25.0), shape,
        )
        for k in (64, 256):
            a = jax.jit(
                lambda pg: tiling.bin_gaussians_banked(pg, shape, 8, k, merge="auto")
            )(pg)
            b = jax.jit(
                lambda pg: tiling.bin_gaussians_banked(pg, shape, 8, k, merge="sort")
            )(pg)
            assert bool(jnp.all(a.counts == b.counts)), k
            assert bool(jnp.all(a.gaussian_ids == b.gaussian_ids)), k
        # Sanity: deep rows actually appeared (the regression regime).
        assert int(jnp.max(a.counts)) > 0
