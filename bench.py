"""Benchmark harness — prints ONE JSON line with the headline metric.

Headline: rasterizer fwd+bwd throughput in pixels/s/chip at the reference
eval resolution (LLFF 320x448, SURVEY.md §6) with a realistic per-pixel
Gaussian population (2 context pairs x 3 gaussians/pixel, the pretrain
config's geometry). vs_baseline compares against the real-time bar implied
by the reference's title claim (30 fps at 320x448 = 4.3 MP/s fwd; we
measure fwd+bwd which the reference never achieves in real time).
"""
from __future__ import annotations

import json
import time

import numpy as np


def main():
    import jax
    import jax.numpy as jnp

    from ggrt_official_tpu.ops.rasterizer import api as raster

    H, W = 320, 448
    pairs = 2
    gpp = 3
    n_gauss = H * W * gpp * pairs  # per-pair context views contribute h*w*gpp each

    key = jax.random.PRNGKey(0)
    ks = jax.random.split(key, 8)
    g = n_gauss
    means = jnp.stack(
        [
            jax.random.uniform(ks[0], (1, g), minval=-2.0, maxval=2.0),
            jax.random.uniform(ks[1], (1, g), minval=-1.5, maxval=1.5),
            jax.random.uniform(ks[2], (1, g), minval=1.2, maxval=8.0),
        ],
        axis=-1,
    )
    # Small anisotropic covariances (pixel-scale splats, like the adapter emits).
    scales = jax.random.uniform(ks[3], (1, g, 3), minval=0.002, maxval=0.02)
    cov = jnp.eye(3)[None, None] * (scales[..., None] ** 2)
    d_sh = 25  # sh_degree 4
    sh = jax.random.normal(ks[4], (1, g, 3, d_sh)) * 0.2
    opa = jax.random.uniform(ks[5], (1, g), minval=0.05, maxval=0.9)

    extr = jnp.eye(4)[None]
    intr = jnp.array([[[1.2, 0.0, 0.5], [0.0, 1.2, 0.5], [0.0, 0.0, 1.0]]])
    near = jnp.full((1,), 1.0)
    far = jnp.full((1,), 20.0)
    bg = jnp.zeros((1, 3))

    backend = "pallas"

    def loss(means, cov, sh, opa, extr):
        img = raster.render(
            extr, intr, near, far, (H, W), bg, means, cov, sh, opa,
            backend=backend, max_per_tile=1024, max_dup=8, tile_chunk=16,
        )
        return jnp.mean(img**2)

    # Consume the grads into one scalar inside the jit: in real training the
    # gradient pytree feeds the optimizer on-device; returning it would add
    # a large host fetch through the axon tunnel to every timing iteration.
    def step_impl(*a):
        grads = jax.grad(loss, argnums=(0, 1, 2, 3, 4))(*a)
        return sum(jnp.sum(gr) for gr in grads)

    step = jax.jit(step_impl)

    # Warm-up/compile.
    out = step(means, cov, sh, opa, extr)
    jax.block_until_ready(out)

    iters = 10
    t0 = time.perf_counter()
    for _ in range(iters):
        out = step(means, cov, sh, opa, extr)
    jax.block_until_ready(out)
    dt = (time.perf_counter() - t0) / iters

    pixels_per_s = H * W / dt
    baseline = 30.0 * H * W  # 30 fps forward-only "real-time" bar
    print(
        json.dumps(
            {
                "metric": "rasterize_fwd_bwd_pixels_per_s_per_chip",
                "value": round(pixels_per_s, 1),
                "unit": "pixels/s",
                "vs_baseline": round(pixels_per_s / baseline, 3),
                "detail": {
                    "resolution": [H, W],
                    "n_gaussians": int(g),
                    "backend": backend,
                    "step_ms": round(dt * 1e3, 2),
                    "device": str(jax.devices()[0]),
                },
            }
        )
    )


if __name__ == "__main__":
    main()
