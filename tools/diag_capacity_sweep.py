"""Sweep max_per_tile capacity: step time vs binning recall on the bench
population (VERDICT weak#9 / SURVEY §7.3 #1 — cap + spill strategy).

With depth-sorted per-tile lists and the compositor's early termination,
raising K should cost far less than linearly: saturated tiles exit after
a few chunks regardless of capacity.
"""
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir", "/tmp/jax_tpu_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

from bench import build_inputs
from ggrt_official_tpu.ops.rasterizer import api as raster
from ggrt_official_tpu.ops.rasterizer.projection import project_gaussians
from ggrt_official_tpu.ops.rasterizer.tiling import binning_overflow_stats

H, W = 320, 448


def main():
    means, cov, sh, opa, extr, intr, near, far, bg = build_inputs(jax, jnp, H, W)
    g = means.shape[1]
    pg = project_gaussians(
        means[0], cov[0], sh[0], opa[0], extr[0], intr[0], near[0], far[0], (H, W)
    )

    for K in (1024, 2048, 4096, 8192):
        kw = dict(max_per_tile=K, max_dup=8, tile_chunk=16)

        def loss(means, cov, sh, opa, extr):
            img = raster.render(
                extr, intr, near, far, (H, W), bg, means, cov, sh, opa,
                backend="pallas", **kw,
            )
            return jnp.mean(img**2)

        def step_impl(*a):
            grads = jax.grad(loss, argnums=(0, 1, 2, 3, 4))(*a)
            return sum(jnp.sum(gr) for gr in grads)

        step = jax.jit(step_impl)
        out = step(means, cov, sh, opa, extr)
        jax.block_until_ready(out)
        iters = 5
        t0 = time.perf_counter()
        for _ in range(iters):
            out = step(means, cov, sh, opa, extr)
        jax.block_until_ready(out)
        dt = (time.perf_counter() - t0) / iters

        ov = jax.jit(
            lambda pg: binning_overflow_stats(
                pg, (H, W), max_dup=8, max_per_tile=K
            )
        )(pg)
        print(
            f"K={K:5d}  step {dt*1e3:7.2f} ms  recall {float(ov['recall']):.3f}",
            flush=True,
        )


if __name__ == "__main__":
    main()
