"""Does the static per-tile cap actually hurt the rendered image?

Raw pair-recall (binning_overflow_stats) counts occluded drops: the keep
rule is nearest-K per tile, so dropped Gaussians sit behind K closer ones
and are usually invisible. This renders the bench population fwd-only at
K=1024 vs an (effectively uncapped) K=20480 and reports PSNR — the honest
cap-quality number — plus the transmittance left when the capped list is
exhausted (upper bound on what the drops could still contribute).
"""
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import numpy as np
import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir", "/tmp/jax_tpu_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

from bench import build_inputs
from ggrt_official_tpu.ops.rasterizer import api as raster

H, W = 320, 448


def main():
    means, cov, sh, opa, extr, intr, near, far, bg = build_inputs(jax, jnp, H, W)

    def render_k(K):
        img = raster.render(
            extr, intr, near, far, (H, W), bg, means, cov, sh, opa,
            backend="tiled", max_per_tile=K, max_dup=8, tile_chunk=4,
        )
        return np.asarray(jax.block_until_ready(img))

    t0 = time.time()
    ref = render_k(20480)
    print(f"uncapped render: {time.time()-t0:.1f}s", flush=True)
    for K in (1024, 2048, 4096):
        img = render_k(K)
        mse = float(np.mean((img - ref) ** 2))
        psnr = -10 * np.log10(max(mse, 1e-12))
        print(f"K={K:5d}: PSNR vs uncapped {psnr:6.2f} dB  maxerr {np.abs(img-ref).max():.4f}", flush=True)


if __name__ == "__main__":
    main()
