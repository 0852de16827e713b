"""On-device A/B of rasterizer screen-tile shapes (round 4, VERDICT r3 #4).

The compositor evaluates every binned (gaussian, tile) pair against ALL
P = tile_h*tile_w pixels of its tile. At Waymo scale the executed-chunk
math dominates the 822 ms r3 step, and P=1024 (8x128) does 4x the
per-pair pixel work of the CUDA kernel's 256-px tiles. Pixels live on
sublanes, so the tile shape is free (see pallas_composite._basis).

For each (scale, tile_shape, binning) cell: full render fwd+bwd step time
with grads to all 5 args, K scaled with tile area (the per-tile demand
scales with it), plus overflow recall at that K. Writes
DIAG_TILE_SHAPE.json (not a round artifact; feeds the bench default).

Usage: python tools/diag_tile_shape.py [--skip waymo] [--iters 4]
"""
from __future__ import annotations

import argparse
import json
import sys
import time
import traceback
from pathlib import Path

ROOT = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(ROOT))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--skip", nargs="*", default=[])
    ap.add_argument("--iters", type=int, default=4)
    ap.add_argument("--shapes", nargs="*", default=None,
                    help='tile shapes as "8x128 8x64 8x32"')
    ap.add_argument("--binnings", nargs="*", default=["banked", "sort"])
    ap.add_argument("--out", default=str(ROOT / "DIAG_TILE_SHAPE.json"))
    args = ap.parse_args()

    import jax

    jax.config.update("jax_compilation_cache_dir", "/tmp/jax_tpu_cache")
    from ggrt_official_tpu.utils.tpu_cache import purge_oversize_entries
    purge_oversize_entries("/tmp/jax_tpu_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    import jax.numpy as jnp

    from bench import build_inputs
    from ggrt_official_tpu.ops.rasterizer import api as raster
    from ggrt_official_tpu.ops.rasterizer.projection import project_gaussians
    from ggrt_official_tpu.ops.rasterizer.tiling import binning_overflow_stats

    jax.block_until_ready(jax.jit(lambda x: (x @ x).sum())(jnp.ones((128, 128))))

    shapes = [tuple(map(int, s.split("x"))) for s in (args.shapes or
              ["8x128", "8x64", "8x32", "16x16"])]
    # K base at the default 1024-px tile; scale with tile area so per-tile
    # capacity tracks per-tile demand (same total capacity budget).
    scales = {
        "bench": dict(hw=(320, 448), k_base=1024),
        "waymo": dict(hw=(640, 960), k_base=8192),
    }

    out = {"cells": {}}
    for sname, spec in scales.items():
        if sname in args.skip:
            continue
        H, W = spec["hw"]
        (means, cov, sh, opa, extr, intr, near, far, bg) = build_inputs(
            jax, jnp, H, W
        )
        pg = project_gaussians(
            means[0], cov[0], sh[0], opa[0], extr[0], intr[0], near[0],
            far[0], (H, W),
        )
        for th, tw in shapes:
            k = max(256, spec["k_base"] * th * tw // 1024)
            for binning in args.binnings:
                cell = f"{sname}/{th}x{tw}/{binning}"

                def loss(means, cov, sh, opa, extr):
                    img = raster.render(
                        extr, intr, near, far, (H, W), bg, means, cov, sh,
                        opa, backend="pallas", max_per_tile=k, max_dup=8,
                        binning_mode=binning, tile_shape=(th, tw),
                    )
                    return jnp.mean(img**2)

                step = jax.jit(
                    lambda *a: sum(
                        jnp.sum(g)
                        for g in jax.grad(loss, argnums=(0, 1, 2, 3, 4))(*a)
                    )
                )
                try:
                    t0 = time.perf_counter()
                    jax.block_until_ready(step(means, cov, sh, opa, extr))
                    compile_s = time.perf_counter() - t0
                    t0 = time.perf_counter()
                    for _ in range(args.iters):
                        o = step(means, cov, sh, opa, extr)
                    jax.block_until_ready(o)
                    dt = (time.perf_counter() - t0) / args.iters
                    ov = jax.jit(
                        lambda pg: binning_overflow_stats(
                            pg, (H, W), max_dup=8, max_per_tile=k,
                            tile_h=th, tile_w=tw,
                        )
                    )(pg)
                    out["cells"][cell] = {
                        "step_ms": round(dt * 1e3, 2),
                        "pixels_per_s": round(H * W / dt, 1),
                        "k": k,
                        "compile_s": round(compile_s, 1),
                        "recall": round(float(ov["recall"]), 4),
                        "max_tile_demand": int(ov["max_tile_demand"]),
                    }
                except Exception as e:  # noqa: BLE001 — record and continue
                    out["cells"][cell] = {
                        "error": str(e)[-300:],
                        "traceback_tail": traceback.format_exc(limit=2)[-200:],
                        "k": k,
                    }
                print(cell, json.dumps(out["cells"][cell]), flush=True)
                with open(args.out, "w") as f:
                    json.dump(out, f, indent=2)


if __name__ == "__main__":
    main()
