"""Waymo-scale (640x960) per-stage rasterizer breakdown on device.

VERDICT r3 #4: waymo fwd+bwd measured 822.85 ms/step (746.7k px/s) at
K=8192 sort binning — 0.17x the real-time bar. This diag isolates where
the time goes so the optimization lands where it matters:

  stage              what it times (separately jitted, scalar outputs)
  projection         project_gaussians fwd
  bin_sort/banked/   the three binning backends at the SAME K
    counting
  records            build_records (gather + cholesky) fwd
  core_fwd           pallas compositor fwd (records precomputed)
  core_fwdbwd        pallas compositor fwd+vjp
  render_fwd         full render fwd
  render_fwdbwd      full render fwd + grads to all 5 args (the bench op)

Usage: python tools/diag_waymo.py [--k 8192] [--hw 640 960] [--policy]
Writes one JSON line per stage + a summary line.
"""
from __future__ import annotations

import argparse
import json
import sys
import time
from pathlib import Path

ROOT = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(ROOT))


def timed(fn, args, iters=3):
    import jax

    out = fn(*args)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / iters * 1e3


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--k", type=int, default=8192)
    ap.add_argument("--hw", type=int, nargs=2, default=(640, 960))
    ap.add_argument("--policy", action="store_true",
                    help="also run the quality-aware K chooser and report")
    ap.add_argument("--iters", type=int, default=3)
    args = ap.parse_args()

    import jax

    jax.config.update("jax_compilation_cache_dir", "/tmp/jax_tpu_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    import jax.numpy as jnp

    from bench import build_inputs
    from ggrt_official_tpu.ops.rasterizer import api as raster
    from ggrt_official_tpu.ops.rasterizer import pallas_composite, tiling
    from ggrt_official_tpu.ops.rasterizer.projection import project_gaussians

    H, W = args.hw
    K = args.k
    jax.block_until_ready(jax.jit(lambda x: (x @ x).sum())(jnp.ones((128, 128))))
    (means, cov, sh, opa, extr, intr, near, far, bg) = build_inputs(jax, jnp, H, W)

    def emit(stage, ms, **kw):
        print(json.dumps({"stage": stage, "ms": round(ms, 2), **kw}), flush=True)

    # --- projection ---
    proj = jax.jit(lambda: project_gaussians(
        means[0], cov[0], sh[0], opa[0], extr[0], intr[0], near[0], far[0], (H, W)
    ))
    ms = timed(proj, (), args.iters)
    emit("projection", ms)
    pg = proj()

    # --- binning backends at the same K ---
    for mode, fn in (
        ("sort", tiling.bin_gaussians),
        ("banked", tiling.bin_gaussians_banked),
        ("counting", tiling.bin_gaussians_counting),
    ):
        try:
            f = jax.jit(lambda pg, fn=fn: fn(pg, (H, W), 8, K).counts.sum())
            ms = timed(f, (pg,), args.iters)
            emit(f"bin_{mode}", ms, k=K)
        except Exception as e:  # noqa: BLE001
            emit(f"bin_{mode}", -1.0, error=str(e)[-200:])

    binning = jax.jit(lambda pg: tiling.bin_gaussians(pg, (H, W), 8, K))(pg)
    jax.block_until_ready(binning)

    # --- records build (gather + cholesky) ---
    rec_fn = jax.jit(
        lambda pg, b: sum(jnp.sum(x) for x in pallas_composite.build_records(pg, b))
    )
    ms = timed(rec_fn, (pg, binning), args.iters)
    emit("records_fwd", ms)

    records, colors, counts = jax.jit(pallas_composite.build_records)(pg, binning)
    jax.block_until_ready(records)

    # --- compositor core fwd / fwd+bwd ---
    core_f = jax.jit(
        lambda r, c, n: sum(jnp.sum(x) for x in pallas_composite._composite_core(r, c, n))
    )
    ms = timed(core_f, (records, colors, counts), args.iters)
    emit("core_fwd", ms, n_tiles=int(records.shape[0]), k_pad=int(records.shape[2]))

    core_fb = jax.jit(
        lambda r, c, n: sum(
            jnp.sum(g) for g in jax.grad(
                lambda r, c: sum(
                    jnp.sum(x) for x in pallas_composite._composite_core(r, c, n)
                ),
                argnums=(0, 1),
            )(r, c)
        )
    )
    ms = timed(core_fb, (records, colors, counts), args.iters)
    emit("core_fwdbwd", ms)

    # --- full render fwd / fwd+bwd ---
    def render(means, cov, sh, opa, extr, binning_mode="sort"):
        return raster.render(
            extr, intr, near, far, (H, W), bg, means, cov, sh, opa,
            backend="pallas", max_per_tile=K, max_dup=8,
            binning_mode=binning_mode,
        )

    rf = jax.jit(lambda *a: jnp.mean(render(*a) ** 2))
    ms = timed(rf, (means, cov, sh, opa, extr), args.iters)
    emit("render_fwd", ms)

    rfb = jax.jit(
        lambda *a: sum(
            jnp.sum(g)
            for g in jax.grad(lambda *a: jnp.mean(render(*a) ** 2), argnums=(0, 1, 2, 3, 4))(*a)
        )
    )
    ms = timed(rfb, (means, cov, sh, opa, extr), args.iters)
    emit("render_fwdbwd", ms, px_per_s=round(H * W / (ms / 1e3), 1))

    try:
        rfb_b = jax.jit(
            lambda *a: sum(
                jnp.sum(g)
                for g in jax.grad(
                    lambda *a: jnp.mean(render(*a, binning_mode="banked") ** 2),
                    argnums=(0, 1, 2, 3, 4),
                )(*a)
            )
        )
        ms = timed(rfb_b, (means, cov, sh, opa, extr), args.iters)
        emit("render_fwdbwd_banked", ms, px_per_s=round(H * W / (ms / 1e3), 1))
    except Exception as e:  # noqa: BLE001
        emit("render_fwdbwd_banked", -1.0, error=str(e)[-200:])

    if args.policy:
        pol = raster.choose_max_per_tile(
            extr, intr, near, far, (H, W), bg, means, cov, sh, opa,
            target_db=45.0, max_dup=8,
        )
        print(json.dumps({"stage": "cap_policy", **pol}), flush=True)


if __name__ == "__main__":
    main()
