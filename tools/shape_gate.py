"""On-device shape-matrix gate for the rasterizer kernels (VERDICT r3 #2).

Round 3's flagship crashed because the Pallas kernels were only ever
tested under `force_tpu_interpret_mode` (which skips Mosaic's layout /
alignment checks) and benched at exactly one shape family — the
flagship's shapes hit an alignment Mosaic rejects. This gate closes that
class of escape: it compiles AND runs rasterizer fwd+bwd at every real
shape family, on the real device, for both compositing backends and both
production binning modes, BEFORE the round's proof runs trust them.

Shape families (VERDICT r3 #2):
  tiny-eval  32x64   K=128
  flagship   64x96   K=128   (ntx==1: the tall-window banked regime)
  bench      320x448 K=1024
  waymo      640x960 K=8192

plus two deliberately kernel-hostile configs that must FALL BACK to the
XLA path instead of crashing Mosaic:
  * banked binning with max_dup=16 on an ntx==1 image -> win_pack would
    overflow the gidwin payload bits (tiling.py gates on _WIN_LIMIT);
  * scatter_add_rows with a value width beyond the kernel's sublane
    group (segment_sum.py falls back to the XLA scatter).

Writes SHAPE_GATE_r05.json at the repo root (or --out). Exit 0 iff every
cell passed. Runtime: minutes with a warm /tmp/jax_tpu_cache.

Usage: python tools/shape_gate.py [--skip waymo] [--out SHAPE_GATE_r05.json]
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

SHAPES = {
    "tiny_eval": dict(shape=(32, 64), k=128, gpp=3, pairs=2),
    "flagship": dict(shape=(64, 96), k=128, gpp=2, pairs=2),
    # Round-5 default flagship resolution (VERDICT r4 #1).
    "flagship_hires": dict(shape=(128, 192), k=256, gpp=2, pairs=2),
    "bench": dict(shape=(320, 448), k=1024, gpp=3, pairs=2),
    "waymo": dict(shape=(640, 960), k=8192, gpp=3, pairs=2),
}


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--skip", nargs="*", default=[])
    ap.add_argument("--out", default=str(ROOT / "SHAPE_GATE_r05.json"))
    ap.add_argument("--iters", type=int, default=2)
    args = ap.parse_args()

    import jax

    jax.config.update("jax_compilation_cache_dir", "/tmp/jax_tpu_cache")
    from ggrt_official_tpu.utils.tpu_cache import purge_oversize_entries
    purge_oversize_entries("/tmp/jax_tpu_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    import jax.numpy as jnp

    from bench import build_inputs
    from ggrt_official_tpu.ops.rasterizer import api as raster

    dev = jax.devices()[0]
    jax.block_until_ready(jax.jit(lambda x: (x @ x).sum())(jnp.ones((128, 128))))

    results = {"device": str(dev), "cells": {}, "fallbacks": {}}
    ok = True

    def run_cell(name, shape, k, gpp, pairs, backend, binning):
        nonlocal ok
        H, W = shape
        (means, cov, sh, opa, extr, intr, near, far, bg) = build_inputs(
            jax, jnp, H, W, gpp=gpp, pairs=pairs
        )

        def loss(means, cov, sh, opa, extr):
            img = raster.render(
                extr, intr, near, far, (H, W), bg, means, cov, sh, opa,
                backend=backend, max_per_tile=k, max_dup=8,
                binning_mode=binning,
            )
            return jnp.mean(img**2)

        step = jax.jit(
            lambda *a: sum(
                jnp.sum(g) for g in jax.grad(loss, argnums=(0, 1, 2, 3, 4))(*a)
            )
        )
        cell = f"{name}/{backend}/{binning}"
        try:
            t0 = time.perf_counter()
            out = step(means, cov, sh, opa, extr)
            jax.block_until_ready(out)
            compile_s = time.perf_counter() - t0
            t0 = time.perf_counter()
            for _ in range(args.iters):
                out = step(means, cov, sh, opa, extr)
            jax.block_until_ready(out)
            dt = (time.perf_counter() - t0) / args.iters
            finite = bool(jnp.isfinite(out))
            results["cells"][cell] = {
                "ok": finite,
                "step_ms": round(dt * 1e3, 2),
                "compile_s": round(compile_s, 1),
                "grad_finite": finite,
            }
            ok = ok and finite
            print(f"[gate] {cell}: ok step={dt*1e3:.1f}ms "
                  f"(compile {compile_s:.0f}s)", flush=True)
        except Exception as e:  # noqa: BLE001 — record, keep gating
            ok = False
            results["cells"][cell] = {
                "ok": False,
                "error": str(e)[-300:],
                "traceback_tail": traceback.format_exc(limit=2)[-300:],
            }
            print(f"[gate] {cell}: FAIL {str(e)[-120:]}", flush=True)

    for name, spec in SHAPES.items():
        if name in args.skip:
            continue
        for backend in ("pallas", "tiled"):
            for binning in ("sort", "banked"):
                # tiled+banked adds nothing (binning is backend-agnostic);
                # keep the matrix at 3 cells per shape.
                if backend == "tiled" and binning == "banked":
                    continue
                run_cell(name, backend=backend, binning=binning, **spec)

    # --- deliberate-fallback proofs (must run, not crash) ---
    try:
        from ggrt_official_tpu.ops.rasterizer import tiling
        from ggrt_official_tpu.ops.rasterizer.projection import project_gaussians

        (means, cov, sh, opa, extr, intr, near, far, bg) = build_inputs(
            jax, jnp, 64, 96, gpp=2, pairs=2
        )
        pg = project_gaussians(
            means[0], cov[0], sh[0], opa[0], extr[0], intr[0],
            near[0], far[0], (64, 96),
        )
        # ntx==1 and max_dup=16 -> win_y=16 -> win_pack would overflow the
        # payload bits; tiling must take the XLA branch (and match it).
        a = jax.jit(
            lambda pg: tiling.bin_gaussians_banked(pg, (64, 96), 16, 128, merge="auto")
        )(pg)
        b = jax.jit(
            lambda pg: tiling.bin_gaussians_banked(pg, (64, 96), 16, 128, merge="sort")
        )(pg)
        same = bool(jnp.all(a.gaussian_ids == b.gaussian_ids))
        results["fallbacks"]["banked_winpack_overflow"] = {"ok": same}
        ok = ok and same
        print(f"[gate] fallback banked_winpack_overflow: ok={same}", flush=True)
    except Exception as e:  # noqa: BLE001
        ok = False
        results["fallbacks"]["banked_winpack_overflow"] = {
            "ok": False, "error": str(e)[-300:],
        }
        print(f"[gate] fallback banked_winpack_overflow: FAIL {e}", flush=True)

    try:
        from ggrt_official_tpu.ops.rasterizer.segment_sum import scatter_add_rows

        n, g, c = 2048, 512, 24  # c > _LANES -> XLA fallback path
        ids = jax.random.randint(jax.random.PRNGKey(0), (n,), 0, g + 1).astype(jnp.int32)
        vals = jax.random.normal(jax.random.PRNGKey(1), (n, c), jnp.float32)
        got = jax.jit(scatter_add_rows)(ids, vals, jnp.zeros((g, c), jnp.float32))
        want = jnp.zeros((g + 1, c)).at[ids].add(vals, mode="drop")[:g]
        err = float(jnp.max(jnp.abs(got - want)))
        good = err < 1e-4
        results["fallbacks"]["scatter_wide_values"] = {"ok": good, "max_err": err}
        ok = ok and good
        print(f"[gate] fallback scatter_wide_values: ok={good} err={err:.1e}", flush=True)
    except Exception as e:  # noqa: BLE001
        ok = False
        results["fallbacks"]["scatter_wide_values"] = {"ok": False, "error": str(e)[-300:]}
        print(f"[gate] fallback scatter_wide_values: FAIL {e}", flush=True)

    results["ok"] = ok
    with open(args.out, "w") as f:
        json.dump(results, f, indent=2)
    print(f"[gate] {'PASS' if ok else 'FAIL'} -> {args.out}", flush=True)
    sys.exit(0 if ok else 1)


if __name__ == "__main__":
    main()
