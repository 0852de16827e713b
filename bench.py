"""Benchmark harness — prints ONE JSON line with the headline metric.

Headline: rasterizer fwd+bwd throughput in pixels/s/chip at the reference
eval resolution (LLFF 320x448, SURVEY.md §6) with a realistic per-pixel
Gaussian population (2 context pairs x 3 gaussians/pixel, the pretrain
config's geometry). vs_baseline compares against the real-time bar implied
by the reference's title claim (30 fps at 320x448 = 4.3 MP/s fwd; we
measure fwd+bwd which the reference never achieves in real time).

Robustness (round-2, VERDICT.md weak#1): the axon tunnel can take minutes
on the first dispatch and can throw transient FAILED_PRECONDITION errors.
This harness (a) probes the device with a tiny op first, (b) retries the
whole measurement once on transient TPU backend errors, and (c) ALWAYS
prints a JSON line — on total failure the line carries value 0 and the
error tail so the driver records something parseable.
"""
from __future__ import annotations

import json
import sys
import time
import traceback


def _emit(payload):
    print(json.dumps(payload), flush=True)


def build_inputs(jax, jnp, H, W, gpp=3, pairs=2):
    n_gauss = H * W * gpp * pairs
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
    return means, cov, sh, opa, extr, intr, near, far, bg


def measure(profile_dir=None):
    import jax

    # Persistent compilation cache: retries and repeated driver runs skip the
    # multi-minute tunnel compiles.
    jax.config.update("jax_compilation_cache_dir", "/tmp/jax_tpu_cache")
    from ggrt_official_tpu.utils.tpu_cache import purge_oversize_entries
    purge_oversize_entries("/tmp/jax_tpu_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    import jax.numpy as jnp

    from ggrt_official_tpu.ops.rasterizer import api as raster

    # --- device probe: force the tunnel up with a tiny op before anything
    # large is traced (first dispatch can take minutes through axon).
    dev = jax.devices()[0]
    probe = jax.jit(lambda x: (x @ x).sum())(jnp.ones((128, 128)))
    jax.block_until_ready(probe)

    H, W = 320, 448
    (means, cov, sh, opa, extr, intr, near, far, bg) = build_inputs(jax, jnp, H, W)
    g = means.shape[1]

    backend = "pallas"
    import os as _os

    # Quality-aware capacity policy (VERDICT r3 weak #3: the bench K and
    # the demand policy's K answered the same question differently).
    # choose_max_per_tile measures PSNR vs the demand-covering capacity on
    # THIS population and picks the smallest power-of-two K within 45 dB —
    # the K used, the policy's K, and quality-at-K are now one artifact.
    from ggrt_official_tpu.ops.rasterizer.api import choose_max_per_tile

    # max_dup stays 8: although dup=6 is visually lossless with the
    # mean-centered dup window (49.6 dB, BENCH_NOTES.md), it measured
    # SLOWER on TPU (66.7 ms vs 59.4 ms, 2 runs each) — the 5.2M- and
    # 6.9M-key sorts pad to the same 8.4M power-of-two internally, while
    # dup=8's div/mod compiles to shifts and dup=6's does not. Env
    # override kept for A/B sweeps.
    max_dup = int(_os.environ.get("GGRT_BENCH_MAX_DUP", "8"))
    # Screen-tile shape (round 4 made it a parameter end-to-end; round 5
    # measures it on device via tools/diag_tile_shape.py — override with
    # GGRT_BENCH_TILE_SHAPE="8x64"; empty = the library default).
    tile_env = _os.environ.get("GGRT_BENCH_TILE_SHAPE", "")
    tile_shape = (
        tuple(int(x) for x in tile_env.split("x")) if tile_env else None
    )
    policy = choose_max_per_tile(
        extr, intr, near, far, (H, W), bg, means, cov, sh, opa,
        target_db=45.0, max_dup=max_dup, tile_shape=tile_shape,
    )
    kw = dict(
        max_per_tile=policy["max_per_tile"],
        max_dup=max_dup,
        tile_chunk=16,
        # banked binning (round 3): one per-gaussian sort instead of the
        # g*max_dup pair sort — 45.8 -> 42.9 ms end-to-end; render quality
        # 48.9 dB vs effectively-uncapped on this population (sort mode:
        # 56.4 dB; both above the 45 dB bar of tests/test_rasterizer.py).
        binning_mode=_os.environ.get("GGRT_BENCH_BINNING", "banked"),
    )
    if tile_shape is not None:
        kw["tile_shape"] = tile_shape

    # --- correctness gate (VERDICT weak#6): pallas vs XLA compositor on the
    # real device, small scene, before timing anything.
    gs = 4096
    small = [a[:, :gs] if a.ndim > 1 and a.shape[1] == g else a for a in (means, cov, sh, opa)]
    img_p = raster.render(extr, intr, near, far, (64, 128), bg, *small, backend="pallas", **kw)
    img_x = raster.render(extr, intr, near, far, (64, 128), bg, *small, backend="tiled", **kw)
    aerr = jnp.abs(img_p - img_x)
    err = float(jnp.mean(aerr))
    outliers = float(jnp.mean(aerr > 2e-3))
    # Mean must be tight; isolated pixels may flip a Gaussian across the
    # alpha >= 1/255 cutoff (the two backends compute `power` via different
    # but equivalent factorizations), each worth <= ~1/255 of a color.
    assert err < 1e-4 and outliers < 2e-3, (
        f"pallas/XLA compositor mismatch on device: mean={err} outlier_frac={outliers}"
    )

    def loss(means, cov, sh, opa, extr):
        img = raster.render(
            extr, intr, near, far, (H, W), bg, means, cov, sh, opa,
            backend=backend, **kw,
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

    if profile_dir:
        with jax.profiler.trace(profile_dir):
            jax.block_until_ready(step(means, cov, sh, opa, extr))

    iters = 10
    t0 = time.perf_counter()
    for _ in range(iters):
        out = step(means, cov, sh, opa, extr)
    jax.block_until_ready(out)
    dt = (time.perf_counter() - t0) / iters

    # Static-cap overflow recall at the bench population (VERDICT weak#9 /
    # SURVEY §7.3 #1: the caps are a correctness deviation — measure it).
    from ggrt_official_tpu.ops.rasterizer.projection import project_gaussians
    from ggrt_official_tpu.ops.rasterizer.tiling import binning_overflow_stats

    pg = project_gaussians(
        means[0], cov[0], sh[0], opa[0], extr[0], intr[0], near[0], far[0], (H, W)
    )
    _tile_kw = (
        {"tile_h": tile_shape[0], "tile_w": tile_shape[1]} if tile_shape else {}
    )
    ov = jax.jit(
        lambda pg: binning_overflow_stats(pg, (H, W), max_dup=kw["max_dup"],
                                          max_per_tile=kw["max_per_tile"],
                                          **_tile_kw)
    )(pg)
    overflow = {k: float(v) for k, v in ov.items()}

    # --- secondary config: Waymo-scale single chip (BASELINE config #5,
    # SURVEY §6: waymo test renders at 640x960; driving-scene density).
    # Stresses the sort and the demand-driven cap policy where SURVEY §7.3
    # predicts they break. Disable with GGRT_BENCH_WAYMO=0.
    waymo = None
    if _os.environ.get("GGRT_BENCH_WAYMO", "1") != "0":
        WH, WW = 640, 960
        (wm, wc, wsh, wo, wext, wint, wnear, wfar, wbg) = build_inputs(
            jax, jnp, WH, WW
        )
        pgw = project_gaussians(
            wm[0], wc[0], wsh[0], wo[0], wext[0], wint[0], wnear[0], wfar[0],
            (WH, WW),
        )
        wtile_env = _os.environ.get("GGRT_BENCH_WAYMO_TILE_SHAPE", tile_env)
        wtile = (
            tuple(int(x) for x in wtile_env.split("x")) if wtile_env else None
        )
        wpolicy = choose_max_per_tile(
            wext, wint, wnear, wfar, (WH, WW), wbg, wm, wc, wsh, wo,
            target_db=45.0, max_dup=kw["max_dup"], tile_shape=wtile,
        )
        wbinning = _os.environ.get("GGRT_BENCH_WAYMO_BINNING", kw["binning_mode"])
        _wtile_kw = {"tile_shape": wtile} if wtile else {}

        def wloss(wm, wc, wsh, wo, wext):
            img = raster.render(
                wext, wint, wnear, wfar, (WH, WW), wbg, wm, wc, wsh, wo,
                backend=backend, max_per_tile=wpolicy["max_per_tile"],
                max_dup=kw["max_dup"], tile_chunk=kw["tile_chunk"],
                binning_mode=wbinning, **_wtile_kw,
            )
            return jnp.mean(img**2)

        wstep = jax.jit(
            lambda *a: sum(
                jnp.sum(gr) for gr in jax.grad(wloss, argnums=(0, 1, 2, 3, 4))(*a)
            )
        )
        wout = wstep(wm, wc, wsh, wo, wext)
        jax.block_until_ready(wout)
        t0 = time.perf_counter()
        for _ in range(5):
            wout = wstep(wm, wc, wsh, wo, wext)
        jax.block_until_ready(wout)
        wdt = (time.perf_counter() - t0) / 5
        _wov_kw = (
            {"tile_h": wtile[0], "tile_w": wtile[1]} if wtile else {}
        )
        wov = jax.jit(
            lambda pg: binning_overflow_stats(
                pg, (WH, WW), max_dup=kw["max_dup"],
                max_per_tile=wpolicy["max_per_tile"], **_wov_kw,
            )
        )(pgw)
        waymo = {
            "resolution": [WH, WW],
            "tile_shape": list(wtile) if wtile else None,
            "n_gaussians": int(wm.shape[1]),
            "step_ms": round(wdt * 1e3, 2),
            "pixels_per_s": round(WH * WW / wdt, 1),
            "binning_mode": wbinning,
            "cap_policy": wpolicy,
            "overflow": {k: float(v) for k, v in wov.items()},
        }

    pixels_per_s = H * W / dt
    baseline = 30.0 * H * W  # 30 fps forward-only "real-time" bar
    return {
        "metric": "rasterize_fwd_bwd_pixels_per_s_per_chip",
        "value": round(pixels_per_s, 1),
        "unit": "pixels/s",
        "vs_baseline": round(pixels_per_s / baseline, 3),
        "detail": {
            "resolution": [H, W],
            "tile_shape": list(tile_shape) if tile_shape else None,
            "n_gaussians": int(g),
            "backend": backend,
            "step_ms": round(dt * 1e3, 2),
            "device": str(dev),
            "pallas_vs_xla_mean_err": err,
            "cap_policy": policy,
            "binning_overflow": overflow,
            "waymo_640x960": waymo,
        },
    }


def _run_child(profile_dir):
    try:
        _emit(measure(profile_dir))
        return 0
    except Exception as e:  # noqa: BLE001 — parent decides on retry
        tb = traceback.format_exc(limit=3)
        _emit(
            {
                "metric": "rasterize_fwd_bwd_pixels_per_s_per_chip",
                "value": 0.0,
                "unit": "pixels/s",
                "vs_baseline": 0.0,
                "detail": {"error": str(e)[-400:], "traceback_tail": tb[-400:]},
            }
        )
        return 1


def main():
    profile_dir = None
    argv = sys.argv[1:]
    for i, a in enumerate(argv):
        if a == "--profile" and i + 1 < len(argv):
            profile_dir = argv[i + 1]

    if "--child" in argv:
        sys.exit(_run_child(profile_dir))

    # Parent: run the measurement in a fresh subprocess so a stale TPU client
    # (FailedPrecondition from a previous crashed process) can't poison the
    # retry; always end by printing exactly one JSON line on our own stdout.
    import subprocess

    cmd = [sys.executable, __file__, "--child"] + (
        ["--profile", profile_dir] if profile_dir else []
    )
    last_line = ""
    for attempt in range(2):
        proc = subprocess.run(
            cmd, capture_output=True, text=True, timeout=3600, cwd="/root/repo"
        )
        lines = [l for l in proc.stdout.strip().splitlines() if l.startswith("{")]
        last_line = lines[-1] if lines else ""
        try:
            payload = json.loads(last_line)
        except (json.JSONDecodeError, ValueError):
            payload = None
        if proc.returncode == 0 and payload and payload.get("value", 0) > 0:
            print(last_line, flush=True)
            return
        if attempt == 0:
            time.sleep(20)
    if last_line:
        print(last_line, flush=True)
    else:
        _emit(
            {
                "metric": "rasterize_fwd_bwd_pixels_per_s_per_chip",
                "value": 0.0,
                "unit": "pixels/s",
                "vs_baseline": 0.0,
                "detail": {"error": "bench child produced no JSON"},
            }
        )
    sys.exit(0)


if __name__ == "__main__":
    main()
