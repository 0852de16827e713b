"""Production-scale measurements (VERDICT r4 #4, #5, #6).

Three separable phases, each gated by a flag so a tunnel hiccup in one
cannot take down the others; results accumulate into PRODSCALE_r05.json:

  --cap_policy  Validate the quality-aware capacity policy on ENCODER-
                EMITTED Gaussians instead of bench.py's uniform-random
                population (VERDICT r4 weak #4): run the production-size
                encoder (d_feature 128, gaussians_per_pixel 3, sh 4 —
                /root/reference/configs/pixelsplat/encoder/epipolar.yaml)
                on a 320x448 synthetic scene, feed the REAL anisotropic /
                depth-concentrated / opacity≈pdf population through
                choose_max_per_tile + binning_overflow_stats, and record
                {K, demand, psnr_at_k, recall}. --ckpt also measures a
                TRAINED flagship checkpoint's population at its own
                resolution (tiny config).

  --fullstep    One measured end-to-end production train step (VERDICT r4
                #6): IPO-Net + epipolar encoder + Pallas rasterizer
                fwd+bwd at 320x448 (the reference's pretrain regime,
                /root/reference/configs/pretrain_ggrt_stable.yaml:38-58),
                plus a stage split (iponet fwd / encoder fwd / full render
                fwd / residual backward+update).

  --cache_ab    Gaussian-cache on/off steady-state step time at the
                PRODUCTION encoder size (VERDICT r4 weak #3: at the tiny
                flagship encoder the cache is a measured loss; the
                reference's trick only pays when the encode it skips
                outweighs the bookkeeping —
                /root/reference/ggrt/model/pixelsplat/pixelsplat.py:177-199).

Usage: python tools/diag_production.py --cap_policy [--fullstep] [--cache_ab]
       [--image 320 448] [--views 3] [--out PRODSCALE_r05.json]
"""
from __future__ import annotations

import argparse
import json
import sys
import time
from pathlib import Path

ROOT = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(ROOT))


def _save(path, payload):
    with open(path, "w") as f:
        json.dump(payload, f, indent=2)
    print(f"[saved] {path}", flush=True)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--cap_policy", action="store_true")
    ap.add_argument("--fullstep", action="store_true")
    ap.add_argument("--cache_ab", action="store_true")
    ap.add_argument("--cache_steps", type=int, default=12)
    ap.add_argument("--image", type=int, nargs=2, default=(320, 448))
    ap.add_argument("--views", type=int, default=3,
                    help="source views (3 -> 2 adjacent context pairs, the "
                         "pretrain geometry bench.py mirrors)")
    ap.add_argument("--ckpt", default=None,
                    help="flagship checkpoint dir: also run --cap_policy on "
                         "the TRAINED tiny-config population")
    ap.add_argument("--ckpt_image", type=int, nargs=2, default=(128, 192))
    ap.add_argument("--platform", default="")
    ap.add_argument("--out", default=str(ROOT / "PRODSCALE_r05.json"))
    args = ap.parse_args()

    import contextlib

    import jax

    interpret = contextlib.nullcontext()
    if args.platform:
        jax.config.update("jax_platforms", args.platform)
        jax.config.update("jax_compilation_cache_dir", "/tmp/jax_test_cache")
        if args.platform == "cpu":
            # Pallas kernels only run on CPU in interpret mode (this is the
            # smoke-test path; the measurements run on the device).
            from jax.experimental import pallas as pl  # noqa: F401
            from jax.experimental.pallas import tpu as pltpu

            interpret = pltpu.force_tpu_interpret_mode()
    else:
        jax.config.update("jax_compilation_cache_dir", "/tmp/jax_tpu_cache")
        from ggrt_official_tpu.utils.tpu_cache import purge_oversize_entries
        purge_oversize_entries("/tmp/jax_tpu_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    import jax.numpy as jnp
    import numpy as np

    from ggrt_official_tpu.config import GGRtConfig
    from ggrt_official_tpu.data.datasets import (
        SyntheticPlanesDataset, collate_batch, flagship_scene_spec,
    )
    from ggrt_official_tpu.training.trainer import GGRtTrainer

    ctx = interpret
    ctx.__enter__()
    result = {}
    out_path = Path(args.out)
    if out_path.exists():
        result = json.loads(out_path.read_text())

    H, W = args.image

    def prod_cfg():
        cfg = GGRtConfig()
        # Reference pretrain knobs (pretrain_ggrt_stable.yaml + epipolar.yaml):
        # d_feature 128, gaussians_per_pixel 3, sh_degree 4, 32 epipolar
        # samples, downscale 4 are the config-tree defaults already.
        cfg.train.matmul_precision = "float32"
        cfg.train.use_depth_loss = False
        return cfg

    def make_batch(cfg, hw, seed=0):
        ds = SyntheticPlanesDataset(
            flagship_scene_spec(seed=seed, image_size=tuple(hw)),
            num_source_views=args.views,
        )
        return ds, collate_batch(ds[0])

    def encoded_population(trainer, batch):
        """Run encode_pairs with the trainer's params; return the raster
        inputs of the real emitted population + the target camera."""
        b = trainer.prepare_batch(batch)
        model = trainer.model

        def encode(params, context):
            return model.apply(
                params, context, 0, deterministic=True,
                method=lambda m, c, s, **kw: m.gaussian.encode_pairs(c, s, **kw),
            )

        g = jax.jit(encode)(trainer.state.params, b["context"])
        tgt = b["target"]
        return g, tgt

    # ---------------- cap policy on real populations ----------------
    if args.cap_policy:
        from ggrt_official_tpu.ops.rasterizer.api import choose_max_per_tile
        from ggrt_official_tpu.ops.rasterizer.projection import project_gaussians
        from ggrt_official_tpu.ops.rasterizer.tiling import binning_overflow_stats

        def run_policy(tag, cfg, hw, state=None):
            trainer = GGRtTrainer(cfg)
            ds, batch = make_batch(cfg, hw)
            trainer.init_full(batch)
            if state is not None:
                trainer.state = state
            g, tgt = encoded_population(trainer, batch)
            means, cov, sh, opa = (
                g.means, g.covariances, g.harmonics, g.opacities
            )
            extr = tgt["extrinsics"][:, 0]
            intr = tgt["intrinsics"][:, 0]
            near = tgt["near"][:, 0]
            far = tgt["far"][:, 0]
            bg = jnp.zeros((1, 3))
            t0 = time.perf_counter()
            policy = choose_max_per_tile(
                extr, intr, near, far, tuple(hw), bg, means, cov, sh, opa,
                target_db=45.0, max_dup=8,
            )
            pg = project_gaussians(
                means[0], cov[0], sh[0], opa[0], extr[0], intr[0],
                near[0], far[0], tuple(hw),
            )
            ov = jax.jit(
                lambda pg: binning_overflow_stats(
                    pg, tuple(hw), max_dup=8,
                    max_per_tile=policy["max_per_tile"],
                )
            )(pg)
            row = {
                "population": tag,
                "resolution": list(hw),
                "n_gaussians": int(means.shape[1]),
                "opacity_mean": round(float(jnp.mean(opa)), 4),
                "policy": policy,
                "overflow": {k: round(float(v), 4) for k, v in ov.items()},
                "seconds": round(time.perf_counter() - t0, 1),
            }
            print(tag, json.dumps(row), flush=True)
            return row

        rows = []
        rows.append(run_policy("encoder_untrained_prod", prod_cfg(), (H, W)))
        if args.ckpt:
            import importlib.util

            spec_mod = importlib.util.spec_from_file_location(
                "graft_entry", ROOT / "__graft_entry__.py"
            )
            mod = importlib.util.module_from_spec(spec_mod)
            spec_mod.loader.exec_module(mod)
            tiny = mod._tiny_cfg()
            from ggrt_official_tpu.training.checkpoint import CheckPointManager
            from ggrt_official_tpu.training.loop import _restore_state

            trainer = GGRtTrainer(tiny)
            _, batch = make_batch(tiny, args.ckpt_image)
            trainer.init_full(batch)
            payload = CheckPointManager(args.ckpt).load(None)
            assert payload is not None, f"no checkpoint in {args.ckpt}"
            state = _restore_state(trainer.state, payload["state"])
            rows.append(run_policy(
                "encoder_trained_flagship", tiny, args.ckpt_image, state=state
            ))
        result["cap_policy_real_populations"] = rows
        _save(out_path, result)

    # ---------------- production full train step ----------------
    if args.fullstep:
        cfg = prod_cfg()
        trainer = GGRtTrainer(cfg)
        ds, batch = make_batch(cfg, (H, W))
        trainer.init_full(batch)

        t0 = time.perf_counter()
        aux = trainer.train_iteration(batch, machine="joint")
        jax.tree_util.tree_map(
            lambda x: x.block_until_ready() if hasattr(x, "block_until_ready") else x,
            aux,
        )
        compile_s = time.perf_counter() - t0
        iters = 8
        t0 = time.perf_counter()
        for _ in range(iters):
            aux = trainer.train_iteration(batch, machine="joint")
        jax.tree_util.tree_map(
            lambda x: x.block_until_ready() if hasattr(x, "block_until_ready") else x,
            aux,
        )
        step_ms = (time.perf_counter() - t0) / iters * 1e3

        # Stage split (fwd-only sub-graphs; the residual is backward+update).
        b = trainer.prepare_batch(batch)
        model = trainer.model
        min_d, max_d = b["depth_range"][0, 0], b["depth_range"][0, 1]

        ipo = jax.jit(lambda p: model.apply(
            p, b["rgb"], b["src_rgbs"], b["camera"], b["src_cameras"],
            min_d, max_d, compute_sfm_loss=True, method="iponet",
        )[1])
        enc = jax.jit(lambda p: model.apply(
            p, b["context"], 0, deterministic=True,
            method=lambda m, c, s, **kw: m.gaussian.encode_pairs(c, s, **kw),
        ).means)
        rend = jax.jit(lambda p: model.apply(
            p, b, 0, deterministic=True, method="gaussian_forward",
        )[0]["rgb"])

        def t_of(fn):
            jax.block_until_ready(fn(trainer.state.params))
            t0 = time.perf_counter()
            for _ in range(iters):
                out = fn(trainer.state.params)
            jax.block_until_ready(out)
            return (time.perf_counter() - t0) / iters * 1e3

        ipo_ms, enc_ms, rend_ms = t_of(ipo), t_of(enc), t_of(rend)
        result["production_fullstep"] = {
            "resolution": [H, W],
            "views": args.views,
            "d_feature": 128,
            "step_ms": round(step_ms, 2),
            "pixels_per_s": round(H * W / (step_ms / 1e3), 1),
            "compile_s": round(compile_s, 1),
            "stage_split_ms": {
                "iponet_fwd": round(ipo_ms, 2),
                "encoder_fwd": round(enc_ms, 2),
                "full_render_fwd": round(rend_ms, 2),
                "backward_update_residual": round(
                    step_ms - ipo_ms - rend_ms, 2
                ),
            },
            "loss_finite": bool(np.isfinite(float(aux["loss_all"]))),
        }
        print("fullstep", json.dumps(result["production_fullstep"]), flush=True)
        _save(out_path, result)

    # ---------------- cache A/B at production size ----------------
    if args.cache_ab:
        from ggrt_official_tpu.training.trainer_cached import CachedGGRtTrainer

        cfg = prod_cfg()
        ds, batch0 = make_batch(cfg, (H, W))
        seq = [collate_batch(ds[i % len(ds)]) for i in range(args.cache_steps)]

        def timed(tr):
            tr.init_full(batch0)
            for b in seq:   # warm-up: one graph per distinct miss count
                tr.train_iteration(b, machine="nerf_only")
            if hasattr(tr, "hits"):
                tr.hits = tr.misses = 0
            t0 = time.perf_counter()
            for b in seq:
                tr.train_iteration(b, machine="nerf_only")
            dt = (time.perf_counter() - t0) / len(seq) * 1e3
            extra = {"hits": tr.hits, "misses": tr.misses} if hasattr(tr, "hits") else {}
            return {"step_ms": round(dt, 2), **extra}

        result["production_cache_ab"] = {
            "resolution": [H, W],
            "d_feature": 128,
            "off": timed(GGRtTrainer(cfg)),
            "on": timed(CachedGGRtTrainer(cfg)),
        }
        print("cache_ab", json.dumps(result["production_cache_ab"]), flush=True)
        _save(out_path, result)

    print(json.dumps(result, indent=2))


if __name__ == "__main__":
    main()
