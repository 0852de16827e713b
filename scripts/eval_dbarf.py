#!/usr/bin/env python
"""DBARF / IBRNet-path evaluation (eval/eval_dbarf.py equivalent):
pose-corrected volume rendering with PSNR/SSIM per test view."""
from __future__ import annotations

import argparse
import json
import sys
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--rootdir", default="data/ibrnet/train")
    ap.add_argument("--scenes", nargs="*", default=["fern"])
    ap.add_argument("--out", default="out/eval_dbarf")
    ap.add_argument("--limit", type=int, default=None)
    ap.add_argument("--n_samples", type=int, default=64)
    ap.add_argument("--chunk_size", type=int, default=2048)
    ap.add_argument("--render_stride", type=int, default=2)
    ap.add_argument("--synthetic", action="store_true")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from ggrt_official_tpu.config import pretrain_config
    from ggrt_official_tpu.data.datasets import (
        LLFFTestDataset, SyntheticPlanesDataset, SyntheticSceneSpec, collate_batch,
    )
    from ggrt_official_tpu.evaluation import metrics
    from ggrt_official_tpu.models.dbarf import IBRNetModel
    from ggrt_official_tpu.rendering import rays as rays_mod, volume

    cfg = pretrain_config()
    if args.synthetic:
        ds = SyntheticPlanesDataset(
            SyntheticSceneSpec(n_views=12, image_size=(64, 96)),
            mode="test", num_source_views=4,
        )
    else:
        ds = LLFFTestDataset(
            args.rootdir, "test", scenes=tuple(args.scenes),
            num_source_views=cfg.train.num_source_views,
        )

    model = IBRNetModel(cfg, coarse_feat_dim=64, coarse_only=True,
                        n_samples=args.n_samples)
    ex = collate_batch(ds[0])
    v = ex["src_rgbs"].shape[1]
    dummy_feat = np.zeros((4, 2, v, 64 + 3), np.float32)
    dummy_diff = np.zeros((4, 2, v, 4), np.float32)
    dummy_mask = np.ones((4, 2, v, 1), np.float32)
    params = model.init(
        jax.random.PRNGKey(0), jnp.asarray(ex["src_rgbs"][0]),
        jnp.asarray(dummy_feat), jnp.asarray(dummy_diff), jnp.asarray(dummy_mask),
    )

    rows = []
    n = len(ds) if args.limit is None else min(args.limit, len(ds))
    for i in range(n):
        ex = collate_batch(ds[i])
        src_rgbs = jnp.asarray(ex["src_rgbs"][0])
        feats = model.apply(params, src_rgbs, method="extract_features")
        camera = jnp.asarray(ex["camera"][0])
        h, w = int(camera[0]), int(camera[1])
        K = camera[2:18].reshape(4, 4)[None]
        c2w = camera[18:34].reshape(4, 4)[None]
        ray_o, ray_d = rays_mod.get_rays_single_image(
            h, w, K, c2w, render_stride=args.render_stride
        )
        ray_batch = {
            "ray_o": ray_o, "ray_d": ray_d,
            "depth_range": jnp.asarray(ex["depth_range"][0]),
            "camera": camera,
            "src_rgbs": src_rgbs,
            "src_cameras": jnp.asarray(ex["src_cameras"][0]),
        }
        rgb, depth = volume.render_image(
            jax.random.PRNGKey(i), ray_batch,
            lambda f, d, m: model.apply(params, f, d, m, method="coarse"),
            (feats[0], None), args.n_samples,
            chunk_size=args.chunk_size, det=True, inv_uniform=True,
        )
        hs = len(range(0, h, args.render_stride))
        ws = len(range(0, w, args.render_stride))
        pred = rgb.reshape(hs, ws, 3).transpose(2, 0, 1)
        gt = jnp.asarray(ex["rgb"][0])[:: args.render_stride, :: args.render_stride].transpose(2, 0, 1)
        rows.append({
            "psnr": float(metrics.psnr(pred, gt)),
            "ssim": float(metrics.ssim(pred, gt)),
        })
        print(f"view {i}: psnr={rows[-1]['psnr']:.2f}", flush=True)

    summary = {k: float(np.mean([r[k] for r in rows])) for k in rows[0]}
    Path(args.out).mkdir(parents=True, exist_ok=True)
    with open(Path(args.out) / "results.json", "w") as f:
        json.dump({"summary": summary, "per_view": rows}, f, indent=2)
    print(json.dumps(summary, indent=2))


if __name__ == "__main__":
    main()
