#!/usr/bin/env python
"""Novel-view video rendering (eval/render_llff_video.py equivalent):
interpolate a camera trajectory through the context window and render each
frame with the Gaussian model."""
from __future__ import annotations

import argparse
import sys
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--rootdir", default="data/ibrnet/train")
    ap.add_argument("--scene", default="fern")
    ap.add_argument("--ckpt", default=None)
    ap.add_argument("--out", default="out/video.mp4")
    ap.add_argument("--n_frames", type=int, default=60)
    ap.add_argument("--synthetic", action="store_true")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from ggrt_official_tpu.config import pretrain_config
    from ggrt_official_tpu.data.datasets import (
        LLFFTestDataset, SyntheticPlanesDataset, SyntheticSceneSpec, collate_batch,
    )
    from ggrt_official_tpu.models.pixelsplat import PixelSplat
    from ggrt_official_tpu.training.trainer import GGRtTrainer
    from ggrt_official_tpu.utils.trajectories import (
        cosine_ease, interpolate_extrinsics, interpolate_intrinsics,
    )

    cfg = pretrain_config()
    if args.synthetic:
        ds = SyntheticPlanesDataset(
            SyntheticSceneSpec(n_views=12, image_size=(64, 96)), num_source_views=4
        )
    else:
        ds = LLFFTestDataset(
            args.rootdir, "test", scenes=(args.scene,),
            num_source_views=cfg.train.num_source_views,
        )

    trainer = GGRtTrainer(cfg)
    batch = collate_batch(ds[0])
    trainer.init_full(batch)
    if args.ckpt:
        from ggrt_official_tpu.training.checkpoint import CheckPointManager
        from ggrt_official_tpu.training.loop import _restore_state

        payload = CheckPointManager(str(Path(args.ckpt).parent)).load(args.ckpt)
        if payload:
            trainer.state = _restore_state(trainer.state, payload["state"])

    batch = trainer.prepare_batch(batch)
    model = trainer.model
    params = trainer.state.params

    # Encode the context once; decode along the interpolated trajectory.
    gaussians = model.apply(
        params, batch["context"], 0, deterministic=True,
        method=lambda m, ctx, step, **kw: m.gaussian.encode_pairs(ctx, step, **kw),
    )

    ctx = batch["context"]
    t = cosine_ease(args.n_frames)
    extr = interpolate_extrinsics(ctx["extrinsics"][0, 0], ctx["extrinsics"][0, -1], t)
    intr = interpolate_intrinsics(ctx["intrinsics"][0, 0], ctx["intrinsics"][0, -1], t)
    h, w = batch["target"]["image"].shape[-2:]

    from ggrt_official_tpu.models.decoder_splatting import DecoderSplatting

    decoder = DecoderSplatting(cfg.decoder)
    frames = []
    for i in range(args.n_frames):
        out = decoder(
            gaussians,
            extr[i][None, None], intr[i][None, None],
            ctx["near"][:, :1], ctx["far"][:, :1], (h, w),
        )
        img = np.clip(np.asarray(out.color[0, 0]).transpose(1, 2, 0), 0, 1)
        frames.append((img * 255).astype(np.uint8))
        print(f"frame {i + 1}/{args.n_frames}", flush=True)

    import imageio.v2 as imageio

    Path(args.out).parent.mkdir(parents=True, exist_ok=True)
    imageio.mimwrite(args.out, frames, fps=30)
    print(f"wrote {args.out}")


if __name__ == "__main__":
    main()
