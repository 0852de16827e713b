#!/usr/bin/env python
"""Generalizable GGRt pretraining CLI (train_ggrt_stable.py equivalent).

Usage:
  python scripts/train_ggrt.py --rootdir data/ibrnet/train \
      --scenes fern --n_iters 6000 --out out/pretrain
  python scripts/train_ggrt.py --synthetic --n_iters 50 --out /tmp/smoke
"""
from __future__ import annotations

import argparse
import itertools
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--matmul_precision", default=None,
                    help="jax default_matmul_precision override (e.g. float32)")
    ap.add_argument("--rootdir", default="data/ibrnet/train")
    ap.add_argument("--scenes", nargs="*", default=[])
    ap.add_argument("--n_iters", type=int, default=None)
    ap.add_argument("--out", default="out/pretrain")
    ap.add_argument("--num_source_views", type=int, default=None)
    ap.add_argument("--synthetic", action="store_true", help="procedural scene (smoke test)")
    ap.add_argument("--synthetic_scenes", type=int, default=1,
                    help="number of procedural scenes (different seeds) to mix")
    ap.add_argument("--tiny", action="store_true", help="tiny model config (smoke test)")
    ap.add_argument("--machine", default=None,
                    help="state machine: joint | nerf_only | pose_only "
                         "(joint's exp-decay crushes the gaussian loss early "
                         "— stage nerf_only → pose_only for short runs)")
    ap.add_argument("--override", nargs="*", default=[], help="cfg overrides key=value")
    args = ap.parse_args()

    if args.matmul_precision:
        import jax
        jax.config.update("jax_default_matmul_precision", args.matmul_precision)

    from ggrt_official_tpu.config import pretrain_config, apply_overrides
    from ggrt_official_tpu.data.datasets import (
        LLFFTestDataset, SyntheticPlanesDataset, SyntheticSceneSpec, collate_batch,
    )
    from ggrt_official_tpu.training.loop import train_loop
    from ggrt_official_tpu.training.trainer import GGRtTrainer

    if args.tiny:
        import importlib.util

        spec = importlib.util.spec_from_file_location(
            "graft_entry", Path(__file__).resolve().parent.parent / "__graft_entry__.py"
        )
        mod = importlib.util.module_from_spec(spec)
        spec.loader.exec_module(mod)
        cfg = mod._tiny_cfg()
    else:
        cfg = pretrain_config()
    if args.n_iters:
        cfg.train.n_iters = args.n_iters
    if args.num_source_views:
        cfg.train.num_source_views = args.num_source_views
    if args.rootdir:
        cfg.train.rootdir = args.rootdir
    if args.machine:
        cfg.train.machine = args.machine
    apply_overrides(cfg, dict(kv.split("=", 1) for kv in args.override))

    if args.synthetic:
        from ggrt_official_tpu.data.datasets import SyntheticSceneSpec as _Spec

        scenes_ds = [
            SyntheticPlanesDataset(
                _Spec(n_views=12, image_size=(64, 96), seed=s_),
                num_source_views=min(cfg.train.num_source_views, 4),
            )
            for s_ in range(args.synthetic_scenes)
        ]
        ds = scenes_ds[0]
    else:
        ds = LLFFTestDataset(
            cfg.train.rootdir, "train", scenes=tuple(args.scenes),
            num_source_views=cfg.train.num_source_views, llffhold=cfg.train.llffhold,
        )

    def batches():
        for i in itertools.count():
            if args.synthetic and args.synthetic_scenes > 1:
                d = scenes_ds[i % len(scenes_ds)]
                yield collate_batch(d[(i // len(scenes_ds)) % len(d)])
            else:
                yield collate_batch(ds[i % len(ds)])

    trainer = GGRtTrainer(cfg)
    train_loop(trainer, batches(), args.out)


if __name__ == "__main__":
    main()
