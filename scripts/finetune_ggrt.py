#!/usr/bin/env python
"""Per-scene finetuning with deferred backprop (finetune_ggrt_stable.py equivalent)."""
from __future__ import annotations

import argparse
import itertools
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--rootdir", default="data/ibrnet/train")
    ap.add_argument("--scene", default="room")
    ap.add_argument("--n_iters", type=int, default=None)
    ap.add_argument("--out", default="out/finetune")
    ap.add_argument("--ckpt", default=None)
    ap.add_argument("--synthetic", action="store_true")
    args = ap.parse_args()

    from ggrt_official_tpu.config import finetune_config
    from ggrt_official_tpu.data.datasets import (
        LLFFTestDataset, SyntheticPlanesDataset, SyntheticSceneSpec, collate_batch,
    )
    from ggrt_official_tpu.training.loop import train_loop
    from ggrt_official_tpu.training.trainer import GGRtFinetuneTrainer

    cfg = finetune_config()
    if args.n_iters:
        cfg.train.n_iters = args.n_iters
    cfg.train.ckpt_path = args.ckpt
    cfg.train.rootdir = args.rootdir

    if args.synthetic:
        ds = SyntheticPlanesDataset(
            SyntheticSceneSpec(n_views=12, image_size=(64, 96)),
            num_source_views=4,
        )
    else:
        ds = LLFFTestDataset(
            cfg.train.rootdir, "train", scenes=(args.scene,),
            num_source_views=cfg.train.num_source_views, llffhold=cfg.train.llffhold,
        )

    def batches():
        for i in itertools.count():
            yield collate_batch(ds[i % len(ds)])

    trainer = GGRtFinetuneTrainer(cfg)
    train_loop(trainer, batches(), args.out)


if __name__ == "__main__":
    main()
