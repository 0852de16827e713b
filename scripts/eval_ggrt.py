#!/usr/bin/env python
"""GGRt evaluation CLI (eval/eval_ggrt.py equivalent): per-view pose
correction + Gaussian rendering + PSNR/SSIM/LPIPS + pose R/t errors."""
from __future__ import annotations

import argparse
import json
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--rootdir", default="data/ibrnet/train")
    ap.add_argument("--scenes", nargs="*", default=["fern"])
    ap.add_argument("--ckpt", default=None)
    ap.add_argument("--out", default="out/eval")
    ap.add_argument("--limit", type=int, default=None)
    ap.add_argument("--synthetic", action="store_true")
    ap.add_argument("--tiny", action="store_true")
    ap.add_argument("--synthetic_seed", type=int, default=0,
                    help="procedural scene seed (pick one outside the training "
                         "mix for a held-out-scene eval)")
    ap.add_argument("--gt_pose", action="store_true",
                    help="render with dataset extrinsics instead of IPO-Net "
                         "poses (isolates G-3DGS quality from pose quality)")
    args = ap.parse_args()

    from ggrt_official_tpu.config import pretrain_config
    from ggrt_official_tpu.data.datasets import (
        LLFFTestDataset, SyntheticPlanesDataset, SyntheticSceneSpec, collate_batch,
    )
    from ggrt_official_tpu.evaluation.harness import Evaluator
    from ggrt_official_tpu.training.checkpoint import CheckPointManager
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
    cfg.train.rootdir = args.rootdir

    if args.synthetic:
        ds = SyntheticPlanesDataset(
            SyntheticSceneSpec(n_views=12, image_size=(64, 96), seed=args.synthetic_seed),
            mode="test", num_source_views=4,
        )
    else:
        ds = LLFFTestDataset(
            cfg.train.rootdir, "test", scenes=tuple(args.scenes),
            num_source_views=cfg.train.num_source_views, llffhold=cfg.train.llffhold,
        )

    trainer = GGRtTrainer(cfg)
    trainer.init_full(collate_batch(ds[0]))
    params = trainer.state.params
    if args.ckpt:
        payload = CheckPointManager(str(Path(args.ckpt).parent)).load(args.ckpt)
        if payload is not None:
            from ggrt_official_tpu.training.loop import _restore_state

            trainer.state = _restore_state(trainer.state, payload["state"])
            params = trainer.state.params
            print(f"loaded checkpoint at step {payload['step']}")

    evaluator = Evaluator(cfg, params)
    summary = evaluator.evaluate_dataset(
        ds, out_dir=args.out, limit=args.limit, use_pred_pose=not args.gt_pose
    )
    print(json.dumps(summary, indent=2))


if __name__ == "__main__":
    main()
