#!/usr/bin/env python
"""Crop-tiled evaluation of large images (eval_crop.py + concat.py +
compare.py equivalent, /root/reference/eval_crop.py:111-240).

Renders every test view tile-by-tile through principal-point-shifted
intrinsics (evaluation/crop_eval.py), stitches the tiles, and reports
stitched-vs-GT PSNR per view and scene means. This is the eval-side
counterpart of the deferred-BP training path: only one tile's activations
ever exist at full precision.
"""
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
    ap.add_argument("--out", default="out/eval_crop")
    ap.add_argument("--crop-h", type=int, default=160)
    ap.add_argument("--crop-w", type=int, default=224)
    ap.add_argument("--limit", type=int, default=None)
    ap.add_argument("--synthetic", action="store_true")
    ap.add_argument("--tiny", action="store_true")
    args = ap.parse_args()

    import numpy as np

    from ggrt_official_tpu.config import pretrain_config
    from ggrt_official_tpu.data.datasets import (
        LLFFTestDataset, SyntheticPlanesDataset, SyntheticSceneSpec, collate_batch,
    )
    from ggrt_official_tpu.evaluation import crop_eval
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
        args.crop_h, args.crop_w = 16, 32
    else:
        cfg = pretrain_config()
    cfg.train.rootdir = args.rootdir

    if args.synthetic:
        ds = SyntheticPlanesDataset(
            SyntheticSceneSpec(n_views=12, image_size=(64, 96)),
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

    evaluator = Evaluator(cfg, params)
    out_dir = Path(args.out)
    out_dir.mkdir(parents=True, exist_ok=True)

    def render_fn(cropped_batch):
        ret, _ = evaluator._render(evaluator.params, cropped_batch)
        return np.asarray(ret["rgb"][0, 0])

    results = []
    n = len(ds) if args.limit is None else min(args.limit, len(ds))
    for i in range(n):
        batch = evaluator_prepare(evaluator, collate_batch(ds[i]))
        stitched, psnr = crop_eval.eval_crop_view(
            render_fn, batch, args.crop_h, args.crop_w
        )
        results.append({"view": i, "psnr_stitched": psnr})
        np.save(out_dir / f"stitched_{i:03d}.npy", stitched)
        print(f"view {i}: stitched PSNR {psnr:.2f}")

    summary = {
        "n_views": len(results),
        "psnr_mean": float(np.mean([r["psnr_stitched"] for r in results])),
        "crop": [args.crop_h, args.crop_w],
        "views": results,
    }
    (out_dir / "results.json").write_text(json.dumps(summary, indent=2))
    print(json.dumps({k: v for k, v in summary.items() if k != "views"}))


def evaluator_prepare(evaluator, batch_raw):
    import jax
    import jax.numpy as jnp
    import numpy as np

    batch = {k: v for k, v in batch_raw.items() if k not in ("rgb_path", "scaled_shape")}
    shimmed = evaluator.data_shim({"context": batch["context"], "target": batch["target"]})
    batch["context"], batch["target"] = shimmed["context"], shimmed["target"]
    return jax.tree_util.tree_map(
        lambda x: jnp.asarray(x) if isinstance(x, (np.ndarray, np.generic)) else x, batch
    )


if __name__ == "__main__":
    main()
