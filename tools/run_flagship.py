"""Round-2 flagship proof run: staged synthetic pretrain + held-out eval.

VERDICT.md round-1 item 3 asked for committed evidence that the framework
actually learns: held-out synthetic PSNR > 20 and R_err < 10 deg after a
multi-scene pretrain (the round-1 run overfit train views while held-out
sat at PSNR 7.2 / R_err 145 deg, traced to a pose-convention bug since
pinned by tests/test_pose_convention.py).

Recipe (validated on CPU by tools/diag_pose_learn.py / diag_pose_distill.py):
  stage 1  nerf_only  — train G-3DGS with dataset poses,
  stage 2  pose_only  — train IPO-Net with the photometric warp loss plus
                        depth distillation from the frozen gaussian render
                        (config.pose_depth_distill).
This mirrors the reference's state machine (train_ggrt_stable.py:126-150)
but staged instead of 'joint' because short runs can't amortize the
exp-decay joint loss.

Eval protocol matches /root/reference/eval/eval_ggrt.py:265-332 (pose
correction -> ATE-aligned R/t errors; render -> PSNR/SSIM): held-out
*views* (mode="test") of a training scene, and a fully held-out *scene*
(unseen seed), both with IPO-Net-predicted poses; a gt-pose arm isolates
G-3DGS quality from pose quality.

Writes EVAL_FLAGSHIP_r02.json at the repo root.

Usage: python tools/run_flagship.py [--nerf 1600] [--pose 700] [--out out/flagship]
"""
import argparse
import itertools
import json
import sys
import time
from pathlib import Path

ROOT = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(ROOT))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--nerf", type=int, default=1600)
    ap.add_argument("--pose", type=int, default=700)
    ap.add_argument("--scenes", type=int, default=4)
    ap.add_argument("--distill", type=float, default=1.0)
    ap.add_argument("--out", default="out/flagship_r02")
    ap.add_argument("--eval_limit", type=int, default=None)
    args = ap.parse_args()

    import jax

    jax.config.update("jax_compilation_cache_dir", "/tmp/jax_test_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    import importlib.util

    spec = importlib.util.spec_from_file_location(
        "graft_entry", ROOT / "__graft_entry__.py"
    )
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)

    from ggrt_official_tpu.data.datasets import (
        SyntheticPlanesDataset, SyntheticSceneSpec, collate_batch,
    )
    from ggrt_official_tpu.evaluation.harness import Evaluator
    from ggrt_official_tpu.training.loop import train_loop
    from ggrt_official_tpu.training.trainer import GGRtTrainer

    cfg = mod._tiny_cfg()
    cfg.train.use_pred_pose = False
    cfg.train.pose_depth_distill = args.distill
    cfg.train.n_tensorboard = 100
    cfg.train.n_checkpoint = 1000
    n_total = args.nerf + args.pose
    cfg.train.n_iters = n_total

    # Rotated cameras + binary alphas: the default arc is pure translation
    # (R_err trivially ~0 for any near-identity prediction) and soft alphas
    # bias the photometric optimum away from GT poses (see
    # SyntheticSceneSpec docstrings). look_at + wobble gives nearby views
    # relative rotations of several degrees, so the identity-prediction
    # baseline R_err is nonzero and beating it demonstrates learning.
    def spec(seed):
        return SyntheticSceneSpec(
            n_views=12, image_size=(64, 96), seed=seed, binary_alpha=True,
            look_at_z=4.0, rot_wobble_deg=6.0, arc_scale=1.4,
        )

    train_ds = [
        SyntheticPlanesDataset(spec(s), num_source_views=4)
        for s in range(args.scenes)
    ]

    def batches():
        for i in itertools.count():
            d = train_ds[i % len(train_ds)]
            yield collate_batch(d[(i // len(train_ds)) % len(d)])

    def schedule(step):
        return "nerf_only" if step < args.nerf else "pose_only"

    trainer = GGRtTrainer(cfg)
    t0 = time.perf_counter()
    train_loop(trainer, batches(), args.out, machine_schedule=schedule, resume=False)
    train_s = time.perf_counter() - t0

    evaluator = Evaluator(cfg, trainer.state.params)
    result = {"train_steps": n_total, "train_s": round(train_s, 1),
              "recipe": f"nerf_only {args.nerf} -> pose_only {args.pose} "
                        f"(distill {args.distill}) on {args.scenes} scenes"}
    arms = {
        "heldout_views_pred_pose": (
            SyntheticPlanesDataset(spec(0), mode="test", num_source_views=4),
            True,
        ),
        "heldout_views_gt_pose": (
            SyntheticPlanesDataset(spec(0), mode="test", num_source_views=4),
            False,
        ),
        "heldout_scene_pred_pose": (
            SyntheticPlanesDataset(spec(17), mode="test", num_source_views=4),
            True,
        ),
    }

    # Identity-prediction baseline: the R/t error an untrained "predict
    # zero relative pose" model scores on the same protocol. The trained
    # model must land well below this for the eval to demonstrate learning.
    import numpy as np

    from ggrt_official_tpu.evaluation.metrics import evaluate_pose_errors

    def identity_baseline(ds):
        rs, ts = [], []
        for i in range(len(ds)):
            b = collate_batch(ds[i])
            tgt = np.asarray(b["camera"][0, -16:]).reshape(4, 4)
            gt = np.asarray(b["context"]["extrinsics"][0])
            pred = np.broadcast_to(tgt, gt.shape)
            err = evaluate_pose_errors(pred, gt)
            rs.append(float(err["R_error_mean_unaligned"]))
            ts.append(float(err["t_error_mean_unaligned"]))
        return {"R_error_mean_unaligned": round(float(np.mean(rs)), 4),
                "t_error_mean_unaligned": round(float(np.mean(ts)), 4)}

    result["identity_pose_baseline"] = identity_baseline(arms["heldout_views_pred_pose"][0])
    for name, (ds, pred) in arms.items():
        try:
            summary = evaluator.evaluate_dataset(
                ds, out_dir=f"{args.out}/eval_{name}", limit=args.eval_limit,
                use_pred_pose=pred,
            )
            result[name] = {
                k: round(float(v), 4)
                for k, v in summary.items()
                if isinstance(v, (int, float))
            }
        except Exception as e:  # noqa: BLE001 — keep the other arms' results
            result[name] = {"error": str(e)[-300:]}
        print(name, json.dumps(result[name]), flush=True)
        with open(ROOT / "EVAL_FLAGSHIP_r02.json", "w") as f:
            json.dump(result, f, indent=2)
    print(json.dumps(result, indent=2))


if __name__ == "__main__":
    main()
