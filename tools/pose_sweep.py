"""Pose-recipe robustness sweep (VERDICT r3 #6).

The flagship recipe (staged nerf_only -> pose_only, lrate_pose 3e-4,
render-loss pose gradients) was a single point: one scene spec, one seed,
one schedule. This sweep runs REDUCED-SCALE variants and records R_err /
PSNR per variant so the recipe's robustness — and the comparison against
the reference's actual joint exp-decay machine
(/root/reference/ggrt/model/dgaussian.py:113-121, compose_joint_loss) —
is on record:

  * 3 seeds x staged schedule          (seed robustness)
  * 2 extra scene specs (staged)       (spec robustness)
  * joint machine from step 0          (reference schedule comparison)
  * joint with raised joint_coefficient (short-run-tuned variant)

Each variant: train at 64x96, then eval held-out views with pred-pose and
GT-pose arms + the identity baseline. Writes POSE_SWEEP_r04.json.

Usage: python tools/pose_sweep.py [--nerf 700] [--pose 500] [--limit 4]
"""
from __future__ import annotations

import argparse
import json
import sys
import time
from pathlib import Path

ROOT = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(ROOT))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--nerf", type=int, default=700)
    ap.add_argument("--pose", type=int, default=500)
    ap.add_argument("--scenes", type=int, default=2)
    ap.add_argument("--limit", type=int, default=4, help="eval views per arm")
    ap.add_argument("--out", default=str(ROOT / "POSE_SWEEP_r05.json"))
    ap.add_argument("--only", nargs="*", default=None, help="variant names")
    args = ap.parse_args()

    import jax

    jax.config.update("jax_compilation_cache_dir", "/tmp/jax_tpu_cache")
    from ggrt_official_tpu.utils.tpu_cache import purge_oversize_entries
    purge_oversize_entries("/tmp/jax_tpu_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    import jax.numpy as jnp
    import numpy as np

    from ggrt_official_tpu.data.datasets import (
        SyntheticPlanesDataset, collate_batch, flagship_scene_spec,
    )
    from ggrt_official_tpu.evaluation.harness import Evaluator
    from ggrt_official_tpu.geometry.alignment import evaluate_camera_alignment
    from ggrt_official_tpu.training.loop import train_loop
    from ggrt_official_tpu.training.trainer import GGRtTrainer

    import importlib.util

    spec_mod = importlib.util.spec_from_file_location(
        "graft_entry", ROOT / "__graft_entry__.py"
    )
    mod = importlib.util.module_from_spec(spec_mod)
    spec_mod.loader.exec_module(mod)

    def base_cfg(**overrides):
        cfg = mod._tiny_cfg()
        # Rehearsed recipe (see run_flagship.py --pred_pose/--render_grad):
        # pose stage = photometric warp + GT-pose-render depth distill.
        cfg.train.use_pred_pose = False
        cfg.train.pose_render_grad = False
        cfg.train.sfm_valid_mask = True
        cfg.train.sfm_oob_weight = 0.1
        cfg.train.pose_depth_distill = 1.0
        cfg.train.lrate_pose = 2e-4
        cfg.train.n_tensorboard = 200
        cfg.train.n_checkpoint = 100000   # no mid-run ckpts in the sweep
        cfg.train.n_iters = args.nerf + args.pose
        for k, v in overrides.items():
            assert hasattr(cfg.train, k), k
            setattr(cfg.train, k, v)
        return cfg

    n_total = args.nerf + args.pose

    def staged(step):
        return "nerf_only" if step < args.nerf else "pose_only"

    def joint(step):
        return "joint"

    # (name, scene_seed_base, data_seed, schedule, cfg overrides)
    variants = {
        "staged_seed0": (0, 0, staged, {}),
        "staged_seed1": (0, 1, staged, {}),
        "staged_seed2": (0, 2, staged, {}),
        "staged_specA": (100, 0, staged, {}),
        "staged_specB": (200, 0, staged, {}),
        # The reference's live schedule: joint from step 0 with the
        # exp-decay compose (dgaussian.py:113-121). Its published
        # coefficient (1e-5) keeps the gaussian branch near-zero-weight for
        # 100k steps; at sweep scale that starves G-3DGS, so we run BOTH
        # the published value and a short-run-scaled one.
        "joint_ref_coeff": (0, 0, joint, {"joint_coefficient": 1e-5}),
        "joint_scaled_coeff": (0, 0, joint, {"joint_coefficient": 1e-3}),
        # Render-gradient curriculum (the reference's actual pose-learning
        # mechanism — predicted poses injected into the render and the rgb
        # loss backpropped into IPO-Net through the rasterizer's camera
        # gradients, train_ggrt_stable.py:102-106 + the dcharatan fork's
        # dCamera). The r4 attempt-1 failure ran this UNCONSTRAINED at
        # lrate 3e-4 from a garbage predictor; here the pose stage starts
        # from a trained G-3DGS, predictions start near identity, and the
        # oob penalty + distill + lower lr bound the translation drift.
        "staged_rendergrad": (0, 0, staged,
                              {"use_pred_pose": True,
                               "pose_render_grad": True,
                               "lrate_pose": 1e-4}),
        "staged_rendergrad_nosfm": (0, 0, staged,
                                    {"use_pred_pose": True,
                                     "pose_render_grad": True,
                                     "lrate_pose": 1e-4,
                                     "sfm_weight": 0.0}),
        # Teacher-render pose loss (config.pose_teacher_weight): context
        # views rendered at the PREDICTED cameras from the frozen teacher
        # field, L2 vs the real images, gradients via the rasterizer's
        # dCamera only — the field itself is never perturbed (what sank
        # the rendergrad variants above at R 152 deg).
        "staged_teacher": (0, 0, staged, {"pose_teacher_weight": 10.0}),
        "staged_teacher_only": (0, 0, staged,
                                {"pose_teacher_weight": 10.0,
                                 "sfm_weight": 0.0}),
        # Pose-stage lr ladder: at 2e-4 the rotations never left identity
        # (staged_seed0) while the DIRECT warp basin descends 5.4 -> 4.1
        # (diag_pose_teacher) — probe whether the amortization gap is just
        # optimization budget.
        "staged_lr1e3": (0, 0, staged, {"lrate_pose": 1e-3}),
        "staged_lr3e3": (0, 0, staged, {"lrate_pose": 3e-3}),
        # Round-5 flagship recipe at sweep scale: distill-only warm, then
        # self-supervised pose-target generation (teacher-depth warp
        # descent) and regression onto the targets
        # (config.pose_selfdistill_weight; run_flagship.py stages 2a/2b).
        "staged_selfdistill": (0, 0, staged,
                               {"pose_selfdistill_weight": 10.0,
                                "sfm_weight": 0.0,
                                "pose_anchor_weight": 0.01,
                                "pose_depth_distill": 1.0}),
    }
    if args.only:
        variants = {k: v for k, v in variants.items() if k in args.only}

    results = {"args": vars(args), "variants": {}}

    def identity_baseline(ds):
        rs = []
        for i in range(min(len(ds), args.limit)):
            b = collate_batch(ds[i])
            tgt = np.asarray(b["camera"][-16:] if b["camera"].ndim == 1
                             else b["camera"][0, -16:]).reshape(4, 4)
            gt = np.asarray(b["context"]["extrinsics"][0])
            err = evaluate_camera_alignment(
                jnp.broadcast_to(jnp.asarray(tgt), gt.shape), jnp.asarray(gt)
            )
            rs.append(float(err["R_error_mean"]))
        return float(np.mean(rs))

    for name, (scene_base, data_seed, schedule, overrides) in variants.items():
        t0 = time.perf_counter()
        cfg = base_cfg(**overrides)
        cfg.train.seed = 3407 + data_seed

        def spec(seed_off):
            return flagship_scene_spec(seed=scene_base + seed_off,
                                       image_size=(64, 96))

        train_ds = [
            SyntheticPlanesDataset(spec(s), num_source_views=4)
            for s in range(args.scenes)
        ]

        def batches():
            import itertools

            for i in itertools.count():
                d = train_ds[i % len(train_ds)]
                yield collate_batch(d[(i // len(train_ds)) % len(d)])

        trainer = GGRtTrainer(cfg)
        out_dir = str(ROOT / "out" / f"pose_sweep_{name}")
        try:
            if overrides.get("pose_selfdistill_weight", 0.0) > 0.0:
                # Flagship stage structure (run_flagship.py): nerf ->
                # distill-only warm (1/3 of pose budget) -> target-gen ->
                # selfdistill; targets attach to the SAME batch stream.
                targets = {}

                def sbatches():
                    import itertools

                    for i in itertools.count():
                        si = i % len(train_ds)
                        vi = (i // len(train_ds)) % len(train_ds[si])
                        b = collate_batch(train_ds[si][vi])
                        t = targets.get((si, vi))
                        if t is not None:
                            b["pose_target"] = t[None]
                        yield b

                warm = args.pose // 3
                train_loop(trainer, sbatches(), out_dir, n_iters=args.nerf,
                           machine_schedule=lambda s: "nerf_only", resume=False)
                train_loop(trainer, sbatches(), out_dir, n_iters=warm,
                           machine_schedule=lambda s: "pose_only", resume=False)
                ev_t = Evaluator(cfg, trainer.state.params)
                for si, d in enumerate(train_ds):
                    for vi in range(len(d)):
                        braw = collate_batch(d[vi])
                        bb = ev_t._prepare_batch(braw)
                        ret, _ = ev_t._render(ev_t.params, bb)
                        inv = None
                        if ret["depth"] is not None:
                            lo = float(bb["depth_range"][0, 0])
                            hi = float(bb["depth_range"][0, 1])
                            inv = 1.0 / np.clip(
                                np.asarray(ret["depth"][0, 0]), lo, hi
                            )[None, None]
                        targets[(si, vi)] = ev_t.pose_targets(
                            braw, steps=400, inv_depth=inv
                        )
                train_loop(trainer, sbatches(), out_dir,
                           n_iters=args.pose - warm,
                           machine_schedule=lambda s: "pose_only",
                           resume=False)
            else:
                train_loop(trainer, batches(), out_dir,
                           machine_schedule=schedule, resume=False)
            ev = Evaluator(cfg, trainer.state.params)
            test_ds = SyntheticPlanesDataset(spec(0), mode="test",
                                             num_source_views=4)
            pred = ev.evaluate_dataset(test_ds, limit=args.limit,
                                       use_pred_pose=True)
            gt = ev.evaluate_dataset(test_ds, limit=args.limit,
                                     use_pred_pose=False)
            row = {
                "psnr_pred": round(pred["psnr"], 3),
                "psnr_gt": round(gt["psnr"], 3),
                "psnr_gap_db": round(gt["psnr"] - pred["psnr"], 3),
                "R_err_unaligned": round(pred.get("R_error_mean_unaligned",
                                                  float("nan")), 4),
                "R_err_identity_baseline": round(identity_baseline(test_ds), 4),
                # Empty-render canary (VERDICT r4 weak #6): two diverged
                # variants reported IDENTICAL psnr 5.888 in the r4 sweeps —
                # both rendered pure background. Make that state explicit.
                "pred_var": round(pred.get("pred_var", float("nan")), 6),
                "rendered_empty": bool(pred.get("rendered_empty", False)),
                "train_s": round(time.perf_counter() - t0, 1),
                "schedule": "staged" if schedule is staged else "joint",
                **{k: v for k, v in overrides.items()},
            }
            if np.isfinite(row["R_err_unaligned"]):
                row["beats_identity"] = bool(
                    row["R_err_unaligned"] < 0.5 * row["R_err_identity_baseline"]
                )
        except Exception as e:  # noqa: BLE001 — keep the rest of the sweep
            row = {"error": str(e)[-300:]}
        results["variants"][name] = row
        print(name, json.dumps(row), flush=True)
        with open(args.out, "w") as f:
            json.dump(results, f, indent=2)

    print(f"sweep written: {args.out}", flush=True)


if __name__ == "__main__":
    main()
