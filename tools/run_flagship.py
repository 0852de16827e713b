"""Flagship proof run: staged synthetic pretrain + held-out eval.

The flagship demonstrates the product's headline capability end-to-end:
pose-free generalizable rendering. Recipe (CPU-rehearsed by
tools/diag_pose_learn_v3.py; scene + loss fixes diagnosed by the
tools/diag_pose_* series):

  stage 1  nerf_only  — train G-3DGS with dataset poses,
  stage 2  pose_only  — train IPO-Net with the photometric warp loss
                        (sfm_valid_mask=True) plus depth distillation from
                        the frozen gaussian render (pose_depth_distill).

Scene: flagship_scene_spec (datasets.py) — multi-octave texture, wide FOV,
deep parallax, frustum-covering planes; direct Adam on raw pose vecs
converges from identity on it (it diverges on the round-2 scene).

Eval protocol matches /root/reference/eval/eval_ggrt.py:265-332 (pose
correction -> R/t errors; render -> PSNR/SSIM): held-out *views*
(mode="test") of a training scene and a fully held-out *scene*, each with
BOTH a predicted-pose arm and a GT-pose arm (the GT arm isolates G-3DGS
quality from pose quality), plus a per-arm identity-prediction pose
baseline (unaligned errors only — the sim3 fit is degenerate for
broadcast-identity predictions, ADVICE r2).

Acceptance bar (VERDICT r2 #1, unchanged since): heldout-views pred-pose
PSNR within 2 dB of the GT-pose arm AND R_err_unaligned < 0.5x the
identity baseline.

Writes <out>/EVAL_FLAGSHIP.json and (only at default args) the round
artifact EVAL_FLAGSHIP_r04.json at the repo root; the artifact embeds the
full args + scene spec so smoke runs are distinguishable (ADVICE r2).

Usage: python tools/run_flagship.py [--nerf 1600] [--pose 900] [--out out/flagship_r04]
"""
import argparse
import dataclasses
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
    ap.add_argument("--pose", type=int, default=900)
    ap.add_argument("--scenes", type=int, default=4)
    ap.add_argument("--distill", type=float, default=1.0)
    # The reference's lrate_pose (2e-5, pretrain_ggrt_stable.yaml:38-58) is
    # tuned for 100k+-step schedules; at flagship scale (hundreds of pose
    # steps) it cannot move IPO-Net off its init — the r3 smoke run left
    # R_err at the identity baseline with it. 2e-4 is what the CPU
    # rehearsal diag actually ran (tools/diag_pose_learn_v3.py:82 — the r3
    # flagship's 3e-4 was yet another unrehearsed deviation).
    ap.add_argument("--lrate_pose", type=float, default=2e-4)
    # Pose-stage wiring knobs (round-4: the r4 first attempt failed its bar
    # with pred_pose=1 render_grad=1 — two flags the CPU rehearsal never
    # validated; they feed garbage predicted-pose renders into both the
    # distill target and the loss, and IPO-Net landed WORSE than identity,
    # R 15.4 deg vs 8.2 baseline. Defaults now match the REHEARSED recipe:
    # pose stage learns from the photometric warp loss + depth distilled
    # from GT-pose renders; predicted poses are exercised at EVAL, which is
    # where the pose-free product claim lives).
    ap.add_argument("--pred_pose", type=int, default=0)
    ap.add_argument("--render_grad", type=int, default=0)
    # r4 attempt-2/sweep data (BENCH_NOTES round 4): the amortized warp
    # loss is NET HARMFUL to IPO-Net poses at this scale — 500 pose steps
    # at 2e-4 leave rotations at identity, 2500 steps diverge to R 112 deg
    # (POSE_SWEEP_r04_long.json) — while depth distillation is healthy.
    # Default pose stage = distill-only (sfm_weight 0): IPO-Net's depth
    # trains, its pose head stays at the near-identity init, and the
    # pose-free claim is carried by test-time refinement (the BARF/DBARF
    # lineage the reference also uses), which descends the warp basin to
    # its depth-limited floor (diag_pose_teacher: 4.07 deg from 5.39 with
    # IPO depth; 2.2 with GT depth).
    ap.add_argument("--sfm_weight", type=float, default=0.0)
    # Identity anchor (config.pose_anchor_weight): required with
    # sfm_weight 0 — without it the pose head explodes (pose_vec_norm
    # ~1.2e6, r4 attempt 3c) as distillation shifts the shared trunk.
    ap.add_argument("--pose_anchor", type=float, default=0.1)
    # The warp-refinement floor is texture/depth limited and drops with
    # resolution — 4.07 deg at 64x96 vs 3.53 at 128x192 even with the
    # depth net evaluated OFF its training resolution (diag_pose_teacher
    # r4 runs) — so 128x192 is the better-margin config. It is NOT the
    # default because the remote-compile tunnel twice hung >40 min on the
    # hires train-step HLO (r4: out/smoke_hires*), while every 64x96 graph
    # is in the persistent compile cache; run --image 128 192 when the
    # compile path is reliable.
    ap.add_argument("--image", type=int, nargs=2, default=(64, 96))
    ap.add_argument("--out", default="out/flagship_r04")
    ap.add_argument("--eval_limit", type=int, default=None)
    ap.add_argument("--cache_ab", type=int, default=25,
                    help="steps for the gaussian-cache on/off timing (0=skip)")
    ap.add_argument("--artifact", default=None,
                    help="override the repo-root artifact path")
    args = ap.parse_args()
    defaults = all(
        getattr(args, k) == ap.get_default(k)
        for k in ("nerf", "pose", "scenes", "distill", "image", "eval_limit",
                  "lrate_pose", "pred_pose", "render_grad", "sfm_weight",
                  "pose_anchor")
    )

    import jax

    jax.config.update("jax_compilation_cache_dir", "/tmp/jax_tpu_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    import numpy as np

    from ggrt_official_tpu import config as cfg_mod
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

    cfg = mod._tiny_cfg()
    # use_pred_pose + pose_render_grad (see the --pred_pose/--render_grad
    # help): when ON, the pose stage renders FROM the predicted poses and
    # the rgb loss backprops into IPO-Net through the rasterizer's camera
    # gradients. OFF by default after the r4 first attempt: with an
    # untrained predictor those renders are garbage and both the distill
    # target and the pose gradient become noise (EVAL_FLAGSHIP attempt 1,
    # out/flagship_r04). nerf_only ignores use_pred_pose by design.
    cfg.train.use_pred_pose = bool(args.pred_pose)
    cfg.train.pose_render_grad = bool(args.render_grad)
    cfg.train.sfm_valid_mask = True
    cfg.train.sfm_oob_weight = 0.1
    cfg.train.sfm_weight = args.sfm_weight
    cfg.train.pose_anchor_weight = args.pose_anchor
    cfg.train.pose_depth_distill = args.distill
    cfg.train.lrate_pose = args.lrate_pose
    cfg.train.n_tensorboard = 100
    cfg.train.n_checkpoint = 1000
    n_total = args.nerf + args.pose
    cfg.train.n_iters = n_total

    def spec(seed):
        return flagship_scene_spec(seed=seed, image_size=tuple(args.image))

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
    result = {
        "train_steps": n_total,
        "train_s": round(train_s, 1),
        "recipe": f"nerf_only {args.nerf} -> pose_only {args.pose} "
                  f"(distill {args.distill}, valid_mask) on {args.scenes} scenes",
        "args": vars(args),
        "scene_spec": dataclasses.asdict(spec(0)),
        "is_default_flagship": defaults,
    }

    def identity_baseline(ds):
        """Unaligned R/t of broadcasting the target pose as every source
        pose — the bar any trained pose branch must beat (no sim3 fit:
        identical camera centers make Umeyama degenerate)."""
        import jax.numpy as jnp

        rs, ts = [], []
        for i in range(len(ds)):
            b = collate_batch(ds[i])
            tgt = np.asarray(b["camera"][-16:] if b["camera"].ndim == 1
                             else b["camera"][0, -16:]).reshape(4, 4)
            gt = np.asarray(b["context"]["extrinsics"][0])
            err = evaluate_camera_alignment(
                jnp.broadcast_to(jnp.asarray(tgt), gt.shape), jnp.asarray(gt)
            )
            rs.append(float(err["R_error_mean"]))
            ts.append(float(err["t_error_mean"]))
        return {"R_error_mean_unaligned": round(float(np.mean(rs)), 4),
                "t_error_mean_unaligned": round(float(np.mean(ts)), 4)}

    # (spec, use_pred_pose, refine_steps): the *_refined arms add
    # self-supervised test-time pose refinement (photometric warp loss on
    # the input views only — the BARF/DBARF test-time-optimization lineage)
    # on top of the IPO-Net prediction.
    arms = {
        "heldout_views_pred_pose": (spec(0), True, 0),
        "heldout_views_pred_refined": (spec(0), True, 400),
        "heldout_views_gt_pose": (spec(0), False, 0),
        "heldout_scene_pred_pose": (spec(17), True, 0),
        "heldout_scene_pred_refined": (spec(17), True, 400),
        "heldout_scene_gt_pose": (spec(17), False, 0),
    }
    baselines = {}
    out_path = Path(args.out) / "EVAL_FLAGSHIP.json"
    out_path.parent.mkdir(parents=True, exist_ok=True)
    artifact = Path(args.artifact) if args.artifact else ROOT / "EVAL_FLAGSHIP_r04.json"

    for name, (sp, pred, refine) in arms.items():
        ds = SyntheticPlanesDataset(sp, mode="test", num_source_views=4)
        key = "scene17" if sp.seed == 17 else "scene0"
        if key not in baselines:
            baselines[key] = identity_baseline(ds)
        result[f"identity_pose_baseline_{key}"] = baselines[key]
        try:
            summary = evaluator.evaluate_dataset(
                ds, out_dir=f"{args.out}/eval_{name}", limit=args.eval_limit,
                use_pred_pose=pred, refine_steps=refine,
            )
            result[name] = {
                k: (round(float(v), 4) if isinstance(v, (int, float)) else v)
                for k, v in summary.items()
                if isinstance(v, (int, float)) or k.startswith("lpips")
            }
        except Exception as e:  # noqa: BLE001 — keep the other arms' results
            result[name] = {"error": str(e)[-300:]}
        print(name, json.dumps(result[name]), flush=True)
        with open(out_path, "w") as f:
            json.dump(result, f, indent=2)

    # Explicit acceptance-bar verdict (VERDICT r2 #1 bar, lines 25-28):
    # computed from the arms so every attempt self-reports PASS/FAIL.
    try:
        pv = result["heldout_views_pred_pose"]
        gv = result["heldout_views_gt_pose"]
        ident = result["identity_pose_baseline_scene0"]["R_error_mean_unaligned"]
        gap = gv["psnr"] - pv["psnr"]
        ratio = pv["R_error_mean_unaligned"] / max(ident, 1e-9)
        result["bar"] = {
            "psnr_gap_db": round(gap, 3),
            "psnr_ok": bool(gap <= 2.0),
            "r_err_ratio_vs_identity": round(ratio, 3),
            "r_ok": bool(ratio < 0.5),
            "refined_r_err_ratio": round(
                result.get("heldout_views_pred_refined", {}).get(
                    "R_error_mean_unaligned", float("nan")
                ) / max(ident, 1e-9), 3,
            ),
            "pass": bool(gap <= 2.0 and ratio < 0.5),
            # The pose-free product at test time is IPO-Net init +
            # self-supervised refinement (no GT used); report that arm's
            # verdict alongside the raw-prediction one.
            "refined_pass": bool(
                gap <= 2.0
                and result.get("heldout_views_pred_refined", {}).get(
                    "R_error_mean_unaligned", float("inf")
                ) < 0.5 * ident
            ),
        }
        print("bar", json.dumps(result["bar"]), flush=True)
    except (KeyError, TypeError) as e:
        result["bar"] = {"error": f"bar not computable: {e}"}

    # Gaussian-cache A/B (VERDICT r2 #8): steady-state per-step wall time
    # with the cross-iteration cache on vs off, same scene stream.
    if args.cache_ab > 0:
        from ggrt_official_tpu.training.trainer_cached import CachedGGRtTrainer

        def timed_steps(tr, tag):
            tr.init_full(collate_batch(train_ds[0][0]))
            tr.state = trainer.state
            seq = [collate_batch(train_ds[0][i % len(train_ds[0])])
                   for i in range(args.cache_ab)]
            # Warm-up pass over the WHOLE sequence: the cached trainer
            # compiles one graph per distinct missing-pair count, so a
            # single-step warm-up leaves compiles inside the timed window
            # (observed: 121 s/step through the tunnel).
            for b in seq:
                tr.train_iteration(b, machine="nerf_only")
            if hasattr(tr, "hits"):
                tr.hits = tr.misses = 0
            t0 = time.perf_counter()
            for b in seq:
                tr.train_iteration(b, machine="nerf_only")
            dt = (time.perf_counter() - t0) / len(seq) * 1e3
            extra = {}
            if hasattr(tr, "hits"):
                extra = {"hits": tr.hits, "misses": tr.misses}
            return {"step_ms": round(dt, 2), **extra}

        result["cache_ab"] = {
            "off": timed_steps(GGRtTrainer(cfg), "off"),
            "on": timed_steps(CachedGGRtTrainer(cfg), "on"),
        }
        print("cache_ab", json.dumps(result["cache_ab"]), flush=True)

    with open(out_path, "w") as f:
        json.dump(result, f, indent=2)
    if defaults or args.artifact:
        with open(artifact, "w") as f:
            json.dump(result, f, indent=2)
        print(f"artifact written: {artifact}", flush=True)
    else:
        print(f"non-default args: artifact NOT written (result at {out_path})",
              flush=True)
    print(json.dumps(result, indent=2))


if __name__ == "__main__":
    main()
