"""Flagship proof run: staged synthetic pretrain + held-out eval.

The flagship demonstrates the product's headline capability end-to-end:
pose-free generalizable rendering. Round-5 recipe (each stage grounded in
the round-4 measured experiment matrix, BENCH_NOTES "pose-learning
experiment matrix"):

  stage 1  nerf_only        — train G-3DGS with dataset poses.
  stage 2a pose_only warm   — depth-distill-only (sfm_weight 0, identity
                              anchor): IPO-Net's depth head learns from the
                              frozen teacher render; the pose head stays at
                              the uncorrupted near-identity init (the r4
                              attempt-3 recipe — every measured warp-loss
                              gradient through the network is flat or
                              harmful at this scale).
  targets  self-supervised pose-target generation: dual-start photometric
           warp refinement (Adam on raw 6-vec poses — the ONE mechanism the
           r4 matrix measured as working, R 8.2 -> ~3.5-4 deg) using the
           teacher render's depth, per training view. No GT poses.
  stage 2b pose_only selfdistill — IPO-Net REGRESSES the refined targets
           (iteration-weighted MSE) + depth distill. This amortizes the
           working test-time optimization into the feed-forward predictor,
           which is exactly the reference's IPO-Net product shape
           (/root/reference/train_ggrt_stable.py:102-106) reached via a
           conditioning path that measurably converges.

Scene: flagship_scene_spec (datasets.py) — multi-octave texture, wide FOV,
deep parallax, frustum-covering planes.

Default resolution is 128x192 (VERDICT r4 #1): the warp-refinement floor
is texture/depth limited and drops with resolution — 4.07 deg at 64x96 vs
3.53 at 128x192 with OFF-res depth (diag_pose_teacher r4); at-res depth +
teacher-depth targets should sit lower still.

Eval protocol matches /root/reference/eval/eval_ggrt.py:265-332 (pose
correction -> R/t errors; render -> PSNR/SSIM): held-out *views*
(mode="test") of a training scene and a fully held-out *scene*, each with
a predicted-pose arm, a refined-pose arm (test-time warp refinement from
the prediction — BARF/DBARF lineage), and a GT-pose arm (isolates G-3DGS
quality from pose quality), plus per-arm identity-prediction baselines.

Acceptance bar (VERDICT r2 #1, unchanged since): heldout-views pred-pose
PSNR within 2 dB of the GT-pose arm AND R_err_unaligned < 0.5x the
identity baseline (raw prediction: `r_ok`; refined: `refined_pass`).

An overfit-ceiling arm (--ceiling) trains a fresh G-3DGS on scene 0 only
and reports its GT-pose heldout-view PSNR — calibrating how much of the
GT-arm number is model capacity vs data (VERDICT r4 weak #5).

Writes <out>/EVAL_FLAGSHIP.json and (only at default args) the round
artifact EVAL_FLAGSHIP_r05.json at the repo root; the artifact embeds the
full args + scene spec so smoke runs are distinguishable.

Usage: python tools/run_flagship.py [--nerf 1600] [--pose 900] [--out out/flagship_r05]
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
    ap.add_argument("--pose", type=int, default=900,
                    help="total pose_only steps (warm distill + selfdistill)")
    ap.add_argument("--pose_warm", type=int, default=300,
                    help="distill-only steps before pose-target generation "
                         "(IPO depth must be sane before the warp descent "
                         "that generates targets CAN use it at test time)")
    ap.add_argument("--scenes", type=int, default=4)
    ap.add_argument("--distill", type=float, default=1.0)
    # The reference's lrate_pose (2e-5, pretrain_ggrt_stable.yaml:38-58) is
    # tuned for 100k+-step schedules; at flagship scale (hundreds of pose
    # steps) it cannot move IPO-Net off its init. 2e-4 is the CPU-rehearsed
    # value (tools/diag_pose_learn_v3.py).
    ap.add_argument("--lrate_pose", type=float, default=2e-4)
    # r4 attempt-1 post-mortem: pred_pose/render_grad feed garbage renders
    # into the loss from an untrained predictor; both default OFF.
    ap.add_argument("--pred_pose", type=int, default=0)
    ap.add_argument("--render_grad", type=int, default=0)
    # r4 matrix: the amortized warp loss is NET HARMFUL (2500 steps diverge
    # to R 112 deg) — OFF; rotations are learned via pose self-distillation.
    ap.add_argument("--sfm_weight", type=float, default=0.0)
    # Weak identity anchor: explosion guard while distillation shifts the
    # shared trunk (r4 attempt 3c: pose_vec_norm ~1.2e6 without it). Kept
    # small so it does not shrink the regressed targets (bias at the
    # selfdistill optimum ~ (anchor/selfdistill)·|target| ~ 0.1%).
    ap.add_argument("--pose_anchor", type=float, default=0.01)
    # Pose self-distillation (config.pose_selfdistill_weight).
    ap.add_argument("--selfdistill", type=float, default=10.0)
    ap.add_argument("--selfdistill_steps", type=int, default=400,
                    help="warp-descent steps per training view when "
                         "generating pose targets")
    ap.add_argument("--selfdistill_rounds", type=int, default=1,
                    help="EM-style rounds: regenerate targets from the "
                         "current predictions (dual-start refinement keeps "
                         "the better basin) and train again; the pose "
                         "budget after warm-up is split across rounds")
    ap.add_argument("--image", type=int, nargs=2, default=(128, 192))
    ap.add_argument("--ceiling", type=int, default=1500,
                    help="overfit-ceiling arm: train a fresh G-3DGS this "
                         "many steps on scene 0 ONLY and report GT-pose "
                         "heldout-view PSNR (0 = skip)")
    ap.add_argument("--out", default="out/flagship_r05")
    ap.add_argument("--eval_limit", type=int, default=None)
    ap.add_argument("--cache_ab", type=int, default=25,
                    help="steps for the gaussian-cache on/off timing (0=skip)")
    ap.add_argument("--artifact", default=None,
                    help="override the repo-root artifact path")
    ap.add_argument("--platform", default="",
                    help="'cpu' forces the host platform (CPU rehearsals "
                         "must not touch the TPU tunnel)")
    args = ap.parse_args()
    defaults = all(
        getattr(args, k) == ap.get_default(k)
        for k in ("nerf", "pose", "pose_warm", "scenes", "distill", "image",
                  "eval_limit", "lrate_pose", "pred_pose", "render_grad",
                  "sfm_weight", "pose_anchor", "selfdistill",
                  "selfdistill_steps", "selfdistill_rounds", "ceiling",
                  "platform")
    )

    import jax

    if args.platform:
        jax.config.update("jax_platforms", args.platform)
        jax.config.update("jax_compilation_cache_dir", "/tmp/jax_test_cache")
    else:
        jax.config.update("jax_compilation_cache_dir", "/tmp/jax_tpu_cache")
        from ggrt_official_tpu.utils.tpu_cache import purge_oversize_entries
        purge_oversize_entries("/tmp/jax_tpu_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

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

    cfg = mod._tiny_cfg()
    cfg.train.use_pred_pose = bool(args.pred_pose)
    cfg.train.pose_render_grad = bool(args.render_grad)
    cfg.train.sfm_valid_mask = True
    cfg.train.sfm_oob_weight = 0.1
    cfg.train.sfm_weight = args.sfm_weight
    cfg.train.pose_anchor_weight = args.pose_anchor
    cfg.train.pose_selfdistill_weight = args.selfdistill
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

    # (scene_idx, view_idx) -> (nv, 6) refined pose targets; filled between
    # stage 2a and 2b. The batch generator attaches them when present —
    # batches without the key compile the exact stage-2a graph.
    targets = {}

    def batches():
        for i in itertools.count():
            si = i % len(train_ds)
            vi = (i // len(train_ds)) % len(train_ds[si])
            b = collate_batch(train_ds[si][vi])
            t = targets.get((si, vi))
            if t is not None:
                b["pose_target"] = t[None]
            yield b

    trainer = GGRtTrainer(cfg)
    t0 = time.perf_counter()
    # Every stage resumes from its own out-dir checkpoints (train_loop
    # saves a final checkpoint on exit): rerunning the SAME command after
    # an interruption — or after an eval-only code change — skips
    # completed training stages and proceeds straight to the evals. A
    # fresh out dir behaves exactly as before.
    # Stage 1: nerf_only.
    train_loop(trainer, batches(), f"{args.out}/stage_nerf",
               n_iters=args.nerf, machine_schedule=lambda s: "nerf_only",
               resume=True)
    # Stage 2a: distill-only pose warm-up (the r4 attempt-3 recipe).
    pose_warm = min(args.pose_warm, args.pose)
    if pose_warm > 0:
        train_loop(trainer, batches(), f"{args.out}/stage_distill",
                   n_iters=pose_warm, machine_schedule=lambda s: "pose_only",
                   resume=True)

    # Self-supervised pose-target generation (teacher-depth warp descent)
    # + selfdistill stage, optionally repeated EM-style: each round
    # regenerates targets starting from the CURRENT predictions (the
    # dual-start refinement keeps whichever basin is lower-loss), so a
    # well-trained round-1 predictor seeds a deeper round-2 descent.
    evaluator = Evaluator(cfg, trainer.state.params)
    target_stats = {"per_view_R_err": [], "seconds": 0.0, "rounds": []}

    def generate_targets():
        tg0 = time.perf_counter()
        errs = []
        for si, d in enumerate(train_ds):
            for vi in range(len(d)):
                braw = collate_batch(d[vi])
                batch = evaluator._prepare_batch(braw)
                ret, _ = evaluator._render(evaluator.params, batch)
                inv = None
                if ret["depth"] is not None:
                    depth = np.asarray(ret["depth"][0, 0])   # (h, w)
                    lo = float(batch["depth_range"][0, 0])
                    hi = float(batch["depth_range"][0, 1])
                    # (1, 1, h, w): the warp loss's (b, 1, h, w) contract
                    # (losses/photometric.py warp_ref_image).
                    inv = 1.0 / np.clip(depth, lo, hi)[None, None]
                vec = evaluator.pose_targets(
                    braw, steps=args.selfdistill_steps, inv_depth=inv
                )
                targets[(si, vi)] = vec
                # Diagnostic only (never trains): how far the refined
                # targets sit from the dataset poses.
                import jax.numpy as jnp

                from ggrt_official_tpu.geometry.se3 import relative_to_source_c2w

                tp = np.asarray(braw["camera"][-16:] if braw["camera"].ndim == 1
                                else braw["camera"][0, -16:]).reshape(4, 4)
                gt = np.asarray(batch["context"]["extrinsics"][0])
                pred = relative_to_source_c2w(
                    jnp.broadcast_to(jnp.asarray(tp), gt.shape), jnp.asarray(vec)
                )
                err = evaluate_camera_alignment(pred, jnp.asarray(gt))
                errs.append(round(float(err["R_error_mean"]), 3))
        target_stats["per_view_R_err"] = errs
        target_stats["seconds"] += round(time.perf_counter() - tg0, 1)
        target_stats["R_err_mean"] = round(float(np.mean(errs)), 4)
        target_stats["rounds"].append(target_stats["R_err_mean"])
        print("pose_targets", json.dumps(
            {k: v for k, v in target_stats.items() if k != "per_view_R_err"}
        ), flush=True)

    if args.pose > pose_warm:
        rounds = max(args.selfdistill_rounds, 1)
        budget = args.pose - pose_warm
        per_round = budget // rounds
        for r in range(rounds):
            if args.selfdistill > 0:
                evaluator.params = trainer.state.params
                generate_targets()
            n_r = per_round if r < rounds - 1 else budget - per_round * (rounds - 1)
            train_loop(trainer, batches(),
                       f"{args.out}/stage_selfdistill{r if r else ''}",
                       n_iters=n_r,
                       machine_schedule=lambda s: "pose_only", resume=True)
    train_s = time.perf_counter() - t0

    evaluator.params = trainer.state.params  # reuse the compiled graphs
    result = {
        "train_steps": n_total,
        "train_s": round(train_s, 1),
        "recipe": f"nerf_only {args.nerf} -> pose_only distill {pose_warm} "
                  f"-> pose targets (warp descent {args.selfdistill_steps} "
                  f"steps, teacher depth) -> selfdistill "
                  f"{args.pose - pose_warm} on {args.scenes} scenes",
        "args": vars(args),
        "scene_spec": dataclasses.asdict(spec(0)),
        "is_default_flagship": defaults,
        "pose_target_stats": target_stats,
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
    # Previous same-out-dir result, read BEFORE this run's first dump
    # overwrites it (used to carry the cache A/B over on resume).
    prev_run = {}
    if out_path.exists():
        try:
            with open(out_path) as f:
                prev_run = json.load(f)
        except (OSError, ValueError):
            prev_run = {}
    out_path.parent.mkdir(parents=True, exist_ok=True)
    artifact = Path(args.artifact) if args.artifact else ROOT / "EVAL_FLAGSHIP_r05.json"

    def sanitize(obj):
        if isinstance(obj, dict):
            return {k: sanitize(v) for k, v in obj.items()}
        if isinstance(obj, list):
            return [sanitize(v) for v in obj]
        if isinstance(obj, float) and not np.isfinite(obj):
            return None
        return obj

    def dump(path, payload):
        with open(path, "w") as f:
            json.dump(sanitize(payload), f, indent=2)

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
            summary = {
                k: (round(float(v), 4) if isinstance(v, float) else v)
                for k, v in summary.items()
                if isinstance(v, (int, float)) or k.startswith("lpips")
            }
            if not pred:
                # VERDICT r4 weak #7: in GT-pose arms the renderer never
                # sees these poses; without the label the GT arm reads as
                # "GT poses have 8 deg error".
                summary["pose_metrics_refer_to"] = (
                    "iponet prediction (unused for rendering in this arm)"
                )
            result[name] = summary
        except Exception as e:  # noqa: BLE001 — keep the other arms' results
            result[name] = {"error": str(e)[-300:]}
        print(name, json.dumps(sanitize(result[name])), flush=True)
        dump(out_path, result)

    # Explicit acceptance-bar verdict (VERDICT r2 #1 bar): computed from
    # the arms so every attempt self-reports PASS/FAIL.
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
    # Checkpoint the bar-carrying artifact NOW: the ceiling/cache stages
    # below take tens of minutes and the round may end (or the tunnel
    # wedge) mid-way — the on-record verdict must not depend on them
    # (VERDICT r4 missing #2: the committed artifact lagged the claims).
    dump(out_path, result)
    if defaults or args.artifact:
        dump(artifact, result)
        print(f"artifact checkpointed after bar: {artifact}", flush=True)

    # Overfit-ceiling arm (VERDICT r4 weak #5): scene-0-only training,
    # GT-pose heldout-view eval — the achievable quality of this scene at
    # this model size, calibrating the generalizable GT-arm number.
    if args.ceiling > 0:
        ceil_trainer = GGRtTrainer(cfg)

        def ceil_batches():
            for i in itertools.count():
                yield collate_batch(train_ds[0][i % len(train_ds[0])])

        train_loop(ceil_trainer, ceil_batches(), f"{args.out}/stage_ceiling",
                   n_iters=args.ceiling,
                   machine_schedule=lambda s: "nerf_only", resume=True)
        ceil_eval = Evaluator(cfg, ceil_trainer.state.params)
        try:
            summary = ceil_eval.evaluate_dataset(
                SyntheticPlanesDataset(spec(0), mode="test", num_source_views=4),
                out_dir=f"{args.out}/eval_ceiling", limit=args.eval_limit,
                use_pred_pose=False, refine_steps=0,
            )
            result["overfit_ceiling_scene0"] = {
                "steps": args.ceiling,
                "psnr": round(float(summary["psnr"]), 4),
                "ssim": round(float(summary["ssim"]), 4),
                "gt_arm_gap_db": round(
                    float(summary["psnr"])
                    - result["heldout_views_gt_pose"].get("psnr", float("nan")),
                    3,
                ),
            }
        except Exception as e:  # noqa: BLE001
            result["overfit_ceiling_scene0"] = {"error": str(e)[-300:]}
        print("overfit_ceiling_scene0",
              json.dumps(sanitize(result["overfit_ceiling_scene0"])), flush=True)

    # Gaussian-cache A/B (VERDICT r2 #8): steady-state per-step wall time
    # with the cross-iteration cache on vs off, same scene stream. A
    # resumed run carries the previous measurement over: the timed graphs
    # depend only on (cfg, scene stream, cache_ab steps), all unchanged
    # under resume, and the cached-trainer compiles alone cost ~30 min
    # through the tunnel.
    prev_cache_ab = None
    if args.cache_ab > 0 and prev_run.get("args", {}).get("cache_ab") == args.cache_ab:
        prev_cache_ab = prev_run.get("cache_ab")
    if prev_cache_ab is not None and "error" not in prev_cache_ab:
        result["cache_ab"] = dict(prev_cache_ab,
                                  carried_from_previous_run=True)
        print("cache_ab (carried over)", json.dumps(result["cache_ab"]),
              flush=True)
    elif args.cache_ab > 0:
        from ggrt_official_tpu.training.trainer_cached import CachedGGRtTrainer

        def timed_steps(tr, tag):
            tr.init_full(collate_batch(train_ds[0][0]))
            tr.state = trainer.state
            seq = [collate_batch(train_ds[0][i % len(train_ds[0])])
                   for i in range(args.cache_ab)]
            # Warm-up pass over the WHOLE sequence: the cached trainer
            # compiles one graph per distinct missing-pair count, so a
            # single-step warm-up leaves compiles inside the timed window.
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

    dump(out_path, result)
    if defaults or args.artifact:
        dump(artifact, result)
        print(f"artifact written: {artifact}", flush=True)
    else:
        print(f"non-default args: artifact NOT written (result at {out_path})",
              flush=True)
    print(json.dumps(sanitize(result), indent=2))


if __name__ == "__main__":
    main()
