"""A/B the pose-stage depth distillation (config.pose_depth_distill) on CPU.

The staged flagship recipe is nerf_only pretrain -> pose_only finetune.
Commit c9ae028 added distillation of the frozen gaussian render's depth
into the IPO-Net iterates because pose_only alone left the photometric
warp operating on init-garbage depth.  This script validates the fix
cheaply: tiny model, one synthetic scene, stage-1 nerf_only, then stage-2
pose_only with distill weight {0, w}, printing the R/t error trend for
both arms from the SAME stage-1 state.

Usage: python tools/diag_pose_distill.py [--nerf 300] [--pose 200] [--w 1.0]
"""
import argparse
import copy
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import jax

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_compilation_cache_dir", "/tmp/jax_test_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
import jax.numpy as jnp
import numpy as np

from ggrt_official_tpu.data.datasets import (
    SyntheticPlanesDataset, SyntheticSceneSpec, collate_batch,
)
from ggrt_official_tpu.geometry.se3 import relative_to_source_c2w
from ggrt_official_tpu.evaluation.metrics import evaluate_pose_errors
from ggrt_official_tpu.training.trainer import GGRtTrainer
from tests.test_models import tiny_cfg


def pose_errors(trainer, batch):
    b = trainer.prepare_batch(batch)
    min_d, max_d = b["depth_range"][0, 0], b["depth_range"][0, 1]
    _, rel_poses, _, _ = trainer.model.apply(
        trainer.state.params, b["rgb"], b["src_rgbs"], b["camera"],
        b["src_cameras"], min_d, max_d, compute_sfm_loss=False,
        method="iponet",
    )
    target_pose = b["camera"][0, -16:].reshape(4, 4)
    nv = b["src_cameras"].shape[1]
    pred_c2w = relative_to_source_c2w(
        jnp.broadcast_to(target_pose, (nv, 4, 4)), rel_poses[:, -1, :]
    )
    gt_c2w = b["context"]["extrinsics"][0]
    err = evaluate_pose_errors(pred_c2w, gt_c2w)
    return (
        float(err.get("R_error_mean", err.get("R_err", np.nan))),
        float(err.get("t_error_mean", err.get("t_err", np.nan))),
    )


def run_pose_stage(cfg, stage1_state, rng, batches, n_steps, tag):
    trainer = GGRtTrainer(cfg, rng=rng)
    trainer.init_full(batches[0])
    trainer.state = stage1_state
    r0, t0 = pose_errors(trainer, batches[0])
    print(f"[{tag}] step 0: R_err {r0:.2f} deg  t_err {t0:.4f}", flush=True)
    for s in range(1, n_steps + 1):
        aux = trainer.train_iteration(batches[s % len(batches)], machine="pose_only")
        if s % 25 == 0:
            r, t = pose_errors(trainer, batches[0])
            extra = (
                f" distill {float(aux['pose_distill_loss']):.4f}"
                if "pose_distill_loss" in aux else ""
            )
            print(
                f"[{tag}] step {s}: sfm {float(aux['sfm_loss']):.4f}{extra} "
                f"R_err {r:.2f} deg  t_err {t:.4f}",
                flush=True,
            )
    return pose_errors(trainer, batches[0])


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--nerf", type=int, default=300)
    ap.add_argument("--pose", type=int, default=200)
    ap.add_argument("--w", type=float, default=1.0)
    ap.add_argument("--lrate_pose", type=float, default=2e-4)
    args = ap.parse_args()

    cfg = tiny_cfg()
    cfg.train.use_pred_pose = False
    cfg.train.lrate_pose = args.lrate_pose
    cfg.train.optimizer.warm_up_steps = 20

    ds = SyntheticPlanesDataset(
        SyntheticSceneSpec(n_views=8, image_size=(32, 64)), num_source_views=3
    )
    batches = [collate_batch(ds[i % len(ds)]) for i in range(8)]

    trainer = GGRtTrainer(cfg)
    trainer.init_full(batches[0])
    print(f"stage 1: nerf_only x {args.nerf}", flush=True)
    for s in range(1, args.nerf + 1):
        aux = trainer.train_iteration(batches[s % len(batches)], machine="nerf_only")
        if s % 50 == 0:
            print(f"  step {s}: psnr {float(aux['psnr']):.2f}", flush=True)
    stage1_state = trainer.state

    cfg_off = copy.deepcopy(cfg)
    cfg_off.train.pose_depth_distill = 0.0
    r_off, t_off = run_pose_stage(
        cfg_off, stage1_state, jax.random.PRNGKey(7), batches, args.pose, "distill OFF"
    )

    cfg_on = copy.deepcopy(cfg)
    cfg_on.train.pose_depth_distill = args.w
    r_on, t_on = run_pose_stage(
        cfg_on, stage1_state, jax.random.PRNGKey(7), batches, args.pose, f"distill {args.w}"
    )

    print(f"\nfinal: OFF R_err {r_off:.2f} t {t_off:.4f} | "
          f"ON R_err {r_on:.2f} t {t_on:.4f}")


if __name__ == "__main__":
    main()
