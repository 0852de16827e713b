"""Validate the pose_only stage recipe on CPU before spending TPU time.

Trains the tiny model with machine=pose_only on one synthetic scene and
prints the IPO-Net rotation/translation error trend (predicted source
c2w vs dataset extrinsics, the same protocol the Evaluator uses). The
stage-2 flagship plan (nerf_only pretrain -> pose_only finetune -> eval
with predicted poses) only makes sense if this curve goes DOWN.
"""
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


def main(n_steps=120, lrate_pose=2e-4):
    cfg = tiny_cfg()
    cfg.train.use_pred_pose = False
    cfg.train.machine = "pose_only"
    cfg.train.lrate_pose = lrate_pose
    cfg.train.optimizer.warm_up_steps = 20

    ds = SyntheticPlanesDataset(
        SyntheticSceneSpec(n_views=8, image_size=(32, 64)), num_source_views=3
    )
    trainer = GGRtTrainer(cfg)
    batches = [collate_batch(ds[i % len(ds)]) for i in range(8)]
    trainer.init_full(batches[0])

    r0, t0 = pose_errors(trainer, batches[0])
    print(f"step 0: R_err {r0:.2f} deg  t_err {t0:.4f}")
    for s in range(1, n_steps + 1):
        aux = trainer.train_iteration(batches[s % len(batches)], machine="pose_only")
        if s % 20 == 0:
            r, t = pose_errors(trainer, batches[0])
            print(
                f"step {s}: sfm_loss {float(aux['sfm_loss']):.4f} "
                f"R_err {r:.2f} deg  t_err {t:.4f}"
            )


if __name__ == "__main__":
    main()
