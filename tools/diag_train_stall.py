"""Diagnose the round-2 training stall: tiny cfg, nerf_only, single
synthetic scene on CPU. Prints the loss curve plus gaussian statistics
(opacity/scale/depth distributions) and rendered-image stats every few
steps, to localize whether the encoder emits degenerate gaussians, the
renderer drops them, or gradients vanish.
"""
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import jax

jax.config.update("jax_platforms", "cpu")
import jax.numpy as jnp
import numpy as np

from ggrt_official_tpu.data.datasets import (
    SyntheticPlanesDataset, SyntheticSceneSpec, collate_batch,
)
from ggrt_official_tpu.training.trainer import GGRtTrainer
from tests.test_models import tiny_cfg


def main(n_steps=60):
    cfg = tiny_cfg()
    cfg.train.use_pred_pose = False
    cfg.train.machine = "nerf_only"
    cfg.train.optimizer.warm_up_steps = 50

    ds = SyntheticPlanesDataset(
        SyntheticSceneSpec(n_views=8, image_size=(32, 64)), num_source_views=3
    )
    trainer = GGRtTrainer(cfg)
    batches = [collate_batch(ds[i % len(ds)]) for i in range(8)]
    trainer.init_full(batches[0])

    # Gaussian introspection fn.
    def gauss_stats(params, batch):
        b = trainer.prepare_batch(batch)
        gaussians = trainer.model.apply(
            params, b, 0, deterministic=True, method="encode_gaussians"
        ) if hasattr(trainer.model, "encode_gaussians") else None
        return gaussians

    tgt = np.asarray(batches[0]["target"]["image"])
    print("gt image stats: mean", tgt.mean(), "std", tgt.std())

    for i in range(n_steps):
        aux = trainer.train_iteration(batches[i % len(batches)], machine="nerf_only")
        if i % 10 == 0 or i == n_steps - 1:
            print(
                f"step {i}: loss={float(aux['loss_all']):.4f} "
                f"psnr={float(aux['psnr']):.2f}", flush=True,
            )

    # Render once and compare to GT.
    b = trainer.prepare_batch(batches[0])
    ret, gt = trainer.model.apply(
        trainer.state.params, b, n_steps, deterministic=True,
        method="gaussian_forward",
    )
    pred = np.asarray(ret["rgb"])
    gtv = np.asarray(gt["rgb"])
    print("pred stats: mean", pred.mean(), "std", pred.std(),
          "min", pred.min(), "max", pred.max())
    print("gt   stats: mean", gtv.mean(), "std", gtv.std())
    # Fraction of near-black pixels in prediction.
    print("pred frac<0.05:", float((pred < 0.05).mean()),
          "gt frac<0.05:", float((gtv < 0.05).mean()))


if __name__ == "__main__":
    main()
