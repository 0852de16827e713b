import sys, pathlib
sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))
"""Bisect the training NaN: which loss term / param subtree goes non-finite
at which step."""
import importlib.util

import jax

jax.config.update("jax_platforms", "cpu")
import jax.numpy as jnp
import numpy as np

spec = importlib.util.spec_from_file_location(
    "graft_entry", pathlib.Path(__file__).resolve().parent.parent / "__graft_entry__.py"
)
mod = importlib.util.module_from_spec(spec)
spec.loader.exec_module(mod)

from ggrt_official_tpu.data.datasets import (
    SyntheticPlanesDataset, SyntheticSceneSpec, collate_batch,
)
from ggrt_official_tpu.losses.criterion import masked_l2_image_loss
from ggrt_official_tpu.training import state as state_lib
from ggrt_official_tpu.training.trainer import GGRtTrainer, _inject_predicted_poses

cfg = mod._tiny_cfg()
cfg.train.use_depth_loss = False
cfg.train.use_pred_pose = True

ds = SyntheticPlanesDataset(
    SyntheticSceneSpec(n_views=12, image_size=(64, 96)), num_source_views=4
)
trainer = GGRtTrainer(cfg)
batch0 = collate_batch(ds[0])
trainer.init_full(batch0)
model = trainer.model


def split_losses(params, batch, step, rng):
    min_d = batch["depth_range"][0, 0]
    max_d = batch["depth_range"][0, 1]
    inv_depths, rel_poses, sfm, _ = model.apply(
        params, batch["rgb"], batch["src_rgbs"], batch["camera"], batch["src_cameras"],
        min_d, max_d, compute_sfm_loss=True, method="iponet",
    )
    b = _inject_predicted_poses(batch, rel_poses)
    ret, gt = model.apply(
        params, b, step, deterministic=False, rngs={"sample": rng},
        method="gaussian_forward",
    )
    return {
        "sfm": sfm["loss"],
        "rgb": masked_l2_image_loss(ret, gt),
        "photo": sfm["metrics"]["photometric_loss"],
        "smooth": sfm["metrics"].get("smoothness_loss", 0.0),
    }


def tree_nan_report(tree, prefix=""):
    out = []

    def rec(t, path):
        if isinstance(t, dict):
            for k, v in t.items():
                rec(v, path + (k,))
        else:
            arr = np.asarray(t)
            n_bad = int((~np.isfinite(arr)).sum())
            if n_bad:
                out.append(("/".join(path), n_bad, arr.size))

    rec(tree, (prefix,))
    return out


@jax.jit
def grads_of(params, batch, step, rng):
    def total(p):
        l = split_losses(p, batch, step, rng)
        return l["sfm"] * 0.5 + l["rgb"] * 0.5, l

    return jax.grad(total, has_aux=True)(params)


for i in range(25):
    batch = trainer.prepare_batch(collate_batch(ds[i % len(ds)]))
    trainer.rng, rng = jax.random.split(trainer.rng)
    losses = jax.jit(split_losses)(trainer.state.params, batch, trainer.state.step, rng)
    losses = {k: float(v) for k, v in losses.items()}
    g, _ = grads_of(trainer.state.params, batch, trainer.state.step, rng)
    bad = tree_nan_report(g)
    print(f"step {i}: losses={losses} nan_subtrees={len(bad)}", flush=True)
    if bad:
        for path, n, size in bad[:12]:
            print(f"  NAN {path}: {n}/{size}", flush=True)
        # Which loss term's grads are non-finite?
        for term in ("sfm", "rgb"):
            gt_ = jax.jit(
                jax.grad(lambda p: split_losses(p, batch, trainer.state.step, rng)[term])
            )(trainer.state.params)
            bad_t = tree_nan_report(gt_)
            print(f"  term {term}: {len(bad_t)} bad subtrees; first: {bad_t[:3]}", flush=True)
        break
    # do a real optimizer step (same as trainer)
    trainer.state, aux = trainer._train_step(trainer.state, batch, rng, "joint")
    # also check params after update
    bad_p = tree_nan_report(trainer.state.params)
    if bad_p:
        print(f"  params went NaN AFTER update at step {i}: {bad_p[:6]}", flush=True)
        break
