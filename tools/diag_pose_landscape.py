"""Pose-landscape study of the photometric loss on the FLAGSHIP scene spec.

Round-2 failure (VERDICT.md Weak #1): the pose stage left sfm_loss flat and
translations drifted to ~17 units (identity baseline: 0.25). Root-cause
hypothesis (diag_photometric_pose.py already showed the optimum is not at
GT on the simpler arc scene): zeros-padding warps compare out-of-frame
pixels against black — poses that push pixels out of frame are REWARDED
wherever the target is dark, and once out of frame the automask hides the
warp (zero pose gradient) so translations random-walk.

This tool optimizes raw 6-DoF pose vecs directly (GT depth, no network) on
the flagship SyntheticSceneSpec (look_at + wobble + binary alpha) and
compares loss variants:

  base       automask=True,  valid_mask=False   (reference parity)
  mask       automask=True,  valid_mask=True
  mask_noam  automask=False, valid_mask=True

from two inits: identity pose (what IPO-Net starts at) and GT+perturbation.
A variant is usable for the flagship iff from identity it converges to
R_err well under the wobble scale and t_err -> ~0, AND loss(GT) is at/near
the found minimum.

Usage: python tools/diag_pose_landscape.py [--steps 400] [--lr 1e-2]
"""
import argparse
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import jax

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_compilation_cache_dir", "/tmp/jax_test_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
import jax.numpy as jnp
import numpy as np
import optax

from ggrt_official_tpu.data.datasets import SyntheticPlanesDataset, SyntheticSceneSpec
from ggrt_official_tpu.geometry.se3 import pose_from_vec, rotation_distance
from ggrt_official_tpu.losses.photometric import photometric_decay_loss


def vec_from_pose(M):
    """Inverse of pose_from_vec for |y|<pi/2: euler xyz from R = Rx@Ry@Rz."""
    M = np.asarray(M)
    y = np.arcsin(np.clip(M[..., 0, 2], -1, 1))
    x = np.arctan2(-M[..., 1, 2], M[..., 2, 2])
    z = np.arctan2(-M[..., 0, 1], M[..., 0, 0])
    return np.concatenate(
        [M[..., :3, 3], np.stack([x, y, z], -1)], -1
    ).astype(np.float32)


def flagship_spec(seed=0, texture_octaves=4):
    return SyntheticSceneSpec(
        n_views=12, image_size=(64, 96), seed=seed, binary_alpha=True,
        look_at_z=4.0, rot_wobble_deg=6.0, arc_scale=1.4,
        texture_octaves=texture_octaves,
    )


def run(name, loss_kwargs, vec0, gt_mats, data, steps, lr):
    image, ref_imgs, inv_depth, K, ref_Ks = data

    def loss_fn(vec):
        poses = vec[None, :, None, :]
        return photometric_decay_loss(
            image, ref_imgs, inv_depth, K, ref_Ks, poses, **loss_kwargs
        )["loss"]

    def errors(vec):
        M = pose_from_vec(vec)
        r = rotation_distance(M[:, :3, :3], jnp.asarray(gt_mats[:, :3, :3]))
        t = jnp.linalg.norm(M[:, :3, 3] - jnp.asarray(gt_mats[:, :3, 3]), axis=-1)
        return float(jnp.mean(r) * 180 / np.pi), float(jnp.mean(t))

    gt_vec = jnp.asarray(vec_from_pose(gt_mats))
    l_gt = float(loss_fn(gt_vec))
    opt = optax.adam(lr)
    state = opt.init(vec0)

    @jax.jit
    def step(v, s):
        g = jax.grad(loss_fn)(v)
        updates, s = opt.update(g, s, v)
        return optax.apply_updates(v, updates), s
    vec = vec0
    r0, t0 = errors(vec)
    print(f"[{name}] loss(GT)={l_gt:.5f} loss(init)={float(loss_fn(vec)):.5f} "
          f"init R_err {r0:.3f} t_err {t0:.4f}", flush=True)
    for s in range(1, steps + 1):
        vec, state = step(vec, state)
        if s % (steps // 4) == 0:
            r, t = errors(vec)
            print(f"[{name}] step {s}: loss {float(loss_fn(vec)):.5f} "
                  f"R_err {r:.3f} deg t_err {t:.4f}", flush=True)
    r, t = errors(vec)
    return {"loss_gt": l_gt, "loss_final": float(loss_fn(vec)), "R": r, "t": t}


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--steps", type=int, default=400)
    ap.add_argument("--lr", type=float, default=1e-2)
    ap.add_argument("--rot_pert_deg", type=float, default=3.0)
    ap.add_argument("--trans_pert", type=float, default=0.1)
    args = ap.parse_args()

    ds = SyntheticPlanesDataset(flagship_spec(), num_source_views=4)
    tgt = int(ds.i_train[len(ds.i_train) // 2])
    srcs = [int(i) for i in ds.i_train if i != tgt][:4]

    image = jnp.asarray(ds.images[tgt].transpose(2, 0, 1))[None]
    ref_imgs = jnp.asarray(ds.images[srcs].transpose(0, 3, 1, 2))
    inv_depth = 1.0 / jnp.asarray(ds.depth_map(tgt))[None, None, None]
    K = jnp.asarray(ds.K)[None]
    ref_Ks = jnp.repeat(K, len(srcs), 0)
    data = (image, ref_imgs, inv_depth, K, ref_Ks)

    t_c2w = ds.poses[tgt]
    gt_mats = np.stack([np.linalg.inv(ds.poses[s]) @ t_c2w for s in srcs]).astype(np.float32)

    rng = np.random.RandomState(1)
    gt_vec = vec_from_pose(gt_mats)
    # Round-trip check: the euler extraction must reproduce the matrices.
    assert np.abs(np.asarray(pose_from_vec(jnp.asarray(gt_vec))) - gt_mats).max() < 1e-5
    pert = np.concatenate(
        [rng.uniform(-args.trans_pert, args.trans_pert, (len(srcs), 3)),
         rng.uniform(-1, 1, (len(srcs), 3)) * np.deg2rad(args.rot_pert_deg)], -1)

    inits = {
        "identity": jnp.zeros((len(srcs), 6), jnp.float32),
        "gt+pert": jnp.asarray((gt_vec + pert).astype(np.float32)),
    }
    variants = {
        "base": dict(automask=True, valid_mask=False),
        "mask": dict(automask=True, valid_mask=True),
        "mask_noam": dict(automask=False, valid_mask=True),
    }
    results = {}
    for vname, kw in variants.items():
        for iname, v0 in inits.items():
            results[f"{vname}/{iname}"] = run(
                f"{vname}/{iname}", kw, v0, gt_mats, data, args.steps, args.lr
            )
    print("\n=== summary (final R_err deg / t_err; loss_final vs loss_gt) ===")
    for k, r in results.items():
        print(f"{k:20s} R {r['R']:7.3f}  t {r['t']:7.4f}  "
              f"loss {r['loss_final']:.5f} (gt {r['loss_gt']:.5f})")


if __name__ == "__main__":
    main()
