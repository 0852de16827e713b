"""1-D photometric-loss landscape: interpolate pose vecs identity -> GT
(and beyond) on the flagship scene, GT depth. If GT is the global min of
the slice and there is no barrier, pose learning is an optimization
problem (lr / conditioning); if there IS a barrier or the min is offset,
the loss/data need changing (texture, baseline, multi-scale).

Also sweeps Adam lr from both inits with the valid-mask variant.

Usage: python tools/diag_pose_1d.py
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
import optax

from ggrt_official_tpu.data.datasets import SyntheticPlanesDataset, SyntheticSceneSpec
from ggrt_official_tpu.geometry.se3 import pose_from_vec, rotation_distance
from ggrt_official_tpu.losses.photometric import photometric_decay_loss
from tools.diag_pose_landscape import flagship_spec, vec_from_pose


def main():
    ds = SyntheticPlanesDataset(flagship_spec(), num_source_views=4)
    tgt = int(ds.i_train[len(ds.i_train) // 2])
    srcs = [int(i) for i in ds.i_train if i != tgt][:4]

    image = jnp.asarray(ds.images[tgt].transpose(2, 0, 1))[None]
    ref_imgs = jnp.asarray(ds.images[srcs].transpose(0, 3, 1, 2))
    inv_depth = 1.0 / jnp.asarray(ds.depth_map(tgt))[None, None, None]
    K = jnp.asarray(ds.K)[None]
    ref_Ks = jnp.repeat(K, len(srcs), 0)

    t_c2w = ds.poses[tgt]
    gt_mats = np.stack([np.linalg.inv(ds.poses[s]) @ t_c2w for s in srcs]).astype(np.float32)
    gt_vec = jnp.asarray(vec_from_pose(gt_mats))

    def loss_fn(vec, **kw):
        poses = vec[None, :, None, :]
        return photometric_decay_loss(
            image, ref_imgs, inv_depth, K, ref_Ks, poses,
            automask=True, valid_mask=True, **kw,
        )["loss"]

    jloss = jax.jit(loss_fn)
    print("alpha (0=identity, 1=GT, >1 overshoot): loss")
    for a in np.linspace(-0.25, 1.5, 29):
        v = gt_vec * float(a)
        print(f"  {a:+.3f}: {float(jloss(v)):.5f}")

    # lr sweep from identity and GT+pert
    rng = np.random.RandomState(1)
    pert = np.concatenate(
        [rng.uniform(-0.1, 0.1, (len(srcs), 3)),
         rng.uniform(-1, 1, (len(srcs), 3)) * np.deg2rad(3.0)], -1).astype(np.float32)
    inits = {"identity": jnp.zeros_like(gt_vec), "gt+pert": gt_vec + jnp.asarray(pert)}

    def errors(vec):
        M = pose_from_vec(vec)
        r = rotation_distance(M[:, :3, :3], jnp.asarray(gt_mats[:, :3, :3]))
        t = jnp.linalg.norm(M[:, :3, 3] - jnp.asarray(gt_mats[:, :3, 3]), axis=-1)
        return float(jnp.mean(r) * 180 / np.pi), float(jnp.mean(t))

    for lr in (3e-3, 1e-3):
        for iname, v0 in inits.items():
            opt = optax.adam(lr)

            @jax.jit
            def step(v, s):
                g = jax.grad(loss_fn)(v)
                u, s = opt.update(g, s, v)
                return optax.apply_updates(v, u), s

            v, s = v0, opt.init(v0)
            for _ in range(2000):
                v, s = step(v, s)
            r, t = errors(v)
            print(f"lr {lr:g} {iname:9s}: loss {float(jloss(v)):.5f} "
                  f"(gt {float(jloss(gt_vec)):.5f}) R {r:.3f} t {t:.4f}")


if __name__ == "__main__":
    main()
