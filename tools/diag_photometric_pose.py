"""Does the photometric (sfm) loss carry usable POSE signal on the
synthetic scenes?

Decomposition experiment: bypass IPO-Net entirely. Take GT depth (from the
plane geometry), initialize the raw 6-DoF relative-pose vectors at
GT + a known perturbation, and run Adam directly on the photometric loss
w.r.t. the pose vectors. If this converges (rotation error -> 0), the
loss/warp plumbing is sound and any pose-learning failure is the
network/recipe; if it diverges, the warp convention or the data is the
problem.

Convention check (geometry/se3.py:175-195): the rel-pose vec encodes
M = inv(source_c2w) @ target_c2w, i.e. target-cam -> source-cam, which is
exactly the Twc the photometric warp consumes (losses/photometric.py:27).
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


def main(n_steps=300, lr=1e-2, rot_pert_deg=5.0, trans_pert=0.15, seed=0,
         binary_alpha=True):
    ds = SyntheticPlanesDataset(
        SyntheticSceneSpec(n_views=8, seed=seed, binary_alpha=binary_alpha)
    )
    tgt = int(ds.i_train[len(ds.i_train) // 2])
    srcs = [int(i) for i in ds.i_train if i != tgt][:3]

    image = jnp.asarray(ds.images[tgt].transpose(2, 0, 1))[None]       # (1,3,h,w)
    ref_imgs = jnp.asarray(ds.images[srcs].transpose(0, 3, 1, 2))      # (nv,3,h,w)
    inv_depth = 1.0 / jnp.asarray(ds.depth_map(tgt))[None, None, None]  # (1,1,1,h,w)
    K = jnp.asarray(ds.K)[None]
    ref_Ks = jnp.repeat(K, len(srcs), 0)

    t_c2w = ds.poses[tgt]
    gt_mats = np.stack([np.linalg.inv(ds.poses[s]) @ t_c2w for s in srcs])
    # GT vecs: rotations are identity in this scene, so euler = 0 and the
    # vec is just the translation part.
    assert np.abs(gt_mats[:, :3, :3] - np.eye(3)).max() < 1e-5
    gt_vec = np.concatenate([gt_mats[:, :3, 3], np.zeros((len(srcs), 3))], -1)

    rng = np.random.RandomState(1)
    pert = np.concatenate(
        [
            rng.uniform(-trans_pert, trans_pert, (len(srcs), 3)),
            rng.uniform(-1, 1, (len(srcs), 3)) * np.deg2rad(rot_pert_deg),
        ],
        -1,
    )
    vec0 = jnp.asarray((gt_vec + pert).astype(np.float32))

    def loss_fn(vec):
        poses = vec[None, :, None, :]  # (1, nv, n_iters=1, 6)
        out = photometric_decay_loss(
            image, ref_imgs, inv_depth, K, ref_Ks, poses, automask=False
        )
        return out["loss"]

    def errors(vec):
        M = pose_from_vec(vec)
        r = rotation_distance(M[:, :3, :3], jnp.asarray(gt_mats[:, :3, :3]))
        t = jnp.linalg.norm(M[:, :3, 3] - jnp.asarray(gt_mats[:, :3, 3]), axis=-1)
        return float(jnp.mean(r) * 180 / np.pi), float(jnp.mean(t))

    opt = optax.adam(lr)
    state = opt.init(vec0)
    vec = vec0

    @jax.jit
    def update(v, s):
        g = jax.grad(loss_fn)(v)
        upd, s2 = opt.update(g, s, v)
        return optax.apply_updates(v, upd), s2

    r0, t0 = errors(vec)
    print(f"step 0: loss {float(loss_fn(vec)):.5f} R_err {r0:.3f} deg t_err {t0:.4f}")
    print(f"loss at GT poses: {float(loss_fn(jnp.asarray(gt_vec, jnp.float32))):.5f}")
    for i in range(1, n_steps + 1):
        vec, state = update(vec, state)
        if i % 50 == 0:
            r, t = errors(vec)
            print(f"step {i}: loss {float(loss_fn(vec)):.5f} R_err {r:.3f} deg t_err {t:.4f}")


if __name__ == "__main__":
    main()
