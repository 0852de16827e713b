"""Does a multi-scale image pyramid widen the photometric pose basin enough
to reach GT from identity? (diag_pose_1d showed the full-res basin only
covers alpha in [0.8, 1.2] of the identity->GT segment — a flat plateau
elsewhere, which is why the round-2 pose stage learned nothing.)

Probes the 1-D identity->GT slice of the loss at pyramid levels 0..3
(avg-pool 2^s) and of the weighted pyramid sum, then runs Adam from
identity on the pyramid loss.

Usage: python tools/diag_pose_pyramid.py
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

from ggrt_official_tpu.data.datasets import SyntheticPlanesDataset
from ggrt_official_tpu.geometry.se3 import pose_from_vec, rotation_distance
from ggrt_official_tpu.losses.photometric import photometric_decay_loss
from tools.diag_pose_landscape import flagship_spec, vec_from_pose


def avg_pool2(x):
    """(.., h, w) -> (.., h/2, w/2) average pooling."""
    h, w = x.shape[-2:]
    return x.reshape(*x.shape[:-2], h // 2, 2, w // 2, 2).mean(axis=(-3, -1))


def main():
    ds = SyntheticPlanesDataset(flagship_spec(), num_source_views=4)
    tgt = int(ds.i_train[len(ds.i_train) // 2])
    srcs = [int(i) for i in ds.i_train if i != tgt][:4]

    image = jnp.asarray(ds.images[tgt].transpose(2, 0, 1))[None]
    ref_imgs = jnp.asarray(ds.images[srcs].transpose(0, 3, 1, 2))
    inv_depth = 1.0 / jnp.asarray(ds.depth_map(tgt))[None, None, None]
    K0 = jnp.asarray(ds.K)[None]

    t_c2w = ds.poses[tgt]
    gt_mats = np.stack([np.linalg.inv(ds.poses[s]) @ t_c2w for s in srcs]).astype(np.float32)
    gt_vec = jnp.asarray(vec_from_pose(gt_mats))

    # Precompute pyramid levels.
    levels = []
    img, refs, invd, K = image, ref_imgs, inv_depth, K0
    for s in range(4):
        ref_Ks = jnp.repeat(K, len(srcs), 0)
        levels.append((img, refs, invd, K, ref_Ks))
        img = avg_pool2(img)
        refs = avg_pool2(refs)
        invd = avg_pool2(invd)
        K = K.at[:, 0, 0].mul(0.5).at[:, 1, 1].mul(0.5)
        K = K.at[:, 0, 2].mul(0.5).at[:, 1, 2].mul(0.5)

    def loss_level(vec, s):
        img, refs, invd, K, ref_Ks = levels[s]
        poses = vec[None, :, None, :]
        return photometric_decay_loss(
            img, refs, invd, K, ref_Ks, poses, automask=True, valid_mask=True
        )["loss"]

    def loss_pyr(vec):
        return sum(loss_level(vec, s) for s in range(4)) / 4.0

    jl = [jax.jit(lambda v, s=s: loss_level(v, s)) for s in range(4)]
    jp = jax.jit(loss_pyr)

    print("alpha:  s0      s1      s2      s3      pyr")
    for a in np.linspace(0.0, 1.25, 21):
        v = gt_vec * float(a)
        vals = [float(f(v)) for f in jl] + [float(jp(v))]
        print(f"  {a:+.3f}: " + "  ".join(f"{x:.5f}" for x in vals))

    def errors(vec):
        M = pose_from_vec(vec)
        r = rotation_distance(M[:, :3, :3], jnp.asarray(gt_mats[:, :3, :3]))
        t = jnp.linalg.norm(M[:, :3, 3] - jnp.asarray(gt_mats[:, :3, 3]), axis=-1)
        return float(jnp.mean(r) * 180 / np.pi), float(jnp.mean(t))

    for lr in (3e-3,):
        opt = optax.adam(lr)

        @jax.jit
        def step(v, s):
            g = jax.grad(loss_pyr)(v)
            u, s = opt.update(g, s, v)
            return optax.apply_updates(v, u), s

        v, s = jnp.zeros_like(gt_vec), opt.init(jnp.zeros_like(gt_vec))
        for it in range(1, 3001):
            v, s = step(v, s)
            if it % 500 == 0:
                r, t = errors(v)
                print(f"pyr lr {lr:g} step {it}: loss {float(jp(v)):.5f} "
                      f"(gt {float(jp(gt_vec)):.5f}) R {r:.3f} t {t:.4f}", flush=True)


if __name__ == "__main__":
    main()
