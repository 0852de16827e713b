"""Coarse-to-fine pose optimization schedule on the multi-octave flagship
scene: optimize the photometric loss at pyramid level 3, then 2, 1, 0
(diag_pose_pyramid showed s3 is globally monotone identity->GT while the
pyramid SUM still plateaus — fine-scale noise swamps the coarse signal).

Also tests a smooth annealed weighting (BARF-style): w_s(t) ramps from
coarse-only to fine-only, which is what the jitted training loss can use
(a weight vector is jit-friendly; a stage switch is not).

Usage: python tools/diag_pose_c2f.py
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
from tools.diag_pose_pyramid import avg_pool2


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

    levels = []
    img, refs, invd, K = image, ref_imgs, inv_depth, K0
    for s in range(4):
        ref_Ks = jnp.repeat(K, len(srcs), 0)
        levels.append((img, refs, invd, K, ref_Ks))
        img, refs, invd = avg_pool2(img), avg_pool2(refs), avg_pool2(invd)
        K = K.at[:, 0, 0].mul(0.5).at[:, 1, 1].mul(0.5)
        K = K.at[:, 0, 2].mul(0.5).at[:, 1, 2].mul(0.5)

    def loss_level(vec, s):
        img, refs, invd, K, ref_Ks = levels[s]
        return photometric_decay_loss(
            img, refs, invd, K, ref_Ks, vec[None, :, None, :],
            automask=True, valid_mask=True,
        )["loss"]

    def errors(vec):
        M = pose_from_vec(vec)
        r = rotation_distance(M[:, :3, :3], jnp.asarray(gt_mats[:, :3, :3]))
        t = jnp.linalg.norm(M[:, :3, 3] - jnp.asarray(gt_mats[:, :3, 3]), axis=-1)
        return float(jnp.mean(r) * 180 / np.pi), float(jnp.mean(t))

    # --- staged schedule ---
    print("=== staged: 600 steps per level 3,2,1,0, adam 3e-3 ===")
    v = jnp.zeros_like(gt_vec)
    for s in (3, 2, 1, 0):
        opt = optax.adam(3e-3)
        st = opt.init(v)

        @jax.jit
        def step(v, st, s=s):
            g = jax.grad(lambda vv: loss_level(vv, s))(v)
            u, st = opt.update(g, st, v)
            return optax.apply_updates(v, u), st

        for _ in range(600):
            v, st = step(v, st)
        r, t = errors(v)
        print(f"after level {s}: loss_s0 {float(loss_level(v, 0)):.5f} "
              f"(gt {float(loss_level(gt_vec, 0)):.5f}) R {r:.3f} t {t:.4f}", flush=True)

    # --- smooth annealed weights (jit-friendly single loss) ---
    print("=== annealed: w_s(t) gaussian bump sliding coarse->fine, 2400 steps ===")

    def loss_anneal(vec, prog):
        # prog in [0,1]; center slides 3 -> 0; sigma 0.75.
        center = 3.0 * (1.0 - prog)
        ws = jnp.exp(-0.5 * ((jnp.arange(4) - center) / 0.75) ** 2)
        ws = ws / jnp.sum(ws)
        return sum(ws[s] * loss_level(vec, s) for s in range(4))

    v = jnp.zeros_like(gt_vec)
    opt = optax.adam(3e-3)
    st = opt.init(v)

    @jax.jit
    def astep(v, st, prog):
        g = jax.grad(loss_anneal)(v, prog)
        u, st = opt.update(g, st, v)
        return optax.apply_updates(v, u), st

    N = 2400
    for it in range(N):
        v, st = astep(v, st, jnp.float32(it / (N - 1)))
        if (it + 1) % 400 == 0:
            r, t = errors(v)
            print(f"step {it+1}: R {r:.3f} t {t:.4f}", flush=True)
    r, t = errors(v)
    print(f"final: loss_s0 {float(loss_level(v, 0)):.5f} "
          f"(gt {float(loss_level(gt_vec, 0)):.5f}) R {r:.3f} t {t:.4f}")


if __name__ == "__main__":
    main()
