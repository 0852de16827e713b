"""Basin validation for the teacher-render pose loss (round 4).

Loads the trained flagship checkpoint (out/flagship_r04, attempt 2 —
G-3DGS half healthy, 11.6 dB GT-pose arm), then DIRECT-optimizes raw
6-vec relative poses from identity against config.pose_teacher_weight's
loss: render the context views at the candidate cameras from the frozen
teacher field, L2 vs the real context images. If this basin reaches
R << identity from an identity start, the loss is a usable IPO-Net
training signal (the sweep then tests the amortized version); if not,
the signal dies at the rasterizer and no recipe built on it can work.

Also prints, for comparison, the photometric-warp basin from the same
start (the signal the r4 attempts relied on).

Usage: python tools/diag_pose_teacher.py [--steps 400] [--lr 1e-2]
"""
from __future__ import annotations

import argparse
import sys
from pathlib import Path

ROOT = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(ROOT))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--ckpt_dir", default="out/flagship_r04/checkpoints")
    ap.add_argument("--steps", type=int, default=400)
    ap.add_argument("--lr", type=float, default=1e-2)
    ap.add_argument("--image", type=int, nargs=2, default=(64, 96))
    ap.add_argument("--cpu", action="store_true")
    ap.add_argument("--only", nargs="*", default=None,
                    help="basins to run: teacher warp")
    ap.add_argument("--automask", type=int, default=1,
                    help="warp-basin automask on/off (off = dense gradient "
                         "on static scenes; refinement candidate)")
    args = ap.parse_args()

    import jax

    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_compilation_cache_dir", "/tmp/jax_tpu_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    import jax.numpy as jnp
    import numpy as np
    import optax

    from ggrt_official_tpu.data.datasets import (
        SyntheticPlanesDataset, collate_batch, flagship_scene_spec,
    )
    from ggrt_official_tpu.geometry.alignment import evaluate_camera_alignment
    from ggrt_official_tpu.geometry.se3 import relative_to_source_c2w
    from ggrt_official_tpu.training.checkpoint import CheckPointManager
    from ggrt_official_tpu.training.loop import _restore_state
    from ggrt_official_tpu.training.trainer import GGRtTrainer

    import importlib.util

    spec_mod = importlib.util.spec_from_file_location(
        "graft_entry", ROOT / "__graft_entry__.py"
    )
    mod = importlib.util.module_from_spec(spec_mod)
    spec_mod.loader.exec_module(mod)

    cfg = mod._tiny_cfg()
    ds = SyntheticPlanesDataset(
        flagship_scene_spec(seed=0, image_size=tuple(args.image)),
        num_source_views=4,
    )
    batch = collate_batch(ds[0])

    trainer = GGRtTrainer(cfg)
    trainer.init_full(batch)
    payload = CheckPointManager(args.ckpt_dir).load()
    assert payload is not None, f"no checkpoint under {args.ckpt_dir}"
    trainer.state = _restore_state(trainer.state, payload["state"])
    print(f"loaded step {payload['step']} from {args.ckpt_dir}", flush=True)

    b = trainer.prepare_batch(batch)
    params = trainer.state.params
    target_pose = b["camera"][0, -16:].reshape(4, 4)
    gt_c2w = b["context"]["extrinsics"][0]
    nv = gt_c2w.shape[0]

    def errs(vec):
        pred = relative_to_source_c2w(
            jnp.broadcast_to(target_pose, (nv, 4, 4)), vec
        )
        e = evaluate_camera_alignment(pred, gt_c2w)
        return float(e["R_error_mean"]), float(e["t_error_mean"])

    def teacher_loss(vec):
        pred = relative_to_source_c2w(
            jnp.broadcast_to(target_pose, (nv, 4, 4)), vec
        )
        rend = trainer.model.apply(
            params, b, pred[None], jnp.asarray(0),
            method="pose_teacher_render",
        )
        return jnp.mean((rend - b["context"]["image"]) ** 2)

    def warp_loss(vec):
        from ggrt_official_tpu.losses.photometric import photometric_decay_loss

        inv_depths, _, _, _ = trainer.model.apply(
            params, b["rgb"], b["src_rgbs"], b["camera"], b["src_cameras"],
            b["depth_range"][0, 0], b["depth_range"][0, 1],
            compute_sfm_loss=False, method="iponet",
        )
        tgt = b["rgb"].transpose(0, 3, 1, 2)
        refs = b["src_rgbs"][0].transpose(0, 3, 1, 2)
        K = b["context"]["intrinsics"][0, 0] * 1.0
        Kpix = jnp.array(
            [[K[0, 0] * args.image[1], 0, K[0, 2] * args.image[1]],
             [0, K[1, 1] * args.image[0], K[1, 2] * args.image[0]],
             [0, 0, 1.0]]
        )[None]
        return photometric_decay_loss(
            tgt, refs, inv_depths[-1][None], Kpix,
            jnp.broadcast_to(Kpix, (nv, 3, 3)), vec[None, :, None, :],
            valid_mask=True, oob_weight=0.1, automask=bool(args.automask),
        )["loss"]

    def warp_ds_loss(state):
        """Joint pose + depth-correction refinement: the warp basin floor
        (~4.1 deg with IPO depth vs 2.2 with GT depth) is depth-bias
        limited, and a wrong depth SCALE displaces the photometric optimum
        (scaled translations, residual R). Co-optimize a log-scale and
        shift on the predicted inverse depth."""
        vec, log_s, shift = state
        from ggrt_official_tpu.losses.photometric import photometric_decay_loss

        inv_depths, _, _, _ = trainer.model.apply(
            params, b["rgb"], b["src_rgbs"], b["camera"], b["src_cameras"],
            b["depth_range"][0, 0], b["depth_range"][0, 1],
            compute_sfm_loss=False, method="iponet",
        )
        inv_adj = inv_depths[-1] * jnp.exp(log_s) + shift
        tgt = b["rgb"].transpose(0, 3, 1, 2)
        refs = b["src_rgbs"][0].transpose(0, 3, 1, 2)
        K = b["context"]["intrinsics"][0, 0] * 1.0
        Kpix = jnp.array(
            [[K[0, 0] * args.image[1], 0, K[0, 2] * args.image[1]],
             [0, K[1, 1] * args.image[0], K[1, 2] * args.image[0]],
             [0, 0, 1.0]]
        )[None]
        return photometric_decay_loss(
            tgt, refs, inv_adj[None], Kpix,
            jnp.broadcast_to(Kpix, (nv, 3, 3)), vec[None, :, None, :],
            valid_mask=True, oob_weight=0.1, automask=bool(args.automask),
        )["loss"]

    if args.only and "warp_ds" in args.only:
        import optax

        state0 = (jnp.zeros((nv, 6), jnp.float32), jnp.zeros(()), jnp.zeros(()))
        opt = optax.adam(args.lr)

        @jax.jit
        def step_ds(state, st):
            g = jax.grad(warp_ds_loss)(state)
            u, st = opt.update(g, st, state)
            return optax.apply_updates(state, u), st

        st = opt.init(state0)
        state = state0
        r0, t0 = errs(state[0])
        print(f"[warp_ds] start R {r0:.3f} t {t0:.4f} "
              f"loss {float(warp_ds_loss(state)):.5f}", flush=True)
        for s in range(1, args.steps + 1):
            state, st = step_ds(state, st)
            if s % max(args.steps // 8, 1) == 0:
                r, t = errs(state[0])
                print(f"[warp_ds {s}] R {r:.3f} t {t:.4f} "
                      f"log_s {float(state[1]):.3f} shift {float(state[2]):.4f} "
                      f"loss {float(warp_ds_loss(state)):.5f}", flush=True)

    basins = (("teacher", teacher_loss), ("warp", warp_loss))
    if args.only:
        basins = tuple(b for b in basins if b[0] in args.only)
    for name, loss_fn in basins:
        vec = jnp.zeros((nv, 6), jnp.float32)
        opt = optax.adam(args.lr)

        @jax.jit
        def step_fn(vec, st):
            g = jax.grad(loss_fn)(vec)
            u, st = opt.update(g, st, vec)
            return optax.apply_updates(vec, u), st

        st = opt.init(vec)
        r0, t0 = errs(vec)
        print(f"[{name}] start R {r0:.3f} t {t0:.4f} "
              f"loss {float(loss_fn(vec)):.5f}", flush=True)
        for s in range(1, args.steps + 1):
            vec, st = step_fn(vec, st)
            if s % max(args.steps // 8, 1) == 0:
                r, t = errs(vec)
                print(f"[{name} {s}] R {r:.3f} t {t:.4f} "
                      f"loss {float(loss_fn(vec)):.5f}", flush=True)


if __name__ == "__main__":
    main()
