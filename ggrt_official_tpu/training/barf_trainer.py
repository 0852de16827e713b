"""Standalone NeRF/BARF trainer lineage (parity surface of the reference's
self-contained graph-model trainers in /root/reference/ggrt/model/nerf.py:1-745
and barf.py:1-346 — coarse-to-fine PE annealing, joint pose refinement, and
test-time pose optimization — marked vestigial there but part of the
component inventory, SURVEY.md §2.3).

TPU-first re-design: one jitted ray-batch train step (static shapes, rays
pre-sampled on host), annealing progress passed as a traced scalar so a
single compiled step serves the whole schedule, and test-time pose
optimization as a second jitted step that freezes the field and descends a
single se(3) delta — the reference's `barf.py` per-scene `evaluate` inner
loop re-built as a pure function.
"""
from __future__ import annotations

from dataclasses import dataclass

import jax
import jax.numpy as jnp
import optax

from ..geometry.se3 import se3_exp
from ..models.nerf import BARFModel, render_nerf_rays


@dataclass
class BARFTrainConfig:
    num_cameras: int = 8
    depth: int = 4
    width: int = 64
    num_freqs_xyz: int = 6
    n_samples: int = 32
    near: float = 1.0
    far: float = 8.0
    lr: float = 5e-4
    lr_pose: float = 1e-3
    # BARF schedule: annealing progress ramps 0 -> 1 over this fraction of
    # training (reference barf.py c2f schedule).
    anneal_start: float = 0.1
    anneal_end: float = 0.5


class BARFTrainer:
    """Joint field + per-camera pose training over ray batches."""

    def __init__(self, cfg: BARFTrainConfig, rng: jax.Array | None = None):
        self.cfg = cfg
        self.rng = rng if rng is not None else jax.random.PRNGKey(0)
        self.model = BARFModel(
            num_cameras=cfg.num_cameras, depth=cfg.depth, width=cfg.width,
            num_freqs_xyz=cfg.num_freqs_xyz,
        )
        self.params = None
        self.opt = optax.multi_transform(
            {
                "field": optax.adam(cfg.lr),
                "pose": optax.adam(cfg.lr_pose),
            },
            lambda params: jax.tree_util.tree_map_with_path(
                lambda path, _: "pose"
                if any(getattr(k, "key", None) == "pose_refine" for k in path)
                else "field",
                params,
            ),
        )
        self.opt_state = None
        self._pose_opt = optax.adam(cfg.lr_pose)
        self._step = jax.jit(self._step_impl)
        self._pose_step = jax.jit(self._pose_step_impl)

    def progress(self, step: int, n_iters: int) -> float:
        c = self.cfg
        x = (step / max(n_iters, 1) - c.anneal_start) / max(
            c.anneal_end - c.anneal_start, 1e-6
        )
        return float(min(max(x, 0.0), 1.0))

    def init(self, example_rays_o, example_rays_d):
        self.rng, k = jax.random.split(self.rng)
        self.params = self.model.init(
            k, example_rays_o[:, None, :], example_rays_d[:, None, :]
        )
        self.opt_state = self.opt.init(self.params)

    # -- joint training -----------------------------------------------------
    def _render(self, params, rays_o, rays_d, cam_idx, base_c2w, progress, rng):
        """Rays are given in each camera's LOCAL frame; the (learned-corrected)
        pose maps them to world — pose gradients flow through the transform."""
        c2w = self.model.apply(params, cam_idx, base_c2w, method="corrected_pose")
        R, t = c2w[..., :3, :3], c2w[..., :3, 3]
        o_w = (R @ rays_o[..., None])[..., 0] + t
        d_w = (R @ rays_d[..., None])[..., 0]
        fn = lambda pts, dirs: self.model.apply(params, pts, dirs, progress)
        return render_nerf_rays(
            fn, o_w, d_w, self.cfg.near, self.cfg.far, self.cfg.n_samples, rng
        )

    def _step_impl(self, params, opt_state, batch, progress, rng):
        def loss_fn(p):
            out = self._render(
                p, batch["rays_o"], batch["rays_d"], batch["cam_idx"],
                batch["base_c2w"], progress, rng,
            )
            return jnp.mean((out["rgb"] - batch["rgb"]) ** 2)

        loss, grads = jax.value_and_grad(loss_fn)(params)
        updates, opt_state = self.opt.update(grads, opt_state, params)
        params = optax.apply_updates(params, updates)
        return params, opt_state, loss

    def train_step(self, batch: dict, step: int, n_iters: int) -> float:
        self.rng, k = jax.random.split(self.rng)
        self.params, self.opt_state, loss = self._step(
            self.params, self.opt_state, batch,
            jnp.float32(self.progress(step, n_iters)), k,
        )
        return float(loss)

    # -- test-time pose optimization (reference barf.py eval protocol) ------
    def _pose_step_impl(self, delta, pose_opt_state, params, rays_o, rays_d,
                        rgb_gt, base_c2w):
        def loss_fn(d):
            c2w = base_c2w @ se3_exp(d)
            R, t = c2w[:3, :3], c2w[:3, 3]
            o_w = (R @ rays_o[..., None])[..., 0] + t
            d_w = (R @ rays_d[..., None])[..., 0]
            fn = lambda pts, dirs: self.model.apply(params, pts, dirs, 1.0)
            out = render_nerf_rays(
                fn, o_w, d_w, self.cfg.near, self.cfg.far, self.cfg.n_samples
            )
            return jnp.mean((out["rgb"] - rgb_gt) ** 2)

        loss, g = jax.value_and_grad(loss_fn)(delta)
        updates, pose_opt_state = self._pose_opt.update(g, pose_opt_state, delta)
        return optax.apply_updates(delta, updates), pose_opt_state, loss

    def optimize_test_pose(
        self,
        rays_o: jnp.ndarray,
        rays_d: jnp.ndarray,
        rgb_gt: jnp.ndarray,
        base_c2w: jnp.ndarray,
        n_steps: int = 50,
    ):
        """Freeze the field, fit a se(3) correction for an unseen camera.

        Returns (corrected_c2w, per-step losses)."""
        delta = jnp.zeros(6)
        state = self._pose_opt.init(delta)
        losses = []
        params = jax.lax.stop_gradient(self.params)
        for _ in range(n_steps):
            delta, state, loss = self._pose_step(
                delta, state, params, rays_o, rays_d, rgb_gt, base_c2w
            )
            losses.append(float(loss))
        return base_c2w @ se3_exp(delta), losses
