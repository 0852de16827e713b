"""Cache-aware generalizable trainer.

Parity target: the reference's cross-iteration Gaussian cache inside
PixelSplat.forward (pixelsplat.py:177-199): per-frame Gaussians are reused
across train iterations (read back detached), so each step only encodes
the pairs whose reference frame newly entered the context window.

JAX re-design: the cache lives on the host (training/gaussian_cache.py);
the jitted step takes (cached gaussians, missing-pair indices) and
  1. runs IPO-Net + sfm loss as usual,
  2. encodes ONLY the missing pairs (static pair count -> one compiled
     variant per distinct miss count; steady state is 1),
  3. concatenates stop-gradient(cached) + fresh gaussians and decodes,
  4. returns the fresh gaussians so the host can insert them.
Gradients flow through the fresh pairs and the decoder only — exactly the
reference's .detach() semantics.
"""
from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..config import GGRtConfig
from ..losses.criterion import img2mse, masked_l2_image_loss, mse2psnr, self_sup_depth_loss
from ..models.gaussian_adapter import Gaussians
from ..models.ggrt import compose_joint_loss
from . import state as state_lib
from .gaussian_cache import GaussianCache
from .trainer import GGRtTrainer, _inject_predicted_poses


class CachedGGRtTrainer(GGRtTrainer):
    def __init__(self, cfg: GGRtConfig, rng: jax.Array | None = None, cache_capacity: int = 32):
        super().__init__(cfg, rng)
        self.cache = GaussianCache(cache_capacity)
        self.hits = 0
        self.misses = 0
        self._cached_step = jax.jit(
            self._cached_step_impl, static_argnames=("machine", "missing_pairs")
        )

    def train_iteration(self, batch: dict, machine: str = "joint"):
        batch = self.prepare_batch(batch)
        if self.state is None:
            raise RuntimeError("call init_full(batch) first")

        index = np.asarray(batch["context"]["index"][0])
        order = np.argsort(index)
        self.cache.evict_unused(index[order[:-1]])

        cached_parts: list[Gaussians] = []
        missing_pairs: list[tuple[int, int]] = []
        missing_keys: list[int] = []
        for k in range(len(order) - 1):
            key = int(index[order[k]])
            g = self.cache.get(key)
            if g is not None:
                self.hits += 1
                cached_parts.append(g)
            else:
                self.misses += 1
                missing_pairs.append((int(order[k]), int(order[k + 1])))
                missing_keys.append(key)

        if cached_parts:
            cached_g = Gaussians(*(jnp.concatenate(ts, axis=1) for ts in zip(*cached_parts)))
        else:
            cached_g = None

        self.rng, step_rng = jax.random.split(self.rng)
        self.state, aux, fresh = self._cached_step(
            self.state, batch, step_rng, cached_g, machine, tuple(missing_pairs)
        )
        for key, g in zip(missing_keys, fresh):
            self.cache.put(key, g)
        return aux

    def _cached_step_impl(
        self,
        state,
        batch: dict,
        rng,
        cached_g: Optional[Gaussians],
        machine: str,
        missing_pairs: tuple,
    ):
        cfg = self.cfg
        with jax.default_matmul_precision(cfg.train.matmul_precision):
            return self._cached_step_body(state, batch, rng, cached_g, machine, missing_pairs)

    def _cached_step_body(self, state, batch, rng, cached_g, machine, missing_pairs):
        cfg = self.cfg
        machine_id = jnp.asarray(state_lib.state_id(machine), jnp.int32)
        min_d = batch["depth_range"][0, 0]
        max_d = batch["depth_range"][0, 1]

        def loss_fn(params):
            inv_depths, rel_poses, sfm, _ = self.model.apply(
                params, batch["rgb"], batch["src_rgbs"],
                batch["camera"], batch["src_cameras"],
                min_d, max_d, compute_sfm_loss=True, method="iponet",
            )
            inv_depth_prior = jax.lax.stop_gradient(inv_depths[-1]).reshape(-1, 1)

            b = batch
            if cfg.train.use_pred_pose:
                b = _inject_predicted_poses(batch, rel_poses)

            fresh: list[Gaussians] = []
            ctx = b["context"]
            for (i, j) in missing_pairs:
                pair = {
                    name: jnp.stack([arr[:, i], arr[:, j]], axis=1)
                    for name, arr in ctx.items()
                }
                g = self.model.apply(
                    params, pair, state.step, deterministic=False,
                    rngs={"sample": jax.random.fold_in(rng, i)},
                    method=lambda m, *a, **kw: m.gaussian.encoder(*a, **kw),
                )
                fresh.append(g)

            parts = ([cached_g] if cached_g is not None else []) + fresh
            gaussians = Gaussians(*(jnp.concatenate(ts, axis=1) for ts in zip(*parts)))

            target = b["target"]
            _, _, _, h, w = target["image"].shape
            out = self.model.apply(
                params, gaussians, target["extrinsics"], target["intrinsics"],
                target["near"], target["far"], (h, w), "depth",
                method=lambda m, *a: m.gaussian.decoder(*a),
            )
            ret = {"rgb": out.color, "depth": out.depth}
            gt = {"rgb": target["image"]}
            coarse_loss = masked_l2_image_loss(ret, gt)

            loss_depth = 0.0
            if cfg.train.use_depth_loss:
                rendered_depth = ret["depth"][0].transpose(1, 2, 0).reshape(-1, 1)
                loss_depth = self_sup_depth_loss(
                    1.0 / inv_depth_prior, rendered_depth, min_d, max_d
                )

            sfm_loss = sfm["loss"]
            loss_all = jnp.where(
                machine_id == state_lib.STATE_JOINT,
                compose_joint_loss(
                    sfm_loss, coarse_loss, state.step, cfg.train.joint_coefficient
                ),
                jnp.where(
                    machine_id == state_lib.STATE_POSE_ONLY,
                    sfm_loss,
                    coarse_loss + jax.lax.stop_gradient(loss_depth) * 0.04,
                ),
            )
            aux = {
                "loss_all": loss_all,
                "gaussian_loss": coarse_loss,
                "sfm_loss": sfm_loss,
                "psnr": mse2psnr(img2mse(ret["rgb"], gt["rgb"])),
            }
            return loss_all, (aux, fresh)

        grads, (aux, fresh) = jax.grad(loss_fn, has_aux=True)(state.params)
        new_state = state_lib.apply_updates(cfg, state, grads, machine_id)
        fresh = jax.lax.stop_gradient(fresh)
        return new_state, aux, fresh
