"""Train state: two optimizers + two schedules + state machine (optax).

Parity target: train_ggrt_stable.py:43-66 —
  * gaussian optimizer: Adam(lr) with linear warm-up over warm_up_steps
    (torch LinearLR from 1/warm_up to 1);
  * pose optimizer: Adam(lrate_pose) with StepLR(gamma=0.5) every
    lrate_decay_pose_steps;
  * checkpoint component keys 'pose_learner' / 'gaussian'.

The reference's requires_grad state machine (dgaussian.py:89-111) becomes
gradient masking: 'pose_only' zeroes gaussian grads, 'nerf_only' zeroes
pose grads, 'joint' keeps both.
"""
from __future__ import annotations

from typing import Any, NamedTuple

import jax
import jax.numpy as jnp
import optax

from ..config import GGRtConfig

STATE_POSE_ONLY = 0
STATE_NERF_ONLY = 1
STATE_JOINT = 2

_STATE_NAMES = {"pose_only": STATE_POSE_ONLY, "nerf_only": STATE_NERF_ONLY, "joint": STATE_JOINT}


def state_id(name: str) -> int:
    return _STATE_NAMES[name]


class TrainState(NamedTuple):
    step: jnp.ndarray
    params: Any                 # {'pose_learner': ..., 'gaussian': ...}
    gaussian_opt_state: Any
    pose_opt_state: Any


def _with_clip(cfg: GGRtConfig, opt: optax.GradientTransformation):
    clip = cfg.train.optimizer.grad_clip_norm
    if clip and clip > 0:
        return optax.chain(optax.clip_by_global_norm(clip), opt)
    return opt


def gaussian_optimizer(cfg: GGRtConfig) -> optax.GradientTransformation:
    warm = max(cfg.train.optimizer.warm_up_steps, 1)
    schedule = optax.linear_schedule(
        init_value=cfg.train.optimizer.lr / warm,
        end_value=cfg.train.optimizer.lr,
        transition_steps=warm,
    )
    return _with_clip(cfg, optax.adam(schedule))


def pose_optimizer(cfg: GGRtConfig) -> optax.GradientTransformation:
    steps = max(cfg.train.lrate_decay_pose_steps, 1)
    schedule = optax.exponential_decay(
        init_value=cfg.train.lrate_pose,
        transition_steps=steps,
        decay_rate=cfg.train.lrate_decay_factor,
        staircase=True,
    )
    return _with_clip(cfg, optax.adam(schedule))


def split_params(params):
    """Split the joint model params into (pose_learner, gaussian) subtrees."""
    inner = params["params"]
    return {"params": {"pose_learner": inner["pose_learner"]}}, {
        "params": {"gaussian": inner["gaussian"]}
    }


def create_train_state(cfg: GGRtConfig, params) -> TrainState:
    pose_p, gauss_p = split_params(params)
    return TrainState(
        step=jnp.zeros((), jnp.int32),
        params=params,
        gaussian_opt_state=gaussian_optimizer(cfg).init(gauss_p),
        pose_opt_state=pose_optimizer(cfg).init(pose_p),
    )


def apply_updates(
    cfg: GGRtConfig,
    state: TrainState,
    grads,
    machine_state: jnp.ndarray,  # int scalar (STATE_*)
) -> TrainState:
    """Apply both optimizers with state-machine gradient gating."""
    pose_g, gauss_g = split_params(grads)
    pose_p, gauss_p = split_params(state.params)

    pose_on = (machine_state == STATE_POSE_ONLY) | (machine_state == STATE_JOINT)
    gauss_on = (machine_state == STATE_NERF_ONLY) | (machine_state == STATE_JOINT)

    def gate(g, on):
        return jax.tree_util.tree_map(lambda x: x * on.astype(x.dtype), g)

    pose_updates, pose_opt = pose_optimizer(cfg).update(
        gate(pose_g, pose_on), state.pose_opt_state, pose_p
    )
    gauss_updates, gauss_opt = gaussian_optimizer(cfg).update(
        gate(gauss_g, gauss_on), state.gaussian_opt_state, gauss_p
    )

    new_pose = optax.apply_updates(pose_p, pose_updates)
    new_gauss = optax.apply_updates(gauss_p, gauss_updates)
    new_params = {
        "params": {
            "pose_learner": new_pose["params"]["pose_learner"],
            "gaussian": new_gauss["params"]["gaussian"],
        }
    }
    return TrainState(
        step=state.step + 1,
        params=new_params,
        gaussian_opt_state=gauss_opt,
        pose_opt_state=pose_opt,
    )
