"""Multi-chip training step: data-parallel over target views via shard_map.

The reference's distribution layer is DDP over NCCL with batch_size=1 per
GPU (base/trainer.py:115-117, dgaussian.py:32-45). The TPU-native
equivalent: examples stacked on a leading device axis, `shard_map` over the
"dp" mesh axis so each chip trains its own target view, gradients averaged
with `jax.lax.pmean` over ICI, optimizer applied identically everywhere
(replicated state stays bitwise in sync).
"""
from __future__ import annotations

from functools import partial
from typing import Callable

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..config import GGRtConfig
from ..training import state as state_lib


def shard_batch(batch, mesh: Mesh):
    """Place a device-stacked batch (leading axis = dp) on the mesh."""
    sharding = NamedSharding(mesh, P("dp"))

    def put(x):
        return jax.device_put(x, sharding)

    return jax.tree_util.tree_map(put, batch)


def stack_examples(examples: list) -> dict:
    """Stack per-device examples into one batch with a leading dp axis."""
    return jax.tree_util.tree_map(lambda *xs: jnp.stack(xs), *examples)


def make_dp_train_step(
    cfg: GGRtConfig,
    mesh: Mesh,
    loss_fn: Callable,  # (params, local_batch, step, rng) -> (loss, aux)
):
    """Build a jitted data-parallel train step.

    `loss_fn` operates on a single example (the usual batch-of-1 layout);
    the returned step takes a batch whose leaves have a leading dp axis of
    size mesh.shape['dp'] and per-device rngs with the same leading axis.
    """

    def device_step(state: state_lib.TrainState, local_batch, local_rng):
        # Leaves arrive as (1, ...): one example per device.
        squeeze = jax.tree_util.tree_map(lambda x: x[0], local_batch)
        grads, aux = jax.grad(loss_fn, has_aux=True)(
            state.params, squeeze, state.step, local_rng[0]
        )
        grads = jax.lax.pmean(grads, "dp")
        aux = jax.tree_util.tree_map(lambda x: jax.lax.pmean(x, "dp"), aux)
        machine = jnp.asarray(state_lib.STATE_JOINT, jnp.int32)
        new_state = state_lib.apply_updates(cfg, state, grads, machine)
        return new_state, aux

    sharded = jax.shard_map(
        device_step,
        mesh=mesh,
        in_specs=(P(), P("dp"), P("dp")),
        out_specs=(P(), P()),
        check_vma=False,
    )
    return jax.jit(sharded)
