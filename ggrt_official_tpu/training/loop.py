"""Training loop driver (BaseTrainer.train() parity).

Parity target: /root/reference/ggrt/base/trainer.py:195-307 — resume from
checkpoint, iterate batches, per-iteration hooks: scalar logging cadence
(n_tensorboard), checkpoint cadence (n_checkpoint), validation cadence
(n_validation) with best-score tracking, and a final checkpoint on exit.

Logging goes to a plain-text log + optional JSONL metrics file (the
reference's tensorboardX/visdom stack is replaced by a host-side metrics
writer; see observability notes in SURVEY.md §5.5).
"""
from __future__ import annotations

import json
import os
import time
from typing import Callable, Iterable, Optional

import jax
import numpy as np

from ..config import GGRtConfig
from .checkpoint import CheckPointManager
from .trainer import GGRtTrainer


class MetricsLogger:
    """Scalar logger: JSONL file + stdout (replaces SummaryWriter)."""

    def __init__(self, out_dir: str):
        os.makedirs(out_dir, exist_ok=True)
        self.path = os.path.join(out_dir, "metrics.jsonl")
        self.log_path = os.path.join(out_dir, "log.txt")

    def log_scalars(self, step: int, scalars: dict):
        record = {"step": int(step), **{k: float(v) for k, v in scalars.items()}}
        with open(self.path, "a") as f:
            f.write(json.dumps(record) + "\n")

    def log_info(self, msg: str):
        line = f"[{time.strftime('%Y-%m-%d %H:%M:%S')}] {msg}"
        print(line, flush=True)
        with open(self.log_path, "a") as f:
            f.write(line + "\n")


def train_loop(
    trainer: GGRtTrainer,
    batches: Iterable[dict],
    out_dir: str,
    n_iters: Optional[int] = None,
    machine_schedule: Optional[Callable[[int], str]] = None,
    validate_fn: Optional[Callable[[GGRtTrainer], float]] = None,
    resume: bool = True,
):
    """Run training with logging/checkpoint cadences from the config.

    `batches` yields collated examples; `machine_schedule(step) -> state`
    defaults to 'joint' (the reference's live configuration,
    train_ggrt_stable.py:91).
    """
    cfg = trainer.cfg
    n_iters = n_iters or cfg.train.n_iters
    logger = MetricsLogger(out_dir)
    ckpt = CheckPointManager(os.path.join(out_dir, "checkpoints"))

    start_step = 0
    it = iter(batches)
    first = next(it)
    if trainer.state is None:
        trainer.init_full(first)

    if resume:
        payload = ckpt.load(cfg.train.ckpt_path)
        if payload is not None:
            trainer.state = _restore_state(trainer.state, payload["state"])
            start_step = payload["step"]
            logger.log_info(f"resumed from step {start_step}")

    logger.log_info(f"training for {n_iters} iterations from {start_step}")
    t_last = time.perf_counter()

    step = start_step
    batch = first
    profiling = False
    try:
        while step < n_iters:
            if cfg.train.profile_dir and step == cfg.train.profile_step:
                jax.profiler.start_trace(cfg.train.profile_dir)
                profiling = True
            machine = (
                machine_schedule(step)
                if machine_schedule
                else getattr(cfg.train, "machine", "joint")
            )
            aux = trainer.train_iteration(batch, machine=machine)
            if profiling and step >= cfg.train.profile_step + 2:
                jax.tree_util.tree_map(
                    lambda x: x.block_until_ready() if hasattr(x, "block_until_ready") else x,
                    aux,
                )
                jax.profiler.stop_trace()
                profiling = False
                logger.log_info(f"profiler trace written to {cfg.train.profile_dir}")
            step += 1

            if step % cfg.train.n_tensorboard == 0:
                scalars = {
                    k: v for k, v in aux.items()
                    if np.ndim(v) == 0
                }
                dt = time.perf_counter() - t_last
                t_last = time.perf_counter()
                scalars["iters_per_s"] = cfg.train.n_tensorboard / dt
                logger.log_scalars(step, scalars)
                logger.log_info(
                    f"step {step}: loss={float(aux['loss_all']):.5f} "
                    f"psnr={float(aux.get('psnr', np.nan)):.2f}"
                )

            if step % cfg.train.n_checkpoint == 0:
                score = None
                if validate_fn is not None and step % cfg.train.n_validation == 0:
                    score = validate_fn(trainer)
                    logger.log_info(f"validation score at {step}: {score}")
                ckpt.save(step, trainer.state, score=score)

            batch = next(it)
    finally:
        # Final checkpoint on exit (BaseTrainer.__del__ parity).
        ckpt.save(step, trainer.state)
    return trainer


def _restore_state(template, loaded):
    """Rebuild the TrainState namedtuple structure from a pickled pytree."""
    import jax
    import jax.numpy as jnp

    flat_t, treedef = jax.tree_util.tree_flatten(template)
    flat_l = jax.tree_util.tree_leaves(loaded)
    assert len(flat_t) == len(flat_l), "checkpoint/model structure mismatch"
    return jax.tree_util.tree_unflatten(
        treedef, [jnp.asarray(l) for l in flat_l]
    )
