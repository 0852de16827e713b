"""PixelSplat orchestration: pairwise context encoding -> Gaussians -> decode.

Parity target: /root/reference/ggrt/model/pixelsplat/pixelsplat.py
(forward at :127-260, batch_cut at :262-270, Gaussian cache at :177-199).

TPU-first re-design:
  * The reference loops python-side over adjacent view pairs, encoding each
    (2-view) pair separately. Here all pairs are stacked on the batch axis
    and encoded in ONE call — identical math (the encoder never mixes
    batch entries), full MXU utilization.
  * The cross-iteration Gaussian cache is host-level state in the trainer
    (`training/gaussian_cache.py`), not hidden module state: jit-compiled
    functions stay pure.
"""
from __future__ import annotations

from typing import Any, NamedTuple, Optional

import flax.linen as nn
import jax
import jax.numpy as jnp

from ..config import DecoderCfg, EncoderCfg
from .decoder_splatting import DecoderOutput, DecoderSplatting
from .encoder_epipolar import EncoderEpipolar
from .gaussian_adapter import Gaussians


def make_pair_batch(context: dict, order: Optional[jnp.ndarray] = None) -> dict:
    """Stack the v-1 adjacent view pairs onto the batch axis.

    context arrays are (b, v, ...); output arrays are (b*(v-1), 2, ...).
    `order` optionally permutes views first (the reference sorts by frame
    index, pixelsplat.py:177-184); it must be a static-shape index array.
    """
    v = context["image"].shape[1]

    def cut(t):
        if order is not None:
            t = jnp.take(t, order, axis=1)
        pairs = jnp.stack([t[:, k : k + 2] for k in range(v - 1)], axis=1)
        return pairs.reshape(-1, 2, *t.shape[2:])

    return {k: cut(v_) for k, v_ in context.items() if isinstance(v_, jnp.ndarray)}


def merge_pair_gaussians(g: Gaussians, batch: int) -> Gaussians:
    """(b*(v-1), n, ...) -> (b, (v-1)*n, ...)."""

    def m(t):
        return t.reshape(batch, -1, *t.shape[2:])

    return Gaussians(*(m(t) for t in g))


class PixelSplat(nn.Module):
    """Encoder + decoder wrapper. The decoder is parameter-free, so this
    module's params are exactly the encoder's ('gaussian' component in the
    reference checkpoints)."""

    encoder_cfg: EncoderCfg
    decoder_cfg: DecoderCfg

    def setup(self):
        self.encoder = EncoderEpipolar(self.encoder_cfg)
        self.decoder = DecoderSplatting(self.decoder_cfg)

    def encode_pairs(
        self,
        context: dict,
        global_step,
        order: Optional[jnp.ndarray] = None,
        features: Optional[jnp.ndarray] = None,
        crop: Optional[tuple[int, int, int]] = None,
        deterministic: bool = False,
        rng: jax.Array | None = None,
    ) -> Gaussians:
        """Encode all adjacent context pairs into one merged Gaussian set."""
        b, v = context["image"].shape[:2]
        pair_batch = make_pair_batch(context, order)
        pair_feats = None
        if features is not None:
            pair_feats = make_pair_batch({"image": features}, order)["image"]
        g = self.encoder(
            pair_batch, global_step, features=pair_feats, crop=crop,
            deterministic=deterministic, rng=rng,
        )
        return merge_pair_gaussians(g, b)

    def encode_features(self, context: dict, global_step) -> jnp.ndarray:
        """Backbone features only (deferred-BP precompute)."""
        return self.encoder(context, global_step, just_return_features=True)

    def __call__(
        self,
        batch: dict,
        global_step,
        crop: Optional[tuple[int, int, int]] = None,
        features: Optional[jnp.ndarray] = None,
        deterministic: bool = False,
        rng: jax.Array | None = None,
        depth_mode: Optional[str] = "depth",
        gaussians_override: Optional[Gaussians] = None,
    ) -> tuple[dict, dict]:
        """Full forward: encode pairs, decode target views.

        Returns (ret, target_gt) dicts like the reference: ret['rgb'] is
        (b, v_t, 3, h, w), ret['depth'] (b, v_t, h, w).
        """
        target = batch["target"]
        _, _, _, h, w = target["image"].shape
        if gaussians_override is not None:
            gaussians = gaussians_override
        else:
            gaussians = self.encode_pairs(
                batch["context"], global_step, features=features, crop=crop,
                deterministic=deterministic, rng=rng,
            )
        out: DecoderOutput = self.decoder(
            gaussians,
            target["extrinsics"],
            target["intrinsics"],
            target["near"],
            target["far"],
            (h, w),
            depth_mode=depth_mode,
        )
        ret = {"rgb": out.color, "depth": out.depth}
        target_gt = {"rgb": target["image"]}
        return ret, target_gt
