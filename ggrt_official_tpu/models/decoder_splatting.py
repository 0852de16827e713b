"""Splatting decoder: Gaussians + target cameras -> images/depths.

Parity target: /root/reference/ggrt/model/pixelsplat/decoder/
decoder_splatting_cuda.py. Flattens (batch, view) into the rasterizer's
batch axis; black background.
"""
from __future__ import annotations

from typing import NamedTuple, Optional

import jax.numpy as jnp

from ..config import DecoderCfg
from ..ops.rasterizer import api as raster
from .gaussian_adapter import Gaussians


class DecoderOutput(NamedTuple):
    color: jnp.ndarray           # (b, v, 3, h, w)
    depth: Optional[jnp.ndarray]  # (b, v, h, w) or None


class DecoderSplatting:
    """Stateless decoder (no parameters — plain callable, not a flax module)."""

    def __init__(self, cfg: DecoderCfg):
        self.cfg = cfg

    def __call__(
        self,
        gaussians: Gaussians,
        extrinsics: jnp.ndarray,  # (b, v, 4, 4)
        intrinsics: jnp.ndarray,  # (b, v, 3, 3)
        near: jnp.ndarray,        # (b, v)
        far: jnp.ndarray,         # (b, v)
        image_shape: tuple[int, int],
        depth_mode: Optional[str] = None,
    ) -> DecoderOutput:
        b, v = extrinsics.shape[:2]
        flat = lambda t: t.reshape(b * v, *t.shape[2:])
        rep = lambda t: jnp.repeat(t, v, axis=0)  # b g ... -> (b v) g ...

        kw = dict(
            backend=self.cfg.backend,
            max_dup=self.cfg.max_dup,
            max_per_tile=self.cfg.max_per_tile,
        )
        color = raster.render(
            flat(extrinsics), flat(intrinsics), flat(near), flat(far),
            image_shape, jnp.zeros((b * v, 3), dtype=extrinsics.dtype),
            rep(gaussians.means), rep(gaussians.covariances),
            rep(gaussians.harmonics), rep(gaussians.opacities),
            tile_chunk=self.cfg.tile_chunk, **kw,
        )
        color = color.reshape(b, v, *color.shape[1:])

        depth = None
        if depth_mode is not None:
            depth = raster.render_depth(
                flat(extrinsics), flat(intrinsics), flat(near), flat(far),
                image_shape,
                rep(gaussians.means), rep(gaussians.covariances), rep(gaussians.opacities),
                mode=depth_mode, **kw,
            )
            depth = depth.reshape(b, v, *depth.shape[1:])
        return DecoderOutput(color=color, depth=depth)
