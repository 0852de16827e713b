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

        # Auto-raise the per-tile capacity on SMALL images (static shapes):
        # with few tiles the configured production cap can sit far below
        # the average per-tile demand gaussians/tiles, and a saturated cap
        # silently starves most pixels of coverage AND gradient (measured:
        # a 32x64 synthetic run stalled at PSNR ~8 with cap 128 vs demand
        # ~2k; raising the cap fixed it — see ROADMAP.md). Threshold < 64
        # tiles: the round-5 128x192 flagship lands on EXACTLY 32 tiles
        # (16x2 of 8x128) and the original `< 32` left every tile at the
        # configured K=128 against ~18k demand — the nerf stage stalled at
        # ~6 dB where 64x96 (8 tiles, auto-raised) reached ~14. At
        # production resolutions (320x448 -> 160 tiles) the configured
        # nearest-K tradeoff and the quality-aware cap policy stand.
        g = gaussians.means.shape[1]
        h, w = image_shape
        num_tiles = max(1, -(-h // raster.tiling.TILE_H) * -(-w // raster.tiling.TILE_W))
        max_per_tile = self.cfg.max_per_tile
        if num_tiles < 64:
            demand = -(-4 * g // num_tiles)
            # Constant compositor-slot budget (128k pair slots total): at 8
            # tiles (64x96) this reproduces the r4 flagship's K=16384
            # exactly; at 32 tiles (128x192) it yields K=4096 — the same
            # total chunk work per render instead of 4x (measured: the
            # uncapped raise ran the 128x192 train step at 3-5 s vs ~1 s at
            # 64x96). Depth-ordered nearest-K plus the early-terminating
            # compositor makes the dropped tail occluded content (r2
            # cap-impact: K=2048 is already 73.6 dB vs uncapped at a far
            # denser population).
            budget_k = max(128, (131072 // num_tiles) // 128 * 128)
            max_per_tile = max(
                max_per_tile, min(-(-demand // 128) * 128, 16384, budget_k)
            )

        kw = dict(
            backend=self.cfg.backend,
            max_dup=self.cfg.max_dup,
            max_per_tile=max_per_tile,
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
