"""Epipolar transformer (flax.linen, NHWC).

Parity targets:
  * /root/reference/ggrt/model/pixelsplat/encoder/epipolar/epipolar_transformer.py
  * .../image_self_attention.py

Each (downscaled) pixel token cross-attends to `num_samples` features
sampled along its epipolar segments in the other context views, with the
samples' triangulated depths positionally encoded into the keys/values.
The feed-forward is convolutional with a patch-token image self-attention.
"""
from __future__ import annotations

from functools import partial

import flax.linen as nn
import jax
import jax.numpy as jnp

from ..config import EpipolarTransformerCfg, ImageSelfAttentionCfg
from ..geometry.depth import depth_to_relative_disparity
from ..geometry.epipolar import get_depth
from .epipolar_sampler import EpipolarSampling, collect_other_views, sample_epipolar
from .transformer import Attention, PositionalEncoding, Transformer


class ImageSelfAttention(nn.Module):
    """Patch-token self-attention over the image (ref image_self_attention.py)."""

    cfg: ImageSelfAttentionCfg
    d_out: int
    # The reference computes the positional encoding but NEVER adds it to
    # the tokens (image_self_attention.py:75-80 — `xy` is dead after the
    # projection). Default False reproduces that for checkpoint parity;
    # True enables the (intended) addition for from-scratch training.
    add_positional_encoding: bool = False

    @nn.compact
    def __call__(self, image: jnp.ndarray) -> jnp.ndarray:
        # image: (b, h, w, c)
        c = self.cfg
        tokens = nn.Conv(
            c.d_token, (c.patch_size, c.patch_size),
            strides=(c.patch_size, c.patch_size), name="patch_embedder",
        )(image)
        tokens = nn.relu(tokens)
        b, nh, nw, _ = tokens.shape

        # Positional encoding of patch-center xy in (0, 1). The projection
        # layer always exists so converted checkpoints line up.
        pe = PositionalEncoding(c.num_octaves)
        x = (jnp.arange(nw) + 0.5) / nw
        y = (jnp.arange(nh) + 0.5) / nh
        yy, xx = jnp.meshgrid(y, x, indexing="ij")
        xy = jnp.stack([xx, yy], axis=-1)
        pos = nn.Dense(c.d_token, name="pos_proj")(pe(xy))

        if self.add_positional_encoding:
            tokens = tokens + pos[None]
        tokens = tokens.reshape(b, nh * nw, c.d_token)
        tokens = Transformer(
            c.d_token, c.num_layers, c.num_heads, c.d_dot, c.d_mlp, name="transformer"
        )(tokens)
        tokens = tokens.reshape(b, nh, nw, c.d_token)
        return nn.ConvTranspose(
            self.d_out, (c.patch_size, c.patch_size),
            strides=(c.patch_size, c.patch_size), name="resampler",
        )(tokens)


class ConvFeedForward(nn.Module):
    """Conv feed-forward + image self-attention (ref epipolar_transformer.py:184-213).

    Operates on flattened pixel tokens; `h`, `w`, `bv` kwargs restore the
    image layout.
    """

    self_attention: ImageSelfAttentionCfg
    d_in: int
    d_hidden: int

    @nn.compact
    def __call__(self, x: jnp.ndarray, bv: int, h: int, w: int) -> jnp.ndarray:
        # x: (bv*h*w, 1, c)
        img = x.reshape(bv, h, w, self.d_in)
        img = ImageSelfAttention(self.self_attention, self.d_in, name="self_attn")(img) + img
        img = nn.Conv(self.d_hidden, (7, 7), name="conv1")(img)
        img = nn.gelu(img)
        img = nn.Conv(self.d_in, (7, 7), name="conv2")(img)
        return img.reshape(bv * h * w, 1, self.d_in)


class EpipolarTransformer(nn.Module):
    cfg: EpipolarTransformerCfg
    d_in: int

    @nn.compact
    def __call__(
        self,
        features: jnp.ndarray,     # (b, v, h, w, c)
        extrinsics: jnp.ndarray,   # (b, v, 4, 4)
        intrinsics: jnp.ndarray,   # (b, v, 3, 3)
        near: jnp.ndarray,         # (b, v)
        far: jnp.ndarray,          # (b, v)
        rays: tuple | None = None,
        token_slice: tuple | None = None,
    ) -> tuple[jnp.ndarray, EpipolarSampling]:
        """Returns refined features (b, v, h, w, c) and the sampling record.

        `rays`/`token_slice` implement the crop path for deferred BP
        (ref :135-154): epipolar sampling & attention restricted to a tile
        while the sampled *source* features remain full-resolution.
        """
        c = self.cfg
        b, v, h, w, ch = features.shape

        down = features
        if c.downscale:
            down = nn.Conv(
                self.d_in, (c.downscale, c.downscale),
                strides=(c.downscale, c.downscale), name="downscaler",
            )(features.reshape(b * v, h, w, ch)).reshape(
                b, v, h // c.downscale, w // c.downscale, self.d_in
            )
        hd, wd = down.shape[2], down.shape[3]

        sampling = sample_epipolar(
            down, extrinsics, intrinsics, near, far, c.num_samples, rays=rays
        )

        if c.num_octaves > 0:
            depths = get_depth(
                sampling.origins[:, :, None, :, None],
                sampling.directions[:, :, None, :, None],
                sampling.xy_sample,
                collect_other_views(extrinsics)[:, :, :, None, None],
                collect_other_views(intrinsics)[:, :, :, None, None],
            )
            depths = jnp.maximum(depths, near[..., None, None, None])
            depths = jnp.minimum(depths, far[..., None, None, None])
            depths = depth_to_relative_disparity(
                depths, near[..., None, None, None], far[..., None, None, None]
            )
            pe = PositionalEncoding(c.num_octaves)
            depth_enc = nn.Dense(self.d_in, name="depth_proj")(pe(depths[..., None]))
            kv = sampling.features + depth_enc
        else:
            kv = sampling.features

        # Queries: the (cropped) downscaled pixel tokens; keys/values: the
        # epipolar samples for that pixel (ov == 1 in the pairwise setup).
        if token_slice is not None:
            # (y0, x0) may be traced; (hq, wq) are static sizes.
            (y0, x0, hq, wq) = token_slice
            q_tokens = jax.lax.dynamic_slice(
                down, (0, 0, y0, x0, 0), (b, v, hq, wq, down.shape[-1])
            )
        else:
            q_tokens = down
            hq, wq = hd, wd

        r = kv.shape[3]
        assert r == hq * wq, f"ray/token mismatch: {r} vs {hq}x{wq}"
        q = q_tokens.reshape(b * v * hq * wq, 1, self.d_in)
        # (b, v, ov, r, s, c) -> queries attend over ov*s samples.
        s = kv.shape[4]
        kv_flat = kv.transpose(0, 1, 3, 2, 4, 5).reshape(
            b * v * hq * wq, (v - 1) * s, self.d_in
        )

        ff = partial(
            ConvFeedForward, self.cfg.self_attention, self.d_in, c.d_mlp
        )
        out = Transformer(
            self.d_in, c.num_layers, c.num_heads, c.d_dot, c.d_mlp,
            selfatt=False, kv_dim=self.d_in, feed_forward_factory=ff,
            name="transformer",
        )(q, z=kv_flat, bv=b * v, h=hq, w=wq)
        out = out.reshape(b, v, hq, wq, self.d_in)

        if c.downscale:
            up = nn.ConvTranspose(
                self.d_in, (c.downscale, c.downscale),
                strides=(c.downscale, c.downscale), name="upscaler",
            )(out.reshape(b * v, hq, wq, self.d_in))
            refined = nn.Conv(self.d_in * 2, (7, 7), name="refine1")(up)
            refined = nn.gelu(refined)
            refined = nn.Conv(self.d_in, (7, 7), name="refine2")(refined)
            out = (up + refined).reshape(b, v, hq * c.downscale, wq * c.downscale, self.d_in)

        return out, sampling
