"""Transformer primitives (flax.linen).

Functional parity targets:
  * /root/reference/ggrt/model/pixelsplat/transformer/{transformer,attention,
    feed_forward,pre_norm}.py (srt-derived stack)
  * /root/reference/ggrt/model/pixelsplat/encodings/positional_encoding.py

Re-designed for TPU: channels-last layouts, bfloat16-friendly matmuls (XLA
picks MXU tiles), no dropout-on-inference codepaths baked in.
"""
from __future__ import annotations

from typing import Callable, Optional

import flax.linen as nn
import jax.numpy as jnp


class PositionalEncoding(nn.Module):
    """Octave sin/cos encoding of values in [0, 1] (ref positional_encoding.py)."""

    num_octaves: int

    def __call__(self, samples: jnp.ndarray) -> jnp.ndarray:
        octaves = jnp.arange(self.num_octaves, dtype=samples.dtype)
        freqs = 2.0 * jnp.pi * 2.0**octaves  # (f,)
        phases = jnp.array([0.0, 0.5 * jnp.pi], dtype=samples.dtype)  # (p,)
        # (..., d) -> (..., d, f, p) -> (..., d*f*p)
        angle = samples[..., None, None] * freqs[:, None] + phases[None, :]
        out = jnp.sin(angle)
        return out.reshape(*samples.shape[:-1], samples.shape[-1] * self.num_octaves * 2)

    def d_out(self, dimensionality: int) -> int:
        return self.num_octaves * 2 * dimensionality


class Attention(nn.Module):
    """Multi-head attention; cross-attention when `selfatt=False` (ref attention.py)."""

    dim: int
    heads: int = 8
    dim_head: int = 64
    selfatt: bool = True
    kv_dim: Optional[int] = None

    @nn.compact
    def __call__(self, x: jnp.ndarray, z: Optional[jnp.ndarray] = None) -> jnp.ndarray:
        inner = self.heads * self.dim_head
        if self.selfatt:
            qkv = nn.Dense(inner * 3, use_bias=False, name="to_qkv")(x)
            q, k, v = jnp.split(qkv, 3, axis=-1)
        else:
            q = nn.Dense(inner, use_bias=False, name="to_q")(x)
            kv = nn.Dense(inner * 2, use_bias=False, name="to_kv")(z)
            k, v = jnp.split(kv, 2, axis=-1)

        def split_heads(t):
            b, n, _ = t.shape
            return t.reshape(b, n, self.heads, self.dim_head).transpose(0, 2, 1, 3)

        q, k, v = map(split_heads, (q, k, v))
        dots = jnp.einsum("bhnd,bhmd->bhnm", q, k) * (self.dim_head**-0.5)
        attn = nn.softmax(dots, axis=-1)
        # Observability tap (encoder visualizer): no-op unless the caller
        # passes mutable=["intermediates"] to .apply().
        self.sow("intermediates", "attn", attn)
        out = jnp.einsum("bhnm,bhmd->bhnd", attn, v)
        b, h, n, d = out.shape
        out = out.transpose(0, 2, 1, 3).reshape(b, n, h * d)
        if not (self.heads == 1 and self.dim_head == self.dim):
            out = nn.Dense(self.dim, name="to_out")(out)
        return out


class FeedForward(nn.Module):
    dim: int
    hidden_dim: int

    @nn.compact
    def __call__(self, x: jnp.ndarray, **_) -> jnp.ndarray:
        x = nn.Dense(self.hidden_dim)(x)
        x = nn.gelu(x)
        return nn.Dense(self.dim)(x)


class Transformer(nn.Module):
    """Pre-norm transformer; `feed_forward_factory` lets the epipolar
    transformer substitute its conv feed-forward (ref transformer.py:32-70)."""

    dim: int
    depth: int
    heads: int
    dim_head: int
    mlp_dim: int
    selfatt: bool = True
    kv_dim: Optional[int] = None
    feed_forward_factory: Optional[Callable[[], nn.Module]] = None

    @nn.compact
    def __call__(self, x: jnp.ndarray, z: Optional[jnp.ndarray] = None, **ff_kwargs) -> jnp.ndarray:
        for i in range(self.depth):
            attn_in = nn.LayerNorm(name=f"attn_norm_{i}")(x)
            x = x + Attention(
                self.dim, self.heads, self.dim_head, self.selfatt, self.kv_dim,
                name=f"attn_{i}",
            )(attn_in, z=z)
            ff_in = nn.LayerNorm(name=f"ff_norm_{i}")(x)
            if self.feed_forward_factory is None:
                ff = FeedForward(self.dim, self.mlp_dim, name=f"ff_{i}")
            else:
                ff = self.feed_forward_factory(name=f"ff_{i}")  # type: ignore[call-arg]
            x = x + ff(ff_in, **ff_kwargs)
        return x
