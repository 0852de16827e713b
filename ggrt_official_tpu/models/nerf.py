"""Vanilla NeRF and BARF graph models (flax.linen).

Parity targets: /root/reference/ggrt/model/nerf.py (745 LoC) and barf.py
(346 LoC) — self-contained NeRF with positional-encoding MLP, and BARF's
coarse-to-fine PE annealing + per-camera se(3) pose refinement. The
reference keeps these as a vestigial separate trainer lineage (SURVEY.md
§2.3); here they are compact flax modules sharing the volume renderer.
"""
from __future__ import annotations

from typing import Optional

import flax.linen as nn
import jax
import jax.numpy as jnp

from ..geometry.se3 import se3_exp


def positional_encoding(x: jnp.ndarray, num_freqs: int) -> jnp.ndarray:
    """(..., d) -> (..., d*2*num_freqs) NeRF-style encoding."""
    freqs = 2.0 ** jnp.arange(num_freqs) * jnp.pi
    angles = x[..., None] * freqs  # (..., d, L)
    enc = jnp.stack([jnp.sin(angles), jnp.cos(angles)], axis=-1)
    return enc.reshape(*x.shape[:-1], x.shape[-1] * num_freqs * 2)


def barf_annealing_weights(num_freqs: int, progress) -> jnp.ndarray:
    """BARF coarse-to-fine weights w_k(alpha) (barf.py PE masking):
    w_k = 0 before the band opens, cosine ramp while opening, 1 after."""
    alpha = progress * num_freqs
    k = jnp.arange(num_freqs)
    t = jnp.clip(alpha - k, 0.0, 1.0)
    return (1.0 - jnp.cos(t * jnp.pi)) / 2.0


class NeRFMLP(nn.Module):
    depth: int = 8
    width: int = 256
    num_freqs_xyz: int = 10
    num_freqs_dir: int = 4
    skip_layer: int = 4

    @nn.compact
    def __call__(self, xyz, view_dirs, pe_weights: Optional[jnp.ndarray] = None):
        """xyz (..., 3), view_dirs (..., 3) -> (..., 4) rgb+sigma raw."""
        enc = positional_encoding(xyz, self.num_freqs_xyz)
        if pe_weights is not None:
            # (L,) weights broadcast over the (d, L, 2) encoding layout.
            w = jnp.repeat(jnp.repeat(pe_weights, 2), 3).reshape(3, self.num_freqs_xyz, 2)
            enc = enc * w.reshape(-1)
        h = jnp.concatenate([xyz, enc], axis=-1)
        inp = h
        for i in range(self.depth):
            h = nn.relu(nn.Dense(self.width, name=f"fc{i}")(h))
            if i == self.skip_layer:
                h = jnp.concatenate([h, inp], axis=-1)
        sigma = nn.Dense(1, name="sigma")(h)
        feat = nn.Dense(self.width, name="feat")(h)
        dir_enc = positional_encoding(view_dirs, self.num_freqs_dir)
        h = jnp.concatenate([feat, view_dirs, dir_enc], axis=-1)
        h = nn.relu(nn.Dense(self.width // 2, name="rgb_fc")(h))
        rgb = nn.sigmoid(nn.Dense(3, name="rgb")(h))
        return jnp.concatenate([rgb, nn.relu(sigma)], axis=-1)


class BARFModel(nn.Module):
    """NeRF + learnable per-camera se(3) pose corrections + PE annealing."""

    num_cameras: int
    depth: int = 8
    width: int = 256
    num_freqs_xyz: int = 10

    def setup(self):
        self.nerf = NeRFMLP(
            depth=self.depth, width=self.width, num_freqs_xyz=self.num_freqs_xyz
        )
        self.pose_refine = self.param(
            "pose_refine", nn.initializers.zeros, (self.num_cameras, 6)
        )

    def corrected_pose(self, cam_idx, base_c2w):
        """Apply the learned se(3) correction to a base camera pose."""
        delta = se3_exp(self.pose_refine[cam_idx])
        return base_c2w @ delta

    def __call__(self, xyz, view_dirs, progress=1.0):
        w = barf_annealing_weights(self.num_freqs_xyz, progress)
        return self.nerf(xyz, view_dirs, pe_weights=w)


def render_nerf_rays(
    apply_fn,
    rays_o: jnp.ndarray,
    rays_d: jnp.ndarray,
    near: float,
    far: float,
    n_samples: int = 64,
    rng: jax.Array | None = None,
):
    """Minimal stratified-sampling NeRF renderer used by the nerf/barf path
    (full IBRNet-style rendering lives in rendering/volume.py)."""
    r = rays_o.shape[0]
    t = jnp.linspace(near, far, n_samples)
    z = jnp.broadcast_to(t, (r, n_samples))
    if rng is not None:
        mids = 0.5 * (z[:, 1:] + z[:, :-1])
        upper = jnp.concatenate([mids, z[:, -1:]], axis=-1)
        lower = jnp.concatenate([z[:, :1], mids], axis=-1)
        z = lower + (upper - lower) * jax.random.uniform(rng, z.shape)
    pts = rays_o[:, None] + z[..., None] * rays_d[:, None]
    dirs = jnp.broadcast_to(
        rays_d[:, None] / jnp.linalg.norm(rays_d, axis=-1, keepdims=True)[:, None],
        pts.shape,
    )
    raw = apply_fn(pts, dirs)
    rgb, sigma = raw[..., :3], raw[..., 3]
    dists = jnp.concatenate([z[:, 1:] - z[:, :-1], jnp.full((r, 1), 1e10)], axis=-1)
    alpha = 1.0 - jnp.exp(-sigma * dists)
    T = jnp.cumprod(1.0 - alpha + 1e-10, axis=-1)
    T = jnp.concatenate([jnp.ones((r, 1)), T[:, :-1]], axis=-1)
    weights = alpha * T
    rgb_map = jnp.sum(weights[..., None] * rgb, axis=1)
    depth_map = jnp.sum(weights * z, axis=-1)
    return {"rgb": rgb_map, "depth": depth_map, "weights": weights}
