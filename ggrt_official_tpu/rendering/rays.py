"""Ray generation for the IBRNet volume-rendering path (pure jnp).

Parity target: /root/reference/ggrt/sample_ray.py (RaySamplerSingleImage):
pixel-corner rays (NO half-pixel offset, matching sample_ray.py:96-97),
34-vector camera parsing, render_stride subsampling.
"""
from __future__ import annotations

import jax.numpy as jnp


def parse_camera(params: jnp.ndarray):
    """(n, 34) -> (W, H, intrinsics (n,4,4), c2w (n,4,4))."""
    h = params[:, 0]
    w = params[:, 1]
    intrinsics = params[:, 2:18].reshape(-1, 4, 4)
    c2w = params[:, 18:34].reshape(-1, 4, 4)
    return w, h, intrinsics, c2w


def get_rays_single_image(h: int, w: int, intrinsics: jnp.ndarray, c2w: jnp.ndarray,
                          render_stride: int = 1):
    """Returns (rays_o, rays_d), each (h*w//stride^2, 3)."""
    u = jnp.arange(0, w, render_stride, dtype=jnp.float32)
    v = jnp.arange(0, h, render_stride, dtype=jnp.float32)
    uu, vv = jnp.meshgrid(u, v)  # xy indexing: (h', w')
    pixels = jnp.stack(
        [uu.reshape(-1), vv.reshape(-1), jnp.ones_like(uu).reshape(-1)], axis=0
    )  # (3, n)
    K = intrinsics[0, :3, :3]
    R = c2w[0, :3, :3]
    rays_d = (R @ jnp.linalg.inv(K) @ pixels).T  # (n, 3) — not normalized (parity)
    rays_o = jnp.broadcast_to(c2w[0, :3, 3], rays_d.shape)
    return rays_o, rays_d
