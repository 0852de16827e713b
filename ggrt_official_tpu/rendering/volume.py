"""Volume rendering for the legacy IBRNet path (pure jnp).

Parity target: /root/reference/ggrt/render_ray.py (sample_along_camera_ray,
sample_pdf importance sampling, raw2outputs alpha compositing, render_rays)
and /root/reference/ggrt/render_image.py (chunked whole-image loop).

The reference's sigma2alpha deliberately ignores sample intervals
(render_ray.py:152-156); we reproduce that.
"""
from __future__ import annotations

from typing import Callable, Optional

import jax
import jax.numpy as jnp


def sample_pdf(key, bins, weights, n_samples, det=False):
    """Inverse-CDF importance sampling (ref render_ray.py:25-73).

    bins (r, m+1), weights (r, m) -> samples (r, n_samples).
    """
    r, m = weights.shape
    weights = weights + 1e-5
    pdf = weights / jnp.sum(weights, axis=-1, keepdims=True)
    cdf = jnp.cumsum(pdf, axis=-1)
    cdf = jnp.concatenate([jnp.zeros_like(cdf[:, :1]), cdf], axis=-1)  # (r, m+1)

    if det:
        u = jnp.broadcast_to(jnp.linspace(0.0, 1.0, n_samples), (r, n_samples))
    else:
        u = jax.random.uniform(key, (r, n_samples))

    above = jnp.sum((u[:, None, :] >= cdf[:, :m, None]).astype(jnp.int32), axis=1)
    below = jnp.clip(above - 1, 0, m)
    above = jnp.clip(above, 0, m)

    cdf_below = jnp.take_along_axis(cdf, below, axis=-1)
    cdf_above = jnp.take_along_axis(cdf, above, axis=-1)
    bins_below = jnp.take_along_axis(bins, below, axis=-1)
    bins_above = jnp.take_along_axis(bins, above, axis=-1)

    denom = cdf_above - cdf_below
    denom = jnp.where(denom < 1e-5, 1.0, denom)
    t = (u - cdf_below) / denom
    return bins_below + t * (bins_above - bins_below)


def sample_along_camera_ray(
    key,
    ray_o, ray_d,
    depth_range,
    n_samples,
    inv_uniform=False,
    det=False,
    inv_depth_prior=None,
):
    """(r, 3) rays -> pts (r, s, 3), z_vals (r, s) (ref render_ray.py:76-133)."""
    near = depth_range[0]
    far = depth_range[1]
    r = ray_d.shape[0]
    i = jnp.arange(n_samples, dtype=ray_d.dtype)

    if inv_uniform:
        start = 1.0 / near
        step = (1.0 / far - start) / (n_samples - 1)
        z_vals = 1.0 / (start + i[None, :] * step)
        z_vals = jnp.broadcast_to(z_vals, (r, n_samples))
    else:
        step = (far - near) / (n_samples - 1)
        z_vals = jnp.broadcast_to(near + i[None, :] * step, (r, n_samples))

    if inv_depth_prior is not None:
        depth_interval = 1.0
        near_p = jnp.clip(1.0 / inv_depth_prior - depth_interval, near, far)  # (r,)
        far_p = jnp.clip(1.0 / inv_depth_prior + depth_interval, near, far)
        start = 1.0 / near_p
        step = (1.0 / far_p - start) / (n_samples - 1)
        z_vals = 1.0 / (start[:, None] + i[None, :] * step[:, None])

    if not det:
        mids = 0.5 * (z_vals[:, 1:] + z_vals[:, :-1])
        upper = jnp.concatenate([mids, z_vals[:, -1:]], axis=-1)
        lower = jnp.concatenate([z_vals[:, :1], mids], axis=-1)
        t_rand = jax.random.uniform(key, z_vals.shape, dtype=z_vals.dtype)
        z_vals = lower + (upper - lower) * t_rand

    pts = z_vals[..., None] * ray_d[:, None, :] + ray_o[:, None, :]
    return pts, z_vals


def raw2outputs(raw, z_vals, mask, white_bkgd=False):
    """Alpha compositing (ref render_ray.py:140-180)."""
    rgb = raw[:, :, :3]
    sigma = raw[:, :, 3]
    alpha = 1.0 - jnp.exp(-sigma)
    T = jnp.cumprod(1.0 - alpha + 1e-10, axis=-1)[:, :-1]
    T = jnp.concatenate([jnp.ones_like(T[:, :1]), T], axis=-1)
    weights = alpha * T
    rgb_map = jnp.sum(weights[..., None] * rgb, axis=1)
    if white_bkgd:
        rgb_map = rgb_map + (1.0 - jnp.sum(weights, axis=-1, keepdims=True))
    mask_out = jnp.sum(mask.astype(jnp.float32), axis=1) > 8
    depth_map = jnp.sum(weights * z_vals, axis=-1)
    return {
        "rgb": rgb_map,
        "depth": depth_map,
        "weights": weights,
        "mask": mask_out,
        "alpha": alpha,
        "z_vals": z_vals,
    }


def render_rays(
    rng,
    ray_batch: dict,
    apply_coarse: Callable,       # (rgb_feat, ray_diff, mask) -> (r, s, 4)
    feat_maps,                    # (coarse (v,hf,wf,d), fine | None)
    n_samples: int,
    inv_uniform: bool = False,
    n_importance: int = 0,
    det: bool = False,
    white_bkgd: bool = False,
    apply_fine: Optional[Callable] = None,
    inv_depth_prior=None,
    rel_poses=None,
):
    """Coarse(+fine) ray rendering (ref render_ray.py:183-269)."""
    from .projector import project_and_gather

    k1, k2, k3 = jax.random.split(rng, 3)
    pts, z_vals = sample_along_camera_ray(
        k1, ray_batch["ray_o"], ray_batch["ray_d"], ray_batch["depth_range"],
        n_samples, inv_uniform=inv_uniform, det=det, inv_depth_prior=inv_depth_prior,
    )

    rgb_feat, ray_diff, mask = project_and_gather(
        pts, ray_batch["camera"], ray_batch["src_rgbs"], ray_batch["src_cameras"],
        feat_maps[0], rel_poses=rel_poses,
    )
    pixel_mask = jnp.sum(mask[..., 0], axis=2) > 1
    raw_coarse = apply_coarse(rgb_feat, ray_diff, mask)
    outputs_coarse = raw2outputs(raw_coarse, z_vals, pixel_mask, white_bkgd)
    ret = {"outputs_coarse": outputs_coarse, "outputs_fine": None}

    if n_importance > 0:
        assert apply_fine is not None
        weights = jax.lax.stop_gradient(outputs_coarse["weights"])
        if inv_uniform:
            inv_z = 1.0 / z_vals
            inv_mid = 0.5 * (inv_z[:, 1:] + inv_z[:, :-1])
            w = weights[:, 1:-1]
            inv_samples = sample_pdf(
                k2, jnp.flip(inv_mid, axis=1), jnp.flip(w, axis=1), n_importance, det=det
            )
            z_samples = 1.0 / inv_samples
        else:
            z_mid = 0.5 * (z_vals[:, 1:] + z_vals[:, :-1])
            z_samples = sample_pdf(k2, z_mid, weights[:, 1:-1], n_importance, det=det)

        z_all = jnp.sort(jnp.concatenate([z_vals, z_samples], axis=-1), axis=-1)
        pts = z_all[..., None] * ray_batch["ray_d"][:, None, :] + ray_batch["ray_o"][:, None, :]
        rgb_feat, ray_diff, mask = project_and_gather(
            pts, ray_batch["camera"], ray_batch["src_rgbs"], ray_batch["src_cameras"],
            feat_maps[1], rel_poses=rel_poses,
        )
        pixel_mask = jnp.sum(mask[..., 0], axis=2) > 1
        raw_fine = apply_fine(rgb_feat, ray_diff, mask)
        ret["outputs_fine"] = raw2outputs(raw_fine, z_all, pixel_mask, white_bkgd)

    return ret


def render_image(
    rng,
    ray_batch_full: dict,
    apply_coarse: Callable,
    feat_maps,
    n_samples: int,
    chunk_size: int = 2048,
    **kwargs,
):
    """Chunked whole-image rendering (ref render_image.py:22-113).

    ray_batch_full carries all rays; chunks are processed under lax.map to
    bound memory. chunk_size is rounded so it divides the ray count (rays
    are padded).
    """
    n_rays = ray_batch_full["ray_o"].shape[0]
    n_chunks = -(-n_rays // chunk_size)
    pad = n_chunks * chunk_size - n_rays

    def pad0(x):
        return jnp.pad(x, [(0, pad)] + [(0, 0)] * (x.ndim - 1))

    rays_o = pad0(ray_batch_full["ray_o"]).reshape(n_chunks, chunk_size, 3)
    rays_d = pad0(ray_batch_full["ray_d"]).reshape(n_chunks, chunk_size, 3)
    keys = jax.random.split(rng, n_chunks)

    def chunk_fn(args):
        key, ro, rd = args
        rb = {**ray_batch_full, "ray_o": ro, "ray_d": rd}
        out = render_rays(
            key, rb, apply_coarse, feat_maps, n_samples, **kwargs
        )["outputs_coarse"]
        return out["rgb"], out["depth"]

    rgb, depth = jax.lax.map(chunk_fn, (keys, rays_o, rays_d))
    return rgb.reshape(-1, 3)[:n_rays], depth.reshape(-1)[:n_rays]
