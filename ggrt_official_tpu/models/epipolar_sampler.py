"""Epipolar sampling: project each pixel's ray into the other context views
and bilinearly sample features along the clipped epipolar segment.

Parity targets:
  * /root/reference/ggrt/model/pixelsplat/encoder/epipolar/epipolar_sampler.py
  * /root/reference/ggrt/misc/heterogeneous_pairings.py

Pure functions (no parameters); the heterogeneous "all other views" index
bookkeeping is precomputed as static numpy arrays so the gathers trace to
plain XLA gathers.
"""
from __future__ import annotations

from typing import NamedTuple

import jax.numpy as jnp
import numpy as np

from ..geometry.epipolar import project_rays
from ..geometry.projection import get_world_rays, sample_image_grid
from ..ops.grid_sample import grid_sample


def generate_heterogeneous_index(n: int) -> tuple[np.ndarray, np.ndarray]:
    """(index_self, index_other), each (n, n-1): all pairs except self."""
    arange = np.arange(n)
    index_self = np.repeat(arange[:, None], n - 1, axis=1)
    index_other = np.repeat(arange[None, :], n, axis=0) + np.triu(np.ones((n, n), dtype=np.int64))
    return index_self, index_other[:, :-1]


def generate_heterogeneous_index_transpose(n: int) -> tuple[np.ndarray, np.ndarray]:
    """Index pair that transposes (view, other_view) tensors (ref :27-44)."""
    arange = np.arange(n)
    ones = np.ones((n, n), dtype=np.int64)
    index_self = np.repeat(arange[None, :], n, axis=0) + np.triu(ones)
    index_other = np.repeat(arange[:, None], n, axis=1) - (1 - np.triu(ones))
    return index_self[:, :-1], index_other[:, :-1]


class EpipolarSampling(NamedTuple):
    features: jnp.ndarray        # (b, v, ov, r, s, c)
    valid: jnp.ndarray           # (b, v, ov, r)
    xy_ray: jnp.ndarray          # (b, v, r, 2)
    xy_sample: jnp.ndarray       # (b, v, ov, r, s, 2)
    xy_sample_near: jnp.ndarray  # (b, v, ov, r, s, 2)
    xy_sample_far: jnp.ndarray   # (b, v, ov, r, s, 2)
    origins: jnp.ndarray         # (b, v, r, 3)
    directions: jnp.ndarray      # (b, v, r, 3)


def collect_other_views(x: jnp.ndarray) -> jnp.ndarray:
    """(b, v, ...) -> (b, v, v-1, ...): for each view, all other views."""
    v = x.shape[1]
    _, index_other = generate_heterogeneous_index(v)
    return x[:, jnp.asarray(index_other)]


def transpose_other_views(x: jnp.ndarray) -> jnp.ndarray:
    """Swap 'view the ray came from' and 'view samples are drawn from'."""
    v = x.shape[1]
    t_v, t_ov = generate_heterogeneous_index_transpose(v)
    return x[:, jnp.asarray(t_v), jnp.asarray(t_ov)]


def generate_image_rays(
    image_shape: tuple[int, int],
    extrinsics: jnp.ndarray,
    intrinsics: jnp.ndarray,
):
    """Per-pixel world rays for every view (ref epipolar_sampler.py:136-156).

    Returns xy (b, v, r, 2), origins/directions (b, v, r, 3).
    """
    b, v = extrinsics.shape[:2]
    h, w = image_shape
    xy, _ = sample_image_grid((h, w))
    xy = xy.reshape(-1, 2)
    origins, directions = get_world_rays(
        xy[None, None], extrinsics[:, :, None], intrinsics[:, :, None]
    )
    xy = jnp.broadcast_to(xy[None, None], (b, v, h * w, 2))
    return xy, origins, directions


def sample_epipolar(
    features: jnp.ndarray,      # (b, v, hf, wf, c) feature maps to sample from
    extrinsics: jnp.ndarray,    # (b, v, 4, 4)
    intrinsics: jnp.ndarray,    # (b, v, 3, 3)
    near: jnp.ndarray,          # (b, v)
    far: jnp.ndarray,           # (b, v)
    num_samples: int,
    rays: tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray] | None = None,
) -> EpipolarSampling:
    """Sample `num_samples` feature vectors along each ray's epipolar segment
    in every other view.

    `rays` optionally supplies (xy, origins, directions) — used by the
    deferred-BP crop path to restrict rays to a tile (ref :69-74).
    """
    b, v, hf, wf, c = features.shape
    if rays is None:
        xy_ray, origins, directions = generate_image_rays((hf, wf), extrinsics, intrinsics)
    else:
        xy_ray, origins, directions = rays
    r = origins.shape[2]
    s = num_samples

    projection = project_rays(
        origins[:, :, None],                       # (b, v, 1, r, 3)
        directions[:, :, None],
        collect_other_views(extrinsics)[:, :, :, None],   # (b, v, ov, 1, 4, 4)
        collect_other_views(intrinsics)[:, :, :, None],
        near[:, :, None, None],
        far[:, :, None, None],
    )

    sample_depth = (jnp.arange(s) + 0.5) / s
    overlap = projection.overlaps_image[..., None]
    xy_min = jnp.nan_to_num(projection.xy_min, posinf=0.0, neginf=0.0) * overlap
    xy_max = jnp.nan_to_num(projection.xy_max, posinf=0.0, neginf=0.0) * overlap
    xy_min = xy_min[..., None, :]                  # (b, v, ov, r, 1, 2)
    xy_max = xy_max[..., None, :]
    xy_sample = xy_min + sample_depth[:, None] * (xy_max - xy_min)

    # Transpose so dim 1 = the view samples are drawn FROM, then gather.
    samples_xy = transpose_other_views(xy_sample)  # (b, v, ov, r, s, 2)
    grid = samples_xy.reshape(b * v, (v - 1) * r * s, 1, 2) * 2.0 - 1.0
    feats = features.reshape(b * v, hf, wf, c).transpose(0, 3, 1, 2)
    sampled = grid_sample(feats, grid, align_corners=False)  # (bv, c, ovrs, 1)
    sampled = sampled[..., 0].transpose(0, 2, 1).reshape(b, v, v - 1, r, s, c)
    sampled = transpose_other_views(sampled)

    sampled = sampled * projection.overlaps_image[..., None, None]

    half_span = 0.5 / s
    return EpipolarSampling(
        features=sampled,
        valid=projection.overlaps_image,
        xy_ray=xy_ray,
        xy_sample=xy_sample,
        xy_sample_near=xy_min + (sample_depth[:, None] - half_span) * (xy_max - xy_min),
        xy_sample_far=xy_min + (sample_depth[:, None] + half_span) * (xy_max - xy_min),
        origins=origins,
        directions=directions,
    )
