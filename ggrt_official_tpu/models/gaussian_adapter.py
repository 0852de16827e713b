"""Raw features -> 3D Gaussian parameters (flax.linen).

Parity targets:
  * /root/reference/ggrt/model/pixelsplat/encoder/common/gaussian_adapter.py
  * .../common/gaussians.py (build_covariance)

scales: sigmoid to [scale_min, scale_max] * depth * pixel-size multiplier;
rotations: normalized quaternions (xyzw); covariance R S Sᵀ Rᵀ rotated to
world; SH coefficients masked toward the DC term and rotated by the c2w
rotation (ops.sh Ivanic recurrence replaces e3nn Wigner-D); means = ray
origin + direction * depth.
"""
from __future__ import annotations

from typing import NamedTuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from ..config import GaussianAdapterCfg
from ..geometry.projection import get_world_rays, invert_intrinsics
from ..ops.sh import rotate_sh


class Gaussians(NamedTuple):
    means: jnp.ndarray        # (..., 3)
    covariances: jnp.ndarray  # (..., 3, 3)
    harmonics: jnp.ndarray    # (..., 3, d_sh)
    opacities: jnp.ndarray    # (...)
    scales: jnp.ndarray       # (..., 3)
    rotations: jnp.ndarray    # (..., 4)


def quaternion_to_matrix(q: jnp.ndarray, eps: float = 1e-8) -> jnp.ndarray:
    """xyzw quaternion -> rotation matrix (ref gaussians.py:8-31)."""
    i, j, k, r = q[..., 0], q[..., 1], q[..., 2], q[..., 3]
    two_s = 2.0 / (jnp.sum(q * q, axis=-1) + eps)
    o = jnp.stack(
        [
            1 - two_s * (j * j + k * k), two_s * (i * j - k * r), two_s * (i * k + j * r),
            two_s * (i * j + k * r), 1 - two_s * (i * i + k * k), two_s * (j * k - i * r),
            two_s * (i * k - j * r), two_s * (j * k + i * r), 1 - two_s * (i * i + j * j),
        ],
        axis=-1,
    )
    return o.reshape(*q.shape[:-1], 3, 3)


def build_covariance(scale: jnp.ndarray, rotation_xyzw: jnp.ndarray) -> jnp.ndarray:
    """R S Sᵀ Rᵀ (ref gaussians.py:33-44)."""
    R = quaternion_to_matrix(rotation_xyzw)
    S2 = scale * scale
    return jnp.einsum("...ij,...j,...kj->...ik", R, S2, R)


class GaussianAdapter(nn.Module):
    cfg: GaussianAdapterCfg

    @property
    def d_sh(self) -> int:
        return (self.cfg.sh_degree + 1) ** 2

    @property
    def d_in(self) -> int:
        return 7 + 3 * self.d_sh

    def sh_mask(self) -> jnp.ndarray:
        import numpy as np

        mask = np.ones((self.d_sh,), dtype=np.float32)
        for degree in range(1, self.cfg.sh_degree + 1):
            mask[degree**2 : (degree + 1) ** 2] = 0.1 * 0.25**degree
        return jnp.asarray(mask)

    @nn.compact
    def __call__(
        self,
        extrinsics: jnp.ndarray,     # (..., 4, 4)
        intrinsics: jnp.ndarray,     # (..., 3, 3)
        coordinates: jnp.ndarray,    # (..., 2) normalized image xy
        depths: jnp.ndarray,         # (...)
        opacities: jnp.ndarray,      # (...)
        raw_gaussians: jnp.ndarray,  # (..., 7 + 3*d_sh)
        image_shape: tuple[int, int],
        eps: float = 1e-8,
    ) -> Gaussians:
        h, w = image_shape
        scales, rotations, sh = jnp.split(raw_gaussians, [3, 7], axis=-1)

        c = self.cfg
        scales = c.gaussian_scale_min + (c.gaussian_scale_max - c.gaussian_scale_min) * (
            nn.sigmoid(scales)
        )
        pixel_size = jnp.array([1.0 / w, 1.0 / h], dtype=raw_gaussians.dtype)
        multiplier = 0.1 * jnp.sum(
            jnp.einsum("...ij,j->...i", invert_intrinsics(intrinsics)[..., :2, :2], pixel_size),
            axis=-1,
        )
        scales = scales * depths[..., None] * multiplier[..., None]

        # Safe normalization: at init to_gaussians can emit exactly-zero
        # quaternion features; the norm's gradient at 0 is NaN, rsqrt(sum+eps)
        # is not.
        rotations = rotations * jax.lax.rsqrt(
            jnp.sum(rotations * rotations, axis=-1, keepdims=True) + eps * eps
        )

        sh = sh.reshape(*sh.shape[:-1], 3, self.d_sh)
        sh = jnp.broadcast_to(sh, (*opacities.shape, 3, self.d_sh)) * self.sh_mask()

        covariances = build_covariance(scales, rotations)
        c2w_rot = extrinsics[..., :3, :3]
        covariances = c2w_rot @ covariances @ jnp.swapaxes(c2w_rot, -1, -2)

        origins, directions = get_world_rays(coordinates, extrinsics, intrinsics)
        means = origins + directions * depths[..., None]

        return Gaussians(
            means=means,
            covariances=covariances,
            harmonics=rotate_sh(sh, c2w_rot[..., None, :, :]),
            opacities=opacities,
            scales=scales,
            rotations=jnp.broadcast_to(rotations, (*scales.shape[:-1], 4)),
        )
