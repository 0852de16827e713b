"""Gaussian -> screen projection (EWA splatting preprocess), pure jnp.

TPU-native re-implementation of the preprocess stage of the reference's
external CUDA rasterizer (interface contract documented at
/root/reference/ggrt/model/pixelsplat/decoder/cuda_splatting.py and
SURVEY.md §2.1): perspective projection of 3D means, EWA projection of 3D
covariances (J W Σ Wᵀ Jᵀ + 0.3·I low-pass), conic/radius computation, and
SH→RGB evaluation along view directions.

Everything is differentiable jnp, so gradients w.r.t. Gaussian parameters
AND the camera (view/projection matrices → extrinsics) come from JAX AD —
the capability the dcharatan CUDA fork adds by hand.
"""
from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from ...geometry.projection import get_fov, invert_se3
from .. import sh as sh_ops

# Constants mirroring the CUDA kernel's behavior.
NEAR_CLIP = 0.2          # view-space z cull threshold
LOWPASS = 0.3            # screen-space covariance dilation
ALPHA_MIN = 1.0 / 255.0  # minimum contribution
ALPHA_MAX = 0.99         # alpha clamp
T_EPS = 1e-4             # transmittance early-out


class ProjectedGaussians(NamedTuple):
    """Per-Gaussian screen-space quantities for one camera."""

    mean2d: jnp.ndarray   # (g, 2) pixel coordinates
    conic: jnp.ndarray    # (g, 3) inverse 2D covariance (a, b, c) for [[a,b],[b,c]]
    depth: jnp.ndarray    # (g,) view-space z
    radius: jnp.ndarray   # (g,) screen-space radius in pixels (float)
    extent: jnp.ndarray   # (g, 2) tight per-axis AABB half-widths (pixels)
    color: jnp.ndarray    # (g, 3) RGB from SH evaluation
    opacity: jnp.ndarray  # (g,)
    valid: jnp.ndarray    # (g,) bool — in front of camera & invertible cov


def get_projection_matrix(
    near: jnp.ndarray, far: jnp.ndarray, intrinsics: jnp.ndarray
) -> jnp.ndarray:
    """Frustum -> NDC matrix honoring the principal point.

    Parity with reference cuda_splatting.py:18-46: x/y map to (-1, 1), z to
    (0, 1), and the focal terms are scaled by `near` (the caller rescales the
    world so near == 1, making the matrix exact).
    """
    fx = intrinsics[..., 0, 0]
    fy = intrinsics[..., 1, 1]
    cx = intrinsics[..., 0, 2]
    cy = intrinsics[..., 1, 2]
    zeros = jnp.zeros_like(near)
    ones = jnp.ones_like(near)
    row0 = jnp.stack([2.0 * near * fx, zeros, 2.0 * cx - 1.0, zeros], axis=-1)
    row1 = jnp.stack([zeros, 2.0 * near * fy, 2.0 * cy - 1.0, zeros], axis=-1)
    row2 = jnp.stack([zeros, zeros, far / (far - near), -(far * near) / (far - near)], axis=-1)
    row3 = jnp.stack([zeros, zeros, ones, zeros], axis=-1)
    return jnp.stack([row0, row1, row2, row3], axis=-2)


def ndc_to_pixel(ndc: jnp.ndarray, size: jnp.ndarray) -> jnp.ndarray:
    """((v + 1) * S - 1) / 2, the CUDA ndc2Pix convention."""
    return ((ndc + 1.0) * size - 1.0) * 0.5


def project_gaussians(
    means: jnp.ndarray,
    covariances: jnp.ndarray,
    sh_coeffs: jnp.ndarray,
    opacities: jnp.ndarray,
    extrinsics: jnp.ndarray,
    intrinsics: jnp.ndarray,
    near: jnp.ndarray,
    far: jnp.ndarray,
    image_shape: tuple[int, int],
) -> ProjectedGaussians:
    """Project one camera's view of the Gaussians to screen space.

    Args:
      means: (g, 3) world means.
      covariances: (g, 3, 3) world covariances.
      sh_coeffs: (g, 3, d_sh) SH coefficients per color channel.
      opacities: (g,).
      extrinsics: (4, 4) camera-to-world.
      intrinsics: (3, 3) normalized intrinsics.
      near, far: scalars.
      image_shape: (h, w) static.
    """
    h, w = image_shape
    view = invert_se3(extrinsics)  # world -> camera
    proj = get_projection_matrix(near, far, intrinsics)
    full_proj = proj @ view

    ones = jnp.ones_like(means[..., :1])
    means_h = jnp.concatenate([means, ones], axis=-1)

    # HIGHEST: default-precision einsums run bf16 MXU passes on TPU, which
    # would truncate screen positions to ~1e-2 px.
    _hi = jax.lax.Precision.HIGHEST
    p_view = jnp.einsum("ij,gj->gi", view, means_h, precision=_hi)[..., :3]
    p_hom = jnp.einsum("ij,gj->gi", full_proj, means_h, precision=_hi)
    p_w = 1.0 / (p_hom[..., 3] + 1e-7)
    p_ndc = p_hom[..., :3] * p_w[..., None]

    size = jnp.array([w, h], dtype=means.dtype)
    mean2d = ndc_to_pixel(p_ndc[..., :2], size)
    mean2d = jnp.clip(mean2d, -1e6, 1e6)  # see conic clamp note below

    # EWA: cov2d = J W Σ Wᵀ Jᵀ with the CUDA kernel's frustum clamping.
    fov = get_fov(intrinsics[None])[0]
    tan_fovx = jnp.tan(0.5 * fov[0])
    tan_fovy = jnp.tan(0.5 * fov[1])
    focal_x = w / (2.0 * tan_fovx)
    focal_y = h / (2.0 * tan_fovy)

    tz = p_view[..., 2]
    limx = 1.3 * tan_fovx
    limy = 1.3 * tan_fovy
    txtz = jnp.clip(p_view[..., 0] / tz, -limx, limx)
    tytz = jnp.clip(p_view[..., 1] / tz, -limy, limy)
    tx = txtz * tz
    ty = tytz * tz

    # cov2d = (J W) Σ (J W)ᵀ expanded to elementwise ops: J's sparsity
    # (2x3 with 4 nonzeros) makes the batched-GEMM formulation pathological
    # on TPU (860k tiny matmuls); the explicit form is pure VPU arithmetic.
    W3 = view[:3, :3]
    j0 = focal_x / tz
    j2x = -(focal_x * tx) / (tz * tz)
    j1 = focal_y / tz
    j2y = -(focal_y * ty) / (tz * tz)
    # Rows of M = J @ W: m0 = j0*W[0] + j2x*W[2]; m1 = j1*W[1] + j2y*W[2].
    m0 = j0[:, None] * W3[0][None, :] + j2x[:, None] * W3[2][None, :]  # (g, 3)
    m1 = j1[:, None] * W3[1][None, :] + j2y[:, None] * W3[2][None, :]
    # u_i = Σ m_i (batched matvec as mul+sum on the VPU).
    u0 = jnp.sum(covariances * m0[:, None, :], axis=-1)  # (g, 3)
    u1 = jnp.sum(covariances * m1[:, None, :], axis=-1)
    a = jnp.sum(m0 * u0, axis=-1) + LOWPASS
    b = jnp.sum(m0 * u1, axis=-1)
    c = jnp.sum(m1 * u1, axis=-1) + LOWPASS

    # Degenerate-pose guard: under garbage predicted poses (joint training
    # before the pose net converges) cov2d entries can overflow, making
    # det = inf - inf = NaN, which then poisons every gradient in the step
    # even though such gaussians render nothing. Clamp to a range where
    # a*c stays finite in f32; normal scenes sit many orders below it.
    a = jnp.clip(a, -1e15, 1e15)
    b = jnp.clip(b, -1e15, 1e15)
    c = jnp.clip(c, -1e15, 1e15)

    det = a * c - b * b
    det_valid = det > 0.0
    det_safe = jnp.where(det_valid, det, 1.0)
    # Conic/mean clamps (same degenerate-pose guard): an inf conic or a
    # wildly off-screen mean turns the compositor backward into 0*inf NaNs.
    # With |conic| <= 1e15 and |mean2d| <= 1e6 every power/whitened-offset
    # stays finite in f32, alphas underflow to zero, and the VJP of such
    # gaussians is exactly zero instead of NaN. Real scenes sit many orders
    # below both bounds.
    conic = jnp.clip(
        jnp.stack([c / det_safe, -b / det_safe, a / det_safe], axis=-1), -1e15, 1e15
    )

    # Radius is tile-binning metadata (integer pixels) — semantically
    # non-differentiable. Without stop_gradient, sqrt(0) under ceil's zero
    # cotangent produces 0 * inf = NaN for culled gaussians.
    mid = 0.5 * (a + c)
    lambda1 = mid + jnp.sqrt(jnp.maximum(0.1, mid * mid - det))
    radius = jax.lax.stop_gradient(
        jnp.ceil(3.0 * jnp.sqrt(jnp.maximum(lambda1, 1e-8)))
    )

    # Tight, LOSSLESS per-axis binning extents. The CUDA kernel bins the
    # square circumscribing the 3σ circle of the major eigenvalue
    # (getRect with my_radius = ceil(3·sqrt(λ1))). But a gaussian's
    # contribution is skipped by the compositor whenever
    # opacity·exp(-q/2) < 1/255, i.e. outside the level-set ellipse
    # q ≤ q_max = 2·ln(255·opacity). The exact AABB of that ellipse has
    # per-axis half-widths sqrt(q_max·Σ2d_diag): every (gaussian, tile)
    # pair this drops contributes exactly zero through the ALPHA_MIN gate,
    # so images are unchanged while dup streams, per-tile lists, and
    # compositor chunk counts all shrink (low-opacity gaussians shrink
    # the most). Deliberate deviation from the CUDA square (documented,
    # favorable): no 3σ truncation, so high-opacity gaussians keep the
    # visible contribution the CUDA kernel clips at its square's edge.
    q_max = jnp.maximum(
        2.0 * jnp.log(jnp.maximum(opacities, 1e-12) * (1.0 / ALPHA_MIN)), 0.0
    )
    extent = jax.lax.stop_gradient(
        jnp.ceil(
            jnp.sqrt(
                q_max[:, None]
                * jnp.maximum(jnp.stack([a, c], axis=-1), 0.0)
            )
        )
    )

    # SH -> RGB along the (world) view direction from the camera center.
    # Safe normalization: sqrt(sum + eps) keeps the gradient finite when a
    # gaussian sits exactly at the camera center.
    campos = extrinsics[:3, 3]
    dirs = means - campos
    dirs = dirs * jax.lax.rsqrt(jnp.sum(dirs * dirs, axis=-1, keepdims=True) + 1e-12)
    color = sh_ops.eval_sh(sh_coeffs, dirs)

    valid = det_valid & (tz > NEAR_CLIP)
    radius = jnp.where(valid, radius, 0.0)
    extent = jnp.where(valid[:, None], extent, 0.0)

    return ProjectedGaussians(
        mean2d=mean2d,
        conic=conic,
        depth=tz,
        radius=radius,
        extent=extent,
        color=color,
        opacity=opacities,
        valid=valid,
    )
