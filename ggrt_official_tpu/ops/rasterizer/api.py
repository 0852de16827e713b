"""Public rendering API for the TPU Gaussian rasterizer.

Mirrors the reference's render_cuda / render_depth_cuda surface
(/root/reference/ggrt/model/pixelsplat/decoder/cuda_splatting.py:49-128,
227-269) — scale-invariant world rescaling, per-view rendering, and
z-as-color depth rendering — but batches views with `jax.vmap` instead of
the reference's host-side python loop, and selects between three
compositing backends:

  * "reference": O(pixels x gaussians) oracle (tests / tiny scenes)
  * "tiled":     XLA binning + chunked per-tile compositing
  * "pallas":    Pallas tile kernels with handwritten VJP (fastest)
"""
from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

from ...geometry.depth import depth_to_relative_disparity
from ...geometry.projection import homogenize_points, invert_se3
from . import composite, reference, tiling
from .projection import project_gaussians


def _render_one(
    extrinsics, intrinsics, near, far, background,
    means, covariances, sh_coeffs, opacities,
    image_shape, backend, max_dup, max_per_tile, tile_chunk,
    binning_mode="sort",
):
    if backend == "reference":
        # tile_shape mirrors the production tiles so the oracle reproduces
        # the CUDA kernel's tile-granular culling exactly.
        return reference.render_reference(
            means, covariances, sh_coeffs, opacities,
            extrinsics, intrinsics, near, far, image_shape, background,
            tile_shape=(tiling.TILE_H, tiling.TILE_W),
        )
    pg = project_gaussians(
        means, covariances, sh_coeffs, opacities,
        extrinsics, intrinsics, near, far, image_shape,
    )
    bin_fn = {
        "counting": tiling.bin_gaussians_counting,
        "banked": tiling.bin_gaussians_banked,
        "sort": tiling.bin_gaussians,
    }[binning_mode]
    # Binning is a discrete choice (which Gaussians land on which tile, in
    # what order) — exactly like the CUDA kernel's sort, it has no useful
    # derivative. stop_gradient makes that explicit to AD, so the whole
    # sort/partition subtree is partial-eval'd into the primal pass and
    # linearization never records residuals for it.
    binning = bin_fn(
        jax.tree_util.tree_map(jax.lax.stop_gradient, pg),
        image_shape, max_dup=max_dup, max_per_tile=max_per_tile,
    )
    if backend == "tiled":
        return composite.composite_tiles(
            pg, binning, background, image_shape, tile_chunk=tile_chunk
        )
    elif backend == "pallas":
        from . import pallas_composite

        return pallas_composite.composite_tiles_pallas(pg, binning, background, image_shape)
    raise ValueError(f"unknown backend {backend}")


@partial(
    jax.jit,
    static_argnames=("image_shape", "backend", "scale_invariant", "max_dup", "max_per_tile", "tile_chunk", "binning_mode"),
)
def render(
    extrinsics: jnp.ndarray,
    intrinsics: jnp.ndarray,
    near: jnp.ndarray,
    far: jnp.ndarray,
    image_shape: tuple[int, int],
    background: jnp.ndarray,
    means: jnp.ndarray,
    covariances: jnp.ndarray,
    sh_coeffs: jnp.ndarray,
    opacities: jnp.ndarray,
    scale_invariant: bool = True,
    backend: str = "tiled",
    max_dup: int = 32,
    max_per_tile: int = 1024,
    tile_chunk: int = 16,
    binning_mode: str = "sort",
) -> jnp.ndarray:
    """Render a batch of views.

    Args:
      extrinsics: (b, 4, 4) c2w. intrinsics: (b, 3, 3) normalized.
      near/far: (b,). background: (b, 3).
      means: (b, g, 3); covariances: (b, g, 3, 3);
      sh_coeffs: (b, g, 3, d_sh); opacities: (b, g).
    Returns:
      (b, 3, h, w) images.
    """
    if scale_invariant:
        # Rescale the world so near == 1 (cuda_splatting.py:66-73): keeps
        # the projection matrix exact and numerics well-ranged.
        scale = 1.0 / near
        extrinsics = extrinsics.at[..., :3, 3].multiply(scale[:, None])
        covariances = covariances * (scale[:, None, None, None] ** 2)
        means = means * scale[:, None, None]
        near = near * scale
        far = far * scale

    fn = lambda e, i, n, f, bg, m, c, s, o: _render_one(
        e, i, n, f, bg, m, c, s, o,
        image_shape, backend, max_dup, max_per_tile, tile_chunk, binning_mode,
    )
    if extrinsics.shape[0] == 1:
        # Avoid a 1-element vmap: vmapping pallas_call adds a mapped grid
        # dimension with measurable overhead (~60% on the fwd+bwd bench).
        return fn(
            extrinsics[0], intrinsics[0], near[0], far[0], background[0],
            means[0], covariances[0], sh_coeffs[0], opacities[0],
        )[None]
    return jax.vmap(fn)(
        extrinsics, intrinsics, near, far, background, means, covariances, sh_coeffs, opacities
    )


def render_depth(
    extrinsics: jnp.ndarray,
    intrinsics: jnp.ndarray,
    near: jnp.ndarray,
    far: jnp.ndarray,
    image_shape: tuple[int, int],
    means: jnp.ndarray,
    covariances: jnp.ndarray,
    opacities: jnp.ndarray,
    mode: str = "depth",
    scale_invariant: bool = True,
    backend: str = "tiled",
    **kwargs,
) -> jnp.ndarray:
    """Depth rendering by splatting camera-space z as the color channel
    (parity with render_depth_cuda, cuda_splatting.py:227-269).

    Returns (b, h, w).
    """
    cam_space = jnp.einsum(
        "bij,bgj->bgi", invert_se3(extrinsics), homogenize_points(means),
        precision=jax.lax.Precision.HIGHEST,
    )
    fake_color = cam_space[..., 2]
    if mode == "disparity":
        fake_color = 1.0 / fake_color
    elif mode == "relative_disparity":
        fake_color = depth_to_relative_disparity(fake_color, near[:, None], far[:, None])
    elif mode == "log":
        fake_color = jnp.log(jnp.clip(fake_color, jnp.minimum(near, far)[:, None], jnp.maximum(near, far)[:, None]))

    # Deliberate fix vs the reference: render_depth_cuda feeds raw z as the
    # degree-0 SH coefficient, so the CUDA output is the affine-distorted
    # SH_C0*z + 0.5, not z (cuda_splatting.py:265 with use_sh=True). We
    # invert the SH DC transform so the composited output equals the
    # alpha-weighted depth exactly (SURVEY.md §2.11: do not replicate defects).
    b, g = fake_color.shape
    sh0 = fake_color[..., None, None] / 0.28209479177387814 - 0.5 / 0.28209479177387814
    sh0 = jnp.broadcast_to(sh0, (b, g, 3, 1))
    background = jnp.zeros((b, 3), dtype=means.dtype)
    img = render(
        extrinsics, intrinsics, near, far, image_shape, background,
        means, covariances, sh0, opacities,
        scale_invariant=scale_invariant, backend=backend, **kwargs,
    )
    return img.mean(axis=1)
