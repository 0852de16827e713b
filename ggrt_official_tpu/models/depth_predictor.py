"""Monocular depth PDF predictor (flax.linen).

Parity targets:
  * /root/reference/ggrt/model/pixelsplat/encoder/epipolar/depth_predictor_monocular.py
  * .../distribution_sampler.py and misc/discrete_probability_distribution.py

Features -> softmax PDF over `num_samples` relative-disparity buckets +
per-bucket sigmoid offsets; sample `gaussians_per_pixel` buckets (inverse-
CDF in training, top-k deterministic in eval) and map to metric depth.
"""
from __future__ import annotations

import flax.linen as nn
import jax
import jax.numpy as jnp

from ..geometry.depth import relative_disparity_to_depth

_EPS = float(jnp.finfo(jnp.float32).eps)


def sample_discrete_distribution(key, pdf: jnp.ndarray, num_samples: int):
    """Inverse-CDF sampling; returns (index, density) with shapes (..., n)."""
    *batch, bucket = pdf.shape
    normalized = pdf / (_EPS + jnp.sum(pdf, axis=-1, keepdims=True))
    cdf = jnp.cumsum(normalized, axis=-1)
    u = jax.random.uniform(key, (*batch, num_samples), dtype=pdf.dtype)
    # Batched searchsorted(side='right'): count buckets whose cdf <= u.
    # bucket is small (32), so the dense comparison is cheap and VPU-friendly.
    index = jnp.sum(
        (cdf[..., :, None] <= u[..., None, :]).astype(jnp.int32), axis=-2
    )
    index = jnp.clip(index, 0, bucket - 1)
    density = jnp.take_along_axis(normalized, index, axis=-1)
    return index, density


def gather_discrete_topk(pdf: jnp.ndarray, num_samples: int):
    normalized = pdf / (_EPS + jnp.sum(pdf, axis=-1, keepdims=True))
    _, index = jax.lax.top_k(pdf, num_samples)
    density = jnp.take_along_axis(normalized, index, axis=-1)
    return index, density


class DepthPredictorMonocular(nn.Module):
    d_in: int
    num_samples: int
    num_surfaces: int
    use_transmittance: bool

    @nn.compact
    def __call__(
        self,
        features: jnp.ndarray,  # (b, v, r, c)
        near: jnp.ndarray,      # (b, v)
        far: jnp.ndarray,       # (b, v)
        deterministic: bool,
        gaussians_per_pixel: int,
        rng: jax.Array | None = None,
    ) -> tuple[jnp.ndarray, jnp.ndarray]:
        """Returns (depths, opacities), each (b, v, r, srf, spp)."""
        s = self.num_samples
        x = nn.relu(features)
        x = nn.Dense(2 * s * self.num_surfaces, name="projection")(x)
        # Reference einops "... (dpt srf c) -> c ... srf dpt" (c=2 fastest-
        # varying, dpt slowest; depth_predictor_monocular.py:53-55) — the
        # flat channel is ((dpt*srf)+srf_i)*2 + c.
        x = x.reshape(*x.shape[:-1], s, self.num_surfaces, 2)
        pdf = jax.nn.softmax(jnp.swapaxes(x[..., 0], -1, -2), axis=-1)  # (b, v, r, srf, s)
        offset = jax.nn.sigmoid(jnp.swapaxes(x[..., 1], -1, -2))
        # Observability tap (encoder visualizer): no-op unless the caller
        # passes mutable=["intermediates"] to .apply().
        self.sow("intermediates", "depth_pdf", pdf)

        if deterministic:
            index, pdf_i = gather_discrete_topk(pdf, gaussians_per_pixel)
        else:
            assert rng is not None, "stochastic depth sampling needs an rng"
            index, pdf_i = sample_discrete_distribution(rng, pdf, gaussians_per_pixel)

        offset_i = jnp.take_along_axis(offset, index, axis=-1)
        relative_disparity = (index.astype(pdf.dtype) + offset_i) / s
        depth = relative_disparity_to_depth(
            relative_disparity,
            near[:, :, None, None, None],
            far[:, :, None, None, None],
        )

        if self.use_transmittance:
            partial = jnp.cumsum(pdf, axis=-1)
            partial = jnp.concatenate(
                [jnp.zeros_like(partial[..., :1]), partial[..., :-1]], axis=-1
            )
            opacity_all = pdf / (1.0 - partial + 1e-10)
            opacity = jnp.take_along_axis(opacity_all, index, axis=-1)
        else:
            opacity = pdf_i
        return depth, opacity
