"""Epipolar encoder: context images -> per-pixel 3D Gaussians (flax.linen).

Parity target: /root/reference/ggrt/model/pixelsplat/encoder/encoder_epipolar.py.

Pipeline: backbone -> 1x1 projection -> epipolar transformer ->
high-res skip conv -> monocular depth PDF -> to_gaussians linear ->
GaussianAdapter. Supports:
  * `just_return_features`: backbone features only (deferred-BP precompute,
    ref :133-138);
  * `features=`: reuse precomputed backbone features;
  * `crop`: encode only one (clip_h, clip_w) tile of a crop_size grid
    (ref :127-157), for crop-tiled deferred backprop.
"""
from __future__ import annotations

from typing import NamedTuple, Optional

import flax.linen as nn
import jax
import jax.numpy as jnp

from ..config import EncoderCfg
from ..geometry.projection import sample_image_grid
from .backbone import BackboneResnet
from .epipolar_sampler import generate_image_rays
from .epipolar_transformer import EpipolarTransformer
from .depth_predictor import DepthPredictorMonocular
from .gaussian_adapter import GaussianAdapter, Gaussians


class EncoderOutput(NamedTuple):
    gaussians: Gaussians  # flattened: (b, v*r*srf*spp, ...)


def map_pdf_to_opacity(pdf, cfg, global_step):
    """Warm-up opacity mapping (ref encoder_epipolar.py:97-110)."""
    o = cfg.opacity_mapping
    x = o.initial + jnp.minimum(global_step / max(o.warm_up, 1), 1.0) * (o.final - o.initial)
    exponent = 2.0**x
    return 0.5 * (1.0 - (1.0 - pdf) ** exponent + pdf ** (1.0 / exponent))


class EncoderEpipolar(nn.Module):
    cfg: EncoderCfg

    @nn.compact
    def __call__(
        self,
        context: dict,
        global_step,
        features: Optional[jnp.ndarray] = None,
        crop: Optional[tuple[int, int, int]] = None,  # (clip_h, clip_w, crop_size)
        deterministic: bool = False,
        just_return_features: bool = False,
        rng: jax.Array | None = None,
    ):
        """Args:
          context: dict with image (b, v, 3, h, w), extrinsics (b, v, 4, 4),
            intrinsics (b, v, 3, 3), near/far (b, v).
        Returns:
          backbone features if `just_return_features`, else Gaussians with
          leading shape (b, v*r*srf*spp).
        """
        cfg = self.cfg
        images = context["image"]
        b, v, _, h, w = images.shape
        images_nhwc = images.transpose(0, 1, 3, 4, 2)

        if features is None:
            feats = BackboneResnet(
                model=cfg.backbone.model,
                num_layers=cfg.backbone.num_layers,
                use_first_pool=cfg.backbone.use_first_pool,
                d_out=cfg.backbone.d_out,
                name="backbone",
            )(images_nhwc)
            feats = nn.relu(feats)
            feats = nn.Dense(cfg.d_feature, name="backbone_projection")(feats)
        else:
            feats = features
        if just_return_features:
            return feats

        if crop is not None:
            # clip_h/clip_w may be TRACED crop indices (crop_size is static):
            # all offset arithmetic below stays traced and slicing uses
            # lax.dynamic_slice, so a scan over crop tiles compiles ONE tile
            # graph instead of crop_size² copies (deferred-BP finetune).
            clip_h, clip_w, crop_size = crop
            hc, wc = h // crop_size, w // crop_size
            y0, x0 = clip_h * hc, clip_w * wc
        else:
            clip_h = clip_w = 0
            crop_size = 1
            hc, wc = h, w
            y0 = x0 = 0

        if cfg.use_epipolar_transformer:
            ds = cfg.epipolar_transformer.downscale
            rays = None
            token_slice = None
            if crop is not None:
                # Restrict query rays to the crop tile at the downscaled res.
                xy, origins, dirs = generate_image_rays(
                    (h // ds, w // ds), context["extrinsics"], context["intrinsics"]
                )
                def crop_rays(t):
                    t = t.reshape(b, v, h // ds, w // ds, -1)
                    t = jax.lax.dynamic_slice(
                        t,
                        (0, 0, y0 // ds, x0 // ds, 0),
                        (b, v, hc // ds, wc // ds, t.shape[-1]),
                    )
                    return t.reshape(b, v, -1, t.shape[-1])
                rays = (crop_rays(xy), crop_rays(origins), crop_rays(dirs))
                token_slice = (y0 // ds, x0 // ds, hc // ds, wc // ds)
            feats, sampling = EpipolarTransformer(
                cfg.epipolar_transformer, cfg.d_feature, name="epipolar_transformer"
            )(
                feats,
                context["extrinsics"],
                context["intrinsics"],
                context["near"],
                context["far"],
                rays=rays,
                token_slice=token_slice,
            )

        # High-resolution skip (on the cropped image region).
        skip_in = jax.lax.dynamic_slice(
            images_nhwc, (0, 0, y0, x0, 0), (b, v, hc, wc, 3)
        )
        skip = nn.Conv(cfg.d_feature, (7, 7), name="high_resolution_skip")(
            skip_in.reshape(b * v, hc, wc, 3)
        )
        skip = nn.relu(skip).reshape(b, v, hc, wc, cfg.d_feature)
        feats = feats + skip

        feats = feats.reshape(b, v, hc * wc, cfg.d_feature)
        if not deterministic and rng is None:
            rng = self.make_rng("sample")
        gpp = 1 if deterministic else cfg.gaussians_per_pixel
        depths, densities = DepthPredictorMonocular(
            cfg.d_feature, cfg.num_monocular_samples, cfg.num_surfaces,
            cfg.use_transmittance, name="depth_predictor",
        )(feats, context["near"], context["far"], deterministic, gpp, rng=rng)

        adapter = GaussianAdapter(cfg.gaussian_adapter, name="gaussian_adapter")
        raw = nn.Dense(
            cfg.num_surfaces * (2 + adapter.d_in), name="to_gaussians"
        )(nn.relu(feats))
        raw = raw.reshape(b, v, hc * wc, cfg.num_surfaces, 2 + adapter.d_in)

        xy_ray, _ = sample_image_grid((h, w))
        xy_ray = jax.lax.dynamic_slice(
            xy_ray, (y0, x0, 0), (hc, wc, 2)
        ).reshape(-1, 2)  # (r, 2)
        offset_xy = nn.sigmoid(raw[..., :2])
        pixel_size = jnp.array([1.0 / w, 1.0 / h])
        xy_ray = xy_ray[None, None, :, None, :] + (offset_xy - 0.5) * pixel_size

        gpp_cfg = cfg.gaussians_per_pixel
        gaussians = adapter(
            context["extrinsics"][:, :, None, None, None],
            context["intrinsics"][:, :, None, None, None],
            xy_ray[..., None, :],                          # (b, v, r, srf, 1, 2)
            depths,
            map_pdf_to_opacity(densities, cfg, global_step) / gpp_cfg,
            raw[..., None, 2:],
            (h, w),
        )

        if cfg.predict_opacity:
            op_mult = nn.sigmoid(nn.Dense(1, name="to_opacity")(nn.relu(feats)))
            opacities = gaussians.opacities * op_mult[..., None, :]
        else:
            opacities = gaussians.opacities

        def flatten(t, trailing):
            return t.reshape(b, -1, *trailing)

        return Gaussians(
            means=flatten(gaussians.means, (3,)),
            covariances=flatten(gaussians.covariances, (3, 3)),
            harmonics=flatten(gaussians.harmonics, gaussians.harmonics.shape[-2:]),
            opacities=opacities.reshape(b, -1),
            scales=flatten(gaussians.scales, (3,)),
            rotations=flatten(gaussians.rotations, (4,)),
        )
