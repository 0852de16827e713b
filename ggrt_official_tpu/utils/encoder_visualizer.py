"""Encoder visualization dumps (host-side numpy).

Parity target: /root/reference/ggrt/model/pixelsplat/encoder/visualization/
encoder_visualizer_epipolar.py — epipolar sample overlays, predicted depth
maps, and Gaussian statistics, emitted as plain images/arrays instead of
wandb panels.
"""
from __future__ import annotations

import numpy as np

from .visualization import colorize_depth


def visualize_depth_maps(gaussians_means: np.ndarray, extrinsics: np.ndarray,
                         image_shape: tuple[int, int], gaussians_per_pixel: int) -> np.ndarray:
    """Per-pixel mean Gaussian depth as a colorized image.

    gaussians_means: (v*h*w*spp, 3) in encoder emission order; extrinsics
    (v, 4, 4). Returns (v, h, w, 3) color maps.
    """
    h, w = image_shape
    v = extrinsics.shape[0]
    means = gaussians_means.reshape(v, h, w, gaussians_per_pixel, 3)
    out = []
    for i in range(v):
        w2c = np.linalg.inv(extrinsics[i])
        pts = means[i].reshape(-1, 3) @ w2c[:3, :3].T + w2c[:3, 3]
        depth = pts[:, 2].reshape(h, w, gaussians_per_pixel).mean(-1)
        out.append(colorize_depth(depth))
    return np.stack(out)


def overlay_epipolar_samples(
    image: np.ndarray,            # (3, h, w) the view samples are drawn FROM
    xy_samples: np.ndarray,       # (r_sel, s, 2) normalized xy of samples
    color=(1.0, 0.2, 0.2),
) -> np.ndarray:
    """Scatter epipolar sample points onto an image (returns (3, h, w))."""
    out = np.array(image, copy=True)
    _, h, w = out.shape
    xs = np.clip((xy_samples[..., 0] * w).astype(int), 0, w - 1)
    ys = np.clip((xy_samples[..., 1] * h).astype(int), 0, h - 1)
    for c in range(3):
        out[c, ys.reshape(-1), xs.reshape(-1)] = color[c]
    return out


def gaussian_statistics(gaussians) -> dict:
    """Summary stats of an encoder output (means/scales/opacities)."""
    means = np.asarray(gaussians.means)
    opac = np.asarray(gaussians.opacities)
    scales = np.asarray(gaussians.scales)
    return {
        "n_gaussians": int(means.reshape(-1, 3).shape[0]),
        "mean_opacity": float(opac.mean()),
        "p95_opacity": float(np.percentile(opac, 95)),
        "mean_scale": float(scales.mean()),
        "max_scale": float(scales.max()),
        "means_bbox_min": means.reshape(-1, 3).min(0).tolist(),
        "means_bbox_max": means.reshape(-1, 3).max(0).tolist(),
    }


def visualize_attention(attn: np.ndarray, image_shape: tuple[int, int]) -> np.ndarray:
    """Per-head epipolar attention entropy maps (ref :130-203 simplified).

    attn: (r, heads, s) softmax weights per downscaled pixel token.
    Returns (heads, h, w, 3) colorized entropy (low entropy = peaky match).
    """
    h, w = image_shape
    r, heads, s = attn.shape
    assert r == h * w, (r, h, w)
    p = np.clip(attn, 1e-9, 1.0)
    entropy = -(p * np.log(p)).sum(-1) / np.log(s)    # (r, heads)
    return np.stack(
        [colorize_depth(entropy[:, i].reshape(h, w), cmap_name="viridis")
         for i in range(heads)]
    )


def visualize_overlaps(valid: np.ndarray, image_shape: tuple[int, int]) -> np.ndarray:
    """Fraction of other views whose epipolar segment overlaps each pixel
    (ref :231-269). valid: (v, ov, r) bool. Returns (v, h, w, 3)."""
    h, w = image_shape
    frac = np.asarray(valid, np.float32).mean(1)      # (v, r)
    return np.stack(
        [colorize_depth(f.reshape(h, w), cmap_name="magma") for f in frac]
    )


def visualize_probabilities(pdf: np.ndarray, image_shape: tuple[int, int]) -> np.ndarray:
    """Depth-bucket PDF summaries (ref :302-374): expectation and peakiness
    maps. pdf: (r, s). Returns (2, h, w, 3)."""
    h, w = image_shape
    r, s = pdf.shape
    buckets = (np.arange(s) + 0.5) / s
    expectation = (pdf * buckets).sum(-1) / np.clip(pdf.sum(-1), 1e-9, None)
    peak = pdf.max(-1)
    return np.stack([
        colorize_depth(expectation.reshape(h, w), cmap_name="turbo"),
        colorize_depth(peak.reshape(h, w), cmap_name="viridis"),
    ])


def visualize_epipolar_color_samples(
    image_from: np.ndarray,       # (3, h, w) view the colors are sampled FROM
    image_onto: np.ndarray,       # (3, h, w) view whose rays were projected
    xy_samples: np.ndarray,       # (r_sel, s, 2) normalized xy in image_from
) -> np.ndarray:
    """Reference :466-530 equivalent: bilinear-free nearest color pulled
    along each epipolar segment, scattered back onto the target view's
    pixel rows — a quick visual check that the epipolar geometry actually
    lands on corresponding texture. Returns (3, h, w)."""
    out = np.array(image_onto, copy=True) * 0.25
    _, h, w = image_from.shape
    xs = np.clip((xy_samples[..., 0] * w).astype(int), 0, w - 1)
    ys = np.clip((xy_samples[..., 1] * h).astype(int), 0, h - 1)
    sampled = image_from[:, ys, xs]                       # (3, r_sel, s)
    mean_color = sampled.mean(-1)                         # (3, r_sel)
    r_sel = xy_samples.shape[0]
    rows = (np.arange(r_sel) * (h * w // max(r_sel, 1))) % (h * w)
    out[:, rows // w, rows % w] = mean_color
    return out


def dump_encoder_visualizations(model, params, batch, step, image_shape,
                                out_dir=None, deterministic=True, rng=None):
    """Composite dump driver (reference EncoderVisualizerEpipolar.visualize,
    encoder_visualizer_epipolar.py:36-128): runs the gaussian forward with
    flax intermediates capture (the sow taps in transformer.Attention and
    DepthPredictorMonocular replace the reference's torch forward hooks)
    and emits the visualization inventory as numpy images. Writes PNGs to
    out_dir when given (requires imageio/PIL), else returns the dict.
    """
    import jax

    rngs = {} if deterministic else {"sample": rng}
    (ret, gt), inter = model.apply(
        params, batch, step, deterministic=deterministic, rngs=rngs,
        method="gaussian_forward", mutable=["intermediates"],
    )
    flat = jax.tree_util.tree_flatten_with_path(inter["intermediates"])[0]
    attns = [np.asarray(v) for p, v in flat if "attn" in str(p)]
    pdfs = [np.asarray(v) for p, v in flat if "depth_pdf" in str(p)]

    dumps: dict[str, np.ndarray] = {}
    h, w = image_shape
    for li, a in enumerate(attns):
        # (tokens, heads, q=1, s) -> (r, heads, s) at the transformer's
        # downscaled resolution; infer the downscale from the token count.
        a = a.reshape(a.shape[0], a.shape[1], -1)[:, :, :]
        r = a.shape[0]
        for ds in (4, 2, 8, 1):
            hh, ww = h // ds, w // ds
            if hh * ww and r % (hh * ww) == 0:
                views = r // (hh * ww)
                per = a.reshape(views, hh * ww, a.shape[1], a.shape[2])
                for vi in range(views):
                    dumps[f"attention_l{li}_v{vi}"] = visualize_attention(
                        per[vi], (hh, ww)
                    )
                break
    for li, p in enumerate(pdfs):
        # (b, v, r, srf, s) -> per-view expectation/peakiness maps.
        b, v, r, srf, s = p.shape
        for vi in range(v):
            dumps[f"depth_pdf_v{vi}"] = visualize_probabilities(
                p[0, vi, :, 0, :], (h, w)
            )
    dumps["rendered_rgb"] = np.asarray(ret["rgb"])
    if out_dir is not None:
        import os

        from PIL import Image

        os.makedirs(out_dir, exist_ok=True)
        for name, img in dumps.items():
            arr = np.asarray(img)
            # Collapse any leading panel axes to the first (h, w, 3) panel.
            while arr.ndim > 3:
                arr = arr[0]
            if arr.ndim == 3 and arr.shape[0] == 3 and arr.shape[-1] != 3:
                arr = arr.transpose(1, 2, 0)          # CHW -> HWC
            if arr.ndim == 3 and arr.shape[-1] == 3:
                Image.fromarray(
                    (np.clip(arr, 0.0, 1.0) * 255).astype(np.uint8)
                ).save(os.path.join(out_dir, f"{name}.png"))
    return dumps


def visualize_gaussians(gaussians, image_shape: tuple[int, int], v: int,
                        gaussians_per_pixel: int) -> np.ndarray:
    """Opacity / scale maps per view (ref :270-301). Returns (v, 2, h, w, 3)."""
    h, w = image_shape
    opac = np.asarray(gaussians.opacities).reshape(v, h, w, -1).mean(-1)
    scales = np.asarray(gaussians.scales).reshape(v, h, w, -1, 3).mean((-1, -2))
    out = []
    for i in range(v):
        out.append(np.stack([
            colorize_depth(opac[i], cmap_name="viridis"),
            colorize_depth(scales[i], cmap_name="magma"),
        ]))
    return np.stack(out)
