"""Crop-tiled evaluation of large images (eval-side deferred rendering).

Parity targets: /root/reference/eval_crop.py (grid of clamped crop
windows rendered independently via principal-point-shifted intrinsics),
/root/reference/concat.py (stitching with boundary-overlap trimming) and
/root/reference/compare.py (stitched-vs-GT PSNR).

The reference hardcodes 378x504 images with 160x224 crops and unrolled
stitching branches; this implementation handles any (h, w, crop_h, crop_w)
with the same semantics: interior tiles are laid out on a regular grid,
boundary tiles are shifted inward (so they overlap their neighbors) and
trimmed during stitching.
"""
from __future__ import annotations

from math import ceil

import numpy as np


def crop_centers(h: int, w: int, crop_h: int, crop_w: int):
    """Grid of clamped crop centers, row-major (ref eval_crop.py:203-218).

    Returns a list of (i, j, center_h, center_w)."""
    rows, cols = ceil(h / crop_h), ceil(w / crop_w)
    out = []
    for i in range(rows):
        ch = min(crop_h // 2 + i * crop_h, h - crop_h // 2)
        for j in range(cols):
            cw = min(crop_w // 2 + j * crop_w, w - crop_w // 2)
            out.append((i, j, ch, cw))
    return out


def crop_batch(batch: dict, size, center) -> dict:
    """Crop context/target images around `center` and shift the normalized
    intrinsics so rendering the crop is exact (ref eval_crop.py:78-108)."""
    out_h, out_w = size
    ch, cw = center
    y0, x0 = ch - out_h // 2, cw - out_w // 2

    def crop_views(views):
        img = np.asarray(views["image"])
        h, w = img.shape[-2:]
        img = img[..., y0 : y0 + out_h, x0 : x0 + out_w]
        K = np.array(views["intrinsics"], copy=True)
        K[..., 0, 0] *= w / out_w
        K[..., 1, 1] *= h / out_h
        K[..., 0, 2] = (K[..., 0, 2] * w - x0) / out_w
        K[..., 1, 2] = (K[..., 1, 2] * h - y0) / out_h
        return {**views, "image": img, "intrinsics": K}

    return {
        **batch,
        "context": crop_views(batch["context"]),
        "target": crop_views(batch["target"]),
    }


def stitch_tiles(tiles: dict, h: int, w: int, crop_h: int, crop_w: int) -> np.ndarray:
    """Assemble {(i, j): (crop_h, crop_w, c)} tiles into an (h, w, c) image,
    trimming the inward-shifted boundary tiles (ref concat.py semantics)."""
    rows, cols = ceil(h / crop_h), ceil(w / crop_w)
    sample = next(iter(tiles.values()))
    out = np.zeros((h, w, *sample.shape[2:]), dtype=sample.dtype)
    for (i, j), tile in tiles.items():
        y0 = min(i * crop_h, h - crop_h)
        x0 = min(j * crop_w, w - crop_w)
        ty = i * crop_h - y0   # trimmed rows (boundary tiles only)
        tx = j * crop_w - x0
        out[i * crop_h : min((i + 1) * crop_h, h),
            j * crop_w : min((j + 1) * crop_w, w)] = tile[ty:, tx:][
            : h - i * crop_h, : w - j * crop_w
        ]
    return out


def psnr_compare(pred: np.ndarray, gt: np.ndarray, eps: float = 1e-6) -> float:
    """Stitched-vs-GT PSNR (ref compare.py:36-52)."""
    pred = np.clip(np.asarray(pred, np.float32), 0.0, 1.0)
    gt = np.asarray(gt, np.float32)
    mse = np.mean((pred - gt) ** 2)
    return float(-10.0 * np.log(mse + eps) / np.log(10.0))


def eval_crop_view(render_fn, batch: dict, crop_h: int, crop_w: int):
    """Render a full view tile-by-tile and stitch.

    render_fn(batch) -> (3, ch, cw) rendered target rgb of the (cropped)
    batch. Returns (stitched (h, w, 3), psnr against the batch's target)."""
    img = np.asarray(batch["target"]["image"])
    h, w = img.shape[-2:]
    tiles = {}
    for i, j, chc, cwc in crop_centers(h, w, crop_h, crop_w):
        cropped = crop_batch(batch, (crop_h, crop_w), (chc, cwc))
        rgb = np.asarray(render_fn(cropped))
        tiles[(i, j)] = rgb.transpose(1, 2, 0)
    stitched = stitch_tiles(tiles, h, w, crop_h, crop_w)
    gt = img.reshape(-1, 3, h, w)[0].transpose(1, 2, 0)
    return stitched, psnr_compare(stitched, gt)
