"""PyTorch checkpoint -> flax params conversion utilities.

SURVEY.md §7.3 #6: the reference ships torch checkpoints
(generalized_llff_best.pth with components 'pose_learner'/'gaussian');
loading them requires translating tensor layouts:

  torch Linear weight (out, in)            -> flax Dense kernel (in, out)
  torch Conv2d weight (out, in, kh, kw)    -> flax Conv kernel (kh, kw, in, out)
  torch ConvTranspose2d (in, out, kh, kw)  -> flax ConvTranspose (kh, kw, in, out)
  torch LayerNorm weight/bias              -> flax scale/bias

The generic `convert_tensor` + `apply_name_map` machinery here is exact;
full end-to-end conversion additionally needs the per-module name map for
a given checkpoint (started below for the pixelSplat encoder — extend as
reference checkpoints become available to validate against; the reference
weights are Google-Drive-hosted and not redistributable in-repo).
"""
from __future__ import annotations

from typing import Any, Callable

import numpy as np


def linear_to_dense(w: np.ndarray) -> np.ndarray:
    return np.ascontiguousarray(w.T)


def conv_to_flax(w: np.ndarray) -> np.ndarray:
    # (O, I, kh, kw) -> (kh, kw, I, O)
    return np.ascontiguousarray(np.transpose(w, (2, 3, 1, 0)))


def conv_transpose_to_flax(w: np.ndarray) -> np.ndarray:
    # torch (I, O, kh, kw) -> flax ConvTranspose (kh, kw, I, O), with the
    # kernel spatially flipped (torch's transposed conv correlates with the
    # flipped kernel relative to flax's).
    w = np.transpose(w, (2, 3, 0, 1))
    return np.ascontiguousarray(w[::-1, ::-1])


def convert_tensor(kind: str, value) -> np.ndarray:
    value = np.asarray(value)
    if kind == "dense":
        return linear_to_dense(value)
    if kind == "conv":
        return conv_to_flax(value)
    if kind == "conv_transpose":
        return conv_transpose_to_flax(value)
    if kind == "bias" or kind == "raw":
        return value
    raise ValueError(kind)


def apply_name_map(state_dict: dict, name_map: list[tuple[str, tuple[str, ...], str]]) -> dict:
    """Build a nested flax param dict from a torch state dict.

    name_map rows: (torch_key, flax_path_tuple, kind).
    """
    out: dict = {}
    for torch_key, flax_path, kind in name_map:
        if torch_key not in state_dict:
            raise KeyError(f"missing torch key: {torch_key}")
        node = out
        for part in flax_path[:-1]:
            node = node.setdefault(part, {})
        node[flax_path[-1]] = convert_tensor(kind, state_dict[torch_key])
    return out


def dense_map(torch_prefix: str, flax_path: tuple[str, ...]):
    return [
        (f"{torch_prefix}.weight", (*flax_path, "kernel"), "dense"),
        (f"{torch_prefix}.bias", (*flax_path, "bias"), "bias"),
    ]


def conv_map(torch_prefix: str, flax_path: tuple[str, ...], bias: bool = True):
    rows = [(f"{torch_prefix}.weight", (*flax_path, "kernel"), "conv")]
    if bias:
        rows.append((f"{torch_prefix}.bias", (*flax_path, "bias"), "bias"))
    return rows


def encoder_name_map() -> list[tuple[str, tuple[str, ...], str]]:
    """Name map for the pixelSplat encoder head layers whose architectures
    correspond 1:1 (backbone projections, to_gaussians, depth predictor,
    high-res skip). The resnet trunk maps stage-by-stage via
    `trunk_block_map` below."""
    rows: list = []
    rows += dense_map("backbone_projection.1", ("backbone_projection",))
    rows += dense_map("depth_predictor.projection.1", ("depth_predictor", "projection"))
    rows += dense_map("to_gaussians.1", ("to_gaussians",))
    rows += conv_map("high_resolution_skip.0", ("high_resolution_skip",))
    for i in range(5):
        rows += conv_map(f"backbone.projections.layer{i}", (f"backbone", f"projection{i}"))
    return rows


def trunk_block_map(stage: int, block: int, bottleneck: bool = True):
    """torchvision layer{stage}.{block} -> trunk layer{stage}_block{block}."""
    t = f"backbone.model.layer{stage}.{block}"
    f = ("backbone", "trunk", f"layer{stage}_block{block}")
    rows = []
    n_convs = 3 if bottleneck else 2
    for c in range(1, n_convs + 1):
        rows += conv_map(f"{t}.conv{c}", (*f, f"Conv_{c-1}"), bias=False)
    return rows


def assert_tree_shapes_match(converted: dict, template: dict, path=()):
    """Recursively check converted leaves fit the flax template shapes."""
    for key, tval in template.items():
        cpath = (*path, key)
        if key not in converted:
            continue  # partial conversion allowed
        cval = converted[key]
        if isinstance(tval, dict):
            assert_tree_shapes_match(cval, tval, cpath)
        else:
            assert tuple(np.shape(cval)) == tuple(np.shape(tval)), (
                f"shape mismatch at {'/'.join(cpath)}: "
                f"{np.shape(cval)} vs {np.shape(tval)}"
            )


def merge_params(template: dict, converted: dict) -> dict:
    """Overlay converted leaves onto a template param tree (partial load,
    parity with the reference's models-only checkpoint loads)."""
    out = {}
    for key, tval in template.items():
        if isinstance(tval, dict):
            out[key] = merge_params(tval, converted.get(key, {}))
        else:
            out[key] = converted.get(key, tval)
    return out
