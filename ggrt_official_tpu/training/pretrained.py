"""Pretrained backbone weight loading.

Parity target: the reference initializes its encoders from torchvision
imagenet checkpoints (feature_network.py:325-335: model_zoo resnet
weights, with conv1 replicated across num_input_images and divided) and
from torch.hub dino_resnet50 (backbone_dino.py:21). This environment has
no network egress, so weights arrive as .npz files converted offline; the
converters below turn a torchvision-style resnet state_dict into our flax
trees (the same code path real imagenet/dino checkpoints take — validated
against random-weight torch modules in tests/test_reference_parity.py).

Resolution: cfg.encoder.backbone.pretrained_path / cfg.iponet
pretrained_path point at the .npz; absent files fall back to random init
with a warning (training from scratch, the round-1 behavior).
"""
from __future__ import annotations

import os

import numpy as np

from .convert import (
    apply_name_map,
    backbone_resnet_name_map,
    merge_params,
    resnet_encoder_name_map,
)


def convert_torchvision_resnet_for_backbone(
    state_dict: dict, model: str = "resnet50", num_layers: int = 5
) -> dict:
    """torchvision resnet state_dict -> BackboneResnet trunk params.

    Only the trunk maps (the 1x1 projections are GGRt-specific and stay
    randomly initialized, as in the reference which loads strict=False)."""
    rows = [
        (k.removeprefix("model."), path, kind)
        for (k, path, kind) in backbone_resnet_name_map(model, num_layers)
        if k.startswith("model.")
    ]
    present = {k for (k, _, _) in rows} & set(state_dict)
    rows = [r for r in rows if r[0] in present]
    return apply_name_map(state_dict, rows)


def convert_imagenet_resnet_for_ipo(
    state_dict: dict, num_input_images: int = 1, stride: int = 8
) -> dict:
    """torchvision resnet18 state_dict -> IPO ResNetEncoder params.

    conv1 is replicated across input images and divided (the reference's
    multi-image trick, feature_network.py:326-328). Upconv/fusion heads are
    GGRt-specific and stay random."""
    sd = dict(state_dict)
    if num_input_images > 1:
        w = np.asarray(sd["conv1.weight"])
        sd["conv1.weight"] = np.concatenate([w] * num_input_images, axis=1) / num_input_images
    rows = [
        r for r in resnet_encoder_name_map("resnet18", stride=stride)
        if r[0] in sd
    ]
    return apply_name_map(sd, rows)


def save_pretrained_npz(path: str, converted: dict) -> None:
    np.savez(path, params=np.asarray(converted, dtype=object))


def load_pretrained_npz(path: str) -> dict:
    loaded = np.load(path, allow_pickle=True)
    return loaded["params"].item()


def maybe_load_backbone(params: dict, npz_path: str | None, subpath: tuple[str, ...]):
    """Merge a converted weight tree into `params` at `subpath`.

    Returns (params, loaded: bool). Missing path -> unchanged params."""
    if not npz_path:
        return params, False
    if not os.path.exists(npz_path):
        print(f"[pretrained] {npz_path} not found — training from scratch")
        return params, False
    converted = load_pretrained_npz(npz_path)

    node = params
    for key in subpath[:-1]:
        node = node[key]
    leaf_key = subpath[-1]
    node[leaf_key] = merge_params(node[leaf_key], converted)
    return params, True
