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


def ln_map(torch_prefix: str, flax_path: tuple[str, ...]):
    """torch LayerNorm -> flax LayerNorm (weight->scale)."""
    return [
        (f"{torch_prefix}.weight", (*flax_path, "scale"), "raw"),
        (f"{torch_prefix}.bias", (*flax_path, "bias"), "raw"),
    ]


def conv_transpose_map(torch_prefix: str, flax_path: tuple[str, ...]):
    return [
        (f"{torch_prefix}.weight", (*flax_path, "kernel"), "conv_transpose"),
        (f"{torch_prefix}.bias", (*flax_path, "bias"), "bias"),
    ]


def transformer_name_map(
    torch_prefix: str, flax_path: tuple[str, ...], depth: int,
    selfatt: bool = True, conv_ff: bool = False, sa_cfg=None,
):
    """srt Transformer (ref transformer/transformer.py:32) -> models/
    transformer.py Transformer. PreNorm wraps each sublayer: torch
    layers.{i}.0 = attention, layers.{i}.1 = feed-forward."""
    rows: list = []
    for i in range(depth):
        a = f"{torch_prefix}.layers.{i}.0"
        rows += ln_map(f"{a}.norm", (*flax_path, f"attn_norm_{i}"))
        if selfatt:
            rows.append((f"{a}.fn.to_qkv.weight", (*flax_path, f"attn_{i}", "to_qkv", "kernel"), "dense"))
        else:
            rows.append((f"{a}.fn.to_q.weight", (*flax_path, f"attn_{i}", "to_q", "kernel"), "dense"))
            rows.append((f"{a}.fn.to_kv.weight", (*flax_path, f"attn_{i}", "to_kv", "kernel"), "dense"))
        rows += dense_map(f"{a}.fn.to_out.0", (*flax_path, f"attn_{i}", "to_out"))
        f = f"{torch_prefix}.layers.{i}.1"
        rows += ln_map(f"{f}.norm", (*flax_path, f"ff_norm_{i}"))
        if conv_ff:
            rows += conv_map(f"{f}.fn.layers.0", (*flax_path, f"ff_{i}", "conv1"))
            rows += conv_map(f"{f}.fn.layers.3", (*flax_path, f"ff_{i}", "conv2"))
            rows += image_self_attention_name_map(
                f"{f}.fn.self_attention", (*flax_path, f"ff_{i}", "self_attn"), sa_cfg
            )
        else:
            rows += dense_map(f"{f}.fn.net.0", (*flax_path, f"ff_{i}", "Dense_0"))
            rows += dense_map(f"{f}.fn.net.3", (*flax_path, f"ff_{i}", "Dense_1"))
    return rows


def image_self_attention_name_map(torch_prefix: str, flax_path: tuple[str, ...], cfg):
    """ref epipolar/image_self_attention.py:23 -> epipolar_transformer.py
    ImageSelfAttention. `cfg` needs .num_layers (inner transformer depth)."""
    rows: list = []
    rows += dense_map(f"{torch_prefix}.positional_encoding.1", (*flax_path, "pos_proj"))
    rows += conv_map(f"{torch_prefix}.patch_embedder.0", (*flax_path, "patch_embedder"))
    rows += transformer_name_map(
        f"{torch_prefix}.transformer", (*flax_path, "transformer"),
        cfg.num_layers, selfatt=True, conv_ff=False,
    )
    rows += conv_transpose_map(f"{torch_prefix}.resampler", (*flax_path, "resampler"))
    return rows


def epipolar_transformer_name_map(cfg, torch_prefix="epipolar_transformer",
                                  flax_path=("epipolar_transformer",)):
    """ref epipolar/epipolar_transformer.py:30 -> models/epipolar_transformer.py.
    `cfg` is our EpipolarTransformerCfg (num_octaves/num_layers/downscale +
    .self_attention)."""
    rows: list = []
    if cfg.num_octaves > 0:
        rows += dense_map(f"{torch_prefix}.depth_encoding.1", (*flax_path, "depth_proj"))
    rows += transformer_name_map(
        f"{torch_prefix}.transformer", (*flax_path, "transformer"),
        cfg.num_layers, selfatt=False, conv_ff=True, sa_cfg=cfg.self_attention,
    )
    if cfg.downscale:
        rows += conv_map(f"{torch_prefix}.downscaler", (*flax_path, "downscaler"))
        rows += conv_transpose_map(f"{torch_prefix}.upscaler", (*flax_path, "upscaler"))
        rows += conv_map(f"{torch_prefix}.upscale_refinement.0", (*flax_path, "refine1"))
        rows += conv_map(f"{torch_prefix}.upscale_refinement.2", (*flax_path, "refine2"))
    return rows


def encoder_name_map(cfg=None) -> list[tuple[str, tuple[str, ...], str]]:
    """Full name map for the pixelSplat EncoderEpipolar
    (ref encoder_epipolar.py:55) onto models/encoder_epipolar.py.

    With cfg=None returns only the head layers (round-1 behavior); with our
    EncoderCfg it covers the backbone trunk and epipolar transformer too.
    """
    rows: list = []
    rows += dense_map("backbone_projection.1", ("backbone_projection",))
    rows += dense_map("depth_predictor.projection.1", ("depth_predictor", "projection"))
    rows += dense_map("to_gaussians.1", ("to_gaussians",))
    rows += conv_map("high_resolution_skip.0", ("high_resolution_skip",))
    if cfg is None:
        for i in range(5):
            rows += conv_map(f"backbone.projections.layer{i}", ("backbone", f"projection{i}"))
        return rows
    rows += prefix_map(
        backbone_resnet_name_map(cfg.backbone.model, cfg.backbone.num_layers),
        "backbone", ("backbone",),
    )
    if cfg.use_epipolar_transformer:
        rows += epipolar_transformer_name_map(cfg.epipolar_transformer)
    if cfg.predict_opacity:
        rows += dense_map("to_opacity.1", ("to_opacity",))
    return rows


def bn_map(torch_prefix: str, flax_path: tuple[str, ...]):
    """torch BatchNorm2d -> FrozenBatchNorm (models/backbone.py)."""
    return [
        (f"{torch_prefix}.weight", (*flax_path, "scale"), "raw"),
        (f"{torch_prefix}.bias", (*flax_path, "bias"), "raw"),
        (f"{torch_prefix}.running_mean", (*flax_path, "mean"), "raw"),
        (f"{torch_prefix}.running_var", (*flax_path, "var"), "raw"),
    ]


def trunk_block_map(
    stage: int, block: int, bottleneck: bool = True, downsample: bool = False,
    torch_root: str = "backbone.model", flax_root: tuple[str, ...] = ("backbone", "trunk"),
    batch_norm: bool = False,
):
    """torchvision layer{stage}.{block} -> trunk layer{stage}_block{block}.

    With instance norm (pixelSplat backbone) the norms are parameter-free;
    with batch_norm=True (IPO encoder) torch bn{c}/downsample.1 map onto
    FrozenBatchNorm_{i} params. Flax submodule creation order inside
    BasicBlock/Bottleneck: Conv_0, [Norm_0,] Conv_1, [Norm_1,] ...
    downsample conv last."""
    t = f"{torch_root}.layer{stage}.{block}"
    f = (*flax_root, f"layer{stage}_block{block}")
    rows = []
    n_convs = 3 if bottleneck else 2
    for c in range(1, n_convs + 1):
        rows += conv_map(f"{t}.conv{c}", (*f, f"Conv_{c-1}"), bias=False)
        if batch_norm:
            rows += bn_map(f"{t}.bn{c}", (*f, f"FrozenBatchNorm_{c-1}"))
    if downsample:
        rows += conv_map(f"{t}.downsample.0", (*f, f"Conv_{n_convs}"), bias=False)
        if batch_norm:
            rows += bn_map(f"{t}.downsample.1", (*f, f"FrozenBatchNorm_{n_convs}"))
    return rows


_RESNET_BLOCKS = {"resnet18": (2, 2, 2, 2), "resnet34": (3, 4, 6, 3), "resnet50": (3, 4, 6, 3)}


def resnet_encoder_name_map(model: str = "resnet18", stride: int = 8):
    """Full map for the IPO-Net ResNetEncoder
    (/root/reference/ggrt/model/feature_network.py:274-381) onto
    models/backbone.py ResNetEncoder(norm='batch')."""
    layers = _RESNET_BLOCKS[model]
    rows = []
    rows += conv_map("conv1", ("conv1",), bias=False)
    rows += bn_map("bn1", ("norm1",))
    for stage in (1, 2, 3):
        for b in range(layers[stage - 1]):
            # First block of stage 2/3 strides and widens -> downsample.
            ds = (stage > 1 and b == 0)
            rows += trunk_block_map(
                stage, b, bottleneck=(model == "resnet50"), downsample=ds,
                torch_root="", flax_root=(), batch_norm=True,
            )
    # torch_root="" leaves a leading dot; strip it.
    rows = [(k.lstrip("."), p, kind) for (k, p, kind) in rows]
    for name in ("upconv1", "upconv1_fusion") + (
        ("upconv2", "upconv2_fusion") if stride == 4 else ()
    ):
        rows += conv_map(f"{name}.0", (name,))
    rows += conv_map("out_conv", ("out_conv",))
    return rows


def backbone_resnet_name_map(model: str = "resnet50", num_layers: int = 5):
    """Full map for the pixelSplat BackboneResnet (instance norm, no norm
    params) onto models/backbone.py BackboneResnet."""
    layers = _RESNET_BLOCKS[model]
    bottleneck = model in ("resnet50", "dino_resnet50")
    rows = []
    rows += conv_map("model.conv1", ("trunk", "conv1"), bias=False)
    for stage in range(1, num_layers):
        for b in range(layers[stage - 1]):
            ds = b == 0 and (stage > 1 or bottleneck)
            rows += trunk_block_map(
                stage, b, bottleneck=bottleneck, downsample=ds,
                torch_root="model", flax_root=("trunk",), batch_norm=False,
            )
    for i in range(num_layers):
        rows += conv_map(f"projections.layer{i}", (f"projection{i}",))
    return rows


def prefix_map(rows, torch_prefix: str, flax_prefix: tuple[str, ...]):
    return [(f"{torch_prefix}.{k}", (*flax_prefix, *p), kind) for (k, p, kind) in rows]


def sep_conv_gru_map(torch_prefix: str, flax_path: tuple[str, ...]):
    """SepConvGRU (ref optimizer.py:51-78) -> models/heads.py SepConvGRU."""
    rows = []
    for name in ("convz1", "convr1", "convq1", "convz2", "convr2", "convq2"):
        rows += conv_map(f"{torch_prefix}.{name}", (*flax_path, name))
    return rows


def depth_pose_net_name_map(iters: int = 12):
    """Full map for the reference DepthPoseNet (depth_pose_network.py:13)
    onto models/iponet.py IPONet. Covers fnet/cnet trunks (frozen-BN
    resnet18 stride 8), init heads, upmask net, and both GRU update blocks.
    """
    rows: list = []
    enc = resnet_encoder_name_map("resnet18", stride=8)
    rows += prefix_map(enc, "fnet", ("fnet",))
    rows += prefix_map(enc, "cnet_depth", ("cnet_depth",))
    rows += prefix_map(enc, "cnet_pose", ("cnet_pose",))

    rows += conv_map("depth_head.conv1", ("depth_head", "conv1"))
    rows += conv_map("depth_head.conv2", ("depth_head", "conv2"))
    rows += conv_map("pose_head.conv1_pose", ("pose_head", "conv1"))
    rows += conv_map("pose_head.conv2_pose", ("pose_head", "conv2"))
    rows += conv_map("upmask_net.mask.0", ("upmask_net", "conv1"))
    rows += conv_map("upmask_net.mask.2", ("upmask_net", "conv2"))

    d = "update_block_depth"
    for c in ("convc1", "convc2", "convd1", "convd2", "convd"):
        rows += conv_map(f"{d}.encoder.{c}", (d, "encoder", c))
    rows += sep_conv_gru_map(f"{d}.depth_gru", (d, "depth_gru"))
    rows += conv_map(f"{d}.depth_head.conv1", (d, "depth_head", "conv1"))
    rows += conv_map(f"{d}.depth_head.conv2", (d, "depth_head", "conv2"))
    rows += conv_map(f"{d}.mask.0", (d, "mask1"))
    rows += conv_map(f"{d}.mask.2", (d, "mask2"))

    p = "update_block_pose"
    for c in ("convc1", "convc2", "convp1", "convp2", "convp"):
        rows += conv_map(f"{p}.encoder.{c}", (p, "encoder", c))
    rows += sep_conv_gru_map(f"{p}.pose_gru", (p, "pose_gru"))
    rows += conv_map(f"{p}.pose_head.conv1_pose", (p, "pose_head", "conv1"))
    rows += conv_map(f"{p}.pose_head.conv2_pose", (p, "pose_head", "conv2"))
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


def merge_params(template: dict, converted: dict, strict_shapes: bool = False) -> dict:
    """Overlay converted leaves onto a template param tree (partial load,
    parity with the reference's models-only checkpoint loads).

    Shape-mismatched leaves keep the template value (the reference loads
    pretrained trunks with strict=False, feature_network.py:332-335) unless
    strict_shapes is set."""
    out = {}
    for key, tval in template.items():
        if isinstance(tval, dict):
            out[key] = merge_params(tval, converted.get(key, {}), strict_shapes)
        else:
            cval = converted.get(key, tval)
            if np.shape(cval) != np.shape(tval):
                if strict_shapes:
                    raise ValueError(
                        f"shape mismatch for {key}: {np.shape(cval)} vs {np.shape(tval)}"
                    )
                cval = tval
            out[key] = cval
    return out


def convert_reference_checkpoint(
    ckpt: dict, template: dict, encoder_cfg=None, iters: int = 12
) -> dict:
    """Convert a full reference training checkpoint into the composite
    GGRtModel param tree.

    `ckpt` follows the reference's compose_state_dicts keying
    (train_ggrt_stable.py:60-66 / checkpoint_manager.py:13-190): component
    'pose_learner' is a DepthPoseNet state dict, component 'gaussian' a
    PixelSplat state dict whose learnable keys all live under 'encoder.*'
    (DecoderSplattingCUDA has no parameters). `template` is the flax
    {'pose_learner': ..., 'gaussian': ...} params tree from model.init.

    Returns the merged tree; leaves absent from the checkpoint keep their
    template values (the reference's strict=False partial-load semantics).
    """
    converted: dict = {}
    if "pose_learner" in ckpt:
        converted["pose_learner"] = apply_name_map(
            _numpyify(ckpt["pose_learner"]), depth_pose_net_name_map(iters)
        )
    if "gaussian" in ckpt:
        enc_sd = {
            k[len("encoder."):]: v
            for k, v in _numpyify(ckpt["gaussian"]).items()
            if k.startswith("encoder.")
        }
        converted["gaussian"] = {
            "encoder": apply_name_map(enc_sd, encoder_name_map(encoder_cfg))
        }
    assert_tree_shapes_match(converted, template)
    return merge_params(template, converted)


def _numpyify(sd: dict) -> dict:
    """torch tensors / arrays -> numpy (torch optional)."""
    out = {}
    for k, v in sd.items():
        if hasattr(v, "detach"):
            v = v.detach().cpu().numpy()
        out[k] = np.asarray(v)
    return out
