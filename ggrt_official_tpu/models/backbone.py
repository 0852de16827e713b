"""ResNet feature backbones (flax.linen, NHWC).

Covers both reference encoders:
  * `BackboneResnet` — the pixelSplat context-image backbone: torchvision
    resnet + InstanceNorm, per-layer 1x1 projections upsampled to full res
    and summed (/root/reference/ggrt/model/pixelsplat/encoder/backbone/
    backbone_resnet.py:28-100).
  * `ResNetEncoder` — the IPO-Net feature/context net: resnet18-style
    trunk to stride 8 (or 4) with upconv fusion
    (/root/reference/ggrt/model/feature_network.py:274-381).

Conversion-exact details (validated by tests/test_reference_parity.py):
  * NHWC layout throughout (XLA maps convs onto the MXU best this way);
    torch checkpoints convert via training/convert.py layout transforms.
  * Explicit symmetric torch padding on every conv: flax 'SAME' pads
    asymmetrically for strided convs ((0,1) vs torch's (1,1)), which
    changes border pixels.
  * `ResNetEncoder` uses frozen BatchNorm (running statistics consumed as
    `batch_stats` collection, never updated) — exact parity with the
    reference's eval-mode BatchNorm2d and with converted checkpoints.
    `norm="group"` remains available for from-scratch training where
    frozen unit statistics would waste the affine parameters.
  * `BackboneResnet` upsamples with align_corners=True (the reference's
    F.interpolate call, backbone_resnet.py:91) — implemented via
    jax.image.scale_and_translate; everything else uses half-pixel
    (align_corners=False) bilinear, which jax.image.resize matches.
  * The reference's `use_first_pool` is dead code (`index == 0` can never
    hold inside `range(1, num_layers)`, backbone_resnet.py:83) — the
    maxpool is never applied in BackboneResnet and we reproduce that.
"""
from __future__ import annotations

import flax.linen as nn
import jax
import jax.numpy as jnp


def _pad(k: int):
    p = k // 2
    return ((p, p), (p, p))


def _resize_bilinear(x: jnp.ndarray, hw: tuple[int, int]) -> jnp.ndarray:
    b, h, w, c = x.shape
    return jax.image.resize(x, (b, hw[0], hw[1], c), method="bilinear")


def _resize_bilinear_align_corners(x: jnp.ndarray, hw: tuple[int, int]) -> jnp.ndarray:
    """torch F.interpolate(..., align_corners=True) equivalent."""
    b, h, w, c = x.shape
    oh, ow = hw
    scale = jnp.array(
        [(oh - 1) / max(h - 1, 1), (ow - 1) / max(w - 1, 1)], dtype=jnp.float32
    )
    # align_corners maps in = out * (h-1)/(oh-1); with scale_and_translate's
    # half-pixel centers that is s = (oh-1)/(h-1), t = 0.5 - 0.5*s
    # (verified elementwise vs torch F.interpolate align_corners=True).
    translate = 0.5 - 0.5 * scale
    return jax.image.scale_and_translate(
        x, (b, oh, ow, c), (1, 2), scale, translate,
        method="linear", antialias=False,
    )


class InstanceNorm(nn.Module):
    """Affine-free instance norm over spatial dims (NHWC), matching the
    reference's InstanceNorm2d(affine=False, track_running_stats=False)."""

    epsilon: float = 1e-5

    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        mean = jnp.mean(x, axis=(1, 2), keepdims=True)
        var = jnp.var(x, axis=(1, 2), keepdims=True)
        return (x - mean) * jax.lax.rsqrt(var + self.epsilon)


class FrozenBatchNorm(nn.Module):
    """Running-stats batch norm with the statistics stored as (frozen)
    parameters: y = (x - mean)/sqrt(var + eps)·scale + bias.

    Exact parity with the reference's eval-mode BatchNorm2d and a direct
    conversion target for torch checkpoints (weight/bias/running_mean/
    running_var → scale/bias/mean/var). The stats live in the regular
    "params" collection so no mutable-collection plumbing is needed; they
    receive zero gradient via stop_gradient, so gradient-based optimizers
    leave them untouched."""

    epsilon: float = 1e-5

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        c = x.shape[-1]
        scale = self.param("scale", nn.initializers.ones, (c,))
        bias = self.param("bias", nn.initializers.zeros, (c,))
        mean = jax.lax.stop_gradient(self.param("mean", nn.initializers.zeros, (c,)))
        var = jax.lax.stop_gradient(self.param("var", nn.initializers.ones, (c,)))
        inv = jax.lax.rsqrt(var + self.epsilon) * scale
        return x * inv + (bias - mean * inv)


def make_norm(kind: str):
    if kind == "instance":
        return lambda name=None: InstanceNorm()
    if kind == "group":
        return lambda name=None: nn.GroupNorm(num_groups=8, name=name)
    if kind == "batch":
        return lambda name=None: FrozenBatchNorm(name=name)
    raise ValueError(kind)


class BasicBlock(nn.Module):
    features: int
    stride: int = 1
    norm: str = "group"

    @nn.compact
    def __call__(self, x):
        norm = make_norm(self.norm)
        residual = x
        y = nn.Conv(
            self.features, (3, 3), strides=(self.stride, self.stride),
            padding=_pad(3), use_bias=False,
        )(x)
        y = norm()(y)
        y = nn.relu(y)
        y = nn.Conv(self.features, (3, 3), padding=_pad(3), use_bias=False)(y)
        y = norm()(y)
        if residual.shape != y.shape:
            residual = nn.Conv(
                self.features, (1, 1), strides=(self.stride, self.stride),
                padding="VALID", use_bias=False,
            )(x)
            residual = norm()(residual)
        return nn.relu(y + residual)


class Bottleneck(nn.Module):
    features: int  # bottleneck width; output is 4x this
    stride: int = 1
    norm: str = "instance"

    @nn.compact
    def __call__(self, x):
        norm = make_norm(self.norm)
        out_ch = self.features * 4
        residual = x
        y = nn.Conv(self.features, (1, 1), padding="VALID", use_bias=False)(x)
        y = nn.relu(norm()(y))
        y = nn.Conv(
            self.features, (3, 3), strides=(self.stride, self.stride),
            padding=_pad(3), use_bias=False,
        )(y)
        y = nn.relu(norm()(y))
        y = nn.Conv(out_ch, (1, 1), padding="VALID", use_bias=False)(y)
        y = norm()(y)
        if residual.shape != y.shape:
            residual = nn.Conv(
                out_ch, (1, 1), strides=(self.stride, self.stride),
                padding="VALID", use_bias=False,
            )(x)
            residual = norm()(residual)
        return nn.relu(y + residual)


_RESNET_LAYERS = {
    "resnet18": ("basic", (2, 2, 2, 2)),
    "resnet34": ("basic", (3, 4, 6, 3)),
    "resnet50": ("bottleneck", (3, 4, 6, 3)),
    "dino_resnet50": ("bottleneck", (3, 4, 6, 3)),
}


class ResNetTrunk(nn.Module):
    """conv1 + layer1..layerN trunk returning every stage's features."""

    model: str = "resnet50"
    num_layers: int = 5  # stages to run: layer0 (stem) .. layer{num_layers-1}
    norm: str = "instance"
    use_first_pool: bool = False

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> list[jnp.ndarray]:
        kind, layers = _RESNET_LAYERS[self.model]
        block = BasicBlock if kind == "basic" else Bottleneck
        norm = make_norm(self.norm)

        x = nn.Conv(
            64, (7, 7), strides=(2, 2), padding=_pad(7), use_bias=False,
            name="conv1",
        )(x)
        x = nn.relu(norm()(x))
        feats = [x]

        widths = (64, 128, 256, 512)
        for stage in range(1, self.num_layers):
            if stage == 1 and self.use_first_pool:
                x = nn.max_pool(x, (3, 3), strides=(2, 2), padding=((1, 1), (1, 1)))
            stride = 1 if stage == 1 else 2
            for b in range(layers[stage - 1]):
                x = block(
                    widths[stage - 1],
                    stride=stride if b == 0 else 1,
                    norm=self.norm,
                    name=f"layer{stage}_block{b}",
                )(x)
            feats.append(x)
        return feats


class BackboneResnet(nn.Module):
    """pixelSplat context backbone: per-stage 1x1 projections, upsampled to
    input resolution (align_corners=True) and summed (ref
    backbone_resnet.py:60-100; the reference's maxpool is dead code and is
    deliberately not applied — see module docstring).

    Input (b, v, h, w, 3) -> output (b, v, h, w, d_out).
    """

    model: str = "resnet50"
    num_layers: int = 5
    use_first_pool: bool = False
    d_out: int = 512

    @nn.compact
    def __call__(self, images: jnp.ndarray) -> jnp.ndarray:
        b, v, h, w, c = images.shape
        x = images.reshape(b * v, h, w, c)
        feats = ResNetTrunk(
            self.model, self.num_layers, norm="instance", use_first_pool=False,
            name="trunk",
        )(x)
        total = None
        for i, f in enumerate(feats):
            p = nn.Conv(self.d_out, (1, 1), name=f"projection{i}")(f)
            p = _resize_bilinear_align_corners(p.astype(jnp.float32), (h, w))
            total = p if total is None else total + p
        return total.reshape(b, v, h, w, self.d_out)


class ResNetEncoder(nn.Module):
    """IPO-Net feature/context encoder (ref feature_network.py:274-381).

    resnet trunk (conv1/s2 + bn + maxpool/s2 + layer1 + layer2/s2 +
    layer3/s2), then bilinear-upsample + conv fusion back to stride 8 (or
    4), exactly mirroring the reference's interpolate/upconv ordering.
    Input (b, h, w, 3*num_input_images) -> (b, h/stride, w/stride, out_chs).
    """

    out_chs: int = 128
    stride: int = 8
    model: str = "resnet18"
    norm: str = "batch"

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        kind, layers = _RESNET_LAYERS[self.model]
        assert kind == "basic", "IPO encoder uses basic blocks"
        norm = make_norm(self.norm)

        x = nn.Conv(
            64, (7, 7), strides=(2, 2), padding=_pad(7), use_bias=False,
            name="conv1",
        )(x)
        x = nn.relu(norm("norm1")(x))
        x = nn.max_pool(x, (3, 3), strides=(2, 2), padding=((1, 1), (1, 1)))

        def stage(x, width, n_blocks, stride, name):
            for i in range(n_blocks):
                x = BasicBlock(
                    width, stride=stride if i == 0 else 1, norm=self.norm,
                    name=f"{name}_block{i}",
                )(x)
            return x

        x = stage(x, 64, layers[0], 1, "layer1")
        s4 = x
        x = stage(x, 128, layers[1], 2, "layer2")
        s8 = x
        x = stage(x, 256, layers[2], 2, "layer3")

        # Reference ordering (feature_network.py:357-377): scale-2 upsample,
        # upconv, then resize the skip to the upsampled size before fusing.
        x = _resize_bilinear(x, (2 * x.shape[1], 2 * x.shape[2]))
        x = nn.relu(nn.Conv(128, (3, 3), padding=_pad(3), name="upconv1")(x))
        s8r = _resize_bilinear(s8, (x.shape[1], x.shape[2]))
        x = jnp.concatenate([x, s8r], axis=-1)
        x = nn.relu(nn.Conv(128, (3, 3), padding=_pad(3), name="upconv1_fusion")(x))
        if self.stride == 8:
            return nn.Conv(self.out_chs, (3, 3), padding=_pad(3), name="out_conv")(x)
        elif self.stride == 4:
            x = _resize_bilinear(x, (2 * x.shape[1], 2 * x.shape[2]))
            x = nn.relu(nn.Conv(64, (3, 3), padding=_pad(3), name="upconv2")(x))
            s4r = _resize_bilinear(s4, (x.shape[1], x.shape[2]))
            x = jnp.concatenate([x, s4r], axis=-1)
            x = nn.relu(nn.Conv(64, (3, 3), padding=_pad(3), name="upconv2_fusion")(x))
            return nn.Conv(self.out_chs, (3, 3), padding=_pad(3), name="out_conv")(x)
        raise ValueError(f"stride {self.stride} unsupported")
