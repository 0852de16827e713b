"""ResUNet feature extractor for the IBRNet path (flax.linen, NHWC).

Parity target: /root/reference/ggrt/model/feature_network.py:157-271 —
resnet34-style encoder (stride-2 stem + 3 stride-2 stages of BasicBlocks)
with an upconv decoder and skip connections, emitting coarse(+fine)
feature maps at 1/2 resolution. InstanceNorm(affine) everywhere.
"""
from __future__ import annotations

import flax.linen as nn
import jax
import jax.numpy as jnp


class AffineInstanceNorm(nn.Module):
    epsilon: float = 1e-5

    @nn.compact
    def __call__(self, x):
        mean = jnp.mean(x, axis=(1, 2), keepdims=True)
        var = jnp.var(x, axis=(1, 2), keepdims=True)
        y = (x - mean) * jax.lax.rsqrt(var + self.epsilon)
        scale = self.param("scale", nn.initializers.ones, (x.shape[-1],))
        bias = self.param("bias", nn.initializers.zeros, (x.shape[-1],))
        return y * scale + bias


class UNetBasicBlock(nn.Module):
    features: int
    stride: int = 1

    @nn.compact
    def __call__(self, x):
        identity = x
        y = nn.Conv(self.features, (3, 3), strides=(self.stride, self.stride), use_bias=False)(x)
        y = nn.relu(AffineInstanceNorm()(y))
        y = nn.Conv(self.features, (3, 3), use_bias=False)(y)
        y = AffineInstanceNorm()(y)
        if identity.shape != y.shape:
            identity = nn.Conv(
                self.features, (1, 1), strides=(self.stride, self.stride), use_bias=False
            )(x)
            identity = AffineInstanceNorm()(identity)
        return nn.relu(y + identity)


class ResUNet(nn.Module):
    coarse_out_ch: int = 32
    fine_out_ch: int = 32
    coarse_only: bool = False

    @nn.compact
    def __call__(self, images: jnp.ndarray):
        """images: (n, h, w, 3) -> (coarse (n, h/2, w/2, c), fine | None)."""
        out_ch = self.coarse_out_ch + (0 if self.coarse_only else self.fine_out_ch)
        layers = (3, 4, 6)  # resnet34 layer1..layer3

        x = nn.Conv(64, (7, 7), strides=(2, 2), use_bias=False, name="conv1")(images)
        x = nn.relu(AffineInstanceNorm(name="norm1")(x))

        def stage(x, width, n_blocks, name):
            for i in range(n_blocks):
                x = UNetBasicBlock(width, stride=2 if i == 0 else 1, name=f"{name}_b{i}")(x)
            return x

        x1 = stage(x, 64, layers[0], "layer1")    # h/4
        x2 = stage(x1, 128, layers[1], "layer2")  # h/8
        x3 = stage(x2, 256, layers[2], "layer3")  # h/16

        def upconv(x, ch, target_hw, name):
            n, _, _, _ = x.shape
            x = jax.image.resize(x, (n, *target_hw, x.shape[-1]), method="bilinear")
            x = nn.Conv(ch, (3, 3), name=name)(x)
            return nn.elu(AffineInstanceNorm(name=name + "_norm")(x))

        y = upconv(x3, 128, x2.shape[1:3], "upconv3")
        y = jnp.concatenate([x2, y], axis=-1)
        y = nn.Conv(128, (3, 3), name="iconv3")(y)
        y = nn.elu(AffineInstanceNorm(name="iconv3_norm")(y))

        y = upconv(y, 64, x1.shape[1:3], "upconv2")
        y = jnp.concatenate([x1, y], axis=-1)
        y = nn.Conv(out_ch, (3, 3), name="iconv2")(y)
        y = nn.elu(AffineInstanceNorm(name="iconv2_norm")(y))

        y = nn.Conv(out_ch, (1, 1), name="out_conv")(y)
        # Decoder tops out at the layer1 resolution (h/4), then the reference
        # semantics deliver features at half input resolution; resize up.
        n = y.shape[0]
        h2, w2 = images.shape[1] // 2, images.shape[2] // 2
        y = jax.image.resize(y, (n, h2, w2, y.shape[-1]), method="bilinear")

        if self.coarse_only:
            return y, None
        return y[..., : self.coarse_out_ch], y[..., self.coarse_out_ch :]
