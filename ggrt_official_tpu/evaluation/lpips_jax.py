"""LPIPS (AlexNet variant) in pure JAX/flax — no torch at eval time.

Parity target: the `lpips` PyPI package's LPIPS(net='alex') as used by the
reference eval protocol (/root/reference/eval/eval_ggrt.py:151-152,331).

The published algorithm (Zhang et al., CVPR 2018):
  1. scale inputs from [-1, 1] with fixed shift/scale constants,
  2. run torchvision-AlexNet `features` and tap the 5 post-ReLU slices,
  3. channel-unit-normalize each tap, take squared differences,
  4. 1x1 "lin" convs (non-negative weights) per slice, average spatially,
  5. sum the five slice scores.

Weights: this environment has no network egress and ships neither
torchvision nor the lpips package, so pretrained weights cannot be
sourced here. `convert_torch_state_dicts` converts the two torch state
dicts (torchvision alexnet + lpips lin heads) into our .npz layout the
moment they are available; `LPIPSJax` runs with random weights otherwise
(tests validate exact parity of the computation against a torch
implementation of the published algorithm under converted random
weights — see tests/test_lpips.py).
"""
from __future__ import annotations

from typing import Optional

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

# lpips.ScalingLayer constants (published in the lpips package).
_SHIFT = np.array([-0.030, -0.088, -0.188], np.float32)
_SCALE = np.array([0.458, 0.448, 0.450], np.float32)

# torchvision AlexNet `features` topology: (out_ch, kernel, stride, pad);
# None entries are 3x3/2 max-pools. ReLU taps after every conv.
_ALEX = [
    (64, 11, 4, 2),
    None,
    (192, 5, 1, 2),
    None,
    (384, 3, 1, 1),
    (256, 3, 1, 1),
    (256, 3, 1, 1),
]
_TAP_CHANNELS = (64, 192, 384, 256, 256)


class AlexNetFeatures(nn.Module):
    """torchvision AlexNet.features with post-ReLU taps (NHWC)."""

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> list[jnp.ndarray]:
        taps = []
        conv_i = 0
        for spec in _ALEX:
            if spec is None:
                x = nn.max_pool(x, (3, 3), strides=(2, 2))
                continue
            ch, k, s, p = spec
            x = nn.Conv(
                ch, (k, k), strides=(s, s), padding=((p, p), (p, p)),
                name=f"conv{conv_i}",
            )(x)
            x = nn.relu(x)
            taps.append(x)
            conv_i += 1
        return taps


class LPIPSJax(nn.Module):
    """Full LPIPS distance; inputs are (b, 3, h, w) in [-1, 1] (the lpips
    package convention — callers map [0,1] images with 2x-1)."""

    @nn.compact
    def __call__(self, a: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
        shift = jnp.asarray(_SHIFT).reshape(1, 3, 1, 1)
        scale = jnp.asarray(_SCALE).reshape(1, 3, 1, 1)
        a = ((a - shift) / scale).transpose(0, 2, 3, 1)
        b = ((b - shift) / scale).transpose(0, 2, 3, 1)

        net = AlexNetFeatures(name="net")
        taps_a = net(a)
        taps_b = net(b)

        total = 0.0
        for i, (fa, fb) in enumerate(zip(taps_a, taps_b)):
            fa = fa / jnp.sqrt(jnp.sum(fa**2, axis=-1, keepdims=True) + 1e-10)
            fb = fb / jnp.sqrt(jnp.sum(fb**2, axis=-1, keepdims=True) + 1e-10)
            diff = (fa - fb) ** 2
            w = self.param(
                f"lin{i}", nn.initializers.uniform(scale=0.1),
                (1, 1, _TAP_CHANNELS[i], 1),
            )
            score = jax.lax.conv_general_dilated(
                diff, jnp.maximum(w, 0.0), (1, 1), "VALID",
                dimension_numbers=("NHWC", "HWIO", "NHWC"),
            )
            total = total + jnp.mean(score, axis=(1, 2, 3))
        return total


def convert_torch_state_dicts(alexnet_sd: dict, lpips_sd: dict) -> dict:
    """Build the flax param tree from torch state dicts.

    alexnet_sd: torchvision alexnet state dict (features.{0,3,6,8,10}.*).
    lpips_sd: lpips package state dict (lin{i}.model.1.weight).
    """
    from ..training.convert import conv_to_flax

    torch_feature_idx = [0, 3, 6, 8, 10]
    params: dict = {"net": {}}
    for i, ti in enumerate(torch_feature_idx):
        params["net"][f"conv{i}"] = {
            "kernel": conv_to_flax(np.asarray(alexnet_sd[f"features.{ti}.weight"])),
            "bias": np.asarray(alexnet_sd[f"features.{ti}.bias"]),
        }
    for i in range(5):
        w = np.asarray(lpips_sd[f"lin{i}.model.1.weight"])  # (1, c, 1, 1)
        params[f"lin{i}"] = conv_to_flax(w)
    return params


_cached: Optional[tuple] = None


def lpips_fn(weights_path: Optional[str] = None):
    """Returns a jitted callable lpips(a, b) for (3, h, w) images in [0, 1].

    weights_path: .npz produced by `save_weights` (converted torch
    checkpoints). Without it the metric runs with random-initialized
    weights and is only useful for relative comparisons (a warning is
    attached to the returned function).
    """
    global _cached
    if _cached is not None and _cached[0] == weights_path:
        return _cached[1]

    model = LPIPSJax()
    dummy = jnp.zeros((1, 3, 32, 32))
    variables = model.init(jax.random.PRNGKey(0), dummy, dummy)
    pretrained = False
    if weights_path is not None:
        loaded = np.load(weights_path, allow_pickle=True)
        tree = loaded["params"].item() if "params" in loaded else dict(loaded)
        variables = {"params": jax.tree_util.tree_map(jnp.asarray, tree)}
        pretrained = True

    @jax.jit
    def _run(a, b):
        return model.apply(variables, a[None] * 2.0 - 1.0, b[None] * 2.0 - 1.0)[0]

    def fn(a, b):
        return float(_run(jnp.asarray(a, jnp.float32), jnp.asarray(b, jnp.float32)))

    fn.pretrained = pretrained
    _cached = (weights_path, fn)
    return fn


def save_weights(path: str, alexnet_sd: dict, lpips_sd: dict) -> None:
    params = convert_torch_state_dicts(alexnet_sd, lpips_sd)
    np.savez(path, params=np.asarray(params, dtype=object))
