"""LPIPS-JAX parity vs a torch implementation of the published algorithm.

The lpips PyPI package and torchvision are not installed here (and there
is no network egress for pretrained weights), so the oracle is a plain-
torch transcription of the published LPIPS(alex) computation (Zhang et
al. 2018; identical math to lpips.LPIPS(net='alex')): torchvision-AlexNet
feature taps -> channel unit-norm -> squared diff -> non-negative 1x1 lin
heads -> spatial mean -> sum. Random weights are converted through
`convert_torch_state_dicts`, which is the exact code path real pretrained
weights will take.
"""
import numpy as np
import torch
import torch.nn as nn
import torch.nn.functional as F

import jax
import jax.numpy as jnp

from ggrt_official_tpu.evaluation import lpips_jax


class TorchAlexFeatures(nn.Module):
    """torchvision.models.alexnet().features with post-ReLU taps."""

    def __init__(self):
        super().__init__()
        self.features = nn.Sequential(
            nn.Conv2d(3, 64, 11, 4, 2), nn.ReLU(),
            nn.MaxPool2d(3, 2),
            nn.Conv2d(64, 192, 5, 1, 2), nn.ReLU(),
            nn.MaxPool2d(3, 2),
            nn.Conv2d(192, 384, 3, 1, 1), nn.ReLU(),
            nn.Conv2d(384, 256, 3, 1, 1), nn.ReLU(),
            nn.Conv2d(256, 256, 3, 1, 1), nn.ReLU(),
        )

    def forward(self, x):
        taps = []
        for layer in self.features:
            x = layer(x)
            if isinstance(layer, nn.ReLU):
                taps.append(x)
        return taps


def torch_lpips(alex, lins, a, b):
    shift = torch.tensor([-0.030, -0.088, -0.188]).view(1, 3, 1, 1)
    scale = torch.tensor([0.458, 0.448, 0.450]).view(1, 3, 1, 1)
    ta = alex((a - shift) / scale)
    tb = alex((b - shift) / scale)
    total = 0.0
    for fa, fb, lin in zip(ta, tb, lins):
        fa = fa / torch.sqrt((fa**2).sum(1, keepdim=True) + 1e-10)
        fb = fb / torch.sqrt((fb**2).sum(1, keepdim=True) + 1e-10)
        diff = (fa - fb) ** 2
        score = F.conv2d(diff, lin.clamp(min=0))
        total = total + score.mean(dim=(1, 2, 3))
    return total


class TestLPIPSParity:
    def test_matches_torch_algorithm(self):
        torch.manual_seed(0)
        alex = TorchAlexFeatures().eval()
        lins = [torch.rand(1, c, 1, 1) * 0.1
                for c in (64, 192, 384, 256, 256)]

        # Rename into the torchvision / lpips-package key layouts that
        # convert_torch_state_dicts expects.
        alex_sd = {}
        conv_positions = [0, 3, 6, 8, 10]
        convs = [m for m in alex.features if isinstance(m, nn.Conv2d)]
        for pos, conv in zip(conv_positions, convs):
            alex_sd[f"features.{pos}.weight"] = conv.weight.detach().numpy()
            alex_sd[f"features.{pos}.bias"] = conv.bias.detach().numpy()
        lpips_sd = {f"lin{i}.model.1.weight": l.numpy() for i, l in enumerate(lins)}

        params = lpips_jax.convert_torch_state_dicts(alex_sd, lpips_sd)
        model = lpips_jax.LPIPSJax()

        rs = np.random.RandomState(1)
        a = rs.rand(2, 3, 64, 64).astype(np.float32) * 2 - 1
        b = rs.rand(2, 3, 64, 64).astype(np.float32) * 2 - 1

        with torch.no_grad():
            ref = torch_lpips(alex, lins, torch.from_numpy(a),
                              torch.from_numpy(b)).numpy()
        out = np.asarray(
            model.apply(
                {"params": jax.tree_util.tree_map(jnp.asarray, params)},
                jnp.asarray(a), jnp.asarray(b),
            )
        )
        np.testing.assert_allclose(out, ref, atol=1e-5, rtol=1e-4)

    def test_save_and_metric_path(self, tmp_path, monkeypatch):
        torch.manual_seed(2)
        alex = TorchAlexFeatures()
        alex_sd = {}
        convs = [m for m in alex.features if isinstance(m, nn.Conv2d)]
        for pos, conv in zip([0, 3, 6, 8, 10], convs):
            alex_sd[f"features.{pos}.weight"] = conv.weight.detach().numpy()
            alex_sd[f"features.{pos}.bias"] = conv.bias.detach().numpy()
        lpips_sd = {
            f"lin{i}.model.1.weight": np.random.RandomState(i).rand(1, c, 1, 1).astype(np.float32)
            for i, c in enumerate((64, 192, 384, 256, 256))
        }
        path = str(tmp_path / "lpips_alex.npz")
        lpips_jax.save_weights(path, alex_sd, lpips_sd)

        monkeypatch.setenv("GGRT_LPIPS_WEIGHTS", path)
        from ggrt_official_tpu.evaluation import metrics

        img = np.random.RandomState(3).rand(3, 32, 32).astype(np.float32)
        d0 = metrics.lpips(img, img)
        d1 = metrics.lpips(img, 1.0 - img)
        assert d0 is not None and abs(d0) < 1e-6
        assert d1 > d0
