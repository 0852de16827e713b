"""sys.modules stubs that make /root/reference importable on this image.

The reference depends on torchvision / easydict / e3nn, which are not
installed here. For numerical-parity testing we only need:

  * `easydict.EasyDict` — attribute-access dict.
  * `torchvision.models` — the standard ResNet architecture (public spec:
    conv7x7/2 + bn + relu + maxpool3x3/2 + 4 stages of Basic/Bottleneck
    blocks), implemented below in plain torch with torchvision's module
    naming (conv1/bn1/layerN.M.convK/downsample) so state_dicts are
    key-compatible with real torchvision checkpoints.
  * `e3nn.o3` — only `wigner_D` degree 0 (identity) is exercised by the
    degree-0 adapter parity tests; higher degrees raise. (Our own SH
    rotation is validated independently by the functional round-trip test
    eval(rotate(c, R), d) == eval(c, Rᵀ d) in tests/test_ops.py.)

Import this module BEFORE importing anything from /root/reference.
"""
from __future__ import annotations

import sys
import types

import torch
import torch.nn as nn


# ---------------------------------------------------------------- easydict
class EasyDict(dict):
    def __init__(self, d=None, **kwargs):
        super().__init__()
        d = dict(d or {}, **kwargs)
        for k, v in d.items():
            self[k] = v

    def __setitem__(self, k, v):
        if isinstance(v, dict) and not isinstance(v, EasyDict):
            v = EasyDict(v)
        super().__setitem__(k, v)
        object.__setattr__(self, k, v)

    __setattr__ = __setitem__

    def __getattr__(self, k):
        try:
            return self[k]
        except KeyError as e:
            raise AttributeError(k) from e


# ------------------------------------------------------------- torchvision
def _conv3x3(inp, out, stride=1):
    return nn.Conv2d(inp, out, 3, stride=stride, padding=1, bias=False)


def _conv1x1(inp, out, stride=1):
    return nn.Conv2d(inp, out, 1, stride=stride, bias=False)


class BasicBlock(nn.Module):
    expansion = 1

    def __init__(self, inplanes, planes, stride=1, downsample=None,
                 groups=1, base_width=64, dilation=1, norm_layer=None):
        super().__init__()
        norm_layer = norm_layer or nn.BatchNorm2d
        self.conv1 = _conv3x3(inplanes, planes, stride)
        self.bn1 = norm_layer(planes)
        self.relu = nn.ReLU(inplace=True)
        self.conv2 = _conv3x3(planes, planes)
        self.bn2 = norm_layer(planes)
        self.downsample = downsample
        self.stride = stride

    def forward(self, x):
        identity = x
        out = self.relu(self.bn1(self.conv1(x)))
        out = self.bn2(self.conv2(out))
        if self.downsample is not None:
            identity = self.downsample(x)
        return self.relu(out + identity)


class Bottleneck(nn.Module):
    expansion = 4

    def __init__(self, inplanes, planes, stride=1, downsample=None,
                 groups=1, base_width=64, dilation=1, norm_layer=None):
        super().__init__()
        norm_layer = norm_layer or nn.BatchNorm2d
        width = int(planes * (base_width / 64.0)) * groups
        self.conv1 = _conv1x1(inplanes, width)
        self.bn1 = norm_layer(width)
        self.conv2 = _conv3x3(width, width, stride)
        self.bn2 = norm_layer(width)
        self.conv3 = _conv1x1(width, planes * self.expansion)
        self.bn3 = norm_layer(planes * self.expansion)
        self.relu = nn.ReLU(inplace=True)
        self.downsample = downsample
        self.stride = stride

    def forward(self, x):
        identity = x
        out = self.relu(self.bn1(self.conv1(x)))
        out = self.relu(self.bn2(self.conv2(out)))
        out = self.bn3(self.conv3(out))
        if self.downsample is not None:
            identity = self.downsample(x)
        return self.relu(out + identity)


class ResNet(nn.Module):
    def __init__(self, block, layers, num_classes=1000, norm_layer=None, **kw):
        super().__init__()
        self._norm_layer = norm_layer or nn.BatchNorm2d
        self.inplanes = 64
        self.conv1 = nn.Conv2d(3, 64, 7, stride=2, padding=3, bias=False)
        self.bn1 = self._norm_layer(64)
        self.relu = nn.ReLU(inplace=True)
        self.maxpool = nn.MaxPool2d(kernel_size=3, stride=2, padding=1)
        self.layer1 = self._make_layer(block, 64, layers[0])
        self.layer2 = self._make_layer(block, 128, layers[1], stride=2)
        self.layer3 = self._make_layer(block, 256, layers[2], stride=2)
        self.layer4 = self._make_layer(block, 512, layers[3], stride=2)
        self.avgpool = nn.AdaptiveAvgPool2d((1, 1))
        self.fc = nn.Linear(512 * block.expansion, num_classes)

    def _make_layer(self, block, planes, blocks, stride=1):
        norm_layer = self._norm_layer
        downsample = None
        if stride != 1 or self.inplanes != planes * block.expansion:
            downsample = nn.Sequential(
                _conv1x1(self.inplanes, planes * block.expansion, stride),
                norm_layer(planes * block.expansion),
            )
        layers = [block(self.inplanes, planes, stride, downsample,
                        norm_layer=norm_layer)]
        self.inplanes = planes * block.expansion
        for _ in range(1, blocks):
            layers.append(block(self.inplanes, planes, norm_layer=norm_layer))
        return nn.Sequential(*layers)

    def forward(self, x):
        x = self.maxpool(self.relu(self.bn1(self.conv1(x))))
        x = self.layer4(self.layer3(self.layer2(self.layer1(x))))
        x = torch.flatten(self.avgpool(x), 1)
        return self.fc(x)


def resnet18(norm_layer=None, **kw):
    return ResNet(BasicBlock, [2, 2, 2, 2], norm_layer=norm_layer, **kw)


def resnet34(norm_layer=None, **kw):
    return ResNet(BasicBlock, [3, 4, 6, 3], norm_layer=norm_layer, **kw)


def resnet50(norm_layer=None, **kw):
    return ResNet(Bottleneck, [3, 4, 6, 3], norm_layer=norm_layer, **kw)


# ------------------------------------------------------------------- e3nn
def _wigner_D(degree, alpha, beta, gamma):
    if int(degree) == 0:
        shape = (*alpha.shape, 1, 1)
        return torch.ones(shape, dtype=alpha.dtype)
    raise NotImplementedError(
        "e3nn stub supports degree 0 only (adapter parity runs at sh_degree"
        " 0; SH rotation correctness is covered by the functional round-trip"
        " test in tests/test_ops.py)"
    )


def _matrix_to_angles(R):
    zeros = torch.zeros(R.shape[:-2], dtype=R.dtype)
    return zeros, zeros.clone(), zeros.clone()


def install():
    """Install stub modules into sys.modules (idempotent)."""
    if "easydict" not in sys.modules:
        m = types.ModuleType("easydict")
        m.EasyDict = EasyDict
        sys.modules["easydict"] = m

    if "torchvision" not in sys.modules:
        tv = types.ModuleType("torchvision")
        models = types.ModuleType("torchvision.models")
        resnet_mod = types.ModuleType("torchvision.models.resnet")
        resnet_mod.BasicBlock = BasicBlock
        resnet_mod.Bottleneck = Bottleneck
        resnet_mod.ResNet = ResNet
        resnet_mod.model_urls = {}
        for name, fn in [("resnet18", resnet18), ("resnet34", resnet34),
                         ("resnet50", resnet50)]:
            setattr(models, name, fn)
            setattr(resnet_mod, name, fn)
        models.ResNet = ResNet
        models.resnet = resnet_mod
        tv.models = models
        sys.modules["torchvision"] = tv
        sys.modules["torchvision.models"] = models
        sys.modules["torchvision.models.resnet"] = resnet_mod

    if "omegaconf" not in sys.modules:
        oc = types.ModuleType("omegaconf")

        class DictConfig(dict):
            pass

        class OmegaConf:
            @staticmethod
            def create(d=None):
                return DictConfig(d or {})

        oc.DictConfig = DictConfig
        oc.OmegaConf = OmegaConf
        sys.modules["omegaconf"] = oc

    # Empty placeholder modules for observability deps pulled in by the
    # reference's visualization import chain (never exercised numerically).
    # Only stub modules that genuinely do not exist — shadowing an installed
    # package (e.g. imageio) breaks its submodule imports everywhere else.
    import importlib.util

    for name in ("wandb", "visdom", "pytorch_lightning", "skimage",
                 "skimage.metrics", "plyfile", "lpips", "colorspacious",
                 "svg", "flow_vis", "mediapy", "configargparse"):
        if name in sys.modules:
            continue
        try:
            if importlib.util.find_spec(name) is not None:
                continue
        except (ImportError, ModuleNotFoundError, ValueError, TypeError):
            pass
        mod = types.ModuleType(name)
        mod.__path__ = []  # keep find_spec on submodules well-behaved
        mod.__getattr__ = lambda attr, _n=name: types.SimpleNamespace()
        sys.modules[name] = mod

    if "e3nn" not in sys.modules:
        e3nn = types.ModuleType("e3nn")
        o3 = types.ModuleType("e3nn.o3")
        o3.wigner_D = _wigner_D
        o3.matrix_to_angles = _matrix_to_angles
        e3nn.o3 = o3
        sys.modules["e3nn"] = e3nn
        sys.modules["e3nn.o3"] = o3

    if "/root/reference" not in sys.path:
        sys.path.insert(0, "/root/reference")
