"""Functional torchvision stand-in for reference-parity tests.

torchvision is not installed in this image, but the reference
Generator/Discriminator (training/networks_detr.py) build their
backbone via ``torchvision.models.resnet50(...)`` +
``torchvision.models._utils.IntermediateLayerGetter`` (training/
detr_backbone.py:76-112). This module provides a faithful torch
implementation of the standard torchvision ResNet-50 **with identical
module naming** (conv1/bn1/layer{1..4}.{i}.conv{1..3}/bn{1..3}/
downsample.{0,1}/fc) so reference modules can be instantiated offline
and their state dicts exercise `convert_resnet50`'s naming end-to-end.

The architecture here is the public torchvision v1.5 ResNet (stride on
conv2 of each Bottleneck) — standard, not copied from the reference.
"""

from __future__ import annotations

import sys
import types

import torch
from torch import nn


class Bottleneck(nn.Module):
    expansion = 4

    def __init__(self, inplanes, planes, stride=1, downsample=None,
                 dilation=1, norm_layer=None):
        super().__init__()
        norm_layer = norm_layer or nn.BatchNorm2d
        self.conv1 = nn.Conv2d(inplanes, planes, 1, bias=False)
        self.bn1 = norm_layer(planes)
        self.conv2 = nn.Conv2d(planes, planes, 3, stride=stride,
                               padding=dilation, dilation=dilation, bias=False)
        self.bn2 = norm_layer(planes)
        self.conv3 = nn.Conv2d(planes, planes * self.expansion, 1, bias=False)
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
    def __init__(self, layers, num_classes=1000, norm_layer=None,
                 replace_stride_with_dilation=None):
        super().__init__()
        norm_layer = norm_layer or nn.BatchNorm2d
        self._norm_layer = norm_layer
        if replace_stride_with_dilation is None:
            replace_stride_with_dilation = [False, False, False]
        self.inplanes = 64
        self.dilation = 1
        self.conv1 = nn.Conv2d(3, 64, 7, stride=2, padding=3, bias=False)
        self.bn1 = norm_layer(64)
        self.relu = nn.ReLU(inplace=True)
        self.maxpool = nn.MaxPool2d(kernel_size=3, stride=2, padding=1)
        self.layer1 = self._make_layer(64, layers[0])
        self.layer2 = self._make_layer(128, layers[1], stride=2,
                                       dilate=replace_stride_with_dilation[0])
        self.layer3 = self._make_layer(256, layers[2], stride=2,
                                       dilate=replace_stride_with_dilation[1])
        self.layer4 = self._make_layer(512, layers[3], stride=2,
                                       dilate=replace_stride_with_dilation[2])
        self.avgpool = nn.AdaptiveAvgPool2d((1, 1))
        self.fc = nn.Linear(512 * Bottleneck.expansion, num_classes)

    def _make_layer(self, planes, blocks, stride=1, dilate=False):
        norm_layer = self._norm_layer
        previous_dilation = self.dilation
        if dilate:
            self.dilation *= stride
            stride = 1
        downsample = None
        if stride != 1 or self.inplanes != planes * Bottleneck.expansion:
            downsample = nn.Sequential(
                nn.Conv2d(self.inplanes, planes * Bottleneck.expansion, 1,
                          stride=stride, bias=False),
                norm_layer(planes * Bottleneck.expansion),
            )
        layers = [Bottleneck(self.inplanes, planes, stride, downsample,
                             previous_dilation, norm_layer)]
        self.inplanes = planes * Bottleneck.expansion
        for _ in range(1, blocks):
            layers.append(Bottleneck(self.inplanes, planes,
                                     dilation=self.dilation, norm_layer=norm_layer))
        return nn.Sequential(*layers)

    def forward(self, x):
        x = self.maxpool(self.relu(self.bn1(self.conv1(x))))
        x = self.layer4(self.layer3(self.layer2(self.layer1(x))))
        x = torch.flatten(self.avgpool(x), 1)
        return self.fc(x)


def resnet50(pretrained=False, norm_layer=None,
             replace_stride_with_dilation=None, **kwargs):
    del pretrained, kwargs
    return ResNet([3, 4, 6, 3], norm_layer=norm_layer,
                  replace_stride_with_dilation=replace_stride_with_dilation)


class IntermediateLayerGetter(nn.ModuleDict):
    """Minimal torchvision.models._utils.IntermediateLayerGetter."""

    def __init__(self, model, return_layers):
        orig_return_layers = dict(return_layers)
        remaining = dict(return_layers)
        layers = {}
        for name, module in model.named_children():
            layers[name] = module
            if name in remaining:
                del remaining[name]
            if not remaining:
                break
        super().__init__(layers)
        self.return_layers = orig_return_layers

    def forward(self, x):
        from collections import OrderedDict

        out = OrderedDict()
        for name, module in self.items():
            x = module(x)
            if name in self.return_layers:
                out[self.return_layers[name]] = x
        return out


def install():
    """Install (or upgrade conftest's empty) torchvision stubs in sys.modules."""
    import importlib.machinery

    for name in ("torchvision", "torchvision.models", "torchvision.models._utils"):
        if name not in sys.modules:
            mod = types.ModuleType(name)
            mod.__spec__ = importlib.machinery.ModuleSpec(name, loader=None)
            sys.modules[name] = mod
    tv = sys.modules["torchvision"]
    tv.__version__ = "0.15.2"
    tv._is_tracing = lambda: False
    tv.models = sys.modules["torchvision.models"]
    tv.models.resnet50 = resnet50
    tv.models._utils = sys.modules["torchvision.models._utils"]
    tv.models._utils.IntermediateLayerGetter = IntermediateLayerGetter
