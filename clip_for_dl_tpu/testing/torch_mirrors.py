"""Torch mirror models for parity testing.

These reproduce the reference's torch module topology and state_dict naming
(torchvision resnet50, the notebook projection heads, MultiViewFusion) so
the weight importers and full pipelines can be validated numerically without
torchvision or network access. Used by tests/ and tools/parity_harness.py.
"""

from __future__ import annotations

import torch
import torch.nn as tnn
import torch.nn.functional as F


class TorchBottleneck(tnn.Module):
    expansion = 4

    def __init__(self, inplanes, planes, stride=1, downsample=None):
        super().__init__()
        self.conv1 = tnn.Conv2d(inplanes, planes, 1, bias=False)
        self.bn1 = tnn.BatchNorm2d(planes)
        self.conv2 = tnn.Conv2d(planes, planes, 3, stride, 1, bias=False)
        self.bn2 = tnn.BatchNorm2d(planes)
        self.conv3 = tnn.Conv2d(planes, planes * 4, 1, bias=False)
        self.bn3 = tnn.BatchNorm2d(planes * 4)
        self.relu = tnn.ReLU(inplace=True)
        self.downsample = downsample

    def forward(self, x):
        identity = x
        out = self.relu(self.bn1(self.conv1(x)))
        out = self.relu(self.bn2(self.conv2(out)))
        out = self.bn3(self.conv3(out))
        if self.downsample is not None:
            identity = self.downsample(x)
        return self.relu(out + identity)


class TorchResNet(tnn.Module):
    """torchvision resnet50 topology + state_dict key naming, headless
    (the fc=Identity contract of 0425/train.py:761-763)."""

    def __init__(self, layers=(3, 4, 6, 3), width=64):
        super().__init__()
        self.inplanes = width
        self.conv1 = tnn.Conv2d(3, width, 7, 2, 3, bias=False)
        self.bn1 = tnn.BatchNorm2d(width)
        self.relu = tnn.ReLU(inplace=True)
        self.maxpool = tnn.MaxPool2d(3, 2, 1)
        self.layer1 = self._make_layer(width, layers[0])
        self.layer2 = self._make_layer(width * 2, layers[1], 2)
        self.layer3 = self._make_layer(width * 4, layers[2], 2)
        self.layer4 = self._make_layer(width * 8, layers[3], 2)
        self.avgpool = tnn.AdaptiveAvgPool2d(1)

    def _make_layer(self, planes, blocks, stride=1):
        downsample = tnn.Sequential(
            tnn.Conv2d(self.inplanes, planes * 4, 1, stride, bias=False),
            tnn.BatchNorm2d(planes * 4),
        )
        out = [TorchBottleneck(self.inplanes, planes, stride, downsample)]
        self.inplanes = planes * 4
        for _ in range(1, blocks):
            out.append(TorchBottleneck(self.inplanes, planes))
        return tnn.Sequential(*out)

    def forward(self, x):
        x = self.maxpool(self.relu(self.bn1(self.conv1(x))))
        x = self.layer4(self.layer3(self.layer2(self.layer1(x))))
        return torch.flatten(self.avgpool(x), 1)


class TorchResidualProjection(tnn.Module):
    """02 nb cell 20 head topology with the reference attribute naming."""

    def __init__(self, in_dim, out_dim, attr="image_projection"):
        super().__init__()
        setattr(self, attr, tnn.Linear(in_dim, out_dim))
        self._attr = attr
        self.fc = tnn.Linear(out_dim, out_dim)
        self.layer_norm = tnn.LayerNorm(out_dim)

    def forward(self, x):
        if x.dim() > 2:
            x = x.flatten(1)
        p = getattr(self, self._attr)(x)
        h = self.fc(F.gelu(p))
        return self.layer_norm(h + p)


class TorchMultiViewFusion(tnn.Module):
    def __init__(self, dim=512, dropout=0.2):
        super().__init__()
        self.fusion = tnn.Sequential(
            tnn.Linear(dim * 2, dim), tnn.ReLU(), tnn.Dropout(dropout),
            tnn.Linear(dim, dim),
        )

    def forward(self, f, l):
        return self.fusion(torch.cat([f, l], dim=1))


def randomize_bn_stats(model: tnn.Module, seed: int = 0) -> None:
    g = torch.Generator().manual_seed(seed)
    for m in model.modules():
        if isinstance(m, tnn.BatchNorm2d):
            m.running_mean.copy_(
                torch.empty_like(m.running_mean).uniform_(-0.5, 0.5, generator=g)
            )
            m.running_var.copy_(
                torch.empty_like(m.running_var).uniform_(0.5, 1.5, generator=g)
            )


def reference_zero_shot_probs(
    resnet: tnn.Module,
    image_projector: tnn.Module,
    text_features: torch.Tensor,
    images_nchw: torch.Tensor,
    temperature: float = 0.5,
) -> torch.Tensor:
    """The reference's zero-shot forward
    (multimodal_attention/disease_analysis.py:330-360): encode → flatten →
    project → normalize → sims/T → sigmoid."""
    with torch.no_grad():
        emb = resnet(images_nchw).flatten(1)
        feats = F.normalize(image_projector(emb), dim=-1)
        sims = feats @ F.normalize(text_features, dim=-1).T / temperature
        return torch.sigmoid(sims)
