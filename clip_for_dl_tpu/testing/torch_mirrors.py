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


class TorchViTLayer(tnn.Module):
    """torchvision vit_b_16 encoder layer topology + state_dict naming."""

    def __init__(self, hidden: int = 768, heads: int = 12,
                 mlp: int = 3072):
        super().__init__()
        self.ln_1 = tnn.LayerNorm(hidden, eps=1e-6)
        self.self_attention = tnn.MultiheadAttention(
            hidden, heads, batch_first=True
        )
        self.ln_2 = tnn.LayerNorm(hidden, eps=1e-6)
        self.mlp = tnn.Sequential(
            tnn.Linear(hidden, mlp), tnn.GELU(), tnn.Dropout(0.0),
            tnn.Linear(mlp, hidden), tnn.Dropout(0.0),
        )

    def forward(self, x):
        y = self.ln_1(x)
        a, _ = self.self_attention(y, y, y, need_weights=False)
        x = x + a
        return x + self.mlp(self.ln_2(x))


class TorchViT(tnn.Module):
    """torchvision vit_b_16 topology with matching state_dict keys
    (vit_vision/chestxray_CLIP_vitvision.ipynb cell 24's image tower);
    returns the post-LN class-token embedding."""

    def __init__(self, image_size: int = 224, patch: int = 16,
                 hidden: int = 768, layers: int = 12, heads: int = 12,
                 mlp: int = 3072):
        super().__init__()
        n = (image_size // patch) ** 2
        self.conv_proj = tnn.Conv2d(3, hidden, patch, patch)
        self.class_token = tnn.Parameter(torch.randn(1, 1, hidden) * 0.02)
        self.encoder = tnn.Module()
        self.encoder.pos_embedding = tnn.Parameter(
            torch.randn(1, n + 1, hidden) * 0.02
        )
        self.encoder.layers = tnn.Sequential(
            *[TorchViTLayer(hidden, heads, mlp) for _ in range(layers)]
        )
        # torchvision names layers encoder.layers.encoder_layer_N
        self.encoder.layers._modules = {
            f"encoder_layer_{i}": m
            for i, m in enumerate(self.encoder.layers._modules.values())
        }
        self.encoder.ln = tnn.LayerNorm(hidden, eps=1e-6)

    def forward(self, x):
        b = x.shape[0]
        x = self.conv_proj(x)  # [B, H, g, g]
        x = x.flatten(2).transpose(1, 2)  # [B, n, H]
        x = torch.cat([self.class_token.expand(b, -1, -1), x], dim=1)
        x = x + self.encoder.pos_embedding
        for layer in self.encoder.layers:
            x = layer(x)
        return self.encoder.ln(x)[:, 0]


class TorchAdditiveAttention(tnn.Module):
    """multimodal_attention/train.py:1069-1110 semantics — the enhanced
    zero-shot path's feature mixer (disease_analysis.py:344-346)."""

    def __init__(self, dim: int = 512):
        super().__init__()
        self.image_proj = tnn.Linear(dim, dim)
        self.text_proj = tnn.Linear(dim, dim)
        self.attention = tnn.Linear(dim, 1)
        self.output_proj = tnn.Linear(dim, dim)

    def forward(self, img, txt):
        ip = self.image_proj(img)
        tp = self.text_proj(txt)
        te = tp.unsqueeze(0).expand(ip.size(0), -1, -1)
        scores = self.attention(torch.tanh(ip.unsqueeze(1) + te))
        w = F.softmax(scores.squeeze(-1), dim=1)
        attended = torch.bmm(w.unsqueeze(1), te).squeeze(1)
        return self.output_proj(ip + attended), w


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
