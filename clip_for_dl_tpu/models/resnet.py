"""ResNet image tower (v1, torchvision-compatible), NHWC for TPU.

The reference uses torchvision's ImageNet-pretrained ResNet-50 with the FC
head stripped as its image encoder (02_chestxray_CLIP.ipynb cell 24
``nn.Sequential(*children[:-1])``; 0425/train.py:761-763 ``fc=Identity``),
producing 2048-d pooled features.

TPU-first design points:
- NHWC layout end-to-end (XLA's preferred conv layout on TPU; channels ride
  the 128-wide lane dimension).
- bf16 compute with fp32 BatchNorm statistics and fp32 residual adds.
- Inference uses running BN stats (`use_running_average=True`) so the whole
  tower jits into one fused XLA program; training threads `batch_stats`
  through flax mutable collections.
- `capture_stage4` exposes the last conv block's activations as an explicit
  output so Grad-CAM is a plain `jax.grad` — no hooks (SURVEY.md §7).

Weight import: `import_torchvision_resnet50` maps torchvision's state_dict
naming (conv1, bn1, layerN.M.{conv,bn}K, layerN.M.downsample.{0,1}) so real
pretrained weights drop in unchanged.
"""

from __future__ import annotations

from typing import Any, Dict, Mapping, Sequence, Tuple

import flax.linen as nn
import jax.numpy as jnp

from . import torch_import as ti

Dtype = Any


class BottleneckBlock(nn.Module):
    """1x1 → 3x3 → 1x1 bottleneck with expansion 4 (ResNet v1)."""

    features: int
    strides: int = 1
    downsample: bool = False
    dtype: Dtype = jnp.float32
    param_dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, *, train: bool = False):
        conv_kw = dict(
            use_bias=False, dtype=self.dtype, param_dtype=self.param_dtype
        )
        bn_kw = dict(
            use_running_average=not train,
            momentum=0.9,
            epsilon=1e-5,
            dtype=jnp.float32,
            param_dtype=self.param_dtype,
        )
        residual = x
        y = nn.Conv(self.features, (1, 1), name="conv1", **conv_kw)(x)
        y = nn.BatchNorm(name="bn1", **bn_kw)(y).astype(self.dtype)
        y = nn.relu(y)
        y = nn.Conv(
            self.features, (3, 3), strides=(self.strides, self.strides),
            padding=[(1, 1), (1, 1)], name="conv2", **conv_kw,
        )(y)
        y = nn.BatchNorm(name="bn2", **bn_kw)(y).astype(self.dtype)
        y = nn.relu(y)
        y = nn.Conv(self.features * 4, (1, 1), name="conv3", **conv_kw)(y)
        y = nn.BatchNorm(name="bn3", **bn_kw)(y)
        if self.downsample:
            residual = nn.Conv(
                self.features * 4, (1, 1),
                strides=(self.strides, self.strides),
                name="downsample_conv", **conv_kw,
            )(residual)
            residual = nn.BatchNorm(name="downsample_bn", **bn_kw)(residual)
        y = nn.relu(y.astype(jnp.float32) + residual.astype(jnp.float32))
        return y.astype(self.dtype)


class ResNet(nn.Module):
    """ResNet v1 feature extractor (no FC head). Returns pooled [B, 2048]
    features; with `capture_stage4=True` also the pre-pool stage-4 activation
    map [B, 7, 7, 2048] for Grad-CAM."""

    stage_sizes: Sequence[int] = (3, 4, 6, 3)  # ResNet-50
    width: int = 64
    dtype: Dtype = jnp.float32
    param_dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(
        self, images, *, train: bool = False, capture_stage4: bool = False
    ):
        conv_kw = dict(
            use_bias=False, dtype=self.dtype, param_dtype=self.param_dtype
        )
        bn_kw = dict(
            use_running_average=not train,
            momentum=0.9,
            epsilon=1e-5,
            dtype=jnp.float32,
            param_dtype=self.param_dtype,
        )
        x = images.astype(self.dtype)
        x = nn.Conv(
            self.width, (7, 7), strides=(2, 2), padding=[(3, 3), (3, 3)],
            name="conv1", **conv_kw,
        )(x)
        x = nn.BatchNorm(name="bn1", **bn_kw)(x).astype(self.dtype)
        x = nn.relu(x)
        x = nn.max_pool(
            x, (3, 3), strides=(2, 2), padding=[(1, 1), (1, 1)]
        )
        for stage, num_blocks in enumerate(self.stage_sizes):
            features = self.width * (2 ** stage)
            for block in range(num_blocks):
                strides = 2 if stage > 0 and block == 0 else 1
                x = BottleneckBlock(
                    features=features,
                    strides=strides,
                    downsample=(block == 0),
                    dtype=self.dtype,
                    param_dtype=self.param_dtype,
                    name=f"layer{stage + 1}_{block}",
                )(x, train=train)
        stage4 = x  # [B, 7, 7, 2048] at 224 input
        # Global average pool == torch AdaptiveAvgPool2d(1)
        pooled = jnp.mean(x.astype(jnp.float32), axis=(1, 2))
        pooled = pooled.astype(self.dtype)
        if capture_stage4:
            return pooled, stage4
        return pooled


def resnet50(dtype=jnp.float32, param_dtype=jnp.float32) -> ResNet:
    return ResNet(stage_sizes=(3, 4, 6, 3), dtype=dtype, param_dtype=param_dtype)


# ---------------------------------------------------------------------------
# torchvision state_dict import
# ---------------------------------------------------------------------------


def import_torchvision_resnet50(
    sd: Mapping[str, Any], stage_sizes: Sequence[int] = (3, 4, 6, 3)
) -> Tuple[Dict[str, Any], Dict[str, Any]]:
    """torchvision resnet50 state_dict → (params, batch_stats) pytrees."""
    params: Dict[str, Any] = {}
    stats: Dict[str, Any] = {}

    params["conv1"] = ti.conv(sd, "conv1")
    params["bn1"], stats["bn1"] = ti.batchnorm(sd, "bn1")

    for stage, num_blocks in enumerate(stage_sizes):
        for block in range(num_blocks):
            src = f"layer{stage + 1}.{block}"
            dst = f"layer{stage + 1}_{block}"
            p: Dict[str, Any] = {}
            s: Dict[str, Any] = {}
            for i in (1, 2, 3):
                p[f"conv{i}"] = ti.conv(sd, f"{src}.conv{i}")
                p[f"bn{i}"], s[f"bn{i}"] = ti.batchnorm(sd, f"{src}.bn{i}")
            if f"{src}.downsample.0.weight" in sd:
                p["downsample_conv"] = ti.conv(sd, f"{src}.downsample.0")
                p["downsample_bn"], s["downsample_bn"] = ti.batchnorm(
                    sd, f"{src}.downsample.1"
                )
            params[dst] = p
            stats[dst] = s
    return params, stats
