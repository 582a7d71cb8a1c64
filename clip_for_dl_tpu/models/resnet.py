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
    """1x1 → 3x3 → 1x1 bottleneck with expansion 4 (ResNet v1).

    `fold_bn=True` builds the inference-optimized topology: BatchNorm is
    pre-folded into each conv's kernel/bias (see fold_batchnorm), removing
    all normalization math and fp32 round-trips from the hot path."""

    features: int
    strides: int = 1
    downsample: bool = False
    fold_bn: bool = False
    dtype: Dtype = jnp.float32
    param_dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        conv_kw = dict(
            use_bias=self.fold_bn, dtype=self.dtype,
            param_dtype=self.param_dtype,
        )
        bn_kw = dict(
            use_running_average=not train,
            momentum=0.9,
            epsilon=1e-5,
            dtype=jnp.float32,
            param_dtype=self.param_dtype,
        )

        def norm(name, y):
            if self.fold_bn:
                return y
            return nn.BatchNorm(name=name, **bn_kw)(y).astype(self.dtype)

        residual = x
        y = nn.Conv(self.features, (1, 1), name="conv1", **conv_kw)(x)
        y = nn.relu(norm("bn1", y))
        y = nn.Conv(
            self.features, (3, 3), strides=(self.strides, self.strides),
            padding=[(1, 1), (1, 1)], name="conv2", **conv_kw,
        )(y)
        y = nn.relu(norm("bn2", y))
        y = nn.Conv(self.features * 4, (1, 1), name="conv3", **conv_kw)(y)
        y = norm("bn3", y)
        if self.downsample:
            residual = nn.Conv(
                self.features * 4, (1, 1),
                strides=(self.strides, self.strides),
                name="downsample_conv", **conv_kw,
            )(residual)
            residual = norm("downsample_bn", residual)
        if self.fold_bn:
            y = nn.relu(y + residual)
        else:
            y = nn.relu(y.astype(jnp.float32) + residual.astype(jnp.float32))
        return y.astype(self.dtype)


class ResNet(nn.Module):
    """ResNet v1 feature extractor (no FC head). Returns pooled [B, 2048]
    features; with `capture_stage4=True` also the pre-pool stage-4 activation
    map [B, 7, 7, 2048] for Grad-CAM."""

    stage_sizes: Sequence[int] = (3, 4, 6, 3)  # ResNet-50
    width: int = 64
    fold_bn: bool = False
    remat: bool = False  # per-block rematerialization for training memory
    remat_policy: str = "full"  # see models/remat.py
    space_to_depth: bool = False  # MXU-efficient stem (see below)
    dtype: Dtype = jnp.float32
    param_dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(
        self, images, *, train: bool = False, capture_stage4: bool = False
    ):
        assert not (self.fold_bn and train), "folded BN is inference-only"
        conv_kw = dict(
            use_bias=self.fold_bn, dtype=self.dtype,
            param_dtype=self.param_dtype,
        )
        bn_kw = dict(
            use_running_average=not train,
            momentum=0.9,
            epsilon=1e-5,
            dtype=jnp.float32,
            param_dtype=self.param_dtype,
        )
        x = images.astype(self.dtype)
        if self.space_to_depth:
            # The 7×7/2 stem conv on 3 channels runs the MXU at <10%
            # (measured): 3 input channels vs 128 lanes. Regroup 2×2 pixel
            # blocks into channels ([B,224,224,3] → [B,112,112,12]) and
            # apply the mathematically identical 4×4/1 conv (kernel mapped
            # by convert_conv1_to_s2d; taps that fall outside the original
            # 7×7 field are zero). Exactly equal output, ~4× channel
            # utilization.
            b, h, w, c = x.shape
            x = x.reshape(b, h // 2, 2, w // 2, 2, c)
            x = x.transpose(0, 1, 3, 2, 4, 5).reshape(b, h // 2, w // 2, 4 * c)
            x = nn.Conv(
                self.width, (4, 4), strides=(1, 1),
                padding=[(2, 1), (2, 1)], name="conv1_s2d", **conv_kw,
            )(x)
        else:
            x = nn.Conv(
                self.width, (7, 7), strides=(2, 2), padding=[(3, 3), (3, 3)],
                name="conv1", **conv_kw,
            )(x)
        if not self.fold_bn:
            x = nn.BatchNorm(name="bn1", **bn_kw)(x).astype(self.dtype)
        x = nn.relu(x)
        x = nn.max_pool(
            x, (3, 3), strides=(2, 2), padding=[(1, 1), (1, 1)]
        )
        from .remat import remat_wrap

        block_cls = remat_wrap(
            BottleneckBlock, self.remat, self.remat_policy, static_argnums=(2,)
        )
        for stage, num_blocks in enumerate(self.stage_sizes):
            features = self.width * (2 ** stage)
            for block in range(num_blocks):
                strides = 2 if stage > 0 and block == 0 else 1
                x = block_cls(
                    features=features,
                    strides=strides,
                    downsample=(block == 0),
                    fold_bn=self.fold_bn,
                    dtype=self.dtype,
                    param_dtype=self.param_dtype,
                    name=f"layer{stage + 1}_{block}",
                )(x, train)
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
# space-to-depth stem kernel mapping
# ---------------------------------------------------------------------------


def convert_conv1_to_s2d(kernel) -> "np.ndarray":
    """Standard stem kernel [7,7,C,O] → s2d kernel [4,4,4C,O].

    Derivation: original output (y,x) reads input row r = 2y+dy-3, dy∈[0,7).
    In s2d coordinates (row' = y+dy'-2, parity a): dy = 2·dy' + a − 1 for
    dy'∈[0,4), a∈{0,1}; dy=−1 and dy=7 fall outside the 7-tap field and map
    to zero taps. Channel packing matches the reshape in ResNet.__call__:
    c_new = (a·2 + b)·C + c.
    """
    import numpy as np

    k = np.asarray(kernel)
    kh, kw, c, o = k.shape
    assert kh == 7 and kw == 7, "stem mapping is defined for 7x7/2 kernels"
    out = np.zeros((4, 4, 4 * c, o), k.dtype)
    for dyp in range(4):
        for a in range(2):
            dy = 2 * dyp + a - 1
            if not (0 <= dy < 7):
                continue
            for dxp in range(4):
                for bpar in range(2):
                    dx = 2 * dxp + bpar - 1
                    if not (0 <= dx < 7):
                        continue
                    out[dyp, dxp, (a * 2 + bpar) * c : (a * 2 + bpar + 1) * c, :] = (
                        k[dy, dx]
                    )
    return out


def to_space_to_depth_params(params, stats=None):
    """ResNet params (standard stem) → params for space_to_depth=True."""
    out = dict(params)
    conv1 = dict(out.pop("conv1"))
    conv1["kernel"] = convert_conv1_to_s2d(conv1["kernel"])
    out["conv1_s2d"] = conv1
    return (out, stats) if stats is not None else out


# ---------------------------------------------------------------------------
# BatchNorm folding (inference optimization pass)
# ---------------------------------------------------------------------------


def fold_batchnorm(params, batch_stats, eps: float = 1e-5):
    """ResNet (params, batch_stats) → folded params for `fold_bn=True`.

    Inference BN is the affine map y = (x - μ)·γ/√(σ²+ε) + β; folding it into
    the preceding conv gives W' = W·γ/√(σ²+ε) (per output channel) and
    b' = β - μ·γ/√(σ²+ε), removing every normalization op from the compiled
    program. Exactly equal to the unfolded eval forward (up to one rounding).
    """
    import numpy as np

    def fold_pair(conv, bn, stats):
        kernel = np.asarray(conv["kernel"], np.float32)
        gamma = np.asarray(bn["scale"], np.float32)
        beta = np.asarray(bn["bias"], np.float32)
        mean = np.asarray(stats["mean"], np.float32)
        var = np.asarray(stats["var"], np.float32)
        scale = gamma / np.sqrt(var + eps)
        return {
            "kernel": (kernel * scale[None, None, None, :]).astype(kernel.dtype),
            "bias": (beta - mean * scale).astype(kernel.dtype),
        }

    out = {}
    for name, module in params.items():
        if name == "conv1":
            out["conv1"] = fold_pair(module, params["bn1"], batch_stats["bn1"])
        elif name.startswith("bn"):
            continue
        elif name.startswith("layer"):
            block_p, block_s = module, batch_stats[name]
            folded = {}
            for key in block_p:
                if key.startswith("conv"):
                    i = key[len("conv"):]
                    folded[key] = fold_pair(
                        block_p[key], block_p[f"bn{i}"], block_s[f"bn{i}"]
                    )
                elif key == "downsample_conv":
                    folded[key] = fold_pair(
                        block_p[key], block_p["downsample_bn"],
                        block_s["downsample_bn"],
                    )
            out[name] = folded
        else:
            out[name] = module
    return out


def fold_clip_image_tower(variables):
    """CXRClip variables → variables with the ResNet tower BN-folded
    (drop-in for a `CXRClip(config.replace(...), fold_bn)` — use
    `folded_resnet_variables` on the tower subtree)."""
    params = dict(variables["params"])
    stats = dict(variables.get("batch_stats", {}))
    if "image_tower" in params and "image_tower" in stats:
        params["image_tower"] = fold_batchnorm(
            params["image_tower"], stats["image_tower"]
        )
        stats = {k: v for k, v in stats.items() if k != "image_tower"}
    out = {"params": params}
    if stats:
        out["batch_stats"] = stats
    return out


# ---------------------------------------------------------------------------
# torchvision state_dict import
# ---------------------------------------------------------------------------


def import_torchvision_resnet50(
    sd: Mapping[str, Any], stage_sizes: Sequence[int] | None = None
) -> Tuple[Dict[str, Any], Dict[str, Any]]:
    """torchvision resnet state_dict → (params, batch_stats) pytrees.
    Stage sizes are inferred from the keys when not given."""
    if stage_sizes is None:
        stage_sizes = tuple(
            1 + max(
                (int(k.split(".")[1]) for k in sd
                 if k.startswith(f"layer{s}.")),
                default=-1,
            )
            for s in range(1, 5)
        )
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
