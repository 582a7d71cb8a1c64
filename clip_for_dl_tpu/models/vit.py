"""ViT image tower (torchvision vit_b_16-compatible), NHWC patches.

The reference's ViT variant swaps the image encoder to torchvision's
``vit_b_16`` with ``heads.head = nn.Identity()`` → 768-d CLS features
(vit_vision/chestxray_CLIP_vitvision.ipynb cell 24) and visualizes attention
rollout from every encoder layer's self-attention weights (cell 34).

Design: pre-norm transformer; patchify is a single [B, 196, 768] reshape +
Dense (the 16×16 conv is exactly a matmul over flattened patches — MXU
native); attention probabilities can be sown into the ``intermediates``
collection for rollout, replacing the reference's forward hooks.

`import_torchvision_vit_b16` maps torchvision's state_dict naming
(conv_proj, class_token, encoder.pos_embedding,
encoder.layers.encoder_layer_N.*, encoder.ln).
"""

from __future__ import annotations

from typing import Any, Dict, Mapping

import flax.linen as nn
import jax.numpy as jnp

from . import torch_import as ti

Dtype = Any


class _DenseParams(nn.Module):
    """Declares nn.Dense's exact param tree (kernel/bias, same inits)
    without running the matmul — lets the fused-MLP branch reach the raw
    tensors under the same checkpoint names mlp_1/mlp_2."""

    in_features: int
    features: int
    param_dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self):
        kernel = self.param(
            "kernel", nn.initializers.lecun_normal(),
            (self.in_features, self.features), self.param_dtype,
        )
        bias = self.param(
            "bias", nn.initializers.zeros, (self.features,), self.param_dtype
        )
        return kernel, bias


class _LayerNormParams(nn.Module):
    """nn.LayerNorm's param tree (scale/bias) without the normalization."""

    features: int
    param_dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self):
        scale = self.param(
            "scale", nn.initializers.ones, (self.features,), self.param_dtype
        )
        bias = self.param(
            "bias", nn.initializers.zeros, (self.features,), self.param_dtype
        )
        return scale, bias


class ViTEncoderLayer(nn.Module):
    hidden: int
    heads: int
    mlp_dim: int
    dropout: float = 0.0
    gelu_approximate: bool = False  # see ViT.gelu_approximate
    # Route LN2→mlp_1→GELU→mlp_2→residual through the Pallas fused MLP
    # block (ops/mlp_block.py) — the measured ViT inference win: the
    # trace-identified 29%-efficiency GEMM+LayerNorm epilogue fusions
    # (45.8% of the zero-shot step) become one VMEM-resident kernel at
    # ~102 TF/s, 3.5× the XLA composition standalone (NOTES.md r2).
    # Inference-only by measurement (training wiring was slower — see the
    # gate below); differentiable THROUGH the inference forward via the
    # custom VJP (GradCAM). Training traces, MXU-unaligned tiny configs
    # and fp32 fall back to the XLA path bitwise.
    fused_mlp: bool = False
    # Route the MLP's Dense→GELU→Dense segment through the Pallas
    # TRAINING kernel (ops/mlp_train.py — fused fwd AND bwd, the
    # [B, N, mlp_dim] intermediate never reaches HBM in either
    # direction; LN2/residual stay in XLA). This is NOT the r2 negative:
    # that wired the INFERENCE kernel's custom VJP, whose backward
    # recomputes the whole block in XLA (ViT pretrain 296.9 → 281.3
    # img/s); the training kernel's Pallas backward is what made
    # models/bert.py's MLPs faster (+7.4% at B=256, temp HBM
    # 11.19 → 8.04 GB at B=128 — benchmarks/flash_attention_train.md).
    # Engages only while the MLP's internal dropout is inactive (the
    # CLIP ViT tower runs dropout=0.0, matching torchvision's
    # vit_b_16 default); bf16 + MXU-aligned dims, checkpoint tree
    # unchanged. The inference fused_mlp (which also fuses LN2) wins
    # at inference and takes precedence when both flags are on.
    fused_mlp_train: bool = False
    # Store attention probabilities in bf16 (training knob; halves the
    # saved [B, H, N, N] softmax residual + its backward layout copies —
    # see models/bert.py BertSelfAttention.bf16_probs for the trace data).
    bf16_probs: bool = False
    # Fused flash attention (ops/flash_attention.py): Pallas forward AND
    # backward with in-kernel dropout — the TRAINING-path kernel (no
    # [B, H, N, N] residual saved; recompute-from-qk backward). At
    # inference it is NEUTRAL (2,305 vs 2,324 img/s zero-shot B=256 —
    # the D=64-narrow attention matmuls cap the kernel where XLA's big
    # batched GEMMs don't suffer), so serving keeps the XLA path; the
    # r1 forward-only fused-MHA kernel this superseded measured an
    # outright in-model LOSS (1,862 img/s) and was deleted (NOTES.md
    # "fused attention kernel history"). Falls back when the
    # probabilities must be materialized (sow_weights).
    flash: bool = False
    dtype: Dtype = jnp.float32
    param_dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, deterministic=True, sow_weights=False):
        # positional signature (remat's static_argnums needs positions)
        kw = dict(dtype=self.dtype, param_dtype=self.param_dtype)
        ln = dict(epsilon=1e-6, dtype=jnp.float32, param_dtype=self.param_dtype)
        h, hd = self.heads, self.hidden // self.heads

        y = nn.LayerNorm(name="ln_1", **ln)(x.astype(jnp.float32)).astype(self.dtype)

        use_flash = self.flash and not sow_weights
        if use_flash:
            if self.bf16_probs:
                from ..ops.flash_attention import warn_bf16_probs_ignored

                warn_bf16_probs_ignored()
            from ..ops.flash_attention import (
                dropout_seeds_from_rng,
                flash_attention_packed,
            )

            # packed q|k|v projection into one wide GEMM feeding the
            # kernel's native layout — see models/bert.py flash note;
            # checkpoint tree (q_proj/k_proj/v_proj) unchanged
            wq, bq = _DenseParams(
                self.hidden, self.hidden, self.param_dtype, name="q_proj"
            )()
            wk, bk = _DenseParams(
                self.hidden, self.hidden, self.param_dtype, name="k_proj"
            )()
            wv, bv = _DenseParams(
                self.hidden, self.hidden, self.param_dtype, name="v_proj"
            )()
            w = jnp.concatenate([wq, wk, wv], axis=1).astype(self.dtype)
            bqkv = jnp.concatenate([bq, bk, bv]).astype(self.dtype)
            qkv = jnp.dot(y, w) + bqkv

            rate = 0.0 if deterministic else self.dropout
            seeds = None
            if rate > 0.0:
                seeds = dropout_seeds_from_rng(
                    self.make_rng("dropout"), x.shape[0]
                )
            attn = flash_attention_packed(
                qkv, h, dropout_rate=rate, dropout_seeds=seeds,
            ).reshape(*x.shape)
        else:
            q = nn.Dense(self.hidden, name="q_proj", **kw)(y)
            k = nn.Dense(self.hidden, name="k_proj", **kw)(y)
            v = nn.Dense(self.hidden, name="v_proj", **kw)(y)

            def split(t):
                return t.reshape(*t.shape[:-1], h, hd).transpose(0, 2, 1, 3)

            logits = jnp.einsum(
                "bhqd,bhkd->bhqk", split(q), split(k),
                preferred_element_type=jnp.float32,
            ) / jnp.sqrt(jnp.float32(hd))
            probs = nn.softmax(logits, axis=-1)
            if sow_weights:
                self.sow("intermediates", "attention_weights", probs)
            if self.bf16_probs:
                probs = probs.astype(jnp.bfloat16)
            probs = nn.Dropout(self.dropout, deterministic=deterministic)(probs)
            attn = jnp.einsum(
                "bhqk,bhkd->bhqd", probs.astype(self.dtype), split(v),
                preferred_element_type=jnp.float32,
            ).astype(self.dtype)
        attn = attn.astype(self.dtype)
        if not use_flash:  # flash returns [B, N, hidden] already
            attn = attn.transpose(0, 2, 1, 3).reshape(*x.shape)
        attn = nn.Dense(self.hidden, name="out_proj", **kw)(attn)
        attn = nn.Dropout(self.dropout, deterministic=deterministic)(attn)
        x = x + attn

        use_fused_mlp = (
            self.fused_mlp
            and deterministic  # inference-only BY MEASUREMENT: wiring the
            # kernel into the training trace (custom VJP, exact-XLA
            # backward recomputed from the inputs) was measured SLOWER —
            # ViT pretrain B=128 seq200: 296.9 → 281.3 img/s, the
            # backward's block recompute outweighs the forward win
            # (NOTES r2). The custom VJP is still wired so differentiating
            # THROUGH an inference forward (GradCAM on a --fused-mlp
            # model) works instead of raising.
            and self.hidden % 128 == 0
            and self.mlp_dim % 128 == 0
            # bf16 only: the fp32 weight set alone (2·768·3072·4 B =
            # 18.9 MB) exceeds the 16 MB scoped VMEM the kernel budgets —
            # fall back rather than fail Mosaic compile; fp32 is the
            # parity mode and keeps the parity (XLA) path anyway
            and jnp.dtype(self.dtype) == jnp.bfloat16
        )
        if use_fused_mlp:
            from ..ops.mlp_block import fused_mlp_block_trainable

            ls, lbias = _LayerNormParams(
                self.hidden, self.param_dtype, name="ln_2"
            )()
            w1, b1 = _DenseParams(
                self.hidden, self.mlp_dim, self.param_dtype, name="mlp_1"
            )()
            w2, b2 = _DenseParams(
                self.mlp_dim, self.hidden, self.param_dtype, name="mlp_2"
            )()
            return fused_mlp_block_trainable(
                x, ls, lbias, w1, b1, w2, b2,
                eps=1e-6, gelu_approximate=self.gelu_approximate,
            )
        mlp_rate = 0.0 if deterministic else self.dropout
        use_fused_mlp_train = (
            self.fused_mlp_train
            and mlp_rate == 0.0  # kernel has no internal dropout point
            and self.hidden % 128 == 0
            and self.mlp_dim % 128 == 0
            # bf16 only — same VMEM budget argument as fused_mlp above
            and jnp.dtype(self.dtype) == jnp.bfloat16
        )
        if use_fused_mlp_train:
            from ..ops.mlp_train import dense_gelu_dense

            y = nn.LayerNorm(name="ln_2", **ln)(
                x.astype(jnp.float32)
            ).astype(self.dtype)
            w1, b1 = _DenseParams(
                self.hidden, self.mlp_dim, self.param_dtype, name="mlp_1"
            )()
            w2, b2 = _DenseParams(
                self.mlp_dim, self.hidden, self.param_dtype, name="mlp_2"
            )()
            cast = lambda t: t.astype(self.dtype)
            return x + dense_gelu_dense(
                y, cast(w1), cast(b1), cast(w2), cast(b2),
                approximate=self.gelu_approximate,
            )
        y = nn.LayerNorm(name="ln_2", **ln)(x.astype(jnp.float32)).astype(self.dtype)
        y = nn.Dense(self.mlp_dim, name="mlp_1", **kw)(y)
        y = nn.gelu(y, approximate=self.gelu_approximate)
        y = nn.Dropout(self.dropout, deterministic=deterministic)(y)
        y = nn.Dense(self.hidden, name="mlp_2", **kw)(y)
        y = nn.Dropout(self.dropout, deterministic=deterministic)(y)
        return x + y


class ViT(nn.Module):
    """Returns CLS features [B, hidden] (the heads.head=Identity contract)."""

    image_size: int = 224
    patch: int = 16
    hidden: int = 768
    layers: int = 12
    heads: int = 12
    mlp_dim: int = 3072
    dropout: float = 0.0
    remat: bool = False  # per-layer rematerialization for training memory
    remat_policy: str = "full"  # see models/remat.py
    # Serving knob: tanh-approximate GELU is 1.19× end-to-end on v5e
    # (111.6 → 93.8 ms at B=256, measured) but departs from torchvision's
    # exact-erf GELU by ~1e-3 relative — parity runs must keep it False.
    gelu_approximate: bool = False
    fused_mlp: bool = False  # see ViTEncoderLayer.fused_mlp
    fused_mlp_train: bool = False  # see ViTEncoderLayer.fused_mlp_train
    bf16_probs: bool = False  # see ViTEncoderLayer.bf16_probs
    flash: bool = False  # see ViTEncoderLayer.flash
    dtype: Dtype = jnp.float32
    param_dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, images, *, deterministic=True, sow_weights=False):
        b, hgt, wdt, c = images.shape
        p = self.patch
        gh, gw = hgt // p, wdt // p
        kw = dict(dtype=self.dtype, param_dtype=self.param_dtype)
        x = images.astype(self.dtype)
        # Patchify as reshape + Dense ≡ Conv2d(3, hidden, 16, stride 16).
        x = x.reshape(b, gh, p, gw, p, c).transpose(0, 1, 3, 2, 4, 5)
        x = x.reshape(b, gh * gw, p * p * c)
        x = nn.Dense(self.hidden, name="patch_embed", **kw)(x)

        cls = self.param(
            "class_token",
            nn.initializers.zeros,
            (1, 1, self.hidden),
            self.param_dtype,
        )
        x = jnp.concatenate(
            [jnp.broadcast_to(cls, (b, 1, self.hidden)).astype(self.dtype), x],
            axis=1,
        )
        pos = self.param(
            "pos_embedding",
            nn.initializers.normal(0.02),
            (1, gh * gw + 1, self.hidden),
            self.param_dtype,
        )
        x = x + pos.astype(self.dtype)
        x = nn.Dropout(self.dropout, deterministic=deterministic)(x)

        from .remat import remat_wrap

        layer_cls = remat_wrap(
            ViTEncoderLayer, self.remat, self.remat_policy,
            static_argnums=(2, 3),
        )
        for i in range(self.layers):
            x = layer_cls(
                self.hidden, self.heads, self.mlp_dim, self.dropout,
                self.gelu_approximate,
                fused_mlp=self.fused_mlp,
                fused_mlp_train=self.fused_mlp_train,
                bf16_probs=self.bf16_probs, flash=self.flash,
                dtype=self.dtype, param_dtype=self.param_dtype,
                name=f"layer_{i}",
            )(x, deterministic, sow_weights)

        x = nn.LayerNorm(
            epsilon=1e-6, dtype=jnp.float32, param_dtype=self.param_dtype,
            name="ln",
        )(x.astype(jnp.float32)).astype(self.dtype)
        return x[:, 0, :]


def vit_b16(dtype=jnp.float32, param_dtype=jnp.float32) -> ViT:
    return ViT(dtype=dtype, param_dtype=param_dtype)


def import_torchvision_vit_b16(
    sd: Mapping[str, Any], layers: int = 12, hidden: int = 768
) -> Dict[str, Any]:
    """torchvision vit_b_16 state_dict → ViT params pytree.

    conv_proj's [hidden, 3, 16, 16] kernel flattens to the patch-Dense
    [16*16*3, hidden] kernel (patch pixels row-major, channel fastest —
    matching our patchify reshape order HWC per patch).
    """
    w = ti.to_np(sd["conv_proj.weight"])  # [hidden, C, P, P]
    kernel = w.transpose(2, 3, 1, 0).reshape(-1, hidden)  # P,P,C → flat
    params: Dict[str, Any] = {
        "patch_embed": {"kernel": kernel, "bias": ti.to_np(sd["conv_proj.bias"])},
        "class_token": ti.to_np(sd["class_token"]),
        "pos_embedding": ti.to_np(sd["encoder.pos_embedding"]),
        "ln": ti.layernorm(sd, "encoder.ln"),
    }
    for i in range(layers):
        src = f"encoder.layers.encoder_layer_{i}"
        mha = ti.torch_mha(sd, f"{src}.self_attention", hidden)
        params[f"layer_{i}"] = {
            "ln_1": ti.layernorm(sd, f"{src}.ln_1"),
            "q_proj": mha["q_proj"],
            "k_proj": mha["k_proj"],
            "v_proj": mha["v_proj"],
            "out_proj": mha["out_proj"],
            "ln_2": ti.layernorm(sd, f"{src}.ln_2"),
            "mlp_1": ti.linear(sd, f"{src}.mlp.0"),
            "mlp_2": ti.linear(sd, f"{src}.mlp.3"),
        }
    return params
