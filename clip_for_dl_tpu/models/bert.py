"""BERT text tower (Bio_ClinicalBERT geometry), CLS-pooled.

The reference loads HF ``emilyalsentzer/Bio_ClinicalBERT`` and pools the CLS
token of ``last_hidden_state`` (0425/train.py:775-776,806-824; 02 nb cell 24).
This is a from-scratch flax implementation of the bert-base encoder with an
importer for HF ``BertModel`` state_dicts, so the real clinical weights drop
in for parity runs.

TPU-first notes:
- Fixed max_length padding (the reference's tokenizer setting) keeps shapes
  static under jit; the attention mask is an additive bias so batches of
  ragged reports compile once.
- bf16 matmuls with fp32 softmax/LayerNorm; seq ≤ 512 needs no sequence
  parallelism (SURVEY.md §5.7) but attention is written batched [B, H, L, L]
  so a mesh axis can shard B.
"""

from __future__ import annotations

from typing import Any, Dict, Mapping, Optional

import flax.linen as nn
import jax.numpy as jnp

from . import torch_import as ti

Dtype = Any


class BertEmbeddings(nn.Module):
    vocab_size: int
    hidden: int
    max_position: int = 512
    type_vocab: int = 2
    dropout: float = 0.1
    dtype: Dtype = jnp.float32
    param_dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, input_ids, token_type_ids=None, *, deterministic=True):
        b, l = input_ids.shape
        if token_type_ids is None:
            token_type_ids = jnp.zeros_like(input_ids)
        positions = jnp.arange(l)[None, :]
        kw = dict(param_dtype=self.param_dtype, dtype=self.dtype)
        we = nn.Embed(self.vocab_size, self.hidden, name="word_embeddings", **kw)
        pe = nn.Embed(self.max_position, self.hidden, name="position_embeddings", **kw)
        te = nn.Embed(self.type_vocab, self.hidden, name="token_type_embeddings", **kw)
        x = we(input_ids) + pe(positions) + te(token_type_ids)
        x = nn.LayerNorm(
            epsilon=1e-12, dtype=jnp.float32, param_dtype=self.param_dtype,
            name="layer_norm",
        )(x.astype(jnp.float32)).astype(self.dtype)
        return nn.Dropout(self.dropout, deterministic=deterministic)(x)


class BertSelfAttention(nn.Module):
    hidden: int
    heads: int
    dropout: float = 0.1
    # Store the softmax'd attention probabilities in bf16 (training knob).
    # The forward math is unchanged to bf16 rounding (the PV einsum already
    # casts probs to the compute dtype); what changes is the residual the
    # backward pass SAVES: fp32 [B, H, L, L] per layer becomes bf16,
    # halving its HBM footprint and the layout copies XLA emits for the
    # softmax/dropout backward (trace-measured: those copies are ~12% of
    # the B=128 seq200 pretrain step). Off by default for bitwise
    # default-path stability; opt in via ModelConfig.bf16_attention_probs.
    bf16_probs: bool = False
    # Fused flash attention (ops/flash_attention.py): Pallas forward AND
    # backward, logits/probs never reach HBM and no [B, H, L, L] residual
    # is saved — the training memory/bandwidth fix for the text tower
    # (the fp32 logits residual is 4.8 GB at B=128 L=256 across 12
    # layers). Attention-prob dropout runs in-kernel (counter-hash RNG,
    # regenerated in the backward). Falls back when the probabilities
    # must be materialized (sow_weights).
    flash: bool = False
    dtype: Dtype = jnp.float32
    param_dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, bias, *, deterministic=True, sow_weights=False):
        kw = dict(dtype=self.dtype, param_dtype=self.param_dtype)
        h, hd = self.heads, self.hidden // self.heads

        if self.flash and not sow_weights:
            if self.bf16_probs:
                from ..ops.flash_attention import warn_bf16_probs_ignored

                warn_bf16_probs_ignored()
            from ..ops.flash_attention import (
                dropout_seeds_from_rng,
                flash_attention_packed,
            )
            from .vit import _DenseParams

            # PACKED projection: the three q/k/v Dense params (checkpoint
            # tree unchanged) concatenated column-wise into ONE
            # [H, 3H] GEMM, whose output feeds the kernel directly —
            # one wide MXU pass + one HBM stream instead of three narrow
            # ones (the r2 "fused QKV 2.5x slower" negative was the
            # head-major transposes, gone in the layout-native kernel)
            wq, bq = _DenseParams(
                self.hidden, self.hidden, self.param_dtype, name="query"
            )()
            wk, bk = _DenseParams(
                self.hidden, self.hidden, self.param_dtype, name="key"
            )()
            wv, bv = _DenseParams(
                self.hidden, self.hidden, self.param_dtype, name="value"
            )()
            w = jnp.concatenate([wq, wk, wv], axis=1).astype(self.dtype)
            bqkv = jnp.concatenate([bq, bk, bv]).astype(self.dtype)
            qkv = jnp.dot(x.astype(self.dtype), w) + bqkv

            rate = 0.0 if deterministic else self.dropout
            seeds = None
            if rate > 0.0:
                seeds = dropout_seeds_from_rng(
                    self.make_rng("dropout"), x.shape[0]
                )
            out = flash_attention_packed(
                qkv, h,
                None if bias is None else bias[:, 0, 0, :],
                dropout_rate=rate, dropout_seeds=seeds,
            )
            return out.reshape(*x.shape[:-1], self.hidden)
        q = nn.Dense(self.hidden, name="query", **kw)(x)
        k = nn.Dense(self.hidden, name="key", **kw)(x)
        v = nn.Dense(self.hidden, name="value", **kw)(x)

        def split(t):
            return t.reshape(*t.shape[:-1], h, hd).transpose(0, 2, 1, 3)

        qh, kh, vh = split(q), split(k), split(v)
        logits = jnp.einsum(
            "bhqd,bhkd->bhqk", qh, kh, preferred_element_type=jnp.float32
        ) / jnp.sqrt(jnp.float32(hd))
        if bias is not None:
            logits = logits + bias
        probs = nn.softmax(logits, axis=-1)
        if sow_weights:
            self.sow("intermediates", "attention_weights", probs)
        if self.bf16_probs:
            probs = probs.astype(jnp.bfloat16)
        probs = nn.Dropout(self.dropout, deterministic=deterministic)(probs)
        out = jnp.einsum(
            "bhqk,bhkd->bhqd", probs.astype(self.dtype), vh,
            preferred_element_type=jnp.float32,
        ).astype(self.dtype)
        return out.transpose(0, 2, 1, 3).reshape(*x.shape[:-1], self.hidden)


class BertLayer(nn.Module):
    hidden: int
    heads: int
    intermediate: int
    dropout: float = 0.1
    # >0: this block's MLP is a Switch-routed expert FFN (models/moe.py),
    # shardable over the `expert` mesh axis (parallel/ep.py).
    moe_experts: int = 0
    moe_capacity_factor: float = 1.25
    bf16_probs: bool = False  # see BertSelfAttention.bf16_probs
    flash: bool = False  # see BertSelfAttention.flash
    # Fused Dense→GELU→Dense Pallas TRAINING kernel (ops/mlp_train.py):
    # both MLP GEMMs run back-to-back in VMEM in BOTH directions — no
    # [B, L, 3072] intermediate in HBM, no XLA self-remat recompute
    # (the post-flash trace's top remaining item, ~93 ms/step at B=128).
    # bf16 + MXU-aligned dims only; checkpoint tree unchanged
    # (intermediate/output kernel+bias).
    fused_mlp: bool = False
    dtype: Dtype = jnp.float32
    param_dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, bias, deterministic=True, sow_weights=False):
        # positional signature (remat's static_argnums needs positions)
        kw = dict(dtype=self.dtype, param_dtype=self.param_dtype)
        ln = dict(
            epsilon=1e-12, dtype=jnp.float32, param_dtype=self.param_dtype
        )
        attn = BertSelfAttention(
            self.hidden, self.heads, self.dropout,
            bf16_probs=self.bf16_probs, flash=self.flash,
            name="attention", **kw
        )(x, bias, deterministic=deterministic, sow_weights=sow_weights)
        attn = nn.Dense(self.hidden, name="attention_output", **kw)(attn)
        attn = nn.Dropout(self.dropout, deterministic=deterministic)(attn)
        x = nn.LayerNorm(name="attention_layer_norm", **ln)(
            (x + attn).astype(jnp.float32)
        ).astype(self.dtype)
        if self.moe_experts:
            from .moe import SwitchMoEMLP

            # recover the token mask from the additive attention bias
            # (0 for real tokens, -1e10 for padding) so pads neither
            # consume expert capacity nor skew the aux loss
            mask = None
            if bias is not None:
                mask = (bias[:, 0, 0, :] > -1e4).astype(jnp.float32)
            h = SwitchMoEMLP(
                self.moe_experts, self.intermediate,
                self.moe_capacity_factor, name="moe_mlp", **kw,
            )(x, mask)
        elif (
            self.fused_mlp
            and self.hidden % 128 == 0
            and self.intermediate % 128 == 0
            # bf16 only: the fp32 weight set (2·768·3072·4 B = 18.9 MB)
            # exceeds VMEM; fp32 is the parity mode and keeps XLA anyway
            and jnp.dtype(self.dtype) == jnp.bfloat16
        ):
            from ..ops.mlp_train import dense_gelu_dense
            from .vit import _DenseParams

            w1, b1 = _DenseParams(
                self.hidden, self.intermediate, self.param_dtype,
                name="intermediate",
            )()
            w2, b2 = _DenseParams(
                self.intermediate, self.hidden, self.param_dtype,
                name="output",
            )()
            cast = lambda t: t.astype(self.dtype)
            h = dense_gelu_dense(
                x, cast(w1), cast(b1), cast(w2), cast(b2)
            )
        else:
            h = nn.Dense(self.intermediate, name="intermediate", **kw)(x)
            h = nn.gelu(h, approximate=False)
            h = nn.Dense(self.hidden, name="output", **kw)(h)
        h = nn.Dropout(self.dropout, deterministic=deterministic)(h)
        return nn.LayerNorm(name="output_layer_norm", **ln)(
            (x + h).astype(jnp.float32)
        ).astype(self.dtype)


class BertEncoder(nn.Module):
    """bert-base geometry by default (Bio_ClinicalBERT: 12L/12H/768)."""

    vocab_size: int = 28996
    hidden: int = 768
    layers: int = 12
    heads: int = 12
    intermediate: int = 3072
    max_position: int = 512
    dropout: float = 0.1
    remat: bool = False  # per-layer rematerialization (memory ↔ FLOPs)
    remat_policy: str = "full"  # see models/remat.py
    # MoE (beyond reference): every `moe_every`-th block's MLP routes over
    # `moe_experts` experts (0 = dense everywhere).
    moe_experts: int = 0
    moe_every: int = 2
    moe_capacity_factor: float = 1.25
    bf16_probs: bool = False  # see BertSelfAttention.bf16_probs
    flash: bool = False  # see BertSelfAttention.flash
    fused_mlp: bool = False  # see BertLayer.fused_mlp
    dtype: Dtype = jnp.float32
    param_dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(
        self,
        input_ids: jnp.ndarray,
        attention_mask: Optional[jnp.ndarray] = None,
        token_type_ids: Optional[jnp.ndarray] = None,
        *,
        deterministic: bool = True,
        sow_weights: bool = False,
    ) -> jnp.ndarray:
        """Returns last_hidden_state [B, L, hidden].

        With `remat=True` each encoder layer recomputes its forward in the
        backward pass (jax.checkpoint) — the [B, H, L, L] attention tensors
        never persist, letting training batches scale ~8× on HBM.
        """
        x = BertEmbeddings(
            self.vocab_size, self.hidden, self.max_position,
            dropout=self.dropout, dtype=self.dtype,
            param_dtype=self.param_dtype, name="embeddings",
        )(input_ids, token_type_ids, deterministic=deterministic)
        bias = None
        if attention_mask is not None:
            bias = jnp.where(
                attention_mask[:, None, None, :] > 0, 0.0, -1e10
            ).astype(jnp.float32)
        from .remat import remat_wrap

        layer_cls = remat_wrap(
            BertLayer, self.remat, self.remat_policy, static_argnums=(3, 4)
        )
        for i in range(self.layers):
            moe = (
                self.moe_experts
                if self.moe_experts and i % self.moe_every == self.moe_every - 1
                else 0
            )
            x = layer_cls(
                self.hidden, self.heads, self.intermediate, self.dropout,
                moe_experts=moe,
                moe_capacity_factor=self.moe_capacity_factor,
                bf16_probs=self.bf16_probs, flash=self.flash,
                fused_mlp=self.fused_mlp,
                dtype=self.dtype, param_dtype=self.param_dtype,
                name=f"layer_{i}",
            )(x, bias, deterministic, sow_weights)
        return x

    def cls_pool(self, last_hidden_state: jnp.ndarray) -> jnp.ndarray:
        """CLS-token pooling: last_hidden_state[:, 0, :] (0425/train.py:820)."""
        return last_hidden_state[:, 0, :]


def bio_clinical_bert(dtype=jnp.float32, param_dtype=jnp.float32) -> BertEncoder:
    """Bio_ClinicalBERT geometry: BERT-base with the cased 28996 vocab."""
    return BertEncoder(dtype=dtype, param_dtype=param_dtype)


# ---------------------------------------------------------------------------
# HF BertModel state_dict import
# ---------------------------------------------------------------------------


def import_hf_bert(
    sd: Mapping[str, Any], layers: Optional[int] = None
) -> Dict[str, Any]:
    """HF transformers BertModel state_dict → BertEncoder params pytree.

    Accepts both bare ("embeddings...") and prefixed ("bert.embeddings...")
    key layouts; ignores the pooler (the reference CLS-pools manually).
    Layer count is inferred from the keys when not given.
    """
    if any(k.startswith("bert.") for k in sd):
        sd = {k[len("bert."):]: v for k, v in sd.items() if k.startswith("bert.")}
    if layers is None:
        layers = 1 + max(
            (int(k.split(".")[2]) for k in sd if k.startswith("encoder.layer.")),
            default=-1,
        )

    params: Dict[str, Any] = {
        "embeddings": {
            "word_embeddings": ti.embedding(sd, "embeddings.word_embeddings"),
            "position_embeddings": ti.embedding(
                sd, "embeddings.position_embeddings"
            ),
            "token_type_embeddings": ti.embedding(
                sd, "embeddings.token_type_embeddings"
            ),
            "layer_norm": ti.layernorm(sd, "embeddings.LayerNorm"),
        }
    }
    for i in range(layers):
        src = f"encoder.layer.{i}"
        params[f"layer_{i}"] = {
            "attention": {
                "query": ti.linear(sd, f"{src}.attention.self.query"),
                "key": ti.linear(sd, f"{src}.attention.self.key"),
                "value": ti.linear(sd, f"{src}.attention.self.value"),
            },
            "attention_output": ti.linear(sd, f"{src}.attention.output.dense"),
            "attention_layer_norm": ti.layernorm(
                sd, f"{src}.attention.output.LayerNorm"
            ),
            "intermediate": ti.linear(sd, f"{src}.intermediate.dense"),
            "output": ti.linear(sd, f"{src}.output.dense"),
            "output_layer_norm": ti.layernorm(sd, f"{src}.output.LayerNorm"),
        }
    return params
