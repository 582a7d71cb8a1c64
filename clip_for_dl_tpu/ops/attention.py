"""Fused multi-head attention (flash-style, single-block) for the ViT tower.

The reference ViT is torchvision ``vit_b_16`` whose self-attention runs as
separate torch ops (vit_vision notebook cell 24). The einsum translation
(models/vit.py) is correct but leaves ~40% of ViT inference time in the
attention sub-graph (measured on v5e at B=256: 111.6 ms/step full model vs
70.9 ms with attention ablated): XLA materializes the [B, H, N, N] fp32
logits and probabilities in HBM around the softmax, and the batched
[197, 64] matmuls run far below MXU peak.

This kernel computes softmax(q·kᵀ/√d)·v for all heads of one batch row in a
single Pallas program: logits, softmax, and the probability matrix live
entirely in VMEM (registers/scratch) and never touch HBM. Sequence length is
padded to a lane multiple inside the wrapper; padded key columns are masked
to -inf before the softmax, and padded query rows are sliced off on return.
N is small for ViT (197), so no KV blocking is needed — this is the
single-block degenerate case of flash attention with exactly the same math
as the einsum path (fp32 logits and softmax, bf16 probabilities into an
fp32-accumulated second matmul).

Measured on v5e (B=256, H=12, N=197, D=64): standalone 6.97 ms vs 7.76 ms
for the einsum reference (1.11×), output equal to bf16 rounding (≤ 4.9e-4
on 0.1-magnitude outputs). Inside the full ViT, however, the pallas_call's
fusion barrier plus the [B,N,H,D]→[B,H,N,D] HBM transposes it forces made
the whole model SLOWER (139.8 ms vs 111.6 ms) — and every attention
reformulation tried (transpose-free einsums, jax.nn.dot_product_attention,
a layout-native [B,N,H,D] kernel with in-VMEM relayout at 9.5 ms) left the
full model at exactly 111.6 ms: the ViT at this scale is bound by XLA's
whole-graph scheduling, not by the attention sub-graph (see NOTES.md). The
kernel is therefore NOT wired into models/vit.py by default; it is kept as
a verified building block for workloads with longer sequences or where
q/k/v are already head-major.

Differentiable everywhere: a custom VJP recomputes the backward pass through
the jnp reference formulation, so training uses the kernel's forward and an
XLA-generated backward.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _round_up(x: int, m: int) -> int:
    return -(-x // m) * m


def mha_reference(q: jax.Array, k: jax.Array, v: jax.Array) -> jax.Array:
    """jnp reference: [B, H, N, D] each → [B, H, N, D].

    fp32 logits/softmax, bf16 (input-dtype) probabilities, fp32-accumulated
    output — bitwise the models/vit.py einsum formulation."""
    d = q.shape[-1]
    logits = jnp.einsum(
        "bhqd,bhkd->bhqk", q, k, preferred_element_type=jnp.float32
    ) / jnp.sqrt(jnp.float32(d))
    probs = jax.nn.softmax(logits, axis=-1)
    return jnp.einsum(
        "bhqk,bhkd->bhqd", probs.astype(q.dtype), v,
        preferred_element_type=jnp.float32,
    ).astype(q.dtype)


def _mha_kernel(q_ref, k_ref, v_ref, out_ref, *, heads: int, n_real: int,
                scale: float):
    np_pad = q_ref.shape[-2]
    col = jax.lax.broadcasted_iota(jnp.int32, (1, np_pad), 1)
    mask = col < n_real  # [1, NP] — padded key columns contribute nothing
    for h in range(heads):
        q = q_ref[0, h]  # [NP, D]
        k = k_ref[0, h]
        v = v_ref[0, h]
        s = jax.lax.dot_general(
            q, k, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        ) * scale  # [NP, NP] fp32, in VMEM only
        s = jnp.where(mask, s, -jnp.inf)
        p = jax.nn.softmax(s, axis=-1)
        out_ref[0, h] = jnp.dot(
            p.astype(q.dtype), v, preferred_element_type=jnp.float32
        ).astype(out_ref.dtype)


@functools.partial(jax.jit, static_argnames=("interpret",))
def _fused_mha_fwd(q, k, v, interpret=None):
    if interpret is None:
        # Mosaic compiles only for TPU; elsewhere run the interpreter so the
        # op keeps identical semantics on any backend.
        interpret = jax.default_backend() != "tpu"
    return _partitioned_mha_op(interpret)(q, k, v)


@functools.lru_cache(maxsize=None)
def _partitioned_mha_op(interpret: bool):
    """GSPMD-partitionable wrapper: batch rows (and heads) are independent,
    so batch/head sharding is legal through the kernel — an opaque
    pallas_call would otherwise be REPLICATED by the partitioner,
    all-gathering a dp-sharded activation (same bug class as
    ops/mlp_block.py; see its custom_partitioning note). The sequence and
    feature dims must stay whole (softmax reduces over keys)."""
    from jax.experimental.custom_partitioning import custom_partitioning
    from jax.sharding import NamedSharding, PartitionSpec as P

    def impl(q, k, v):
        return _pallas_mha(q, k, v, interpret=interpret)

    op = custom_partitioning(impl)

    def _bh_sharding(mesh, arg_shapes):
        s = arg_shapes[0].sharding.spec
        return NamedSharding(
            mesh,
            P(
                s[0] if len(s) else None,
                s[1] if len(s) > 1 else None,
                None,
                None,
            ),
        )

    def partition(mesh, arg_shapes, result_shape):
        sh = _bh_sharding(mesh, arg_shapes)
        return mesh, impl, sh, (sh, sh, sh)

    def infer_sharding(mesh, arg_shapes, result_shape):
        return _bh_sharding(mesh, arg_shapes)

    op.def_partition(
        partition=partition,
        infer_sharding_from_operands=infer_sharding,
        # distinct q-length/kv-length factors: sequence sharding must NOT
        # propagate through (the kernel needs every key column per row)
        sharding_rule="b h n d, b h m d, b h m d -> b h n d",
    )
    return op


def _pallas_mha(q, k, v, *, interpret: bool):
    B, H, N, D = q.shape
    NP = _round_up(N, 128)  # lane-align the [NP, NP] logits block
    if NP != N:
        pad = [(0, 0), (0, 0), (0, NP - N), (0, 0)]
        q, k, v = jnp.pad(q, pad), jnp.pad(k, pad), jnp.pad(v, pad)

    out = pl.pallas_call(
        functools.partial(
            _mha_kernel, heads=H, n_real=N, scale=1.0 / float(D) ** 0.5
        ),
        out_shape=jax.ShapeDtypeStruct((B, H, NP, D), q.dtype),
        grid=(B,),
        in_specs=[
            pl.BlockSpec((1, H, NP, D), lambda i: (i, 0, 0, 0),
                         memory_space=pltpu.VMEM)
            for _ in range(3)
        ],
        out_specs=pl.BlockSpec((1, H, NP, D), lambda i: (i, 0, 0, 0),
                               memory_space=pltpu.VMEM),
        cost_estimate=pl.CostEstimate(
            flops=4 * B * H * NP * NP * D,
            bytes_accessed=4 * B * H * NP * D * q.dtype.itemsize,
            transcendentals=B * H * NP * NP,
        ),
        interpret=interpret,
    )(q, k, v)
    return out[:, :, :N, :]


@jax.custom_vjp
def fused_mha(q: jax.Array, k: jax.Array, v: jax.Array) -> jax.Array:
    """[B, H, N, D] q/k/v → [B, H, N, D] attention output (Pallas fused)."""
    return _fused_mha_fwd(q, k, v)


def _fused_mha_vjp_fwd(q, k, v):
    return _fused_mha_fwd(q, k, v), (q, k, v)


def _fused_mha_vjp_bwd(residuals, g):
    # Backward recomputes attention through the reference formulation: XLA
    # differentiates it; forward stays on the kernel.
    q, k, v = residuals
    _, vjp = jax.vjp(mha_reference, q, k, v)
    return vjp(g)


fused_mha.defvjp(_fused_mha_vjp_fwd, _fused_mha_vjp_bwd)


def multihead_attention(
    q: jax.Array, k: jax.Array, v: jax.Array, use_pallas: bool | None = None
) -> jax.Array:
    """Dispatch: fused Pallas kernel on TPU, jnp reference elsewhere."""
    if use_pallas is None:
        use_pallas = jax.default_backend() == "tpu"
    if use_pallas:
        return fused_mha(q, k, v)
    return mha_reference(q, k, v)
