"""Flash-style fused attention with a fused Pallas BACKWARD for training.

The training hot spot this attacks (trace: benchmarks/trace_resnet_pretrain_
b128.md): each transformer layer of the text tower saves a fp32
``[B, H, L, L]`` logits residual for the backward pass — 403 MB/layer at
B=128 L(pad)=256, 4.8 GB across Bio_ClinicalBERT's 12 layers, 9.7 GB at
B=256 (which is why B=256 previously needed full text-tower remat,
NOTES.md "PRETRAIN experiment set") — plus the fp32 layout copies XLA
emits around the softmax backward (~12% of the step).

This op never materializes logits or probabilities in HBM in either
direction:

- forward: one Pallas program per batch row computes, for every head,
  ``softmax(q·kᵀ/√d + bias)·v`` with logits/probabilities living only in
  VMEM (the single-block degenerate case of flash attention — N ≤ 512
  for this workload, so no KV blocking is needed). q/k/v ride in the
  towers' NATIVE ``[B, N, H·D]`` layout (heads are lane slices inside
  the kernel), so the op is a pure bitcast away from the Dense outputs —
  the head-major ``[B, H, N, D]`` form cost a physical HBM transpose per
  tensor per direction (trace-measured ~50 ms/step at B=128×12 layers,
  505 → 628.5 img/s when removed; Mosaic rejects 4D per-head block
  windows, which is why heads fold into lanes instead);
- backward: a second Pallas kernel RECOMPUTES s and p from q/k (the
  flash "recompute-from-qk" economy) and produces dq/dk/dv in one
  program — the only residuals saved are the kernel *inputs*.

Attention-probability dropout (the reference trains HF BERT with
``attention_probs_dropout_prob=0.1``) runs INSIDE the kernel: a
counter-based hash RNG (murmur3 finalizer over the (row, col) iota grid,
seeded per batch row and head) generates the keep mask on the fly, and
the backward regenerates the identical mask from the same seeds instead
of storing a [B, H, L, L] mask. Plain integer jnp ops — no
``pltpu.prng_*`` — so the bits are bit-identical on TPU Mosaic and the
CPU interpreter (the in-container test backend; ``pltpu.prng_random_bits``
is a zero-stub under interpret mode), and identical under any GSPMD
sharding because seeds ride per-row.

Semantics mirror models/bert.py BertSelfAttention / models/vit.py
ViTEncoderLayer exactly: fp32 logits (+ additive key bias), fp32 softmax,
dropout on the fp32 probabilities, compute-dtype probabilities into an
fp32-accumulated PV matmul. The additive bias is the key-padding form
``[B, L]`` (broadcast over heads and query rows — the only form the
towers build, bert.py:197-201); padded tail columns are masked with a
large-NEGATIVE-finite (not -inf: a fully-masked padded query row would
otherwise softmax to NaN and poison dk/dv in the backward).

GSPMD: batch and head dims are independent → custom_partitioning lets
dp (and head-sharded tp) batches stay sharded through both kernels
(sharding rule "b h n d, ..."); sequence/feature sharding does not
propagate (softmax needs every key column).

Wire via ModelConfig.flash_attention / CLI ``--flash-attention``.
Reference behavior being replaced: torch ``nn.MultiheadAttention`` /
HF BertSelfAttention under autograd (0425/train.py:775-776; vit notebook
cell 24) — single-GPU eager ops with materialized attention matrices.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.custom_partitioning import custom_partitioning
from jax.experimental.pallas import tpu as pltpu
from jax.sharding import NamedSharding, PartitionSpec as P

# Finite stand-in for -inf on padded key columns: large enough that
# exp(s - m) underflows to 0 for any real logit, small enough that a
# fully-padded row's softmax stays finite (see module docstring).
_NEG_BIG = -1e30

# Single-block design bound: each grid step holds one batch row's full
# [NP, NP] fp32 logits (+ probs) per head in VMEM. At N=512, H=12, D=64
# that is ~5 MB — comfortable; at N=1024 the logits alone quadruple and
# Mosaic fails with an opaque VMEM-exhaustion error. Guard with a clear
# ValueError instead (ADVICE r3): longer sequences need a multi-block
# (tiled-KV) kernel, which this workload (seq ≤ 512 text) never hits.
MAX_SEQ_LEN = 512

# Backward lane packing: process D=64 heads in PAIRS as batched 3-D dots
# so each MXU issue spans 128 lanes instead of 64 (VERDICT r3 weak #4).
# Bitwise-identical results (tools/probe_bwd_lane_packing.py). Read once
# at import — a per-call flag would silently go stale inside already-
# compiled jit programs. Set CLIP_FOR_DL_TPU_FLASH_BWD_PACK2=0 to A/B
# the per-head form (tools/train_bench.py runs in a subprocess, so the
# env var is a clean toggle there).
import os as _os

BWD_PACK2 = _os.environ.get("CLIP_FOR_DL_TPU_FLASH_BWD_PACK2", "1") != "0"
FWD_PACK2 = _os.environ.get("CLIP_FOR_DL_TPU_FLASH_FWD_PACK2", "1") != "0"


def _check_seq_len(n: int) -> None:
    if n > MAX_SEQ_LEN:
        raise ValueError(
            f"flash attention supports sequence length ≤ {MAX_SEQ_LEN} "
            f"(single-block kernel holds the full [N, N] logits in VMEM); "
            f"got N={n}. Use the XLA attention path for longer sequences "
            f"(flash_attention=False in the tower config)."
        )


def warn_bf16_probs_ignored() -> None:
    """Both towers gate flash vs the XLA path on the same flag pair;
    bf16_attention_probs is a residual-dtype knob for the XLA path only —
    the flash kernel never materializes probabilities in HBM (it
    recomputes them in the backward), so the flag is inert under flash.
    One shared warning keeps the two call sites in lockstep (ADVICE r3)."""
    import warnings

    warnings.warn(
        "bf16_attention_probs is ignored when flash attention "
        "is enabled: the flash kernel saves no probability "
        "residual (its whole point); set one or the other",
        stacklevel=3,
    )


def _round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


def _i32(v: int) -> jnp.ndarray:
    """uint32 constant as its two's-complement int32 bit pattern."""
    return jnp.int32(np.uint32(v).astype(np.int32))


def _uniform01(seed, head, shape):
    """Counter-based uniform [0, 1) grid — murmur3 fmix32 over iota.

    Pure integer jnp ops (wrap-around int32 multiply, logical shifts):
    identical bits under TPU Mosaic, the Pallas CPU interpreter, and as a
    plain jnp call (the test oracle / reference path use this very
    function). `seed` is an int32 scalar (per batch row), `head` an int32
    scalar or python int; the (row, col) counter grid decorrelates
    positions.
    """
    r = jax.lax.broadcasted_iota(jnp.int32, shape, 0)
    c = jax.lax.broadcasted_iota(jnp.int32, shape, 1)
    x = (
        r * _i32(0x9E3779B1)
        ^ c * _i32(0x85EBCA77)
        ^ (seed + jnp.int32(head) * _i32(0xC2B2AE3D))
    )
    # murmur3 finalizer: full avalanche, every output bit depends on
    # every input bit
    sh = lambda a, n: jax.lax.shift_right_logical(a, jnp.int32(n))
    x = x ^ sh(x, 16)
    x = x * _i32(0x85EBCA6B)
    x = x ^ sh(x, 13)
    x = x * _i32(0xC2B2AE35)
    x = x ^ sh(x, 16)
    # top 24 bits → [0, 1) in fp32 (24-bit mantissa: exact)
    return sh(x, 8).astype(jnp.float32) * jnp.float32(1.0 / (1 << 24))


def _softmax_rows(s):
    """Row softmax in fp32; finite for fully-masked (padded) rows."""
    m = jnp.max(s, axis=-1, keepdims=True)
    e = jnp.exp(s - m)
    return e / jnp.sum(e, axis=-1, keepdims=True)


def _head_fwd(q, k, v, bias, seed, h, scale, rate):
    """One head's attention output from [NP, D] lane slices (fp32
    logits/softmax in VMEM, optional in-kernel prob dropout)."""
    s = jax.lax.dot_general(
        q, k, (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    ) * scale + bias  # [NP, NP] fp32, VMEM only
    p = _softmax_rows(s)
    if rate > 0.0:
        u = _uniform01(seed, h, p.shape)
        p = jnp.where(u >= rate, p * (1.0 / (1.0 - rate)), 0.0)
    return jax.lax.dot_general(
        p.astype(q.dtype), v, (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )


def _head_bwd(q, k, v, do, bias, seed, h, scale, rate):
    """One head's (dq, dk, dv) — recompute-from-qk: the forward saved no
    [NP, NP] tensor; the dropout mask regenerates from the same
    counter-hash stream."""
    s = jax.lax.dot_general(
        q, k, (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    ) * scale + bias
    p = _softmax_rows(s)
    if rate > 0.0:
        u = _uniform01(seed, h, p.shape)
        keep = u >= rate
        inv = 1.0 / (1.0 - rate)
        pd = jnp.where(keep, p * inv, 0.0)
    else:
        pd = p
    pdc = pd.astype(q.dtype)
    # dv = pdᵀ · do (contract query rows)
    dv = jax.lax.dot_general(
        pdc, do, (((0,), (0,)), ((), ())), preferred_element_type=jnp.float32
    )
    # d(dropped probs) = do · vᵀ
    dpd = jax.lax.dot_general(
        do, v, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
    )
    dp = jnp.where(keep, dpd * inv, 0.0) if rate > 0.0 else dpd
    # softmax backward: ds = p ⊙ (dp − rowsum(p ⊙ dp))
    delta = jnp.sum(p * dp, axis=-1, keepdims=True)
    ds = (p * (dp - delta)).astype(q.dtype)
    dq = jax.lax.dot_general(
        ds, k, (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32
    ) * scale
    dk = jax.lax.dot_general(
        ds, q, (((0,), (0,)), ((), ())), preferred_element_type=jnp.float32
    ) * scale
    return dq, dk, dv


def _pair_fwd(q2, k2, v2, bias, seed, h0, scale, rate):
    """Two heads' attention outputs as BATCHED 3-D dots — the fwd analog
    of :func:`_pair_bwd`: heads h0 and h0+1 stacked on a leading batch dim
    so the two narrow matmuls per head issue as 128-lane batched dots.
    Bitwise-equal to the per-head form (same fp32 softmax, same per-head
    2-D dropout streams, stacked)."""
    dn = jax.lax.dot_general
    s = dn(q2, k2, (((2,), (2,)), ((0,), (0,))),
           preferred_element_type=jnp.float32) * scale + bias
    p = _softmax_rows(s)
    if rate > 0.0:
        u = jnp.stack([_uniform01(seed, h0, s.shape[1:]),
                       _uniform01(seed, h0 + 1, s.shape[1:])])
        p = jnp.where(u >= rate, p * (1.0 / (1.0 - rate)), 0.0)
    return dn(p.astype(q2.dtype), v2, (((2,), (1,)), ((0,), (0,))),
              preferred_element_type=jnp.float32)


def _pair_bwd(q2, k2, v2, do2, bias, seed, h0, scale, rate):
    """Two heads' (dq, dk, dv) as BATCHED 3-D dots — heads h0 and h0+1
    stacked on a leading batch dim so every narrow [NP,·]×[·,64] matmul
    issues as one batched dot over a 128-lane pair instead of two 64-lane
    singles (probe: tools/probe_bwd_lane_packing.py, bitwise-equal to the
    per-head form; benchmarks/bwd_lane_packing_probe.md).

    Dropout masks are the SAME per-head 2-D counter-hash streams as
    :func:`_head_bwd` (stacked, not a 3-D iota) — the regenerated mask
    must match the forward bit-for-bit."""
    dn = jax.lax.dot_general
    s = dn(q2, k2, (((2,), (2,)), ((0,), (0,))),
           preferred_element_type=jnp.float32) * scale + bias
    p = _softmax_rows(s)
    if rate > 0.0:
        u = jnp.stack([_uniform01(seed, h0, s.shape[1:]),
                       _uniform01(seed, h0 + 1, s.shape[1:])])
        keep = u >= rate
        inv = 1.0 / (1.0 - rate)
        pd = jnp.where(keep, p * inv, 0.0)
    else:
        pd = p
    pdc = pd.astype(q2.dtype)
    dv = dn(pdc, do2, (((1,), (1,)), ((0,), (0,))),
            preferred_element_type=jnp.float32)
    dpd = dn(do2, v2, (((2,), (2,)), ((0,), (0,))),
             preferred_element_type=jnp.float32)
    dp = jnp.where(keep, dpd * inv, 0.0) if rate > 0.0 else dpd
    delta = jnp.sum(p * dp, axis=-1, keepdims=True)
    ds = (p * (dp - delta)).astype(q2.dtype)
    dq = dn(ds, k2, (((2,), (1,)), ((0,), (0,))),
            preferred_element_type=jnp.float32) * scale
    dk = dn(ds, q2, (((1,), (1,)), ((0,), (0,))),
            preferred_element_type=jnp.float32) * scale
    return dq, dk, dv


def _fwd_kernel(seed_ref, bias_ref, q_ref, k_ref, v_ref, out_ref,
                *, heads: int, dim: int, scale: float, rate: float):
    # refs: [1, NP, H·D] — the LAYOUT-NATIVE form (identical bytes to the
    # towers' [B, N, H·D] Dense outputs; heads are lane slices). The first
    # cut took head-major [B, H, N, D] blocks and the trace showed XLA
    # paying 1.84 ms/layer of physical transpose copies around the opaque
    # call (22 ms/step at B=128×12 layers); Mosaic rejects 4D
    # (1, NP, 1, D) head windows and in-kernel 4D reshapes, but lane
    # slicing of a folded 2D value compiles cleanly (probed).
    bias = bias_ref[0]  # [1, NP]
    seed = seed_ref[pl.program_id(0), 0]
    qf, kf, vf = q_ref[0], k_ref[0], v_ref[0]  # [NP, H·D]
    pairs = heads // 2 if FWD_PACK2 else 0
    for p_i in range(pairs):
        a = slice(2 * p_i * dim, (2 * p_i + 1) * dim)
        b = slice((2 * p_i + 1) * dim, (2 * p_i + 2) * dim)
        o = _pair_fwd(
            jnp.stack([qf[:, a], qf[:, b]]),
            jnp.stack([kf[:, a], kf[:, b]]),
            jnp.stack([vf[:, a], vf[:, b]]),
            bias, seed, 2 * p_i, scale, rate,
        )
        out_ref[0, :, a] = o[0].astype(out_ref.dtype)
        out_ref[0, :, b] = o[1].astype(out_ref.dtype)
    for h in range(2 * pairs, heads):
        sl = slice(h * dim, (h + 1) * dim)
        out_ref[0, :, sl] = _head_fwd(
            qf[:, sl], kf[:, sl], vf[:, sl], bias, seed, h, scale, rate
        ).astype(out_ref.dtype)


def _fwd_kernel_packed(seed_ref, bias_ref, qkv_ref, out_ref,
                       *, heads: int, dim: int, scale: float, rate: float):
    # qkv_ref: [1, NP, 3·H·D] — the PACKED form: identical bytes to one
    # Dense(3·hidden) projection output whose columns are ordered
    # q-heads, k-heads, v-heads. One HBM stream instead of three, and the
    # projection upstream is a single wide GEMM.
    bias = bias_ref[0]
    seed = seed_ref[pl.program_id(0), 0]
    f = qkv_ref[0]  # [NP, 3·H·D]
    hd = heads * dim
    pairs = heads // 2 if FWD_PACK2 else 0
    for p_i in range(pairs):
        ha, hb = 2 * p_i, 2 * p_i + 1
        a = slice(ha * dim, (ha + 1) * dim)
        b = slice(hb * dim, (hb + 1) * dim)
        o = _pair_fwd(
            jnp.stack([f[:, a], f[:, b]]),
            jnp.stack([f[:, hd + ha * dim:hd + (ha + 1) * dim],
                       f[:, hd + hb * dim:hd + (hb + 1) * dim]]),
            jnp.stack([f[:, 2 * hd + ha * dim:2 * hd + (ha + 1) * dim],
                       f[:, 2 * hd + hb * dim:2 * hd + (hb + 1) * dim]]),
            bias, seed, ha, scale, rate,
        )
        out_ref[0, :, a] = o[0].astype(out_ref.dtype)
        out_ref[0, :, b] = o[1].astype(out_ref.dtype)
    for h in range(2 * pairs, heads):
        q = f[:, h * dim:(h + 1) * dim]
        k = f[:, hd + h * dim:hd + (h + 1) * dim]
        v = f[:, 2 * hd + h * dim:2 * hd + (h + 1) * dim]
        out_ref[0, :, h * dim:(h + 1) * dim] = _head_fwd(
            q, k, v, bias, seed, h, scale, rate
        ).astype(out_ref.dtype)


def _bwd_kernel(seed_ref, bias_ref, q_ref, k_ref, v_ref, do_ref,
                dq_ref, dk_ref, dv_ref,
                *, heads: int, dim: int, scale: float, rate: float):
    bias = bias_ref[0]
    seed = seed_ref[pl.program_id(0), 0]
    qf, kf, vf, dof = q_ref[0], k_ref[0], v_ref[0], do_ref[0]
    pairs = heads // 2 if BWD_PACK2 else 0
    for p_i in range(pairs):
        a = slice(2 * p_i * dim, (2 * p_i + 1) * dim)
        b = slice((2 * p_i + 1) * dim, (2 * p_i + 2) * dim)
        dq, dk, dv = _pair_bwd(
            jnp.stack([qf[:, a], qf[:, b]]),
            jnp.stack([kf[:, a], kf[:, b]]),
            jnp.stack([vf[:, a], vf[:, b]]),
            jnp.stack([dof[:, a], dof[:, b]]),
            bias, seed, 2 * p_i, scale, rate,
        )
        for j, sl in enumerate((a, b)):
            dq_ref[0, :, sl] = dq[j].astype(dq_ref.dtype)
            dk_ref[0, :, sl] = dk[j].astype(dk_ref.dtype)
            dv_ref[0, :, sl] = dv[j].astype(dv_ref.dtype)
    for h in range(2 * pairs, heads):
        sl = slice(h * dim, (h + 1) * dim)
        dq, dk, dv = _head_bwd(
            qf[:, sl], kf[:, sl], vf[:, sl], dof[:, sl],
            bias, seed, h, scale, rate,
        )
        dq_ref[0, :, sl] = dq.astype(dq_ref.dtype)
        dk_ref[0, :, sl] = dk.astype(dk_ref.dtype)
        dv_ref[0, :, sl] = dv.astype(dv_ref.dtype)


def _bwd_kernel_packed(seed_ref, bias_ref, qkv_ref, do_ref, dqkv_ref,
                       *, heads: int, dim: int, scale: float, rate: float):
    bias = bias_ref[0]
    seed = seed_ref[pl.program_id(0), 0]
    f = qkv_ref[0]
    do = do_ref[0]
    hd = heads * dim
    pairs = heads // 2 if BWD_PACK2 else 0
    for p_i in range(pairs):
        ha, hb = 2 * p_i, 2 * p_i + 1
        a = slice(ha * dim, (ha + 1) * dim)
        b = slice(hb * dim, (hb + 1) * dim)
        ka = slice(hd + ha * dim, hd + (ha + 1) * dim)
        kb = slice(hd + hb * dim, hd + (hb + 1) * dim)
        va = slice(2 * hd + ha * dim, 2 * hd + (ha + 1) * dim)
        vb = slice(2 * hd + hb * dim, 2 * hd + (hb + 1) * dim)
        dq, dk, dv = _pair_bwd(
            jnp.stack([f[:, a], f[:, b]]),
            jnp.stack([f[:, ka], f[:, kb]]),
            jnp.stack([f[:, va], f[:, vb]]),
            jnp.stack([do[:, a], do[:, b]]),
            bias, seed, ha, scale, rate,
        )
        for j, (qs, ks, vs) in enumerate(((a, ka, va), (b, kb, vb))):
            dqkv_ref[0, :, qs] = dq[j].astype(dqkv_ref.dtype)
            dqkv_ref[0, :, ks] = dk[j].astype(dqkv_ref.dtype)
            dqkv_ref[0, :, vs] = dv[j].astype(dqkv_ref.dtype)
    for h in range(2 * pairs, heads):
        q = f[:, h * dim:(h + 1) * dim]
        k = f[:, hd + h * dim:hd + (h + 1) * dim]
        v = f[:, 2 * hd + h * dim:2 * hd + (h + 1) * dim]
        dq, dk, dv = _head_bwd(
            q, k, v, do[:, h * dim:(h + 1) * dim],
            bias, seed, h, scale, rate,
        )
        dqkv_ref[0, :, h * dim:(h + 1) * dim] = dq.astype(dqkv_ref.dtype)
        dqkv_ref[0, :, hd + h * dim:hd + (h + 1) * dim] = dk.astype(
            dqkv_ref.dtype
        )
        dqkv_ref[0, :, 2 * hd + h * dim:2 * hd + (h + 1) * dim] = dv.astype(
            dqkv_ref.dtype
        )


def _pad_inputs(q, k, v, bias):
    """Pad the sequence dim to a SUBLANE multiple only (8): Mosaic block
    shapes constrain the last two ref dims to (×8, ×128-or-whole-dim), and
    in-VMEM values (the [NP, NP] logits) are lane-padded internally by the
    compiler — so L=200 needs NO padding at all (the first cut padded to
    128 lanes and paid 6 pad + 2 slice HBM copies per layer-direction).
    Layout is [B, N, H, D]; only dim 1 pads."""
    B, N, H, D = q.shape
    NP = _round_up(N, 8)
    if NP != N:
        pad = [(0, 0), (0, NP - N), (0, 0), (0, 0)]
        q, k, v = jnp.pad(q, pad), jnp.pad(k, pad), jnp.pad(v, pad)
        bias = jnp.pad(bias, ((0, 0), (0, NP - N)), constant_values=_NEG_BIG)
    return q, k, v, bias, NP


def _pallas_fwd(q, k, v, bias, seeds, *, rate: float, interpret: bool):
    B, N, H, D = q.shape
    q, k, v, bias, NP = _pad_inputs(q, k, v, bias)
    scale = 1.0 / float(D) ** 0.5
    # fold heads into lanes: [B, NP, H·D] — identical bytes, no copy
    q, k, v = (t.reshape(B, NP, H * D) for t in (q, k, v))
    qkv_spec = pl.BlockSpec((1, NP, H * D), lambda b: (b, 0, 0),
                            memory_space=pltpu.VMEM)
    out = pl.pallas_call(
        functools.partial(_fwd_kernel, heads=H, dim=D, scale=scale,
                          rate=rate),
        grid=(B,),
        in_specs=[
            # whole-array SMEM (Mosaic blocks constrain only the last two
            # dims; a (1, 1) block of [B, 1] is rejected) — indexed by
            # program_id in-kernel
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec((1, 1, NP), lambda b: (b, 0, 0),
                         memory_space=pltpu.VMEM),
            qkv_spec, qkv_spec, qkv_spec,
        ],
        out_specs=qkv_spec,
        out_shape=jax.ShapeDtypeStruct((B, NP, H * D), q.dtype),
        cost_estimate=pl.CostEstimate(
            flops=4 * B * H * NP * NP * D,
            bytes_accessed=4 * B * H * NP * D * q.dtype.itemsize,
            transcendentals=B * H * NP * NP,
        ),
        interpret=interpret,
    )(seeds, bias[:, None, :], q, k, v)
    out = out.reshape(B, NP, H, D)
    return out[:, :N] if NP != N else out


def _pallas_bwd(q, k, v, bias, seeds, do, *, rate: float, interpret: bool):
    B, N, H, D = q.shape
    do = jnp.pad(do, [(0, 0), (0, _round_up(N, 8) - N), (0, 0), (0, 0)])
    q, k, v, bias, NP = _pad_inputs(q, k, v, bias)
    scale = 1.0 / float(D) ** 0.5
    q, k, v, do = (t.reshape(B, NP, H * D) for t in (q, k, v, do))
    spec = pl.BlockSpec((1, NP, H * D), lambda b: (b, 0, 0),
                        memory_space=pltpu.VMEM)
    shape = jax.ShapeDtypeStruct((B, NP, H * D), q.dtype)
    dq, dk, dv = pl.pallas_call(
        functools.partial(_bwd_kernel, heads=H, dim=D, scale=scale,
                          rate=rate),
        grid=(B,),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),  # see fwd spec note
            pl.BlockSpec((1, 1, NP), lambda b: (b, 0, 0),
                         memory_space=pltpu.VMEM),
            spec, spec, spec, spec,
        ],
        out_specs=(spec, spec, spec),
        out_shape=(shape, shape, shape),
        cost_estimate=pl.CostEstimate(
            flops=10 * B * H * NP * NP * D,
            bytes_accessed=7 * B * H * NP * D * q.dtype.itemsize,
            transcendentals=B * H * NP * NP,
        ),
        interpret=interpret,
    )(seeds, bias[:, None, :], q, k, v, do)
    dq, dk, dv = (t.reshape(B, NP, H, D) for t in (dq, dk, dv))
    if NP != N:
        dq, dk, dv = dq[:, :N], dk[:, :N], dv[:, :N]
    return dq, dk, dv


def _bh_sharding(mesh, arg_shapes):
    """Keep batch (and head) sharding of q; seq/feature stay whole.
    Layout [B, N, H, D]: head dim is index 2."""
    s = arg_shapes[0].sharding.spec
    return NamedSharding(
        mesh,
        P(s[0] if len(s) else None, None, s[2] if len(s) > 2 else None, None),
    )


def _row_sharding(mesh, arg_shapes):
    s = arg_shapes[0].sharding.spec
    return NamedSharding(mesh, P(s[0] if len(s) else None, None))


@functools.lru_cache(maxsize=None)
def _fwd_op(rate: float, interpret: bool):
    """GSPMD-partitionable forward — an opaque pallas_call would be
    REPLICATED by the partitioner (all-gathering dp-sharded activations;
    same bug class ops/mlp_block.py documents)."""

    def impl(q, k, v, bias, seeds):
        return _pallas_fwd(q, k, v, bias, seeds,
                           rate=rate, interpret=interpret)

    op = custom_partitioning(impl)

    def partition(mesh, arg_shapes, result_shape):
        bh = _bh_sharding(mesh, arg_shapes)
        row = _row_sharding(mesh, arg_shapes)
        return mesh, impl, bh, (bh, bh, bh, row, row)

    def infer_sharding(mesh, arg_shapes, result_shape):
        return _bh_sharding(mesh, arg_shapes)

    op.def_partition(
        partition=partition,
        infer_sharding_from_operands=infer_sharding,
        # distinct n (query) / m (key) factors: sequence sharding must not
        # propagate through — every program needs all key columns
        sharding_rule="b n h d, b m h d, b m h d, b m, b u -> b n h d",
    )
    return op


@functools.lru_cache(maxsize=None)
def _bwd_op(rate: float, interpret: bool):
    def impl(q, k, v, bias, seeds, do):
        return _pallas_bwd(q, k, v, bias, seeds, do,
                           rate=rate, interpret=interpret)

    op = custom_partitioning(impl)

    def partition(mesh, arg_shapes, result_shape):
        bh = _bh_sharding(mesh, arg_shapes)
        row = _row_sharding(mesh, arg_shapes)
        return mesh, impl, (bh, bh, bh), (bh, bh, bh, row, row, bh)

    def infer_sharding(mesh, arg_shapes, result_shape):
        bh = _bh_sharding(mesh, arg_shapes)
        return (bh, bh, bh)

    op.def_partition(
        partition=partition,
        infer_sharding_from_operands=infer_sharding,
        sharding_rule=(
            "b n h d, b m h d, b m h d, b m, b u, b n h d "
            "-> b n h d, b m h d, b m h d"
        ),
    )
    return op


@functools.partial(jax.custom_vjp, nondiff_argnums=(0, 1))
def _flash(rate, interpret, q, k, v, bias, seeds):
    return _fwd_op(rate, interpret)(q, k, v, bias, seeds)


def _flash_fwd(rate, interpret, q, k, v, bias, seeds):
    out = _fwd_op(rate, interpret)(q, k, v, bias, seeds)
    # residuals are the INPUTS only — no [B, H, L, L] tensor survives
    return out, (q, k, v, bias, seeds)


def _flash_bwd(rate, interpret, res, g):
    q, k, v, bias, seeds = res
    dq, dk, dv = _bwd_op(rate, interpret)(
        q, k, v, bias, seeds, g.astype(q.dtype)
    )
    # bias derives from the integer attention mask (non-trainable) and
    # seeds are integers: zero / float0 cotangents, DCE'd by XLA.
    return (dq, dk, dv, jnp.zeros_like(bias),
            np.zeros(seeds.shape, dtype=jax.dtypes.float0))


_flash.defvjp(_flash_fwd, _flash_bwd)


# ---------------------------------------------------------------------------
# Packed-QKV form: one [B, N, 3·H·D] tensor straight from a fused
# Dense(3·hidden) projection (one wide GEMM instead of three narrow ones;
# one HBM stream through the kernel instead of three)
# ---------------------------------------------------------------------------


def _pad_packed(qkv, bias):
    B, N, _ = qkv.shape
    NP = _round_up(N, 8)
    if NP != N:
        qkv = jnp.pad(qkv, ((0, 0), (0, NP - N), (0, 0)))
        bias = jnp.pad(bias, ((0, 0), (0, NP - N)), constant_values=_NEG_BIG)
    return qkv, bias, NP


def _pallas_fwd_packed(qkv, bias, seeds, *, heads: int, rate: float,
                       interpret: bool):
    B, N, HD3 = qkv.shape
    D = HD3 // (3 * heads)
    qkv, bias, NP = _pad_packed(qkv, bias)
    scale = 1.0 / float(D) ** 0.5
    out = pl.pallas_call(
        functools.partial(_fwd_kernel_packed, heads=heads, dim=D,
                          scale=scale, rate=rate),
        grid=(B,),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),  # see split-form note
            pl.BlockSpec((1, 1, NP), lambda b: (b, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, NP, HD3), lambda b: (b, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, NP, HD3 // 3), lambda b: (b, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((B, NP, HD3 // 3), qkv.dtype),
        cost_estimate=pl.CostEstimate(
            flops=4 * B * heads * NP * NP * D,
            bytes_accessed=2 * B * NP * HD3 * qkv.dtype.itemsize,
            transcendentals=B * heads * NP * NP,
        ),
        interpret=interpret,
    )(seeds, bias[:, None, :], qkv)
    return out[:, :N] if NP != N else out


def _pallas_bwd_packed(qkv, bias, seeds, do, *, heads: int, rate: float,
                       interpret: bool):
    B, N, HD3 = qkv.shape
    D = HD3 // (3 * heads)
    do = jnp.pad(do, ((0, 0), (0, _round_up(N, 8) - N), (0, 0)))
    qkv, bias, NP = _pad_packed(qkv, bias)
    scale = 1.0 / float(D) ** 0.5
    dqkv = pl.pallas_call(
        functools.partial(_bwd_kernel_packed, heads=heads, dim=D,
                          scale=scale, rate=rate),
        grid=(B,),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec((1, 1, NP), lambda b: (b, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, NP, HD3), lambda b: (b, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, NP, HD3 // 3), lambda b: (b, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, NP, HD3), lambda b: (b, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((B, NP, HD3), qkv.dtype),
        cost_estimate=pl.CostEstimate(
            flops=11 * B * heads * NP * NP * D,
            bytes_accessed=3 * B * NP * HD3 * qkv.dtype.itemsize,
            transcendentals=2 * B * heads * NP * NP,
        ),
        interpret=interpret,
    )(seeds, bias[:, None, :], qkv, do)
    return dqkv[:, :N] if NP != N else dqkv


def _row3_sharding(mesh, arg_shapes, operand=0):
    s = arg_shapes[operand].sharding.spec
    return NamedSharding(mesh, P(s[0] if len(s) else None, None, None))


@functools.lru_cache(maxsize=None)
def _fwd_op_packed(heads: int, rate: float, interpret: bool):
    def impl(qkv, bias, seeds):
        return _pallas_fwd_packed(qkv, bias, seeds, heads=heads,
                                  rate=rate, interpret=interpret)

    op = custom_partitioning(impl)

    def partition(mesh, arg_shapes, result_shape):
        bsh = _row3_sharding(mesh, arg_shapes)
        row = _row_sharding(mesh, arg_shapes)
        return mesh, impl, bsh, (bsh, row, row)

    def infer_sharding(mesh, arg_shapes, result_shape):
        return _row3_sharding(mesh, arg_shapes)

    op.def_partition(
        partition=partition,
        infer_sharding_from_operands=infer_sharding,
        # batch only: sequence sharding must not propagate (softmax needs
        # every key column) and the packed feature dim stays whole
        sharding_rule="b n x, b m, b u -> b n y",
    )
    return op


@functools.lru_cache(maxsize=None)
def _bwd_op_packed(heads: int, rate: float, interpret: bool):
    def impl(qkv, bias, seeds, do):
        return _pallas_bwd_packed(qkv, bias, seeds, do, heads=heads,
                                  rate=rate, interpret=interpret)

    op = custom_partitioning(impl)

    def partition(mesh, arg_shapes, result_shape):
        bsh = _row3_sharding(mesh, arg_shapes)
        row = _row_sharding(mesh, arg_shapes)
        return mesh, impl, bsh, (bsh, row, row, bsh)

    def infer_sharding(mesh, arg_shapes, result_shape):
        return _row3_sharding(mesh, arg_shapes)

    op.def_partition(
        partition=partition,
        infer_sharding_from_operands=infer_sharding,
        sharding_rule="b n x, b m, b u, b n y -> b n x",
    )
    return op


@functools.partial(jax.custom_vjp, nondiff_argnums=(0, 1, 2))
def _flash_packed(heads, rate, interpret, qkv, bias, seeds):
    return _fwd_op_packed(heads, rate, interpret)(qkv, bias, seeds)


def _flash_packed_fwd(heads, rate, interpret, qkv, bias, seeds):
    out = _fwd_op_packed(heads, rate, interpret)(qkv, bias, seeds)
    return out, (qkv, bias, seeds)


def _flash_packed_bwd(heads, rate, interpret, res, g):
    qkv, bias, seeds = res
    dqkv = _bwd_op_packed(heads, rate, interpret)(
        qkv, bias, seeds, g.astype(qkv.dtype)
    )
    return (dqkv, jnp.zeros_like(bias),
            np.zeros(seeds.shape, dtype=jax.dtypes.float0))


_flash_packed.defvjp(_flash_packed_fwd, _flash_packed_bwd)


def flash_attention_packed(
    qkv: jax.Array,
    heads: int,
    key_bias: jax.Array | None = None,
    *,
    dropout_rate: float = 0.0,
    dropout_seeds: jax.Array | None = None,
    interpret: bool | None = None,
) -> jax.Array:
    """Packed-QKV flash attention: qkv is [B, N, 3·H·D] with columns
    ordered q-heads | k-heads | v-heads — exactly one fused
    Dense(3·hidden) projection output (concatenate the three Dense
    kernels column-wise upstream; the checkpoint tree is untouched).
    Returns [B, N, H·D]. Dropout bits are IDENTICAL to the split-form
    `flash_attention` (same per-(row, head) counter-hash streams).

    Why packed: the r2 negative "fused QKV 2.5× slower" was measured on
    the head-major path whose [B,N,H,D]→[B,H,N,D] transposes are gone in
    the layout-native kernel; with layouts native, one [H, 3H] GEMM beats
    three [H, H] GEMMs and the kernel reads one HBM stream, not three.
    """
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    B, N, HD3 = qkv.shape
    _check_seq_len(N)
    if HD3 % (3 * heads):
        raise ValueError(f"last dim {HD3} not divisible by 3*heads")
    if key_bias is None:
        bias = jnp.zeros((B, N), jnp.float32)
    else:
        if key_bias.shape != (B, N):
            raise ValueError(
                f"key_bias must be [B, N]={B, N}, got {key_bias.shape}"
            )
        bias = key_bias.astype(jnp.float32)
    rate = float(dropout_rate)
    if not 0.0 <= rate < 1.0:
        raise ValueError(f"dropout_rate must be in [0, 1), got {rate}")
    if rate > 0.0:
        if dropout_seeds is None:
            raise ValueError("dropout_rate > 0 requires dropout_seeds")
        seeds = dropout_seeds.reshape(B, 1).astype(jnp.int32)
    else:
        seeds = jnp.zeros((B, 1), jnp.int32)
    return _flash_packed(heads, rate, bool(interpret), qkv, bias, seeds)


def flash_attention(
    q: jax.Array,
    k: jax.Array,
    v: jax.Array,
    key_bias: jax.Array | None = None,
    *,
    dropout_rate: float = 0.0,
    dropout_seeds: jax.Array | None = None,
    layout: str = "bhnd",
    interpret: bool | None = None,
) -> jax.Array:
    """Fused fwd AND bwd attention over all heads of each batch row.

    layout: "bnhd" is the NATIVE form — q/k/v as [B, N, H, D], i.e. a
    free bitcast of the towers' [B, N, H·D] Dense outputs, heads sliced
    inside VMEM (the head-major form costs a physical [B,N,H,D]→
    [B,H,N,D] HBM transpose per tensor per direction — trace-measured
    1.84 ms/layer at B=128; the towers call this with "bnhd").
    "bhnd" accepts head-major [B, H, N, D] and transposes at the
    boundary (kept for oracle/test convenience).

    key_bias: optional [B, N] fp32 additive logit bias (broadcast over
    heads and query rows — the key-padding-mask form). dropout_rate > 0
    applies in-kernel attention-probability dropout and requires
    dropout_seeds [B] (or [B, 1]) int32, one stream per batch row (so
    masks are identical under any dp sharding of the batch).
    """
    if interpret is None:
        # Mosaic compiles only for TPU; elsewhere run the interpreter so
        # the op keeps identical semantics on any backend (CPU test mesh).
        interpret = jax.default_backend() != "tpu"
    if layout == "bhnd":
        q, k, v = (t.transpose(0, 2, 1, 3) for t in (q, k, v))
    elif layout != "bnhd":
        raise ValueError(f"layout must be 'bnhd' or 'bhnd', got {layout!r}")
    B, N, H, D = q.shape
    _check_seq_len(N)
    if key_bias is None:
        bias = jnp.zeros((B, N), jnp.float32)
    else:
        if key_bias.shape != (B, N):
            raise ValueError(
                f"key_bias must be [B, N]={B, N}, got {key_bias.shape}"
            )
        bias = key_bias.astype(jnp.float32)
    rate = float(dropout_rate)
    if not 0.0 <= rate < 1.0:
        raise ValueError(f"dropout_rate must be in [0, 1), got {rate}")
    if rate > 0.0:
        if dropout_seeds is None:
            raise ValueError("dropout_rate > 0 requires dropout_seeds")
        seeds = dropout_seeds.reshape(B, 1).astype(jnp.int32)
    else:
        seeds = jnp.zeros((B, 1), jnp.int32)
    out = _flash(rate, bool(interpret), q, k, v, bias, seeds)
    if layout == "bhnd":
        out = out.transpose(0, 2, 1, 3)
    return out


def dropout_seeds_from_rng(rng: jax.Array, batch: int) -> jax.Array:
    """Per-batch-row int32 seeds for the in-kernel dropout RNG."""
    return jax.random.bits(rng, (batch, 1), jnp.uint32).astype(jnp.int32)


def flash_attention_reference(
    q: jax.Array,
    k: jax.Array,
    v: jax.Array,
    key_bias: jax.Array | None = None,
    *,
    dropout_rate: float = 0.0,
    dropout_seeds: jax.Array | None = None,
) -> jax.Array:
    """Pure-jnp oracle with the towers' exact dtype discipline AND the
    kernel's exact dropout bits (shared `_uniform01`) — the equivalence
    target for tests on any backend."""
    B, H, N, D = q.shape
    s = jnp.einsum(
        "bhqd,bhkd->bhqk", q, k, preferred_element_type=jnp.float32
    ) / jnp.sqrt(jnp.float32(D))
    if key_bias is not None:
        s = s + key_bias.astype(jnp.float32)[:, None, None, :]
    p = _softmax_rows(s)
    if dropout_rate > 0.0:
        seeds = dropout_seeds.reshape(B).astype(jnp.int32)
        u = jax.vmap(  # over batch rows
            lambda sd: jnp.stack(
                [_uniform01(sd, h, (N, N)) for h in range(H)]
            )
        )(seeds)
        p = jnp.where(u >= dropout_rate, p * (1.0 / (1.0 - dropout_rate)), 0.0)
    return jnp.einsum(
        "bhqk,bhkd->bhqd", p.astype(q.dtype), v,
        preferred_element_type=jnp.float32,
    ).astype(q.dtype)
