"""Fused Dense→GELU→Dense TRAINING kernel for the transformer MLP.

The post-flash pretrain trace (benchmarks/trace_resnet_pretrain_flash_
b128.md) leaves the BERT MLP as the top remaining item: ~93 ms of the
253.5 ms ResNet-pretrain step at B=128 seq200 — forward 28 ms, backward
52.5 ms, plus 12.8 ms of XLA self-rematerialization (``fusion.42x.remat``
— XLA recomputes the first GEMM in the backward instead of saving the
[B, L, 3072] intermediate), all running at ~48% MXU against the convs'
52% because the per-layer [B·L, 3072] intermediates round-trip HBM
between the GEMM, GELU and LayerNorm fusions.

This op fuses the inner segment

    y = gelu(x @ W1 + b1) @ W2 + b2

in BOTH directions (dropout / residual / LayerNorm stay in XLA — they
are cheap and fuse fine):

- forward: one Pallas program per row tile computes both GEMMs
  back-to-back over intermediate-dim chunks held in VMEM — the
  ``[T, 3072]`` intermediate never exists in HBM, and nothing but the
  layer INPUT is saved for the backward (the residual economy that
  removed XLA's self-remat);
- backward: a second Pallas kernel recomputes h/g from x chunk-by-chunk
  and produces ``dx`` in one pass, while streaming out bf16 ``g`` and
  ``dh`` tiles; the two weight gradients are then two CLEAN full-size
  XLA GEMMs (``dW1 = xᵀ·dh``, ``dW2 = gᵀ·dy``) with no epilogue
  entanglement.

FLOP count matches XLA's schedule exactly (2 fwd GEMMs; recompute + 2
data-grad GEMMs + 2 weight-grad GEMMs ≈ XLA's 4 bwd GEMMs + its own
remat recompute) — the win is pure scheduling/HBM: no [B, L, 3072]
round-trips inside the fused region, no remat pass, no GEMM+LayerNorm
epilogue fusion stalls.

GELU is exact-erf by default via the same A&S rational approximation as
``ops/mlp_block.py`` (Mosaic lowers neither erf nor erfc; max abs err
5.3e-7 — below bf16 resolution); ``approximate=True`` gives the tanh
form. The backward applies the analytic GELU'(h) = Φ(h) + h·φ(h).

GSPMD: rows are independent → custom_partitioning keeps batch AND
sequence sharding (dp, sp) through both kernels; weights replicate
(Megatron tp wants column/row-parallel weight sharding — out of scope,
gated off at the CLI exactly like ``--fused-mlp``).

Reference behavior being replaced: HF BertIntermediate/BertOutput under
torch autograd (the reference trains Bio_ClinicalBERT's MLPs via
``transformers`` — 0425/train.py:775-776); here the segment lives in
models/bert.py BertLayer (and models/vit.py's MLP half shares the same
shape).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.custom_partitioning import custom_partitioning
from jax.experimental.pallas import tpu as pltpu
from jax.sharding import NamedSharding, PartitionSpec as P

from .mlp_block import _erf

_INV_SQRT2 = 0.7071067811865476
_INV_SQRT2PI = 0.3989422804014327


def _round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


def _gelu_f32(h, approximate: bool):
    if approximate:
        return jax.nn.gelu(h, approximate=True)
    return 0.5 * h * (1.0 + _erf(h * _INV_SQRT2))


def _gelu_grad_f32(h, approximate: bool):
    if approximate:
        # d/dh of the tanh form
        c = 0.7978845608028654  # sqrt(2/pi)
        a = 0.044715
        t = jnp.tanh(c * (h + a * h * h * h))
        return 0.5 * (1.0 + t) + 0.5 * h * (1.0 - t * t) * c * (
            1.0 + 3.0 * a * h * h
        )
    phi = 0.5 * (1.0 + _erf(h * _INV_SQRT2))
    pdf = jnp.exp(-0.5 * h * h) * _INV_SQRT2PI
    return phi + h * pdf


def _dot(a, b, dims):
    return jax.lax.dot_general(a, b, (dims, ((), ())),
                               preferred_element_type=jnp.float32)


def _fwd_kernel(x_ref, w1_ref, b1_ref, w2_ref, b2_ref, y_ref,
                *, chunks: int, fc: int, approximate: bool):
    x = x_ref[...]  # [T, H] compute dtype
    acc = None
    for c in range(chunks):
        sl = slice(c * fc, (c + 1) * fc)
        h = _dot(x, w1_ref[:, sl], ((1,), (0,))) + b1_ref[0, sl]  # f32
        g = _gelu_f32(h, approximate).astype(x.dtype)
        part = _dot(g, w2_ref[sl, :], ((1,), (0,)))  # [T, H] f32
        acc = part if acc is None else acc + part
    y_ref[...] = (acc + b2_ref[0]).astype(y_ref.dtype)


def _bwd_kernel(x_ref, w1_ref, b1_ref, w2_ref, dy_ref,
                dx_ref, g_ref, dh_ref,
                *, chunks: int, fc: int, approximate: bool):
    x = x_ref[...]
    dy = dy_ref[...]
    acc = None
    for c in range(chunks):
        sl = slice(c * fc, (c + 1) * fc)
        w1c = w1_ref[:, sl]
        # recompute-from-x: the forward saved no [T, F] tensor
        h = _dot(x, w1c, ((1,), (0,))) + b1_ref[0, sl]
        g_ref[0, :, sl] = _gelu_f32(h, approximate).astype(g_ref.dtype)
        # dg = dy · W2ᵀ (chunk columns of W2 are chunk rows here)
        dg = _dot(dy, w2_ref[sl, :], ((1,), (1,)))  # [T, Fc] f32
        dh = dg * _gelu_grad_f32(h, approximate)
        dhc = dh.astype(dh_ref.dtype)
        dh_ref[0, :, sl] = dhc
        part = _dot(dhc, w1c, ((1,), (1,)))  # [T, H] f32
        acc = part if acc is None else acc + part
    dx_ref[...] = acc.astype(dx_ref.dtype)


# Row tiles sized to the ~16 MB scoped VMEM: the forward holds
# {x, y, both weight matrices, one f32 chunk}; the backward additionally
# holds the dy/dx/g/dh tiles, so its tile halves (T=256 measured 21.4 MB
# — 5.4 MB over the limit at compile).
_FWD_TILE = 256
_BWD_TILE = 128
_CHUNK = 768


def _pallas_fwd(x, w1, b1, w2, b2, *, approximate: bool, interpret: bool):
    R, H = x.shape
    F = w1.shape[1]
    T = min(_FWD_TILE, _round_up(R, 8))
    RP = _round_up(R, T)
    if RP != R:
        x = jnp.pad(x, ((0, RP - R), (0, 0)))
    fc = min(_CHUNK, F)
    chunks = (F + fc - 1) // fc
    row = lambda i: (i, 0)
    whole = lambda i: (0, 0)
    out = pl.pallas_call(
        functools.partial(_fwd_kernel, chunks=chunks, fc=fc,
                          approximate=approximate),
        grid=(RP // T,),
        in_specs=[
            pl.BlockSpec((T, H), row, memory_space=pltpu.VMEM),
            pl.BlockSpec((H, F), whole, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, F), whole, memory_space=pltpu.VMEM),
            pl.BlockSpec((F, H), whole, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, H), whole, memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((T, H), row, memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((RP, H), x.dtype),
        cost_estimate=pl.CostEstimate(
            flops=4 * RP * H * F,
            bytes_accessed=(2 * RP * H + 2 * H * F) * x.dtype.itemsize,
            transcendentals=RP * F,
        ),
        interpret=interpret,
    )(x, w1, b1[None, :], w2, b2[None, :])
    return out[:R] if RP != R else out


def _pallas_bwd(x, w1, b1, w2, dy, *, approximate: bool, interpret: bool):
    R, H = x.shape
    F = w1.shape[1]
    T = min(_BWD_TILE, _round_up(R, 8))
    RP = _round_up(R, T)
    if RP != R:
        pad = ((0, RP - R), (0, 0))
        x, dy = jnp.pad(x, pad), jnp.pad(dy, pad)
    fc = min(_CHUNK, F)
    chunks = (F + fc - 1) // fc
    row = lambda i: (i, 0)
    whole = lambda i: (0, 0)
    rowspec = pl.BlockSpec((T, H), row, memory_space=pltpu.VMEM)
    dx, g, dh = pl.pallas_call(
        functools.partial(_bwd_kernel, chunks=chunks, fc=fc,
                          approximate=approximate),
        grid=(RP // T,),
        in_specs=[
            rowspec,
            pl.BlockSpec((H, F), whole, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, F), whole, memory_space=pltpu.VMEM),
            pl.BlockSpec((F, H), whole, memory_space=pltpu.VMEM),
            rowspec,
        ],
        out_specs=[
            rowspec,
            pl.BlockSpec((1, T, F), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, T, F), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((RP, H), x.dtype),
            jax.ShapeDtypeStruct((RP // T, T, F), x.dtype),
            jax.ShapeDtypeStruct((RP // T, T, F), x.dtype),
        ],
        cost_estimate=pl.CostEstimate(
            flops=8 * RP * H * F,
            bytes_accessed=(4 * RP * H + 2 * H * F + 2 * RP * F)
            * x.dtype.itemsize,
            transcendentals=2 * RP * F,
        ),
        # the T=128 working set is ~16.2 MB (232 KB over Mosaic's default
        # scoped limit); v5e physically carries far more VMEM — the
        # 128 MB scoped_vmem compile in benchmarks/flag_sweep_vit.jsonl
        # proves the headroom
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=32 * 1024 * 1024
        ),
        interpret=interpret,
    )(x, w1, b1[None, :], w2, dy)
    g = g.reshape(RP, F)
    dh = dh.reshape(RP, F)
    if RP != R:
        dx, g, dh = dx[:R], g[:R], dh[:R]
    return dx, g, dh


def _row_sharding3(mesh, arg_shapes):
    """Rows (batch·seq flattened upstream as [B, L] → here dim 0) stay
    sharded; feature dims whole."""
    s = arg_shapes[0].sharding.spec
    return NamedSharding(mesh, P(s[0] if len(s) else None, None))


@functools.lru_cache(maxsize=None)
def _fwd_op(approximate: bool, interpret: bool):
    def impl(x, w1, b1, w2, b2):
        return _pallas_fwd(x, w1, b1, w2, b2,
                           approximate=approximate, interpret=interpret)

    op = custom_partitioning(impl)

    def partition(mesh, arg_shapes, result_shape):
        rsh = _row_sharding3(mesh, arg_shapes)
        rep1 = NamedSharding(mesh, P(None))
        rep2 = NamedSharding(mesh, P(None, None))
        return mesh, impl, rsh, (rsh, rep2, rep1, rep2, rep1)

    def infer_sharding(mesh, arg_shapes, result_shape):
        return _row_sharding3(mesh, arg_shapes)

    op.def_partition(
        partition=partition,
        infer_sharding_from_operands=infer_sharding,
        # only the row factor propagates; weights replicate (no tp here)
        sharding_rule="r a, b c, d, e f, g -> r h",
    )
    return op


@functools.lru_cache(maxsize=None)
def _bwd_op(approximate: bool, interpret: bool):
    def impl(x, w1, b1, w2, dy):
        return _pallas_bwd(x, w1, b1, w2, dy,
                           approximate=approximate, interpret=interpret)

    op = custom_partitioning(impl)

    def partition(mesh, arg_shapes, result_shape):
        rsh = _row_sharding3(mesh, arg_shapes)
        rep1 = NamedSharding(mesh, P(None))
        rep2 = NamedSharding(mesh, P(None, None))
        return mesh, impl, (rsh, rsh, rsh), (rsh, rep2, rep1, rep2, rsh)

    def infer_sharding(mesh, arg_shapes, result_shape):
        rsh = _row_sharding3(mesh, arg_shapes)
        return (rsh, rsh, rsh)

    op.def_partition(
        partition=partition,
        infer_sharding_from_operands=infer_sharding,
        sharding_rule="r a, b c, d, e f, r g -> r h, r i, r j",
    )
    return op


@functools.partial(jax.custom_vjp, nondiff_argnums=(0, 1))
def _mlp(approximate, interpret, x, w1, b1, w2, b2):
    return _fwd_op(approximate, interpret)(x, w1, b1, w2, b2)


def _mlp_fwd(approximate, interpret, x, w1, b1, w2, b2):
    out = _fwd_op(approximate, interpret)(x, w1, b1, w2, b2)
    # b2 rides along ([H2] — negligible) so db2 casts to ITS dtype; using
    # b1's dtype silently produced a wrong-dtype gradient if the two
    # biases ever diverge (ADVICE r3)
    return out, (x, w1, b1, w2, b2)


def _mlp_bwd(approximate, interpret, res, dy):
    x, w1, b1, w2, b2 = res
    dy = dy.astype(x.dtype)
    dx, g, dh = _bwd_op(approximate, interpret)(x, w1, b1, w2, dy)
    # the weight grads are two clean full-size GEMMs — XLA runs these at
    # full MXU width with fp32 accumulation, no epilogue entanglement
    dw1 = _dot(x, dh, ((0,), (0,))).astype(w1.dtype)
    db1 = jnp.sum(dh.astype(jnp.float32), axis=0).astype(b1.dtype)
    dw2 = _dot(g, dy, ((0,), (0,))).astype(w2.dtype)
    db2 = jnp.sum(dy.astype(jnp.float32), axis=0).astype(b2.dtype)
    return dx, dw1, db1, dw2, db2


_mlp.defvjp(_mlp_fwd, _mlp_bwd)


def dense_gelu_dense(
    x: jax.Array,
    w1: jax.Array,
    b1: jax.Array,
    w2: jax.Array,
    b2: jax.Array,
    *,
    approximate: bool = False,
    interpret: bool | None = None,
) -> jax.Array:
    """``gelu(x @ w1 + b1) @ w2 + b2`` with fused Pallas fwd AND bwd.

    x: [..., H] (leading dims flattened to rows internally — rows are
    independent, so batch/sequence sharding passes straight through).
    w1: [H, F], b1: [F], w2: [F, H2], b2: [H2].
    """
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    lead = x.shape[:-1]
    H = x.shape[-1]
    out = _mlp(bool(approximate), bool(interpret),
               x.reshape(-1, H), w1, b1, w2, b2)
    return out.reshape(*lead, w2.shape[1])
