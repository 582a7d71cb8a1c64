"""Fused pre-LN transformer MLP block as a single Pallas kernel.

Target: the ViT-B/16 inference hot spot. The op-level roofline
(tools/trace_report.py, logs/trace_vit_zeroshot.json) showed XLA's best
schedule for the exact-GELU tower spends 45.8% of the zero-shot step in
twelve per-layer `convert_reduce_fusion`s — the MLP second GEMM
([B·197, 3072] @ [3072, 768]) with the next LayerNorm's reductions fused
into its epilogue at ~29% MXU efficiency, and unfusing makes it worse
(NOTES.md "TRACE-BACKED ROOFLINE"). This kernel takes the whole block

    out = x + W2 · gelu(W1 · LN(x) + b1) + b2

row-tile by row-tile instead: both GEMMs run back-to-back on MXU-aligned
tiles with the LN, bias and GELU epilogues on the VPU between them, both
weight matrices resident in VMEM across the grid (constant index_map →
fetched once), and one HBM round-trip for the activations instead of
XLA's four (ln → mlp1+gelu → mlp2+reduce → add).

Semantics mirror models/vit.py ViTEncoderLayer's MLP half exactly:
LayerNorm in fp32 (eps 1e-6), GEMMs in the model compute dtype with fp32
accumulation, GELU exact-erf (or tanh with gelu_approximate) in fp32,
residual add in the compute dtype. Rows are independent (LN reduces over
the feature dim only), so the flattened [B·N, D] view needs no masking —
padded tail rows compute garbage that is never written back.

`fused_mlp_block` is forward-only (pallas_call has no VJP);
`fused_mlp_block_trainable` wraps it in a custom VJP — fused Pallas
forward, backward = the exact XLA linearization of `mlp_block_reference`
recomputed from the saved inputs — so GradCAM can differentiate through
a fused inference forward. Training steps keep the XLA composition by
measurement (NOTES r2: the bwd recompute outweighs the fwd win). The op
is GSPMD-partitionable along rows via custom_partitioning, so dp-sharded
batches stay sharded through it. Wire via ViT(fused_mlp=True) /
CLI --fused-mlp.
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.custom_partitioning import custom_partitioning
from jax.experimental.pallas import tpu as pltpu
from jax.sharding import NamedSharding, PartitionSpec as P


def _round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


def _erf(x: jax.Array) -> jax.Array:
    """Abramowitz & Stegun 7.1.26 erf — Mosaic lowers neither erf nor
    erfc, so the exact-GELU path carries its own rational approximation.
    Max abs error 5.3e-7 in fp32 (validated vs scipy over [-6, 6]), three
    decimal orders below bf16 resolution — the fused tower matches the
    unfused exact-GELU tower to bf16 rounding, not to --fast-gelu's 1e-3."""
    a1, a2, a3, a4, a5 = (
        0.254829592, -0.284496736, 1.421413741, -1.453152027, 1.061405429,
    )
    p = 0.3275911
    s = jnp.sign(x)
    ax = jnp.abs(x)
    t = 1.0 / (1.0 + p * ax)
    poly = ((((a5 * t + a4) * t + a3) * t + a2) * t + a1) * t
    return s * (1.0 - poly * jnp.exp(-ax * ax))


def _gelu(x: jax.Array, approximate: bool) -> jax.Array:
    if approximate:
        return jax.nn.gelu(x, approximate=True)
    inv_sqrt2 = 0.7071067811865476
    return 0.5 * x * (1.0 + _erf(x * inv_sqrt2))


def _mlp_block_kernel(
    x_ref, ls_ref, lb_ref, w1_ref, b1_ref, w2_ref, b2_ref, out_ref,
    *, eps: float, approximate: bool, compute_dtype,
):
    x = x_ref[:]  # [bm, D] compute dtype
    xf = x.astype(jnp.float32)
    mean = jnp.mean(xf, axis=-1, keepdims=True)
    var = jnp.mean(jnp.square(xf - mean), axis=-1, keepdims=True)
    y = (xf - mean) * jax.lax.rsqrt(var + eps)
    y = y * ls_ref[:].astype(jnp.float32) + lb_ref[:].astype(jnp.float32)
    y = y.astype(compute_dtype)
    h = jnp.dot(y, w1_ref[:], preferred_element_type=jnp.float32)
    h = h + b1_ref[:].astype(jnp.float32)
    h = _gelu(h, approximate).astype(compute_dtype)
    o = jnp.dot(h, w2_ref[:], preferred_element_type=jnp.float32)
    o = o + b2_ref[:].astype(jnp.float32)
    out_ref[:] = x + o.astype(compute_dtype)


def fused_mlp_block(
    x: jax.Array,
    ln_scale: jax.Array,
    ln_bias: jax.Array,
    w1: jax.Array,
    b1: jax.Array,
    w2: jax.Array,
    b2: jax.Array,
    *,
    eps: float = 1e-6,
    gelu_approximate: bool = False,
    # 128 rows: best measured tile (~105 TF/s at ViT-B/16 geometry) and
    # fits VMEM with both weight matrices resident — 256 exceeds the 16 MB
    # scoped limit by ~0.3 MB at D=768/H=3072 bf16 (512 works with a
    # raised vmem_limit but measures the same, NOTES r2).
    block_rows: int = 128,
    interpret: Optional[bool] = None,
) -> jax.Array:
    """x[..., D] → x + W2·gelu(W1·LN(x)+b1)+b2, one kernel launch.

    Leading dims are flattened into the row grid; D and the hidden dim
    must be multiples of 128 (ViT-B/16: 768/3072). Weights are column-major
    as Flax Dense kernels: w1 [D, H], w2 [H, D].
    """
    if interpret is None:
        # Mosaic compiles only for TPU; elsewhere run the interpreter so
        # the op keeps identical semantics on any backend (CPU test mesh).
        interpret = jax.default_backend() != "tpu"
    orig_shape = x.shape
    d = orig_shape[-1]
    h = w1.shape[1]
    if d % 128 or h % 128:
        raise ValueError(f"feature dims must be MXU-aligned, got D={d} H={h}")
    if w1.shape != (d, h) or w2.shape != (h, d):
        raise ValueError(f"weight shapes {w1.shape}/{w2.shape} do not match D={d} H={h}")
    m = 1
    for s in orig_shape[:-1]:
        m *= s
    x2 = x.reshape(m, d)
    compute_dtype = x.dtype

    row = lambda a: a.reshape(1, -1)
    op = _partitioned_mlp_op(eps, gelu_approximate, block_rows, interpret)
    out = op(
        x2, row(ln_scale), row(ln_bias),
        w1.astype(compute_dtype), row(b1),
        w2.astype(compute_dtype), row(b2),
    )
    return out.reshape(orig_shape)


def _pallas_mlp_2d(
    x2, ls, lb, w1, b1, w2, b2,
    *, eps: float, approximate: bool, block_rows: int, interpret: bool,
):
    """The raw pallas_call on the flat [M, D] view."""
    m, d = x2.shape
    h = w1.shape[1]
    compute_dtype = x2.dtype
    bm = min(block_rows, _round_up(m, 8))
    grid = (pl.cdiv(m, bm),)
    kernel = functools.partial(
        _mlp_block_kernel,
        eps=eps, approximate=approximate, compute_dtype=compute_dtype,
    )
    return pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((bm, d), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, d), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, d), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((d, h), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, h), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((h, d), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, d), lambda i: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(
            (bm, d), lambda i: (i, 0), memory_space=pltpu.VMEM
        ),
        out_shape=jax.ShapeDtypeStruct((m, d), compute_dtype),
        cost_estimate=pl.CostEstimate(
            flops=2 * m * d * h * 2,
            bytes_accessed=(m * d * 2 + d * h + h * d) * x2.dtype.itemsize,
            transcendentals=m * h,
        ),
        interpret=interpret,
    )(x2, ls, lb, w1, b1, w2, b2)


@functools.lru_cache(maxsize=None)
def _partitioned_mlp_op(
    eps: float, approximate: bool, block_rows: int, interpret: bool
):
    """GSPMD-partitionable wrapper: rows are independent, so the kernel is
    trivially data-parallel — but an opaque custom call is otherwise
    REPLICATED by the partitioner (verified: a dp-sharded input produced an
    all-gather + fully-replicated compute). custom_partitioning declares
    row-dim sharding legal (`m d, ... -> m d`), weights replicated, and
    lowers to the same pallas_call on each device's local rows."""

    def impl(x2, ls, lb, w1, b1, w2, b2):
        return _pallas_mlp_2d(
            x2, ls, lb, w1, b1, w2, b2,
            eps=eps, approximate=approximate,
            block_rows=block_rows, interpret=interpret,
        )

    op = custom_partitioning(impl)

    def partition(mesh, arg_shapes, result_shape):
        x_spec = arg_shapes[0].sharding.spec
        # keep only the row-dim sharding of x; the feature dim and every
        # weight must be whole on each device (the dp-only CLI guard)
        row_sharding = NamedSharding(
            mesh, P(x_spec[0] if len(x_spec) else None, None)
        )
        repl = NamedSharding(mesh, P())
        arg_shardings = (row_sharding,) + tuple(repl for _ in arg_shapes[1:])
        return mesh, impl, row_sharding, arg_shardings

    def infer_sharding(mesh, arg_shapes, result_shape):
        x_spec = arg_shapes[0].sharding.spec
        return NamedSharding(
            mesh, P(x_spec[0] if len(x_spec) else None, None)
        )

    op.def_partition(
        partition=partition,
        infer_sharding_from_operands=infer_sharding,
        sharding_rule="m d, u d, u d, d h, u h, h d, u d -> m d",
    )
    return op


@functools.partial(jax.custom_vjp, nondiff_argnums=(0, 1))
def _mlp_block_vjp(eps, gelu_approximate, x, ls, lb, w1, b1, w2, b2):
    return fused_mlp_block(
        x, ls, lb, w1, b1, w2, b2,
        eps=eps, gelu_approximate=gelu_approximate,
    )


def _mlp_block_vjp_fwd(eps, gelu_approximate, x, ls, lb, w1, b1, w2, b2):
    out = fused_mlp_block(
        x, ls, lb, w1, b1, w2, b2,
        eps=eps, gelu_approximate=gelu_approximate,
    )
    # Residuals are just the inputs — the backward recomputes the block's
    # internals (LN stats, the hidden activation) through XLA instead of
    # saving the [rows, H] tensor, the same economy jax.checkpoint buys.
    return out, (x, ls, lb, w1, b1, w2, b2)


def _mlp_block_vjp_bwd(eps, gelu_approximate, res, g):
    x, ls, lb, w1, b1, w2, b2 = res
    _, pullback = jax.vjp(
        functools.partial(
            mlp_block_reference, eps=eps, gelu_approximate=gelu_approximate
        ),
        x, ls, lb, w1, b1, w2, b2,
    )
    return pullback(g)


_mlp_block_vjp.defvjp(_mlp_block_vjp_fwd, _mlp_block_vjp_bwd)


def fused_mlp_block_trainable(
    x: jax.Array,
    ln_scale: jax.Array,
    ln_bias: jax.Array,
    w1: jax.Array,
    b1: jax.Array,
    w2: jax.Array,
    b2: jax.Array,
    *,
    eps: float = 1e-6,
    gelu_approximate: bool = False,
) -> jax.Array:
    """`fused_mlp_block` with a custom VJP: Pallas forward, exact-XLA
    backward.

    The forward runs the fused kernel; the backward linearizes
    `mlp_block_reference` at the saved inputs, so gradients are
    bit-identical to the unfused tower's. This exists for differentiating
    THROUGH an inference forward (GradCAM on a --fused-mlp model) —
    pallas_call itself has no VJP. Wiring it into the training step was
    measured a net LOSS (ViT pretrain B=128 seq200: 296.9 → 281.3 img/s;
    the backward's block recompute outweighs the forward win), so the
    ViT gate keeps training on the XLA path (models/vit.py)."""
    return _mlp_block_vjp(
        eps, gelu_approximate, x, ln_scale, ln_bias, w1, b1, w2, b2
    )


def mlp_block_reference(
    x: jax.Array,
    ln_scale: jax.Array,
    ln_bias: jax.Array,
    w1: jax.Array,
    b1: jax.Array,
    w2: jax.Array,
    b2: jax.Array,
    *,
    eps: float = 1e-6,
    gelu_approximate: bool = False,
) -> jax.Array:
    """Pure-XLA composition in the exact ViTEncoderLayer dtype discipline —
    the equivalence oracle for the kernel (models/vit.py:95-101)."""
    dtype = x.dtype
    xf = x.astype(jnp.float32)
    mean = jnp.mean(xf, axis=-1, keepdims=True)
    var = jnp.mean(jnp.square(xf - mean), axis=-1, keepdims=True)
    y = (xf - mean) * jax.lax.rsqrt(var + eps)
    y = (y * ln_scale.astype(jnp.float32) + ln_bias.astype(jnp.float32))
    y = y.astype(dtype)
    h = jnp.dot(y, w1.astype(dtype), preferred_element_type=jnp.float32)
    h = h + b1.astype(jnp.float32)
    h = jax.nn.gelu(h, approximate=gelu_approximate).astype(dtype)
    o = jnp.dot(h, w2.astype(dtype), preferred_element_type=jnp.float32)
    o = o + b2.astype(jnp.float32)
    return x + o.astype(dtype)
