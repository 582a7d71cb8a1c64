"""Fused L2-normalize + similarity matmul.

The reference computes zero-shot logits as two separate normalizes followed by
a matmul on fp32 torch tensors (``multimodal_attention/disease_analysis.py:
330-355``, ``0426/load_model.py:107-124``). Here the whole thing is one Pallas
kernel: both operands are L2-normalized in VMEM and contracted on the MXU in a
single pass, with the temperature folded into the epilogue — no intermediate
normalized copies ever hit HBM.

Shapes follow the workload: image features [B, D] (B can be large), text/class
features [C, D] with C small (16 classes · prompts). D = 512.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def l2_normalize(x: jax.Array, axis: int = -1, eps: float = 1e-12) -> jax.Array:
    """torch.nn.functional.normalize semantics: x / max(||x||, eps)."""
    norm = jnp.sqrt(jnp.sum(jnp.square(x), axis=axis, keepdims=True))
    return x / jnp.maximum(norm, eps)


def similarity_reference(
    image_features: jax.Array,
    text_features: jax.Array,
    temperature: float = 1.0,
    normalize: bool = True,
) -> jax.Array:
    """jnp reference: cosine-similarity logits [B, C] / temperature."""
    a, b = image_features, text_features
    if normalize:
        a, b = l2_normalize(a), l2_normalize(b)
    return jnp.dot(
        a, b.T, preferred_element_type=jnp.float32
    ) / jnp.asarray(temperature, jnp.float32)


def _fused_kernel(img_ref, txt_ref, out_ref, *, inv_temp: float, eps: float):
    img = img_ref[:].astype(jnp.float32)
    txt = txt_ref[:].astype(jnp.float32)
    img_n = img * jax.lax.rsqrt(
        jnp.maximum(jnp.sum(img * img, axis=-1, keepdims=True), eps * eps)
    )
    txt_n = txt * jax.lax.rsqrt(
        jnp.maximum(jnp.sum(txt * txt, axis=-1, keepdims=True), eps * eps)
    )
    out_ref[:] = (
        jnp.dot(img_n, txt_n.T, preferred_element_type=jnp.float32) * inv_temp
    )


def _round_up(x: int, m: int) -> int:
    return -(-x // m) * m


@functools.partial(
    jax.jit, static_argnames=("temperature", "block_b", "interpret")
)
def fused_similarity(
    image_features: jax.Array,
    text_features: jax.Array,
    temperature: float = 1.0,
    block_b: int = 1024,
    interpret: bool = False,
) -> jax.Array:
    """Pallas-fused normalize+matmul: returns [B, C] fp32 logits.

    Tiled over the batch dimension; the (small) text matrix is normalized
    redundantly per tile — C·D floats, negligible versus streaming the image
    tile from HBM once instead of three times (load, store normalized, load).

    GSPMD-partitionable along the image batch (custom_partitioning — an
    opaque pallas_call would otherwise be replicated, all-gathering a
    dp-sharded feature batch); text features ride replicated.
    """
    op = _partitioned_similarity_op(float(temperature), block_b, interpret)
    return op(image_features, text_features)


@functools.lru_cache(maxsize=None)
def _partitioned_similarity_op(
    temperature: float, block_b: int, interpret: bool
):
    def impl(image_features, text_features):
        return _fused_similarity_impl(
            image_features, text_features,
            temperature=temperature, block_b=block_b, interpret=interpret,
        )

    from jax.experimental.custom_partitioning import custom_partitioning
    from jax.sharding import NamedSharding, PartitionSpec as P

    op = custom_partitioning(impl)

    def partition(mesh, arg_shapes, result_shape):
        b_spec = arg_shapes[0].sharding.spec
        row = P(b_spec[0] if len(b_spec) else None, None)
        arg_shardings = (
            NamedSharding(mesh, row),
            NamedSharding(mesh, P()),
        )
        return mesh, impl, NamedSharding(mesh, row), arg_shardings

    def infer_sharding(mesh, arg_shapes, result_shape):
        b_spec = arg_shapes[0].sharding.spec
        return NamedSharding(
            mesh, P(b_spec[0] if len(b_spec) else None, None)
        )

    op.def_partition(
        partition=partition,
        infer_sharding_from_operands=infer_sharding,
        sharding_rule="b d, c d -> b c",
    )
    return op


def _fused_similarity_impl(
    image_features: jax.Array,
    text_features: jax.Array,
    *,
    temperature: float,
    block_b: int,
    interpret: bool,
) -> jax.Array:
    B, D = image_features.shape
    C, D2 = text_features.shape
    assert D == D2, (image_features.shape, text_features.shape)

    # Pad to hardware tiles (last dim 128, second-to-last 8 for fp32).
    # jnp.pad, not .at[].set: the scatter lowering of .at[].set carries
    # empty index-array jaxpr consts, which custom_partitioning rejects.
    Bp = _round_up(B, 8)
    Cp = _round_up(C, 8)
    Dp = _round_up(D, 128)
    img = jnp.pad(image_features, ((0, Bp - B), (0, Dp - D)))
    txt = jnp.pad(text_features, ((0, Cp - C), (0, Dp - D)))

    bb = min(block_b, Bp)
    # Make the block evenly divide the padded batch.
    while Bp % bb:
        bb //= 2
    grid = (Bp // bb,)

    out = pl.pallas_call(
        functools.partial(
            _fused_kernel, inv_temp=1.0 / float(temperature), eps=1e-12
        ),
        out_shape=jax.ShapeDtypeStruct((Bp, Cp), jnp.float32),
        grid=grid,
        in_specs=[
            pl.BlockSpec((bb, Dp), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((Cp, Dp), lambda i: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(
            (bb, Cp), lambda i: (i, 0), memory_space=pltpu.VMEM
        ),
        cost_estimate=pl.CostEstimate(
            flops=2 * Bp * Cp * Dp + 4 * (Bp + Cp) * Dp,
            bytes_accessed=(Bp * Dp + Cp * Dp + Bp * Cp) * 4,
            transcendentals=0,
        ),
        interpret=interpret,
    )(img, txt)
    return out[:B, :C]


def similarity(
    image_features: jax.Array,
    text_features: jax.Array,
    temperature: float = 1.0,
    use_pallas: bool | None = None,
) -> jax.Array:
    """Dispatch: Pallas kernel on TPU, jnp reference elsewhere."""
    if use_pallas is None:
        use_pallas = jax.default_backend() == "tpu"
    if use_pallas:
        return fused_similarity(image_features, text_features, temperature)
    return similarity_reference(image_features, text_features, temperature)
