"""Sequence parallelism for the text tower, via GSPMD.

The reference caps reports at 512 tokens and has no mechanism to scale
sequence length (SURVEY.md §5.7) — DP alone covers parity scale. This
module opens that door the TPU-native way: shard the *sequence* dimension
of the token batch over a mesh axis and let GSPMD propagate. Pointwise
stages (embeddings, LayerNorm, dropout, the MLP) stay sequence-local;
self-attention needs every key/value, so XLA inserts the K/V all-gathers
automatically — the same collective schedule Megatron-SP hand-writes,
derived here from input shardings alone (no model-code changes).

Composes with tensor parallelism on the same 2-D ``(data, model)`` mesh:
with TP-sharded tower params (``parallel/tp.py``) the sequence axis rides
``model`` in the pointwise regions and the head axis rides it inside
attention — GSPMD picks the transposition points.

Exactness is tested against the single-device forward
(tests/test_sp.py); the padded-attention mask keeps ragged sequence
shards inert.
"""

from __future__ import annotations

from typing import Callable, Optional

import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..core.mesh import DATA_AXIS
from .tp import MODEL_AXIS, tp_shardings


def sequence_sharded_fn(
    fn: Callable,
    mesh: Mesh,
    data_axis: str = DATA_AXIS,
    seq_axis: str = MODEL_AXIS,
    tp_params: bool = False,
) -> Callable:
    """jit a text-tower forward ``fn(params, input_ids, attention_mask)``
    with tokens sharded ``[batch→data, sequence→seq_axis]``.

    ``tp_params=True`` additionally tensor-parallel-shards the params over
    ``seq_axis`` (Megatron TP+SP on one axis); otherwise params replicate.
    """
    if tp_params:
        param_sharding = lambda params: tp_shardings(params, mesh, seq_axis)
    else:
        repl = NamedSharding(mesh, P())
        param_sharding = lambda params: jax.tree.map(lambda _: repl, params)
    token_sharding = NamedSharding(mesh, P(data_axis, seq_axis))

    compiled: dict = {}
    n_batch = int(mesh.shape[data_axis])
    n_seq = int(mesh.shape[seq_axis])

    def wrapped(params, input_ids, attention_mask):
        import jax.numpy as jnp

        b, s = input_ids.shape
        # shardings need divisible dims: pad tokens with mask=0 positions
        # (inert under masked attention) and batch with zero rows, then
        # slice both back off the output
        pad_s = (-s) % n_seq
        pad_b = (-b) % n_batch
        if pad_s or pad_b:
            input_ids = jnp.pad(input_ids, ((0, pad_b), (0, pad_s)))
            attention_mask = jnp.pad(attention_mask, ((0, pad_b), (0, pad_s)))
        key = (input_ids.shape, input_ids.dtype)
        if key not in compiled:
            compiled[key] = jax.jit(
                fn,
                in_shardings=(
                    param_sharding(params),
                    token_sharding,
                    token_sharding,
                ),
            )
        out = compiled[key](params, input_ids, attention_mask)
        if pad_b:
            out = out[:b]
        # slice the seq dim only on per-token outputs ([B, S, ...]); pooled
        # [B, D] outputs have no seq dim even if D == padded length
        if pad_s and out.ndim >= 3 and out.shape[1] == s + pad_s:
            out = out[:, :s]
        return out

    return wrapped
