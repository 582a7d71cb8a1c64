"""Pipeline parallelism (GPipe-style) for the BERT text tower.

The reference is single-device (SURVEY.md §5.8); dp.py / tp.py / sp.py
cover the batch, hidden and sequence dimensions. This module adds the
fourth axis — **layers over stages**: the text tower's transformer
blocks are split into S contiguous stages laid out over a ``stage``
mesh axis, and microbatches flow through them in the classic GPipe
schedule. TPU-native construction:

- the per-layer params (homogeneous ``BertLayer`` blocks) are **stacked**
  into leaves of shape ``[S, layers_per_stage, ...]`` and sharded
  ``P('stage')``, so each device materializes only its own stage's
  weights and Adam moments — the actual memory win of PP;
- the schedule runs inside one ``shard_map``: each step every stage
  applies its layers to the microbatch it currently holds, then the
  activations rotate one hop with ``lax.ppermute`` — a neighbor
  ICI transfer, never a global collective;
- the bubble is the standard ``(S-1)/(M+S-1)`` with M microbatches;
- ``ppermute``/``psum`` are differentiable, so ``jax.grad`` through the
  pipelined forward yields the 1F1B-equivalent backward for free — the
  pp train step below is a drop-in peer of the dp/tp step wrappers.

Composes with data parallelism on a 2-D ``(data, stage)`` mesh: the
microbatch dimension shards over ``data``, the layer stack over
``stage``.
"""

from __future__ import annotations

from functools import partial
from typing import Any, Dict, Mapping, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
from jax import lax, shard_map
from jax.sharding import Mesh, PartitionSpec as P

from ..core.mesh import DATA_AXIS
from .common import create_2d_mesh, shard_tree, spec_parallel_step, tree_shardings

STAGE_AXIS = "stage"
# params['text_tower'] key holding the [S, layers_per_stage, ...] stack.
STACK_KEY = "pipeline_stack"


def create_dp_pp_mesh(
    pp: int,
    num_devices: Optional[int] = None,
    devices: Optional[Sequence[jax.Device]] = None,
    axis_names: Tuple[str, str] = (DATA_AXIS, STAGE_AXIS),
) -> Mesh:
    """2-D ``(data, stage)`` mesh; ``stage`` innermost so the per-step
    ppermute hops ride nearest-neighbor ICI links."""
    return create_2d_mesh(pp, axis_names, num_devices, devices)


def validate_pp(
    num_layers: int, pp: int, num_microbatches: int, batch_size: int
) -> None:
    if pp < 1 or num_layers % pp:
        raise ValueError(f"pp={pp} must divide the layer count {num_layers}")
    if num_microbatches < 1 or batch_size % num_microbatches:
        raise ValueError(
            f"microbatches={num_microbatches} must divide batch {batch_size}"
        )


# ---------------------------------------------------------------------------
# param restructuring: layer_0..layer_{L-1}  <->  [S, L/S, ...] stack
# ---------------------------------------------------------------------------


def _layer_keys(text_params: Mapping[str, Any]):
    keys = sorted(
        (k for k in text_params if k.startswith("layer_")),
        key=lambda k: int(k.split("_")[1]),
    )
    if not keys:
        raise ValueError("text tower params contain no layer_<i> entries")
    return keys


def stack_bert_layers(
    text_params: Mapping[str, Any], num_stages: int
) -> Dict[str, Any]:
    """``{embeddings, layer_0..layer_{L-1}}`` →
    ``{embeddings, pipeline_stack}`` with stack leaves
    ``[num_stages, L/num_stages, ...]`` (stage-major, layer order
    preserved)."""
    keys = _layer_keys(text_params)
    if len(keys) % num_stages:
        raise ValueError(
            f"{len(keys)} layers do not split into {num_stages} stages"
        )
    lps = len(keys) // num_stages
    stages = []
    for s in range(num_stages):
        chunk = [text_params[keys[s * lps + j]] for j in range(lps)]
        stages.append(jax.tree.map(lambda *ls: jnp.stack(ls), *chunk))
    stacked = jax.tree.map(lambda *ss: jnp.stack(ss), *stages)
    out = {k: v for k, v in text_params.items() if not k.startswith("layer_")}
    out[STACK_KEY] = stacked
    return out


def unstack_bert_layers(text_params: Mapping[str, Any]) -> Dict[str, Any]:
    """Inverse of :func:`stack_bert_layers` (checkpoint/eval layout)."""
    stacked = text_params[STACK_KEY]
    lead = jax.tree.leaves(stacked)[0]
    num_stages, lps = int(lead.shape[0]), int(lead.shape[1])
    out = {k: v for k, v in text_params.items() if k != STACK_KEY}
    for s in range(num_stages):
        for j in range(lps):
            out[f"layer_{s * lps + j}"] = jax.tree.map(
                lambda t: t[s, j], stacked
            )
    return out


def pp_params(params: Mapping[str, Any], num_stages: int) -> Dict[str, Any]:
    """Whole-model params with ``text_tower`` stacked for pipelining."""
    out = dict(params)
    out["text_tower"] = stack_bert_layers(params["text_tower"], num_stages)
    return out


def unpp_params(params: Mapping[str, Any]) -> Dict[str, Any]:
    out = dict(params)
    out["text_tower"] = unstack_bert_layers(params["text_tower"])
    return out


def pp_train_state(state, num_stages: int):
    """Restack EVERY ``text_tower`` subtree in a TrainState into pipeline
    layout — params and the optimizer moments (whose trees mirror the
    params, e.g. Adam mu/nu) alike, so a state created or resumed in the
    canonical per-layer layout drops into the pp step."""

    def walk(node):
        if isinstance(node, Mapping):
            out = {}
            for k, v in node.items():
                if (
                    k == "text_tower"
                    and isinstance(v, Mapping)
                    and any(str(kk).startswith("layer_") for kk in v)
                ):
                    out[k] = stack_bert_layers(v, num_stages)
                else:
                    out[k] = walk(v)
            return out
        if isinstance(node, tuple):
            vals = [walk(v) for v in node]
            return type(node)(*vals) if hasattr(node, "_fields") else tuple(vals)
        if isinstance(node, list):
            return [walk(v) for v in node]
        return node

    return state.replace(
        params=walk(state.params), opt_state=walk(state.opt_state)
    )


def pp_spec(path, value, axis_name: str = STAGE_AXIS) -> P:
    """P('stage') on leading dim of pipeline-stack leaves; replicated
    elsewhere. Works on params, opt-state moments and whole TrainStates
    (their tree paths contain the same ``pipeline_stack`` component)."""
    for part in path:
        key = getattr(part, "key", getattr(part, "name", None))
        if str(key) == STACK_KEY:
            return P(axis_name)
    return P()


def pp_shardings(tree, mesh: Mesh, axis_name: str = STAGE_AXIS):
    return tree_shardings(tree, mesh, pp_spec, axis_name)


def shard_state_pp(state, mesh: Mesh, axis_name: str = STAGE_AXIS):
    """Place a TrainState (params already in pp layout) on a (data, stage)
    mesh — each device holds its own stage's weights + moments."""
    return shard_tree(state, mesh, pp_spec, axis_name)


# ---------------------------------------------------------------------------
# the pipelined forward
# ---------------------------------------------------------------------------


def _gpipe_loop(layer_apply, num_stages, num_microbatches, stack, x_mb, b_mb):
    """Body run per-device inside shard_map. ``stack`` is this stage's
    ``[1, layers_per_stage, ...]`` slice; ``x_mb``/``b_mb`` are the full
    microbatch arrays ``[M, mb, ...]`` (replicated over ``stage``,
    sharded over ``data``)."""
    stage_params = jax.tree.map(lambda t: t[0], stack)
    idx = lax.axis_index(STAGE_AXIS)
    perm = [(i, (i + 1) % num_stages) for i in range(num_stages)]
    zeros_x = jnp.zeros_like(x_mb[0])
    zeros_b = jnp.zeros_like(b_mb[0])
    carry, bias = zeros_x, zeros_b
    outs = []
    for t in range(num_microbatches + num_stages - 1):
        inp = x_mb[t] if t < num_microbatches else zeros_x
        binp = b_mb[t] if t < num_microbatches else zeros_b
        carry = jnp.where(idx == 0, inp, carry)
        bias = jnp.where(idx == 0, binp, bias)
        carry = layer_apply(stage_params, carry, bias)
        if t >= num_stages - 1:
            outs.append(carry)
        if t < num_microbatches + num_stages - 2 and num_stages > 1:
            carry = lax.ppermute(carry, STAGE_AXIS, perm)
            bias = lax.ppermute(bias, STAGE_AXIS, perm)
    out = jnp.stack(outs)  # valid on the last stage only
    out = jnp.where(idx == num_stages - 1, out, 0)
    return lax.psum(out, STAGE_AXIS)  # broadcast result to every stage


def pipelined_bert_forward(
    encoder,
    text_params: Mapping[str, Any],
    input_ids: jnp.ndarray,
    attention_mask: Optional[jnp.ndarray],
    mesh: Mesh,
    num_microbatches: int,
):
    """last_hidden_state [B, L, hidden] of ``encoder`` (a ``BertEncoder``)
    with the transformer blocks pipelined over the mesh's ``stage`` axis.

    ``text_params`` must be in pipeline layout (:func:`stack_bert_layers`).
    Embeddings/LayerNorm-in run replicated (they are ~0.1% of tower
    FLOPs); only the block stack is staged. Dropout-free (deterministic)
    — the pp step documents this divergence from the dropout-bearing
    single-device step.
    """
    from ..models.bert import BertEmbeddings, BertLayer

    num_stages = mesh.shape[STAGE_AXIS]
    b, l = input_ids.shape
    validate_pp(encoder.layers, num_stages, num_microbatches, b)
    mb = b // num_microbatches
    dp = mesh.shape.get(DATA_AXIS, 1)
    if mb % dp:
        raise ValueError(
            f"microbatch size {mb} (batch {b} / {num_microbatches} "
            f"microbatches) must divide over the data axis ({dp})"
        )

    emb = BertEmbeddings(
        encoder.vocab_size, encoder.hidden, encoder.max_position,
        dropout=encoder.dropout, dtype=encoder.dtype,
        param_dtype=encoder.param_dtype,
    ).apply({"params": text_params["embeddings"]}, input_ids)
    if attention_mask is not None:
        bias = jnp.where(
            attention_mask[:, None, None, :] > 0, 0.0, -1e10
        ).astype(jnp.float32)
    else:
        bias = jnp.zeros((b, 1, 1, l), jnp.float32)

    layer_mod = BertLayer(
        encoder.hidden, encoder.heads, encoder.intermediate,
        encoder.dropout, dtype=encoder.dtype, param_dtype=encoder.param_dtype,
    )

    def layer_apply(stage_params, x, bias):
        lps = jax.tree.leaves(stage_params)[0].shape[0]
        for j in range(lps):
            lp = jax.tree.map(lambda t: t[j], stage_params)
            x = layer_mod.apply({"params": lp}, x, bias, True, False)
        return x

    x_mb = emb.reshape(num_microbatches, mb, *emb.shape[1:])
    b_mb = bias.reshape(num_microbatches, mb, *bias.shape[1:])
    data_in_mesh = DATA_AXIS in mesh.shape
    mb_spec = P(None, DATA_AXIS) if data_in_mesh else P(None)

    fn = partial(
        _gpipe_loop, layer_apply, num_stages, num_microbatches
    )
    out = shard_map(
        fn,
        mesh=mesh,
        in_specs=(P(STAGE_AXIS), mb_spec, mb_spec),
        out_specs=mb_spec,
    )(text_params[STACK_KEY], x_mb, b_mb)
    return out.reshape(b, *out.shape[2:])


def pipelined_vit_forward(
    vit,
    vit_params: Mapping[str, Any],
    images: jnp.ndarray,
    mesh: Mesh,
    num_microbatches: int,
):
    """CLS features [B, hidden] of a ``ViT`` tower with its encoder blocks
    pipelined over the mesh's ``stage`` axis — the image-side counterpart
    of :func:`pipelined_bert_forward` (the stack/spec machinery is shared;
    ViT blocks are the same homogeneous ``layer_<i>`` shape).

    ``vit_params`` must be in pipeline layout (:func:`stack_bert_layers`
    on the tower's params — the function is tower-agnostic). The stem
    (patchify Dense, class token, position embeddings — re-expressed
    functionally; exactness pinned by tests/test_pp.py) and the final
    LayerNorm run replicated; dropout-free like the text pipeline.
    """
    import flax.linen as nn

    from ..models.vit import ViTEncoderLayer

    num_stages = mesh.shape[STAGE_AXIS]
    b, hgt, wdt, c = images.shape
    validate_pp(vit.layers, num_stages, num_microbatches, b)
    mb = b // num_microbatches
    dp = mesh.shape.get(DATA_AXIS, 1)
    if mb % dp:
        raise ValueError(
            f"microbatch size {mb} must divide over the data axis ({dp})"
        )

    # stem: patchify-as-matmul + cls + pos (ViT.__call__'s exact math)
    p = vit.patch
    gh, gw = hgt // p, wdt // p
    x = images.astype(vit.dtype)
    x = x.reshape(b, gh, p, gw, p, c).transpose(0, 1, 3, 2, 4, 5)
    x = x.reshape(b, gh * gw, p * p * c)
    pe = vit_params["patch_embed"]
    x = x @ pe["kernel"].astype(vit.dtype) + pe["bias"].astype(vit.dtype)
    cls = jnp.broadcast_to(
        vit_params["class_token"].astype(vit.dtype), (b, 1, vit.hidden)
    )
    x = jnp.concatenate([cls, x], axis=1)
    x = x + vit_params["pos_embedding"].astype(vit.dtype)

    layer_mod = ViTEncoderLayer(
        vit.hidden, vit.heads, vit.mlp_dim, vit.dropout,
        vit.gelu_approximate, dtype=vit.dtype, param_dtype=vit.param_dtype,
    )

    def layer_apply(stage_params, x, _bias):
        lps = jax.tree.leaves(stage_params)[0].shape[0]
        for j in range(lps):
            lp = jax.tree.map(lambda t: t[j], stage_params)
            x = layer_mod.apply({"params": lp}, x, True, False)
        return x

    x_mb = x.reshape(num_microbatches, mb, *x.shape[1:])
    dummy = jnp.zeros((num_microbatches, mb, 1), jnp.float32)
    data_in_mesh = DATA_AXIS in mesh.shape
    mb_spec = P(None, DATA_AXIS) if data_in_mesh else P(None)
    fn = partial(_gpipe_loop, layer_apply, num_stages, num_microbatches)
    out = shard_map(
        fn,
        mesh=mesh,
        in_specs=(P(STAGE_AXIS), mb_spec, mb_spec),
        out_specs=mb_spec,
    )(vit_params[STACK_KEY], x_mb, dummy)
    out = out.reshape(b, *out.shape[2:])
    out = nn.LayerNorm(
        epsilon=1e-6, dtype=jnp.float32, param_dtype=vit.param_dtype,
    ).apply({"params": vit_params["ln"]}, out.astype(jnp.float32))
    return out.astype(vit.dtype)[:, 0, :]


# ---------------------------------------------------------------------------
# pp train step (CLIP contrastive pretrain with a pipelined text tower)
# ---------------------------------------------------------------------------


def make_pp_clip_pretrain_step(
    model,
    tx,
    label_fn,
    mesh: Mesh,
    num_microbatches: int,
    loss_name: str = "clip_self_distill",
    temperature: float = 2.0,
    image_size: int = 224,
    mean: Tuple[float, ...] = (0.0, 0.0, 0.0),
    std: Tuple[float, ...] = (1.0, 1.0, 1.0),
    compute_dtype=jnp.bfloat16,
):
    """Peer of ``train.make_clip_pretrain_step`` whose text tower runs
    pipelined over the ``stage`` mesh axis; the image tower and the loss
    shard over ``data`` as usual (GSPMD). State params must be in pp
    layout (:func:`pp_params` / :func:`shard_state_pp`); the text tower
    runs deterministic (no dropout) inside the pipeline."""
    from ..models.heads import TextProjection
    from ..ops.image_prep import preprocess_images
    from ..train.steps import PRETRAIN_LOSSES, _apply_updates

    from ..models.bert import BertEncoder

    cfg = model.config
    if getattr(cfg, "text_moe_experts", 0):
        raise ValueError(
            "pipeline parallelism does not support a MoE text tower: the "
            "stage stack requires homogeneous (dense) blocks"
        )
    loss_fn_base = PRETRAIN_LOSSES[loss_name]
    encoder = BertEncoder(
        vocab_size=cfg.vocab_size, hidden=cfg.text_embedding_dim,
        layers=cfg.text_layers, heads=cfg.text_heads,
        intermediate=cfg.text_intermediate_dim,
        max_position=cfg.text_max_position, dropout=cfg.dropout,
        dtype=model.dtype, param_dtype=model.param_dtype,
    )
    projector = TextProjection(
        out_dim=cfg.shared_embedding_dim, dropout=cfg.dropout,
        dtype=model.dtype, param_dtype=model.param_dtype,
    )

    def step(state, batch, lrs, rng):
        images = preprocess_images(
            batch["images"], image_size, image_size, mean, std, compute_dtype
        )

        def loss_fn(params):
            # image path never touches the text tower — keep the stage-
            # sharded stack out of its param tree (no stray all-gathers)
            variables = {
                "params": {k: v for k, v in params.items() if k != "text_tower"},
                "batch_stats": state.batch_stats,
            }
            img_f, mutated = model.apply(
                variables, images, train=True, mutable=["batch_stats"],
                rngs={"dropout": rng}, method="encode_image",
            )
            hidden = pipelined_bert_forward(
                encoder, params["text_tower"], batch["input_ids"],
                batch["attention_mask"], mesh, num_microbatches,
            )
            # the projector sits outside the pipelined shard_map, so its
            # dropout stays active like every other regime's step
            txt_f = projector.apply(
                {"params": params["text_projector"]}, hidden[:, 0, :],
                deterministic=False,
                rngs={"dropout": jax.random.fold_in(rng, 1)},
            )
            loss = loss_fn_base(txt_f, img_f, temperature)
            return loss, mutated["batch_stats"]

        (loss, new_stats), grads = jax.value_and_grad(loss_fn, has_aux=True)(
            state.params
        )
        new_state = _apply_updates(state, grads, tx, lrs, label_fn, new_stats)
        return new_state, {"loss": loss}

    return step


def pipeline_parallel_step(
    step_fn,
    mesh: Mesh,
    data_axis: str = DATA_AXIS,
    stage_axis: str = STAGE_AXIS,
    donate_state: bool = True,
):
    """jit a pp ``step(state, batch, *rest)`` over a (data, stage) mesh:
    batch sharded on ``data``, pipeline stack sharded on ``stage`` (in-
    and out-pinned — see ``common.spec_parallel_step``)."""
    return spec_parallel_step(
        step_fn, mesh, pp_spec, stage_axis, data_axis, donate_state
    )
