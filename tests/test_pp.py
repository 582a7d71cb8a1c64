"""Pipeline parallelism (parallel/pp.py): GPipe schedule over a `stage`
mesh axis — stack/unstack roundtrip, forward and gradient equivalence vs
the plain BertEncoder, and a full DP×PP CLIP pretrain step."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from clip_for_dl_tpu.core.config import ModelConfig
from clip_for_dl_tpu.models import CXRClip
from clip_for_dl_tpu.models.bert import BertEncoder
from clip_for_dl_tpu.parallel import (
    create_dp_pp_mesh,
    make_pp_clip_pretrain_step,
    pipeline_parallel_step,
    pipelined_bert_forward,
    pp_params,
    pp_shardings,
    shard_state_pp,
    stack_bert_layers,
    unpp_params,
    unstack_bert_layers,
    validate_pp,
)
from clip_for_dl_tpu.train import (
    TrainState,
    base_transform,
    make_clip_pretrain_step,
    make_label_fn,
)


def tiny_bert(layers=4):
    return BertEncoder(
        vocab_size=64, hidden=16, layers=layers, heads=2, intermediate=32,
        max_position=16,
    )


def tiny_cfg(**kw):
    base = dict(
        image_size=32, max_text_length=16, vocab_size=128,
        text_embedding_dim=32, text_layers=4, text_heads=2,
        text_intermediate_dim=64, shared_embedding_dim=64,
        resnet_stages=(1, 1, 1, 1), resnet_width=8,
    )
    base.update(kw)
    return ModelConfig(**base)


def test_dp_pp_mesh_shape(eight_devices):
    mesh = create_dp_pp_mesh(4)
    assert mesh.devices.shape == (2, 4)
    assert mesh.axis_names == ("data", "stage")
    with pytest.raises(ValueError):
        create_dp_pp_mesh(3)


def test_validate_pp():
    validate_pp(num_layers=12, pp=4, num_microbatches=4, batch_size=16)
    with pytest.raises(ValueError):
        validate_pp(12, 5, 4, 16)
    with pytest.raises(ValueError):
        validate_pp(12, 4, 3, 16)


def test_stack_unstack_roundtrip(rng):
    bert = tiny_bert(4)
    ids = jnp.zeros((1, 8), jnp.int32)
    params = bert.init(jax.random.key(0), ids)["params"]
    stacked = stack_bert_layers(params, 2)
    lead = jax.tree.leaves(stacked["pipeline_stack"])[0]
    assert lead.shape[:2] == (2, 2)
    back = unstack_bert_layers(stacked)
    assert sorted(back) == sorted(params)
    jax.tree.map(
        lambda a, b: np.testing.assert_array_equal(np.asarray(a), np.asarray(b)),
        back, dict(params),
    )
    with pytest.raises(ValueError):
        stack_bert_layers(params, 3)


@pytest.mark.parametrize("pp,mb", [(4, 2), (4, 4), (2, 2)])
def test_pp_forward_equivalence(rng, eight_devices, pp, mb):
    """Pipelined forward == plain forward, on a pure-stage mesh and a
    (data, stage) mesh, ragged mask included."""
    bert = tiny_bert(4)
    ids = jnp.asarray(rng.integers(0, 64, (8, 12)), jnp.int32)
    lengths = rng.integers(4, 13, (8,))
    mask = jnp.asarray(
        (np.arange(12)[None, :] < lengths[:, None]).astype(np.int32)
    )
    params = bert.init(jax.random.key(0), ids)["params"]
    want = bert.apply({"params": params}, ids, mask)

    mesh = create_dp_pp_mesh(pp)
    stacked = stack_bert_layers(params, pp)
    got = jax.jit(
        lambda p, i, m: pipelined_bert_forward(bert, p, i, m, mesh, mb)
    )(stacked, ids, mask)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=1e-5)


def test_pp_gradient_equivalence(rng, eight_devices):
    """grad through the pipeline (ppermute/psum transpose) == plain grad."""
    bert = tiny_bert(4)
    ids = jnp.asarray(rng.integers(0, 64, (4, 8)), jnp.int32)
    mask = jnp.ones((4, 8), jnp.int32)
    params = bert.init(jax.random.key(0), ids)["params"]
    mesh = create_dp_pp_mesh(4)

    def plain_loss(p):
        return jnp.sum(bert.apply({"params": p}, ids, mask) ** 2)

    def pp_loss(p):
        out = pipelined_bert_forward(bert, p, ids, mask, mesh, 2)
        return jnp.sum(out ** 2)

    want = jax.grad(plain_loss)(params)
    got = unstack_bert_layers(
        jax.jit(jax.grad(pp_loss))(stack_bert_layers(params, 4))
    )
    jax.tree.map(
        lambda a, b: np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), atol=2e-4, rtol=1e-4
        ),
        got, dict(want),
    )


def test_pp_shardings(eight_devices):
    bert = tiny_bert(4)
    params = bert.init(jax.random.key(0), jnp.zeros((1, 8), jnp.int32))[
        "params"
    ]
    mesh = create_dp_pp_mesh(4)
    sh = pp_shardings(stack_bert_layers(params, 4), mesh)
    from jax.sharding import PartitionSpec as P

    stack_sh = jax.tree.leaves(sh["pipeline_stack"])
    assert all(s.spec == P("stage") for s in stack_sh)
    assert all(
        s.spec == P() for s in jax.tree.leaves(sh["embeddings"])
    )


def test_pp_train_step(rng, eight_devices):
    """Full CLIP pretrain step with the text tower pipelined over 4 stages
    (DP 2 × PP 4): loss matches the single-device deterministic-text step;
    stage-stacked params and Adam moments update and stay sharded."""
    # dropout 0: the pp text tower runs deterministic inside the pipeline,
    # so the single-device reference must be dropout-free to compare.
    cfg = tiny_cfg(dropout=0.0)
    model = CXRClip(cfg, dtype=jnp.float32)
    variables = model.init(
        jax.random.key(0),
        jnp.zeros((1, 32, 32, 3)),
        jnp.zeros((1, 16), jnp.int32),
    )
    tx = base_transform(weight_decay=1e-3)
    label_fn = make_label_fn(
        ["image_tower", "text_tower", "image_projector", "text_projector"]
    )
    batch = {
        "images": jnp.asarray(rng.integers(0, 255, (8, 32, 32, 3)), jnp.uint8),
        "input_ids": jnp.asarray(rng.integers(0, 128, (8, 16)), jnp.int32),
        "attention_mask": jnp.ones((8, 16), jnp.int32),
    }
    lrs = {
        "image_tower": 1e-4, "text_tower": 1e-5, "image_projector": 1e-3,
        "text_projector": 1e-3, "default": 1e-4,
    }
    # reference first: shard_state_pp's device_put may alias `variables`'
    # buffers, and the pp step donates (deletes) them.
    ref_step = make_clip_pretrain_step(
        model, tx, label_fn, temperature=2.0, image_size=32,
        compute_dtype=jnp.float32,
    )
    ref_state, ref_metrics = jax.jit(ref_step)(
        TrainState.create(variables, tx), batch, lrs, jax.random.key(1)
    )

    mesh = create_dp_pp_mesh(4)
    pp_step = make_pp_clip_pretrain_step(
        model, tx, label_fn, mesh, num_microbatches=2, temperature=2.0,
        image_size=32, compute_dtype=jnp.float32,
    )
    state = shard_state_pp(
        TrainState.create(
            {**variables, "params": pp_params(variables["params"], 4)}, tx
        ),
        mesh,
    )
    wrapped = pipeline_parallel_step(pp_step, mesh)
    state2, metrics = wrapped(state, batch, lrs, jax.random.key(1))
    loss = float(metrics["loss"])
    assert np.isfinite(loss)

    # stacked text params remain stage-sharded after the update
    spec = jax.tree.leaves(state2.params["text_tower"]["pipeline_stack"])[
        0
    ].sharding.spec
    assert tuple(spec)[:1] == ("stage",)
    np.testing.assert_allclose(
        loss, float(ref_metrics["loss"]), rtol=1e-4, atol=1e-4
    )
    # updated params match: unstack the pp text tower and compare the tree
    got_params = dict(state2.params)
    got_params["text_tower"] = unstack_bert_layers(
        state2.params["text_tower"]
    )
    jax.tree.map(
        lambda a, b: np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), atol=2e-4
        ),
        got_params, dict(ref_state.params),
    )


class TestPipelinedViT:
    """The pp machinery generalizes to the image tower: stacked ViT blocks
    over the stage axis, stem/head replicated."""

    def _vit(self):
        from clip_for_dl_tpu.models.vit import ViT

        return ViT(
            image_size=32, patch=8, hidden=16, layers=4, heads=2,
            mlp_dim=32,
        )

    def test_forward_equivalence(self, rng, eight_devices):
        from clip_for_dl_tpu.parallel import pipelined_vit_forward

        vit = self._vit()
        images = jnp.asarray(
            rng.standard_normal((8, 32, 32, 3)), jnp.float32
        )
        params = vit.init(jax.random.key(0), images)["params"]
        want = vit.apply({"params": params}, images)
        mesh = create_dp_pp_mesh(4)
        stacked = stack_bert_layers(dict(params), 4)
        got = jax.jit(
            lambda p, im: pipelined_vit_forward(vit, p, im, mesh, 2)
        )(stacked, images)
        np.testing.assert_allclose(
            np.asarray(got), np.asarray(want), atol=1e-5
        )

    def test_gradient_flow(self, rng, eight_devices):
        from clip_for_dl_tpu.parallel import pipelined_vit_forward

        vit = self._vit()
        images = jnp.asarray(
            rng.standard_normal((4, 32, 32, 3)), jnp.float32
        )
        params = vit.init(jax.random.key(0), images)["params"]
        mesh = create_dp_pp_mesh(4)
        stacked = stack_bert_layers(dict(params), 4)

        def plain_loss(p):
            return jnp.sum(vit.apply({"params": p}, images) ** 2)

        def pp_loss(p):
            return jnp.sum(
                pipelined_vit_forward(vit, p, images, mesh, 2) ** 2
            )

        want = jax.grad(plain_loss)(params)
        g = jax.jit(jax.grad(pp_loss))(stacked)
        got = unstack_bert_layers(g)
        jax.tree.map(
            lambda a, b: np.testing.assert_allclose(
                np.asarray(a), np.asarray(b), atol=2e-4, rtol=1e-4
            ),
            got, dict(want),
        )
