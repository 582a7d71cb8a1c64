"""Multi-slice (DCN × ICI) mesh: global-batch loss equivalence on a 2×4
virtual mesh, batch sharded over both axes."""

import functools

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.experimental.shard_map import shard_map
from jax.sharding import NamedSharding, PartitionSpec as P

from clip_for_dl_tpu import losses as L
from clip_for_dl_tpu.core.mesh import create_hybrid_mesh


def test_hybrid_mesh_shape(eight_devices):
    mesh = create_hybrid_mesh(2)
    assert mesh.devices.shape == (2, 4)
    assert mesh.axis_names == ("dcn", "data")


def test_global_loss_over_both_axes(rng, eight_devices):
    mesh = create_hybrid_mesh(2)
    img = jnp.asarray(rng.standard_normal((16, 8)), jnp.float32)
    txt = jnp.asarray(rng.standard_normal((16, 8)), jnp.float32)

    @functools.partial(
        shard_map, mesh=mesh,
        in_specs=(P(("dcn", "data")), P(("dcn", "data"))), out_specs=P(),
    )
    def sharded(a, b):
        return L.make_global(
            lambda x, y: L.info_nce_loss(x, y, 0.5),
            axis_name=("dcn", "data"),
        )(a, b)

    want_val, want_grad = jax.value_and_grad(
        lambda a: L.info_nce_loss(a, txt, 0.5)
    )(img)
    got_val, got_grad = jax.value_and_grad(lambda a: sharded(a, txt))(img)
    assert float(got_val) == pytest.approx(float(want_val), abs=1e-5)
    np.testing.assert_allclose(np.asarray(got_grad), np.asarray(want_grad),
                               atol=1e-5)


def test_dp_step_on_hybrid_mesh(rng, eight_devices):
    """The full GSPMD train step also runs over the 2-D mesh with the batch
    sharded across both axes."""
    from jax.sharding import NamedSharding

    from clip_for_dl_tpu.core.config import ModelConfig
    from clip_for_dl_tpu.models import CXRClip
    from clip_for_dl_tpu.train import (
        TrainState,
        base_transform,
        make_clip_pretrain_step,
        make_label_fn,
    )

    cfg = ModelConfig(
        image_size=16, max_text_length=8, vocab_size=64, text_embedding_dim=16,
        text_layers=1, text_heads=2, text_intermediate_dim=32,
        shared_embedding_dim=32, resnet_stages=(1, 1, 1, 1), resnet_width=8,
    )
    model = CXRClip(cfg)
    variables = model.init(
        jax.random.key(0), jnp.zeros((1, 16, 16, 3)), jnp.zeros((1, 8), jnp.int32)
    )
    tx = base_transform()
    step = make_clip_pretrain_step(
        model, tx, make_label_fn([]), temperature=2.0, image_size=16,
        compute_dtype=jnp.float32,
    )
    mesh = create_hybrid_mesh(2)
    repl = NamedSharding(mesh, P())
    shard = NamedSharding(mesh, P(("dcn", "data")))
    state = jax.device_put(TrainState.create(variables, tx), repl)
    rng_np = np.random.default_rng(0)
    batch = {
        "images": jax.device_put(
            rng_np.integers(0, 255, (8, 16, 16, 3), np.uint8), shard
        ),
        "input_ids": jax.device_put(
            rng_np.integers(0, 64, (8, 8)).astype(np.int32), shard
        ),
        "attention_mask": jax.device_put(np.ones((8, 8), np.int32), shard),
    }
    jitted = jax.jit(step)
    state, metrics = jitted(state, batch, {"default": 1e-3}, jax.random.key(1))
    assert np.isfinite(float(metrics["loss"]))
