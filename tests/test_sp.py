"""Sequence parallelism (parallel/sp.py): sequence-sharded text-tower
forward is exact vs single-device, GSPMD inserts the attention K/V
all-gathers, and it composes with tensor parallelism on one mesh."""

import jax
import jax.numpy as jnp
import numpy as np

from clip_for_dl_tpu.models.bert import BertEncoder
from clip_for_dl_tpu.parallel import create_dp_tp_mesh, sequence_sharded_fn


def _tiny_bert(layers=2, heads=4):
    return BertEncoder(
        vocab_size=64, hidden=16, layers=layers, heads=heads,
        intermediate=32, max_position=64,
    )


def _setup(rng, seq_len):
    bert = _tiny_bert()
    ids = jnp.asarray(rng.integers(0, 64, (4, seq_len)), jnp.int32)
    mask = np.ones((4, seq_len), np.int32)
    mask[:, seq_len - 5 :] = 0  # ragged tail: padded positions must be inert
    mask = jnp.asarray(mask)
    params = bert.init(jax.random.key(0), ids)["params"]
    fn = lambda p, i, m: bert.apply({"params": p}, i, m)
    return fn, params, ids, mask


def test_sequence_sharded_exact(rng, eight_devices):
    fn, params, ids, mask = _setup(rng, 64)
    want = fn(params, ids, mask)
    mesh = create_dp_tp_mesh(4)  # (data=2, model=4); seq rides `model`
    got = sequence_sharded_fn(fn, mesh)(params, ids, mask)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=2e-5)


def test_sequence_sharded_uneven_seq(rng, eight_devices):
    """Sequence length not divisible by the shard count (GSPMD pads)."""
    fn, params, ids, mask = _setup(rng, 50)
    want = fn(params, ids, mask)
    mesh = create_dp_tp_mesh(4)
    got = sequence_sharded_fn(fn, mesh)(params, ids, mask)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=2e-5)


def test_sequence_sharding_inserts_all_gathers(rng, eight_devices):
    """The compiled module contains the attention K/V all-gathers —
    evidence the sequence axis is actually sharded, not regathered once."""
    fn, params, ids, mask = _setup(rng, 64)
    mesh = create_dp_tp_mesh(4)
    token = jax.sharding.NamedSharding(
        mesh, jax.sharding.PartitionSpec("data", "model")
    )
    repl = jax.sharding.NamedSharding(mesh, jax.sharding.PartitionSpec())
    jitted = jax.jit(
        fn,
        in_shardings=(
            jax.tree.map(lambda _: repl, params), token, token,
        ),
    )
    hlo = jitted.lower(params, ids, mask).compile().as_text()
    assert hlo.count("all-gather(") >= 2  # ≥ one K/V gather per layer
    np.testing.assert_allclose(
        np.asarray(jitted(params, ids, mask)),
        np.asarray(fn(params, ids, mask)),
        atol=2e-5,
    )


def test_sequence_plus_tensor_parallel(rng, eight_devices):
    """SP + TP on the same `model` axis (Megatron TP+SP): still exact."""
    fn, params, ids, mask = _setup(rng, 64)
    want = fn(params, ids, mask)
    mesh = create_dp_tp_mesh(4)
    got = sequence_sharded_fn(fn, mesh, tp_params=True)(params, ids, mask)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=2e-5)
