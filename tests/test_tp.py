"""Tensor parallelism: Megatron-style TP over the `model` mesh axis via
GSPMD param shardings (parallel/tp.py) — spec rules, forward equivalence,
and a full DP×TP train step equivalent to the single-device step."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.sharding import NamedSharding, PartitionSpec as P

from clip_for_dl_tpu.core.config import ModelConfig
from clip_for_dl_tpu.models import CXRClip
from clip_for_dl_tpu.models.bert import BertEncoder
from clip_for_dl_tpu.parallel import (
    MODEL_AXIS,
    create_dp_tp_mesh,
    shard_state_tp,
    tensor_parallel_step,
    tp_shardings,
    tp_spec,
    validate_tp,
)
from clip_for_dl_tpu.train import (
    TrainState,
    base_transform,
    make_clip_pretrain_step,
    make_label_fn,
)


def tiny_cfg(**kw):
    base = dict(
        image_size=32, max_text_length=16, vocab_size=128,
        text_embedding_dim=32, text_layers=2, text_heads=4,
        text_intermediate_dim=64, shared_embedding_dim=64,
        resnet_stages=(1, 1, 1, 1), resnet_width=8,
    )
    base.update(kw)
    return ModelConfig(**base)


def test_dp_tp_mesh_shape(eight_devices):
    mesh = create_dp_tp_mesh(4)
    assert mesh.devices.shape == (2, 4)
    assert mesh.axis_names == ("data", "model")
    with pytest.raises(ValueError):
        create_dp_tp_mesh(3)


def test_validate_tp():
    validate_tp(heads=12, intermediate=3072, tp=4)
    with pytest.raises(ValueError):
        validate_tp(heads=12, intermediate=3072, tp=8)


class TestSpecRules:
    def setup_method(self):
        bert = BertEncoder(
            vocab_size=64, hidden=16, layers=1, heads=2, intermediate=32,
            max_position=16,
        )
        self.params = bert.init(
            jax.random.key(0), jnp.zeros((1, 8), jnp.int32)
        )["params"]

    def spec_of(self, *names):
        leaf = self.params
        for n in names:
            leaf = leaf[n]
        got = {}

        def visit(path, v):
            got[tuple(str(p.key) for p in path)] = tp_spec(path, v)
            return v

        jax.tree_util.tree_map_with_path(visit, self.params)
        return got[names]

    def test_column_parallel(self):
        assert self.spec_of(
            "layer_0", "attention", "query", "kernel"
        ) == P(None, MODEL_AXIS)
        assert self.spec_of(
            "layer_0", "attention", "query", "bias"
        ) == P(MODEL_AXIS)
        assert self.spec_of("layer_0", "intermediate", "kernel") == P(
            None, MODEL_AXIS
        )

    def test_row_parallel(self):
        assert self.spec_of("layer_0", "attention_output", "kernel") == P(
            MODEL_AXIS, None
        )
        assert self.spec_of("layer_0", "output", "kernel") == P(
            MODEL_AXIS, None
        )
        # row-parallel bias is added after the all-reduce → replicated
        assert self.spec_of("layer_0", "output", "bias") == P()

    def test_non_transformer_replicated(self):
        assert self.spec_of("layer_0", "output_layer_norm", "scale") == P()
        assert self.spec_of("embeddings", "word_embeddings", "embedding") == P()

    def test_resnet_and_heads_replicated(self, eight_devices):
        """ResNet `layer1_0` blocks and projection heads never match the
        transformer-layer gate; opt-state moments shard like params."""
        mesh = create_dp_tp_mesh(4)
        model = CXRClip(tiny_cfg())
        variables = model.init(
            jax.random.key(0),
            jnp.zeros((1, 32, 32, 3)),
            jnp.zeros((1, 16), jnp.int32),
        )
        tx = base_transform(weight_decay=1e-3)
        state = TrainState.create(variables, tx)
        sh = tp_shardings(state, mesh)
        flat = {
            "/".join(str(getattr(p, "key", getattr(p, "name", p))) for p in path): s
            for path, s in jax.tree_util.tree_flatten_with_path(sh)[0]
        }
        img = {k: v for k, v in flat.items() if "image_tower" in k}
        assert img and all(v.spec == P() for v in img.values())
        txt_q = [
            v for k, v in flat.items()
            if "text_tower" in k and k.endswith("query/kernel")
        ]
        assert txt_q and all(v.spec == P(None, MODEL_AXIS) for v in txt_q)
        # Adam moments inside opt_state pick up the same specs
        sharded_moments = [
            v for k, v in flat.items()
            if k.endswith("query/kernel") and v.spec == P(None, MODEL_AXIS)
        ]
        assert len(sharded_moments) >= 3  # params + mu + nu


def test_tp_forward_equivalence(rng, eight_devices):
    """Text-tower forward with TP-sharded params equals the single-device
    forward (GSPMD all-reduces are mathematically the same sums)."""
    bert = BertEncoder(
        vocab_size=64, hidden=16, layers=2, heads=4, intermediate=32,
        max_position=16,
    )
    ids = jnp.asarray(rng.integers(0, 64, (8, 12)), jnp.int32)
    mask = jnp.ones((8, 12), jnp.int32)
    params = bert.init(jax.random.key(0), ids)["params"]

    want = bert.apply({"params": params}, ids, mask)

    mesh = create_dp_tp_mesh(4)
    fwd = jax.jit(
        lambda p, i, m: bert.apply({"params": p}, i, m),
        in_shardings=(
            tp_shardings(params, mesh),
            NamedSharding(mesh, P("data")),
            NamedSharding(mesh, P("data")),
        ),
    )
    got = fwd(params, ids, mask)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=2e-5)


def test_tp_train_step_equivalence(rng, eight_devices):
    """One full CLIP pretrain step on a 2×4 (data, model) mesh matches the
    single-device step: same loss, same updated params."""
    cfg = tiny_cfg()
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
    step = make_clip_pretrain_step(
        model, tx, label_fn, temperature=2.0, image_size=32,
        compute_dtype=jnp.float32,
    )
    batch = {
        "images": jnp.asarray(
            rng.integers(0, 255, (8, 32, 32, 3)), jnp.uint8
        ),
        "input_ids": jnp.asarray(rng.integers(0, 128, (8, 16)), jnp.int32),
        "attention_mask": jnp.ones((8, 16), jnp.int32),
    }
    lrs = {
        "image_tower": 1e-4, "text_tower": 1e-5, "image_projector": 1e-3,
        "text_projector": 1e-3, "default": 1e-4,
    }
    drop = jax.random.key(1)

    ref_state, ref_metrics = jax.jit(step)(
        TrainState.create(variables, tx), batch, lrs, drop
    )

    mesh = create_dp_tp_mesh(4)
    validate_tp(cfg.text_heads, cfg.text_intermediate_dim, 4)
    state = shard_state_tp(TrainState.create(variables, tx), mesh)
    tp_step = tensor_parallel_step(step, mesh)
    got_state, got_metrics = tp_step(state, batch, lrs, drop)

    # tolerance: cross-device reduction order (GSPMD all-reduce vs local
    # sums) perturbs fp32 sums in the last bits
    np.testing.assert_allclose(
        float(got_metrics["loss"]), float(ref_metrics["loss"]),
        rtol=1e-4, atol=1e-4,
    )
    jax.tree.map(
        lambda a, b: np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), atol=2e-4
        ),
        got_state.params,
        ref_state.params,
    )


def test_tp_zeroshot_engine(rng, eight_devices):
    """ZeroShotEngine on a 2-D (data, model) mesh — TP-sharded towers —
    matches the single-device engine, including uneven-batch padding."""
    import dataclasses

    from clip_for_dl_tpu.core.config import DISEASE_LABELS, ZeroShotConfig
    from clip_for_dl_tpu.text import BertTokenizer, build_tiny_vocab
    from clip_for_dl_tpu.zeroshot import ZeroShotEngine, prompts_for_family

    vocab = build_tiny_vocab(
        "this chest x-ray shows a of normal".split()
        + [w for d in DISEASE_LABELS for w in d.split()]
    )
    cfg = dataclasses.replace(
        tiny_cfg(text_heads=2), vocab_size=len(vocab)
    )
    tokenizer = BertTokenizer(vocab)
    model = CXRClip(cfg)
    variables = model.init(
        jax.random.key(0),
        jnp.zeros((1, 32, 32, 3)),
        jnp.zeros((1, 16), jnp.int32),
    )

    def engine(mesh=None):
        eng = ZeroShotEngine(
            model, variables, tokenizer, DISEASE_LABELS, ZeroShotConfig(),
            image_size=32, max_text_length=16, compute_dtype=jnp.float32,
            mesh=mesh,
        )
        eng.build_text_features(
            prompts_for_family("prediction", DISEASE_LABELS)
        )
        return eng

    imgs = rng.integers(0, 255, (10, 32, 32, 3), dtype=np.uint8)  # uneven
    want = engine().logits(imgs)
    validate_tp(cfg.text_heads, cfg.text_intermediate_dim, 2)
    got = engine(create_dp_tp_mesh(2)).logits(imgs)
    assert got.shape == want.shape
    np.testing.assert_allclose(got, want, atol=2e-4, rtol=1e-4)
