"""Switch MoE MLP (models/moe.py) + expert parallelism (parallel/ep.py):
routing math vs a per-token reference, capacity dropping, aux loss,
MoE-BERT integration, and EP-sharded equivalence incl. a train step."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.sharding import PartitionSpec as P

from clip_for_dl_tpu.core.config import ModelConfig
from clip_for_dl_tpu.models import CXRClip
from clip_for_dl_tpu.models.bert import BertEncoder
from clip_for_dl_tpu.models.moe import SwitchMoEMLP
from clip_for_dl_tpu.parallel import (
    EXPERT_AXIS,
    create_dp_ep_mesh,
    ep_shardings,
    expert_parallel_step,
    shard_state_ep,
    validate_ep,
)
from clip_for_dl_tpu.train import (
    TrainState,
    base_transform,
    make_clip_pretrain_step,
    make_label_fn,
)


def reference_switch(params, x, num_experts, capacity_factor, mask=None):
    """Per-token numpy reference for top-1 capacity-routed MoE; masked
    (padding) tokens are never routed and produce a zero update."""
    b, l, d = x.shape
    xf = np.asarray(x, np.float32).reshape(-1, d)
    t = xf.shape[0]
    mask_flat = (
        np.ones(t) if mask is None else np.asarray(mask).reshape(t)
    )
    cap = int(np.ceil(capacity_factor * t / num_experts))
    rk = np.asarray(params["router"]["kernel"], np.float32)
    rb = np.asarray(params["router"]["bias"], np.float32)
    logits = xf @ rk + rb
    probs = np.exp(logits - logits.max(-1, keepdims=True))
    probs /= probs.sum(-1, keepdims=True)
    chosen = probs.argmax(-1)
    gate = probs.max(-1)
    wi, bi = np.asarray(params["wi"]), np.asarray(params["bi"])
    wo, bo = np.asarray(params["wo"]), np.asarray(params["bo"])
    counts = np.zeros(num_experts, int)
    y = np.zeros_like(xf)

    def gelu(v):
        from math import erf

        return v * 0.5 * (1.0 + np.vectorize(erf)(v / np.sqrt(2.0)))

    for i in range(t):
        if mask_flat[i] == 0:
            continue
        e = chosen[i]
        if counts[e] < cap:
            counts[e] += 1
            h = gelu(xf[i] @ wi[e] + bi[e])
            y[i] = gate[i] * (h @ wo[e] + bo[e])
    return y.reshape(b, l, d)


@pytest.fixture
def moe_setup(rng):
    mod = SwitchMoEMLP(num_experts=4, intermediate=32, capacity_factor=1.5)
    x = jnp.asarray(rng.standard_normal((2, 8, 16)), jnp.float32)
    params = mod.init(jax.random.key(0), x)["params"]
    return mod, params, x


class TestSwitchMoE:
    def test_matches_per_token_reference(self, moe_setup):
        mod, params, x = moe_setup
        got = mod.apply({"params": params}, x)
        want = reference_switch(params, x, 4, 1.5)
        np.testing.assert_allclose(np.asarray(got), want, atol=1e-5)

    def test_capacity_drops_tokens(self, moe_setup, rng):
        """capacity_factor → 0 forces capacity 1: at most one token per
        expert contributes; the rest produce a zero update."""
        mod, params, x = moe_setup
        tight = SwitchMoEMLP(
            num_experts=4, intermediate=32, capacity_factor=1e-6
        )
        out = tight.apply({"params": params}, x)
        flat = np.asarray(out).reshape(-1, 16)
        nonzero_rows = (np.abs(flat) > 1e-9).any(axis=1).sum()
        assert nonzero_rows <= 4  # ≤ one slot per expert

    def test_padding_tokens_inert(self, moe_setup, rng):
        """Masked (padding) tokens consume no expert capacity, get a zero
        update, and are excluded from the aux statistics — matching the
        per-token reference with the same mask."""
        mod, params, x = moe_setup
        mask = np.ones((2, 8), np.int32)
        mask[:, 5:] = 0  # last 3 positions of each row are padding
        got = mod.apply({"params": params}, x, jnp.asarray(mask))
        want = reference_switch(params, x, 4, 1.5, mask)
        np.testing.assert_allclose(np.asarray(got), want, atol=1e-5)
        assert np.allclose(np.asarray(got)[:, 5:], 0.0)
        # pads excluded from routing ⇒ real tokens keep the capacity they
        # would have had; aux computed over real tokens only stays ≥ 1
        _, state = mod.apply(
            {"params": params}, x, jnp.asarray(mask), mutable=["losses"]
        )
        (aux,) = jax.tree.leaves(state["losses"])
        assert float(aux) >= 1.0 - 1e-6

    def test_aux_loss_sown_and_balanced_bound(self, moe_setup):
        """Aux loss lands in the 'losses' collection; a perfectly uniform
        router would give exactly 1.0, so any router gives ≥ 1.0."""
        mod, params, x = moe_setup
        _, state = mod.apply(
            {"params": params}, x, mutable=["losses"]
        )
        (aux,) = jax.tree.leaves(state["losses"])
        assert float(aux) >= 1.0 - 1e-6

    def test_grads_flow_to_experts_and_router(self, moe_setup):
        mod, params, x = moe_setup

        def loss(p):
            return jnp.sum(mod.apply({"params": p}, x) ** 2)

        g = jax.grad(loss)(params)
        assert float(jnp.abs(g["wi"]).sum()) > 0
        assert float(jnp.abs(g["router"]["kernel"]).sum()) > 0


class TestMoEBert:
    def test_moe_every_other_layer(self, rng):
        bert = BertEncoder(
            vocab_size=64, hidden=16, layers=4, heads=2, intermediate=32,
            max_position=16, moe_experts=4, moe_every=2,
        )
        ids = jnp.asarray(rng.integers(0, 64, (2, 8)), jnp.int32)
        params = bert.init(jax.random.key(0), ids)["params"]
        assert "moe_mlp" in params["layer_1"] and "moe_mlp" in params["layer_3"]
        assert "intermediate" in params["layer_0"]
        assert "moe_mlp" not in params["layer_0"]
        out, state = bert.apply(
            {"params": params}, ids, jnp.ones((2, 8), jnp.int32),
            mutable=["losses"],
        )
        assert out.shape == (2, 8, 16)
        assert len(jax.tree.leaves(state["losses"])) == 2  # one per MoE block


def tiny_moe_cfg(**kw):
    base = dict(
        image_size=32, max_text_length=16, vocab_size=128,
        text_embedding_dim=32, text_layers=2, text_heads=2,
        text_intermediate_dim=64, shared_embedding_dim=64,
        resnet_stages=(1, 1, 1, 1), resnet_width=8,
        text_moe_experts=4, text_moe_every=2,
    )
    base.update(kw)
    return ModelConfig(**base)


class TestExpertParallel:
    def test_mesh_and_validate(self, eight_devices):
        mesh = create_dp_ep_mesh(4)
        assert mesh.devices.shape == (2, 4)
        assert mesh.axis_names == ("data", "expert")
        validate_ep(8, 4)
        with pytest.raises(ValueError):
            validate_ep(6, 4)

    def test_ep_specs(self, moe_setup, eight_devices):
        _, params, _ = moe_setup
        mesh = create_dp_ep_mesh(4)
        sh = ep_shardings({"moe_mlp": params}, mesh)
        assert sh["moe_mlp"]["wi"].spec == P("expert", None, None)
        assert sh["moe_mlp"]["bi"].spec == P("expert", None)
        assert sh["moe_mlp"]["router"]["kernel"].spec == P()

    def test_ep_forward_equivalence(self, moe_setup, eight_devices):
        """MoE forward with experts sharded 4-way == unsharded forward."""
        mod, params, x = moe_setup
        want = mod.apply({"params": params}, x)
        mesh = create_dp_ep_mesh(4)
        from jax.sharding import NamedSharding

        fwd = jax.jit(
            lambda p, v: mod.apply({"params": p}, v),
            in_shardings=(
                ep_shardings({"moe_mlp": params}, mesh)["moe_mlp"],
                NamedSharding(mesh, P("data")),
            ),
        )
        got = fwd(params, x)
        np.testing.assert_allclose(
            np.asarray(got), np.asarray(want), atol=2e-5
        )

    def test_ep_train_step_equivalence(self, rng, eight_devices):
        """CLIP pretrain step with an MoE text tower on a 2×4
        (data, expert) mesh == the single-device step (loss + params),
        aux load-balance loss included in both."""
        cfg = tiny_moe_cfg()
        model = CXRClip(cfg, dtype=jnp.float32)
        variables = model.init(
            jax.random.key(0),
            jnp.zeros((1, 32, 32, 3)),
            jnp.zeros((1, 16), jnp.int32),
        )
        assert "moe_mlp" in variables["params"]["text_tower"]["layer_1"]
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
            "input_ids": jnp.asarray(
                rng.integers(0, 128, (8, 16)), jnp.int32
            ),
            "attention_mask": jnp.ones((8, 16), jnp.int32),
        }
        lrs = {
            "image_tower": 1e-4, "text_tower": 1e-5,
            "image_projector": 1e-3, "text_projector": 1e-3,
            "default": 1e-4,
        }
        drop = jax.random.key(1)
        ref_state, ref_metrics = jax.jit(step)(
            TrainState.create(variables, tx), batch, lrs, drop
        )

        mesh = create_dp_ep_mesh(4)
        validate_ep(cfg.text_moe_experts, 4)
        state = shard_state_ep(TrainState.create(variables, tx), mesh)
        ep_step = expert_parallel_step(step, mesh)
        got_state, got_metrics = ep_step(state, batch, lrs, drop)
        np.testing.assert_allclose(
            float(got_metrics["loss"]), float(ref_metrics["loss"]),
            rtol=1e-4, atol=1e-4,
        )
        # atol: GSPMD all-reduce vs local-sum reduction order perturbs the
        # router's fp32 grads in the last bits; Adam's first-step
        # normalization (g/√v̂) amplifies that for near-zero moments.
        jax.tree.map(
            lambda a, b: np.testing.assert_allclose(
                np.asarray(a), np.asarray(b), atol=1e-3
            ),
            got_state.params, ref_state.params,
        )

    def test_aux_loss_changes_pretrain_loss(self, rng, eight_devices):
        """The sown aux loss is actually included: zeroing moe_aux_weight
        changes the step loss."""
        import dataclasses

        batch = {
            "images": jnp.asarray(
                rng.integers(0, 255, (4, 32, 32, 3)), jnp.uint8
            ),
            "input_ids": jnp.asarray(
                rng.integers(0, 128, (4, 16)), jnp.int32
            ),
            "attention_mask": jnp.ones((4, 16), jnp.int32),
        }
        for w in (0.01, 0.0):
            cfg = dataclasses.replace(tiny_moe_cfg(), moe_aux_weight=w)
            model = CXRClip(cfg, dtype=jnp.float32)
            variables = model.init(
                jax.random.key(0),
                jnp.zeros((1, 32, 32, 3)),
                jnp.zeros((1, 16), jnp.int32),
            )
            tx = base_transform(weight_decay=1e-3)
            label_fn = make_label_fn(["text_tower"])
            lrs = {"text_tower": 1e-5, "default": 1e-4}
            step = make_clip_pretrain_step(
                model, tx, label_fn, temperature=2.0, image_size=32,
                compute_dtype=jnp.float32,
            )
            _, metrics = jax.jit(step)(
                TrainState.create(variables, tx), batch, lrs,
                jax.random.key(1),
            )
            if w:
                with_aux = float(metrics["loss"])
            else:
                without_aux = float(metrics["loss"])
        assert with_aux != without_aux
        assert with_aux > without_aux  # aux ≥ 1 with positive weight
