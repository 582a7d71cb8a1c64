"""Training layer: optimizer parity vs torch AdamW, schedules, steps, loop,
checkpointing, and data-parallel equivalence."""

import dataclasses
import functools

import jax
import jax.numpy as jnp
import numpy as np
import pytest
import torch
import torch.nn as tnn

from clip_for_dl_tpu.core.config import ModelConfig
from clip_for_dl_tpu.core.prng import KeyChain
from clip_for_dl_tpu.models import CXRClip
from clip_for_dl_tpu.train import (
    CosineSchedule,
    EarlyStopping,
    ReduceLROnPlateau,
    TrainState,
    apply_group_lrs,
    base_transform,
    cosine_annealing_lr,
    fit,
    freeze_mask,
    make_adapter_train_step,
    make_clip_eval_step,
    make_clip_pretrain_step,
    make_label_fn,
    make_multiview_eval_step,
    make_multiview_train_step,
)
import optax

TINY = ModelConfig(
    image_size=16, max_text_length=8, vocab_size=64, text_embedding_dim=16,
    text_layers=1, text_heads=2, text_intermediate_dim=32,
    shared_embedding_dim=32, use_multimodal_attention=True,
    resnet_stages=(1, 1, 1, 1), resnet_width=8,
)


def tiny_model():
    model = CXRClip(TINY)
    variables = model.init(
        jax.random.key(0), jnp.zeros((1, 16, 16, 3)), jnp.zeros((1, 8), jnp.int32)
    )
    return model, variables


class TestOptimizerParity:
    def test_adamw_step_matches_torch(self, rng):
        w = rng.standard_normal((4, 3)).astype(np.float32)
        g = rng.standard_normal((4, 3)).astype(np.float32)
        # torch: 2 AdamW steps with same grad, lr 1e-3 wd 0.01
        p = torch.nn.Parameter(torch.from_numpy(w.copy()))
        opt = torch.optim.AdamW([p], lr=1e-3, weight_decay=0.01)
        for _ in range(2):
            opt.zero_grad()
            p.grad = torch.from_numpy(g.copy())
            opt.step()
        want = p.detach().numpy()

        tx = base_transform(max_grad_norm=None, weight_decay=0.01)
        params = {"m": {"w": jnp.asarray(w)}}
        label_fn = make_label_fn(["m"])
        opt_state = tx.init(params)
        grads = {"m": {"w": jnp.asarray(g)}}
        for _ in range(2):
            updates, opt_state = tx.update(grads, opt_state, params)
            updates = apply_group_lrs(updates, params, {"m": 1e-3, "default": 0.0}, label_fn)
            params = optax.apply_updates(params, updates)
        np.testing.assert_allclose(np.asarray(params["m"]["w"]), want, atol=1e-6)

    def test_per_group_lrs(self, rng):
        params = {"a": jnp.ones(3), "b": jnp.ones(3)}
        updates = {"a": jnp.ones(3), "b": jnp.ones(3)}
        label_fn = make_label_fn(["a", "b"])
        out = apply_group_lrs(updates, params, {"a": 0.1, "b": 0.01, "default": 0}, label_fn)
        np.testing.assert_allclose(np.asarray(out["a"]), -0.1)
        np.testing.assert_allclose(np.asarray(out["b"]), -0.01)


class TestSchedules:
    def test_cosine_matches_torch(self):
        p = torch.nn.Parameter(torch.zeros(1))
        opt = torch.optim.SGD([p], lr=0.1)
        sched = torch.optim.lr_scheduler.CosineAnnealingLR(opt, T_max=10, eta_min=1e-3)
        for epoch in range(10):
            want = opt.param_groups[0]["lr"]
            got = cosine_annealing_lr(epoch, 0.1, 10, 1e-3)
            assert got == pytest.approx(want, rel=1e-6), epoch
            opt.step()
            sched.step()

    def test_plateau_matches_torch(self):
        p = torch.nn.Parameter(torch.zeros(1))
        opt = torch.optim.SGD([p], lr=0.1)
        sched = torch.optim.lr_scheduler.ReduceLROnPlateau(
            opt, factor=0.8, patience=1
        )
        ours = ReduceLROnPlateau({"g": 0.1}, factor=0.8, patience=1)
        metrics = [1.0, 0.9, 0.95, 0.94, 0.93, 0.93, 0.92, 0.99, 1.0, 1.0]
        for m in metrics:
            sched.step(m)
            got = ours.step(m)["g"]
            assert got == pytest.approx(opt.param_groups[0]["lr"], rel=1e-6)

    def test_early_stopping(self):
        es = EarlyStopping(patience=2)
        assert not es.step(1.0)
        assert not es.step(0.5)
        assert not es.step(0.6)
        assert es.step(0.7)


@pytest.fixture(scope="module")
def pretrain_setup():
    model, variables = tiny_model()
    tx = base_transform(weight_decay=1e-3)
    label_fn = make_label_fn(["image_tower", "text_tower", "image_projector", "text_projector"])
    step = jax.jit(
        make_clip_pretrain_step(
            model, tx, label_fn, temperature=2.0, image_size=16,
            compute_dtype=jnp.float32,
        )
    )
    state = TrainState.create(variables, tx)
    return model, step, state, label_fn


LRS = {
    "image_tower": 1e-4, "text_tower": 1e-5, "image_projector": 1e-3,
    "text_projector": 1e-3, "default": 1e-4,
}


def pretrain_batch(rng, b=4):
    return {
        "images": jnp.asarray(rng.integers(0, 255, (b, 16, 16, 3), np.uint8)),
        "input_ids": jnp.asarray(rng.integers(0, 64, (b, 8)), jnp.int32),
        "attention_mask": jnp.ones((b, 8), jnp.int32),
    }


class TestSteps:
    def test_pretrain_step_updates_and_reduces_loss(self, pretrain_setup, rng):
        model, step, state, _ = pretrain_setup
        batch = pretrain_batch(rng)
        key = jax.random.key(1)
        losses = []
        for i in range(8):
            state, metrics = step(state, batch, LRS, jax.random.fold_in(key, i))
            losses.append(float(metrics["loss"]))
        assert state.step == 8
        assert losses[-1] < losses[0]  # overfits one batch

    def test_eval_step(self, pretrain_setup, rng):
        model, step, state, _ = pretrain_setup
        eval_step = jax.jit(
            make_clip_eval_step(model, temperature=2.0, image_size=16,
                                compute_dtype=jnp.float32)
        )
        m = eval_step(state, pretrain_batch(rng))
        assert np.isfinite(float(m["loss"]))

    def test_multiview_step_with_enhance(self, rng):
        model, variables = tiny_model()
        tx = base_transform()
        label_fn = make_label_fn([])
        step = jax.jit(
            make_multiview_train_step(
                model, tx, label_fn, temperature=0.07, image_size=16,
                compute_dtype=jnp.float32, use_enhance=True,
            )
        )
        state = TrainState.create(variables, tx)
        batch = {
            "images": jnp.asarray(
                rng.integers(0, 255, (4, 2, 16, 16, 3), np.uint8)
            ),
            "labels": jnp.asarray((rng.random((4, 16)) > 0.7), jnp.float32),
        }
        text_features = jnp.asarray(rng.standard_normal((16, 32)), jnp.float32)
        state2, m = step(state, batch, text_features, {"default": 1e-3}, jax.random.key(0))
        assert np.isfinite(float(m["loss"]))
        # params actually changed
        diff = jax.tree.map(
            lambda a, b: float(jnp.abs(a - b).max()), state.params, state2.params
        )
        assert max(jax.tree.leaves(diff)) > 0

        eval_step = jax.jit(
            make_multiview_eval_step(model, temperature=0.07, image_size=16,
                                     compute_dtype=jnp.float32, use_enhance=True)
        )
        em = eval_step(state2, batch, text_features)
        assert em["probs"].shape == (4, 16)
        assert em["per_class_accuracy"].shape == (16,)

    def test_multiview_step_augmented(self, rng):
        """augment=True (the scripts' train transform stack, on device)
        trains, and the augmentation actually changes the computation."""
        model, variables = tiny_model()
        tx = base_transform()
        label_fn = make_label_fn([])

        def build(augment):
            return jax.jit(
                make_multiview_train_step(
                    model, tx, label_fn, temperature=0.07, image_size=16,
                    compute_dtype=jnp.float32, augment=augment,
                )
            )

        batch = {
            "images": jnp.asarray(
                rng.integers(0, 255, (4, 2, 16, 16, 3), np.uint8)
            ),
            "labels": jnp.asarray((rng.random((4, 16)) > 0.7), jnp.float32),
        }
        text_features = jnp.asarray(rng.standard_normal((16, 32)), jnp.float32)
        lrs = {"default": 1e-3}
        state = TrainState.create(variables, tx)
        _, m_aug = build(True)(state, batch, text_features, lrs,
                               jax.random.key(0))
        _, m_plain = build(False)(state, batch, text_features, lrs,
                                  jax.random.key(0))
        assert np.isfinite(float(m_aug["loss"]))
        # flips/rotations/translations make the augmented loss differ
        assert float(m_aug["loss"]) != float(m_plain["loss"])
        # and different rng keys give different augmented losses
        _, m_aug2 = build(True)(state, batch, text_features, lrs,
                                jax.random.key(7))
        assert float(m_aug["loss"]) != float(m_aug2["loss"])

    def test_adapter_step_only_trains_adapter(self, rng):
        model, variables = tiny_model()
        tx = base_transform(weight_decay=0.0)
        label_fn = make_label_fn(["adapter"])
        freeze = freeze_mask(variables["params"], ["adapter"])
        step = jax.jit(
            make_adapter_train_step(
                model, tx, label_fn, freeze, image_size=16,
                compute_dtype=jnp.float32,
            )
        )
        state = TrainState.create(variables, tx)
        batch = {
            "images": jnp.asarray(rng.integers(0, 255, (4, 16, 16, 3), np.uint8)),
            "labels": jnp.asarray((rng.random((4, 16)) > 0.7), jnp.float32),
        }
        state2, m = step(
            state, batch, {"adapter": 1e-3, "default": 1e-3}, jax.random.key(0)
        )
        # adapter moved
        assert float(jnp.abs(
            state2.params["adapter"]["classifier"]["kernel"]
            - state.params["adapter"]["classifier"]["kernel"]
        ).max()) > 0
        # towers frozen
        np.testing.assert_array_equal(
            np.asarray(state2.params["image_tower"]["conv1"]["kernel"]),
            np.asarray(state.params["image_tower"]["conv1"]["kernel"]),
        )


class TestLoop:
    def test_fit_early_stops_and_records_history(self, rng):
        model, variables = tiny_model()
        tx = base_transform()
        label_fn = make_label_fn([])
        step = jax.jit(
            make_clip_pretrain_step(model, tx, label_fn, temperature=2.0,
                                    image_size=16, compute_dtype=jnp.float32)
        )
        eval_step = jax.jit(
            make_clip_eval_step(model, temperature=2.0, image_size=16,
                                compute_dtype=jnp.float32)
        )
        state = TrainState.create(variables, tx)
        batches = [
            {k: np.asarray(v) for k, v in pretrain_batch(rng).items()}
            for _ in range(2)
        ]
        kc = KeyChain(0)
        state, history = fit(
            state, step, eval_step,
            train_loader_fn=lambda: iter(batches),
            val_loader_fn=lambda: iter(batches),
            base_lrs={"default": 1e-3},
            num_epochs=4,
            rng_stream=kc.stream("dropout"),
            scheduler="plateau",
            early_stop_patience=3,
            log_every=1,
        )
        df = history.to_frame()
        assert len(df) >= 2
        assert {"epoch", "train_loss", "val_loss"} <= set(df.columns)


class TestDataParallel:
    def test_dp_step_matches_single_device(self, rng, eight_devices):
        from clip_for_dl_tpu.core.mesh import create_mesh
        from clip_for_dl_tpu.parallel import data_parallel_step, replicate_state

        model, variables = tiny_model()
        tx = base_transform()
        label_fn = make_label_fn([])
        raw_step = make_clip_pretrain_step(
            model, tx, label_fn, temperature=2.0, image_size=16,
            compute_dtype=jnp.float32,
        )
        batch = pretrain_batch(rng, b=8)
        key = jax.random.key(5)

        state1 = TrainState.create(variables, tx)
        state1, m1 = jax.jit(raw_step)(state1, batch, {"default": 1e-3}, key)

        mesh = create_mesh(8)
        dp_step = data_parallel_step(raw_step, mesh, donate_state=False)
        state2 = replicate_state(TrainState.create(variables, tx), mesh)
        state2, m2 = dp_step(state2, batch, {"default": 1e-3}, key)

        # identical math up to cross-shard fp32 reduction order
        assert float(m2["loss"]) == pytest.approx(float(m1["loss"]), rel=1e-4)
        a = np.asarray(state1.params["image_projector"]["projection"]["kernel"])
        b = np.asarray(state2.params["image_projector"]["projection"]["kernel"])
        np.testing.assert_allclose(a, b, atol=5e-4)


class TestCheckpoint:
    def test_orbax_roundtrip(self, tmp_path, rng):
        from clip_for_dl_tpu.train import CheckpointManager

        model, variables = tiny_model()
        tx = base_transform()
        state = TrainState.create(variables, tx)
        mgr = CheckpointManager(str(tmp_path / "ckpt"), max_to_keep=2)
        mgr.save(0, state, metrics={"val_loss": 1.0})
        mgr.save(1, state.replace(step=state.step + 5), metrics={"val_loss": 0.5})
        mgr.wait()
        assert mgr.latest_epoch() == 1
        assert mgr.best_epoch() == 1
        restored, _ = mgr.restore(state)
        assert int(restored.step) == 5
        mgr.close()

    def test_reference_pth_import(self, tmp_path, rng):
        from clip_for_dl_tpu.train import import_reference_checkpoint

        proj = tnn.Sequential()
        ip = tnn.Module()
        ip.image_projection = tnn.Linear(32, 32)
        ip.fc = tnn.Linear(32, 32)
        ip.layer_norm = tnn.LayerNorm(32)
        fusion = tnn.Module()
        fusion.fusion = tnn.Sequential(
            tnn.Linear(64, 32), tnn.ReLU(), tnn.Dropout(0.2), tnn.Linear(32, 32)
        )
        ckpt = {
            "epoch": 7,
            "models": {
                "image_projector": ip.state_dict(),
                "view_fusion": fusion.state_dict(),
            },
        }
        path = tmp_path / "checkpoint.pth"
        torch.save(ckpt, path)
        out = import_reference_checkpoint(str(path))
        assert out["epoch"] == 7
        assert out["params"]["image_projector"]["projection"]["kernel"].shape == (32, 32)
        assert out["params"]["view_fusion"]["fc1"]["kernel"].shape == (64, 32)


class _CountingDataset:
    """Tiny indexable dataset; items carry their index for order checks."""

    def __init__(self, n):
        self.n = n

    def __len__(self):
        return self.n

    def __getitem__(self, i):
        return {"x": np.asarray([i], np.float32)}


class TestMidEpochResume:
    """ADVICE r1: loader state_dict wired into preemption checkpoints —
    a mid-epoch SIGTERM now loses at most one step, and the restart
    replays the exact remaining batch order of the in-flight epoch."""

    @staticmethod
    def _fit_kwargs(loader, mgr, guard, step):
        kc = KeyChain(0)
        return dict(
            train_step=step,
            eval_step=None,
            train_loader_fn=lambda: iter(loader),
            val_loader_fn=None,
            base_lrs={"default": 1e-3},
            num_epochs=2,
            rng_stream=kc.stream("dropout"),
            scheduler="none",
            early_stop_patience=None,
            checkpointer=mgr,
            log_every=100,
            preemption_guard=guard,
            stateful_loader=loader,
        )

    def test_preempt_then_resume_replays_remaining_batches(self, tmp_path):
        from clip_for_dl_tpu.data import HostLoader
        from clip_for_dl_tpu.train import (
            CheckpointManager,
            PreemptionGuard,
            resume_or_init,
        )

        tx = base_transform()
        template = TrainState.create({"params": {"w": jnp.zeros(2)}}, tx)
        seen_first, seen_resumed = [], []

        def make_step(sink, trigger_after=None, guard=None):
            calls = {"n": 0}

            def step(state, batch, lrs, rng):
                sink.extend(np.asarray(batch["x"]).ravel().tolist())
                calls["n"] += 1
                if trigger_after is not None and calls["n"] == trigger_after:
                    guard.trigger()
                return (
                    state.replace(step=state.step + 1),
                    {"loss": jnp.zeros(())},
                )

            return step

        # run 1: preempted after 2 of 4 batches of epoch 0
        loader = HostLoader(
            _CountingDataset(8), 2, shuffle=True, seed=7, num_threads=1
        )
        mgr = CheckpointManager(str(tmp_path / "ck"))
        guard = PreemptionGuard(signals=())
        state, _ = resume_or_init(mgr, template, loader=loader)
        state, history = fit(
            state,
            **self._fit_kwargs(
                loader, mgr, guard,
                make_step(seen_first, trigger_after=2, guard=guard),
            ),
        )
        mgr.wait()
        # the mid-epoch save lands in the preempt slot, NOT the ranked
        # manager (whose best-k retention would GC a metric-less save)
        assert mgr.latest_epoch() is None
        assert mgr.preempt_latest() == 0
        assert len(seen_first) == 4  # 2 batches x 2 samples

        # run 2 (fresh process): resume replays the remaining 2 batches of
        # the SAME shuffled epoch, then runs epoch 1 normally
        loader2 = HostLoader(
            _CountingDataset(8), 2, shuffle=True, seed=7, num_threads=1
        )
        mgr2 = CheckpointManager(str(tmp_path / "ck"))
        guard2 = PreemptionGuard(signals=())
        state2, start_epoch = resume_or_init(mgr2, template, loader=loader2)
        assert start_epoch == 0  # same epoch, not the next one
        assert int(state2.step) == 2
        state2, _ = fit(
            state2,
            **{**self._fit_kwargs(
                loader2, mgr2, guard2, make_step(seen_resumed)
            ), "start_epoch": start_epoch},
        )
        # first 4 resumed samples complete epoch 0's shuffle order exactly
        full_order = np.arange(8)
        np.random.default_rng(7 + 1).shuffle(full_order)  # loader epoch 1
        assert seen_first + seen_resumed[:4] == full_order.tolist()
        # epoch 1 then runs in full (4 batches) and both epochs checkpoint
        assert len(seen_resumed) == 4 + 8 // 2 * 2
        mgr2.wait()
        assert mgr2.latest_epoch() == 1
        # the completed epoch-0 save superseded the mid-epoch marker
        state3, start3 = resume_or_init(
            CheckpointManager(str(tmp_path / "ck")), template,
            loader=HostLoader(_CountingDataset(8), 2, shuffle=True, seed=7),
        )
        assert start3 == 2
        mgr.close()
        mgr2.close()

    def test_resume_without_loader_starts_next_epoch(self, tmp_path):
        from clip_for_dl_tpu.train import CheckpointManager, resume_or_init

        tx = base_transform()
        template = TrainState.create({"params": {"w": jnp.zeros(2)}}, tx)
        mgr = CheckpointManager(str(tmp_path / "ck"))
        mgr.save(
            3, template,
            extra={"mid_epoch": True, "loader": {"epoch": 4, "step": 1},
                   "num_batches": 4},
            metrics={"val_loss": 1.0},
        )
        mgr.wait()
        _, start = resume_or_init(mgr, template)  # no loader to replay into
        assert start == 4
        mgr.close()

    def test_preempt_save_survives_best_k_retention(self, tmp_path):
        """Regression: a mid-epoch save must outlive best-k retention.

        Saving it inside the ranked manager at val_loss=inf made orbax
        garbage-collect it as the worst-ranked checkpoint as soon as
        max_to_keep was exceeded — step-granular preemption resume then
        silently regressed to the previous completed epoch. The dedicated
        preempt slot is retention-exempt."""
        from clip_for_dl_tpu.train import CheckpointManager, resume_or_init

        tx = base_transform()
        template = TrainState.create({"params": {"w": jnp.zeros(2)}}, tx)
        mgr = CheckpointManager(str(tmp_path / "ck"), max_to_keep=3)
        for e in range(4):  # one more than max_to_keep
            mgr.save(e, template, metrics={"val_loss": 1.0 - 0.1 * e})
        mgr.wait()
        mgr.save_preempt(
            4, template,
            {"mid_epoch": True, "loader": {"epoch": 4, "step": 1},
             "num_batches": 4},
        )
        mgr.wait()  # prune must NOT drop a slot newer than latest_epoch
        assert mgr.preempt_latest() == 4
        _, start = resume_or_init(mgr, template)
        # pre-fix the GC'd save made this resume from epoch 3 (start 4)
        assert start == 5  # mid-epoch 4 seen, no loader -> next epoch

        # a committed completed-epoch save supersedes the slot on wait()
        mgr.save(4, template, metrics={"val_loss": 0.5})
        mgr.wait()
        assert mgr.preempt_latest() is None
        _, start = resume_or_init(mgr, template)
        assert start == 5
        mgr.close()


class TestPartialRestoreGuard:
    """ADVICE r1: a checkpoint missing model arrays must be a hard error
    by default (orbax partial restore silently keeps random-init values)."""

    def test_missing_arrays_raise_unless_allowed(self, tmp_path):
        from clip_for_dl_tpu.train import CheckpointManager

        tx = base_transform()
        state = TrainState.create({"params": {"w": jnp.ones(3)}}, tx)
        mgr = CheckpointManager(str(tmp_path / "ck"))
        mgr.save(0, state, metrics={"val_loss": 1.0})
        mgr.wait()
        # template asks for an array the checkpoint does not have
        # (e.g. MoE expert weights without --moe-experts at train time)
        template = {"params": {"w": jnp.zeros(3), "extra": jnp.zeros(2)}}
        with pytest.raises(ValueError, match="lacks"):
            mgr.restore_variables(template)
        restored = mgr.restore_variables(template, allow_partial=True)
        np.testing.assert_array_equal(
            np.asarray(restored["params"]["w"]), [1, 1, 1]
        )
        mgr.close()


class TestCrossTopologyRestore:
    def test_mesh_saved_checkpoint_restores_single_device(
        self, tmp_path, eight_devices
    ):
        """A checkpoint written by dp training (arrays on an 8-device
        mesh) must restore into a single-device serving process —
        regression: without explicit restore_args orbax falls back to the
        SAVED shardings, whose mesh doesn't exist at serving time
        (ValueError: 'sharding ... Got None')."""
        from jax.sharding import Mesh, NamedSharding
        from jax.sharding import PartitionSpec as P

        from clip_for_dl_tpu.train import CheckpointManager

        model, variables = tiny_model()
        tx = base_transform()
        state = TrainState.create(variables, tx)
        mesh = Mesh(np.array(jax.devices()[:8]), ("data",))
        repl = NamedSharding(mesh, P())
        state = jax.tree.map(lambda x: jax.device_put(x, repl), state)
        mgr = CheckpointManager(str(tmp_path / "ck"))
        mgr.save(0, state, metrics={"val_loss": 1.0})
        mgr.wait()

        single = jax.tree.map(
            lambda x: jax.device_put(np.asarray(x), jax.devices()[0]),
            variables,
        )
        got = mgr.restore_variables(single)
        for g, w in zip(jax.tree.leaves(got["params"]),
                        jax.tree.leaves(state.params)):
            np.testing.assert_allclose(np.asarray(g), np.asarray(w))
        mgr.close()


class TestLearnableTemperature:
    """ModelConfig.learnable_temperature: scalar logit_scale/logit_bias in
    the params, trained through the contrastive loss."""

    def _setup(self, loss_name, temperature=2.0):
        # temperature must be consistent between the config (scale init
        # s0 = 1/T) and the step factory — as the CLI keeps it
        cfg = dataclasses.replace(
            TINY, learnable_temperature=True, temperature=temperature,
            logit_scale_init=10.0 if loss_name == "siglip" else None,
        )
        model = CXRClip(cfg)
        variables = model.init(
            jax.random.key(0), jnp.zeros((1, 16, 16, 3)),
            jnp.zeros((1, 8), jnp.int32),
        )
        tx = base_transform(weight_decay=1e-3)
        label_fn = make_label_fn(
            ["image_tower", "text_tower", "image_projector",
             "text_projector"]
        )
        step = jax.jit(make_clip_pretrain_step(
            model, tx, label_fn, loss_name, temperature, image_size=16,
            compute_dtype=jnp.float32,
        ))
        return model, step, TrainState.create(variables, tx)

    def test_scalars_exist_and_train(self, rng):
        _, step, state = self._setup("clip_self_distill")
        assert state.params["logit_scale"].shape == ()
        s0 = float(state.params["logit_scale"])
        batch = pretrain_batch(rng)
        for i in range(5):
            state, m = step(state, batch, LRS,
                            jax.random.fold_in(jax.random.key(1), i))
        assert np.isfinite(float(m["loss"]))
        assert float(state.params["logit_scale"]) != s0  # it learns

    def test_init_matches_fixed_temperature_loss(self, pretrain_setup, rng):
        """At init, s = 1/T, so the first-step loss equals the fixed-T
        step's loss bitwise (same batch, same rng, same init weights)."""
        _, fixed_step, fixed_state, _ = pretrain_setup
        _, learn_step, learn_state = self._setup("clip_self_distill")
        batch = pretrain_batch(rng)
        key = jax.random.key(2)
        _, m_fixed = fixed_step(fixed_state, batch, LRS, key)
        _, m_learn = learn_step(learn_state, batch, LRS, key)
        # tower weights share the same init seed; the extra scalars don't
        # perturb them (flax names are independent), so losses match
        np.testing.assert_allclose(
            float(m_learn["loss"]), float(m_fixed["loss"]), rtol=1e-6
        )

    def test_siglip_bias_trains(self, rng):
        _, step, state = self._setup("siglip")
        b0 = float(state.params["logit_bias"])
        assert b0 == -10.0
        s0 = float(np.exp(state.params["logit_scale"]))
        np.testing.assert_allclose(s0, 10.0, rtol=1e-6)
        batch = pretrain_batch(rng)
        for i in range(5):
            state, m = step(state, batch, LRS,
                            jax.random.fold_in(jax.random.key(1), i))
        assert np.isfinite(float(m["loss"]))
        assert float(state.params["logit_bias"]) != b0

    def test_scale_cap_is_post_step_clamp_not_gradient_freeze(self):
        """open-CLIP semantics: the log(100) cap clamps the PARAMETER after
        each step — the stored value never exceeds the cap, and at the cap
        the scale remains trainable downward (an in-loss min() alone would
        zero the gradient forever once the optimizer overshot)."""
        import math

        from clip_for_dl_tpu.train.steps import _LOG_SCALE_MAX, _apply_updates

        # apply_group_lrs supplies the final scale(-lr) itself
        tx = optax.identity()
        params = {
            "logit_scale": jnp.asarray(math.log(99.0), jnp.float32),
            "logit_bias": jnp.asarray(0.0, jnp.float32),
        }
        state = TrainState.create({"params": params}, tx)
        label_fn = make_label_fn([])
        lrs = {"default": 1.0}
        up = {"logit_scale": jnp.asarray(-5.0),  # param -= lr * grad
              "logit_bias": jnp.asarray(0.0)}
        state = _apply_updates(state, up, tx, lrs, label_fn)
        # overshot by ~5 log units → stored value is exactly the cap
        assert float(state.params["logit_scale"]) == pytest.approx(
            _LOG_SCALE_MAX
        )
        down = {"logit_scale": jnp.asarray(0.5),
                "logit_bias": jnp.asarray(0.0)}
        state = _apply_updates(state, down, tx, lrs, label_fn)
        # still trainable at the boundary: the next step moves it DOWN
        assert float(state.params["logit_scale"]) == pytest.approx(
            _LOG_SCALE_MAX - 0.5
        )

    def test_scalars_excluded_from_weight_decay(self):
        tx = base_transform(max_grad_norm=None, weight_decay=0.1)
        params = {"w": jnp.ones((2, 2)), "logit_scale": jnp.ones(())}
        opt_state = tx.init(params)
        zero = jax.tree.map(jnp.zeros_like, params)
        updates, _ = tx.update(zero, opt_state, params)
        assert float(jnp.abs(updates["w"]).max()) > 0  # matrix decays
        assert float(updates["logit_scale"]) == 0.0  # scalar does not


class TestWarmup:
    """Linear LR warmup in run_epoch (--warmup-steps)."""

    def _record_lrs(self, state, warmup_steps, n_batches=6):
        from clip_for_dl_tpu.train.loop import run_epoch

        seen = []

        def step(st, batch, lrs, rng):
            seen.append(lrs["g"])
            return st.replace(step=st.step + 1), {"loss": jnp.zeros(())}

        loader = [{"x": np.zeros(1)}] * n_batches
        run_epoch(step, state, loader, {"g": 1.0},
                  iter(lambda: jax.random.key(0), None),
                  warmup_steps=warmup_steps, log_every=100)
        return seen

    def test_linear_ramp_then_flat(self):
        tx = base_transform()
        state = TrainState.create({"params": {"w": jnp.zeros(2)}}, tx)
        seen = self._record_lrs(state, warmup_steps=4)
        np.testing.assert_allclose(seen, [0.25, 0.5, 0.75, 1.0, 1.0, 1.0])

    def test_resume_continues_the_ramp(self):
        tx = base_transform()
        state = TrainState.create({"params": {"w": jnp.zeros(2)}}, tx)
        state = state.replace(step=jnp.asarray(2, jnp.int32))  # resumed
        seen = self._record_lrs(state, warmup_steps=4, n_batches=3)
        np.testing.assert_allclose(seen, [0.75, 1.0, 1.0])

    def test_off_by_default(self):
        tx = base_transform()
        state = TrainState.create({"params": {"w": jnp.zeros(2)}}, tx)
        seen = self._record_lrs(state, warmup_steps=0, n_batches=2)
        np.testing.assert_allclose(seen, [1.0, 1.0])


class TestEma:
    """EMA weight averaging: ema_params in TrainState, updated inside the
    jitted step, warmup-capped decay, eval/inference via use_ema."""

    def _setup(self, ema_decay):
        model, variables = tiny_model()
        tx = base_transform(weight_decay=1e-3)
        label_fn = make_label_fn(
            ["image_tower", "text_tower", "image_projector",
             "text_projector"]
        )
        step = jax.jit(make_clip_pretrain_step(
            model, tx, label_fn, temperature=2.0, image_size=16,
            compute_dtype=jnp.float32, ema_decay=ema_decay,
        ))
        state = TrainState.create(variables, tx, ema=True)
        return model, step, state

    def test_ema_matches_manual_recurrence(self, rng):
        decay = 0.9
        model, step, state = self._setup(decay)
        batch = pretrain_batch(rng)
        want = jax.tree.map(np.asarray, state.params)  # seeded from init
        key = jax.random.key(1)
        for i in range(4):
            state, _ = step(state, batch, LRS, jax.random.fold_in(key, i))
            d = min(decay, (1.0 + i) / (10.0 + i))  # warmup cap
            want = jax.tree.map(
                lambda e, p: e * d + np.asarray(p) * (1.0 - d),
                want, state.params,
            )
        for got, w in zip(
            jax.tree.leaves(state.ema_params), jax.tree.leaves(want)
        ):
            np.testing.assert_allclose(np.asarray(got), w, atol=1e-6)
        # smoothed weights differ from the live ones after updates
        diffs = [
            float(np.abs(np.asarray(e) - np.asarray(p)).max())
            for e, p in zip(jax.tree.leaves(state.ema_params),
                            jax.tree.leaves(state.params))
        ]
        assert max(diffs) > 0

    def test_off_by_default_state_has_no_ema(self, pretrain_setup, rng):
        _, step, state, _ = pretrain_setup
        assert state.ema_params is None
        state, _ = step(state, pretrain_batch(rng), LRS, jax.random.key(0))
        assert state.ema_params is None

    def test_eval_step_uses_ema(self, rng):
        model, step, state = self._setup(0.9)
        batch = pretrain_batch(rng)
        for i in range(3):
            state, _ = step(state, batch, LRS,
                            jax.random.fold_in(jax.random.key(1), i))
        eval_live = jax.jit(make_clip_eval_step(
            model, temperature=2.0, image_size=16,
            compute_dtype=jnp.float32,
        ))
        eval_ema = jax.jit(make_clip_eval_step(
            model, temperature=2.0, image_size=16,
            compute_dtype=jnp.float32, use_ema=True,
        ))
        live = float(eval_live(state, batch)["loss"])
        ema = float(eval_ema(state, batch)["loss"])
        assert np.isfinite(ema) and ema != live

    def test_to_variables_use_ema_requires_ema(self):
        model, variables = tiny_model()
        tx = base_transform()
        state = TrainState.create(variables, tx)  # no EMA
        with pytest.raises(ValueError, match="EMA"):
            state.to_variables(use_ema=True)

    def test_checkpoint_roundtrip_restores_ema_slot(self, tmp_path, rng):
        """restore_variables(use_ema=True) reads the smoothed weights; on a
        checkpoint trained WITHOUT EMA it errors instead of silently
        returning random init."""
        from clip_for_dl_tpu.train import CheckpointManager

        model, step, state = self._setup(0.9)
        batch = pretrain_batch(rng)
        for i in range(3):
            state, _ = step(state, batch, LRS,
                            jax.random.fold_in(jax.random.key(1), i))
        mgr = CheckpointManager(str(tmp_path / "ck"))
        mgr.save(0, state, metrics={"val_loss": 1.0})
        mgr.wait()
        _, variables = tiny_model()
        got = mgr.restore_variables(variables, use_ema=True)
        for g, e in zip(jax.tree.leaves(got["params"]),
                        jax.tree.leaves(state.ema_params)):
            np.testing.assert_allclose(np.asarray(g), np.asarray(e))
        mgr.close()

        # a non-EMA checkpoint must hard-error on --use-ema
        tx = base_transform(weight_decay=1e-3)
        plain = TrainState.create(tiny_model()[1], tx)
        mgr2 = CheckpointManager(str(tmp_path / "ck2"))
        mgr2.save(0, plain, metrics={"val_loss": 1.0})
        mgr2.wait()
        with pytest.raises(ValueError, match="lacks"):
            mgr2.restore_variables(tiny_model()[1], use_ema=True)
        mgr2.close()


class TestBf16Moments:
    """--bf16-moments parity guard: bf16 first-moment AdamW must track the
    fp32 optimizer closely (mu enters the update linearly; nu stays fp32)."""

    def test_updates_track_fp32(self, rng):
        import optax

        params = {"w": jnp.asarray(rng.standard_normal((64, 64)), jnp.float32)}
        tx32 = base_transform(max_grad_norm=1.0, weight_decay=1e-3)
        tx16 = base_transform(
            max_grad_norm=1.0, weight_decay=1e-3, moment_dtype=jnp.bfloat16
        )
        s32, s16 = tx32.init(params), tx16.init(params)
        # mu stored in bf16, nu in fp32
        adam16 = s16[1]  # chain: clip, scale_by_adam, decay
        assert jax.tree.leaves(adam16.mu)[0].dtype == jnp.bfloat16
        assert jax.tree.leaves(adam16.nu)[0].dtype == jnp.float32
        p32, p16 = params, params
        for i in range(5):
            g = {"w": jnp.asarray(
                np.random.default_rng(i).standard_normal((64, 64)), jnp.float32
            ) * 0.1}
            u32, s32 = tx32.update(g, s32, p32)
            u16, s16 = tx16.update(g, s16, p16)
            p32 = optax.apply_updates(p32, jax.tree.map(lambda u: -1e-3 * u, u32))
            p16 = optax.apply_updates(p16, jax.tree.map(lambda u: -1e-3 * u, u16))
        # after 5 steps the parameters must agree to bf16-mu rounding
        np.testing.assert_allclose(
            np.asarray(p16["w"]), np.asarray(p32["w"]), atol=5e-5
        )


class TestBf16AttentionProbs:
    """ModelConfig.bf16_attention_probs — the attention-probs storage knob.

    The flag stores the softmax'd attention probabilities in bf16 so the
    backward saves a half-size residual (and XLA drops the fp32 [B,H,L,L]
    layout copies — trace-measured in NOTES.md). Math guard: forward
    features and one full pretrain-step's gradients stay close to the
    fp32-probs baseline."""

    def _step_loss_and_grads(self, bf16_probs):
        cfg = dataclasses.replace(TINY, bf16_attention_probs=bf16_probs)
        model = CXRClip(cfg)
        variables = model.init(
            jax.random.key(0), jnp.zeros((1, 16, 16, 3)),
            jnp.zeros((1, 8), jnp.int32),
        )
        rng = np.random.default_rng(3)
        batch = {
            "images": jnp.asarray(
                rng.integers(0, 255, (4, 16, 16, 3), dtype=np.uint8)
            ),
            "input_ids": jnp.asarray(
                rng.integers(0, 64, (4, 8)).astype(np.int32)
            ),
            "attention_mask": jnp.ones((4, 8), jnp.int32),
        }

        def loss_fn(params):
            from clip_for_dl_tpu.losses import clip_self_distill_loss
            from clip_for_dl_tpu.ops.image_prep import preprocess_images

            images = preprocess_images(
                batch["images"], 16, 16, (0.0,) * 3, (1.0,) * 3, jnp.float32
            )
            (img_f, txt_f), _ = model.apply(
                {**variables, "params": params},
                images, batch["input_ids"], batch["attention_mask"],
                train=True, mutable=["batch_stats"],
                rngs={"dropout": jax.random.key(7)},
            )
            return clip_self_distill_loss(txt_f, img_f, 2.0)

        return jax.value_and_grad(loss_fn)(variables["params"])

    def test_forward_and_grads_close_to_fp32_baseline(self):
        loss32, g32 = self._step_loss_and_grads(False)
        loss16, g16 = self._step_loss_and_grads(True)
        assert np.isfinite(float(loss16))
        assert abs(float(loss16) - float(loss32)) < 1e-2 * max(
            1.0, abs(float(loss32))
        )
        flat32 = jnp.concatenate(
            [x.ravel() for x in jax.tree.leaves(g32)]
        )
        flat16 = jnp.concatenate(
            [x.ravel() for x in jax.tree.leaves(g16)]
        )
        denom = float(jnp.linalg.norm(flat32)) or 1.0
        rel = float(jnp.linalg.norm(flat16 - flat32)) / denom
        assert rel < 5e-2, rel

    def test_default_off_is_bitwise_identical(self):
        loss_a, g_a = self._step_loss_and_grads(False)
        loss_b, g_b = self._step_loss_and_grads(False)
        assert float(loss_a) == float(loss_b)
        for x, y in zip(jax.tree.leaves(g_a), jax.tree.leaves(g_b)):
            assert jnp.array_equal(x, y)


def test_pretrain_loss_invariant_to_pad_length():
    """Bucketed text (`--bucket-text`) is identical math: the same batch
    padded to seq 64 vs seq 128 (mask-0 tail) yields EXACTLY the same
    pretrain-step loss in fp32 with dropout off — pad positions are
    inert through embeddings, masked attention, CLS pooling and the
    self-distill loss (benchmarks/bucketed_pretrain.md's exact-parity
    leg; on-TPU the residue is matmul-precision reassociation only)."""
    B, size, vocab = 4, 32, 97
    lrs = {"image_tower": 1e-4, "text_tower": 1e-5, "image_projector": 1e-3,
           "text_projector": 1e-3, "default": 1e-4}
    label_fn = make_label_fn(
        ["image_tower", "text_tower", "image_projector", "text_projector"]
    )
    tx = base_transform(max_grad_norm=1.0, weight_decay=1e-3)
    rng = np.random.default_rng(0)
    images = rng.integers(0, 255, (B, size, size, 3), dtype=np.uint8)
    lens = rng.integers(3, 14, B)
    toks = [rng.integers(5, vocab, L) for L in lens]

    def loss_at(seq):
        cfg = ModelConfig(
            max_text_length=seq, vocab_size=vocab, dropout=0.0,
            image_size=size, text_embedding_dim=32, text_layers=2,
            text_heads=2, text_intermediate_dim=64,
            shared_embedding_dim=32, resnet_stages=(1, 1, 1, 1),
            resnet_width=8,
        )
        model = CXRClip(cfg, dtype=jnp.float32)
        variables = model.init(
            jax.random.key(0), jnp.zeros((1, size, size, 3)),
            jnp.zeros((1, seq), jnp.int32),
        )
        step = jax.jit(make_clip_pretrain_step(
            model, tx, label_fn, "clip_self_distill", temperature=2.0,
            image_size=size, compute_dtype=jnp.float32,
        ))
        state = TrainState.create(variables, tx)
        ids = np.zeros((B, seq), np.int32)
        mask = np.zeros((B, seq), np.int32)
        for i, t in enumerate(toks):
            ids[i, : len(t)] = t
            mask[i, : len(t)] = 1
        _, m = step(
            state,
            {"images": images, "input_ids": ids, "attention_mask": mask},
            lrs, jax.random.key(0),
        )
        return float(m["loss"])

    # to fp32 accumulation: XLA fuses the two program shapes differently,
    # reassociating reductions at epsilon scale (measured 6e-7 here; the
    # math itself is exact — seq 64 vs 128 at larger geometry is
    # bit-equal on CPU)
    a, b = loss_at(16), loss_at(32)
    assert abs(a - b) < 5e-6, (a, b)
