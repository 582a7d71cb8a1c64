"""Auxiliary subsystems: co-occurrence, metric writer, preemption, resume."""

import os
import signal

import numpy as np
import pandas as pd
import pytest

from clip_for_dl_tpu.evals import MetricWriter, read_jsonl
from clip_for_dl_tpu.train import PreemptionGuard
from clip_for_dl_tpu.zeroshot import disease_cooccurrence


def test_cooccurrence_counts():
    df = pd.DataFrame({"Problems": [
        "Cardiomegaly;Nodule", "Cardiomegaly;Nodule;Mass", "normal", None,
    ]})
    m = disease_cooccurrence(df)
    assert m.loc["Cardiomegaly", "Nodule"] == 2
    assert m.loc["Nodule", "Cardiomegaly"] == 2
    assert m.loc["Mass", "Cardiomegaly"] == 1
    assert m.loc["Cardiomegaly", "Cardiomegaly"] == 0
    assert "normal" in m.index  # reference counts the literal term


def test_metric_writer_jsonl(tmp_path):
    w = MetricWriter(str(tmp_path), "test")
    w.write(0, {"loss": 1.5, "skipme": "not-a-number"})
    w.write(1, {"loss": np.float32(1.25)}, prefix="val_")
    w.close()
    rows = read_jsonl(str(tmp_path / "test_metrics.jsonl"))
    assert rows[0]["loss"] == 1.5
    assert "skipme" not in rows[0]
    assert rows[1]["val_loss"] == 1.25


def test_preemption_guard_signal():
    with PreemptionGuard(signals=(signal.SIGUSR1,)) as guard:
        assert not guard.requested
        os.kill(os.getpid(), signal.SIGUSR1)
        assert guard.requested
    # handler restored
    assert signal.getsignal(signal.SIGUSR1) != guard._handler


def test_preemption_stops_fit(tmp_path):
    import jax
    import jax.numpy as jnp

    from clip_for_dl_tpu.core.prng import KeyChain
    from clip_for_dl_tpu.train import TrainState, base_transform, fit

    # trivial "model": state carries one param, steps are no-ops
    tx = base_transform()
    state = TrainState.create({"params": {"w": jnp.zeros(1)}}, tx)

    def step(state, batch, lrs, rng):
        return state.replace(step=state.step + 1), {"loss": jnp.asarray(1.0)}

    guard = PreemptionGuard(signals=())
    guard.trigger()
    kc = KeyChain(0)
    state, history = fit(
        state, step, None,
        train_loader_fn=lambda: iter([{"x": np.zeros(1)}]),
        val_loader_fn=None,
        base_lrs={"default": 1e-3},
        num_epochs=10,
        rng_stream=kc.stream("d"),
        scheduler="none",
        early_stop_patience=None,
        preemption_guard=guard,
        log_every=1,
    )
    # step-granular preemption: the loop stops after the FIRST batch (one
    # step of work, checkpointed when a checkpointer is wired) rather than
    # completing the epoch — the partial epoch records no history row
    assert len(history.rows) == 0
    assert int(state.step) == 1


def test_resume_or_init(tmp_path):
    import jax.numpy as jnp

    from clip_for_dl_tpu.train import (
        CheckpointManager,
        TrainState,
        base_transform,
        resume_or_init,
    )

    tx = base_transform()
    template = TrainState.create({"params": {"w": jnp.zeros(2)}}, tx)
    mgr = CheckpointManager(str(tmp_path / "ck"))
    state0, epoch0 = resume_or_init(mgr, template)
    assert epoch0 == 0
    mgr.save(4, template.replace(step=template.step + 9),
             metrics={"val_loss": 0.3})
    mgr.wait()
    state, epoch = resume_or_init(mgr, template)
    assert epoch == 5
    assert int(state.step) == 9
    mgr.close()


def test_restore_variables_ignores_optimizer_structure(tmp_path):
    """Inference restore works regardless of the training tx structure
    (regression: zeroshot --checkpoint failed when the template optimizer
    chain length differed from the trained one)."""
    import jax.numpy as jnp

    from clip_for_dl_tpu.train import (
        CheckpointManager,
        TrainState,
        base_transform,
    )

    tx_train = base_transform(max_grad_norm=1.0, weight_decay=1e-3)  # 3 links
    variables = {"params": {"w": jnp.ones(3)}, "batch_stats": {"m": jnp.zeros(2)}}
    state = TrainState.create(variables, tx_train)
    mgr = CheckpointManager(str(tmp_path / "ck"))
    mgr.save(0, state, metrics={"val_loss": 1.0})
    mgr.wait()
    restored = mgr.restore_variables(variables)
    assert restored is not None
    import numpy as np

    np.testing.assert_array_equal(np.asarray(restored["params"]["w"]), [1, 1, 1])
    assert "batch_stats" in restored
    mgr.close()
