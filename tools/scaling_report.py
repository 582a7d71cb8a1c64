"""Multi-chip scaling report from partitioned-HLO cost analysis.

One real chip is available, so scaling is validated analytically: the full
data-parallel CLIP pretrain step (both towers, global-batch self-distill
loss, AdamW) is jitted over 1/2/4/8-device meshes (virtual CPU devices —
the same GSPMD partitioning a real slice gets), and for each mesh size this
reports, per device:

  - FLOPs (XLA cost analysis of the compiled, SPMD-partitioned module)
  - collective traffic: op counts and bytes for all-gather / all-reduce /
    reduce-scatter / collective-permute parsed from the optimized HLO
  - an ICI roofline estimate: compute time at a stated MXU efficiency vs
    collective time at a stated per-chip ICI bandwidth, and the implied
    weak-scaling efficiency  max-overlap model: step ≈ max(compute, comm).

With per-device batch held constant (weak scaling), DP scales until
collective bytes/ICI catch compute; the report makes that crossover
visible without hardware. Constants default to TPU v5e: 197 bf16
TFLOP/s peak and 9e10 B/s effective per-chip ICI bandwidth for a 1-D
ring axis (2 × 45 GB/s one-way links; jax-ml.github.io/scaling-book).

``--regime`` extends the same analysis beyond DP: ``tp`` (Megatron
tensor-parallel towers), ``pp`` (GPipe pipelined text tower — its
``collective-permute`` microbatch hops show up in the traffic table),
``ep`` (Switch-MoE expert parallelism) — each on a 2-D
(data, <regime>) mesh of ``--degree`` within every device count.

Usage: python tools/scaling_report.py [--devices 1 2 4 8]
       [--per-device-batch 8] [--full] [--mxu-eff 0.35] [--ici-bw 9e10]
       [--regime dp|tp|pp|ep] [--degree 2]
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import argparse
import json
import re

_DTYPE_BYTES = {
    "pred": 1, "u8": 1, "s8": 1, "u16": 2, "s16": 2, "bf16": 2, "f16": 2,
    "u32": 4, "s32": 4, "f32": 4, "u64": 8, "s64": 8, "f64": 8, "c64": 8,
    "c128": 16,
}

_SHAPE_RE = re.compile(r"\b([a-z]+\d*)\[([0-9,]*)\]")
_COLLECTIVES = ("all-gather", "all-reduce", "reduce-scatter",
                "collective-permute")


def _shape_bytes(dtype: str, dims: str) -> int:
    if dtype not in _DTYPE_BYTES:
        return 0
    n = 1
    for d in dims.split(","):
        if d:
            n *= int(d)
    return n * _DTYPE_BYTES[dtype]


def collective_traffic(hlo_text: str) -> dict:
    """Optimized HLO → {op: {"count": n, "bytes": output bytes}}.

    Bytes are the op's result shapes (the full gathered/reduced size — what
    lands in each device's memory). Matches both synchronous spellings
    (``all-reduce(``) and async pairs (``all-reduce-start(``; the matching
    ``-done`` is not counted, so async ops are not double-counted)."""
    out = {op: {"count": 0, "bytes": 0} for op in _COLLECTIVES}
    for line in hlo_text.splitlines():
        stripped = line.strip()
        for op in _COLLECTIVES:
            # result shapes appear between '=' and the op name
            markers = (f" {op}(", f" {op}-start(")
            marker = next((m for m in markers if m in stripped), None)
            if marker is None or "=" not in stripped:
                continue
            lhs = stripped.split(marker, 1)[0]
            result = lhs.split("=", 1)[1] if "=" in lhs else lhs
            size = sum(
                _shape_bytes(d, dims) for d, dims in _SHAPE_RE.findall(result)
            )
            out[op]["count"] += 1
            out[op]["bytes"] += size
            break
    return out


def wire_bytes_per_device(traffic: dict, n: int) -> float:
    """Ring-algorithm wire traffic through each chip.

    all-gather / reduce-scatter move (n-1)/n of the payload; all-reduce is
    both phases (reduce-scatter + all-gather) → 2(n-1)/n. collective-permute
    moves its full payload once."""
    if n <= 1:
        return 0.0
    ring = (n - 1) / n
    return (
        traffic["all-gather"]["bytes"] * ring
        + traffic["reduce-scatter"]["bytes"] * ring
        + traffic["all-reduce"]["bytes"] * 2 * ring
        + traffic["collective-permute"]["bytes"]
    )


def main(argv=None) -> int:
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--devices", type=int, nargs="+", default=[1, 2, 4, 8])
    p.add_argument("--per-device-batch", type=int, default=8)
    p.add_argument("--full", action="store_true",
                   help="full-size model (slow CPU compiles); default tiny")
    p.add_argument("--mxu-eff", type=float, default=0.35,
                   help="assumed MXU utilization for the compute roofline")
    p.add_argument("--ici-bw", type=float, default=9e10,
                   help="effective per-chip ICI bytes/s on the ring axis")
    p.add_argument("--peak-flops", type=float, default=197e12,
                   help="per-chip peak bf16 FLOP/s (v5e)")
    p.add_argument("--regime", choices=["dp", "tp", "pp", "ep"],
                   default="dp",
                   help="parallelism regime to analyze (2-D data×X mesh "
                        "for tp/pp/ep)")
    p.add_argument("--degree", type=int, default=2,
                   help="tp/pp/ep degree inside each device count")
    p.add_argument("--pp-microbatches", type=int, default=2)
    args = p.parse_args(argv)
    if min(args.devices) < 1:
        p.error("--devices entries must be >= 1")
    if args.per_device_batch < 1:
        p.error("--per-device-batch must be >= 1")
    for name in ("mxu_eff", "ici_bw", "peak_flops"):
        if getattr(args, name) <= 0:
            p.error(f"--{name.replace('_', '-')} must be > 0")

    max_dev = max(args.devices)

    # The analysis needs a virtual CPU mesh. NOTE this is process-global
    # state (the helper replaces any pre-existing device-count flag and may
    # clear_backends): fine for the CLI; a no-op under the test suite's
    # 8-device CPU conftest; but an in-process caller holding live TPU
    # arrays must not call this — its arrays would be invalidated.
    from clip_for_dl_tpu.core.mesh import force_virtual_cpu_devices

    force_virtual_cpu_devices(max_dev)

    import jax

    import jax.numpy as jnp
    import numpy as np

    from clip_for_dl_tpu.core.config import ModelConfig
    from clip_for_dl_tpu.core.mesh import create_mesh
    from clip_for_dl_tpu.models import CXRClip
    from clip_for_dl_tpu.parallel import (
        data_parallel_step,
        replicate_state,
        shard_batch,
    )
    from clip_for_dl_tpu.train import (
        TrainState,
        base_transform,
        make_clip_pretrain_step,
        make_label_fn,
    )

    if args.full:
        cfg = ModelConfig(max_text_length=200)
    else:
        cfg = ModelConfig(
            image_size=32, max_text_length=16, vocab_size=128,
            text_embedding_dim=32, text_layers=2, text_heads=2,
            text_intermediate_dim=64, shared_embedding_dim=64,
            resnet_stages=(1, 1, 1, 1), resnet_width=8,
        )
    if args.regime == "ep":
        import dataclasses

        cfg = dataclasses.replace(
            cfg, text_moe_experts=max(4, 2 * args.degree), text_moe_every=2
        )
    size = cfg.image_size
    seq = cfg.max_text_length
    model = CXRClip(cfg, dtype=jnp.bfloat16)
    variables = model.init(
        jax.random.key(0),
        jnp.zeros((1, size, size, 3)),
        jnp.zeros((1, seq), jnp.int32),
    )
    tx = base_transform(weight_decay=1e-3)
    label_fn = make_label_fn(
        ["image_tower", "text_tower", "image_projector", "text_projector"]
    )
    step = make_clip_pretrain_step(
        model, tx, label_fn, temperature=2.0, image_size=size,
        compute_dtype=jnp.bfloat16,
    )
    lrs = {
        "image_tower": 1e-4, "text_tower": 1e-5, "image_projector": 1e-3,
        "text_projector": 1e-3, "default": 1e-4,
    }
    rng = np.random.default_rng(0)

    def build(n):
        """(wrapped_step, placed_state, mesh) for the chosen regime."""
        if args.regime == "dp" or n == 1:
            mesh = create_mesh(n)
            return (
                data_parallel_step(step, mesh, donate_state=False),
                replicate_state(TrainState.create(variables, tx), mesh),
                mesh,
            )
        if n % args.degree:
            raise SystemExit(
                f"--degree {args.degree} must divide device count {n}"
            )
        if args.regime == "tp":
            from clip_for_dl_tpu.parallel import (
                create_dp_tp_mesh, shard_state_tp, tensor_parallel_step,
            )

            mesh = create_dp_tp_mesh(args.degree, num_devices=n)
            return (
                tensor_parallel_step(step, mesh, donate_state=False),
                shard_state_tp(TrainState.create(variables, tx), mesh),
                mesh,
            )
        if args.regime == "pp":
            from clip_for_dl_tpu.parallel import (
                create_dp_pp_mesh, make_pp_clip_pretrain_step,
                pipeline_parallel_step, pp_params, shard_state_pp,
            )

            mesh = create_dp_pp_mesh(args.degree, num_devices=n)
            pp_step = make_pp_clip_pretrain_step(
                model, tx, label_fn, mesh, args.pp_microbatches,
                temperature=2.0, image_size=size,
                compute_dtype=jnp.bfloat16,
            )
            st = shard_state_pp(
                TrainState.create(
                    {**variables,
                     "params": pp_params(variables["params"], args.degree)},
                    tx,
                ),
                mesh,
            )
            return (
                pipeline_parallel_step(pp_step, mesh, donate_state=False),
                st,
                mesh,
            )
        # ep
        from clip_for_dl_tpu.parallel import (
            create_dp_ep_mesh, expert_parallel_step, shard_state_ep,
        )

        mesh = create_dp_ep_mesh(args.degree, num_devices=n)
        return (
            expert_parallel_step(step, mesh, donate_state=False),
            shard_state_ep(TrainState.create(variables, tx), mesh),
            mesh,
        )

    base_compute_ms = None
    for n in args.devices:
        b = args.per_device_batch * n
        raw_batch = {
            "images": rng.integers(0, 255, (b, size, size, 3),
                                   dtype=np.uint8),
            "input_ids": rng.integers(0, cfg.vocab_size, (b, seq))
            .astype(np.int32),
            "attention_mask": np.ones((b, seq), np.int32),
        }
        dp_step, state, mesh = build(n)
        batch = shard_batch(raw_batch, mesh)
        compiled = jax.jit(dp_step).lower(
            state, batch, lrs, jax.random.key(1)
        ).compile()
        cost = compiled.cost_analysis()
        if isinstance(cost, (list, tuple)):
            cost = cost[0]
        flops = float(cost.get("flops", 0.0))
        traffic = collective_traffic(compiled.as_text())
        coll_bytes = sum(v["bytes"] for v in traffic.values())
        if n > 1 and coll_bytes == 0:
            # a DP step with no detected collectives means the HLO spelling
            # changed — fail loudly rather than print a perfect-scaling lie
            raise RuntimeError(
                f"no collectives matched in the {n}-device partitioned HLO; "
                "update collective_traffic() for this XLA version"
            )
        wire_bytes = wire_bytes_per_device(traffic, n)
        compute_ms = flops / (args.peak_flops * args.mxu_eff) * 1e3
        comm_ms = wire_bytes / args.ici_bw * 1e3
        if base_compute_ms is None:
            base_compute_ms = compute_ms
        step_ms = max(compute_ms, comm_ms)
        eff = base_compute_ms / step_ms if step_ms else 1.0
        print(json.dumps({
            "regime": args.regime if n > 1 else "dp",
            "devices": n,
            "global_batch": b,
            "per_device_gflop": round(flops / 1e9, 3),
            "collectives": {
                op: v for op, v in traffic.items() if v["count"]
            },
            "collective_mb_per_device": round(coll_bytes / 1e6, 3),
            "est_compute_ms": round(compute_ms, 3),
            "est_comm_ms": round(comm_ms, 4),
            "est_weak_scaling_efficiency": round(min(1.0, eff), 4),
        }))
    return 0


if __name__ == "__main__":
    sys.exit(main())
