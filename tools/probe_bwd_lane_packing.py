"""Probe: can the flash-attention BACKWARD pack two D=64 heads per
128-lane block?

VERDICT r3 weak #4: the bwd kernel runs at ~30 TF/s and the trace notes
accepted that as the D=64-narrow-matmul ceiling (half the MXU lanes idle)
from arithmetic alone — "packing two heads per 128-lane block in the bwd
kernel was never attempted". This script attempts it, on the real BERT
shape (B=128, N=200→208, H=12, D=64), against the shipped kernel
(`ops/flash_attention._bwd_kernel`, dropout off to isolate the matmuls):

- variant `stack2`: per head-pair, jnp.stack the two heads' [NP, D] lane
  slices into [2, NP, D] and run every _head_bwd matmul as a BATCHED 3-D
  dot_general (batch dim = the pair). If Mosaic lowers batched dots onto
  the MXU as one 128-wide issue, the five narrow matmuls per head become
  full-width.
- variant `reshape3d`: one in-kernel reshape [NP, H·D] → [NP, H, D] +
  transpose to [H, NP, D], then a single batched dot over ALL heads.
  (r3 already established Mosaic rejects 4-D head windows; 3-D was
  untested.)

Anything that fails to compile is recorded with the Mosaic error class —
the probe-backed impossibility note VERDICT asked for. Anything that
compiles is checked for numerics vs the shipped kernel, then timed.

Why no 2-D packing variant: every 2-D "two heads side by side" layout
mixes heads through the shared contraction — s=q·kᵀ contracts D (both
heads' products add), dv=pdᵀ·do and dq=ds·k need a DIFFERENT [NP,NP]
matrix per head. The only mathematically correct 2-D form is
block-diagonal operands, which doubles FLOPs for at best the same
MXU-seconds.

Usage: python tools/probe_bwd_lane_packing.py [--out benchmarks/...]
"""

from __future__ import annotations

import argparse
import functools
import json
import os
import sys
import time
import traceback

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402
from jax.experimental import pallas as pl  # noqa: E402
from jax.experimental.pallas import tpu as pltpu  # noqa: E402

from clip_for_dl_tpu.ops.flash_attention import (  # noqa: E402
    _bwd_kernel,
    _pad_inputs,
    _round_up,
)


def _softmax_rows(s):
    m = jnp.max(s, axis=-1, keepdims=True)
    e = jnp.exp(s - m)
    return e / jnp.sum(e, axis=-1, keepdims=True)


def _pair_bwd_batched(q2, k2, v2, do2, bias, scale):
    """_head_bwd with a leading batch (=2 heads) dim on every dot."""
    dn = jax.lax.dot_general
    s = dn(q2, k2, (((2,), (2,)), ((0,), (0,))),
           preferred_element_type=jnp.float32) * scale + bias
    p = _softmax_rows(s)
    pc = p.astype(q2.dtype)
    dv = dn(pc, do2, (((1,), (1,)), ((0,), (0,))),
            preferred_element_type=jnp.float32)
    dp = dn(do2, v2, (((2,), (2,)), ((0,), (0,))),
            preferred_element_type=jnp.float32)
    delta = jnp.sum(p * dp, axis=-1, keepdims=True)
    ds = (p * (dp - delta)).astype(q2.dtype)
    dq = dn(ds, k2, (((2,), (1,)), ((0,), (0,))),
            preferred_element_type=jnp.float32) * scale
    dk = dn(ds, q2, (((1,), (1,)), ((0,), (0,))),
            preferred_element_type=jnp.float32) * scale
    return dq, dk, dv


def _bwd_kernel_stack2(bias_ref, q_ref, k_ref, v_ref, do_ref,
                       dq_ref, dk_ref, dv_ref,
                       *, heads: int, dim: int, scale: float):
    bias = bias_ref[0]  # [1, NP] broadcasts over the pair batch dim
    qf, kf, vf, dof = q_ref[0], k_ref[0], v_ref[0], do_ref[0]
    for p_i in range(heads // 2):
        a = slice(2 * p_i * dim, (2 * p_i + 1) * dim)
        b = slice((2 * p_i + 1) * dim, (2 * p_i + 2) * dim)
        q2 = jnp.stack([qf[:, a], qf[:, b]])  # [2, NP, D]
        k2 = jnp.stack([kf[:, a], kf[:, b]])
        v2 = jnp.stack([vf[:, a], vf[:, b]])
        do2 = jnp.stack([dof[:, a], dof[:, b]])
        dq, dk, dv = _pair_bwd_batched(q2, k2, v2, do2, bias, scale)
        for j, sl in enumerate((a, b)):
            dq_ref[0, :, sl] = dq[j].astype(dq_ref.dtype)
            dk_ref[0, :, sl] = dk[j].astype(dk_ref.dtype)
            dv_ref[0, :, sl] = dv[j].astype(dv_ref.dtype)


def _bwd_kernel_reshape3d(bias_ref, q_ref, k_ref, v_ref, do_ref,
                          dq_ref, dk_ref, dv_ref,
                          *, heads: int, dim: int, scale: float):
    bias = bias_ref[0]
    NP = q_ref.shape[1]

    def heads_major(ref):
        return ref[0].reshape(NP, heads, dim).transpose(1, 0, 2)

    qh, kh, vh, doh = (heads_major(r) for r in (q_ref, k_ref, v_ref, do_ref))
    dq, dk, dv = _pair_bwd_batched(qh, kh, vh, doh, bias, scale)

    def fold(x):
        return x.transpose(1, 0, 2).reshape(NP, heads * dim)

    dq_ref[0] = fold(dq).astype(dq_ref.dtype)
    dk_ref[0] = fold(dk).astype(dk_ref.dtype)
    dv_ref[0] = fold(dv).astype(dv_ref.dtype)


def build(kernel, B, N, H, D, *, shipped=False, interpret=False):
    scale = 1.0 / float(D) ** 0.5
    NP = _round_up(N, 8)
    spec = pl.BlockSpec((1, NP, H * D), lambda b: (b, 0, 0),
                        memory_space=pltpu.VMEM)
    shape = jax.ShapeDtypeStruct((B, NP, H * D), jnp.bfloat16)
    in_specs = [
        pl.BlockSpec((1, 1, NP), lambda b: (b, 0, 0),
                     memory_space=pltpu.VMEM),
        spec, spec, spec, spec,
    ]
    if shipped:
        kern = functools.partial(_bwd_kernel, heads=H, dim=D, scale=scale,
                                 rate=0.0)

        def wrapped(seed_ref, *rest):
            return kern(seed_ref, *rest)

        in_specs = [pl.BlockSpec(memory_space=pltpu.SMEM)] + in_specs
    else:
        wrapped = functools.partial(kernel, heads=H, dim=D, scale=scale)

    def run(bias, q, k, v, do, seeds):
        args = (bias[:, None, :], q, k, v, do)
        if shipped:
            args = (seeds,) + args
        return pl.pallas_call(
            wrapped,
            grid=(B,),
            in_specs=in_specs,
            out_specs=(spec, spec, spec),
            out_shape=(shape, shape, shape),
            cost_estimate=pl.CostEstimate(
                flops=10 * B * H * NP * NP * D,
                bytes_accessed=7 * B * H * NP * D * 2,
                transcendentals=B * H * NP * NP,
            ),
            interpret=interpret,
        )(*args)

    return run


def main(argv=None) -> int:
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--batch", type=int, default=128)
    p.add_argument("--seq", type=int, default=200)
    p.add_argument("--heads", type=int, default=12)
    p.add_argument("--dim", type=int, default=64)
    p.add_argument("--iters", type=int, default=30)
    p.add_argument("--interpret", action="store_true",
                   help="numerics-only smoke off-TPU (no Mosaic, no perf)")
    p.add_argument("--out", default=None, metavar="BASE")
    args = p.parse_args(argv)

    from clip_for_dl_tpu.core.compile_cache import enable_from_env

    enable_from_env()
    B, N, H, D = args.batch, args.seq, args.heads, args.dim
    rng = np.random.default_rng(0)
    q, k, v, do = (
        jnp.asarray(rng.normal(size=(B, N, H, D)), jnp.bfloat16)
        for _ in range(4)
    )
    bias = jnp.zeros((B, N), jnp.float32)
    qp, kp, vp, biasp, NP = _pad_inputs(q, k, v, bias)
    dop = jnp.pad(do, [(0, 0), (0, NP - N), (0, 0), (0, 0)])
    flat = tuple(t.reshape(B, NP, H * D) for t in (qp, kp, vp, dop))
    seeds = jnp.zeros((B, 1), jnp.int32)

    # per-step useful flops of the bwd kernel (5 NxN-by-D-ish matmuls)
    flops = 10 * B * H * NP * NP * D

    results = {"shape": {"B": B, "N": N, "NP": NP, "H": H, "D": D},
               "variants": {}}
    reference_out = None
    for name, kernel, shipped in (
        ("shipped", None, True),
        ("stack2", _bwd_kernel_stack2, False),
        ("reshape3d", _bwd_kernel_reshape3d, False),
    ):
        row: dict = {}
        try:
            fn = jax.jit(build(kernel, B, N, H, D, shipped=shipped,
                               interpret=args.interpret))
            out = fn(biasp, *flat, seeds)
            out = tuple(np.asarray(t) for t in out)
            if reference_out is None:
                reference_out = out
                row["numerics"] = "reference"
            else:
                err = max(
                    float(np.abs(a.astype(np.float32)
                                 - b.astype(np.float32)).max())
                    for a, b in zip(out, reference_out)
                )
                row["max_abs_err_vs_shipped"] = err
                row["numerics"] = "ok" if err < 1e-2 else "MISMATCH"
            t0 = time.perf_counter()
            for _ in range(args.iters):
                r = fn(biasp, *flat, seeds)
            np.asarray(r[0])  # fence through the tunnel
            dt = (time.perf_counter() - t0) / args.iters
            row["ms"] = round(dt * 1e3, 3)
            row["tflops_per_s"] = round(flops / dt / 1e12, 1)
            row["status"] = "compiled"
        except Exception as e:  # Mosaic rejection is the documented result
            row["status"] = "REJECTED"
            row["error"] = f"{type(e).__name__}: {str(e)[:600]}"
            traceback.print_exc(limit=1, file=sys.stderr)
        results["variants"][name] = row
        print(json.dumps({name: row}), flush=True)

    print(json.dumps(results))
    if args.out:
        with open(args.out + ".json", "w") as f:
            json.dump(results, f, indent=1)
        lines = [
            "# Flash-attention backward: 2-heads-per-128-lane packing probe",
            "",
            f"Shape B={B} N={N} (padded {NP}) H={H} D={D}, dropout off, "
            f"bf16 inputs, {args.iters} fenced iters (VERDICT r3 weak #4).",
            "",
            "| variant | status | ms | TF/s | numerics |",
            "|---|---|---|---|---|",
        ]
        for name, row in results["variants"].items():
            lines.append(
                f"| {name} | {row['status']} | {row.get('ms', '—')} "
                f"| {row.get('tflops_per_s', '—')} "
                f"| {row.get('numerics', row.get('error', '—'))[:120]} |"
            )
        lines += [
            "",
            "See module docstring for why no 2-D packing variant exists "
            "(every side-by-side layout mixes heads through the shared "
            "contraction; block-diagonal operands double FLOPs).",
            "",
            f"Generated by `python tools/probe_bwd_lane_packing.py --out "
            f"{args.out}`.",
        ]
        with open(args.out + ".md", "w") as f:
            f.write("\n".join(lines) + "\n")
    return 0


if __name__ == "__main__":
    sys.exit(main())
