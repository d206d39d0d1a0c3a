#!/usr/bin/env python
"""Compile-probe calibration of the VMEM envelope (round-5 VERDICT item 9).

``params.vmem_bytes_estimate`` is a hand-calibrated envelope that gates
autotune candidate enumeration; it has mis-predicted twice (round-3
bench_train OOM; round-4 qg=512 re-calibration). This harness replaces
trust with measurement: for each kernel class it walks a ladder of block
configs on the REAL chip, try-COMPILES each (jit(...).lower().compile() —
no execution, so a probe costs seconds), and classifies the envelope:

  unsafe — estimate says "fits the 0.7*VMEM gate" but Mosaic refuses
           (autotune would enumerate a candidate that cannot build)
  loose  — estimate says ">= 1.6x over budget" but the chip compiles it
           (autotune silently prunes winners — the v6e worry)
  ok     — estimate and compiler agree within that band

Also asserts every SHIPPED table row compiles. Results append to
docs/sweeps/vmem_probe.jsonl (resumable); exits non-zero on any unsafe
row or non-compiling shipped row.

    PYTHONPATH=/root/repo:/root/.axon_site python scripts/calibrate_vmem.py
"""

import argparse
import dataclasses
import json
import os
import sys
import time

import jax
import jax.numpy as jnp

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from mfa_tpu.kernels import flash_bwd, flash_fwd
from mfa_tpu.ops import params as params_mod
from mfa_tpu.ops.descriptors import (AttentionDescriptor,
                                     AttentionKernelType, round_up)

OUT = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                   "docs", "sweeps", "vmem_probe.jsonl")

KTYPES = {
    "forward": AttentionKernelType.FORWARD,
    "backward_query": AttentionKernelType.BACKWARD_QUERY,
    "backward_key_value": AttentionKernelType.BACKWARD_KEY_VALUE,
}


def try_compile(kernel: str, head_dim: int, seq: int, bq: int, bkv: int,
                bd: int, gen, causal: bool = False) -> tuple[bool, str]:
    """Lower + compile (remote) without executing. True iff Mosaic accepts."""
    d_pad = round_up(head_dim, 128)
    desc = AttentionDescriptor(
        batch=1, num_q_heads=1, num_kv_heads=1, seq_len_q=seq,
        seq_len_kv=seq, head_dim=head_dim, causal=causal,
        low_precision_inputs=True)
    kd = dataclasses.replace(
        desc.kernel_descriptor(KTYPES[kernel], gen),
        block_q=min(bq, seq), block_kv=min(bkv, seq), block_d=bd)
    shp = jax.ShapeDtypeStruct((1, seq, d_pad), jnp.bfloat16)
    lrep = jax.ShapeDtypeStruct((1, seq, 128), jnp.float32)
    try:
        if kernel == "forward":
            fn = flash_fwd.build_fwd(
                kd, batch_heads=1, kv_batch_heads=1, seq_len_q=seq,
                seq_len_kv=seq, d_pad=d_pad, scale=desc.softmax_scale,
                q_dtype=jnp.bfloat16, kv_dtype=jnp.bfloat16,
                o_dtype=jnp.bfloat16)
            jax.jit(fn).lower(shp, shp, shp).compile()
        elif kernel == "backward_query":
            fn = flash_bwd.build_bwd_query(
                kd, batch_heads=1, kv_batch_heads=1, seq_len_q=seq,
                seq_len_kv=seq, d_pad=d_pad, scale=desc.softmax_scale,
                q_dtype=jnp.bfloat16, kv_dtype=jnp.bfloat16)
            jax.jit(fn).lower(shp, shp, shp, shp, shp, lrep).compile()
        else:
            fn = flash_bwd.build_bwd_key_value(
                kd, batch_heads=1, kv_batch_heads=1, seq_len_q=seq,
                seq_len_kv=seq, d_pad=d_pad, scale=desc.softmax_scale,
                q_dtype=jnp.bfloat16, kv_dtype=jnp.bfloat16)
            jax.jit(fn).lower(shp, shp, shp, shp, lrep, lrep).compile()
        return True, ""
    except Exception as e:  # noqa: BLE001 — compile refusal IS the signal
        return False, str(e).splitlines()[0][:120]


def ladder(kernel: str, d_pad: int, seq: int):
    """Configs spanning the fit boundary: from comfortably-inside to
    deliberately-over."""
    for bq in (256, 512, 1024, 2048, 4096):
        for bkv in (512, 1024, 2048, 4096):
            if bq > seq or bkv > seq:
                continue
            for bd in sorted({min(128, d_pad), d_pad}):
                if d_pad % bd:
                    continue
                yield bq, bkv, bd


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--n", type=int, default=4096)
    ap.add_argument("--d", type=int, nargs="+", default=[128, 256, 512])
    ap.add_argument("--kernels", nargs="+", default=list(KTYPES))
    args = ap.parse_args()

    gen = params_mod.detect_generation()
    budget = gen.vmem_bytes * 0.7
    done = {}
    if os.path.exists(OUT):
        with open(OUT) as f:
            for line in f:
                try:
                    r = json.loads(line)
                except json.JSONDecodeError:
                    continue
                done[(r["kernel"], r["d"], r["n"], r["bq"], r["bkv"],
                      r["bd"])] = r

    unsafe, loose, ok = [], [], []
    for kernel in args.kernels:
        for head_dim in args.d:
            d_pad = round_up(head_dim, 128)
            for bq, bkv, bd in ladder(kernel, d_pad, args.n):
                key = (kernel, head_dim, args.n, bq, bkv, bd)
                if key in done:
                    rec = done[key]
                else:
                    row = params_mod.ParameterRow(
                        max_d=head_dim, block_q=bq, block_kv=bkv, block_d=bd)
                    est = params_mod.vmem_bytes_estimate(
                        row, head_dim, 2, kernel)
                    t0 = time.time()
                    good, err = try_compile(kernel, head_dim, args.n, bq,
                                            bkv, bd, gen)
                    rec = {"kernel": kernel, "d": head_dim, "n": args.n,
                           "bq": bq, "bkv": bkv, "bd": bd, "estimate": est,
                           "compiles": good, "error": err,
                           "wall_s": round(time.time() - t0, 1)}
                    with open(OUT, "a") as f:
                        f.write(json.dumps(rec) + "\n")
                est, good = rec["estimate"], rec["compiles"]
                cls = ("unsafe" if est <= budget and not good else
                       "loose" if est >= budget * 1.6 and good else "ok")
                (unsafe if cls == "unsafe" else
                 loose if cls == "loose" else ok).append(rec)
                print(f"  {kernel:18s} D={head_dim:3d} bq={bq:4d} "
                      f"bkv={bkv:4d} bd={bd:3d} est={est/2**20:5.1f}MiB "
                      f"compiles={good} [{cls}]", flush=True)

    # Shipped rows must all compile.
    shipped_bad = []
    for kernel in args.kernels:
        for head_dim in args.d:
            for causal in (False, True):
                rows = params_mod.parameter_table(
                    kernel, low_precision=True, causal=causal,
                    generation=gen.name)
                row = params_mod.select_row(rows, head_dim)
                bd = row.block_d or round_up(head_dim, 128)
                good, err = try_compile(kernel, head_dim, args.n,
                                        row.block_q, row.block_kv, bd, gen,
                                        causal=causal)
                tag = "causal" if causal else "dense"
                print(f"  shipped {kernel:18s} D={head_dim:3d} {tag}: "
                      f"bq={row.block_q} bkv={row.block_kv} bd={bd} "
                      f"compiles={good} {err}", flush=True)
                if not good:
                    shipped_bad.append((kernel, head_dim, causal, err))

    print(f"# {len(ok)} ok, {len(loose)} loose, {len(unsafe)} UNSAFE, "
          f"{len(shipped_bad)} shipped-row failures", flush=True)
    for r in unsafe:
        print(f"# UNSAFE: {r}", flush=True)
    for r in shipped_bad:
        print(f"# SHIPPED FAIL: {r}", flush=True)
    sys.exit(1 if (unsafe or shipped_bad) else 0)


if __name__ == "__main__":
    main()
