#!/usr/bin/env python
"""Round-2 on-chip block-shape sweeps: fwd / bwd_q / bwd_kv at D in {64,128,256}.

Resumable: each (kernel, D, bq, bkv, bd) result is appended to
docs/sweeps/r2_sweep.jsonl as soon as it is measured, so a tunnel outage
loses at most one candidate. Re-running skips already-measured keys.

Usage:  python scripts/sweep_r2.py [--kernel forward|backward_query|backward_key_value|all]
                                   [--d 64 128 256] [--n 4096] [--quick]
"""

from __future__ import annotations

import argparse
import dataclasses
import json
import os
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from mfa_tpu.kernels import flash_bwd, flash_fwd
from mfa_tpu.ops import params as params_mod
from mfa_tpu.ops.descriptors import (
    AttentionDescriptor,
    AttentionKernelType,
    round_up,
)
from mfa_tpu.utils.roofline import attention_flops, measure_chained

OUT = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                   "docs", "sweeps", "r2_sweep.jsonl")


def load_done():
    done = {}
    if os.path.exists(OUT):
        with open(OUT) as f:
            for line in f:
                try:
                    rec = json.loads(line)
                except json.JSONDecodeError:
                    continue
                done[(rec["kernel"], rec["d"], rec["n"], rec["bq"],
                      rec["bkv"], rec["bd"], rec.get("dtype", "bf16"),
                      rec.get("causal", False))] = rec
    return done


def record(rec):
    with open(OUT, "a") as f:
        f.write(json.dumps(rec) + "\n")
        f.flush()


def fwd_candidates(d_pad, seq, in_bytes=2, causal=False):
    bkv_opts = (2048, 4096) if in_bytes == 2 else (512, 1024, 2048)
    if d_pad > 256:
        # Large D: the streamed-KV double buffer scales with d_pad, so the
        # wide traversal blocks all overflow the VMEM filter at D=512
        # (2*2*2048*512*2 = 16.8 MiB alone); give the sweep narrower ones.
        bkv_opts = tuple(sorted(set(bkv_opts) | {512, 1024}))
    if causal:
        # Finer traversal blocks give the causal block/group skip its
        # granularity (at bkv = N every block straddles the diagonal).
        bkv_opts = tuple(sorted(set(bkv_opts) | {512, 1024}))
    for bq in (256, 512, 1024, 2048):
        for bkv in bkv_opts:
            if bkv > seq:
                continue
            bd_opts = {min(128, d_pad), d_pad}
            if d_pad > 256 and d_pad % 256 == 0:
                bd_opts.add(256)       # large-D middle ground (384/512 rows)
            for bd in sorted(bd_opts):
                if d_pad % bd:
                    continue
                # VMEM sanity: live S tiles (~2 row groups of 256 => at most
                # 512 live rows) + acc + double-buffered streamed kv.
                s_bytes = min(bq, 512) * bkv * 4
                kv_bytes = 2 * 2 * bkv * d_pad * in_bytes
                acc = bq * d_pad * 4 + bq * d_pad * in_bytes
                if s_bytes + kv_bytes + acc > 15.2 * 2**20:
                    continue
                yield bq, bkv, bd


def bwd_candidates(kernel, d_pad, seq, in_bytes=2, causal=False):
    # Forward sweeps showed the wide dimension should be the TRAVERSAL one
    # (streamed blocks amortize softmax/rescale work). bwd_q parallelizes
    # over q and streams kv; bwd_kv parallelizes over kv and streams q.
    if kernel == "backward_query":
        par_dims, trav_dims = (256, 512, 1024), (1024, 2048, 4096)
    else:
        par_dims, trav_dims = (256, 512, 1024), (1024, 2048, 4096)
    if causal:
        trav_dims = (512,) + trav_dims   # skip granularity (see fwd)
    for par in par_dims:
        for trav in trav_dims:
            bq, bkv = (par, trav) if kernel == "backward_query" else (trav, par)
            if bkv > seq or bq > seq:
                continue
            bd_opts = {min(128, d_pad), d_pad}
            if d_pad > 256 and d_pad % 256 == 0:
                bd_opts.add(256)
            for bd in sorted(bd_opts):
                if d_pad % bd:
                    continue
                # Row grouping keeps only the live 256-row group's S/dP/dS
                # tiles in VMEM (flash_bwd.py qg logic), so live tile rows
                # are min(256, traversal-group rows), ~2 groups in flight.
                live = min(512, bq if kernel == "backward_query" else bq)
                s_bytes = live * bkv * 4 * 2
                kv_bytes = 2 * 2 * bkv * d_pad * in_bytes
                accs = 2 * max(bq, bkv) * d_pad * 4
                if s_bytes + kv_bytes + accs > 15.2 * 2**20:
                    continue
                yield bq, bkv, bd


def run_one(kernel, head_dim, seq, heads, bq, bkv, bd, gen, dtype=jnp.bfloat16,
            causal=False):
    rng = np.random.default_rng(0)
    d_pad = round_up(head_dim, 128)
    mk = lambda shp: jnp.asarray(rng.standard_normal(shp), dtype)
    flops = attention_flops(kernel, seq, seq, head_dim, batch_heads=heads,
                            causal=causal)

    desc = AttentionDescriptor(
        batch=1, num_q_heads=heads, num_kv_heads=heads,
        seq_len_q=seq, seq_len_kv=seq, head_dim=head_dim, causal=causal,
        low_precision_inputs=dtype != jnp.float32,
    )
    ktype = {"forward": AttentionKernelType.FORWARD,
             "backward_query": AttentionKernelType.BACKWARD_QUERY,
             "backward_key_value": AttentionKernelType.BACKWARD_KEY_VALUE}[kernel]
    kd = dataclasses.replace(
        desc.kernel_descriptor(ktype, gen),
        block_q=min(bq, seq), block_kv=min(bkv, seq), block_d=bd)

    if kernel == "forward":
        q, k, v = mk((heads, seq, d_pad)), mk((heads, seq, d_pad)), mk((heads, seq, d_pad))
        fn = flash_fwd.build_fwd(
            kd, batch_heads=heads, kv_batch_heads=heads,
            seq_len_q=seq, seq_len_kv=seq, d_pad=d_pad,
            scale=desc.softmax_scale, q_dtype=dtype, kv_dtype=dtype,
            o_dtype=dtype)
        step = lambda x: fn(x, k, v)[0].astype(dtype)
        init = q
    elif kernel == "backward_query":
        q, k, v = mk((heads, seq, d_pad)), mk((heads, seq, d_pad)), mk((heads, seq, d_pad))
        o, do = mk((heads, seq, d_pad)), mk((heads, seq, d_pad))
        lse = jnp.zeros((heads, seq, flash_fwd.LANES), jnp.float32) + float(np.log(seq))
        fn = flash_bwd.build_bwd_query(
            kd, batch_heads=heads, kv_batch_heads=heads,
            seq_len_q=seq, seq_len_kv=seq, d_pad=d_pad,
            scale=desc.softmax_scale, q_dtype=dtype, kv_dtype=dtype)
        step = lambda x: fn(x, k, v, o, do, lse)[0].astype(dtype)
        init = q
    else:
        q = mk((heads, seq, d_pad))
        k, v = mk((heads, seq, d_pad)), mk((heads, seq, d_pad))
        do = mk((heads, seq, d_pad))
        lse = jnp.zeros((heads, seq, flash_fwd.LANES), jnp.float32) + float(np.log(seq))
        dterm = jnp.zeros_like(lse)
        fn = flash_bwd.build_bwd_key_value(
            kd, batch_heads=heads, kv_batch_heads=heads,
            seq_len_q=seq, seq_len_kv=seq, d_pad=d_pad,
            scale=desc.softmax_scale, q_dtype=dtype, kv_dtype=dtype)

        def step(kv_pair, fn=fn):
            dk, dv = fn(q, kv_pair[0], kv_pair[1], do, lse, dterm)
            return (dk.astype(dtype), dv.astype(dtype))

        init = (k, v)

    res = measure_chained(step, init, flops, 0, generation=gen,
                          trials=3, n_small=2, n_big=10)
    return res


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--kernel", default="all")
    ap.add_argument("--d", type=int, nargs="+", default=[64, 128, 256])
    ap.add_argument("--n", type=int, default=4096)
    ap.add_argument("--heads", type=int, default=8)
    ap.add_argument("--dtype", default="bf16", choices=["bf16", "fp32"])
    ap.add_argument("--causal", action="store_true",
                    help="sweep the causal kernels (block-skip + band "
                         "masking); FLOPs counted on the ~N²/2 visible area")
    ap.add_argument("--blocks", default=None,
                    help="bq,bkv,bd — measure only this candidate (used for "
                         "hardware-validating a table row at a new N, e.g. "
                         "the D=256 N=8192 config-3 check)")
    args = ap.parse_args()
    dtype = jnp.bfloat16 if args.dtype == "bf16" else jnp.float32

    gen = params_mod.detect_generation()
    print(f"# generation {gen.name}, peak {gen.bf16_tflops} TFLOP/s", flush=True)
    kernels = (["forward", "backward_query", "backward_key_value"]
               if args.kernel == "all" else [args.kernel])
    done = load_done()

    if args.blocks:
        # An explicit candidate targets ONE (kernel, D): validate up front
        # instead of silently generating error rows across a product loop.
        if args.kernel == "all" or len(args.d) != 1:
            ap.error("--blocks requires a single --kernel and a single --d")
        parts = args.blocks.split(",")
        if len(parts) != 3:
            ap.error("--blocks must be bq,bkv,bd")
        ebq, ebkv, ebd = (int(x) for x in parts)
        epad = round_up(args.d[0], 128)
        if ebd <= 0 or epad % ebd:
            ap.error(f"--blocks bd={ebd} must divide d_pad={epad}")

    for kernel in kernels:
        for head_dim in args.d:
            d_pad = round_up(head_dim, 128)
            ib = 2 if args.dtype == "bf16" else 4
            if args.blocks:
                cands = [(ebq, ebkv, ebd)]
            else:
                cands = (fwd_candidates(d_pad, args.n, ib, args.causal)
                         if kernel == "forward"
                         else bwd_candidates(kernel, d_pad, args.n, ib,
                                             args.causal))
            best = (0.0, None)
            for bq, bkv, bd in cands:
                if (args.dtype == "fp32" and not args.blocks
                        and (bq > 512 or bkv > 2048)):
                    continue   # fp32 tiles are 2x; keep the auto grid modest
                key = (kernel, head_dim, args.n, bq, bkv, bd, args.dtype,
                       args.causal)
                if key in done:
                    rec = done[key]
                    if rec.get("tflops", 0) > best[0]:
                        best = (rec["tflops"], key)
                    print(f"  [cached] {key} {rec.get('tflops')}", flush=True)
                    continue
                t0 = time.time()
                try:
                    res = run_one(kernel, head_dim, args.n, args.heads,
                                  bq, bkv, bd, gen, dtype, args.causal)
                    if res.tflops > gen.bf16_tflops * 1.05:   # noise guard
                        res = run_one(kernel, head_dim, args.n, args.heads,
                                      bq, bkv, bd, gen, dtype, args.causal)
                    rec = {"kernel": kernel, "d": head_dim, "n": args.n,
                           "dtype": args.dtype, "causal": args.causal,
                           "bq": bq, "bkv": bkv, "bd": bd,
                           "tflops": round(res.tflops, 2),
                           "util": round(res.compute_bound_utilization, 4),
                           "latency_us": round(res.latency_s * 1e6, 1),
                           "wall_s": round(time.time() - t0, 1)}
                except Exception as e:  # noqa: BLE001
                    rec = {"kernel": kernel, "d": head_dim, "n": args.n,
                           "dtype": args.dtype, "causal": args.causal,
                           "bq": bq, "bkv": bkv, "bd": bd,
                           "error": f"{type(e).__name__}: {e}"[:200],
                           "wall_s": round(time.time() - t0, 1)}
                record(rec)
                print(f"  {kernel} D={head_dim} bq={bq} bkv={bkv} bd={bd}: "
                      f"{rec.get('tflops', rec.get('error'))} "
                      f"({rec['wall_s']}s)", flush=True)
                if rec.get("tflops", 0) > best[0]:
                    best = (rec["tflops"], key)
            print(f"# BEST {kernel} D={head_dim}: {best}", flush=True)


if __name__ == "__main__":
    main()
