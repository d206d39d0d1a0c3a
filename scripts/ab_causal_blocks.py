#!/usr/bin/env python
"""Causal fwd block-shape sweep under the tablegrid schedule (round 4).

The round-3/4 causal gap decomposes as: dead grid steps (~0, the index-map
clamp + pl.when already elide them — falsified by the tablegrid A/B),
diagonal-block over-compute (~1 + bkv/N extra area), and mask VPU work.
With the compressed grid, SMALLER traversal blocks no longer add dead-step
cost — only more (all-live) grid steps — so the over-compute lever can be
pulled harder than blockskip allowed.

    PYTHONPATH=/root/repo python scripts/ab_causal_blocks.py
"""

import argparse
import dataclasses
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from mfa_tpu.kernels import flash_fwd
from mfa_tpu.ops.descriptors import (AttentionDescriptor,
                                     AttentionKernelType, round_up)
from mfa_tpu.ops.params import detect_generation
from mfa_tpu.utils.roofline import attention_flops, measure_chained


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--d", type=int, default=128)
    ap.add_argument("--n", type=int, default=4096)
    ap.add_argument("--heads", type=int, default=8)
    args = ap.parse_args()

    gen = detect_generation()
    n, h, d = args.n, args.heads, args.d
    rng = np.random.default_rng(0)
    mk = lambda: jnp.asarray(rng.standard_normal((h, n, d)), jnp.bfloat16)
    q3, k3, v3 = mk(), mk(), mk()
    d_pad = round_up(d, 128)
    if d < d_pad:
        pad = ((0, 0), (0, 0), (0, d_pad - d))
        q3, k3, v3 = (jnp.pad(x, pad) for x in (q3, k3, v3))

    desc = AttentionDescriptor(
        batch=1, num_q_heads=h, num_kv_heads=h, seq_len_q=n, seq_len_kv=n,
        head_dim=d, causal=True, low_precision_inputs=True)
    kd0 = desc.kernel_descriptor(AttentionKernelType.FORWARD, gen)
    flops = attention_flops("forward", n, n, d, batch_heads=h, causal=True)

    configs = [
        ("blockskip", kd0.block_q, kd0.block_kv, 0),
        ("tablegrid", kd0.block_q, kd0.block_kv, 0),
        ("tablegrid", 1024, 512, 0),
        ("tablegrid", 1024, 256, 0),
        ("tablegrid", 2048, 512, 0),
        ("tablegrid", 512, 512, 0),
        ("tablegrid", 1024, 512, 256),
        ("tablegrid", 2048, 256, 0),
    ]
    print(f"# causal fwd D={d} N={n} H={h} on {gen.name} "
          f"(peak {gen.bf16_tflops} TF/s)", flush=True)
    for mode, bq, bkv, qg in configs:
        kd = dataclasses.replace(kd0, causal_mode=mode, block_q=bq,
                                 block_kv=bkv, block_q_inner=qg)
        try:
            fn = flash_fwd.build_fwd(
                kd, batch_heads=h, kv_batch_heads=h, seq_len_q=n,
                seq_len_kv=n, d_pad=d_pad, scale=desc.softmax_scale,
                q_dtype=jnp.bfloat16, kv_dtype=jnp.bfloat16,
                o_dtype=jnp.bfloat16, interpret=False)

            def step(x, fn=fn):
                o, _ = fn(x, k3, v3)
                return o.astype(jnp.bfloat16)

            res = measure_chained(step, q3, flops, 0, generation=gen)
            print(f"  {mode:10s} bq={bq:5d} bkv={bkv:5d} qg={qg:4d}  "
                  f"{res.tflops:7.1f} TF/s  util "
                  f"{res.compute_bound_utilization:6.3f}", flush=True)
        except Exception as e:
            print(f"  {mode:10s} bq={bq:5d} bkv={bkv:5d} qg={qg:4d}  "
                  f"FAIL {str(e).splitlines()[0][:90]}", flush=True)


if __name__ == "__main__":
    main()
