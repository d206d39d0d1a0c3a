#!/usr/bin/env python
"""A/B the tablegrid band-mask strategies on chip (round-5 VERDICT item 1).

Modes (see flash_fwd.TABLEGRID_MASK_MODE): "always" re-baselines the
round-4 kernel in the same run (noise calibration — the chained protocol
spreads +-0.03), "dual" skips mask work in interior blocks via a
block-level pl.when dual body, "dual_static" additionally folds the
diagonal blocks' mask to a constant add.

    PYTHONPATH=/root/repo python scripts/ab_mask_mode.py [--trials 2]
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

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
    ap.add_argument("--trials", type=int, default=2)
    args = ap.parse_args()

    gen = detect_generation()
    n, h, d = args.n, args.heads, args.d
    rng = np.random.default_rng(0)
    mk = lambda: jnp.asarray(rng.standard_normal((h, n, d)), jnp.bfloat16)
    q3, k3, v3 = mk(), mk(), mk()
    d_pad = round_up(d, 128)

    desc = AttentionDescriptor(
        batch=1, num_q_heads=h, num_kv_heads=h, seq_len_q=n, seq_len_kv=n,
        head_dim=d, causal=True, low_precision_inputs=True)
    kd0 = desc.kernel_descriptor(AttentionKernelType.FORWARD, gen)
    import dataclasses
    kd = dataclasses.replace(kd0, causal_mode="tablegrid")
    flops = attention_flops("forward", n, n, d, batch_heads=h, causal=True)

    print(f"# tablegrid mask-mode A/B D={d} N={n} H={h} "
          f"bq={kd.block_q} bkv={kd.block_kv} on {gen.name}", flush=True)
    for mode in ("always", "dual", "dual_static"):
        flash_fwd.TABLEGRID_MASK_MODE = mode
        fn = flash_fwd.build_fwd(
            kd, batch_heads=h, kv_batch_heads=h, seq_len_q=n,
            seq_len_kv=n, d_pad=d_pad, scale=desc.softmax_scale,
            q_dtype=jnp.bfloat16, kv_dtype=jnp.bfloat16,
            o_dtype=jnp.bfloat16, interpret=False)

        def step(x, fn=fn):
            o, _ = fn(x, k3, v3)
            return o.astype(jnp.bfloat16)

        for t in range(args.trials):
            res = measure_chained(step, q3, flops, 0, generation=gen)
            print(f"  {mode:12s} trial {t}  {res.tflops:7.1f} TF/s  util "
                  f"{res.compute_bound_utilization:6.3f}", flush=True)


if __name__ == "__main__":
    main()
