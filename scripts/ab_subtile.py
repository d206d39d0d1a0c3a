#!/usr/bin/env python
"""A/B the forward traversal sub-tiling on chip at the headline config."""

import dataclasses
import os
import sys

import jax.numpy as jnp
import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from mfa_tpu.kernels import flash_fwd
from mfa_tpu.ops import params as params_mod
from mfa_tpu.ops.descriptors import AttentionDescriptor, AttentionKernelType
from mfa_tpu.utils.roofline import attention_flops, measure_chained


def run(bq, bkv, inner, q_inner=0, p_fp32=False,
        head_dim=128, seq=4096, heads=8):
    gen = params_mod.detect_generation()
    rng = np.random.default_rng(0)
    mk = lambda: jnp.asarray(
        rng.standard_normal((heads, seq, head_dim)), jnp.bfloat16)
    q, k, v = mk(), mk(), mk()
    flops = attention_flops("forward", seq, seq, head_dim, batch_heads=heads)
    desc = AttentionDescriptor(
        batch=1, num_q_heads=heads, num_kv_heads=heads,
        seq_len_q=seq, seq_len_kv=seq, head_dim=head_dim,
        low_precision_inputs=True)
    from mfa_tpu.ops.precision import OperandPrecision

    kd = dataclasses.replace(
        desc.kernel_descriptor(AttentionKernelType.FORWARD, gen),
        block_q=bq, block_kv=bkv, block_kv_inner=inner,
        block_q_inner=q_inner,
        p_register=(OperandPrecision.FP32 if p_fp32
                    else OperandPrecision.BF16))
    fn = flash_fwd.build_fwd(
        kd, batch_heads=heads, kv_batch_heads=heads,
        seq_len_q=seq, seq_len_kv=seq, d_pad=head_dim,
        scale=desc.softmax_scale, q_dtype=jnp.bfloat16,
        kv_dtype=jnp.bfloat16, o_dtype=jnp.bfloat16)
    res = measure_chained(lambda x: fn(x, k, v)[0].astype(jnp.bfloat16),
                          q, flops, 0, generation=gen, trials=3)
    print(f"bq={bq} bkv={bkv} inner={inner} qg={q_inner} p32={p_fp32}: "
          f"{res.tflops:.2f} TF "
          f"util={res.compute_bound_utilization:.3f} "
          f"lat={res.latency_s*1e6:.0f}us", flush=True)


if __name__ == "__main__":
    cases = [
        (512, 4096, 0, 256, False),    # best known (round-2 A/B set 1)
        (512, 4096, 0, 256, True),     # skip the P cast (fp32 P into MXU)
        (1024, 4096, 0, 256, False),   # fewer grid steps, per-group S tiles
        (2048, 2048, 0, 256, False),
    ]
    for bq, bkv, inner, qgi, p32 in cases:
        try:
            run(bq, bkv, inner, qgi, p32)
        except Exception as e:  # noqa: BLE001
            print(f"bq={bq} bkv={bkv} inner={inner} qg={qgi} p32={p32}: "
                  f"FAILED {type(e).__name__}: {str(e)[:100]}", flush=True)
