#!/usr/bin/env python
"""Decompose the decode-attention wrapper overhead (round-3 finding: kernel
direct 141 us/layer vs 238 us through the public wrapper at 8B shapes).
Times, with the chained protocol:

  1. kernel direct          — pre-shaped [bh, L, D] args, cached pallas fn
  2. public wrapper         — ops.decode.decode_attention (reshape/pad/scale)
  3. wrapper + cache update — the full per-layer attention cost in decode_step
  4. kernel, bf16 cache     — stream-size control (2x bytes, no dequant)

    PYTHONPATH=/root/repo python scripts/profile_decode_attn.py --kv fp8
"""

import argparse
import functools
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from mfa_tpu.kernels import decode as decode_kernel
from mfa_tpu.ops.decode import decode_attention, _choose_block_kv
from mfa_tpu.ops.descriptors import round_up
from mfa_tpu.ops.params import detect_generation
from mfa_tpu.ops.precision import OperandPrecision
from mfa_tpu.serving import kv_cache as kvm
from mfa_tpu.utils.roofline import measure_chained


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=8)
    ap.add_argument("--hq", type=int, default=32)
    ap.add_argument("--hkv", type=int, default=8)
    ap.add_argument("--d", type=int, default=128)
    ap.add_argument("--ctx", type=int, default=2048)
    ap.add_argument("--kv", default="fp8", choices=["fp8", "int8", "bf16"])
    ap.add_argument("--layers", type=int, default=8,
                    help="distinct caches chained per iteration (amortizes "
                         "the per-iteration state feed)")
    args = ap.parse_args()

    gen = detect_generation()
    prec = {"fp8": OperandPrecision.FP8_E4M3,
            "int8": OperandPrecision.INT8,
            "bf16": OperandPrecision.BF16}[args.kv]
    max_len = round_up(args.ctx + 64, 128)
    rng = np.random.default_rng(0)

    caches = []
    for _ in range(args.layers):
        c = kvm.create(args.batch, args.hkv, max_len, args.d, prec)
        k = jnp.asarray(rng.standard_normal(
            (args.batch, args.hkv, args.ctx, args.d)) * 0.3, jnp.bfloat16)
        caches.append(kvm.update(c, k, k))
    q0 = jnp.asarray(rng.standard_normal(
        (args.batch, args.hq, args.d)), jnp.bfloat16)

    c0 = caches[0]
    bh = args.batch * args.hkv
    d_pad = c0.head_dim_padded
    group = args.hq // args.hkv
    kv_itemsize = jnp.dtype(c0.k.dtype).itemsize
    kv_bytes_layer = 2 * bh * max_len * d_pad * kv_itemsize
    scale_bytes_layer = (0 if not c0.quantized
                         else 2 * bh * max_len * 4)
    hbm = gen.hbm_gbps * 1e9

    def report(name, res, sol_bytes):
        sol = sol_bytes / hbm
        per_layer = res.latency_s / args.layers
        print(f"  {name:26s} {per_layer*1e6:8.1f} us/layer | SoL "
              f"{sol/args.layers*1e6:7.1f} us | util {sol/res.latency_s:6.3f}",
              flush=True)

    # --- 1. kernel direct: pre-shaped args, one cached pallas fn ---
    block_kv = _choose_block_kv(max_len, d_pad, kv_itemsize)
    fn = decode_kernel.build_decode(
        batch=args.batch, num_kv_heads=args.hkv, group=group,
        max_len=round_up(max_len, block_kv), d_pad=d_pad, block_kv=block_kv,
        kv_dtype=c0.k.dtype, q_dtype=jnp.bfloat16, o_dtype=jnp.bfloat16,
        quantized=c0.quantized, interpret=False)

    pre = []
    for c in caches:
        pre.append((c.lengths,
                    c.k.reshape(bh, max_len, d_pad),
                    c.v.reshape(bh, max_len, d_pad),
                    c.k_scale.reshape(bh, 1, max_len),
                    c.v_scale.reshape(bh, 1, max_len)))
    q3 = q0.reshape(args.batch, args.hkv, group, d_pad).reshape(bh, group, d_pad)

    def direct_step(carry):
        pre_, q = carry
        for (lengths, k3, v3, ks3, vs3) in pre_:
            q = fn(lengths, q, k3, v3, ks3, vs3).astype(jnp.bfloat16)
        return (pre_, q)

    res = measure_chained(direct_step, (pre, q3), 1, 0, generation=gen)
    report("kernel direct", res,
           args.layers * (kv_bytes_layer + scale_bytes_layer))

    # --- 2. public wrapper ---
    def wrap_step(carry):
        caches_, o = carry
        for c in caches_:
            o = decode_attention(o, c, interpret=False).astype(jnp.bfloat16)
        return (caches_, o)

    res = measure_chained(wrap_step, (caches, q0), 1, 0, generation=gen)
    report("public wrapper", res,
           args.layers * (kv_bytes_layer + scale_bytes_layer))

    # --- 3. wrapper + per-layer cache update (decode_step's attention) ---
    k1 = jnp.asarray(rng.standard_normal(
        (args.batch, args.hkv, 1, args.d)) * 0.3, jnp.bfloat16)

    def full_step(carry):
        caches_, o, k = carry
        new = []
        for c in caches_:
            c = kvm.update(c, k, k)
            new.append(c)
            o = decode_attention(o, c, interpret=False).astype(jnp.bfloat16)
        return (new, o, k)

    res = measure_chained(full_step, (caches, q0, k1), 1, 0, generation=gen)
    report("wrapper + cache update", res,
           args.layers * (kv_bytes_layer + scale_bytes_layer))

    # --- 4. update only ---
    def upd_step(carry):
        caches_, k = carry
        return ([kvm.update(c, k, k) for c in caches_], k)

    res = measure_chained(upd_step, (caches, k1), 1, 0, generation=gen)
    report("cache update only", res, args.layers * bh * 2 * d_pad)


if __name__ == "__main__":
    main()
