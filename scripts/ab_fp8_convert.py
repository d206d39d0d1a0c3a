#!/usr/bin/env python
"""A/B the fp8→bf16 twiddle integer domain on chip (round-5 VERDICT item
10: the 5-op i32 bit-twiddle caps the fp8 contiguous decode kernel at 0.66
of stream SoL; the u16 domain runs the same ops at 2x vector lanes).

    PYTHONPATH=/root/repo:/root/.axon_site python scripts/ab_fp8_convert.py
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax.numpy as jnp
import numpy as np

from mfa_tpu.kernels import decode as decode_kernel
from mfa_tpu.ops.decode import _choose_block_kv
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
    ap.add_argument("--layers", type=int, default=8)
    args = ap.parse_args()

    gen = detect_generation()
    max_len = round_up(args.ctx + 64, 128)
    rng = np.random.default_rng(0)

    caches = []
    for _ in range(args.layers):
        c = kvm.create(args.batch, args.hkv, max_len, args.d,
                       OperandPrecision.FP8_E4M3)
        k = jnp.asarray(rng.standard_normal(
            (args.batch, args.hkv, args.ctx, args.d)) * 0.3, jnp.bfloat16)
        caches.append(kvm.update(c, k, k))

    c0 = caches[0]
    bh = args.batch * args.hkv
    d_pad = c0.head_dim_padded
    group = args.hq // args.hkv
    kv_itemsize = jnp.dtype(c0.k.dtype).itemsize
    sol_bytes = args.layers * (2 * bh * max_len * d_pad * kv_itemsize
                               + 2 * bh * max_len * 4)
    hbm = gen.hbm_gbps * 1e9

    q0 = jnp.asarray(rng.standard_normal(
        (args.batch, args.hq, args.d)), jnp.bfloat16)
    q3 = q0.reshape(args.batch, args.hkv, group, d_pad).reshape(
        bh, group, d_pad)
    pre = [(c.lengths,
            c.k.reshape(bh, max_len, d_pad),
            c.v.reshape(bh, max_len, d_pad),
            c.k_scale.reshape(bh, 1, max_len),
            c.v_scale.reshape(bh, 1, max_len)) for c in caches]
    block_kv = _choose_block_kv(max_len, d_pad, kv_itemsize)

    ref_o = None
    for domain in ("i32", "u16"):
        decode_kernel.FP8_CONVERT_DOMAIN = domain
        try:
            fn = decode_kernel.build_decode(
                batch=args.batch, num_kv_heads=args.hkv, group=group,
                max_len=round_up(max_len, block_kv), d_pad=d_pad,
                block_kv=block_kv, kv_dtype=c0.k.dtype,
                q_dtype=jnp.bfloat16, o_dtype=jnp.bfloat16,
                quantized=c0.quantized, interpret=False)

            o = fn(pre[0][0], q3, *pre[0][1:])
            o_np = np.asarray(o, np.float32)
            if ref_o is None:
                ref_o = o_np
            else:
                err = float(np.abs(o_np - ref_o).max())
                print(f"  {domain}: maxabs vs i32 = {err:.2e}", flush=True)
                assert err < 1e-6, "domains disagree"

            def step(carry, fn=fn):
                pre_, q = carry
                for (lengths, k3, v3, ks3, vs3) in pre_:
                    q = fn(lengths, q, k3, v3, ks3, vs3).astype(jnp.bfloat16)
                return (pre_, q)

            res = measure_chained(step, (pre, q3), 1, 0, generation=gen)
            per_layer = res.latency_s / args.layers
            sol = sol_bytes / hbm / args.layers
            print(f"  {domain}: {per_layer*1e6:8.1f} us/layer | SoL "
                  f"{sol*1e6:7.1f} us | util {sol/per_layer:6.3f}",
                  flush=True)
        except Exception as e:  # noqa: BLE001
            print(f"  {domain}: FAIL {str(e).splitlines()[0][:100]}",
                  flush=True)
    decode_kernel.FP8_CONVERT_DOMAIN = "i32"


if __name__ == "__main__":
    main()
