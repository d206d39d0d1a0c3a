#!/usr/bin/env python
"""A/B the decode-step cache append (round-4: measured 93-104 us/layer at
8B shapes — ~2x the whole attention kernel after the scale-layout fix).

Variants:
  a. vmap(dynamic_update_slice) over batch  — lowers to scatter (current)
  b. unrolled per-batch DUS                 — B real DUS ops, in-place
  c. unrolled DUS for K/V + where-mask for scales (lane-dim DUS suspect)

    PYTHONPATH=/root/repo python scripts/ab_cache_update.py
"""

import argparse
import os
import sys
from dataclasses import replace

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from mfa_tpu.ops.params import detect_generation
from mfa_tpu.ops.precision import OperandPrecision
from mfa_tpu.serving import kv_cache as kvm
from mfa_tpu.utils.roofline import measure_chained


def update_unrolled(cache, k_new, v_new, scale_mode="dus"):
    b, hkv, t, d = k_new.shape
    d_pad = cache.head_dim_padded
    if d < d_pad:
        pad = ((0, 0), (0, 0), (0, 0), (0, d_pad - d))
        k_new = jnp.pad(k_new, pad)
        v_new = jnp.pad(v_new, pad)
    kq, ks = kvm._quantize_for(cache.precision, k_new)
    vq, vs = kvm._quantize_for(cache.precision, v_new)
    ks = jnp.swapaxes(ks, -1, -2)
    vs = jnp.swapaxes(vs, -1, -2)

    k, v = cache.k, cache.v
    ksb, vsb = cache.k_scale, cache.v_scale
    for i in range(b):
        st = cache.lengths[i]
        k = jax.lax.dynamic_update_slice(k, kq[i:i+1], (i, 0, st, 0))
        v = jax.lax.dynamic_update_slice(v, vq[i:i+1], (i, 0, st, 0))
        if scale_mode == "dus":
            ksb = jax.lax.dynamic_update_slice(ksb, ks[i:i+1], (i, 0, 0, st))
            vsb = jax.lax.dynamic_update_slice(vsb, vs[i:i+1], (i, 0, 0, st))
    if scale_mode == "mask":
        L = cache.max_len
        pos = jax.lax.broadcasted_iota(jnp.int32, (1, 1, 1, L), 3)
        live = pos == cache.lengths[:, None, None, None]
        ksb = jnp.where(live, ks, ksb)
        vsb = jnp.where(live, vs, vsb)
    return replace(cache, k=k, v=v, k_scale=ksb, v_scale=vsb,
                   lengths=cache.lengths + t)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=8)
    ap.add_argument("--hkv", type=int, default=8)
    ap.add_argument("--ctx", type=int, default=2048)
    ap.add_argument("--kv", default="fp8", choices=["fp8", "int8", "bf16"])
    ap.add_argument("--layers", type=int, default=8)
    args = ap.parse_args()

    gen = detect_generation()
    prec = {"fp8": OperandPrecision.FP8_E4M3,
            "int8": OperandPrecision.INT8,
            "bf16": OperandPrecision.BF16}[args.kv]
    rng = np.random.default_rng(0)
    caches = []
    for _ in range(args.layers):
        c = kvm.create(args.batch, args.hkv, args.ctx + 64, 128, prec)
        k = jnp.asarray(rng.standard_normal(
            (args.batch, args.hkv, args.ctx, 128)) * 0.3, jnp.bfloat16)
        caches.append(kvm.update(c, k, k))
    k1 = jnp.asarray(rng.standard_normal(
        (args.batch, args.hkv, 1, 128)) * 0.3, jnp.bfloat16)

    def report(name, res):
        print(f"  {name:22s} {res.latency_s/args.layers*1e6:8.1f} us/layer",
              flush=True)

    def run(fn, name):
        def step(carry):
            caches_, k = carry
            return ([fn(c, k, k) for c in caches_], k)
        res = measure_chained(step, (caches, k1), 1, 0, generation=gen)
        report(name, res)

    run(kvm.update, "a. vmap-DUS (scatter)")
    run(lambda c, k, v: update_unrolled(c, k, v, "dus"), "b. unrolled DUS")
    run(lambda c, k, v: update_unrolled(c, k, v, "mask"),
        "c. unrolled + mask-scales")

    # correctness cross-check
    a = kvm.update(caches[0], k1, k1)
    bvar = update_unrolled(caches[0], k1, k1, "dus")
    cvar = update_unrolled(caches[0], k1, k1, "mask")
    for name, x in [("b", bvar), ("c", cvar)]:
        for f in ("k", "v", "k_scale", "v_scale"):
            da = np.asarray(getattr(a, f).astype(jnp.float32))
            db = np.asarray(getattr(x, f).astype(jnp.float32))
            assert np.array_equal(da, db), (name, f)
    print("  variants bit-identical to vmap-DUS")


if __name__ == "__main__":
    main()
