#!/usr/bin/env python
"""Paged vs contiguous decode attention on the chip (round-4 VERDICT #6:
the paged path must be benched on TPU, target within ~1.2x contiguous).

8B decode shapes: B=8 Hkv=8 group=4 d=128, ctx 2048. Appends a JSON
record to docs/sweeps/paged_bench.jsonl.

    PYTHONPATH=/root/repo python scripts/bench_paged.py --kv fp8
"""

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from mfa_tpu.ops.decode import decode_attention, paged_decode_attention
from mfa_tpu.ops.params import detect_generation
from mfa_tpu.ops.precision import OperandPrecision
from mfa_tpu.serving import kv_cache as kvm
from mfa_tpu.serving.paged_kv_cache import PagedKVCache
from mfa_tpu.utils.roofline import measure_chained

OUT = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                   "docs", "sweeps", "paged_bench.jsonl")


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=8)
    ap.add_argument("--hq", type=int, default=32)
    ap.add_argument("--hkv", type=int, default=8)
    ap.add_argument("--d", type=int, default=128)
    ap.add_argument("--ctx", type=int, default=2048)
    ap.add_argument("--kv", default="fp8", choices=["fp8", "int8", "bf16"])
    ap.add_argument("--layers", type=int, default=8,
                    help="distinct caches chained per iteration")
    ap.add_argument("--page", type=int, default=128,
                    help="page size in tokens (multiple of 128)")
    args = ap.parse_args()

    gen = detect_generation()
    prec = {"fp8": OperandPrecision.FP8_E4M3,
            "int8": OperandPrecision.INT8,
            "bf16": OperandPrecision.BF16}[args.kv]
    rng = np.random.default_rng(0)
    itemsize = 2 if args.kv == "bf16" else 1
    hbm = gen.hbm_gbps * 1e9

    # Contiguous caches.
    contig = []
    for _ in range(args.layers):
        c = kvm.create(args.batch, args.hkv, args.ctx + 64, args.d, prec)
        k = jnp.asarray(rng.standard_normal(
            (args.batch, args.hkv, args.ctx, args.d)) * 0.3, jnp.bfloat16)
        contig.append(kvm.update(c, k, k))

    # Paged caches: pool sized for the batch, prompts spliced per sequence.
    paged = []
    for _ in range(args.layers):
        pc = PagedKVCache(
            args.batch * ((args.ctx + 64) // args.page + 1) + 1,
            args.hkv, args.d, args.batch, args.ctx + 64, prec,
            page_size=args.page)
        for s in range(args.batch):
            k = jnp.asarray(rng.standard_normal(
                (args.hkv, args.ctx, args.d)) * 0.3, jnp.bfloat16)
            pc.splice_prefill(s, k, k)
        paged.append(pc)

    q0 = jnp.asarray(rng.standard_normal(
        (args.batch, args.hq, args.d)), jnp.bfloat16)

    live_rows = args.batch * args.hkv * args.ctx
    kv_bytes = 2 * live_rows * 128 * itemsize * args.layers
    sol = kv_bytes / hbm

    def report(name, res):
        per = res.latency_s / args.layers
        print(f"  {name:12s} {per*1e6:8.1f} us/layer | SoL "
              f"{sol/args.layers*1e6:7.1f} us | util {sol/res.latency_s:6.3f}",
              flush=True)
        return per

    def contig_step(carry):
        caches, o = carry
        for c in caches:
            o = decode_attention(o, c).astype(jnp.bfloat16)
        return (caches, o)

    res_c = measure_chained(contig_step, (contig, q0), 1, 0, generation=gen)
    t_c = report("contiguous", res_c)

    # Paged path: tables/lengths/pools ride the jit carry; max_pages is
    # STATIC metadata and must stay out of it (a carried int becomes a
    # tracer and would poison the dispatch cache key).
    views = [(jnp.asarray(pc.page_tables),
              jnp.asarray(pc.lengths, jnp.int32), pc.pool)
             for pc in paged]
    max_pages_static = [pc.max_pages for pc in paged]

    class V:
        def __init__(self, pool, max_pages, t, ln):
            self.pool, self.max_pages = pool, max_pages
            self._t, self._l = t, ln

        def device_tables(self):
            return self._t, self._l

    def paged_step(carry):
        views_, o = carry
        for li, (t, ln, pool) in enumerate(views_):
            o = paged_decode_attention(
                o, V(pool, max_pages_static[li], t, ln)).astype(jnp.bfloat16)
        return (views_, o)

    res_p = measure_chained(paged_step, (views, q0), 1, 0, generation=gen)
    t_p = report("paged", res_p)

    ratio = t_p / t_c
    print(f"  paged / contiguous latency = {ratio:.3f}x", flush=True)
    rec = {"kv": args.kv, "batch": args.batch, "hkv": args.hkv,
           "ctx": args.ctx, "d": args.d, "page": args.page,
           "contig_us_layer": round(t_c * 1e6, 1),
           "paged_us_layer": round(t_p * 1e6, 1),
           "ratio": round(ratio, 3),
           "contig_util": round(sol / res_c.latency_s, 3),
           "paged_util": round(sol / res_p.latency_s, 3)}
    with open(OUT, "a") as f:
        f.write(json.dumps(rec) + "\n")
    print(json.dumps(rec))


if __name__ == "__main__":
    main()
