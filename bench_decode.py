#!/usr/bin/env python
"""Decode throughput benchmark: Llama-3-8B shapes, INT8 weights + FP8 KV.

The second headline metric of BASELINE.json ("decode tokens/s/chip with FP8
KV at 8B"). Random weights (numerics are covered by the test suite; this
measures the serving step): batch of slots decodes in lockstep through
jitted scan, timed with the chained protocol.

Usage: python bench_decode.py [--layers N] [--batch B] [--ctx T]
(defaults to the full 32-layer 8B config; --layers 4 for a quick smoke).
Prints one JSON line like bench.py.
"""

import argparse
import json
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--layers", type=int, default=32)
    ap.add_argument("--batch", type=int, default=8)
    ap.add_argument("--ctx", type=int, default=2048)
    ap.add_argument("--steps", type=int, default=32)
    ap.add_argument("--wbits", type=int, default=8, choices=[8, 4],
                    help="weight-only quantization width (8 = headline; "
                         "4 = BASELINE config 5, INT4 weights + FP8 KV)")
    ap.add_argument("--kv", default="fp8", choices=["fp8", "int8", "bf16"],
                    help="KV-cache storage (fp8 = headline metric; int8 = "
                         "the v5e fast path — native s8 MXU, no VPU "
                         "dequant; see MEASUREMENTS.md round 3)")
    args = ap.parse_args()

    from mfa_tpu.models import llama
    from mfa_tpu.ops.precision import OperandPrecision
    from mfa_tpu.ops.params import detect_generation

    gen = detect_generation()
    cfg = llama.LlamaConfig(n_layers=args.layers)  # 8B dims, layer-scalable
    wprec = (OperandPrecision.INT8 if args.wbits == 8
             else OperandPrecision.INT4)
    print(f"# {args.layers} layers, batch {args.batch}, ctx {args.ctx}, "
          f"INT{args.wbits} weights + {args.kv.upper()} KV on {gen.name}",
          file=sys.stderr)

    t0 = time.time()
    # Fused init+quantize: the two-step init_params -> quantize_params peaks
    # at ~2x the bf16 model and OOMs one v5e chip at 8B scale.
    params = llama.init_params_quantized(jax.random.key(0), cfg, wprec,
                                         jnp.bfloat16)
    kv_prec = {"fp8": OperandPrecision.FP8_E4M3,
               "int8": OperandPrecision.INT8,
               "bf16": OperandPrecision.BF16}[args.kv]
    caches = llama.make_caches(cfg, args.batch, args.ctx + args.steps + 8,
                               kv_prec)
    # Fill the context with random KV directly (prefill path measured
    # elsewhere; decode reads the cache regardless of how it was written).
    rng = np.random.default_rng(0)
    from mfa_tpu.serving import kv_cache as kvm
    filled = []
    for c in caches:
        k = jnp.asarray(rng.standard_normal(
            (args.batch, cfg.n_kv_heads, args.ctx, cfg.head_dim)) * 0.3,
            jnp.bfloat16)
        filled.append(kvm.update(c, k, k))
    caches = filled
    tokens = jnp.asarray(rng.integers(0, cfg.vocab_size, (args.batch,)),
                         jnp.int32)
    print(f"# setup {time.time()-t0:.0f}s", file=sys.stderr)

    # params travels as an ARGUMENT: closing over it captures ~9 GB of
    # weights as jit constants, which the lowering then ships through the
    # AOT compile path (round-3 post-mortem — the tunnel compile choked).
    def many_steps(params, tokens, caches, n):
        def body(carry, _):
            tok, caches = carry
            logits, caches = llama.decode_step(params, cfg, tok, caches,
                                               interpret=False)
            tok = jnp.argmax(logits, -1).astype(jnp.int32)
            return (tok, caches), None

        (tok, caches), _ = jax.lax.scan(body, (tokens, caches), None,
                                        length=n)
        return tok, caches

    # Donate the caches: without donation the loop's output caches are a
    # SECOND full-size allocation (4.4 GB at 8B), which pushes total HBM
    # past 16 GB and makes XLA spill through the host tunnel — the round-3
    # 6-tok/s post-mortem (L=4 fits and ran at 0.4 util; L=32 didn't fit
    # and ran 100x slower).
    loop = jax.jit(many_steps, static_argnums=3, donate_argnums=(2,))

    def sync(x):
        np.asarray(jax.tree_util.tree_leaves(x)[0].reshape(-1)[:1])

    t0 = time.time()
    tok_out, caches = loop(params, tokens, caches, 4)
    sync((tok_out, caches))
    print(f"# compile {time.time()-t0:.0f}s", file=sys.stderr)

    # Differential: n_small vs n_big decode steps, median of trials.
    slopes = []
    for _ in range(3):
        t0 = time.perf_counter()
        tok_out, caches = loop(params, tokens, caches, 4)
        sync((tok_out, caches))
        t_small = time.perf_counter() - t0
        t0 = time.perf_counter()
        tok_out, caches = loop(params, tokens, caches, args.steps)
        sync((tok_out, caches))
        t_big = time.perf_counter() - t0
        slopes.append((t_big - t_small) / (args.steps - 4))
    slopes.sort()
    step_latency = slopes[len(slopes) // 2]
    tok_s = args.batch / step_latency

    # Speed-of-light: decode streams all KV + all weights once per step.
    kv_itemsize = 2 if args.kv == "bf16" else 1
    kv_bytes = (2 * args.layers * args.batch * cfg.n_kv_heads
                * args.ctx * 128 * kv_itemsize)   # KV stream (d_pad=128)
    w_bytes = sum(np.asarray(w).nbytes for w in
                  jax.tree_util.tree_leaves(params))
    sol = (kv_bytes + w_bytes) / (gen.hbm_gbps * 1e9)
    print(f"# step {step_latency*1e3:.2f} ms | {tok_s:.0f} tok/s | "
          f"SoL(step) {sol*1e3:.2f} ms | util {sol/step_latency:.3f}",
          file=sys.stderr)
    rec = {
        "metric": f"decode_tok_s_chip(8B-int{args.wbits}w-{args.kv}kv,"
                  f"B={args.batch},ctx={args.ctx},L={args.layers})",
        "value": round(tok_s, 1),
        "unit": "tokens/s",
        "vs_baseline": round(sol / step_latency, 4),
    }
    print(json.dumps(rec))
    # Persist for bench.py to embed next to the fwd headline (full-config
    # runs only — smoke runs with reduced layers are not the headline;
    # the INT8-weight config is the headline metric).
    if (args.layers == 32 and args.wbits == 8 and args.kv == "fp8"
            and args.batch == 8):
        import os
        path = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                            "docs", "sweeps", "decode_headline.json")
        with open(path, "w") as f:
            json.dump(rec, f)


if __name__ == "__main__":
    main()
