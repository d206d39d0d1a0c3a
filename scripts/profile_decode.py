#!/usr/bin/env python
"""Decompose the decode step's 100x roofline miss (round-3 post-mortem:
6 tok/s vs ~800 SoL at 8B). Times each component of one decode step in
isolation with the chained protocol, at a reduced layer count so compiles
stay cheap, and prints a ledger vs each component's own speed-of-light.

    PYTHONPATH=/root/repo:/root/.axon_site python scripts/profile_decode.py
"""

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from mfa_tpu.models import llama
from mfa_tpu.ops.params import detect_generation
from mfa_tpu.ops.precision import OperandPrecision
from mfa_tpu.serving import kv_cache as kvm
from mfa_tpu.utils.roofline import measure_chained


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--layers", type=int, default=4)
    ap.add_argument("--batch", type=int, default=8)
    ap.add_argument("--ctx", type=int, default=2048)
    args = ap.parse_args()

    gen = detect_generation()
    cfg = llama.LlamaConfig(n_layers=args.layers)
    print(f"# {args.layers} layers, batch {args.batch}, ctx {args.ctx} "
          f"on {gen.name} ({gen.hbm_gbps} GB/s HBM)", flush=True)

    params = llama.init_params_quantized(
        jax.random.key(0), cfg, OperandPrecision.INT8, jnp.bfloat16)
    caches = llama.make_caches(cfg, args.batch, args.ctx + 64,
                               OperandPrecision.FP8_E4M3)
    rng = np.random.default_rng(0)
    filled = []
    for c in caches:
        k = jnp.asarray(rng.standard_normal(
            (args.batch, cfg.n_kv_heads, args.ctx, cfg.head_dim)) * 0.3,
            jnp.bfloat16)
        filled.append(kvm.update(c, k, k))
    caches = filled
    tokens = jnp.asarray(rng.integers(0, cfg.vocab_size, (args.batch,)),
                         jnp.int32)

    w_bytes = sum(np.asarray(w).nbytes for w in
                  jax.tree_util.tree_leaves(params))
    kv_bytes = 2 * args.layers * args.batch * cfg.n_kv_heads * args.ctx * 128
    hbm = gen.hbm_gbps * 1e9

    def report(name, res, sol_bytes):
        sol = sol_bytes / hbm
        print(f"  {name:28s} {res.latency_s*1e3:8.3f} ms | SoL "
              f"{sol*1e3:7.3f} ms | util {sol/res.latency_s:6.3f}",
              flush=True)

    # --- 1. full decode step (params ride the carry: closing over them
    # captures GBs as jit constants and chokes the tunnel compile) ---
    def full_step(carry):
        params, tok, caches = carry
        logits, caches = llama.decode_step(params, cfg, tok, caches,
                                           interpret=False)
        return (params, jnp.argmax(logits, -1).astype(jnp.int32), caches)

    res = measure_chained(full_step, (params, tokens, caches), 1, 0,
                          generation=gen)
    report("full decode step", res, w_bytes + kv_bytes)

    # --- 2. dense-side only (projections + MLP + head; no attn/cache) ---
    x0 = jnp.asarray(rng.standard_normal((args.batch, 1, cfg.dim)),
                     jnp.bfloat16)

    def dense_step(carry):
        params, x = carry
        for layer in params["layers"]:
            h = llama.rms_norm(x, layer["attn_norm"], cfg.norm_eps)
            q, k, v = llama._project_qkv(layer, h, cfg, jnp.bfloat16)
            o = q[:, :, 0, :].reshape(args.batch, 1, -1)
            x = x + llama._matmul(o, layer["wo"], jnp.bfloat16)
            h = llama.rms_norm(x, layer["mlp_norm"], cfg.norm_eps)
            x = x + llama._mlp(layer, h, jnp.bfloat16)
        return (params, x)

    res = measure_chained(dense_step, (params, x0), 1, 0, generation=gen)
    report("projections+MLP only", res, w_bytes)

    # --- 3. decode attention only (all layers' caches) ---
    from mfa_tpu.ops.decode import decode_attention

    q0 = jnp.asarray(rng.standard_normal(
        (args.batch, cfg.n_heads, cfg.head_dim)), jnp.bfloat16)

    def attn_step(carry):
        caches_, o = carry
        for c in caches_:
            o = decode_attention(o, c, interpret=False)
        return (caches_, o.astype(jnp.bfloat16))

    res = measure_chained(attn_step, (caches, q0), 1, 0, generation=gen)
    report("decode attention only", res, kv_bytes)

    # --- 4. cache update only (quantize + append 1 token, all layers) ---
    k1 = jnp.asarray(rng.standard_normal(
        (args.batch, cfg.n_kv_heads, 1, cfg.head_dim)), jnp.bfloat16)

    def upd_step(carry):
        caches_, k = carry
        new = [kvm.update(c, k, k) for c in caches_]
        return (new, k)

    res = measure_chained(upd_step, (caches, k1), 1, 0, generation=gen)
    report("cache update only", res, kv_bytes * 0 + 2 * args.layers
           * args.batch * cfg.n_kv_heads * 128)

    # --- 5. lm head + embed only ---
    def head_step(carry):
        params, x = carry
        logits = llama._matmul(x[:, 0], params["lm_head"], jnp.bfloat16)
        tok = jnp.argmax(logits, -1).astype(jnp.int32)
        return (params, params["embed"][tok][:, None, :])

    res = measure_chained(head_step, (params, x0), 1, 0, generation=gen)
    report("lm_head+embed only", res,
           np.asarray(params["lm_head"]).nbytes
           + np.asarray(params["embed"]).nbytes)


if __name__ == "__main__":
    main()
