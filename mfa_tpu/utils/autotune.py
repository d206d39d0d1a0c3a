"""Autotune harness: regenerate parameter-table rows by measurement.

The TPU analogue of the reference's runtime autotuning — when
``preferAsyncStore == nil`` it compiles 4 candidate kernels and picks by
occupancy (GEMMDescriptor+PipelineCache.swift:75-119; C++
GEMMShaderCache.cpp:75-160). Here: enumerate (block_q, block_kv, block_d)
candidates that fit the VMEM budget, build each forward/backward kernel,
measure with the differential-timing protocol, and emit the winning row in
the parameter-table mini-DSL so it can be pasted into ops/params.py.

Run on a real chip:  python -m mfa_tpu.utils.autotune [--d 128] [--n 4096]
"""

from __future__ import annotations

import dataclasses
import itertools

import jax
import jax.numpy as jnp
import numpy as np

from mfa_tpu.kernels import flash_bwd, flash_fwd
from mfa_tpu.ops import params as params_mod
from mfa_tpu.ops.descriptors import (
    AttentionDescriptor,
    AttentionKernelType,
    round_up,
)
from mfa_tpu.utils.roofline import attention_flops, measure, measure_chained


def candidate_rows(head_dim: int, in_bytes: float, kernel_type: str,
                   generation: params_mod.TpuGeneration,
                   bq_set=(256, 512, 1024, 2048),
                   bkv_set=(512, 1024, 2048)):
    """Enumerate block candidates fitting the VMEM budget (~70%)."""
    d_pad = round_up(head_dim, 128)
    for bq, bkv in itertools.product(bq_set, bkv_set):
        for bd in {min(128, d_pad), d_pad}:
            if d_pad % bd != 0:
                continue
            row = params_mod.ParameterRow(
                max_d=head_dim, block_q=bq, block_kv=bkv, block_d=bd)
            est = params_mod.vmem_bytes_estimate(row, head_dim, in_bytes,
                                                 kernel_type)
            if est < generation.vmem_bytes * 0.7:
                yield row


def tune_forward(head_dim: int = 128, seq: int = 4096, heads: int = 8,
                 dtype=jnp.bfloat16, causal: bool = False, verbose=print,
                 qg_set=(256, 512)):
    gen = params_mod.detect_generation()
    rng = np.random.default_rng(0)
    mk = lambda: jnp.asarray(
        rng.standard_normal((heads, seq, round_up(head_dim, 128))), dtype)
    q, k, v = mk(), mk(), mk()
    flops = attention_flops("forward", seq, seq, head_dim,
                            batch_heads=heads, causal=causal)

    desc = AttentionDescriptor(
        batch=1, num_q_heads=heads, num_kv_heads=heads,
        seq_len_q=seq, seq_len_kv=seq, head_dim=head_dim, causal=causal,
        low_precision_inputs=dtype == jnp.bfloat16,
    )
    base_kd = desc.kernel_descriptor(AttentionKernelType.FORWARD, gen)

    results = []
    in_bytes = jnp.dtype(dtype).itemsize
    for row in candidate_rows(head_dim, in_bytes, "forward", gen):
        # Row-group width (qg) joins the search (round-5: the offline
        # harness previously pinned it while the measured tables tuned it).
        qgs = [qg for qg in sorted(set(qg_set))
               if qg <= min(row.block_q, seq)] or [min(row.block_q, seq)]
        for qg in qgs:
            kd = dataclasses.replace(
                base_kd, block_q=min(row.block_q, seq),
                block_kv=min(row.block_kv, seq), block_d=row.block_d,
                block_q_inner=qg)
            try:
                fn = flash_fwd.build_fwd(
                    kd, batch_heads=heads, kv_batch_heads=heads,
                    seq_len_q=seq, seq_len_kv=seq,
                    d_pad=round_up(head_dim, 128),
                    scale=desc.softmax_scale,
                    q_dtype=dtype, kv_dtype=dtype, o_dtype=dtype,
                )
                res = measure(jax.jit(fn), (q, k, v), flops, 0,
                              generation=gen, iters=3, inner_small=1,
                              inner_big=8)
            except Exception as e:  # noqa: BLE001 — may not compile
                verbose(f"  bq={row.block_q:5d} bkv={row.block_kv:5d} "
                        f"bd={row.block_d:4d} qg={qg:4d}  FAILED "
                        f"{type(e).__name__}")
                continue
            results.append((res.tflops, kd))
            verbose(f"  bq={kd.block_q:5d} bkv={kd.block_kv:5d} "
                    f"bd={kd.block_d:4d} qg={qg:4d}  {res.tflops:7.1f} "
                    f"TFLOP/s  util {res.compute_bound_utilization:.3f}")
    results.sort(key=lambda t: -t[0])
    return results


def tune_backward(kernel: str, head_dim: int = 128, seq: int = 4096,
                  heads: int = 8, dtype=jnp.bfloat16, causal: bool = False,
                  verbose=print,
                  bq_set=(128, 256, 512), bkv_set=(256, 512, 1024, 2048)):
    """Sweep block shapes for one of the two backward kernels.

    Chained-timing protocol: the kernel's own gradient output feeds back as
    the corresponding input (cast to the input dtype), so one dispatch runs
    many dependent iterations and tunnel sync overhead cancels in the slope.
    """
    assert kernel in ("backward_query", "backward_key_value")
    gen = params_mod.detect_generation()
    rng = np.random.default_rng(0)
    d_pad = round_up(head_dim, 128)
    mk = lambda shp: jnp.asarray(rng.standard_normal(shp), dtype)
    q, k, v = mk((heads, seq, d_pad)), mk((heads, seq, d_pad)), mk((heads, seq, d_pad))
    o, do = mk((heads, seq, d_pad)), mk((heads, seq, d_pad))
    lse = jnp.zeros((heads, seq, flash_fwd.LANES), jnp.float32) + float(seq)
    dterm = jnp.zeros_like(lse)
    flops = attention_flops(kernel, seq, seq, head_dim,
                            batch_heads=heads, causal=causal)

    desc = AttentionDescriptor(
        batch=1, num_q_heads=heads, num_kv_heads=heads,
        seq_len_q=seq, seq_len_kv=seq, head_dim=head_dim, causal=causal,
        low_precision_inputs=dtype == jnp.bfloat16,
    )
    ktype = (AttentionKernelType.BACKWARD_QUERY
             if kernel == "backward_query"
             else AttentionKernelType.BACKWARD_KEY_VALUE)
    base_kd = desc.kernel_descriptor(ktype, gen)

    results = []
    in_bytes = jnp.dtype(dtype).itemsize
    for row in candidate_rows(head_dim, in_bytes, kernel, gen,
                              bq_set=bq_set, bkv_set=bkv_set):
        kd = dataclasses.replace(
            base_kd, block_q=min(row.block_q, seq),
            block_kv=min(row.block_kv, seq), block_d=row.block_d)
        try:
            if kernel == "backward_query":
                fn = flash_bwd.build_bwd_query(
                    kd, batch_heads=heads, kv_batch_heads=heads,
                    seq_len_q=seq, seq_len_kv=seq, d_pad=d_pad,
                    scale=desc.softmax_scale,
                    q_dtype=dtype, kv_dtype=dtype)
                step = lambda x: fn(x, k, v, o, do, lse)[0].astype(dtype)
                init = q
            else:
                fn = flash_bwd.build_bwd_key_value(
                    kd, batch_heads=heads, kv_batch_heads=heads,
                    seq_len_q=seq, seq_len_kv=seq, d_pad=d_pad,
                    scale=desc.softmax_scale,
                    q_dtype=dtype, kv_dtype=dtype)

                def step(kv, fn=fn):
                    dk, dv = fn(q, kv[0], kv[1], do, lse, dterm)
                    return (dk.astype(dtype), dv.astype(dtype))

                init = (k, v)
            res = measure_chained(step, init, flops, 0, generation=gen,
                                  trials=3, n_small=2, n_big=10)
        except Exception as e:  # noqa: BLE001 — candidate may not compile
            verbose(f"  bq={row.block_q:5d} bkv={row.block_kv:5d} "
                    f"bd={row.block_d:4d}  FAILED {type(e).__name__}")
            continue
        results.append((res.tflops, kd))
        verbose(f"  bq={kd.block_q:5d} bkv={kd.block_kv:5d} bd={kd.block_d:4d}"
                f"  {res.tflops:7.1f} TFLOP/s  util {res.compute_bound_utilization:.3f}")
    results.sort(key=lambda t: -t[0])
    return results


def gemm_candidates(m: int, n: int, k: int, in_bytes: int,
                    generation: params_mod.TpuGeneration):
    """Enumerate (bm, bn, bk) GEMM block candidates under the VMEM budget —
    the analogue of the reference's 4-candidate occupancy search
    (GEMMDescriptor+PipelineCache.swift:75-119 / GEMMShaderCache.cpp:75-160),
    widened because TPU block space is larger than {48x48x24, 48x48x32}."""
    budget = generation.vmem_bytes * 0.7
    seen = set()
    for bm in (128, 256, 512):
        for bn in (128, 256, 512):
            for bk in (128, 256, 512, 1024):
                bm_c = min(bm, round_up(m, 128))
                bn_c = min(bn, round_up(n, 128))
                bk_c = min(bk, round_up(k, 128))
                if (bm_c, bn_c, bk_c) in seen:
                    continue
                seen.add((bm_c, bn_c, bk_c))
                vmem = (bm_c * bn_c * 4
                        + 2 * in_bytes * bk_c * (bm_c + bn_c))
                if vmem <= budget:
                    yield bm_c, bn_c, bk_c


def tune_gemm(m: int = 1536, n: int = 1536, k: int = 1536,
              dtype=jnp.bfloat16, verbose=print, max_candidates=None):
    """Sweep GEMM block shapes and compare against XLA's native matmul.

    Returns (results, xla_tflops): results sorted best-first as
    [(tflops, (bm, bn, bk)), ...]; the reference benchmarks its GEMM the
    same way at 512^3 / 1488^3 / 1489^3 (CppReference/main.cpp:23-43).

    ``max_candidates`` bounds the sweep (heuristic's choice first, then the
    dispatch-hook's structured variants, then the full grid) — chained
    calibration costs several compiles per candidate over the tunnel, so
    the full grid is an offline-only affair.
    """
    import dataclasses as _dc

    from mfa_tpu.kernels import gemm_kernel
    from mfa_tpu.ops.descriptors import GEMMDescriptor
    from mfa_tpu.ops.precision import OperandPrecision

    gen = params_mod.detect_generation()
    rng = np.random.default_rng(0)
    m_pad, n_pad, k_pad = (round_up(x, 128) for x in (m, n, k))
    a = jnp.asarray(rng.standard_normal((1, m_pad, k_pad)), dtype)
    b = jnp.asarray(rng.standard_normal((1, k_pad, n_pad)), dtype)
    flops = 2.0 * m * n * k

    # Chained timing feeds C back as A, which needs a square problem; other
    # shapes use the dispatch-differential protocol.
    square = m_pad == k_pad == n_pad

    def bench(call):
        if square:
            return measure_chained(lambda x: call(x, b).astype(dtype),
                                   a, flops, 0, generation=gen, trials=3)
        return measure(jax.jit(call), (a, b), flops, 0, generation=gen)

    # Baseline: XLA-native matmul (what we must match or beat). Retry on a
    # physically impossible slope (tunnel jitter ate the window).
    for _ in range(3):
        xla_res = bench(lambda x, y: jnp.einsum("bmk,bkn->bmn", x, y))
        if xla_res.tflops <= gen.bf16_tflops * 1.1:
            break
    verbose(f"  XLA native: {xla_res.tflops:7.1f} TFLOP/s")

    prec = OperandPrecision.from_dtype(dtype)
    desc = GEMMDescriptor(m=m, n=n, k=k, a_precision=prec, b_precision=prec,
                          c_precision=prec)
    base_kd = desc.kernel_descriptor(gen)

    cands = list(gemm_candidates(m, n, k, jnp.dtype(dtype).itemsize, gen))
    if max_candidates is not None and len(cands) > max_candidates:
        from mfa_tpu.ops.gemm import _autotune_candidates

        lean = [c for c in _autotune_candidates(base_kd, m, n, k)
                if c in cands]
        rest = [c for c in cands if c not in lean]
        cands = (lean + rest)[:max_candidates]

    results = []
    for bm, bn, bk in cands:
        kd = _dc.replace(base_kd, block_m=bm, block_n=bn, block_k=bk)
        try:
            fn = gemm_kernel.build_gemm(
                kd, batch=1, m=m_pad, n=n_pad, k=k_pad,
                a_dtype=dtype, b_dtype=dtype, c_dtype=dtype)
            res = bench(fn)
        except Exception as e:  # noqa: BLE001 — candidate may not compile
            verbose(f"  bm={bm:4d} bn={bn:4d} bk={bk:4d}  FAILED "
                    f"{type(e).__name__}")
            continue
        if res.tflops > gen.bf16_tflops * 1.1:   # physically impossible
            verbose(f"  bm={bm:4d} bn={bn:4d} bk={bk:4d}  UNSTABLE "
                    f"({res.tflops:.0f} TFLOP/s > peak) — discarded")
            continue
        results.append((res.tflops, (bm, bn, bk)))
        verbose(f"  bm={bm:4d} bn={bn:4d} bk={bk:4d}  {res.tflops:7.1f} "
                f"TFLOP/s  vs-XLA {res.tflops / xla_res.tflops:.3f}")
    results.sort(key=lambda t: -t[0])
    return results, xla_res.tflops


def main():
    import argparse

    ap = argparse.ArgumentParser()
    ap.add_argument("--d", type=int, default=128)
    ap.add_argument("--n", type=int, default=4096)
    ap.add_argument("--heads", type=int, default=8)
    ap.add_argument("--causal", action="store_true")
    ap.add_argument("--m", type=int, default=1536)
    ap.add_argument("--k", type=int, default=1536)
    ap.add_argument("--kernel", default="forward",
                    choices=["forward", "backward_query",
                             "backward_key_value", "gemm"])
    args = ap.parse_args()

    print(f"# tuning {args.kernel} D={args.d} N={args.n} heads={args.heads}")
    if args.kernel == "forward":
        results = tune_forward(args.d, args.n, args.heads, causal=args.causal)
    elif args.kernel == "gemm":
        results, xla = tune_gemm(args.m, args.n, args.k)
        if results:
            best_tf, blocks = results[0]
            print(f"# best gemm blocks {blocks}: {best_tf:.1f} TFLOP/s "
                  f"({best_tf / xla:.3f} of XLA native)")
        return
    else:
        results = tune_backward(args.kernel, args.d, args.n, args.heads,
                                causal=args.causal)
    if results:
        best = results[0][1]
        print(f"# best row:  {args.d} | {best.block_q} | {best.block_kv} "
              f"| {best.block_d} |")


if __name__ == "__main__":
    main()
