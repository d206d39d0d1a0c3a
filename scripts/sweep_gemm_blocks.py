#!/usr/bin/env python
"""Offline GEMM block sweep at the reference's large sizes (round-5 VERDICT
item 6: reclaim >=1152^3 and TN/TT with the in-house kernel, or prove the
gap irreducible).

Unlike the MFA_AUTOTUNE on-dispatch hook (tunnel-noise-limited, round-4
caveat), this uses the chained-slope protocol per candidate — the only
timing that resolves microsecond kernels over the tunnel. Candidates
include the output-stationary whole-K forms (no k grid axis: A row-slab x
B col-slab per step, Mosaic tiles the in-block K internally) and wide
output tiles, the two levers the round-4 measurement never saw cleanly.

Resumable via docs/sweeps/gemm_blocks.jsonl.

    PYTHONPATH=/root/repo python scripts/sweep_gemm_blocks.py \
        [--sizes 1488 1489] [--states NN TN NT TT]
"""

import argparse
import dataclasses
import json
import os
import sys
import time

import jax.numpy as jnp
import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from mfa_tpu.kernels import gemm_kernel
from mfa_tpu.ops.descriptors import GEMMDescriptor, round_up
from mfa_tpu.ops.params import detect_generation
from mfa_tpu.ops.precision import OperandPrecision
from mfa_tpu.utils.roofline import measure_chained

OUT = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                   "docs", "sweeps", "gemm_blocks.jsonl")


def candidates(size: int):
    """Curated (bm, bn, bk) candidates, VMEM-filtered. bf16 operands.
    Emphasis on the output-stationary whole-K forms (bk = padded K) the
    round-4 on-dispatch hook never measured cleanly."""
    kp = round_up(size, 128)
    cands = [
        (512, 512, 512),       # round-4 heuristic class
        (512, 1024, 512),
        (256, 256, kp),        # whole-K forms
        (512, 512, kp),
        (768, 768, kp),
        (512, 1024, kp),
        (1024, 512, kp),
        (512, 512, 768),
        (1024, 1024, 512),
    ]
    out, seen = [], set()
    for bm, bn, bk in cands:
        bm, bn, bk = min(bm, kp), min(bn, kp), min(bk, kp)
        if (bm, bn, bk) in seen:
            continue
        seen.add((bm, bn, bk))
        # double-buffered A/B blocks + fp32 acc scratch
        byt = 2 * 2 * (bm * bk + bk * bn) + 4 * bm * bn
        if byt > 14 * 2**20:
            continue
        out.append((bm, bn, bk))
    return out


def load_done():
    done = {}
    if os.path.exists(OUT):
        with open(OUT) as f:
            for line in f:
                try:
                    rec = json.loads(line)
                except json.JSONDecodeError:
                    continue
                done[(rec["size"], rec["state"], rec["bm"], rec["bn"],
                      rec["bk"])] = rec
    return done


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--sizes", type=int, nargs="+", default=[1488, 1489])
    ap.add_argument("--states", nargs="+", default=["NN", "TN", "NT", "TT"])
    args = ap.parse_args()

    gen = detect_generation()
    done = load_done()
    print(f"# generation {gen.name}, peak {gen.bf16_tflops} TF/s", flush=True)

    for size in args.sizes:
        rng = np.random.default_rng(0)
        flops = 2.0 * size**3
        for state in args.states:
            ta, tb = state[0] == "T", state[1] == "T"
            best = (0.0, None)
            for bm, bn, bk in candidates(size):
                key = (size, state, bm, bn, bk)
                if key in done:
                    rec = done[key]
                    if rec.get("tflops", 0) > best[0]:
                        best = (rec["tflops"], key)
                    continue
                m_pad = -(-size // bm) * bm
                n_pad = -(-size // bn) * bn
                k_pad = -(-size // bk) * bk
                prec = OperandPrecision.BF16
                desc = GEMMDescriptor(
                    m=size, n=size, k=size, transpose_a=ta, transpose_b=tb,
                    a_precision=prec, b_precision=prec, c_precision=prec)
                kd = desc.kernel_descriptor(gen)
                kd = dataclasses.replace(kd, block_m=bm, block_n=bn,
                                         block_k=bk)
                a_shape = (1, k_pad, m_pad) if ta else (1, m_pad, k_pad)
                b_shape = (1, n_pad, k_pad) if tb else (1, k_pad, n_pad)
                a = jnp.asarray(rng.standard_normal(a_shape), jnp.bfloat16)
                b = jnp.asarray(rng.standard_normal(b_shape), jnp.bfloat16)
                t0 = time.time()
                try:
                    fn = gemm_kernel.build_gemm(
                        kd, batch=1, m=m_pad, n=n_pad, k=k_pad,
                        a_dtype=jnp.bfloat16, b_dtype=jnp.bfloat16,
                        c_dtype=jnp.bfloat16)

                    def step(x, fn=fn):
                        y = fn(x, b)             # (1, m_pad, n_pad) bf16
                        # Chain via a numerically-negligible data dependency
                        # (pad classes differ per candidate, so C cannot be
                        # fed back as A directly; the 1e-30-scaled element
                        # still blocks dead-code elimination).
                        dep = y.astype(jnp.float32)[:, :1, :1] * 1e-30
                        return (x.astype(jnp.float32) + dep).astype(x.dtype)

                    res = measure_chained(step, a, flops, 0, generation=gen,
                                          trials=2)
                    rec = {"size": size, "state": state, "bm": bm, "bn": bn,
                           "bk": bk, "tflops": round(res.tflops, 1),
                           "wall_s": round(time.time() - t0, 1)}
                except Exception as e:  # noqa: BLE001 — record the failure
                    rec = {"size": size, "state": state, "bm": bm, "bn": bn,
                           "bk": bk, "error": str(e).splitlines()[0][:120],
                           "wall_s": round(time.time() - t0, 1)}
                with open(OUT, "a") as f:
                    f.write(json.dumps(rec) + "\n")
                if rec.get("tflops", 0) > best[0]:
                    best = (rec["tflops"], key)
                print(f"  {size}^3 {state} bm={bm:4d} bn={bn:4d} bk={bk:4d}"
                      f"  {rec.get('tflops', rec.get('error'))}", flush=True)
            print(f"# BEST {size}^3 {state}: {best[0]} TF/s {best[1]}",
                  flush=True)


if __name__ == "__main__":
    main()
