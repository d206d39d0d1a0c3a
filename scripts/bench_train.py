#!/usr/bin/env python
"""Combined train-step utilization table: fwd / bwd_q / bwd_kv / (9D+15)
at D in {64, 128, 256}, BF16, N=4096 — the reference's headline artifact
(README.md:167-175 publishes FWD and FWD+BWD utilization per D).

Run on the real chip (chip must be otherwise idle — the grant is exclusive):
    PYTHONPATH=/root/repo:/root/.axon_site python scripts/bench_train.py

Appends one JSON record per config to docs/sweeps/train_util.jsonl and
prints a markdown table for MEASUREMENTS.md.
"""

import argparse
import json
import os
import sys

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from mfa_tpu.ops.attention import flash_attention
from mfa_tpu.ops.params import detect_generation
from mfa_tpu.utils.roofline import attention_flops, measure_chained

OUT = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                   "docs", "sweeps", "train_util.jsonl")


def bench_d(head_dim: int, seq: int, heads: int, gen, causal: bool):
    rng = np.random.default_rng(0)
    mk = lambda: jnp.asarray(
        rng.standard_normal((1, heads, seq, head_dim)), jnp.bfloat16)
    q, k, v, do = mk(), mk(), mk(), mk()

    # Forward-only.
    f_fwd = attention_flops("forward", seq, seq, head_dim,
                            batch_heads=heads, causal=causal)
    res_f = measure_chained(
        lambda x: flash_attention(x, k, v, causal=causal, interpret=False),
        q, f_fwd, 0, generation=gen)

    # Full train step: fwd + both backward kernels via the custom VJP —
    # the (9D+15)·N² cost model (README.md:41-46). Differentiate w.r.t. ALL
    # THREE operands and chain all three gradients forward: with only dQ
    # consumed, XLA dead-code-eliminates the entire backward_key_value
    # pallas_call (its outputs would be unused) and the "train step" silently
    # measures (5D+10) work while being credited (9D+15) — the round-3 bug
    # that produced impossible >100% utilization on the first run.
    f_train = attention_flops("train", seq, seq, head_dim,
                              batch_heads=heads, causal=causal)

    def train_step(args):
        def loss(t):
            o = flash_attention(t[0], t[1], t[2], causal=causal,
                                interpret=False)
            return jnp.sum(do.astype(jnp.float32) * o.astype(jnp.float32))

        gq, gk, gv = jax.grad(loss)(args)
        return (gq.astype(jnp.bfloat16), gk.astype(jnp.bfloat16),
                gv.astype(jnp.bfloat16))

    res_t = measure_chained(train_step, (q, k, v), f_train, 0,
                            generation=gen)

    # Physical sanity: utilization above the MXU peak means the FLOP
    # accounting and the measured program diverged (e.g. a kernel was
    # dead-code-eliminated). Refuse to record impossible numbers.
    for nm, r in (("fwd", res_f), ("train", res_t)):
        if r.compute_bound_utilization > 1.05:
            raise RuntimeError(
                f"{nm} utilization {r.compute_bound_utilization:.2f} > 1 — "
                f"cost model and measured program diverged; not recording")

    return {
        "d": head_dim, "n": seq, "heads": heads, "causal": causal,
        "fwd_tflops": round(res_f.tflops, 2),
        "fwd_util": round(res_f.compute_bound_utilization, 4),
        "train_tflops": round(res_t.tflops, 2),
        "train_util": round(res_t.compute_bound_utilization, 4),
    }


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--d", type=int, nargs="+", default=[64, 128, 256])
    ap.add_argument("--n", type=int, default=4096)
    ap.add_argument("--heads", type=int, default=8)
    ap.add_argument("--causal", action="store_true")
    ap.add_argument("--mode", default=None,
                    help="causal schedule override (blockskip/tablegrid/"
                         "dense/skip); records into the jsonl when set")
    args = ap.parse_args()
    if args.mode:
        from mfa_tpu.ops.descriptors import set_causal_mode_override
        set_causal_mode_override(args.mode)

    gen = detect_generation()
    print(f"# generation {gen.name}, peak {gen.bf16_tflops} TFLOP/s",
          flush=True)
    rows = []
    for d in args.d:
        rec = bench_d(d, args.n, args.heads, gen, args.causal)
        if args.mode:
            rec["mode"] = args.mode
        rows.append(rec)
        with open(OUT, "a") as f:
            f.write(json.dumps(rec) + "\n")
        print(json.dumps(rec), flush=True)

    print("\n| D | FWD util | FWD+BWD util |")
    print("|---|---|---|")
    for r in rows:
        print(f"| {r['d']} | {r['fwd_util']:.0%} | {r['train_util']:.0%} |")


if __name__ == "__main__":
    main()
