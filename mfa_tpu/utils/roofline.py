"""Roofline accounting: the reference's gigainstruction model on TPU.

The reference measures attention throughput as GINSTRS/s where work is
(2D+5)·N² for forward, (3D+5)·N² for dQ, (4D+5)·N² for dK/dV
(README.md:41-46,104-133) and one "instruction" is one FMA-class op on one
element (GINSTRS = GFLOPS/2, README.md:126-128).

Here the same cost model feeds a TPU roofline: utilization = achieved
FLOP/s ÷ min(MXU peak, HBM-bandwidth bound), per chip generation
(mfa_tpu/ops/params.py GENERATIONS). Decode adds a bandwidth-dominated
regime where the bound is KV-cache bytes/s, not FLOPs.
"""

from __future__ import annotations

import time
from dataclasses import dataclass

import jax

from mfa_tpu.ops.params import TpuGeneration, detect_generation


def attention_instrs(kernel_type: str, seq_len_q: int, seq_len_kv: int,
                     head_dim: int, batch_heads: int = 1,
                     causal: bool = False) -> float:
    """Instruction count per the reference cost model (README.md:108-124).

    forward (2D+5)·R·C; backward_query (3D+5)·R·C; backward_key_value
    (4D+5)·R·C; full train step (9D+15)·R·C. Causal halves the live area.
    """
    per_cell = {
        "forward": 2 * head_dim + 5,
        "backward_query": 3 * head_dim + 5,
        "backward_key_value": 4 * head_dim + 5,
        "train": 9 * head_dim + 15,
    }[kernel_type]
    area = seq_len_q * seq_len_kv
    if causal:
        area = area / 2
    return per_cell * area * batch_heads


def attention_flops(kernel_type: str, seq_len_q: int, seq_len_kv: int,
                    head_dim: int, batch_heads: int = 1,
                    causal: bool = False) -> float:
    """FLOPs = 2 × instructions (FMA = 2 FLOPs), the reference's GFLOPS
    convention (README.md:126-128)."""
    return 2.0 * attention_instrs(
        kernel_type, seq_len_q, seq_len_kv, head_dim, batch_heads, causal
    )


@dataclass
class BenchResult:
    name: str
    latency_s: float          # best-of-k (the reference uses best-of-5×5,
                              # SquareAttentionTest.swift:734-761)
    flops: float
    bytes_accessed: float
    generation: TpuGeneration

    @property
    def tflops(self) -> float:
        return self.flops / self.latency_s / 1e12

    @property
    def ginstrs(self) -> float:
        return self.flops / 2 / self.latency_s / 1e9

    @property
    def hbm_gbps(self) -> float:
        return self.bytes_accessed / self.latency_s / 1e9

    @property
    def compute_bound_utilization(self) -> float:
        return self.tflops / self.generation.bf16_tflops

    @property
    def roofline_utilization(self) -> float:
        """Achieved ÷ speed-of-light, where the light-speed latency is
        max(FLOP-bound time, bandwidth-bound time)."""
        t_flops = self.flops / (self.generation.bf16_tflops * 1e12)
        t_bytes = self.bytes_accessed / (self.generation.hbm_gbps * 1e9)
        sol = max(t_flops, t_bytes)
        return sol / self.latency_s


def _sync(out):
    """Force real device completion. ``block_until_ready`` is not a true
    barrier through the remote-tunnel backend (it acks at enqueue), so pull
    one element back to the host — the D2H copy cannot complete before the
    computation does."""
    leaf = jax.tree_util.tree_leaves(out)[0]
    import numpy as _np

    _np.asarray(leaf.reshape(-1)[:1])


def measure_chained(step_fn, init, flops_per_iter: float,
                    bytes_per_iter: float, name: str = "kernel",
                    trials: int = 3, n_small: int = 4, n_big: int = 36,
                    min_window_s: float = 0.3,
                    generation: TpuGeneration | None = None) -> BenchResult:
    """On-device chained timing: ONE dispatch runs n kernel iterations via
    ``fori_loop`` (each feeding its output forward), so per-dispatch tunnel
    overhead amortizes away; the slope between two loop lengths removes the
    fixed sync cost. This is the only protocol that gives stable numbers
    over the remote tunnel (dispatch-level timing scatters 3x).

    The chain length self-calibrates: after warmup, n_big is raised until
    the measured (t_big − t_small) window is at least ``min_window_s`` —
    tunnel sync jitter is tens of ms, so short chains produce garbage
    slopes (round-2 sweep post-mortem: 8-iteration diffs ≈ 3.5 ms measured
    "35 PFLOP/s").

    step_fn: x -> x (same shape/dtype), the chained kernel invocation.
    """
    import functools

    gen = generation or detect_generation()

    @functools.partial(jax.jit, static_argnums=1)
    def loop(x, n):
        return jax.lax.fori_loop(0, n, lambda i, xx: step_fn(xx), x)

    _sync(loop(init, n_small))   # compile + warm the small variant
    _sync(loop(init, n_big))

    # Calibrate: per-iteration time from the SLOPE of two warm chain lengths
    # (a single run is inflated by the ~30 ms tunnel sync, which would keep
    # chains too short); then raise n_big until the slope window dominates
    # sync jitter. ITERATIVE estimate-then-jump: for microsecond kernels
    # (512^3 GEMM ≈ 1.5 us needs ~200k chained iterations) the first
    # estimate is itself sync-floor noise, so a single jump under-shoots —
    # the round-3 gemm bench produced 268,000 "TFLOP/s" garbage slopes that
    # way. The cap bounds pathological cases; fori_loop compile is O(1) in
    # the trip count.
    for _ in range(8):
        t0 = time.perf_counter()
        _sync(loop(init, n_small))
        t_s = time.perf_counter() - t0
        t0 = time.perf_counter()
        _sync(loop(init, n_big))
        t_b = time.perf_counter() - t0
        if t_b - t_s >= min_window_s or n_big >= (1 << 19):
            break
        t_est = max((t_b - t_s) / (n_big - n_small), 1e-9)
        need = int(min_window_s / t_est) + n_small
        n_big = min(max(need, n_big * 2), 1 << 19)
        _sync(loop(init, n_big))   # compile + warm the recalibrated variant

    slopes = []
    for _ in range(trials):
        t0 = time.perf_counter()
        _sync(loop(init, n_small))
        t_small = time.perf_counter() - t0
        t0 = time.perf_counter()
        _sync(loop(init, n_big))
        t_big = time.perf_counter() - t0
        slopes.append((t_big - t_small) / (n_big - n_small))
    slopes.sort()
    dt = slopes[len(slopes) // 2]   # median: robust to sync-noise spikes
    return BenchResult(
        name=name, latency_s=max(dt, 1e-9), flops=flops_per_iter,
        bytes_accessed=bytes_per_iter, generation=gen,
    )


def measure(fn, args, flops: float, bytes_accessed: float,
            name: str = "kernel", iters: int = 5,
            inner_small: int = 2, inner_big: int = 12,
            generation: TpuGeneration | None = None) -> BenchResult:
    """Differential best-of-(iters) timing.

    The reference uses best-of-5×5 wall-clock dispatches
    (SquareAttentionTest.swift:734-761). Over the remote tunnel each sync
    carries a large fixed cost, so we time two batch sizes of back-to-back
    dispatches and take the slope: t_kernel = (t_big − t_small) / Δn.
    """
    gen = generation or detect_generation()
    out = fn(*args)
    _sync(out)  # compile + warm

    def run(n):
        t0 = time.perf_counter()
        for _ in range(n):
            out = fn(*args)
        _sync(out)
        return time.perf_counter() - t0

    best = float("inf")
    for _ in range(iters):
        t_small = run(inner_small)
        t_big = run(inner_big)
        dt = (t_big - t_small) / (inner_big - inner_small)
        if dt > 0:
            best = min(best, dt)
    return BenchResult(
        name=name, latency_s=best, flops=flops,
        bytes_accessed=bytes_accessed, generation=gen,
    )
