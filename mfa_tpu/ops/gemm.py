"""Public GEMM API: descriptor-driven, cached, all four transpose states.

The reference's GEMM entry point ``GEMMKernel.register(descriptor:)`` +
client dispatch (GEMMDescriptor+PipelineCache.swift:24-125;
LaplacianTest.swift:201-224) collapsed into one cached call.
"""

from __future__ import annotations

import dataclasses
import functools
import os
import threading
import time

import jax
import jax.numpy as jnp

from mfa_tpu.kernels import gemm_kernel
from mfa_tpu.ops.cache import gemm_cache
from mfa_tpu.ops.descriptors import GEMMDescriptor, round_up
from mfa_tpu.ops.precision import OperandPrecision

# ---------------------------------------------------------------------------
# Dispatch-path autotune (the reference's transparent 4-candidate occupancy
# search at kernel registration, GEMMDescriptor+PipelineCache.swift:75-119 /
# GEMMShaderCache.cpp:75-160). Opt-in: MFA_AUTOTUNE=1 (env) or
# set_autotune(True). On the first dispatch of a shape class the hook
# measures the heuristic's block choice against a few structured variants on
# the actual device and memoizes the winner for every later dispatch of that
# class; off (default), dispatch uses the heuristic row directly — zero
# added latency.
# ---------------------------------------------------------------------------

_autotune_enabled: bool | None = None     # None → read MFA_AUTOTUNE env
_tuned_blocks: dict = {}                  # shape-class key → (bm, bn, bk)
_tuned_inflight: dict = {}                # shape-class key → threading.Event
_tuned_lock = threading.Lock()


def set_autotune(enabled: bool | None) -> None:
    """Force dispatch-path autotuning on/off (None = follow MFA_AUTOTUNE)."""
    global _autotune_enabled
    _autotune_enabled = enabled


def autotune_active() -> bool:
    if _autotune_enabled is not None:
        return _autotune_enabled
    return os.environ.get("MFA_AUTOTUNE", "0") not in ("", "0", "false")


def _autotune_candidates(kd, m, n, k):
    """The heuristic's choice plus structured variants along each block axis
    (the reference probes exactly {48x48x24, 48x48x32} x async-store; the
    TPU block space is larger, so probe each axis around the heuristic).
    Per-candidate operand padding adapts to the blocks, so no divisibility
    filter — excess padding simply loses the measurement.

    Round-4 additions (the >=1488^3 gap vs XLA, MEASUREMENTS round 3):
    whole-K blocks (no k grid axis: the accumulator never round-trips
    through scratch between grid steps) and a wider output tile, both
    VMEM-permitting."""
    lim = lambda b, dim: min(b, round_up(dim, 128))
    k_whole = round_up(k, 128)
    cands = [
        (kd.block_m, kd.block_n, kd.block_k),
        (kd.block_m, kd.block_n, kd.block_k * 2),
        (kd.block_m, kd.block_n, max(128, kd.block_k // 2)),
        (max(128, kd.block_m // 2), kd.block_n, kd.block_k),
        (kd.block_m, max(128, kd.block_n // 2), kd.block_k),
        (kd.block_m * 2, kd.block_n, kd.block_k),
    ]
    # Whole-K variants: A/B blocks (bm x K) + (K x bn) bf16, double
    # buffered, + fp32 acc must fit ~12 MiB of scoped VMEM.
    for bm, bn in ((kd.block_m, kd.block_n),
                   (kd.block_m * 2, kd.block_n * 2)):
        bytes_needed = 2 * 2 * k_whole * (min(bm, round_up(m, 128))
                                          + min(bn, round_up(n, 128))) + \
            4 * min(bm, round_up(m, 128)) * min(bn, round_up(n, 128))
        if bytes_needed < 12 * 2**20:
            cands.append((bm, bn, k_whole))
    seen, out = set(), []
    for bm, bn, bk in cands:
        cand = (lim(bm, m), lim(bn, n), lim(bk, k))
        if cand in seen:
            continue
        seen.add(cand)
        out.append(cand)
    return out


def _measure_dispatch(thunk, iters: int = 8, min_window_s: float = 0.08):
    """On-dispatch timing: warm up (compile), then wall-clock a run with a
    host readback as the completion barrier (the tunnel acks
    block_until_ready at enqueue). Self-calibrates the batch size until the
    window dominates the ~30 ms tunnel sync jitter — without this, a
    microsecond-class kernel (512^3 GEMM ≈ 1.5 us) measures pure noise and
    the candidate search picks randomly (round-4 bench_gemm post-mortem)."""
    import numpy as np

    out = thunk()
    np.asarray(out.ravel()[0])           # sync after compile
    for _ in range(6):
        t0 = time.perf_counter()
        for _ in range(iters):
            out = thunk()
        np.asarray(out.ravel()[0])
        dt = time.perf_counter() - t0
        if dt >= min_window_s or iters >= 4096:
            return dt / iters
        iters = min(max(int(iters * min_window_s / max(dt, 1e-5) * 1.5),
                        iters * 2), 4096)
    return dt / iters


# Measured crossover to XLA's native matmul (docs/MEASUREMENTS.md round 4):
# the single-level Pallas block loop matches XLA at small sizes for the
# NN/NT states (512^3 default path: 170.2/169.4 vs XLA 170.2 TF/s) but
# trails at >=1488^3 (0.78 — XLA's multi-level output tiling wins) and on
# transpose_a states at every size (TN/TT 512^3: 154 TF/s, 0.91 of XLA —
# the transposed-A block loads fight Mosaic's preferred layout). The
# dispatch concedes those classes to jnp.matmul ("matching or beating":
# never ship a measured loser) unless the autotune hook has measured a
# Pallas config that actually wins for the exact class.
_XLA_CROSSOVER_VOLUME = 1152 ** 3


def _default_prefers_xla(m, n, k, transpose_a):
    return transpose_a or m * n * k >= _XLA_CROSSOVER_VOLUME


@functools.partial(jax.jit, static_argnums=(2, 3, 4))
def _xla_gemm_jit(a, b, transpose_a, transpose_b, out_dtype):
    aa = jnp.swapaxes(a, 1, 2) if transpose_a else a
    bb = jnp.swapaxes(b, 1, 2) if transpose_b else b
    y = jnp.matmul(aa, bb, preferred_element_type=jnp.float32)
    return y.astype(out_dtype)


@functools.partial(jax.jit, static_argnums=(3, 4, 5))
def _xla_gemm_acc_jit(a, b, c0, transpose_a, transpose_b, out_dtype):
    aa = jnp.swapaxes(a, 1, 2) if transpose_a else a
    bb = jnp.swapaxes(b, 1, 2) if transpose_b else b
    y = jnp.matmul(aa, bb, preferred_element_type=jnp.float32)
    return (y + c0.astype(jnp.float32)).astype(out_dtype)


def _xla_gemm(a, b, c0, transpose_a, transpose_b, out_dtype):
    """Native-XLA path (the 'concede with evidence' branch). Jitted so the
    transpose states fuse into the matmul — an EAGER swapaxes materializes
    a copy and loses the measurement unfairly (round-4 bench_gemm TN/TT
    post-mortem); inside a caller's jit trace the inner jit inlines."""
    dt = jnp.dtype(out_dtype)
    if c0 is None:
        return _xla_gemm_jit(a, b, transpose_a, transpose_b, dt)
    return _xla_gemm_acc_jit(a, b, c0, transpose_a, transpose_b, dt)


def gemm(
    a,
    b,
    c0=None,
    *,
    transpose_a: bool = False,
    transpose_b: bool = False,
    out_dtype=None,
    interpret: bool | None = None,
):
    """C = op(A) @ op(B) (+ C0), where op is optional transpose.

    Accepts 2-D ([m, k]) or 3-D batched ([batch, m, k]) operands; batch dims
    must match. ``c0`` enables the reference's ``load_previous_C``
    accumulate path (GEMMDescriptor.swift:42-47).
    """
    if interpret is None:
        interpret = jax.default_backend() == "cpu"

    squeeze = a.ndim == 2
    if squeeze:
        a = a[None]
        b = b[None]
        if c0 is not None:
            c0 = c0[None]
    batch = a.shape[0]
    if b.shape[0] != batch:
        raise ValueError(f"batch mismatch: {a.shape} vs {b.shape}")

    m = a.shape[2] if transpose_a else a.shape[1]
    ka = a.shape[1] if transpose_a else a.shape[2]
    kb = b.shape[2] if transpose_b else b.shape[1]
    n = b.shape[1] if transpose_b else b.shape[2]
    if ka != kb:
        raise ValueError(f"K mismatch: {ka} vs {kb}")
    k = ka

    out_dtype = out_dtype or jnp.promote_types(a.dtype, b.dtype)
    desc = GEMMDescriptor(
        m=m, n=n, k=k,
        a_precision=OperandPrecision.from_dtype(a.dtype),
        b_precision=OperandPrecision.from_dtype(b.dtype),
        c_precision=OperandPrecision.from_dtype(out_dtype),
        transpose_a=transpose_a,
        transpose_b=transpose_b,
        batch=batch,
        load_previous_c=c0 is not None,
    )
    kd = desc.kernel_descriptor()

    if autotune_active() and not interpret:
        sel = _autotuned_kd(kd, desc, a, b, c0, out_dtype)
        if sel == "xla":
            c = _xla_gemm(a, b, c0, transpose_a, transpose_b, out_dtype)
            return c[0] if squeeze else c
        kd = sel
    elif not interpret and _default_prefers_xla(m, n, k, transpose_a):
        c = _xla_gemm(a, b, c0, transpose_a, transpose_b, out_dtype)
        return c[0] if squeeze else c

    c = _dispatch(kd, a, b, c0, out_dtype, interpret)[:, :m, :n]
    return c[0] if squeeze else c


def _dispatch(kd, a, b, c0, out_dtype, interpret):
    """Pad to kd's blocks, fetch/build the cached pipeline, run."""
    batch = a.shape[0]
    ta, tb = kd.transpose_a, kd.transpose_b
    m = a.shape[2] if ta else a.shape[1]
    k = a.shape[1] if ta else a.shape[2]
    n = b.shape[1] if tb else b.shape[2]
    m_pad = round_up(m, kd.block_m)
    n_pad = round_up(n, kd.block_n)
    k_pad = round_up(k, kd.block_k)

    a_pad = _pad_operand(a, (k_pad, m_pad) if ta else (m_pad, k_pad))
    b_pad = _pad_operand(b, (n_pad, k_pad) if tb else (k_pad, n_pad))
    args = [a_pad, b_pad]
    if c0 is not None:
        args.append(_pad_operand(c0.astype(out_dtype), (m_pad, n_pad)))

    build = functools.partial(
        gemm_kernel.build_gemm,
        kd,
        batch=batch, m=m_pad, n=n_pad, k=k_pad,
        a_dtype=a.dtype, b_dtype=b.dtype, c_dtype=out_dtype,
        interpret=interpret,
    )
    key = (kd, batch, m_pad, n_pad, k_pad, str(a.dtype), str(b.dtype),
           str(out_dtype), interpret)
    fn = gemm_cache.get_pipeline(key, key, build, lambda kern: kern)
    return fn(*args)


def _autotuned_kd(kd, desc, a, b, c0, out_dtype, measure=None):
    """Resolve kd's blocks through the on-dispatch autotune memo, running
    the candidate search on the first miss for this shape class.

    ``measure`` is injectable for tests; defaults to wall-clock dispatch
    timing on the real device.
    """
    cls_key = (desc.m, desc.n, desc.k, desc.batch, str(a.dtype),
               str(b.dtype), str(out_dtype), desc.transpose_a,
               desc.transpose_b, desc.load_previous_c)
    if measure is None and isinstance(a, jax.core.Tracer):
        # Inside a jit trace there is nothing to time — use the memoized
        # winner if one exists, else the heuristic without memoizing; the
        # first concrete (eager) dispatch of this class runs the search.
        with _tuned_lock:
            hit = _tuned_blocks.get(cls_key)
        if hit is None:
            return kd
        if hit == "xla":
            return "xla"
        return dataclasses.replace(
            kd, block_m=hit[0], block_n=hit[1], block_k=hit[2])

    # Per-class in-flight guard: without it, two threads racing on the same
    # cold class each run the full on-device search (8 timed dispatches x
    # ~6 candidates) and may memoize different winners depending on
    # setdefault order. The loser waits on the winner's event instead.
    while True:
        with _tuned_lock:
            hit = _tuned_blocks.get(cls_key)
            if hit is not None:
                break
            event = _tuned_inflight.get(cls_key)
            if event is None:
                event = _tuned_inflight[cls_key] = threading.Event()
                owner = True
            else:
                owner = False
        if not owner:
            event.wait()
            continue
        measure_xla = None
        if measure is None:
            measure = (
                lambda cand_kd: _measure_dispatch(
                    lambda: _dispatch(cand_kd, a, b, c0, out_dtype, False)))
            # XLA's native matmul competes as a candidate: "matching or
            # beating" means the dispatch must never ship a losing kernel
            # (the >=1488^3 finding, MEASUREMENTS round 3/4).
            measure_xla = (
                lambda: _measure_dispatch(
                    lambda: _xla_gemm(a, b, c0, desc.transpose_a,
                                      desc.transpose_b, out_dtype)))
        best, best_t = (kd.block_m, kd.block_n, kd.block_k), None
        try:
            for bm, bn, bk in _autotune_candidates(kd, desc.m, desc.n,
                                                   desc.k):
                cand = dataclasses.replace(
                    kd, block_m=bm, block_n=bn, block_k=bk)
                try:
                    t = measure(cand)
                except Exception:  # noqa: BLE001 — may not compile
                    continue
                if best_t is None or t < best_t:
                    best, best_t = (bm, bn, bk), t
                # Evict losing candidates' pipelines: only the winner's
                # stays warm (the reference's autotune also discards the
                # losing PSO variants).
            if measure_xla is not None:
                try:
                    t = measure_xla()
                    if best_t is None or t < best_t:
                        best, best_t = "xla", t
                except Exception:  # noqa: BLE001
                    pass
            with _tuned_lock:
                hit = _tuned_blocks.setdefault(cls_key, best)
            if hit != "xla":
                _evict_losers(cls_key, desc, a, b, out_dtype, hit)
        finally:
            with _tuned_lock:
                _tuned_inflight.pop(cls_key, None)
            event.set()
        break
    if hit == "xla":
        return "xla"
    return dataclasses.replace(
        kd, block_m=hit[0], block_n=hit[1], block_k=hit[2])


def _evict_losers(cls_key, desc, a, b, out_dtype, best):
    """Drop the candidate search's losing pipelines from gemm_cache (they
    would otherwise stay resident forever; only the winner is ever
    dispatched again)."""
    try:
        from mfa_tpu.ops.cache import gemm_cache as _gc
        keep_blocks = set([best])
        _gc.evict_if(lambda key: (
            isinstance(key, tuple) and key and hasattr(key[0], "block_m")
            and (key[0].block_m, key[0].block_n, key[0].block_k)
            not in keep_blocks
            and _key_matches_class(key, desc, a, b, out_dtype)))
    except Exception:  # noqa: BLE001 — eviction is best-effort
        pass


def _key_matches_class(key, desc, a, b, out_dtype):
    # _dispatch cache keys: (kd, batch, m_pad, n_pad, k_pad, a_dt, b_dt,
    # c_dt, interpret) — match on the problem class, ignoring block-derived
    # padding.
    try:
        kd = key[0]
        return (key[1] == a.shape[0] and key[5] == str(a.dtype)
                and key[6] == str(b.dtype) and key[7] == str(out_dtype)
                and kd.transpose_a == desc.transpose_a
                and kd.transpose_b == desc.transpose_b)
    except Exception:  # noqa: BLE001
        return False


def _pad_operand(x, target_hw):
    th, tw = target_hw
    _, h, w = x.shape
    if h == th and w == tw:
        return x
    return jnp.pad(x, ((0, 0), (0, th - h), (0, tw - w)))
