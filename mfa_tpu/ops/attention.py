"""Public attention API: descriptor-driven, cached, differentiable.

The user-facing layer of the attention stack (the role the reference's L4
descriptor API plays — AttentionDescriptor.swift:10-27 — but with the
multi-batch/multi-head/GQA dispatch the reference leaves out, README.md:7).

Dispatch path (mirrors the reference call stack, SURVEY.md §3.2):

  flash_attention(q, k, v)
    └─ AttentionDescriptor → kernel_descriptor(type)   [heuristic tables]
       └─ two-level cache probe (ops/cache.py)
          └─ build_fwd / build_bwd_* pallas_call        [kernels/]
             └─ Mosaic/XLA compile (JAX jit cache = pipeline cache)

Differentiation is a custom VJP wiring the three kernels exactly like the
reference's one-command-buffer dispatch order: forward → backward_query →
backward_key_value (SquareAttentionTest.swift:355-368).
"""

from __future__ import annotations

import functools
from dataclasses import dataclass

import jax
import jax.numpy as jnp

from mfa_tpu.kernels import flash_bwd, flash_fwd
from mfa_tpu.ops.cache import attention_cache
from mfa_tpu.ops.descriptors import (
    AttentionDescriptor,
    AttentionKernelType,
    round_up,
)
from mfa_tpu.ops.precision import AttentionOperand


@dataclass(frozen=True)
class _AttnConfig:
    causal: bool
    scale: float | None
    logit_soft_cap: float | None
    sliding_window: int | None
    interpret: bool
    # None → follow low_precision_inputs (BF16 inputs keep a BF16 O in HBM;
    # FP32 inputs keep FP32). Explicit False forces the reference's
    # "O always FP32 in memory" training rule (Precisions.swift:140-143).
    low_precision_intermediates: bool | None = None


def _auto_interpret() -> bool:
    """Pallas kernels run interpreted on the CPU backend (the test rung the
    reference lacks — SURVEY.md §4 'TPU translation')."""
    return jax.default_backend() == "cpu"


def _descriptor(q, k, v, cfg: _AttnConfig) -> AttentionDescriptor:
    b, hq, r, d = q.shape
    _, hkv, c, _ = k.shape
    if q.dtype == jnp.float16:
        # Measured round 4: fp16 attention kernels fail Mosaic compilation
        # on v5e (no fp16 MXU datapath — the reference's FP16 tables are
        # Apple-native, AttentionDescriptor+Parameters.swift). BF16 is
        # TPU's native 16-bit format; refuse rather than silently re-round.
        raise TypeError(
            "float16 inputs are not supported on TPU (no fp16 MXU "
            "datapath; the kernel fails Mosaic compilation) — cast to "
            "bfloat16, TPU's native 16-bit format")
    low = q.dtype == jnp.bfloat16
    lpi = (cfg.low_precision_intermediates
           if cfg.low_precision_intermediates is not None else low)
    return AttentionDescriptor(
        batch=b,
        num_q_heads=hq,
        num_kv_heads=hkv,
        seq_len_q=r,
        seq_len_kv=c,
        head_dim=d,
        causal=cfg.causal,
        scale=cfg.scale,
        logit_soft_cap=cfg.logit_soft_cap,
        sliding_window=cfg.sliding_window,
        low_precision_inputs=low,
        low_precision_intermediates=lpi,
    )


def _pad3(x, s_pad, d_pad):
    """[N, S, D] → zero-padded [N, s_pad, d_pad]."""
    n, s, d = x.shape
    if s == s_pad and d == d_pad:
        return x
    return jnp.pad(x, ((0, 0), (0, s_pad - s), (0, d_pad - d)))


def _fold(x):
    b, h, s, d = x.shape
    return x.reshape(b * h, s, d)


def _shape_key(desc: AttentionDescriptor, kd, q, k, cfg):
    return (
        kd,
        desc.batch, desc.num_q_heads, desc.num_kv_heads,
        desc.seq_len_q, desc.seq_len_kv, desc.head_dim,
        str(q.dtype), str(k.dtype),
        desc.softmax_scale, cfg.interpret,
    )


# ---------------------------------------------------------------------------
# Dispatch-path autotune — the attention twin of ops/gemm.py's hook (the
# reference autotunes transparently at register time for GEMM,
# GEMMDescriptor+PipelineCache.swift:75-119; its attention tables are static
# per architecture. Here BOTH get the hook: MFA_AUTOTUNE=1 measures a few
# block-shape candidates around the table row on the first CONCRETE (eager)
# dispatch of a shape class and memoizes the winner — it is the mechanism
# that keeps the measured tables honest on a new chip generation. Inside a
# jit trace nothing can be timed, so traced dispatches use the memo or fall
# back to the table row.)
# ---------------------------------------------------------------------------

_attn_tuned: dict = {}


def _attn_autotune_candidates(kd, desc):
    """Candidate descriptors around the table row. Beyond the round-4
    (block_q, block_kv) neighborhood, the search covers the other tuned
    axes (round-5): row-group width ``block_q_inner`` (the measured qg=512
    lever), ``block_d`` paging at large head dims, and the causal schedule
    (blockskip vs tablegrid) — each varied one-at-a-time from the row, the
    same neighborhood discipline GEMM uses."""
    import dataclasses

    r_pad = round_up(desc.seq_len_q, 128)
    c_pad = round_up(desc.seq_len_kv, 128)
    lim_q = lambda b: max(128, min(b, r_pad))
    lim_kv = lambda b: max(128, min(b, c_pad))
    seen, out = set(), []

    def push(kdx):
        sig = (kdx.block_q, kdx.block_kv, kdx.block_d, kdx.block_q_inner,
               kdx.causal_mode)
        if sig not in seen:
            seen.add(sig)
            out.append(kdx)

    for bq, bkv in (
        (kd.block_q, kd.block_kv),
        (kd.block_q * 2, kd.block_kv),
        (max(128, kd.block_q // 2), kd.block_kv),
        (kd.block_q, kd.block_kv * 2),
        (kd.block_q, max(128, kd.block_kv // 2)),
    ):
        push(dataclasses.replace(kd, block_q=lim_q(bq), block_kv=lim_kv(bkv)))

    # Row-group width: meaningful only when the block holds >1 group.
    for qg in (256, 512):
        if qg != kd.block_q_inner and qg <= kd.block_q:
            push(dataclasses.replace(kd, block_q_inner=qg))
    # D paging at large head dims.
    d_pad = round_up(desc.head_dim, 128)
    if d_pad > 128:
        for bd in (128, 256, d_pad):
            if bd != kd.block_d and d_pad % bd == 0:
                push(dataclasses.replace(kd, block_d=bd))
    # Causal schedule strategy.
    if kd.causal:
        alt = "tablegrid" if kd.causal_mode == "blockskip" else "blockskip"
        push(dataclasses.replace(kd, causal_mode=alt))
    return out


def _attn_autotuned_kd(kind, kd, desc, q, k, run_candidate):
    """Resolve kd through the attention autotune memo; on a cold class at
    CONCRETE dispatch, time each candidate via ``run_candidate(kd)`` and
    memoize the winner's blocks."""
    from mfa_tpu.ops.gemm import _measure_dispatch, autotune_active

    if not autotune_active():
        return kd
    import dataclasses

    cls_key = (kind, desc, str(q.dtype), str(k.dtype))
    hit = _attn_tuned.get(cls_key)
    if hit is not None:
        return hit
    if isinstance(q, jax.core.Tracer):
        return kd
    best, best_t = kd, None
    for cand in _attn_autotune_candidates(kd, desc):
        try:
            t = _measure_dispatch(lambda: run_candidate(cand))
        except Exception:  # noqa: BLE001 — candidate may not compile
            continue
        if best_t is None or t < best_t:
            best, best_t = cand, t
    _attn_tuned[cls_key] = best
    return best


def _get_fwd(desc, kd, q, k, v, o_dtype, cfg):
    """Returns (pipeline, kd_used). kd_used may differ from the heuristic kd
    under MFA_AUTOTUNE=1 — the caller must derive its operand padding from
    kd_used, not the heuristic, or the production call runs at blocks the
    winner was never timed at."""
    b, hq, hkv = desc.batch, desc.num_q_heads, desc.num_kv_heads
    d_pad = round_up(desc.head_dim, 128)

    def build_for(kdx):
        return functools.partial(
            flash_fwd.build_fwd,
            kdx,
            batch_heads=b * hq,
            kv_batch_heads=b * hkv,
            seq_len_q=desc.seq_len_q,
            seq_len_kv=desc.seq_len_kv,
            d_pad=d_pad,
            scale=desc.softmax_scale,
            q_dtype=q.dtype,
            kv_dtype=k.dtype,
            o_dtype=o_dtype,
            interpret=cfg.interpret,
        )

    if not cfg.interpret:
        def run_candidate(kdx):
            r_pad = round_up(desc.seq_len_q, kdx.block_q)
            c_pad = round_up(desc.seq_len_kv, kdx.block_kv)
            fn = build_for(kdx)()
            return fn(_repad(_fold(q), r_pad, d_pad),
                      _repad(_fold(k), c_pad, d_pad),
                      _repad(_fold(v), c_pad, d_pad))[0]

        kd = _attn_autotuned_kd("fwd", kd, desc, q, k, run_candidate)

    build = build_for(kd)
    key = ("fwd", _shape_key(desc, kd, q, k, cfg), str(o_dtype))
    return attention_cache.get_pipeline(key, key, build,
                                        lambda kern: kern), kd


def _get_bwd_q(desc, kd, q, k, cfg):
    b, hq, hkv = desc.batch, desc.num_q_heads, desc.num_kv_heads
    d_pad = round_up(desc.head_dim, 128)
    build = functools.partial(
        flash_bwd.build_bwd_query,
        kd,
        batch_heads=b * hq,
        kv_batch_heads=b * hkv,
        seq_len_q=desc.seq_len_q,
        seq_len_kv=desc.seq_len_kv,
        d_pad=d_pad,
        scale=desc.softmax_scale,
        q_dtype=q.dtype,
        kv_dtype=k.dtype,
        interpret=cfg.interpret,
    )
    key = ("bwd_q", _shape_key(desc, kd, q, k, cfg))
    return attention_cache.get_pipeline(key, key, build, lambda kern: kern)


def _get_bwd_kv(desc, kd, q, k, cfg):
    b, hq, hkv = desc.batch, desc.num_q_heads, desc.num_kv_heads
    d_pad = round_up(desc.head_dim, 128)
    build = functools.partial(
        flash_bwd.build_bwd_key_value,
        kd,
        batch_heads=b * hq,
        kv_batch_heads=b * hkv,
        seq_len_q=desc.seq_len_q,
        seq_len_kv=desc.seq_len_kv,
        d_pad=d_pad,
        scale=desc.softmax_scale,
        q_dtype=q.dtype,
        kv_dtype=k.dtype,
        interpret=cfg.interpret,
    )
    key = ("bwd_kv", _shape_key(desc, kd, q, k, cfg))
    return attention_cache.get_pipeline(key, key, build, lambda kern: kern)


# ---------------------------------------------------------------------------
# custom-VJP core
# ---------------------------------------------------------------------------


@functools.partial(jax.custom_vjp, nondiff_argnums=(3,))
def _flash(q, k, v, cfg: _AttnConfig):
    return _run_forward(q, k, v, cfg)[0]


def _run_forward(q, k, v, cfg):
    desc = _descriptor(q, k, v, cfg)
    kd = desc.kernel_descriptor(AttentionKernelType.FORWARD)
    d_pad = round_up(desc.head_dim, 128)

    # O memory precision follows the policy's O rule (Precisions.swift:140-143
    # recast): low_precision_intermediates → O in the input's 16-bit family,
    # else FP32 in HBM (the fp32 accumulator is written out unrounded).
    policy = desc.precision_policy()
    o_dtype = q.dtype if policy.mem(AttentionOperand.O).bits <= 16 else jnp.float32
    # kd may come back with autotuned blocks — padding must match THAT
    # pipeline, not the heuristic's.
    fwd, kd = _get_fwd(desc, kd, q, k, v, o_dtype, cfg)
    r_pad = round_up(desc.seq_len_q, kd.block_q)
    c_pad = round_up(desc.seq_len_kv, kd.block_kv)

    q3 = _pad3(_fold(q), r_pad, d_pad)
    k3 = _pad3(_fold(k), c_pad, d_pad)
    v3 = _pad3(_fold(v), c_pad, d_pad)
    o_pad, l_pad = fwd(q3, k3, v3)
    b, hq, r, d = q.shape
    o = o_pad[:, :r, :d].reshape(b, hq, r, d)
    return o, (q3, k3, v3, o_pad, l_pad)


def _flash_fwd_rule(q, k, v, cfg):
    o, res = _run_forward(q, k, v, cfg)
    return o, (q, k, v, *res)


def _flash_bwd_rule(cfg, res, g):
    q, k, v, q3, k3, v3, o_pad, l_pad = res
    desc = _descriptor(q, k, v, cfg)
    b, hq, r, d = q.shape
    _, hkv, c, _ = k.shape

    kd_q = desc.kernel_descriptor(AttentionKernelType.BACKWARD_QUERY)
    kd_kv = desc.kernel_descriptor(AttentionKernelType.BACKWARD_KEY_VALUE)

    d_pad = round_up(d, 128)

    # dQ pass (+ inline D term) — reference loopBackwardQuery.
    r_pad_q = round_up(r, kd_q.block_q)
    c_pad_q = round_up(c, kd_q.block_kv)
    do3 = _pad3(_fold(g), r_pad_q, d_pad)
    bwd_q = _get_bwd_q(desc, kd_q, q, k, cfg)
    dq_pad, dterm_pad = bwd_q(
        _repad(q3, r_pad_q, d_pad),
        _repad(k3, c_pad_q, d_pad),
        _repad(v3, c_pad_q, d_pad),
        _repad(o_pad, r_pad_q, d_pad),
        do3,
        _repad1(l_pad, r_pad_q),
    )

    # dK/dV pass — reference loopBackwardKeyValue; reads L and the D term.
    r_pad_kv = round_up(r, kd_kv.block_q)
    c_pad_kv = round_up(c, kd_kv.block_kv)
    bwd_kv = _get_bwd_kv(desc, kd_kv, q, k, cfg)
    dk_pad, dv_pad = bwd_kv(
        _repad(q3, r_pad_kv, d_pad),
        _repad(k3, c_pad_kv, d_pad),
        _repad(v3, c_pad_kv, d_pad),
        _repad(do3, r_pad_kv, d_pad),
        _repad1(l_pad, r_pad_kv),
        _repad1(dterm_pad, r_pad_kv),
    )

    dq = dq_pad[:, :r, :d].reshape(b, hq, r, d).astype(q.dtype)
    dk = dk_pad[:, :c, :d].reshape(b, hkv, c, d).astype(k.dtype)
    dv = dv_pad[:, :c, :d].reshape(b, hkv, c, d).astype(v.dtype)
    return dq, dk, dv


def _repad(x3, s_pad, d_pad):
    n, s, dd = x3.shape
    if s == s_pad and dd == d_pad:
        return x3
    if s >= s_pad:
        return x3[:, :s_pad, :d_pad]
    return jnp.pad(x3, ((0, 0), (0, s_pad - s), (0, d_pad - dd)))


def _repad1(x3, s_pad):
    """Re-pad the row axis of a lane-replicated [BH, R_pad, LANES] vector."""
    n, s, lanes = x3.shape
    if s == s_pad:
        return x3
    if s >= s_pad:
        return x3[:, :s_pad]
    return jnp.pad(x3, ((0, 0), (0, s_pad - s), (0, 0)))


_flash.defvjp(_flash_fwd_rule, _flash_bwd_rule)


def attention_chunk_grads(
    q, k, v, o, do, lse,
    *,
    causal: bool = False,
    scale: float | None = None,
    logit_soft_cap: float | None = None,
    sliding_window: int | None = None,
    interpret: bool | None = None,
):
    """Backward contributions of ONE KV chunk under a GLOBAL softmax.

    Inputs are [B, H, S, D] (o/do aligned with q; lse [B, H, Sq] is the
    logsumexp over the FULL sequence, not just this chunk). Because the
    kernels compute P = exp(S − lse) and D = rowsum(dO ⊙ O) from the
    supplied global lse/o, the returned (dq, dk, dv) are exactly this
    chunk's additive contribution to the global gradients — the building
    block of the ring backward (each chunk visits each device once;
    contributions sum). Reference analogue: the per-block dS accumulation
    inside one chip's traversal loop (AttentionKernel+Source.swift:202-293),
    lifted to chunk granularity.
    """
    if interpret is None:
        interpret = _auto_interpret()
    cfg = _AttnConfig(causal=causal, scale=scale,
                      logit_soft_cap=logit_soft_cap,
                      sliding_window=sliding_window, interpret=interpret)
    desc = _descriptor(q, k, v, cfg)
    b, hq, r, d = q.shape
    _, hkv, c, _ = k.shape
    d_pad = round_up(d, 128)

    kd_q = desc.kernel_descriptor(AttentionKernelType.BACKWARD_QUERY)
    kd_kv = desc.kernel_descriptor(AttentionKernelType.BACKWARD_KEY_VALUE)

    lse3 = jnp.broadcast_to(
        lse.reshape(b * hq, r, 1).astype(jnp.float32),
        (b * hq, r, flash_fwd.LANES),
    )

    r_pad_q = round_up(r, kd_q.block_q)
    c_pad_q = round_up(c, kd_q.block_kv)
    q3 = _pad3(_fold(q), r_pad_q, d_pad)
    k3 = _pad3(_fold(k), c_pad_q, d_pad)
    v3 = _pad3(_fold(v), c_pad_q, d_pad)
    o3 = _pad3(_fold(o), r_pad_q, d_pad)
    do3 = _pad3(_fold(do), r_pad_q, d_pad)
    bwd_q = _get_bwd_q(desc, kd_q, q, k, cfg)
    dq_pad, dterm_pad = bwd_q(q3, k3, v3, o3, do3, _repad1(lse3, r_pad_q))

    r_pad_kv = round_up(r, kd_kv.block_q)
    c_pad_kv = round_up(c, kd_kv.block_kv)
    bwd_kv = _get_bwd_kv(desc, kd_kv, q, k, cfg)
    dk_pad, dv_pad = bwd_kv(
        _repad(q3, r_pad_kv, d_pad),
        _repad(k3, c_pad_kv, d_pad),
        _repad(v3, c_pad_kv, d_pad),
        _repad(do3, r_pad_kv, d_pad),
        _repad1(lse3, r_pad_kv),
        _repad1(dterm_pad, r_pad_kv),
    )

    dq = dq_pad[:, :r, :d].reshape(b, hq, r, d).astype(q.dtype)
    dk = dk_pad[:, :c, :d].reshape(b, hkv, c, d).astype(k.dtype)
    dv = dv_pad[:, :c, :d].reshape(b, hkv, c, d).astype(v.dtype)
    return dq, dk, dv


# ---------------------------------------------------------------------------
# public entry points
# ---------------------------------------------------------------------------


def flash_attention(
    q,
    k,
    v,
    *,
    causal: bool = False,
    scale: float | None = None,
    logit_soft_cap: float | None = None,
    sliding_window: int | None = None,
    interpret: bool | None = None,
    with_lse: bool = False,
    low_precision_intermediates: bool | None = None,
    transpose_q: bool = False,
    transpose_k: bool = False,
    transpose_v: bool = False,
    transpose_o: bool = False,
):
    """Flash attention over [batch, heads, seq, head_dim] operands.

    GQA/MQA: ``k``/``v`` may have fewer heads than ``q`` (must divide).
    Differentiable (two-kernel atomics-free backward). ``with_lse`` also
    returns the per-row natural-log logsumexp L (not differentiable path).
    ``low_precision_intermediates``: None follows the input precision class;
    False forces O to FP32 in HBM (the training-side rule the reference
    hardcodes, Precisions.swift:140-143); True keeps O in the 16-bit family.

    ``transpose_*``: per-operand layout flags, the reference descriptor's
    independent Q/K/V/O transpose states (AttentionDescriptor.swift:21-27).
    A transposed operand stores [batch, heads, head_dim, seq] instead of
    [..., seq, head_dim]; ``transpose_o`` returns O in that layout. On TPU
    the flag folds into the traced graph as a swapaxes that XLA fuses into
    the neighbouring op's layout assignment — the kernels always see
    canonical [..., S, D] blocks (no per-layout kernel variants, where the
    reference emits different load paths per transpose state).
    """
    if transpose_q:
        q = jnp.swapaxes(q, -1, -2)
    if transpose_k:
        k = jnp.swapaxes(k, -1, -2)
    if transpose_v:
        v = jnp.swapaxes(v, -1, -2)
    if interpret is None:
        interpret = _auto_interpret()
    cfg = _AttnConfig(
        causal=causal, scale=scale, logit_soft_cap=logit_soft_cap,
        sliding_window=sliding_window, interpret=interpret,
        low_precision_intermediates=low_precision_intermediates,
    )
    if with_lse:
        o, (_, _, _, _, l_pad) = _run_forward(q, k, v, cfg)
        lse = l_pad[:, : q.shape[2], 0]
        if transpose_o:
            o = jnp.swapaxes(o, -1, -2)
        return o, lse.reshape(q.shape[0], q.shape[1], q.shape[2])
    o = _flash(q, k, v, cfg)
    if transpose_o:
        o = jnp.swapaxes(o, -1, -2)
    return o


def mha(x_q, x_k, x_v, **kwargs):
    """Convenience wrapper for the common [batch, seq, heads, head_dim]
    layout: transposes to canonical [B, H, S, D], runs, transposes back."""
    q = jnp.swapaxes(x_q, 1, 2)
    k = jnp.swapaxes(x_k, 1, 2)
    v = jnp.swapaxes(x_v, 1, 2)
    o = flash_attention(q, k, v, **kwargs)
    return jnp.swapaxes(o, 1, 2)
