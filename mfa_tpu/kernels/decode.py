"""GQA decode attention kernel with fused KV-cache dequantization.

The decode-path extension the north star requires (BASELINE.json): one new
query token per sequence attends over a (possibly quantized) KV cache.

Design notes:
- Decode is HBM-bandwidth-bound: the whole KV cache streams through VMEM
  once per step while the MXU multiplies a tiny (group, D) query slab.
  INT8/FP8 storage halves the bytes — that IS the speedup; dequant runs on
  the VPU inside the DMA/compute overlap window (SURVEY.md §7 hard part 3),
  never round-tripping dequantized data through HBM.
- GQA: the query-head group (Hq/Hkv rows) forms the matmul's row block, so
  one KV stream serves all of its query heads (the reference is single-head,
  README.md:7; this is the TPU-idiomatic generalization).
- Per-sequence lengths arrive via scalar prefetch (SMEM); blocks past the
  length are predicated off, and the crossing block masks with the
  large-finite sentinel (AttentionKernel+Softmax.swift:228-260).
- Online-softmax state (m, l) carries across KV blocks exactly like the
  forward kernel — decode is the traversal loop with a 1-row parallel dim.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from mfa_tpu.kernels.flash_fwd import MASK_VALUE, _cdiv
from mfa_tpu.kernels.quant import fp8_max

INT8_MAX = 127.0

# Integer domain for the fp8→bf16 twiddle below. "i32" is the round-4
# production path; "u16" runs the identical ops on uint16 lanes (2 elements
# per 32-bit VPU lane IF Mosaic packs them — the round-5 hypothesis for
# lifting the fp8 contiguous kernel from 0.66 of stream SoL). Round-5
# outcome: REFUTED AT COMPILE — Mosaic rejects the u16 shift/bitcast inside
# a Pallas kernel on v5e (tpu_compile_helper exit 1, same lowering gap as
# the int8 shifts the round-4 kernels already work around), while the
# identical ops compile through plain XLA (bit-exactness locked by
# tests/test_decode.py::test_fp8_convert_domains_bit_exact). "i32" stays
# the production path; the flag stays for a re-probe when a newer Mosaic
# lands. scripts/ab_fp8_convert.py is the harness.
FP8_CONVERT_DOMAIN = "i32"


def fp8_to_bf16(x, kind: str = "e4m3"):
    """Bit-twiddled fp8 → bf16 widening (both are 1-sign/ke-exp/km-mant with
    the mantissa a prefix of bf16's, so widening is a shift plus an exponent
    re-bias — 5 integer VPU ops per element).

    v5e has no fp8 datapath; Mosaic's generic fp8→bf16 convert measured
    ~9 ns/element in the round-4 decode profile (~450 us/layer at 8B decode
    shapes, 10x the whole KV stream). This path:

        bf16_bits = (sign << 8) | ((bits & 0x7F) << (7-km)) + ((127-bias) << 7)

    Exact for every normal (the re-biased exponent and shifted mantissa land
    exactly; no carry since mantissa<<shift < 2^7). Subnormals and ±0 map to
    ~±2^-7·(1+m/2^km) instead of their true ~0 value — after per-token
    scaling that is ≤ amax/57k absolute, ~3 orders below the fp8
    quantization error itself (budget 6e-2, tests/test_decode.py); NaN
    (absent from quantize_fp8's clipped output) would map to a large finite.
    """
    shift, rebias = (4, 120) if kind == "e4m3" else (5, 112)
    if FP8_CONVERT_DOMAIN == "u16":
        # Same twiddle on uint16 lanes. Magnitude maxes at 0x7F0+0x3C00
        # (e4m3) / 0xFE0+0x3800 (e5m2) — no u16 overflow; the sign lands
        # exactly on bit 15.
        u = jax.lax.bitcast_convert_type(x, jnp.uint8).astype(jnp.uint16)
        mag = ((u & jnp.uint16(0x7F)) << shift) + jnp.uint16(rebias << 7)
        bits = ((u & jnp.uint16(0x80)) << 8) | mag
        return jax.lax.bitcast_convert_type(bits, jnp.bfloat16)
    u = jax.lax.bitcast_convert_type(x, jnp.uint8).astype(jnp.int32)
    mag = ((u & 0x7F) << shift) + (rebias << 7)
    bits = ((u & 0x80) << 8) | mag
    return jax.lax.bitcast_convert_type(bits.astype(jnp.uint16),
                                        jnp.bfloat16)


def _fp8_kind(dtype) -> str | None:
    d = jnp.dtype(dtype)
    if d == jnp.dtype(jnp.float8_e4m3fn):
        return "e4m3"
    if d == jnp.dtype(jnp.float8_e5m2):
        return "e5m2"
    return None


def _make_convert(kv_dtype, compute_dtype):
    """storage → compute-dtype convert for quantized caches."""
    kind = _fp8_kind(kv_dtype)
    if kind is not None and jnp.dtype(compute_dtype) == jnp.bfloat16:
        return functools.partial(fp8_to_bf16, kind=kind)
    return lambda x: x.astype(compute_dtype)


def _decode_kernel_single(
    # scalar prefetch
    lengths_ref,
    # inputs
    q_ref, k_ref, v_ref, ks_ref, vs_ref,
    # outputs
    o_ref,
    *,
    num_kv_heads: int,
    quantized: bool,
    int8_mxu: bool,
    compute_dtype,
    convert,
    sliding_window: int | None = None,
):
    """Whole-cache-per-step decode body (the common case: one KV block).

    No online-softmax scratch, no pl.when, no lax.cond — round-3 profiling
    measured the predication/state machinery at ~10x the actual stream cost
    (677 us vs 54 us for naive XLA at the same shapes).

    ``int8_mxu``: the INT8-cache fast path keeps the MXU in the quantized
    domain instead of dequantizing the K/V stream on the VPU. v5e's VPU
    dequant rate (~320G elem/s at 3 ops/elem) is 2.5x SLOWER than the
    int8 HBM stream itself, so "dequant inside the DMA window" can never
    reach the bandwidth roofline — instead:

        S = (q_s8 · K_s8) ⊙ qscale ⊙ ks^T     (s8·s8→s32 MXU, per-column
                                               scales factor out exactly)
        P' = softmax-numerator(P) ⊙ vs^T      (vs folds into P BEFORE the
                                               PV contraction)
        O  = (P'_s8 · V_s8) ⊙ pscale / l      (s8·s8→s32 MXU)

    VPU work drops from O(L·D) dequant to O(G·L) epilogues — ~64x less.
    Q/P requantization adds ~1/254 relative rounding, well inside the 6e-2
    INT8-KV budget (tests/test_decode.py).
    """
    bh = pl.program_id(0)
    b = bh // num_kv_heads
    length = lengths_ref[b]

    q = q_ref[0]                                   # (G, D), prescaled
    k = k_ref[0]
    v = v_ref[0]
    L = k.shape[0]

    col = jax.lax.broadcasted_iota(jnp.int32, (1, L), 1)
    live = col < length
    if sliding_window is not None:
        live &= col >= jnp.maximum(length - sliding_window, 0)

    if int8_mxu:
        qf = q.astype(jnp.float32)
        qa = jnp.max(jnp.abs(qf), axis=-1, keepdims=True)
        qscale = jnp.maximum(qa, 1e-30) / INT8_MAX
        q_s8 = jnp.clip(jnp.round(qf / qscale), -INT8_MAX,
                        INT8_MAX).astype(jnp.int8)
        s32 = jax.lax.dot_general(
            q_s8, k, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.int32)
        s = s32.astype(jnp.float32) * qscale * ks_ref[0]
    else:
        # FP8 (or BF16-stored) cache: per-token K scales factor out of the
        # QK^T contraction exactly — S[g,l] = ks[l]·Σ_d q[g,d]·k_raw[l,d] —
        # so the VPU does ONE convert per element (fp8→bf16, unavoidable on
        # v5e) plus an O(G·L) scale epilogue, not the 3-op O(L·D) dequant
        # (convert + scale-mul + downcast) that capped FP8 decode at 0.29
        # SoL in round 3 (docs/MEASUREMENTS.md).
        kk = convert(k) if quantized else k
        s = jax.lax.dot_general(
            q, kk, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32)
        if quantized:
            s = s * ks_ref[0]

    s = jnp.where(live, s, MASK_VALUE)
    m = jnp.max(s, axis=-1, keepdims=True)
    p = jnp.exp2(s - m)                            # (G, L)
    l = jnp.maximum(jnp.sum(p, axis=-1, keepdims=True), 1e-37)

    if int8_mxu:
        pv = p * vs_ref[0]                         # fold per-token V scale
        pa = jnp.max(jnp.abs(pv), axis=-1, keepdims=True)
        pscale = jnp.maximum(pa, 1e-30) / INT8_MAX
        p_s8 = jnp.clip(jnp.round(pv / pscale), -INT8_MAX,
                        INT8_MAX).astype(jnp.int8)
        o32 = jax.lax.dot_general(
            p_s8, v, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.int32)
        o = o32.astype(jnp.float32) * pscale / l
    else:
        # Same factoring on the PV side: O[g,d] = Σ_l (p[g,l]·vs[l])·
        # v_raw[l,d], so the per-token V scale folds into P (O(G·L))
        # before the contraction and V needs only the raw convert.
        if quantized:
            p = p * vs_ref[0]
        vv = convert(v) if quantized else v
        o = jax.lax.dot_general(
            p.astype(compute_dtype), vv, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32) / l
    # Empty slot (length 0): every column is masked, m == sentinel, and the
    # masked p's are exp2(0)=1 — o would be a bogus mean of V. Emit zeros
    # (scheduler slots with length 0 are inactive; their output must be
    # inert).
    o_ref[0] = jnp.where(m == MASK_VALUE, 0.0, o).astype(o_ref.dtype)


def _decode_kernel(
    # scalar prefetch
    lengths_ref,
    # inputs
    q_ref, k_ref, v_ref, ks_ref, vs_ref,
    # outputs
    o_ref,
    # scratch
    m_scr, l_scr, acc_scr,
    *,
    num_kv_heads: int,
    block_kv: int,
    quantized: bool,
    compute_dtype,
    convert,
    sliding_window: int | None = None,
):
    bh = pl.program_id(0)
    j = pl.program_id(1)
    b = bh // num_kv_heads
    length = lengths_ref[b]
    # Sliding window: the decode token attends keys [length - W, length).
    win_start = (jnp.maximum(length - sliding_window, 0)
                 if sliding_window is not None else 0)

    @pl.when(j == 0)
    def _init():
        m_scr[...] = jnp.full_like(m_scr, MASK_VALUE)
        l_scr[...] = jnp.zeros_like(l_scr)
        acc_scr[...] = jnp.zeros_like(acc_scr)

    @pl.when((j * block_kv < length) & ((j + 1) * block_kv > win_start))
    def _body():
        q = q_ref[0]                                   # (group, d), prescaled
        k = k_ref[0]                                   # (bkv, d) storage dtype
        # Per-token scales factor out of the contraction (see
        # _decode_kernel_single): raw convert on the VPU, scale as an
        # O(group, bkv) epilogue on S instead of an O(bkv, d) dequant.
        if quantized:
            k = convert(k)
        s = jax.lax.dot_general(
            q, k,
            dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        )                                              # (group, bkv)
        if quantized:
            s = s * ks_ref[0]

        # Unconditional length/window mask: the S tile is only
        # (group, block_kv) — a lax.cond here costs more than the select
        # (the round-3 causal A/B: cond materializes branch buffers and
        # stalls the pipeline; same pathology measured in this kernel).
        col = j * block_kv + jax.lax.broadcasted_iota(
            jnp.int32, (1, s.shape[1]), 1)
        live = col < length
        if sliding_window is not None:
            live &= col >= win_start
        s = jnp.where(live, s, MASK_VALUE)

        m_prev = m_scr[...]                            # (group, 1)
        m_new = jnp.maximum(m_prev, jnp.max(s, axis=-1, keepdims=True))
        corr = jnp.exp2(m_prev - m_new)
        p = jnp.exp2(s - m_new)
        l_scr[...] = corr * l_scr[...] + jnp.sum(p, axis=-1, keepdims=True)
        m_scr[...] = m_new

        v = v_ref[0]
        if quantized:
            # Fold the per-token V scale into P (O(group, bkv)); the
            # accumulator then carries the fully-scaled partial O.
            p = p * vs_ref[0]
            v = convert(v)
        pv = jax.lax.dot_general(
            p.astype(compute_dtype), v,
            dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        acc_scr[...] = acc_scr[...] * corr + pv

    @pl.when(j == pl.num_programs(1) - 1)
    def _finalize():
        l_safe = jnp.maximum(l_scr[...], 1e-37)
        empty = m_scr[...] == MASK_VALUE     # length-0 slot (see single)
        o_ref[0] = jnp.where(empty, 0.0,
                             acc_scr[...] / l_safe).astype(o_ref.dtype)


def build_decode(
    *,
    batch: int,
    num_kv_heads: int,
    group: int,
    max_len: int,
    d_pad: int,
    block_kv: int,
    kv_dtype,
    q_dtype,
    o_dtype,
    quantized: bool,
    sliding_window: int | None = None,
    interpret: bool = False,
):
    """Decode attention over a contiguous (optionally quantized) KV cache.

    Operands:
      lengths  [batch] int32                      (scalar prefetch)
      q        [B*Hkv, group, d_pad]              (pre-scaled by scale·log2e)
      k, v     [B*Hkv, max_len, d_pad]            storage dtype
      k_s, v_s [B*Hkv, 1, max_len] f32            (lane-contiguous per-token
                                                   scales; dummies when
                                                   unquantized)
    Returns o [B*Hkv, group, d_pad] in o_dtype.
    """
    bh = batch * num_kv_heads
    num_kv_blocks = _cdiv(max_len, block_kv)
    compute_dtype = jnp.bfloat16 if jnp.dtype(q_dtype) == jnp.bfloat16 else jnp.float32
    convert = _make_convert(kv_dtype, compute_dtype)

    if num_kv_blocks == 1:
        kernel = functools.partial(
            _decode_kernel_single,
            num_kv_heads=num_kv_heads,
            quantized=quantized,
            int8_mxu=quantized and jnp.dtype(kv_dtype) == jnp.int8,
            compute_dtype=compute_dtype,
            convert=convert,
            sliding_window=sliding_window,
        )

        def hm(bh_, j, lengths_ref):
            return (bh_, 0, 0)

        grid_spec = pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=(bh, 1),
            in_specs=[
                pl.BlockSpec((1, group, d_pad), hm),
                pl.BlockSpec((1, block_kv, d_pad), hm),
                pl.BlockSpec((1, block_kv, d_pad), hm),
                pl.BlockSpec((1, 1, block_kv), hm),
                pl.BlockSpec((1, 1, block_kv), hm),
            ],
            out_specs=pl.BlockSpec((1, group, d_pad), hm),
            scratch_shapes=[],
        )
        kv_bytes = jnp.dtype(kv_dtype).itemsize
        return pl.pallas_call(
            kernel,
            grid_spec=grid_spec,
            out_shape=jax.ShapeDtypeStruct((bh, group, d_pad), o_dtype),
            compiler_params=pltpu.CompilerParams(
                dimension_semantics=("arbitrary", "arbitrary"),
            ),
            cost_estimate=pl.CostEstimate(
                flops=4 * bh * group * max_len * d_pad,
                bytes_accessed=2 * bh * max_len * d_pad * kv_bytes,
                transcendentals=bh * group * max_len,
            ),
            interpret=interpret,
        )

    kernel = functools.partial(
        _decode_kernel,
        num_kv_heads=num_kv_heads,
        block_kv=block_kv,
        quantized=quantized,
        compute_dtype=compute_dtype,
        convert=convert,
        sliding_window=sliding_window,
    )

    # PrefetchScalarGridSpec index maps receive the scalar-prefetch refs as
    # a trailing argument.
    def head_map(bh_, j, lengths_ref):
        return (bh_, 0, 0)

    def kv_map(bh_, j, lengths_ref):
        return (bh_, j, 0)

    def scale_map(bh_, j, lengths_ref):
        return (bh_, 0, j)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(bh, num_kv_blocks),
        in_specs=[
            pl.BlockSpec((1, group, d_pad), head_map),      # q
            pl.BlockSpec((1, block_kv, d_pad), kv_map),     # k
            pl.BlockSpec((1, block_kv, d_pad), kv_map),     # v
            pl.BlockSpec((1, 1, block_kv), scale_map),      # k scales
            pl.BlockSpec((1, 1, block_kv), scale_map),      # v scales
        ],
        out_specs=pl.BlockSpec((1, group, d_pad), head_map),
        scratch_shapes=[
            pltpu.VMEM((group, 1), jnp.float32),            # m
            pltpu.VMEM((group, 1), jnp.float32),            # l
            pltpu.VMEM((group, d_pad), jnp.float32),        # acc
        ],
    )

    kv_bytes = jnp.dtype(kv_dtype).itemsize

    return pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((bh, group, d_pad), o_dtype),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "arbitrary"),
        ),
        cost_estimate=pl.CostEstimate(
            flops=4 * bh * group * max_len * d_pad,
            bytes_accessed=2 * bh * max_len * d_pad * kv_bytes,
            transcendentals=bh * group * max_len,
        ),
        interpret=interpret,
    )


# ---------------------------------------------------------------------------
# Fused append + decode: the cache write rides the attention kernel
# ---------------------------------------------------------------------------


def _decode_fused_kernel(
    # scalar prefetch
    lengths_ref,
    # inputs
    q_ref, k_ref, v_ref, ks_ref, vs_ref, kn_ref, vn_ref,
    # outputs
    o_ref, ko_ref, vo_ref, kso_ref, vso_ref,
    *,
    num_kv_heads: int,
    quantized: bool,
    int8_mxu: bool,
    fp8: bool,
    compute_dtype,
    convert,
    sliding_window: int | None = None,
):
    """Whole-cache decode body that ALSO appends the step's new K/V token.

    Round-4 finding: the separate per-layer cache append (4 vmapped
    dynamic-update-slices → XLA scatters) measured 93-104 us/layer at 8B
    decode shapes — ~2x the entire attention kernel after its own fixes.
    Fusing the append here reduces it to one quantize of a (1, D) row on
    the VPU, a one-row output DMA (cache arrays are input/output aliased;
    only the written row moves), and a full scale-row rewrite (~8 KiB).

    The new token's attention column is computed from the UNQUANTIZED
    k_new/v_new (better: no double-rounding of the current token), so the
    cache row at ``length`` — stale input data this step — stays masked
    out exactly as in the unfused kernel.
    """
    bh = pl.program_id(0)
    b = bh // num_kv_heads
    length = lengths_ref[b]

    q = q_ref[0]                                   # (G, D), prescaled
    k = k_ref[0]
    v = v_ref[0]
    kn = kn_ref[0].astype(jnp.float32)             # (1, D) roped new K
    vn = vn_ref[0].astype(jnp.float32)             # (1, D) new V
    L = k.shape[0]

    col = jax.lax.broadcasted_iota(jnp.int32, (1, L), 1)
    live = col < length
    if sliding_window is not None:
        # The new token sits at index `length`; it attends [length+1-W, length].
        live &= col >= jnp.maximum(length + 1 - sliding_window, 0)

    # --- S over the cache + the new token's column ---
    s_new = jax.lax.dot_general(                   # (G, 1) — q is prescaled
        q.astype(jnp.float32), kn, (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32)

    if int8_mxu:
        qf = q.astype(jnp.float32)
        qa = jnp.max(jnp.abs(qf), axis=-1, keepdims=True)
        qscale = jnp.maximum(qa, 1e-30) / INT8_MAX
        q_s8 = jnp.clip(jnp.round(qf / qscale), -INT8_MAX,
                        INT8_MAX).astype(jnp.int8)
        s32 = jax.lax.dot_general(
            q_s8, k, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.int32)
        s = s32.astype(jnp.float32) * qscale * ks_ref[0]
    else:
        kk = convert(k) if quantized else k
        s = jax.lax.dot_general(
            q, kk, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32)
        if quantized:
            s = s * ks_ref[0]

    s = jnp.where(live, s, MASK_VALUE)
    m = jnp.maximum(jnp.max(s, axis=-1, keepdims=True), s_new)
    p = jnp.exp2(s - m)                            # (G, L)
    p_new = jnp.exp2(s_new - m)                    # (G, 1)
    l = jnp.maximum(jnp.sum(p, axis=-1, keepdims=True) + p_new, 1e-37)

    if int8_mxu:
        pv = p * vs_ref[0]
        pa = jnp.max(jnp.abs(pv), axis=-1, keepdims=True)
        pscale = jnp.maximum(pa, 1e-30) / INT8_MAX
        p_s8 = jnp.clip(jnp.round(pv / pscale), -INT8_MAX,
                        INT8_MAX).astype(jnp.int8)
        o32 = jax.lax.dot_general(
            p_s8, v, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.int32)
        o = (o32.astype(jnp.float32) * pscale + p_new * vn) / l
    else:
        if quantized:
            p = p * vs_ref[0]
        vv = convert(v) if quantized else v
        o = (jax.lax.dot_general(
            p.astype(compute_dtype), vv, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32) + p_new * vn) / l
    o_ref[0] = o.astype(o_ref.dtype)

    # --- append: quantize the new row + splice its scale lane ---
    if quantized:
        # fp8 maxq keys on the storage kind (448 e4m3 / 57344 e5m2),
        # matching quantize_fp8 so fused-append rows stay bitwise-identical
        # to update()'s.
        maxq = fp8_max(ko_ref.dtype) if fp8 else INT8_MAX
        ka = jnp.max(jnp.abs(kn))
        va = jnp.max(jnp.abs(vn))
        kscale = jnp.maximum(ka, 1e-8) / maxq
        vscale = jnp.maximum(va, 1e-8) / maxq
        if fp8:
            krow = (kn / kscale).astype(ko_ref.dtype)
            vrow = (vn / vscale).astype(vo_ref.dtype)
        else:
            krow = jnp.clip(jnp.round(kn / kscale), -INT8_MAX,
                            INT8_MAX).astype(jnp.int8)
            vrow = jnp.clip(jnp.round(vn / vscale), -INT8_MAX,
                            INT8_MAX).astype(jnp.int8)
    else:
        kscale = jnp.float32(1.0)
        vscale = jnp.float32(1.0)
        krow = kn.astype(ko_ref.dtype)
        vrow = vn.astype(vo_ref.dtype)
    # Mosaic requires output block sublanes divisible by 8: write an
    # 8-row aligned window (read-modify-write — the window rows come from
    # the already-resident full cache block, so no extra DMA).
    # Clamp to the last in-bounds window: once length reaches capacity
    # (an idle slot a long-running scheduler kept stepping), the unclamped
    # win_start would read k_ref[0, max_len:max_len+8] OOB and clobber the
    # slot's last 8 rows; clamped, row_in_win lands >= 8, rsel is all
    # false, and the window writes back unchanged.
    # (clamp BEFORE the //8*8 floor — Mosaic must statically prove the
    # pl.ds start is a multiple of 8, which min(x*8, L-8) obscures)
    win_start = (jnp.minimum(length, L - 1) // 8) * 8
    row_in_win = length - win_start
    rsel = jax.lax.broadcasted_iota(jnp.int32, (8, 1), 0) == row_in_win
    # Ref-level dynamic slice (value-level lax.dynamic_slice is not
    # lowerable by Mosaic; ref reads with pl.ds are).
    k_win = k_ref[0, pl.ds(win_start, 8), :]
    v_win = v_ref[0, pl.ds(win_start, 8), :]
    ko_ref[0] = jnp.where(rsel, jnp.broadcast_to(krow, (8, krow.shape[1])),
                          k_win)
    vo_ref[0] = jnp.where(rsel, jnp.broadcast_to(vrow, (8, vrow.shape[1])),
                          v_win)
    lane = col == length                           # (1, L)
    kso_ref[0] = jnp.where(lane, kscale, ks_ref[0])
    vso_ref[0] = jnp.where(lane, vscale, vs_ref[0])


def build_decode_fused_append(
    *,
    batch: int,
    num_kv_heads: int,
    group: int,
    max_len: int,
    d_pad: int,
    kv_dtype,
    q_dtype,
    o_dtype,
    quantized: bool,
    sliding_window: int | None = None,
    interpret: bool = False,
):
    """Fused append+decode over a whole-cache block (max_len must satisfy
    the single-block VMEM budget — the wrapper falls back to the unfused
    two-pass path otherwise).

    Operands:
      lengths  [batch] int32 (PRE-append lengths; scalar prefetch)
      q        [B*Hkv, group, d_pad]  pre-scaled
      k, v     [B*Hkv, max_len, d_pad]  storage dtype  (donated, aliased)
      k_s, v_s [B*Hkv, 1, max_len] f32                 (donated, aliased)
      k_new, v_new [B*Hkv, 1, d_pad]  compute dtype
    Returns (o, k, v, k_s, v_s) with the new token written at ``lengths``.
    """
    bh = batch * num_kv_heads
    compute_dtype = (jnp.bfloat16 if jnp.dtype(q_dtype) == jnp.bfloat16
                     else jnp.float32)
    kernel = functools.partial(
        _decode_fused_kernel,
        num_kv_heads=num_kv_heads,
        quantized=quantized,
        int8_mxu=quantized and jnp.dtype(kv_dtype) == jnp.int8,
        fp8=_fp8_kind(kv_dtype) is not None,
        compute_dtype=compute_dtype,
        convert=_make_convert(kv_dtype, compute_dtype),
        sliding_window=sliding_window,
    )

    def hm(bh_, j, lengths_ref):
        return (bh_, 0, 0)

    def sm(bh_, j, lengths_ref):
        return (bh_, 0, 0)

    def row_out(bh_, j, lengths_ref):
        # 8-row aligned write window containing the append position
        # (Mosaic block-divisibility; the kernel RMWs the window).
        b = bh_ // num_kv_heads
        return (bh_, jnp.minimum(lengths_ref[b], max_len - 1) // 8, 0)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(bh, 1),
        in_specs=[
            pl.BlockSpec((1, group, d_pad), hm),       # q
            pl.BlockSpec((1, max_len, d_pad), hm),     # k cache
            pl.BlockSpec((1, max_len, d_pad), hm),     # v cache
            pl.BlockSpec((1, 1, max_len), sm),         # k scales
            pl.BlockSpec((1, 1, max_len), sm),         # v scales
            pl.BlockSpec((1, 1, d_pad), hm),           # k_new
            pl.BlockSpec((1, 1, d_pad), hm),           # v_new
        ],
        out_specs=[
            pl.BlockSpec((1, group, d_pad), hm),       # o
            pl.BlockSpec((1, 8, d_pad), row_out),      # k row window
            pl.BlockSpec((1, 8, d_pad), row_out),      # v row window
            pl.BlockSpec((1, 1, max_len), sm),         # k scales (RMW)
            pl.BlockSpec((1, 1, max_len), sm),         # v scales (RMW)
        ],
        scratch_shapes=[],
    )
    kv_bytes = jnp.dtype(kv_dtype).itemsize
    return pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=[
            jax.ShapeDtypeStruct((bh, group, d_pad), o_dtype),
            jax.ShapeDtypeStruct((bh, max_len, d_pad), kv_dtype),
            jax.ShapeDtypeStruct((bh, max_len, d_pad), kv_dtype),
            jax.ShapeDtypeStruct((bh, 1, max_len), jnp.float32),
            jax.ShapeDtypeStruct((bh, 1, max_len), jnp.float32),
        ],
        # Cache arrays are updated in place: input index (counting the
        # scalar-prefetch operand first) -> output index.
        input_output_aliases={2: 1, 3: 2, 4: 3, 5: 4},
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary", "arbitrary"),
        ),
        cost_estimate=pl.CostEstimate(
            flops=4 * bh * group * max_len * d_pad,
            bytes_accessed=2 * bh * max_len * d_pad * kv_bytes,
            transcendentals=bh * group * max_len,
        ),
        interpret=interpret,
    )
