"""Quantization primitives: INT8/FP8/INT4 with scales.

The reference documents quantized operand formats as the intended extension
of its precision enum (GEMMOperandPrecision.swift:12-28 sketches INT8/FP8/
palletized); the north star requires them implemented: INT8/FP8 KV cache
with dequant fused into the attention matmuls and INT4/INT8 weight-only
projections (BASELINE.json).

Conventions:
- Per-token (row) scales for activations/KV: scale over the trailing
  feature axis, stored as [..., 1] so Mosaic block rules are satisfied.
- Per-output-channel scales for weights: scale over the input axis.
- INT4 packs two nibbles per int8 byte along the LAST axis (even index →
  low nibble), so a [n, k] int4 weight stores as [n, k//2] int8.
- FP8: e4m3 for values (range ±448), e5m2 reserved for gradients — on
  v5e the MXU is bf16-native, so fp8 is a *storage* format dequantized on
  the VPU inside kernels (half the KV HBM traffic, which is the decode
  bottleneck); on v6e the MXU can consume it directly.
"""

from __future__ import annotations

from dataclasses import dataclass
from functools import partial

import jax
import jax.numpy as jnp


@partial(jax.tree_util.register_dataclass,
         data_fields=["w", "scale"], meta_fields=["kind"])
@dataclass(frozen=True)
class QuantizedWeight:
    """A weight-only quantized projection: jit/shard-friendly pytree.

    kind "int8": w [in, out] int8, scale [1, out] f32.
    kind "int4": w [out, in/2] packed int8, scale [out, 1] f32.
    """

    w: jnp.ndarray
    scale: jnp.ndarray
    kind: str


INT8_MAX = 127.0
FP8_E4M3_MAX = 448.0
FP8_E5M2_MAX = 57344.0
INT4_MAX = 7.0


def fp8_max(dtype) -> float:
    """Dynamic-range max for an fp8 storage dtype (quantizer + fused-append
    kernel key their scale on this so e5m2 uses its actual exponent range
    instead of inheriting e4m3's 448)."""
    return (FP8_E5M2_MAX if jnp.dtype(dtype) == jnp.dtype(jnp.float8_e5m2)
            else FP8_E4M3_MAX)


def quantize_int8(x, axis: int = -1):
    """Symmetric per-row int8 quantization.

    Returns (values int8, scales f32 with ``axis`` kept as size 1):
    x ≈ values * scales.
    """
    xf = x.astype(jnp.float32)
    amax = jnp.max(jnp.abs(xf), axis=axis, keepdims=True)
    scale = jnp.maximum(amax, 1e-8) / INT8_MAX
    q = jnp.clip(jnp.round(xf / scale), -INT8_MAX, INT8_MAX).astype(jnp.int8)
    return q, scale


def quantize_fp8(x, axis: int = -1, dtype=jnp.float8_e4m3fn):
    """Scaled fp8 storage: x ≈ values.astype(f32) * scales. The scale is
    keyed on the dtype's own max (448 e4m3 / 57344 e5m2)."""
    xf = x.astype(jnp.float32)
    amax = jnp.max(jnp.abs(xf), axis=axis, keepdims=True)
    scale = jnp.maximum(amax, 1e-8) / fp8_max(dtype)
    q = (xf / scale).astype(dtype)
    return q, scale


def dequantize(values, scales, dtype=jnp.float32):
    return values.astype(jnp.float32).__mul__(scales).astype(dtype)


def quantize_int4(x, axis: int = -1):
    """Symmetric int4; returns (packed int8 [..., k/2], scales).

    Packing is along the last axis regardless of ``axis`` (the scale axis):
    value i sits in nibble i%2 of byte i//2.
    """
    xf = x.astype(jnp.float32)
    amax = jnp.max(jnp.abs(xf), axis=axis, keepdims=True)
    scale = jnp.maximum(amax, 1e-8) / INT4_MAX
    q = jnp.clip(jnp.round(xf / scale), -INT4_MAX, INT4_MAX).astype(jnp.int8)
    if q.shape[-1] % 2 != 0:
        raise ValueError(f"int4 packing needs even last dim, got {q.shape}")
    lo = q[..., 0::2] & 0x0F
    hi = (q[..., 1::2] & 0x0F) << 4
    return (lo | hi).astype(jnp.int8), scale


def unpack_int4(packed):
    """[..., k/2] int8 → [..., k] int8 in [-7, 7]."""
    lo = (packed << 4).astype(jnp.int8) >> 4          # sign-extend low nibble
    hi = packed >> 4                                   # arithmetic shift
    out = jnp.stack([lo, hi], axis=-1)
    return out.reshape(*packed.shape[:-1], packed.shape[-1] * 2)


def dequantize_int4(packed, scales, dtype=jnp.float32):
    return (unpack_int4(packed).astype(jnp.float32) * scales).astype(dtype)


# ---------------------------------------------------------------------------
# Half-split INT4 weight packing + fused dequant matmul (round 4)
# ---------------------------------------------------------------------------


def pack_int4_halves(w, axis_scale: int = 0):
    """Weight-only INT4 in HALF-SPLIT layout: byte[i, o] holds w[i, o] in
    the low nibble and w[i + K/2, o] in the high nibble (K = contraction
    dim). Unlike nibble-interleaved packing, unpacking produces two full
    contiguous row-halves — NO sublane/lane interleave — so a Pallas kernel
    dequantizes a (bk/2, bn) packed block into two (bk/2, bn) operand tiles
    with pure elementwise shifts and feeds the MXU directly. (The
    interleaved layout forced a full-weight HBM materialization through
    XLA: the round-4 INT4 decode bench measured 34 tok/s, 0.035 of SoL.)

    w: [K, N] float → (packed [K/2, N] int8, scale [1, N] f32) with
    per-output-channel scales over the contraction axis.
    """
    wf = w.astype(jnp.float32)
    k = wf.shape[0]
    if k % 2 != 0:
        raise ValueError(f"half-split int4 needs even contraction dim, "
                         f"got {wf.shape}")
    amax = jnp.max(jnp.abs(wf), axis=0, keepdims=True)
    scale = jnp.maximum(amax, 1e-8) / INT4_MAX
    q = jnp.clip(jnp.round(wf / scale), -INT4_MAX, INT4_MAX).astype(jnp.int8)
    lo = q[: k // 2] & 0x0F
    hi = (q[k // 2 :] & 0x0F) << 4
    return (lo | hi).astype(jnp.int8), scale


def unpack_int4_halves(packed):
    """[K/2, N] int8 → (low_half [K/2, N], high_half [K/2, N]) int8 in
    [-7, 7] (rows 0..K/2-1 and K/2..K-1 of the logical weight)."""
    lo = ((packed << 4).astype(jnp.int8)) >> 4        # sign-extend
    hi = packed >> 4                                   # arithmetic shift
    return lo, hi


INT4_BIAS = 8


def pack_int4_biased(w):
    """Half-split packing with +8-biased UNSIGNED nibbles (round 5).

    Same geometry as ``pack_int4_halves`` (byte[i, o] = rows i and i+K/2),
    but each stored nibble is q+8 ∈ [1, 15], so the in-kernel unpack on a
    zero-extended uint8 is just ``b & 15`` and ``b >> 4`` — 3 integer VPU
    ops per byte instead of the signed path's 4 (widen + ``<<28 >>28``
    sign-extension round trip + ``>>4``). The −8 bias never touches the
    weights again: x @ (Wb − 8) = x @ Wb − 8·rowsum(x), and the rowsum
    term is O(M·K) — negligible next to the O(K·N/2) weight stream the
    kernel exists to protect. (Reference analogue: the signed-nibble
    unpack cost is the Metal port's motivation for blocked dequant,
    /root/reference's quantized GEMM docs; the bias+rowsum identity is the
    standard w4a16 trick restated for the TPU VPU.)

    w: [K, N] float → (packed [K/2, N] uint8, scale [1, N] f32).
    """
    wf = w.astype(jnp.float32)
    k = wf.shape[0]
    if k % 2 != 0:
        raise ValueError(f"half-split int4 needs even contraction dim, "
                         f"got {wf.shape}")
    amax = jnp.max(jnp.abs(wf), axis=0, keepdims=True)
    scale = jnp.maximum(amax, 1e-8) / INT4_MAX
    q = jnp.clip(jnp.round(wf / scale), -INT4_MAX, INT4_MAX).astype(jnp.int32)
    qb = (q + INT4_BIAS).astype(jnp.uint8)            # [1, 15]
    lo = qb[: k // 2]
    hi = qb[k // 2 :] << 4
    return (lo | hi).astype(jnp.uint8), scale


def unpack_int4_biased(packed):
    """[K/2, N] uint8 → (low, high) int32 halves in [-7, 7] (bias removed;
    oracle for tests — the fused kernel keeps the bias and corrects via
    rowsum instead)."""
    p32 = packed.astype(jnp.int32)
    return (p32 & 0x0F) - INT4_BIAS, (p32 >> 4) - INT4_BIAS
