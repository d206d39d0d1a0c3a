"""KV cache: contiguous per-sequence cache with optional INT8/FP8 storage.

The stateful component the reference doesn't have (it is a kernel library,
README.md:7); required by the north-star decode path (BASELINE.json:
"INT8/FP8 KV-cache with dequant fused into the QK^T and PV matmuls").

Functional JAX style: the cache is a registered pytree; ``update`` returns
a new cache. Quantization happens per appended token (per-token scales over
the head dim), so the cache never stores high-precision KV.

Layout: [batch, num_kv_heads, max_len, head_dim_padded] — head-dim padded
to 128 lanes once, here, so the decode kernel never repads.
"""

from __future__ import annotations

from dataclasses import dataclass, replace
from functools import partial

import jax
import jax.numpy as jnp

from mfa_tpu.kernels import quant
from mfa_tpu.ops.descriptors import round_up
from mfa_tpu.ops.precision import OperandPrecision


@partial(
    jax.tree_util.register_dataclass,
    data_fields=["k", "v", "k_scale", "v_scale", "lengths"],
    meta_fields=["precision"],
)
@dataclass(frozen=True)
class KVCache:
    k: jnp.ndarray          # [B, Hkv, max_len, D_pad] storage dtype
    v: jnp.ndarray
    # Per-token scales, LANE-CONTIGUOUS layout [B, Hkv, 1, max_len] f32
    # (ones when unquantized). The length axis must be the minor/lane axis:
    # a [.., max_len, 1] layout makes the decode kernel's per-grid-step
    # scale DMA a (block_kv, 1)-shaped transfer — thousands of 4-byte
    # strided descriptors — which round-4 profiling measured as ~190 us of
    # fixed overhead PER LAYER (4x the whole KV stream's speed-of-light).
    k_scale: jnp.ndarray
    v_scale: jnp.ndarray
    lengths: jnp.ndarray    # [B] int32 — tokens currently in the cache
    precision: OperandPrecision

    def dequant(self):
        """(k, v) as fp32 [B, Hkv, max_len, D_pad] — test/oracle helper."""
        ks = jnp.swapaxes(self.k_scale, -1, -2)     # [B, Hkv, L, 1]
        vs = jnp.swapaxes(self.v_scale, -1, -2)
        return (self.k.astype(jnp.float32) * ks,
                self.v.astype(jnp.float32) * vs)

    @property
    def batch(self) -> int:
        return self.k.shape[0]

    @property
    def num_kv_heads(self) -> int:
        return self.k.shape[1]

    @property
    def max_len(self) -> int:
        return self.k.shape[2]

    @property
    def head_dim_padded(self) -> int:
        return self.k.shape[3]

    @property
    def quantized(self) -> bool:
        return self.precision.is_quantized


def create(
    batch: int,
    num_kv_heads: int,
    max_len: int,
    head_dim: int,
    precision: OperandPrecision = OperandPrecision.BF16,
) -> KVCache:
    d_pad = round_up(head_dim, 128)
    # Capacity rounds up to a 128-row multiple so the decode kernel's
    # whole-cache block never needs a pad copy at dispatch (round-3
    # post-mortem: an unaligned 2112-row cache forced a full K/V pad copy
    # per decode call per layer — ~500 us of pure HBM copies at 8B shapes,
    # 5x the kernel itself).
    max_len = round_up(max_len, 128)
    if precision is OperandPrecision.INT8:
        dtype = jnp.int8
    elif precision in (OperandPrecision.FP8_E4M3, OperandPrecision.FP8_E5M2):
        dtype = precision.dtype
    else:
        dtype = precision.dtype
    shape = (batch, num_kv_heads, max_len, d_pad)
    return KVCache(
        k=jnp.zeros(shape, dtype),
        v=jnp.zeros(shape, dtype),
        k_scale=jnp.ones((batch, num_kv_heads, 1, max_len), jnp.float32),
        v_scale=jnp.ones((batch, num_kv_heads, 1, max_len), jnp.float32),
        lengths=jnp.zeros((batch,), jnp.int32),
        precision=precision,
    )


def _quantize_for(precision: OperandPrecision, x):
    """x: [..., T, D_pad] high precision → (storage values, [..., T, 1] scales)."""
    if precision is OperandPrecision.INT8:
        return quant.quantize_int8(x, axis=-1)
    if precision in (OperandPrecision.FP8_E4M3, OperandPrecision.FP8_E5M2):
        return quant.quantize_fp8(x, axis=-1, dtype=precision.dtype)
    return x.astype(precision.dtype), jnp.ones((*x.shape[:-1], 1), jnp.float32)


def update(cache: KVCache, k_new, v_new) -> KVCache:
    """Append T tokens per sequence at each sequence's current length.

    k_new, v_new: [B, Hkv, T, head_dim] (unpadded head dim fine). All
    sequences append the same T (prefill: T = prompt chunk; decode: T = 1);
    per-sequence offsets come from ``cache.lengths``.
    """
    b, hkv, t, d = k_new.shape
    d_pad = cache.head_dim_padded
    if d < d_pad:
        pad = ((0, 0), (0, 0), (0, 0), (0, d_pad - d))
        k_new = jnp.pad(k_new, pad)
        v_new = jnp.pad(v_new, pad)

    kq, ks = _quantize_for(cache.precision, k_new)
    vq, vs = _quantize_for(cache.precision, v_new)
    ks = jnp.swapaxes(ks, -1, -2)   # [B, Hkv, 1, T] (lane-contiguous)
    vs = jnp.swapaxes(vs, -1, -2)

    def upd_seq(buf, new, start):
        # buf [Hkv, max_len, D], new [Hkv, T, D]
        return jax.lax.dynamic_update_slice(buf, new, (0, start, 0))

    def upd_scale(buf, new, start):
        # buf [Hkv, 1, max_len], new [Hkv, 1, T]
        return jax.lax.dynamic_update_slice(buf, new, (0, 0, start))

    upd = jax.vmap(upd_seq)
    upds = jax.vmap(upd_scale)
    starts = cache.lengths
    return replace(
        cache,
        k=upd(cache.k, kq, starts),
        v=upd(cache.v, vq, starts),
        k_scale=upds(cache.k_scale, ks, starts),
        v_scale=upds(cache.v_scale, vs, starts),
        lengths=cache.lengths + t,
    )


def write_slot(cache: KVCache, slot: int, src: KVCache,
               true_len) -> KVCache:
    """Splice a batch-1 cache into ``slot`` of a multi-slot cache, setting
    the slot's length to ``true_len`` (drops any padded tail the source
    appended). Continuous-batching admission path."""
    return replace(
        cache,
        k=cache.k.at[slot].set(src.k[0]),
        v=cache.v.at[slot].set(src.v[0]),
        k_scale=cache.k_scale.at[slot].set(src.k_scale[0]),
        v_scale=cache.v_scale.at[slot].set(src.v_scale[0]),
        lengths=cache.lengths.at[slot].set(true_len),
    )


def reset_slot(cache: KVCache, slot: int) -> KVCache:
    """Free a slot (length 0; data is dead past the length mask)."""
    return replace(cache, lengths=cache.lengths.at[slot].set(0))
