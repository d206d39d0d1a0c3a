"""Public decode-attention API over a KV cache.

Dispatch path mirrors ops/attention.py: descriptor-free fast path (decode
shapes are fixed per serving config), two-level cache keyed on the shape
class, Pallas kernel with fused dequant (kernels/decode.py).
"""

from __future__ import annotations

import functools
import math

import jax
import jax.numpy as jnp

from mfa_tpu.kernels import decode as decode_kernel
from mfa_tpu.kernels.flash_fwd import LOG2E
from mfa_tpu.ops.cache import attention_cache
from mfa_tpu.ops.descriptors import round_up
from mfa_tpu.serving.kv_cache import KVCache


def _choose_block_kv(max_len: int, d_pad: int = 128,
                     kv_itemsize: int = 1) -> int:
    """Decode is bandwidth-bound and the compute per KV block is tiny, so
    per-grid-step overhead dominates unless each step moves a LOT of bytes:
    round-3 profiling measured 0.031 of the KV-stream roofline at
    block_kv=512 (320 grid steps x ~4 us overhead each for a 4-layer
    cache). One whole-length block per (batch, kv-head) — fp8 K+V at 8K
    context is ~2 MiB of VMEM — turns the kernel into a straight
    double-buffered stream. The cap is in BYTES, not rows (a row cap sized
    for 1-byte KV would let a BF16 cache at d_pad=256 allocate ~4 MiB K and
    V blocks each before pipelining buffers — past scoped VMEM on v5e):
    K + V blocks together stay under ~2 MiB per pipeline buffer."""
    row_bytes = 2 * d_pad * kv_itemsize          # one K row + one V row
    cap_rows = max((2 * 1024 * 1024) // row_bytes // 128 * 128, 128)
    return min(round_up(max_len, 128), cap_rows)


def decode_attention(
    q,
    cache: KVCache,
    *,
    scale: float | None = None,
    sliding_window: int | None = None,
    interpret: bool | None = None,
):
    """One-token GQA attention against the cache.

    q: [B, Hq, head_dim] (the new token's queries; Hq must be a multiple of
    the cache's KV heads). Returns [B, Hq, head_dim] in q.dtype.
    Rows past each sequence's ``cache.lengths`` are ignored.
    """
    if interpret is None:
        interpret = jax.default_backend() == "cpu"
    b, hq, d = q.shape
    hkv = cache.num_kv_heads
    if hq % hkv != 0:
        raise ValueError(f"num_q_heads ({hq}) must be a multiple of "
                         f"num_kv_heads ({hkv})")
    group = hq // hkv
    d_pad = cache.head_dim_padded
    max_len = cache.max_len
    if scale is None:
        scale = 1.0 / math.sqrt(d)

    # Pre-scale and fold log2(e) (the forward kernel's trick) — exp2 domain.
    qs = (q.astype(jnp.float32) * (scale * LOG2E)).astype(q.dtype)
    if d < d_pad:
        qs = jnp.pad(qs, ((0, 0), (0, 0), (0, d_pad - d)))
    q3 = qs.reshape(b, hkv, group, d_pad).reshape(b * hkv, group, d_pad)

    block_kv = _choose_block_kv(max_len, d_pad,
                                jnp.dtype(cache.k.dtype).itemsize)
    key = ("decode", b, hkv, group, max_len, d_pad, block_kv,
           str(cache.k.dtype), str(q.dtype), cache.quantized,
           sliding_window, interpret)
    build = functools.partial(
        decode_kernel.build_decode,
        batch=b,
        num_kv_heads=hkv,
        group=group,
        max_len=round_up(max_len, block_kv),
        d_pad=d_pad,
        block_kv=block_kv,
        kv_dtype=cache.k.dtype,
        q_dtype=q.dtype,
        o_dtype=q.dtype,
        quantized=cache.quantized,
        sliding_window=sliding_window,
        interpret=interpret,
    )
    fn = attention_cache.get_pipeline(key, key, build, lambda kern: kern)

    bh = b * hkv
    k3 = cache.k.reshape(bh, max_len, d_pad)
    v3 = cache.v.reshape(bh, max_len, d_pad)
    ks3 = cache.k_scale.reshape(bh, 1, max_len)
    vs3 = cache.v_scale.reshape(bh, 1, max_len)
    m_pad = round_up(max_len, block_kv)
    if m_pad != max_len:
        k3 = jnp.pad(k3, ((0, 0), (0, m_pad - max_len), (0, 0)))
        v3 = jnp.pad(v3, ((0, 0), (0, m_pad - max_len), (0, 0)))
        ks3 = jnp.pad(ks3, ((0, 0), (0, 0), (0, m_pad - max_len)))
        vs3 = jnp.pad(vs3, ((0, 0), (0, 0), (0, m_pad - max_len)))

    o = fn(cache.lengths, q3, k3, v3, ks3, vs3)
    return o.reshape(b, hq, d_pad)[..., :d]


def paged_decode_attention(
    q,
    cache,
    *,
    scale: float | None = None,
    sliding_window: int | None = None,
    interpret: bool | None = None,
):
    """One-token GQA attention against a :class:`PagedKVCache`.

    q: [num_seqs, Hq, head_dim]. Pages are gathered through the cache's
    page tables (scalar prefetch); rows past each sequence's length are
    masked. Returns [num_seqs, Hq, head_dim] in q.dtype.
    """
    from mfa_tpu.kernels import paged_decode as paged_kernel

    if interpret is None:
        interpret = jax.default_backend() == "cpu"
    b, hq, d = q.shape
    pool = cache.pool
    hkv = pool.num_kv_heads
    if hq % hkv != 0:
        raise ValueError(f"num_q_heads ({hq}) must be a multiple of "
                         f"num_kv_heads ({hkv})")
    group = hq // hkv
    d_pad = pool.head_dim_padded
    if scale is None:
        scale = 1.0 / math.sqrt(d)

    qs = (q.astype(jnp.float32) * (scale * LOG2E)).astype(q.dtype)
    if d < d_pad:
        qs = jnp.pad(qs, ((0, 0), (0, 0), (0, d_pad - d)))
    # Head-batched kernel layout: q rows grouped by kv head —
    # [num_seqs, Hkv·group, d_pad] (q head h attends kv head h // group,
    # which is exactly the [B, Hq, D] order for standard GQA interleave).
    q3 = qs

    key = ("paged_decode", b, hkv, group, cache.max_pages, d_pad,
           pool.k_pages.shape[2],
           str(pool.k_pages.dtype), str(q.dtype), pool.precision.value,
           sliding_window, interpret)
    build = functools.partial(
        paged_kernel.build_paged_decode,
        num_seqs=b,
        num_kv_heads=hkv,
        group=group,
        max_pages=cache.max_pages,
        page_size=pool.k_pages.shape[2],
        d_pad=d_pad,
        kv_dtype=pool.k_pages.dtype,
        q_dtype=q.dtype,
        o_dtype=q.dtype,
        quantized=pool.precision.is_quantized,
        sliding_window=sliding_window,
        interpret=interpret,
    )
    fn = attention_cache.get_pipeline(key, key, build, lambda kern: kern)

    tables, lengths = cache.device_tables()
    o = fn(tables, lengths, q3, pool.k_pages, pool.v_pages,
           pool.k_scale, pool.v_scale)
    return o.reshape(b, hq, d_pad)[..., :d]


def decode_attention_append(
    q,
    k_new,
    v_new,
    cache: KVCache,
    *,
    scale: float | None = None,
    sliding_window: int | None = None,
    interpret: bool | None = None,
):
    """Fused append + attend (the decode hot path).

    Writes this step's ``k_new``/``v_new`` ([B, Hkv, head_dim], k already
    roped) into the cache at each sequence's current length INSIDE the
    attention kernel — the cache arrays are input/output aliased, so the
    append costs one quantized-row DMA instead of the separate 4-scatter
    update pass (round-4 profile: 93-104 us/layer, ~2x the attention kernel
    itself). Returns (o [B, Hq, head_dim], updated cache). The new token's
    attention column is computed from the unquantized k_new/v_new.

    Falls back to ``update()`` + :func:`decode_attention` when the cache
    exceeds the single-block VMEM budget (very long contexts).
    """
    from dataclasses import replace as _replace

    from mfa_tpu.serving import kv_cache as _kvm

    if interpret is None:
        interpret = jax.default_backend() == "cpu"
    b, hq, d = q.shape
    hkv = cache.num_kv_heads
    if hq % hkv != 0:
        raise ValueError(f"num_q_heads ({hq}) must be a multiple of "
                         f"num_kv_heads ({hkv})")
    group = hq // hkv
    d_pad = cache.head_dim_padded
    max_len = cache.max_len
    block_kv = _choose_block_kv(max_len, d_pad,
                                jnp.dtype(cache.k.dtype).itemsize)
    if block_kv < round_up(max_len, 128) or max_len % 128 != 0:
        cache2 = _kvm.update(cache, k_new[:, :, None, :], v_new[:, :, None, :])
        return decode_attention(q, cache2, scale=scale,
                                sliding_window=sliding_window,
                                interpret=interpret), cache2
    if scale is None:
        scale = 1.0 / math.sqrt(d)

    qs = (q.astype(jnp.float32) * (scale * LOG2E)).astype(q.dtype)
    if d < d_pad:
        qs = jnp.pad(qs, ((0, 0), (0, 0), (0, d_pad - d)))
        k_new = jnp.pad(k_new, ((0, 0), (0, 0), (0, d_pad - d)))
        v_new = jnp.pad(v_new, ((0, 0), (0, 0), (0, d_pad - d)))
    bh = b * hkv
    q3 = qs.reshape(b, hkv, group, d_pad).reshape(bh, group, d_pad)
    kn3 = k_new.astype(q.dtype).reshape(bh, 1, d_pad)
    vn3 = v_new.astype(q.dtype).reshape(bh, 1, d_pad)

    key = ("decode_fused", b, hkv, group, max_len, d_pad,
           str(cache.k.dtype), str(q.dtype), cache.quantized,
           sliding_window, interpret)
    build = functools.partial(
        decode_kernel.build_decode_fused_append,
        batch=b,
        num_kv_heads=hkv,
        group=group,
        max_len=max_len,
        d_pad=d_pad,
        kv_dtype=cache.k.dtype,
        q_dtype=q.dtype,
        o_dtype=q.dtype,
        quantized=cache.quantized,
        sliding_window=sliding_window,
        interpret=interpret,
    )
    fn = attention_cache.get_pipeline(key, key, build, lambda kern: kern)

    shp_k = cache.k.shape
    shp_s = cache.k_scale.shape
    o, k2, v2, ks2, vs2 = fn(
        cache.lengths, q3,
        cache.k.reshape(bh, max_len, d_pad),
        cache.v.reshape(bh, max_len, d_pad),
        cache.k_scale.reshape(bh, 1, max_len),
        cache.v_scale.reshape(bh, 1, max_len),
        kn3, vn3,
    )
    new_cache = _replace(
        cache,
        k=k2.reshape(shp_k), v=v2.reshape(shp_k),
        k_scale=ks2.reshape(shp_s), v_scale=vs2.reshape(shp_s),
        # Cap at capacity so an idle/full slot stops creeping: past max_len
        # the fused kernel's clamped append window drops the write, and an
        # uncapped length would walk the live-column mask out of bounds.
        lengths=jnp.minimum(cache.lengths + 1, max_len),
    )
    return o.reshape(b, hq, d_pad)[..., :d], new_cache
