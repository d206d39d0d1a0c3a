"""Paged GQA decode kernel: gather KV pages via scalar-prefetched tables.

The paged companion of kernels/decode.py: instead of a contiguous
[B, max_len] cache, each sequence's KV lives in PAGE_SIZE-token pages of a
shared pool, addressed by a page table. The page table rides scalar
prefetch (SMEM), so the BlockSpec index maps compute each grid step's DMA
source page — Mosaic still double-buffers the page fetches.

Round-4 rework, applying the contiguous kernel's measured lessons
(docs/MEASUREMENTS.md round 3/4):
- HEAD-BATCHED page blocks: one grid step fetches a page for ALL kv heads
  at once — the pool layout [num_pages, Hkv, page, d] makes the
  (1, Hkv, page, d) block one contiguous slab, so each step moves
  Hkv × page × d bytes (~128 KiB) instead of ~16 KiB; per-grid-step
  overhead (~3-4 us on v5e) then amortizes like the contiguous kernel's
  whole-cache blocks. Grid is (num_seqs, max_pages), not (B·Hkv, pages).
- NO lax.cond around the length mask: cond materializes branch buffers and
  stalls the Mosaic pipeline (the round-3 causal A/B; kernels/decode.py
  carries the same finding). The mask is an unconditional select.
- Per-token scales factor OUT of both contractions: raw storage->compute
  convert on the VPU plus O(group, page) scale epilogues on S and P, never
  an O(page, d) dequant. Scales are lane-contiguous [.., 1, page]
  (a [.., page, 1] block DMA is page-many 4-byte strided descriptors —
  the ~190 us/layer overhead found in round-4 contiguous profiling).
- Dead pages (fully past the sequence length) are predicated off at block
  level AND their DMA is elided by clamping the page-table lookup to the
  last live page (index-map clamp, as in flash_fwd's causal maps).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from mfa_tpu.kernels.decode import _make_convert
from mfa_tpu.kernels.flash_fwd import MASK_VALUE


def _paged_decode_kernel(
    # scalar prefetch
    page_tables_ref, lengths_ref,
    # inputs
    q_ref, k_ref, v_ref, ks_ref, vs_ref,
    # outputs
    o_ref,
    # scratch
    m_scr, l_scr, acc_scr,
    *,
    num_kv_heads: int,
    group: int,
    page_size: int,
    quantized: bool,
    compute_dtype,
    convert,
    sliding_window: int | None = None,
):
    b = pl.program_id(0)
    j = pl.program_id(1)          # page slot within the sequence
    length = lengths_ref[b]
    win_start = (jnp.maximum(length - sliding_window, 0)
                 if sliding_window is not None else 0)

    @pl.when(j == 0)
    def _init():
        m_scr[...] = jnp.full_like(m_scr, MASK_VALUE)
        l_scr[...] = jnp.zeros_like(l_scr)
        acc_scr[...] = jnp.zeros_like(acc_scr)

    @pl.when((j * page_size < length) & ((j + 1) * page_size > win_start))
    def _body():
        # Unconditional length/window mask shared by every head (the tile
        # is only (1, page); lax.cond here measurably costs more than the
        # select — see module docstring).
        col = j * page_size + jax.lax.broadcasted_iota(
            jnp.int32, (1, 1, page_size), 2)
        live = col < length
        if sliding_window is not None:
            live &= col >= win_start

        # BATCHED head contraction: one dot_general with Hkv as the batch
        # dim instead of Hkv serialized (group, page) dots — Mosaic
        # schedules the batched form as one pipelined chain.
        q = q_ref[0].reshape(num_kv_heads, group, q_ref.shape[-1])
        k = k_ref[0]                                    # (Hkv, page, d)
        if quantized:
            k = convert(k)
        s = jax.lax.dot_general(
            q, k,
            dimension_numbers=(((2,), (2,)), ((0,), (0,))),
            preferred_element_type=jnp.float32,
        )                                               # (Hkv, group, page)
        if quantized:
            s = s * ks_ref[0]                           # (Hkv, 1, page)
        s = jnp.where(live, s, MASK_VALUE)

        m_prev = m_scr[...].reshape(num_kv_heads, group, 1)
        m_new = jnp.maximum(m_prev, jnp.max(s, axis=-1, keepdims=True))
        corr = jnp.exp2(m_prev - m_new)
        p = jnp.exp2(s - m_new)
        l_prev = l_scr[...].reshape(num_kv_heads, group, 1)
        l_scr[...] = (corr * l_prev
                      + jnp.sum(p, axis=-1, keepdims=True)).reshape(
                          num_kv_heads * group, 1)
        m_scr[...] = m_new.reshape(num_kv_heads * group, 1)

        v = v_ref[0]                                    # (Hkv, page, d)
        if quantized:
            p = p * vs_ref[0]
            v = convert(v)
        pv = jax.lax.dot_general(
            p.astype(compute_dtype), v,
            dimension_numbers=(((2,), (1,)), ((0,), (0,))),
            preferred_element_type=jnp.float32,
        )                                               # (Hkv, group, d)
        d_pad_ = acc_scr.shape[-1]
        acc_prev = acc_scr[...].reshape(num_kv_heads, group, d_pad_)
        acc_scr[...] = (acc_prev * corr + pv).reshape(
            num_kv_heads * group, d_pad_)

    @pl.when(j == pl.num_programs(1) - 1)
    def _finalize():
        l_safe = jnp.maximum(l_scr[...], 1e-37)
        empty = m_scr[...] == MASK_VALUE     # length-0 slot: emit zeros
        o_ref[0] = jnp.where(empty, 0.0,
                             acc_scr[...] / l_safe).astype(o_ref.dtype)


def build_paged_decode(
    *,
    num_seqs: int,
    num_kv_heads: int,
    group: int,
    max_pages: int,
    page_size: int,
    d_pad: int,
    kv_dtype,
    q_dtype,
    o_dtype,
    quantized: bool,
    sliding_window: int | None = None,
    interpret: bool = False,
):
    """Paged decode attention (head-batched page blocks).

    Operands:
      page_tables [num_seqs, max_pages] int32     (scalar prefetch)
      lengths     [num_seqs] int32                (scalar prefetch)
      q           [num_seqs, Hkv*group, d_pad]    (pre-scaled)
      k_pages, v_pages [num_pages, Hkv, page, d_pad]
      k_scale, v_scale [num_pages, Hkv, 1, page]  (lane-contiguous)
    Returns o [num_seqs, Hkv*group, d_pad].
    """
    compute_dtype = (jnp.bfloat16 if jnp.dtype(q_dtype) == jnp.bfloat16
                     else jnp.float32)
    kernel = functools.partial(
        _paged_decode_kernel,
        num_kv_heads=num_kv_heads,
        group=group,
        page_size=page_size,
        quantized=quantized,
        compute_dtype=compute_dtype,
        convert=_make_convert(kv_dtype, compute_dtype),
        sliding_window=sliding_window,
    )

    def head_map(b, j, pt_ref, len_ref):
        return (b, 0, 0)

    def page_map(b, j, pt_ref, len_ref):
        # Clamp dead page slots to the last live page: Mosaic's revisit
        # detection elides the repeat DMA entirely (flash_fwd's causal
        # index-map clamp, applied to the page gather).
        last_live = jnp.maximum(
            (len_ref[b] + page_size - 1) // page_size - 1, 0)
        jj = jnp.minimum(j, last_live)
        return (pt_ref[b, jj], 0, 0, 0)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(num_seqs, max_pages),
        in_specs=[
            pl.BlockSpec((1, num_kv_heads * group, d_pad), head_map),  # q
            pl.BlockSpec((1, num_kv_heads, page_size, d_pad), page_map),
            pl.BlockSpec((1, num_kv_heads, page_size, d_pad), page_map),
            pl.BlockSpec((1, num_kv_heads, 1, page_size), page_map),
            pl.BlockSpec((1, num_kv_heads, 1, page_size), page_map),
        ],
        out_specs=pl.BlockSpec((1, num_kv_heads * group, d_pad), head_map),
        scratch_shapes=[
            pltpu.VMEM((num_kv_heads * group, 1), jnp.float32),
            pltpu.VMEM((num_kv_heads * group, 1), jnp.float32),
            pltpu.VMEM((num_kv_heads * group, d_pad), jnp.float32),
        ],
    )

    kv_bytes = jnp.dtype(kv_dtype).itemsize
    return pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct(
            (num_seqs, num_kv_heads * group, d_pad), o_dtype),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "arbitrary"),
        ),
        cost_estimate=pl.CostEstimate(
            flops=(4 * num_seqs * num_kv_heads * group
                   * max_pages * page_size * d_pad),
            bytes_accessed=(2 * num_seqs * num_kv_heads * max_pages
                            * page_size * d_pad * kv_bytes),
            transcendentals=(num_seqs * num_kv_heads * group
                             * max_pages * page_size),
        ),
        interpret=interpret,
    )
