"""Paged GQA decode kernel: gather KV pages via scalar-prefetched tables.

The paged companion of kernels/decode.py: instead of a contiguous
[B, max_len] cache, each sequence's KV lives in PAGE_SIZE-token pages of a
shared pool, addressed by a page table. The page table rides scalar
prefetch (SMEM), so the BlockSpec index maps can compute each grid step's
DMA source page — Mosaic still double-buffers the page fetches.

Same fused-dequant and online-softmax structure as the contiguous kernel;
pages past a sequence's length are predicated off (their table entries
point at the reserved null page and are never accumulated).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

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
    page_size: int,
    quantized: bool,
    compute_dtype,
    sliding_window: int | None = None,
):
    bh = pl.program_id(0)
    j = pl.program_id(1)          # page slot within the sequence
    b = bh // num_kv_heads
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
        q = q_ref[0]                                    # (group, d) prescaled
        k = k_ref[0, 0]                                 # (page, d)
        if quantized:
            k = (k.astype(jnp.float32) * ks_ref[0, 0]).astype(compute_dtype)
        s = jax.lax.dot_general(
            q, k,
            dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        )                                               # (group, page)

        crossing = ((j + 1) * page_size > length) | (j * page_size < win_start)

        def apply_mask(s):
            col = j * page_size + jax.lax.broadcasted_iota(
                jnp.int32, s.shape, 1)
            return jnp.where((col < length) & (col >= win_start), s,
                             MASK_VALUE)

        s = jax.lax.cond(crossing, apply_mask, lambda s: s, s)

        m_prev = m_scr[...]
        m_new = jnp.maximum(m_prev, jnp.max(s, axis=-1, keepdims=True))
        corr = jnp.exp2(m_prev - m_new)
        p = jnp.exp2(s - m_new)
        l_scr[...] = corr * l_scr[...] + jnp.sum(p, axis=-1, keepdims=True)
        m_scr[...] = m_new

        v = v_ref[0, 0]
        if quantized:
            v = (v.astype(jnp.float32) * vs_ref[0, 0]).astype(compute_dtype)
        pv = jax.lax.dot_general(
            p.astype(compute_dtype), v,
            dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        acc_scr[...] = acc_scr[...] * corr + pv

    @pl.when(j == pl.num_programs(1) - 1)
    def _finalize():
        l_safe = jnp.maximum(l_scr[...], 1e-37)
        o_ref[0] = (acc_scr[...] / l_safe).astype(o_ref.dtype)


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
    """Paged decode attention.

    Operands:
      page_tables [num_seqs, max_pages] int32     (scalar prefetch)
      lengths     [num_seqs] int32                (scalar prefetch)
      q           [num_seqs*Hkv, group, d_pad]    (pre-scaled)
      k_pages, v_pages [num_pages, Hkv, page, d_pad]
      k_scale, v_scale [num_pages, Hkv, page, 1]
    Returns o [num_seqs*Hkv, group, d_pad].
    """
    bh = num_seqs * num_kv_heads

    kernel = functools.partial(
        _paged_decode_kernel,
        num_kv_heads=num_kv_heads,
        page_size=page_size,
        quantized=quantized,
        compute_dtype=(jnp.bfloat16 if jnp.dtype(q_dtype) == jnp.bfloat16
                       else jnp.float32),
        sliding_window=sliding_window,
    )

    def head_map(bh_, j, pt_ref, len_ref):
        return (bh_, 0, 0)

    def page_map(bh_, j, pt_ref, len_ref):
        b = bh_ // num_kv_heads
        h = bh_ % num_kv_heads
        return (pt_ref[b, j], h, 0, 0)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(bh, max_pages),
        in_specs=[
            pl.BlockSpec((1, group, d_pad), head_map),          # q
            pl.BlockSpec((1, 1, page_size, d_pad), page_map),   # k pages
            pl.BlockSpec((1, 1, page_size, d_pad), page_map),   # v pages
            pl.BlockSpec((1, 1, page_size, 1), page_map),       # k scales
            pl.BlockSpec((1, 1, page_size, 1), page_map),       # v scales
        ],
        out_specs=pl.BlockSpec((1, group, d_pad), head_map),
        scratch_shapes=[
            pltpu.VMEM((group, 1), jnp.float32),
            pltpu.VMEM((group, 1), jnp.float32),
            pltpu.VMEM((group, d_pad), jnp.float32),
        ],
    )

    return pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((bh, group, d_pad), o_dtype),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "arbitrary"),
        ),
        interpret=interpret,
    )
