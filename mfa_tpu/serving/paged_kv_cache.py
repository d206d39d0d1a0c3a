"""Paged KV cache: block-granular memory management for serving.

Second-generation cache (first: the contiguous per-slot cache in
kv_cache.py). Sequences own *pages* of PAGE_SIZE tokens from a shared pool,
via a per-sequence page table — so HBM is allocated by actual length, not
worst-case max_len, and slots never fragment. The decode kernel gathers
pages through scalar-prefetched page tables (kernels/paged_decode.py).

The host-side allocator (free list) lives here; it is the moral equivalent
of the reference's host-side dispatch bookkeeping — device state is just
the arrays.

Layout:
  k_pages, v_pages : [num_pages, Hkv, PAGE, D_pad]   storage dtype
  k_scale, v_scale : [num_pages, Hkv, 1, PAGE] f32   (per-token scales,
                     lane-contiguous — a [.., PAGE, 1] layout makes each
                     scale block DMA PAGE-many 4-byte strided descriptors,
                     the ~190 us/layer overhead measured on the contiguous
                     cache in round 4)
  page_tables      : [num_seqs, max_pages]  int32    (host-managed numpy)
  lengths          : [num_seqs]             int32
"""

from __future__ import annotations

from dataclasses import dataclass, replace
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from mfa_tpu.ops.descriptors import round_up
from mfa_tpu.ops.precision import OperandPrecision
from mfa_tpu.serving.kv_cache import _quantize_for

# Default page granularity. 128 rows is the Mosaic lane quantum; LARGER
# pages trade internal fragmentation (<= page_size-1 tokens per sequence)
# for fewer, bigger page-gather DMA steps — the round-4 TPU bench measured
# the paged kernel at 2.3-2.9x contiguous latency at 128-token pages
# (per-grid-step overhead over ~128 KiB gathers); 512-token pages close
# most of that (docs/sweeps/paged_bench.jsonl).
PAGE_SIZE = 128


@partial(
    jax.tree_util.register_dataclass,
    data_fields=["k_pages", "v_pages", "k_scale", "v_scale"],
    meta_fields=["precision"],
)
@dataclass(frozen=True)
class PagePool:
    k_pages: jnp.ndarray
    v_pages: jnp.ndarray
    k_scale: jnp.ndarray
    v_scale: jnp.ndarray
    precision: OperandPrecision

    @property
    def num_pages(self) -> int:
        return self.k_pages.shape[0]

    @property
    def num_kv_heads(self) -> int:
        return self.k_pages.shape[1]

    @property
    def head_dim_padded(self) -> int:
        return self.k_pages.shape[3]


class PagedKVCache:
    """Host-side manager: pool arrays + free list + page tables."""

    def __init__(self, num_pages: int, num_kv_heads: int, head_dim: int,
                 num_seqs: int, max_len: int,
                 precision: OperandPrecision = OperandPrecision.BF16,
                 page_size: int = PAGE_SIZE):
        if page_size % 128 != 0:
            raise ValueError(f"page_size must be a multiple of 128 "
                             f"(got {page_size})")
        self.page_size = page_size
        d_pad = round_up(head_dim, 128)
        dtype = precision.dtype
        shape = (num_pages, num_kv_heads, page_size, d_pad)
        self.pool = PagePool(
            k_pages=jnp.zeros(shape, dtype),
            v_pages=jnp.zeros(shape, dtype),
            k_scale=jnp.ones((num_pages, num_kv_heads, 1, page_size),
                             jnp.float32),
            v_scale=jnp.ones((num_pages, num_kv_heads, 1, page_size),
                             jnp.float32),
            precision=precision,
        )
        self.max_pages = round_up(max_len, page_size) // page_size
        # Page 0 is reserved as the null page (tables point at it for
        # unallocated entries; kernel masks by length so it's never read
        # meaningfully).
        self._free = list(range(num_pages - 1, 0, -1))
        self.page_tables = np.zeros((num_seqs, self.max_pages), np.int32)
        self.lengths = np.zeros((num_seqs,), np.int32)

    # -- allocation -------------------------------------------------------

    def pages_in_use(self, seq: int) -> int:
        ps = self.page_size
        return (int(self.lengths[seq]) + ps - 1) // ps

    def _ensure_capacity(self, seq: int, new_len: int):
        ps = self.page_size
        need = (new_len + ps - 1) // ps
        if need > self.max_pages:
            raise ValueError(f"sequence {seq} exceeds max_len "
                             f"({new_len} > {self.max_pages * ps})")
        have = self.pages_in_use(seq)
        for i in range(have, need):
            if not self._free:
                raise MemoryError("page pool exhausted")
            self.page_tables[seq, i] = self._free.pop()

    def free_seq(self, seq: int):
        for i in range(self.pages_in_use(seq)):
            page = int(self.page_tables[seq, i])
            if page != 0:
                self._free.append(page)
        self.page_tables[seq, :] = 0
        self.lengths[seq] = 0

    @property
    def free_pages(self) -> int:
        return len(self._free)

    # -- writes -----------------------------------------------------------

    def append(self, seq: int, k_new, v_new):
        """Append T tokens for one sequence. k_new/v_new: [Hkv, T, head_dim]."""
        hkv, t, d = k_new.shape
        d_pad = self.pool.head_dim_padded
        if d < d_pad:
            k_new = jnp.pad(k_new, ((0, 0), (0, 0), (0, d_pad - d)))
            v_new = jnp.pad(v_new, ((0, 0), (0, 0), (0, d_pad - d)))
        start = int(self.lengths[seq])
        self._ensure_capacity(seq, start + t)

        kq, ks = _quantize_for(self.pool.precision, k_new)
        vq, vs = _quantize_for(self.pool.precision, v_new)
        ks = jnp.swapaxes(ks, -1, -2)   # [Hkv, 1, T] lane-contiguous
        vs = jnp.swapaxes(vs, -1, -2)

        pool = self.pool
        # Split the token range into page-aligned chunks and scatter each.
        off = 0
        while off < t:
            pos = start + off
            ps = self.page_size
            page_idx = int(self.page_tables[seq, pos // ps])
            in_page = pos % ps
            n = min(ps - in_page, t - off)
            upd = lambda buf, new: buf.at[page_idx, :, in_page:in_page + n].set(
                new[:, off:off + n])
            upd_s = lambda buf, new: buf.at[
                page_idx, :, :, in_page:in_page + n].set(
                new[:, :, off:off + n])
            pool = replace(
                pool,
                k_pages=upd(pool.k_pages, kq),
                v_pages=upd(pool.v_pages, vq),
                k_scale=upd_s(pool.k_scale, ks),
                v_scale=upd_s(pool.v_scale, vs),
            )
            off += n
        self.pool = pool
        self.lengths[seq] = start + t

    def splice_prefill(self, seq: int, k_new, v_new):
        """Prefill write for a FRESH sequence (length 0): allocate pages and
        scatter the whole prompt with ONE vectorized device write per array
        (vs ``append``'s O(pages) host-side splices — round-1 VERDICT weak
        item 7). k_new/v_new: [Hkv, T, head_dim]."""
        assert int(self.lengths[seq]) == 0, "splice_prefill needs a fresh seq"
        hkv, t, d = k_new.shape
        self._ensure_capacity(seq, t)
        ps = self.page_size
        n_pages = (t + ps - 1) // ps
        page_ids = jnp.asarray(self.page_tables[seq, :n_pages], jnp.int32)
        d_pad = self.pool.head_dim_padded
        t_pad = n_pages * ps
        pad = ((0, 0), (0, t_pad - t), (0, d_pad - d))
        self.pool = splice_pages(
            self.pool, page_ids, jnp.pad(k_new, pad), jnp.pad(v_new, pad))
        self.lengths[seq] = t

    # -- device views -----------------------------------------------------

    def device_tables(self):
        return (jnp.asarray(self.page_tables),
                jnp.asarray(self.lengths, jnp.int32))


def splice_pages(pool: PagePool, page_ids, k_new, v_new) -> PagePool:
    """Jit-friendly bulk page write: scatter page-aligned K/V into the pool.

    page_ids: [n] int32 — destination pages, in token order from position 0.
    k_new/v_new: [Hkv, n*PAGE_SIZE, d_pad] — the prompt's K/V, tail-padded
    to a page boundary (the owned last page's tail is overwritten with the
    padding; reads are masked by the sequence length, and subsequent decode
    appends overwrite those positions in place).

    One advanced-index scatter per pool array, fully on device — the
    admission path stays off the host regardless of prompt length.
    """
    kq, ks = _quantize_for(pool.precision, k_new)
    vq, vs = _quantize_for(pool.precision, v_new)

    ps = pool.k_pages.shape[2]      # page size from the pool layout

    def to_pages(x):
        # [Hkv, n*PAGE, ...] → [n, Hkv, PAGE, ...] (page-major like the pool)
        hkv, tp = x.shape[0], x.shape[1]
        x = x.reshape((hkv, tp // ps, ps) + x.shape[2:])
        return jnp.swapaxes(x, 0, 1)

    def to_scale_pages(x):
        # [Hkv, n*PAGE, 1] → [n, Hkv, 1, PAGE] (lane-contiguous scales)
        hkv, tp = x.shape[0], x.shape[1]
        x = x[..., 0].reshape(hkv, tp // ps, ps)
        return jnp.swapaxes(x, 0, 1)[:, :, None, :]

    return replace(
        pool,
        k_pages=pool.k_pages.at[page_ids].set(to_pages(kq)),
        v_pages=pool.v_pages.at[page_ids].set(to_pages(vq)),
        k_scale=pool.k_scale.at[page_ids].set(to_scale_pages(ks)),
        v_scale=pool.v_scale.at[page_ids].set(to_scale_pages(vs)),
    )
