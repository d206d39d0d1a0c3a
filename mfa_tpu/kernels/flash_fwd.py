"""Flash-attention forward Pallas kernel (online softmax, streaming KV).

TPU-native redesign of the reference's forward kernel
(AttentionKernel+Source.swift:158-199): for each block of rows (the
"parallelization dimension", here the grid), stream blocks of K/V (the
"traversal dimension", here the innermost sequential grid axis) through:

    S = Q K^T → mask → online max → correct O → P = exp2 → online sum →
    O += P V        (reference loopForward, :176-199)

Mapping of reference machinery onto TPU:
- threadgroups over row blocks         → Pallas grid axes (bh, q-block)
- traversal loop ``for c in 0..C``     → innermost grid axis with carried
  VMEM scratch (m, l, acc) — Mosaic double-buffers the K/V block DMAs, the
  analogue of the reference's async simdgroup_event copies
- register-resident Q/O slabs (AttentionKernel+Caching.swift) → VMEM scratch
  held across the traversal loop
- D-blocking (third block dimension, README.md:13) → static inner loop over
  head-dim slices of Q/K for the S matmul and of V/acc for the PV matmul
- exp2-based softmax with the scale folded into one multiply
  (AttentionKernel+Softmax.swift:17-26) → identical trick here
- edge masking with a large-finite sentinel, not -INF
  (AttentionKernel+Softmax.swift:228-260) → same sentinel strategy

Outputs O and L where L = natural-log logsumexp per row (the reference
stores m + log2(l); we store the base-e equivalent).
"""

from __future__ import annotations

import functools
import math

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from mfa_tpu.ops.descriptors import AttentionKernelDescriptor

LOG2E = math.log2(math.e)
# Large-finite mask sentinel (reference: AttentionKernel+Softmax.swift:228-260
# uses -large-finite so (masked - masked) never produces NaN).
MASK_VALUE = -0.5 * float(jnp.finfo(jnp.float32).max)
# Lane width used for the m/l scratch rows.
LANES = 128


def _fwd_kernel(
    q_ref, k_ref, v_ref,          # inputs
    o_ref, l_ref,                 # outputs
    m_scr, l_scr, acc_scr,        # VMEM scratch carried across kv blocks
    *,
    kd: AttentionKernelDescriptor,
    scale: float,
    seq_len_q: int,
    seq_len_kv: int,
    num_kv_blocks: int,
):
    i = pl.program_id(1)          # q block index
    j = pl.program_id(2)          # kv block index (sequential)
    bq, bkv = kd.block_q, kd.block_kv
    d_pad = q_ref.shape[-1]
    # FP32 inputs need full-precision MXU passes (TPU fp32 matmul
    # defaults to one bf16 pass, ~1e-1 error at K~128 — the FP32 error
    # budget is 2e-5, so request HIGHEST).
    fp32_in = q_ref.dtype == jnp.float32
    _prec = (jax.lax.Precision.HIGHEST if fp32_in
             else jax.lax.Precision.DEFAULT)
    scale2 = scale * LOG2E        # folded log2(e)·scale, one multiply

    @pl.when(j == 0)
    def _init():
        m_scr[...] = jnp.full_like(m_scr, MASK_VALUE)
        l_scr[...] = jnp.zeros_like(l_scr)
        acc_scr[...] = jnp.zeros_like(acc_scr)

    # Causal block skip: block (i, j) is fully masked when its lowest query
    # row sees none of its columns. diag offset aligns causal mask to the
    # sequence ends (query r attends keys <= r + (C - R)). A sliding window
    # (W keys ending at the diagonal) implies the causal bound and adds a
    # lower-bound skip.
    offset = seq_len_kv - seq_len_q
    window = kd.sliding_window
    is_causal = kd.causal or window is not None
    # "dense" causal mode: no predication anywhere — every block computes
    # and the band mask applies unconditionally (masked columns contribute
    # exp2(-big) = 0, so the result is identical; with the kv index-map
    # clamp the dead blocks re-read an already-resident block, so they cost
    # MXU only, not HBM). Exists because predication measurably breaks
    # Mosaic's pipelining (round-3 A/B: the "skip" build ran 1.3x SLOWER
    # than non-causal full compute at equal blocks).
    # "blockskip": block-level pl.when skip + unconditional in-block masks
    # (no lax.cond) — the middle point of the predication-cost spectrum.
    dense = is_causal and kd.causal_mode == "dense"
    blockskip = is_causal and kd.causal_mode == "blockskip"
    if is_causal and not dense:
        block_live = j * bkv <= (i + 1) * bq - 1 + offset
        if window is not None:
            block_live &= (j + 1) * bkv - 1 >= i * bq + offset - (window - 1)
    else:
        block_live = True

    # Static mask classification: the column-edge mask only matters in the
    # last kv block (and only when C is unaligned); the causal/window mask
    # only matters in blocks a band edge crosses. Interior blocks skip ALL
    # mask work — the VPU cost per S element is the throughput ceiling of
    # this kernel (MXU:VPU op-rate ratio ~100:1 on v5e, so every
    # elementwise op on S costs ~D/100 of a matmul).
    col_edge_exists = seq_len_kv % bkv != 0

    # Traversal sub-tile: independent online-softmax updates per sub-tile of
    # the KV block let Mosaic overlap sub-tile t+1's S matmul (MXU) with
    # sub-tile t's softmax (VPU) — without it, the row-max over the whole
    # (bq, bkv) S tile is a hard MXU→VPU→MXU serialization point per block.
    inner = min(kd.block_kv_inner or bkv, bkv)
    if bkv % inner != 0:
        inner = bkv
    n_inner = bkv // inner
    qg = min(kd.block_q_inner or bq, bq)
    if bq % qg != 0:
        qg = bq
    n_groups = bq // qg

    def build_mask(ti, gi):
        # Broadcastable (1, inner) column / (qg, 1) row iotas instead of
        # materialized (qg, inner) int32 planes: at qg=256 x bkv=4096 the
        # 2-D iotas cost 4 MiB EACH in VMEM (the round-3 causal-D=256
        # scoped-vmem OOM) — the broadcast compare produces only the bool
        # mask.
        base = j * bkv + ti * inner
        rbase = i * bq + gi * qg
        col = base + jax.lax.broadcasted_iota(jnp.int32, (1, inner), 1)
        m = None
        if col_edge_exists:
            m = col < seq_len_kv           # (1, inner), broadcasts over rows
        if is_causal:
            row = rbase + jax.lax.broadcasted_iota(jnp.int32, (qg, 1), 0)
            cm = col <= row + offset       # (qg, inner) bool via broadcast
            if window is not None:
                cm &= col >= row + offset - (window - 1)
            m = cm if m is None else (m & cm)
        return m

    if is_causal:
        # A band edge crosses block (i, j) unless the block's corners are
        # fully inside the visible band.
        block_needs_mask = (j + 1) * bkv - 1 > i * bq + offset
        if window is not None:
            block_needs_mask |= (
                j * bkv < (i + 1) * bq - 1 + offset - (window - 1))
        if col_edge_exists:
            block_needs_mask |= j == num_kv_blocks - 1
    elif col_edge_exists:
        block_needs_mask = j == num_kv_blocks - 1
    else:
        block_needs_mask = None   # statically never

    # Residency policy (the table's vmem-resident operand list,
    # AttentionKernel+Caching.swift:18-281 recast): with "Q" resident the
    # pre-scaled Q slab is materialized once and held across the traversal
    # loop (one extra (bq, d) VMEM slab, minimum VPU work); without it each
    # d-block slice is re-scaled on the fly (no slab, one extra multiply per
    # qk contraction) — the low-VMEM fallback the unbounded table rows use.
    q_resident = "Q" in kd.vmem_resident

    @pl.when(block_live)
    def _body():
        # Pre-scale Q once per (bq, d) block — folds the softmax scale and
        # log2(e) into the operand (AttentionKernel+Softmax.swift:17-26),
        # saving one VPU op per S element. bf16 rounding of Q·scale is well
        # inside the 5e-2 mixed budget; the fp32 path scales S instead to
        # preserve the 2e-5 budget.
        if fp32_in or not q_resident:
            q = q_ref[0]
        else:
            q = (q_ref[0].astype(jnp.float32) * scale2).astype(q_ref.dtype)
        k = k_ref[0]
        v = v_ref[0]
        nd = max(1, d_pad // kd.block_d)
        p_dtype = kd.register_dtype(kd.p_register, v_ref.dtype)

        # Row grouping: rows are independent in the online softmax, so each
        # q-row group is a fully data-independent MXU→VPU→MXU chain the
        # scheduler may interleave. Default block_q_inner=256 (measured best,
        # scripts/ab_subtile.py); block_q_inner in {0, bq} = single group.
        def fwd_group(gi, grows, needs_mask, mask_always=False):
            m_run = m_scr[grows]                             # (qg, 1)
            l_run = l_scr[grows]

            # Traversal sub-tiles within the group (off by default — see
            # block_kv_inner note in descriptors.py).
            for ti in range(n_inner):
                rows = slice(ti * inner, (ti + 1) * inner)

                # --- S = Q K[rows]^T over head-dim blocks (D-blocking) ---
                def qk(db, rows=rows, grows=grows):
                    sl = slice(db * kd.block_d, (db + 1) * kd.block_d)
                    q_sl = q[grows, sl]
                    if not fp32_in and not q_resident:
                        q_sl = (q_sl.astype(jnp.float32) * scale2).astype(
                            q_ref.dtype)
                    return jax.lax.dot_general(
                        q_sl, k[rows, sl],
                        dimension_numbers=(((1,), (1,)), ((), ())),
                        preferred_element_type=jnp.float32,
                        precision=_prec,
                    )

                s = qk(0)
                for db in range(1, nd):
                    s += qk(db)
                if fp32_in:
                    s *= scale2            # base-2 domain from here on

                if kd.logit_soft_cap is not None:
                    cap2 = kd.logit_soft_cap * LOG2E
                    s = cap2 * jnp.tanh(s / cap2)

                # --- masking (edge + causal), large-finite sentinel.
                # "dense": unconditional select (no lax.cond — the cond
                # materializes S into branch buffers). "skip": scalar-
                # predicated per GROUP so only groups a band/edge can bite
                # pay the VPU mask work. ---
                if mask_always:
                    s = jnp.where(build_mask(ti, gi), s, MASK_VALUE)
                elif needs_mask is not None:
                    s = jax.lax.cond(
                        needs_mask,
                        lambda s, ti=ti, gi=gi: jnp.where(
                            build_mask(ti, gi), s, MASK_VALUE),
                        lambda s: s,
                        s,
                    )

                # --- online softmax update (Softmax.swift:267-324). m/l
                # live as (bq, 1) columns: state ops touch bq elements, not
                # bq×128 replicated lanes. ---
                m_new = jnp.maximum(m_run,
                                    jnp.max(s, axis=-1, keepdims=True))
                corr = jnp.exp2(m_run - m_new)               # (qg, 1)
                p = jnp.exp2(s - m_new)                      # (qg, inner)
                l_run = corr * l_run + jnp.sum(p, axis=-1, keepdims=True)
                m_run = m_new

                # --- O accumulation: acc = acc*corr + P V, paged over d
                # blocks. P's MXU-input precision comes from the register
                # policy (kd.p_register ← PrecisionPolicy.register[P], the
                # reference's "P FP16" rule, Precisions.swift:197-200). ---
                p_cast = p.astype(p_dtype)
                for db in range(nd):
                    sl = slice(db * kd.block_d, (db + 1) * kd.block_d)
                    pv = jax.lax.dot_general(
                        p_cast, v[rows, sl],
                        dimension_numbers=(((1,), (0,)), ((), ())),
                        preferred_element_type=jnp.float32,
                        precision=_prec,
                    )
                    acc_scr[grows, sl] = acc_scr[grows, sl] * corr + pv

            m_scr[grows] = m_run
            l_scr[grows] = l_run

        for gi in range(n_groups):
            grows = slice(gi * qg, (gi + 1) * qg)
            # Group-level causal skip: a group whose LAST row sees none of
            # this kv block's columns contributes nothing — predicate the
            # whole group chain on its own diagonal test, so wide traversal
            # blocks still skip their above-diagonal parts at qg
            # granularity (block-level skip alone leaves every diagonal-
            # straddling block paying full compute; at bkv = N that is
            # EVERY block, measured 0.19 util in the round-3 causal bench).
            # The mask predicate is likewise per group: a group fully below
            # the band skips the VPU mask work its block would have paid.
            if dense or blockskip:
                fwd_group(gi, grows, None, mask_always=True)
            elif is_causal:
                r0 = i * bq + gi * qg
                r1 = r0 + qg - 1
                glive = j * bkv <= r1 + offset
                gneeds = (j + 1) * bkv - 1 > r0 + offset
                if window is not None:
                    # Live iff the block reaches the union of row windows
                    # [r0+off-w+1, r1+off]: the lower edge is set by the
                    # group's FIRST row (windows slide right with the row).
                    glive &= (j + 1) * bkv - 1 >= r0 + offset - (window - 1)
                    gneeds |= j * bkv < r1 + offset - (window - 1)
                if col_edge_exists:
                    gneeds |= j == num_kv_blocks - 1

                @pl.when(glive)
                def _group(gi=gi, grows=grows, gneeds=gneeds):
                    fwd_group(gi, grows, gneeds)
            else:
                fwd_group(gi, grows, block_needs_mask)

    @pl.when(j == num_kv_blocks - 1)
    def _finalize():
        l_safe = jnp.maximum(l_scr[...], 1e-37)              # (bq, 1)
        # Rows with NO visible keys (causal with R > C: row + offset < 0)
        # never see a live column, so m stays at the init sentinel and
        # every masked p contributes exp2(0)=1 — the accumulator holds a
        # bogus mean of V. Emit the 0 convention for those rows (matches
        # the oracle / FlashAttention), and a finite L=0 so the backward
        # kernels' p = exp2(S_masked - L) underflows to exactly 0.
        empty = m_scr[...] == MASK_VALUE                     # (bq, 1)
        o_ref[0] = jnp.where(empty, 0.0,
                             acc_scr[...] / l_safe).astype(o_ref.dtype)
        lse2 = m_scr[...] + jnp.log2(l_safe)                 # base-2 lse
        lse2 = jnp.where(empty, 0.0, lse2)
        l_ref[0] = jnp.broadcast_to(lse2 * (1.0 / LOG2E), l_ref.shape[1:])


def causal_pair_tables(num_q_blocks: int, num_kv_blocks: int, bq: int,
                       bkv: int, offset: int, window: int | None):
    """Static (i, j) tables enumerating LIVE causal blocks, i-major.

    Returns (i_tab, j_tab, first_tab, last_tab) numpy int32 arrays. The
    compressed grid walks exactly these pairs — dead (fully above-diagonal)
    blocks never get a grid step AT ALL, where the blockskip mode still
    schedules them (pl.when skips compute and the index-map clamp elides
    DMA, but the pipeline pays its per-step prologue: measured ~93 us of
    the 334 us causal D=128 latency in round 3)."""
    import numpy as np

    i_t, j_t, f_t, l_t = [], [], [], []
    for i in range(num_q_blocks):
        j_max = min(((i + 1) * bq - 1 + offset) // bkv, num_kv_blocks - 1)
        j_min = 0
        if window is not None:
            j_min = min(max((i * bq + offset - (window - 1)) // bkv, 0),
                        num_kv_blocks - 1)
        if j_max < j_min:
            # No visible keys for this whole row block (R > C causal edge);
            # schedule one fully-masked pair so scratch init/finalize and
            # the O/L block writes still happen.
            js = [j_min]
        else:
            js = list(range(j_min, j_max + 1))
        for idx, j in enumerate(js):
            i_t.append(i)
            j_t.append(j)
            f_t.append(1 if idx == 0 else 0)
            l_t.append(1 if idx == len(js) - 1 else 0)
    return (np.asarray(i_t, np.int32), np.asarray(j_t, np.int32),
            np.asarray(f_t, np.int32), np.asarray(l_t, np.int32))


def _fwd_tablegrid_kernel(
    i_tab, j_tab, first_tab, last_tab,   # scalar prefetch
    q_ref, k_ref, v_ref,
    o_ref, l_ref,
    m_scr, l_scr, acc_scr,
    *,
    kd: AttentionKernelDescriptor,
    scale: float,
    seq_len_q: int,
    seq_len_kv: int,
):
    """Causal forward over the compressed live-pair grid.

    Same math as _fwd_kernel's blockskip mode (unconditional band masks,
    (bq, 1) column softmax state, D-blocking, row groups), but the grid
    itself enumerates only live blocks — i/j come from the prefetched
    tables, init/finalize from the first/last flags."""
    g = pl.program_id(1)
    i = i_tab[g]
    j = j_tab[g]
    bq, bkv = kd.block_q, kd.block_kv
    d_pad = q_ref.shape[-1]
    fp32_in = q_ref.dtype == jnp.float32
    _prec = (jax.lax.Precision.HIGHEST if fp32_in
             else jax.lax.Precision.DEFAULT)
    scale2 = scale * LOG2E
    offset = seq_len_kv - seq_len_q
    window = kd.sliding_window
    col_edge_exists = seq_len_kv % bkv != 0

    @pl.when(first_tab[g] == 1)
    def _init():
        m_scr[...] = jnp.full_like(m_scr, MASK_VALUE)
        l_scr[...] = jnp.zeros_like(l_scr)
        acc_scr[...] = jnp.zeros_like(acc_scr)

    inner = min(kd.block_kv_inner or bkv, bkv)
    if bkv % inner != 0:
        inner = bkv
    n_inner = bkv // inner
    qg = min(kd.block_q_inner or bq, bq)
    if bq % qg != 0:
        qg = bq
    n_groups = bq // qg
    q_resident = "Q" in kd.vmem_resident

    def build_mask(ti, gi):
        base = j * bkv + ti * inner
        rbase = i * bq + gi * qg
        col = base + jax.lax.broadcasted_iota(jnp.int32, (1, inner), 1)
        row = rbase + jax.lax.broadcasted_iota(jnp.int32, (qg, 1), 0)
        m = col <= row + offset
        if window is not None:
            m &= col >= row + offset - (window - 1)
        if col_edge_exists:
            m &= col < seq_len_kv
        return m

    if fp32_in or not q_resident:
        q = q_ref[0]
    else:
        q = (q_ref[0].astype(jnp.float32) * scale2).astype(q_ref.dtype)
    k = k_ref[0]
    v = v_ref[0]
    nd = max(1, d_pad // kd.block_d)
    p_dtype = kd.register_dtype(kd.p_register, v_ref.dtype)

    for gi in range(n_groups):
        grows = slice(gi * qg, (gi + 1) * qg)
        m_run = m_scr[grows]
        l_run = l_scr[grows]
        for ti in range(n_inner):
            rows = slice(ti * inner, (ti + 1) * inner)

            def qk(db, rows=rows, grows=grows):
                sl = slice(db * kd.block_d, (db + 1) * kd.block_d)
                q_sl = q[grows, sl]
                if not fp32_in and not q_resident:
                    q_sl = (q_sl.astype(jnp.float32) * scale2).astype(
                        q_ref.dtype)
                return jax.lax.dot_general(
                    q_sl, k[rows, sl],
                    dimension_numbers=(((1,), (1,)), ((), ())),
                    preferred_element_type=jnp.float32,
                    precision=_prec,
                )

            s = qk(0)
            for db in range(1, nd):
                s += qk(db)
            if fp32_in:
                s *= scale2

            if kd.logit_soft_cap is not None:
                cap2 = kd.logit_soft_cap * LOG2E
                s = cap2 * jnp.tanh(s / cap2)

            s = jnp.where(build_mask(ti, gi), s, MASK_VALUE)

            m_new = jnp.maximum(m_run, jnp.max(s, axis=-1, keepdims=True))
            corr = jnp.exp2(m_run - m_new)
            p = jnp.exp2(s - m_new)
            l_run = corr * l_run + jnp.sum(p, axis=-1, keepdims=True)
            m_run = m_new

            p_cast = p.astype(p_dtype)
            for db in range(nd):
                sl = slice(db * kd.block_d, (db + 1) * kd.block_d)
                pv = jax.lax.dot_general(
                    p_cast, v[rows, sl],
                    dimension_numbers=(((1,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32,
                    precision=_prec,
                )
                acc_scr[grows, sl] = acc_scr[grows, sl] * corr + pv

        m_scr[grows] = m_run
        l_scr[grows] = l_run

    @pl.when(last_tab[g] == 1)
    def _finalize():
        l_safe = jnp.maximum(l_scr[...], 1e-37)
        # Empty-row convention — see _fwd_kernel._finalize.
        empty = m_scr[...] == MASK_VALUE
        o_ref[0] = jnp.where(empty, 0.0,
                             acc_scr[...] / l_safe).astype(o_ref.dtype)
        lse2 = jnp.where(empty, 0.0, m_scr[...] + jnp.log2(l_safe))
        l_ref[0] = jnp.broadcast_to(lse2 * (1.0 / LOG2E), l_ref.shape[1:])


def _build_fwd_tablegrid(
    kd: AttentionKernelDescriptor,
    *,
    batch_heads: int,
    kv_batch_heads: int,
    seq_len_q: int,
    seq_len_kv: int,
    d_pad: int,
    scale: float,
    q_dtype,
    kv_dtype,
    o_dtype,
    interpret: bool = False,
):
    """Compressed-grid causal forward. Same call signature as the dense
    grid's pallas_call — the pair tables are baked as jit constants."""
    bq, bkv = kd.block_q, kd.block_kv
    r_pad = _cdiv(seq_len_q, bq) * bq
    c_pad = _cdiv(seq_len_kv, bkv) * bkv
    num_q_blocks = r_pad // bq
    num_kv_blocks = c_pad // bkv
    group = batch_heads // kv_batch_heads
    offset = seq_len_kv - seq_len_q

    i_tab, j_tab, f_tab, l_tab = causal_pair_tables(
        num_q_blocks, num_kv_blocks, bq, bkv, offset, kd.sliding_window)
    n_pairs = len(i_tab)

    kernel = functools.partial(
        _fwd_tablegrid_kernel,
        kd=kd,
        scale=scale,
        seq_len_q=seq_len_q,
        seq_len_kv=seq_len_kv,
    )

    def q_map(bh, g, i_t, j_t, f_t, l_t):
        return (bh, i_t[g], 0)

    def kv_map(bh, g, i_t, j_t, f_t, l_t):
        return (bh // group, j_t[g], 0)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=4,
        grid=(batch_heads, n_pairs),
        in_specs=[
            pl.BlockSpec((1, bq, d_pad), q_map),
            pl.BlockSpec((1, bkv, d_pad), kv_map),
            pl.BlockSpec((1, bkv, d_pad), kv_map),
        ],
        out_specs=[
            pl.BlockSpec((1, bq, d_pad), q_map),
            pl.BlockSpec((1, bq, LANES), q_map),
        ],
        scratch_shapes=[
            pltpu.VMEM((bq, 1), jnp.float32),
            pltpu.VMEM((bq, 1), jnp.float32),
            pltpu.VMEM((bq, d_pad), jnp.float32),
        ],
    )

    # Live-area FLOPs (the pairs ARE the live set).
    flops = 2 * batch_heads * n_pairs * bq * bkv * (2 * d_pad)

    inner = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=[
            jax.ShapeDtypeStruct((batch_heads, r_pad, d_pad), o_dtype),
            jax.ShapeDtypeStruct((batch_heads, r_pad, LANES), jnp.float32),
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "arbitrary"),
        ),
        cost_estimate=pl.CostEstimate(
            flops=flops,
            bytes_accessed=(
                batch_heads * r_pad * d_pad * 2 * jnp.dtype(q_dtype).itemsize
                + 2 * kv_batch_heads * c_pad * d_pad
                * jnp.dtype(kv_dtype).itemsize
            ),
            transcendentals=batch_heads * n_pairs * bq * bkv,
        ),
        interpret=interpret,
    )

    # Keep the tables as NUMPY in the closure: a jnp constant created
    # inside the first caller's trace is a tracer there, and the cached
    # closure would leak it into every later trace (UnexpectedTracerError).
    tabs = (i_tab, j_tab, f_tab, l_tab)

    def call(q3, k3, v3):
        return inner(*tabs, q3, k3, v3)

    return call


def build_fwd(
    kd: AttentionKernelDescriptor,
    *,
    batch_heads: int,
    kv_batch_heads: int,
    seq_len_q: int,
    seq_len_kv: int,
    d_pad: int,
    scale: float,
    q_dtype,
    kv_dtype,
    o_dtype,
    interpret: bool = False,
):
    """Build the forward pallas_call for one shape class.

    Operand layout: q [BH, R_pad, D_pad]; k, v [BHkv, C_pad, D_pad];
    outputs o [BH, R_pad, D_pad], l [BH, R_pad]. GQA is handled by the KV
    index map (query head h reads kv head h // group).
    """
    if ((kd.causal or kd.sliding_window is not None)
            and kd.causal_mode == "tablegrid"):
        return _build_fwd_tablegrid(
            kd, batch_heads=batch_heads, kv_batch_heads=kv_batch_heads,
            seq_len_q=seq_len_q, seq_len_kv=seq_len_kv, d_pad=d_pad,
            scale=scale, q_dtype=q_dtype, kv_dtype=kv_dtype,
            o_dtype=o_dtype, interpret=interpret)
    bq, bkv = kd.block_q, kd.block_kv
    r_pad = _cdiv(seq_len_q, bq) * bq
    c_pad = _cdiv(seq_len_kv, bkv) * bkv
    num_q_blocks = r_pad // bq
    num_kv_blocks = c_pad // bkv
    group = batch_heads // kv_batch_heads

    kernel = functools.partial(
        _fwd_kernel,
        kd=kd,
        scale=scale,
        seq_len_q=seq_len_q,
        seq_len_kv=seq_len_kv,
        num_kv_blocks=num_kv_blocks,
    )

    grid = (batch_heads, num_q_blocks, num_kv_blocks)

    def q_map(bh, i, j):
        return (bh, i, 0)

    # Causal/window index-map clamp: dead traversal blocks map to the
    # nearest LIVE block's index, so Mosaic's revisit detection elides
    # their DMA entirely (pl.when only skips the compute — without the
    # clamp, causal still streams the full N² of KV and the measured
    # utilization halves; round-3 causal sweep: 0.24 at D=128).
    if kd.causal or kd.sliding_window is not None:
        offset = seq_len_kv - seq_len_q

        def kv_map(bh, i, j):
            jj = j
            if kd.causal or kd.sliding_window is not None:
                j_max = jnp.maximum(
                    ((i + 1) * kd.block_q - 1 + offset) // kd.block_kv, 0)
                jj = jnp.minimum(jj, j_max)
            if kd.sliding_window is not None:
                j_min = jnp.clip(
                    (i * kd.block_q + offset - (kd.sliding_window - 1))
                    // kd.block_kv, 0, num_kv_blocks - 1)
                jj = jnp.maximum(jj, j_min)
            return (bh // group, jj, 0)
    else:
        def kv_map(bh, i, j):
            return (bh // group, j, 0)

    def o_map(bh, i, j):
        return (bh, i, 0)

    def l_map(bh, i, j):
        return (bh, i, 0)

    flops = 2 * batch_heads * seq_len_q * seq_len_kv * (2 * d_pad)

    return pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, bq, d_pad), q_map),
            pl.BlockSpec((1, bkv, d_pad), kv_map),
            pl.BlockSpec((1, bkv, d_pad), kv_map),
        ],
        out_specs=[
            pl.BlockSpec((1, bq, d_pad), o_map),
            pl.BlockSpec((1, bq, LANES), l_map),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((batch_heads, r_pad, d_pad), o_dtype),
            jax.ShapeDtypeStruct((batch_heads, r_pad, LANES), jnp.float32),
        ],
        scratch_shapes=[
            pltpu.VMEM((bq, 1), jnp.float32),       # m (column state)
            pltpu.VMEM((bq, 1), jnp.float32),       # l (column state)
            pltpu.VMEM((bq, d_pad), jnp.float32),   # O accumulator
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "arbitrary"),
        ),
        cost_estimate=pl.CostEstimate(
            flops=flops,
            bytes_accessed=(
                batch_heads * r_pad * d_pad * 2 * jnp.dtype(q_dtype).itemsize
                + 2 * kv_batch_heads * c_pad * d_pad * jnp.dtype(kv_dtype).itemsize
            ),
            transcendentals=batch_heads * seq_len_q * seq_len_kv,
        ),
        interpret=interpret,
    )


def _cdiv(a: int, b: int) -> int:
    return -(-a // b)
