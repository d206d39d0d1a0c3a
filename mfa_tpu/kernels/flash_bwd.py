"""Flash-attention backward: the two-kernel atomics-free design.

TPU-native redesign of the reference's backward
(AttentionKernel+Source.swift:202-293, AttentionKernelType.swift:10-23,
README.md:39-46): instead of one pass with float atomics, run two fully
parallel passes with a higher FLOP count —

  backward_query      (parallel over row blocks; loops over KV):
      D = rowsum(dO ⊙ O)   (computed inline in setup, the reference's
                            computeD — AttentionKernel+Softmax.swift:32-221)
      loop c:  S = Q K^T → P = exp2(S·s2 − L2) → dP = dO V^T →
               dS = P(dP − D)·scale → dQ += dS K
      (reference loopBackwardQuery, AttentionKernel+Source.swift:202-242)

  backward_key_value  (parallel over column blocks; loops over rows):
      loop r:  S = Q K^T → P → dV += P^T dO → dP = dO V^T →
               dS → dK += dS^T Q
      (reference loopBackwardKeyValue, AttentionKernel+Source.swift:244-293;
      the reference materializes the S^T orientation — on TPU the MXU takes
      transposed contractions natively via dot_general dimension numbers,
      so everything stays row-major with zero relayouts)

TPU is the same boat as Apple GPUs — no fast cross-core float atomics — so
the 9D+15 vs 5D+5 FLOP trade (README.md:11) transfers directly and buys
100% parallelism on both passes.

L and the D term travel lane-replicated as [BH, R, 128] fp32 so row
vectors read back as (bq, 1) columns with no relayout.

GQA note: backward_key_value folds the query-head group into the sequential
traversal axis, so dK/dV for one KV head accumulate over its whole query
group in VMEM without atomics or extra HBM.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from mfa_tpu.ops.descriptors import AttentionKernelDescriptor
from mfa_tpu.kernels.flash_fwd import LOG2E, MASK_VALUE, LANES, _cdiv


def _soft_cap_fwd_grad(s, cap):
    """Returns (capped scores, d capped/d s) for the soft-cap nonlinearity."""
    t = jnp.tanh(s / cap)
    return cap * t, 1.0 - t * t


# ---------------------------------------------------------------------------
# backward_query: D and dQ, parallel over row blocks
# ---------------------------------------------------------------------------


def _bwd_q_kernel(
    *refs,
    kd: AttentionKernelDescriptor,
    scale: float,
    seq_len_q: int,
    seq_len_kv: int,
    num_kv_blocks: int,
    tablegrid: bool = False,
):
    if tablegrid:
        # Compressed live-pair grid (see flash_fwd.causal_pair_tables):
        # grid = (bh, n_pairs); i/j and the setup/finalize conditions come
        # from the scalar-prefetched tables instead of grid coordinates.
        (i_tab, j_tab, f_tab, l_tab) = refs[:4]
        (q_ref, k_ref, v_ref, o_ref, do_ref, l_ref,
         dq_ref, dterm_ref, d_scr, acc_scr) = refs[4:]
        g = pl.program_id(1)
        i = i_tab[g]
        j = j_tab[g]
        setup_cond = f_tab[g] == 1
        final_cond = l_tab[g] == 1
    else:
        (q_ref, k_ref, v_ref, o_ref, do_ref, l_ref,
         dq_ref, dterm_ref, d_scr, acc_scr) = refs
        i = pl.program_id(1)
        j = pl.program_id(2)
        setup_cond = j == 0
        final_cond = j == num_kv_blocks - 1
    bq, bkv = kd.block_q, kd.block_kv
    scale2 = scale * LOG2E
    _prec = (jax.lax.Precision.HIGHEST if q_ref.dtype == jnp.float32
             else jax.lax.Precision.DEFAULT)

    @pl.when(setup_cond)
    def _setup():
        # computeD: rowwise dO·O reduction (Softmax.swift:32-221). The
        # reference does simd shuffles; on TPU it's one VPU row reduction.
        d_term = jnp.sum(
            do_ref[0].astype(jnp.float32) * o_ref[0].astype(jnp.float32),
            axis=-1, keepdims=True,
        )
        d_scr[...] = jnp.broadcast_to(d_term, d_scr.shape)
        acc_scr[...] = jnp.zeros_like(acc_scr)
        dterm_ref[0] = jnp.broadcast_to(d_term, dterm_ref.shape[1:])

    offset = seq_len_kv - seq_len_q
    window = kd.sliding_window
    is_causal = kd.causal or window is not None
    # Causal modes — see flash_fwd: "blockskip" (block-level pl.when +
    # unconditional masks) measured best; per-group lax.cond ("skip") runs
    # slower than not skipping at all.
    dense = is_causal and kd.causal_mode == "dense"
    blockskip = is_causal and (kd.causal_mode == "blockskip" or tablegrid)
    if tablegrid:
        block_live = True           # the pair tables ARE the live set
    elif is_causal and not dense:
        block_live = j * bkv <= (i + 1) * bq - 1 + offset
        if window is not None:
            block_live &= (j + 1) * bkv - 1 >= i * bq + offset - (window - 1)
    else:
        block_live = True

    # Mask only where a band/edge can bite (same static classification as
    # the forward kernel; interior blocks skip all VPU mask work).
    col_edge_exists = seq_len_kv % bkv != 0

    # Row grouping (see flash_fwd): independent per-group S/P/dP/dS chains
    # for the scheduler, and only the live group's tiles occupy VMEM.
    qg = min(kd.block_q_inner or bq, bq)
    if bq % qg != 0:
        qg = bq
    n_groups = bq // qg

    def build_mask(gi):
        # Broadcastable iotas, not (qg, bkv) int32 planes — see flash_fwd
        # (the materialized planes cost MiBs of scoped VMEM at wide blocks).
        rbase = i * bq + gi * qg
        col = j * bkv + jax.lax.broadcasted_iota(jnp.int32, (1, bkv), 1)
        m = None
        if col_edge_exists:
            m = col < seq_len_kv
        if is_causal:
            row = rbase + jax.lax.broadcasted_iota(jnp.int32, (qg, 1), 0)
            cm = col <= row + offset
            if window is not None:
                cm &= col >= row + offset - (window - 1)
            m = cm if m is None else (m & cm)
        return m

    if is_causal:
        block_needs_mask = (j + 1) * bkv - 1 > i * bq + offset
        if window is not None:
            block_needs_mask |= (
                j * bkv < (i + 1) * bq - 1 + offset - (window - 1))
        if col_edge_exists:
            block_needs_mask |= j == num_kv_blocks - 1
    elif col_edge_exists:
        block_needs_mask = j == num_kv_blocks - 1
    else:
        block_needs_mask = None

    fp32_in = q_ref.dtype == jnp.float32
    # Residency policy for the pre-scaled Q slab (see flash_fwd; the
    # vmem-resident operand list of the parameter table drives this).
    q_resident = "Q" in kd.vmem_resident

    def _body():
        # Pre-scale Q (bf16 path) exactly like the forward kernel — one
        # (bq, d) multiply replaces a (bq, bkv) one.
        if fp32_in or not q_resident:
            q = q_ref[0]
        else:
            q = (q_ref[0].astype(jnp.float32) * scale2).astype(q_ref.dtype)
        k = k_ref[0]
        v = v_ref[0]
        d_o = do_ref[0]
        nd = max(1, q.shape[-1] // kd.block_d)
        ds_dtype = kd.register_dtype(kd.ds_register, k.dtype)

        def bwd_q_group(gi, grows, needs_mask, mask_always=False):
            def qk(db, grows=grows):
                sl = slice(db * kd.block_d, (db + 1) * kd.block_d)
                q_sl = q[grows, sl]
                if not fp32_in and not q_resident:
                    q_sl = (q_sl.astype(jnp.float32) * scale2).astype(
                        q_ref.dtype)
                return jax.lax.dot_general(
                    q_sl, k[:, sl],
                    dimension_numbers=(((1,), (1,)), ((), ())),
                    preferred_element_type=jnp.float32,
                    precision=_prec,
                )

            s2 = qk(0)
            for db in range(1, nd):
                s2 += qk(db)
            if fp32_in:
                s2 *= scale2
            if kd.logit_soft_cap is not None:
                cap2 = kd.logit_soft_cap * LOG2E
                s2, cap_grad = _soft_cap_fwd_grad(s2, cap2)

            if mask_always:
                s2 = jnp.where(build_mask(gi), s2, MASK_VALUE)
            elif needs_mask is not None:
                s2 = jax.lax.cond(
                    needs_mask,
                    lambda s, gi=gi: jnp.where(build_mask(gi), s, MASK_VALUE),
                    lambda s: s,
                    s2,
                )

            lse2 = l_ref[0][grows, :1] * LOG2E           # (qg, 1)
            p = jnp.exp2(s2 - lse2)                      # true probabilities

            def dov(db, grows=grows):
                sl = slice(db * kd.block_d, (db + 1) * kd.block_d)
                return jax.lax.dot_general(
                    d_o[grows, sl], v[:, sl],
                    dimension_numbers=(((1,), (1,)), ((), ())),
                    preferred_element_type=jnp.float32,
                    precision=_prec,
                )

            dp = dov(0)
            for db in range(1, nd):
                dp += dov(db)

            ds = p * (dp - d_scr[grows, :1])
            if kd.logit_soft_cap is not None:
                ds = ds * cap_grad
            ds = ds * scale
            # dS register precision from the policy (reference: dS BF16 only
            # with native BF16 FMA, Precisions.swift:200 — native on TPU).
            ds_cast = ds.astype(ds_dtype)
            for db in range(nd):
                sl = slice(db * kd.block_d, (db + 1) * kd.block_d)
                acc_scr[grows, sl] += jax.lax.dot_general(
                    ds_cast, k[:, sl],
                    dimension_numbers=(((1,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32,
                    precision=_prec,
                )

        for gi in range(n_groups):
            grows = slice(gi * qg, (gi + 1) * qg)
            # Causal handling — see flash_fwd: blockskip/dense apply the
            # mask unconditionally (no lax.cond); "skip" predicates per
            # group (measured slower — kept as a knob).
            if dense or blockskip:
                bwd_q_group(gi, grows, None, mask_always=True)
            elif is_causal:
                r0 = i * bq + gi * qg
                r1 = r0 + qg - 1
                glive = j * bkv <= r1 + offset
                gneeds = (j + 1) * bkv - 1 > r0 + offset
                if window is not None:
                    glive &= (j + 1) * bkv - 1 >= r0 + offset - (window - 1)
                    gneeds |= j * bkv < r1 + offset - (window - 1)
                if col_edge_exists:
                    gneeds |= j == num_kv_blocks - 1

                @pl.when(glive)
                def _group(gi=gi, grows=grows, gneeds=gneeds):
                    bwd_q_group(gi, grows, gneeds)
            else:
                bwd_q_group(gi, grows, block_needs_mask)

    if block_live is True:
        _body()
    else:
        pl.when(block_live)(_body)

    @pl.when(final_cond)
    def _finalize():
        dq_ref[0] = acc_scr[...].astype(dq_ref.dtype)


def build_bwd_query(
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
    interpret: bool = False,
):
    """dQ pass. Inputs: q, o, do [BH, R_pad, D_pad]; k, v [BHkv, C_pad, D_pad];
    l [BH, R_pad, LANES]. Outputs: dq fp32 [BH, R_pad, D_pad], D-term fp32
    [BH, R_pad, LANES] (lane-replicated)."""
    bq, bkv = kd.block_q, kd.block_kv
    r_pad = _cdiv(seq_len_q, bq) * bq
    c_pad = _cdiv(seq_len_kv, bkv) * bkv
    num_q_blocks = r_pad // bq
    num_kv_blocks = c_pad // bkv
    group = batch_heads // kv_batch_heads

    if ((kd.causal or kd.sliding_window is not None)
            and kd.causal_mode == "tablegrid"):
        from mfa_tpu.kernels.flash_fwd import causal_pair_tables

        offset = seq_len_kv - seq_len_q
        i_tab, j_tab, f_tab, l_tab = causal_pair_tables(
            num_q_blocks, num_kv_blocks, bq, bkv, offset,
            kd.sliding_window)
        n_pairs = len(i_tab)
        kernel = functools.partial(
            _bwd_q_kernel,
            kd=kd, scale=scale,
            seq_len_q=seq_len_q, seq_len_kv=seq_len_kv,
            num_kv_blocks=num_kv_blocks, tablegrid=True,
        )

        def row_map_t(bh, g, i_t, j_t, f_t, l_t):
            return (bh, i_t[g], 0)

        def kv_map_t(bh, g, i_t, j_t, f_t, l_t):
            return (bh // group, j_t[g], 0)

        grid_spec = pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=4,
            grid=(batch_heads, n_pairs),
            in_specs=[
                pl.BlockSpec((1, bq, d_pad), row_map_t),    # q
                pl.BlockSpec((1, bkv, d_pad), kv_map_t),    # k
                pl.BlockSpec((1, bkv, d_pad), kv_map_t),    # v
                pl.BlockSpec((1, bq, d_pad), row_map_t),    # o
                pl.BlockSpec((1, bq, d_pad), row_map_t),    # do
                pl.BlockSpec((1, bq, LANES), row_map_t),    # l
            ],
            out_specs=[
                pl.BlockSpec((1, bq, d_pad), row_map_t),    # dq
                pl.BlockSpec((1, bq, LANES), row_map_t),    # D-term
            ],
            scratch_shapes=[
                pltpu.VMEM((bq, LANES), jnp.float32),
                pltpu.VMEM((bq, d_pad), jnp.float32),
            ],
        )
        inner = pl.pallas_call(
            kernel,
            grid_spec=grid_spec,
            out_shape=[
                jax.ShapeDtypeStruct((batch_heads, r_pad, d_pad),
                                     jnp.float32),
                jax.ShapeDtypeStruct((batch_heads, r_pad, LANES),
                                     jnp.float32),
            ],
            compiler_params=pltpu.CompilerParams(
                dimension_semantics=("parallel", "arbitrary"),
            ),
            interpret=interpret,
        )
        # numpy, not jnp — see _build_fwd_tablegrid (trace-leak hazard).
        tabs = (i_tab, j_tab, f_tab, l_tab)

        def call(q3, k3, v3, o3, do3, l3):
            return inner(*tabs, q3, k3, v3, o3, do3, l3)

        return call

    kernel = functools.partial(
        _bwd_q_kernel,
        kd=kd, scale=scale,
        seq_len_q=seq_len_q, seq_len_kv=seq_len_kv,
        num_kv_blocks=num_kv_blocks,
    )

    def row_map(bh, i, j):
        return (bh, i, 0)

    # Causal/window DMA elision via index-map clamp (see flash_fwd).
    if kd.causal or kd.sliding_window is not None:
        offset = seq_len_kv - seq_len_q

        def kv_map(bh, i, j):
            j_max = jnp.maximum(
                ((i + 1) * kd.block_q - 1 + offset) // kd.block_kv, 0)
            jj = jnp.minimum(j, j_max)
            if kd.sliding_window is not None:
                j_min = jnp.clip(
                    (i * kd.block_q + offset - (kd.sliding_window - 1))
                    // kd.block_kv, 0, num_kv_blocks - 1)
                jj = jnp.maximum(jj, j_min)
            return (bh // group, jj, 0)
    else:
        def kv_map(bh, i, j):
            return (bh // group, j, 0)

    return pl.pallas_call(
        kernel,
        grid=(batch_heads, num_q_blocks, num_kv_blocks),
        in_specs=[
            pl.BlockSpec((1, bq, d_pad), row_map),    # q
            pl.BlockSpec((1, bkv, d_pad), kv_map),    # k
            pl.BlockSpec((1, bkv, d_pad), kv_map),    # v
            pl.BlockSpec((1, bq, d_pad), row_map),    # o
            pl.BlockSpec((1, bq, d_pad), row_map),    # do
            pl.BlockSpec((1, bq, LANES), row_map),    # l
        ],
        out_specs=[
            pl.BlockSpec((1, bq, d_pad), row_map),    # dq
            pl.BlockSpec((1, bq, LANES), row_map),    # D-term
        ],
        out_shape=[
            jax.ShapeDtypeStruct((batch_heads, r_pad, d_pad), jnp.float32),
            jax.ShapeDtypeStruct((batch_heads, r_pad, LANES), jnp.float32),
        ],
        scratch_shapes=[
            pltpu.VMEM((bq, LANES), jnp.float32),     # D term, row-replicated
            pltpu.VMEM((bq, d_pad), jnp.float32),     # dQ accumulator
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "arbitrary"),
        ),
        interpret=interpret,
    )


# ---------------------------------------------------------------------------
# backward_key_value: dK and dV, parallel over column blocks
# ---------------------------------------------------------------------------


def _bwd_kv_kernel(
    *refs,
    kd: AttentionKernelDescriptor,
    scale: float,
    seq_len_q: int,
    seq_len_kv: int,
    num_q_blocks: int,
    tablegrid: bool = False,
):
    if tablegrid:
        # Compressed live-pair grid: pairs enumerate (j kv-block, g query
        # head of the group, i live q-block), j-major so the kv block and
        # the dK/dV accumulators stay resident per run.
        (j_tab, g_tab, i_tab, f_tab, l_tab) = refs[:5]
        (q_ref, k_ref, v_ref, do_ref, l_ref, dterm_ref,
         dk_ref, dv_ref, dk_scr, dv_scr) = refs[5:]
        pidx = pl.program_id(1)
        j = j_tab[pidx]
        i = i_tab[pidx]
        setup_cond = f_tab[pidx] == 1
        final_cond = l_tab[pidx] == 1
    else:
        (q_ref, k_ref, v_ref, do_ref, l_ref, dterm_ref,
         dk_ref, dv_ref, dk_scr, dv_scr) = refs
        j = pl.program_id(1)      # kv block (parallel)
        t = pl.program_id(2)      # traversal: (query-head of group, q block)
        i = t % num_q_blocks      # q block within the current query head
        setup_cond = t == 0
        final_cond = t == pl.num_programs(2) - 1
    bq, bkv = kd.block_q, kd.block_kv
    scale2 = scale * LOG2E
    _prec = (jax.lax.Precision.HIGHEST if q_ref.dtype == jnp.float32
             else jax.lax.Precision.DEFAULT)

    @pl.when(setup_cond)
    def _setup():
        dk_scr[...] = jnp.zeros_like(dk_scr)
        dv_scr[...] = jnp.zeros_like(dv_scr)

    offset = seq_len_kv - seq_len_q
    window = kd.sliding_window
    is_causal = kd.causal or window is not None
    # Causal modes — see flash_fwd.
    dense = is_causal and kd.causal_mode == "dense"
    blockskip = is_causal and (kd.causal_mode == "blockskip" or tablegrid)
    if tablegrid:
        block_live = True           # the pair tables ARE the live set
    elif is_causal and not dense:
        block_live = j * bkv <= (i + 1) * bq - 1 + offset
        if window is not None:
            block_live &= (j + 1) * bkv - 1 >= i * bq + offset - (window - 1)
    else:
        block_live = True

    # Edge masks are unnecessary here: padded q rows carry do = 0, so their
    # dV/dK contributions vanish term-by-term, and padded KV columns only
    # produce rows of dK/dV that the wrapper slices away. Only the causal/
    # window band needs masking, and only in blocks it crosses.
    if is_causal:
        block_needs_mask = (j + 1) * bkv - 1 > i * bq + offset
        if window is not None:
            block_needs_mask |= (
                j * bkv < (i + 1) * bq - 1 + offset - (window - 1))
    else:
        block_needs_mask = None

    # Row grouping over the traversal rows (see flash_fwd): group
    # contributions to dK/dV are additive, so each group is an independent
    # chain; partials accumulate in SSA values and hit the scratch once.
    qg = min(kd.block_q_inner or bq, bq)
    if bq % qg != 0:
        qg = bq
    n_groups = bq // qg

    def build_mask(gi):
        # Broadcastable iotas, not (qg, bkv) int32 planes — see flash_fwd.
        row = (i * bq + gi * qg
               + jax.lax.broadcasted_iota(jnp.int32, (qg, 1), 0))
        col = j * bkv + jax.lax.broadcasted_iota(jnp.int32, (1, bkv), 1)
        cm = col <= row + offset
        if window is not None:
            cm &= col >= row + offset - (window - 1)
        return cm

    fp32_in = q_ref.dtype == jnp.float32
    # K/V (BlockSpec blocks of the parallel dim) and dK/dV (scratch) are
    # structurally VMEM-resident across the whole traversal — not a knob
    # (see params.py module docstring). The table's "Q" entry gates the one
    # real choice: materialize a pre-scaled slab of the *streamed* q block
    # per traversal step, or re-scale each d-block slice on the fly.
    q_resident = "Q" in kd.vmem_resident

    def _body():
        k = k_ref[0]
        q = q_ref[0]
        # Pre-scaled copy feeds the S matmul only — dK's dS^T·Q contraction
        # must see the raw Q.
        if fp32_in or not q_resident:
            qs = q
        else:
            qs = (q.astype(jnp.float32) * scale2).astype(q_ref.dtype)
        d_o = do_ref[0]
        v = v_ref[0]
        nd = max(1, q.shape[-1] // kd.block_d)
        p_dtype = kd.register_dtype(kd.p_register, k.dtype)
        ds_dtype = kd.register_dtype(kd.ds_register, k.dtype)

        def kv_group(gi, grows, needs_mask, mask_always=False):
            """One traversal group's (dV, dK) partials: tuple of nd dV
            blocks then nd dK blocks (flat, so it can be a lax.cond
            branch result for the causal group skip)."""
            # S = Q K^T (qg, bkv) — row-major; transposed contractions
            # below feed the MXU directly (no materialized S^T, unlike the
            # reference).
            def qk(db, grows=grows):
                sl = slice(db * kd.block_d, (db + 1) * kd.block_d)
                q_sl = qs[grows, sl]
                if not fp32_in and not q_resident:
                    q_sl = (q_sl.astype(jnp.float32) * scale2).astype(
                        q_ref.dtype)
                return jax.lax.dot_general(
                    q_sl, k[:, sl],
                    dimension_numbers=(((1,), (1,)), ((), ())),
                    preferred_element_type=jnp.float32,
                    precision=_prec,
                )

            s2 = qk(0)
            for db in range(1, nd):
                s2 += qk(db)
            if fp32_in:
                s2 *= scale2
            if kd.logit_soft_cap is not None:
                cap2 = kd.logit_soft_cap * LOG2E
                s2, cap_grad = _soft_cap_fwd_grad(s2, cap2)

            if mask_always:
                s2 = jnp.where(build_mask(gi), s2, MASK_VALUE)
            elif needs_mask is not None:
                s2 = jax.lax.cond(
                    needs_mask,
                    lambda s, gi=gi: jnp.where(build_mask(gi), s, MASK_VALUE),
                    lambda s: s,
                    s2,
                )

            lse2 = l_ref[0][grows, :1] * LOG2E            # (qg, 1)
            p = jnp.exp2(s2 - lse2)                       # (qg, bkv)
            p_cast = p.astype(p_dtype)

            # dV partial: P^T dO — contract over rows (dim 0 of both).
            dv_g = []
            for db in range(nd):
                sl = slice(db * kd.block_d, (db + 1) * kd.block_d)
                dv_g.append(jax.lax.dot_general(
                    p_cast, d_o[grows, sl],
                    dimension_numbers=(((0,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32,
                    precision=_prec,
                ))

            # dP = dO V^T  (qg, bkv)
            def dov(db, grows=grows):
                sl = slice(db * kd.block_d, (db + 1) * kd.block_d)
                return jax.lax.dot_general(
                    d_o[grows, sl], v[:, sl],
                    dimension_numbers=(((1,), (1,)), ((), ())),
                    preferred_element_type=jnp.float32,
                    precision=_prec,
                )

            dp = dov(0)
            for db in range(1, nd):
                dp += dov(db)

            ds = p * (dp - dterm_ref[0][grows, :1])
            if kd.logit_soft_cap is not None:
                ds = ds * cap_grad
            ds = ds * scale
            ds_cast = ds.astype(ds_dtype)

            # dK partial: dS^T Q — contract over rows.
            dk_g = []
            for db in range(nd):
                sl = slice(db * kd.block_d, (db + 1) * kd.block_d)
                dk_g.append(jax.lax.dot_general(
                    ds_cast, q[grows, sl],
                    dimension_numbers=(((0,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32,
                    precision=_prec,
                ))
            return tuple(dv_g) + tuple(dk_g)

        bkv_rows = k.shape[0]
        dv_parts = [None] * nd
        dk_parts = [None] * nd

        for gi in range(n_groups):
            grows = slice(gi * qg, (gi + 1) * qg)
            # Causal handling — see flash_fwd: blockskip/dense mask every
            # group unconditionally (the lax.cond-with-zero-branch group
            # skip measured slower than not skipping).
            if dense or blockskip:
                parts = kv_group(gi, grows, None, mask_always=True)
            elif is_causal:
                r0 = i * bq + gi * qg
                r1 = r0 + qg - 1
                glive = j * bkv <= r1 + offset
                gneeds = (j + 1) * bkv - 1 > r0 + offset
                if window is not None:
                    glive &= (j + 1) * bkv - 1 >= r0 + offset - (window - 1)
                    gneeds |= j * bkv < r1 + offset - (window - 1)
                parts = jax.lax.cond(
                    glive,
                    lambda gi=gi, grows=grows, gneeds=gneeds: kv_group(
                        gi, grows, gneeds),
                    lambda: tuple(
                        jnp.zeros((bkv_rows, kd.block_d), jnp.float32)
                        for _ in range(2 * nd)),
                )
            else:
                parts = kv_group(gi, grows, block_needs_mask)
            for db in range(nd):
                dv_parts[db] = (parts[db] if dv_parts[db] is None
                                else dv_parts[db] + parts[db])
                dk_parts[db] = (parts[nd + db] if dk_parts[db] is None
                                else dk_parts[db] + parts[nd + db])

        for db in range(nd):
            sl = slice(db * kd.block_d, (db + 1) * kd.block_d)
            dv_scr[:, sl] += dv_parts[db]
            dk_scr[:, sl] += dk_parts[db]

    if block_live is True:
        _body()
    else:
        pl.when(block_live)(_body)

    @pl.when(final_cond)
    def _finalize():
        dk_ref[0] = dk_scr[...].astype(dk_ref.dtype)
        dv_ref[0] = dv_scr[...].astype(dv_ref.dtype)


def build_bwd_key_value(
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
    interpret: bool = False,
):
    """dK/dV pass, parallel over KV blocks. The traversal axis runs over
    (query-head group × q blocks) so GQA accumulates into one KV-head
    gradient without atomics. Outputs dk, dv fp32 [BHkv, C_pad, D_pad]."""
    bq, bkv = kd.block_q, kd.block_kv
    r_pad = _cdiv(seq_len_q, bq) * bq
    c_pad = _cdiv(seq_len_kv, bkv) * bkv
    num_q_blocks = r_pad // bq
    num_kv_blocks = c_pad // bkv
    group = batch_heads // kv_batch_heads

    causal_like = kd.causal or kd.sliding_window is not None
    offset = seq_len_kv - seq_len_q

    if causal_like and kd.causal_mode == "tablegrid":
        # Compressed live-pair grid, j-major then (g, i): kv block + dK/dV
        # accumulators stay resident per j run; only live (below-diagonal)
        # q blocks get grid steps (see flash_fwd.causal_pair_tables).
        import numpy as np

        window = kd.sliding_window
        j_t, g_t, i_t, f_t, l_t = [], [], [], [], []
        for j in range(num_kv_blocks):
            live_is = []
            for i in range(num_q_blocks):
                live = j * bkv <= (i + 1) * bq - 1 + offset
                if window is not None:
                    live &= ((j + 1) * bkv - 1
                             >= i * bq + offset - (window - 1))
                if live:
                    live_is.append(i)
            if not live_is:
                # Fully-masked run keeps the setup/finalize + dK/dV block
                # writes (contributions vanish through the mask).
                live_is = [0]
            run = [(g, i) for g in range(group) for i in live_is]
            for idx, (g, i) in enumerate(run):
                j_t.append(j)
                g_t.append(g)
                i_t.append(i)
                f_t.append(1 if idx == 0 else 0)
                l_t.append(1 if idx == len(run) - 1 else 0)
        tabs_np = (np.asarray(j_t, np.int32), np.asarray(g_t, np.int32),
                   np.asarray(i_t, np.int32), np.asarray(f_t, np.int32),
                   np.asarray(l_t, np.int32))
        n_pairs = len(j_t)

        kernel = functools.partial(
            _bwd_kv_kernel,
            kd=kd, scale=scale,
            seq_len_q=seq_len_q, seq_len_kv=seq_len_kv,
            num_q_blocks=num_q_blocks, tablegrid=True,
        )

        def q_map_t(bhkv, p, j_tb, g_tb, i_tb, f_tb, l_tb):
            return (bhkv * group + g_tb[p], i_tb[p], 0)

        def kv_map_t(bhkv, p, j_tb, g_tb, i_tb, f_tb, l_tb):
            return (bhkv, j_tb[p], 0)

        grid_spec = pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=5,
            grid=(kv_batch_heads, n_pairs),
            in_specs=[
                pl.BlockSpec((1, bq, d_pad), q_map_t),      # q
                pl.BlockSpec((1, bkv, d_pad), kv_map_t),    # k
                pl.BlockSpec((1, bkv, d_pad), kv_map_t),    # v
                pl.BlockSpec((1, bq, d_pad), q_map_t),      # do
                pl.BlockSpec((1, bq, LANES), q_map_t),      # l
                pl.BlockSpec((1, bq, LANES), q_map_t),      # D-term
            ],
            out_specs=[
                pl.BlockSpec((1, bkv, d_pad), kv_map_t),    # dk
                pl.BlockSpec((1, bkv, d_pad), kv_map_t),    # dv
            ],
            scratch_shapes=[
                pltpu.VMEM((bkv, d_pad), jnp.float32),
                pltpu.VMEM((bkv, d_pad), jnp.float32),
            ],
        )
        inner = pl.pallas_call(
            kernel,
            grid_spec=grid_spec,
            out_shape=[
                jax.ShapeDtypeStruct((kv_batch_heads, c_pad, d_pad),
                                     jnp.float32),
                jax.ShapeDtypeStruct((kv_batch_heads, c_pad, d_pad),
                                     jnp.float32),
            ],
            compiler_params=pltpu.CompilerParams(
                dimension_semantics=("parallel", "arbitrary"),
            ),
            interpret=interpret,
        )
        # numpy, not jnp — see _build_fwd_tablegrid (trace-leak hazard).
        tabs = tabs_np

        def call(q3, k3, v3, do3, l3, dterm3):
            return inner(*tabs, q3, k3, v3, do3, l3, dterm3)

        return call

    kernel = functools.partial(
        _bwd_kv_kernel,
        kd=kd, scale=scale,
        seq_len_q=seq_len_q, seq_len_kv=seq_len_kv,
        num_q_blocks=num_q_blocks,
    )

    # Traversal axis t enumerates (g, i): query head g of the group, then
    # its q blocks. bh of the q-side = bh_kv * group + g. For causal, dead
    # q blocks (above the diagonal) clamp to the first live block so their
    # DMA is elided (see flash_fwd).

    def q_map(bhkv, j, t):
        g = t // num_q_blocks
        i = t % num_q_blocks
        if causal_like:
            i_min = jnp.clip((j * kd.block_kv - offset) // kd.block_q,
                             0, num_q_blocks - 1)
            i = jnp.maximum(i, i_min)
        return (bhkv * group + g, i, 0)

    def kv_map(bhkv, j, t):
        return (bhkv, j, 0)

    return pl.pallas_call(
        kernel,
        grid=(kv_batch_heads, num_kv_blocks, group * num_q_blocks),
        in_specs=[
            pl.BlockSpec((1, bq, d_pad), q_map),      # q
            pl.BlockSpec((1, bkv, d_pad), kv_map),    # k
            pl.BlockSpec((1, bkv, d_pad), kv_map),    # v
            pl.BlockSpec((1, bq, d_pad), q_map),      # do
            pl.BlockSpec((1, bq, LANES), q_map),      # l
            pl.BlockSpec((1, bq, LANES), q_map),      # D-term
        ],
        out_specs=[
            pl.BlockSpec((1, bkv, d_pad), kv_map),    # dk
            pl.BlockSpec((1, bkv, d_pad), kv_map),    # dv
        ],
        out_shape=[
            jax.ShapeDtypeStruct((kv_batch_heads, c_pad, d_pad), jnp.float32),
            jax.ShapeDtypeStruct((kv_batch_heads, c_pad, d_pad), jnp.float32),
        ],
        scratch_shapes=[
            pltpu.VMEM((bkv, d_pad), jnp.float32),    # dK accumulator
            pltpu.VMEM((bkv, d_pad), jnp.float32),    # dV accumulator
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "arbitrary"),
        ),
        interpret=interpret,
    )
