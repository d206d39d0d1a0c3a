"""Problem- and kernel-level descriptors.

The reference's three-tier configuration pipeline, kept almost verbatim
(SURVEY.md calls it "the single most reusable design in the repo"):

  problem descriptor (user-facing)
    → heuristics + parameter tables
      → kernel descriptor (hashable; the specialization-cache key)

References:
- ``AttentionDescriptor`` (AttentionDescriptor.swift:10-27) →
  :class:`AttentionDescriptor`
- ``AttentionKernelDescriptor`` (AttentionKernelDescriptor.swift:8-49) →
  :class:`AttentionKernelDescriptor`
- ``GEMMDescriptor`` / ``GEMMKey`` (GEMMDescriptor.swift:11-74) →
  :class:`GEMMDescriptor`
- ``GEMMKernelDescriptor`` (GEMMKernelDescriptor.swift:21-181) →
  :class:`GEMMKernelDescriptor`

Metal function constants (exact M/N/K baked at pipeline-build time,
GEMMKernel+Source.swift:117-127) map onto XLA static shapes at trace time:
the kernel descriptor captures the *shape class* (block dims, dtypes), and
``jax.jit`` specializes on the exact shapes — exactly the reference's
library-cache vs pipeline-cache split.
"""

from __future__ import annotations

import enum
import math
from dataclasses import dataclass, replace

from mfa_tpu.ops import params as params_mod
from mfa_tpu.ops.precision import (
    AttentionOperand,
    OperandPrecision,
    PrecisionPolicy,
    make_precision_policy,
)

# Causal schedule default + bench override (scripts/bench_train.py --mode).
# "tablegrid" (compressed live-pair grid via scalar prefetch) measured
# 0.528 vs blockskip's 0.517 at D=128 N=4096 (round-4 sweep,
# scripts/ab_causal_blocks.py) and is structurally cleaner (no dead grid
# steps at all). The round-4 block sweep also showed the per-grid-step
# overhead (~2 us) makes SMALLER traversal blocks strictly worse (bkv=512:
# 0.356), so the diagonal over-compute (~1 + bkv/N) is irreducible at this
# design point — see docs/MEASUREMENTS.md round 4.
_CAUSAL_MODE_DEFAULT = "tablegrid"
_causal_mode_override: str | None = None
# Row-group override for A/B harnesses (scripts/ab_headline.py); None =
# the measured heuristic below.
_qg_override: int | None = None


def set_qg_override(qg: int | None) -> None:
    """Force block_q_inner for every subsequently-built descriptor (A/B
    harness hook, the qg analogue of set_causal_mode_override)."""
    global _qg_override
    _qg_override = qg


def set_causal_mode_override(mode: str | None) -> None:
    """Force every subsequently-built attention kernel's causal schedule
    (None restores the measured default). Bench/testing knob."""
    global _causal_mode_override
    _causal_mode_override = mode


class AttentionKernelType(enum.Enum):
    """The three-kernel split (reference: AttentionKernelType.swift:10-23).

    forward            — computes O and L(=m + log2 l), parallel over rows
    backward_query     — computes D and dQ, parallel over rows
    backward_key_value — computes dK and dV, parallel over columns

    The split is the atomics-free backward: dQ and dK/dV are two separate,
    100%-parallel passes (reference README.md:39-46). TPU also lacks fast
    cross-core float atomics, so the design transfers directly.
    """

    FORWARD = "forward"
    BACKWARD_QUERY = "backward_query"
    BACKWARD_KEY_VALUE = "backward_key_value"


@dataclass(frozen=True)
class AttentionDescriptor:
    """User-facing attention problem spec (reference:
    AttentionDescriptor.swift:10-27), widened with the batch/multi-head/GQA
    dispatch the reference leaves to the client (reference is single-head:
    README.md:7).
    """

    batch: int
    num_q_heads: int
    num_kv_heads: int
    seq_len_q: int      # R in the reference
    seq_len_kv: int     # C in the reference
    head_dim: int       # D in the reference
    causal: bool = False
    # softmax scale; None => 1/sqrt(D) folded with log2(e) inside the kernel
    # (reference folds log2(e)*rsqrt(D) into one multiply,
    # AttentionKernel+Softmax.swift:17-26)
    scale: float | None = None
    logit_soft_cap: float | None = None
    # Mistral-style sliding window: each query attends the W keys ending at
    # its causal diagonal (implies the causal upper bound).
    sliding_window: int | None = None
    low_precision_inputs: bool = False
    low_precision_intermediates: bool = False
    kv_cache_precision: OperandPrecision | None = None

    def __post_init__(self):
        if self.num_q_heads % self.num_kv_heads != 0:
            raise ValueError(
                f"num_q_heads ({self.num_q_heads}) must be a multiple of "
                f"num_kv_heads ({self.num_kv_heads})"
            )

    @property
    def softmax_scale(self) -> float:
        return self.scale if self.scale is not None else 1.0 / math.sqrt(self.head_dim)

    def precision_policy(self) -> PrecisionPolicy:
        return make_precision_policy(
            self.low_precision_inputs,
            self.low_precision_intermediates,
            self.kv_cache_precision,
        )

    def kernel_descriptor(
        self,
        kernel_type: AttentionKernelType,
        generation: params_mod.TpuGeneration | None = None,
    ) -> "AttentionKernelDescriptor":
        """Heuristic: pick the parameter-table row and clamp blocks to the
        problem (reference: AttentionDescriptor.swift:33-130, incl. the
        head-block clamp to padded D at :48-53)."""
        gen = generation or params_mod.detect_generation()
        is_causal = self.causal or self.sliding_window is not None
        rows = params_mod.parameter_table(
            kernel_type.value, self.low_precision_inputs, causal=is_causal,
            generation=gen.name,
        )
        row = params_mod.select_row(rows, self.head_dim)

        # Clamp blocks to the (padded) problem dims. Lane dim stays 128-
        # aligned; sublane tiling handled by Mosaic.
        block_q = min(row.block_q, _round_up(self.seq_len_q, 128))
        block_kv = min(row.block_kv, _round_up(self.seq_len_kv, 128))
        d_padded = _round_up(self.head_dim, 128)
        # block_d must evenly divide padded D so the in-kernel head-dim loop
        # takes equal slices: largest multiple of 128 dividing d_padded that
        # is <= the table's block (128 always qualifies).
        block_d = min(row.block_d, d_padded)
        while d_padded % block_d != 0:
            block_d -= 128
        block_d = max(block_d, min(128, d_padded))

        policy = self.precision_policy()
        return AttentionKernelDescriptor(
            kernel_type=kernel_type,
            causal_mode=_causal_mode_override or _CAUSAL_MODE_DEFAULT,
            block_q=block_q,
            block_kv=block_kv,
            block_d=block_d,
            head_dim=self.head_dim,
            causal=self.causal,
            sliding_window=self.sliding_window,
            logit_soft_cap=self.logit_soft_cap,
            q_precision=policy.mem(AttentionOperand.Q),
            kv_precision=policy.mem(AttentionOperand.K),
            o_precision=policy.mem(AttentionOperand.O),
            p_register=policy.reg(AttentionOperand.P),
            ds_register=policy.reg(AttentionOperand.dS),
            vmem_resident=row.vmem_resident,
            generation=gen.name,
            # Causal prefers a single row group: the blockskip masks run
            # per group, and 1024/1024 qg=0 measured 0.533 vs 0.486 at
            # qg=256 (round-3 fwd A/B on v5e). Non-causal with a >=1024-row
            # block prefers qg=512 (round-4 sweeps: fwd 0.864 vs 0.825 at
            # D=128 same-run; train-step 0.935 vs 0.924 at D=128 — the
            # wider group halves per-group state traffic). GATED to
            # d_pad <= 128: at larger head dims the doubled live S/dS tiles
            # push scoped VMEM over 16 MiB (round-5 compile probes: bwd_kv
            # D=256 2048/512/256 hits 16.63M at qg=512, compiles at 256;
            # fwd D=384 1024/2048/384 hits 17.5M in the train VJP — every
            # round-5 large-D sweep row was in fact measured at qg=256, the
            # old tables' implied value).
            block_q_inner=(_qg_override if _qg_override is not None
                           else 0 if is_causal
                           else 512 if block_q >= 1024 and d_padded <= 128
                           else 256),
        )


@dataclass(frozen=True)
class AttentionKernelDescriptor:
    """Shape-class descriptor = specialization-cache key (reference:
    AttentionKernelDescriptor.swift:8-49). Hashable and frozen; everything
    the kernel builder needs, nothing tied to exact sequence lengths."""

    kernel_type: AttentionKernelType
    block_q: int
    block_kv: int
    block_d: int
    head_dim: int
    causal: bool
    sliding_window: int | None
    logit_soft_cap: float | None
    q_precision: OperandPrecision
    kv_precision: OperandPrecision
    o_precision: OperandPrecision
    # Register (MXU-input) precisions for the virtual operands, resolved from
    # the PrecisionPolicy (reference: registerPrecisions,
    # AttentionDescriptor+Precisions.swift:180-215). Consumed by the kernel
    # builders for the P → PV and dS → dQ/dK cast decisions.
    p_register: OperandPrecision = OperandPrecision.BF16
    ds_register: OperandPrecision = OperandPrecision.BF16
    vmem_resident: tuple = ()
    generation: str = "cpu"
    # In-kernel traversal sub-tile (per-sub-tile online softmax). MEASURED
    # HARMFUL on v5e (0.81 → 0.41 util at D=128: the per-sub-tile rescale
    # chain beats any MXU/VPU overlap Mosaic finds — it schedules the one
    # big tile better than a manual pipeline). Kept as an off-by-default
    # knob; docs/sweeps/r2_sweep.jsonl + scripts/ab_subtile.py hold the
    # evidence. 0 = one tile per block (default, fastest).
    block_kv_inner: int = 0
    # In-kernel row grouping: rows of the online softmax are independent, so
    # splitting the q block into groups gives the scheduler data-independent
    # MXU/VPU chains without touching the rescale semantics, and only the
    # live group's S tile occupies VMEM (which is what lets block_q grow to
    # 1024 at block_kv=4096). MEASURED on v5e D=128: 0.81 → 0.856 util
    # (scripts/ab_subtile.py; 256 beat 128 and whole-block). 0 = off.
    block_q_inner: int = 256
    # Causal strategy, measured on v5e D=128 (docs/MEASUREMENTS.md round 3):
    # - "blockskip" (DEFAULT): block-level pl.when skip + unconditional
    #   in-block masks — 0.533 util at 1024/1024.
    # - "dense": no predication at all, mask everything — 0.379 (the dead
    #   blocks' MXU work is the gap; masked columns contribute
    #   exp2(-big)=0 so both are exact).
    # - "skip": per-group pl.when + lax.cond-wrapped masks — 0.244: the
    #   lax.cond materializes S into branch buffers and breaks Mosaic's
    #   pipelining, costing MORE than the skipped compute saves. Kept as a
    #   knob for future Mosaic versions.
    causal_mode: str = "blockskip"

    @property
    def d_blocked(self) -> bool:
        """True when the head dim is traversed in blocks (the reference's
        third block dimension, README.md:13)."""
        return self.block_d < _round_up(self.head_dim, 128)

    def register_dtype(self, reg: OperandPrecision, operand_dtype):
        """Resolve a register precision against the actual operand dtype.

        A 16-bit register precision materializes in the operand's own 16-bit
        family (so FP16 inputs keep an FP16 MXU pass rather than a promoted
        mixed one); a 32-bit register precision forces FP32. This is the
        analogue of the reference's rule that S/P register precision may only
        drop to FP16 when the inputs are FP16 (Precisions.swift:197-200).
        """
        import jax.numpy as jnp

        if reg.bits > 16 or jnp.dtype(operand_dtype).itemsize > 2:
            return jnp.float32
        return operand_dtype


# ---------------------------------------------------------------------------
# GEMM descriptors
# ---------------------------------------------------------------------------


@dataclass(frozen=True)
class GEMMDescriptor:
    """GEMM problem spec (reference: GEMMDescriptor.swift:11-47).

    Batch and accumulate (``load_previous_c``) carry over; leading-dimension
    games do not (XLA owns layout). C = A @ B (+C0), with optional
    transposes applied to the logical operands.
    """

    m: int
    n: int
    k: int
    a_precision: OperandPrecision = OperandPrecision.FP32
    b_precision: OperandPrecision = OperandPrecision.FP32
    c_precision: OperandPrecision = OperandPrecision.FP32
    transpose_a: bool = False
    transpose_b: bool = False
    batch: int = 1
    load_previous_c: bool = False

    def kernel_descriptor(
        self, generation: params_mod.TpuGeneration | None = None
    ) -> "GEMMKernelDescriptor":
        """Block-size heuristic (reference: GEMMDescriptor.swift:240-322).

        The reference picks 32³ vs 48×48×24/32 from occupancy; the TPU
        analogue targets the 128×128 MXU with blocks sized so A+B+C tiles
        (double-buffered) fit a VMEM budget, shrinking for small problems so
        the grid still covers all cores.
        """
        gen = generation or params_mod.detect_generation()
        in_bytes = max(self.a_precision.bytes, self.b_precision.bytes)
        budget = gen.vmem_bytes * 0.7

        # Large problems: output-stationary whole-K macro-tiles (no k grid
        # axis — one (bm, bn) output tile accumulates its whole-K product
        # in VMEM while Mosaic tiles the in-block K loop). Round-5 chip
        # sweep (docs/sweeps/gemm_blocks.jsonl): 768³-macro whole-K lifts
        # the in-house kernel at 1488³ from 131 → 160-167 TF/s (NN/NT) and
        # reclaims TN/TT to 154-156 — NT reaches ~0.95 of XLA. Applied
        # when the whole-K A/B slabs of at least a 256-macro-tile fit the
        # VMEM budget.
        whole_k = _round_up(self.k, 128)
        if self.m * self.n * self.k >= 1152 ** 3:
            # 0.78 gate (not the generic 0.7): the winning 768-macro tile
            # prices at 11.8 MiB under this accounting and is
            # compile-and-run verified on chip at K=1536 (the sweep
            # measured it at 160-167 TF/s) — the generic margin would
            # reject the measured best.
            for mac in (768, 512, 256):
                bm = min(mac, _round_up(self.m, 128))
                bn = min(mac, _round_up(self.n, 128))
                if (bm * bn * 4 + 2 * in_bytes * whole_k * (bm + bn)
                        <= gen.vmem_bytes * 0.78):
                    return GEMMKernelDescriptor(
                        block_m=bm, block_n=bn, block_k=whole_k,
                        a_precision=self.a_precision,
                        b_precision=self.b_precision,
                        c_precision=self.c_precision,
                        transpose_a=self.transpose_a,
                        transpose_b=self.transpose_b,
                        load_previous_c=self.load_previous_c,
                        generation=gen.name,
                    )

        # Start from the large square block and shrink along each dim to the
        # problem; keep multiples of the MXU tile.
        bm = min(512, _round_up(self.m, 128))
        bn = min(512, _round_up(self.n, 128))
        bk = min(512, _round_up(self.k, 128))
        # VMEM: 2*(bm*bk + bk*bn)*in_bytes (double-buffered A/B) + bm*bn*4
        while bm * bn * 4 + 2 * in_bytes * bk * (bm + bn) > budget:
            if bk > 128:
                bk //= 2
            elif max(bm, bn) > 128:
                if bm >= bn:
                    bm //= 2
                else:
                    bn //= 2
            else:
                break
        return GEMMKernelDescriptor(
            block_m=bm,
            block_n=bn,
            block_k=bk,
            a_precision=self.a_precision,
            b_precision=self.b_precision,
            c_precision=self.c_precision,
            transpose_a=self.transpose_a,
            transpose_b=self.transpose_b,
            load_previous_c=self.load_previous_c,
            generation=gen.name,
        )


@dataclass(frozen=True)
class GEMMKernelDescriptor:
    """GEMM shape-class descriptor (reference: GEMMKernelDescriptor.swift:21-181).

    Register-precision validation truth table (GEMMKernel.swift:46-103)
    collapses on TPU to: MXU accumulates FP32; BF16 accumulation is banned
    exactly as the reference bans BF16 accumulators (:98-103).
    """

    block_m: int
    block_n: int
    block_k: int
    a_precision: OperandPrecision
    b_precision: OperandPrecision
    c_precision: OperandPrecision
    transpose_a: bool
    transpose_b: bool
    load_previous_c: bool
    generation: str


def _round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


def round_up(x: int, m: int) -> int:
    return _round_up(x, m)
