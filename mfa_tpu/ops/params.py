"""Kernel parameter tables: the per-(D, dtype, chip-generation) block-size
heuristics, in the reference's pipe-delimited mini-DSL.

Recast of the reference's "large parameter file"
(AttentionDescriptor+Parameters.swift:77-286) and its row parser
(AttentionParameterRow.swift:22-74) for TPU:

- "parallelization block" → ``block_q`` (rows of Q per grid step for
  forward/dQ; this is the dimension threadgroups parallelize over in the
  reference, AttentionKernel.swift:207-214)
- "traversal block"       → ``block_kv`` (columns streamed per inner step)
- "head block"            → ``block_d`` (the third block dimension, the
  reference's headline D-blocking feature, README.md:13)
- "registers-resident operand list" → operands whose full (block, D) slab is
  held in VMEM across the whole traversal loop rather than re-streamed per
  d-block (AttentionKernel+Caching.swift:18-281). On TPU most of the
  reference's cached-operand choices are *structural*, not tunable: the
  parallel-dimension block operands (Q/O for forward and dQ, K/V/dK/dV for
  the key-value pass) are pinned in VMEM by the Pallas BlockSpec / scratch
  machinery for the whole traversal loop no matter what the table says. The
  one real per-row residency decision left is the pre-scaled Q slab — "Q"
  resident materializes Q·(scale·log2e) once and holds it; absent, each
  d-block slice is re-scaled on the fly (saves a (block, D) slab at the cost
  of one extra VPU multiply per contraction — what the unbounded fallback
  rows choose). The tables therefore list only operands that actually change
  the traced kernel (locked by tests/test_precision_wiring.py).

Selection rule is identical: first row whose ``max_d`` >= problem D
(AttentionDescriptor+Parameters.swift:41-66).

Instead of Apple-architecture columns (apple8/apple9), tables are keyed by
TPU generation, and every row is validated against the generation's VMEM
budget — the TPU analogue of the reference's occupancy reasoning
(GEMMKernelDescriptor.swift:87-115).
"""

from __future__ import annotations

from dataclasses import dataclass, field

# ---------------------------------------------------------------------------
# Chip generation model
# ---------------------------------------------------------------------------


@dataclass(frozen=True)
class TpuGeneration:
    """Per-generation hardware constants (the analogue of the reference's
    device-name parse + core-count query, GEMMDescriptor.swift:133-169,
    GEMMDescriptor+CoreCount.swift:19-80)."""

    name: str
    vmem_bytes: int
    hbm_gbps: float            # HBM bandwidth per chip, GB/s
    bf16_tflops: float         # MXU peak, bf16 inputs / fp32 accumulate
    int8_tops: float
    mxu_tile: tuple = (128, 128)


GENERATIONS = {
    "v4": TpuGeneration("v4", 16 * 2**20, 1228.0, 137.5, 275.0),
    "v5e": TpuGeneration("v5e", 16 * 2**20, 819.0, 197.0, 394.0),
    "v5p": TpuGeneration("v5p", 16 * 2**20, 2765.0, 229.0, 459.0),
    "v6e": TpuGeneration("v6e", 32 * 2**20, 1640.0, 918.0, 1836.0),
    # CPU interpret/testing fallback behaves like a small v5e.
    "cpu": TpuGeneration("cpu", 16 * 2**20, 100.0, 1.0, 2.0),
}


def detect_generation() -> TpuGeneration:
    """Best-effort detection of the local chip generation."""
    import jax

    try:
        dev = jax.devices()[0]
    except Exception:
        return GENERATIONS["cpu"]
    kind = getattr(dev, "device_kind", "").lower()
    for key in ("v6e", "v5p", "v5e", "v4"):
        if key in kind:
            return GENERATIONS[key]
    if "v5 lite" in kind or "v5lite" in kind:
        return GENERATIONS["v5e"]
    if "v6 lite" in kind or "v6lite" in kind:
        return GENERATIONS["v6e"]
    if dev.platform == "tpu" or dev.platform == "axon":
        return GENERATIONS["v5e"]
    return GENERATIONS["cpu"]


# ---------------------------------------------------------------------------
# Row model + mini-DSL parser
# ---------------------------------------------------------------------------


@dataclass(frozen=True)
class ParameterRow:
    """One row of a parameter table (reference: AttentionParameterRow.swift:8-20).

    ``max_d``: this row applies to head dims <= max_d (0 = unbounded).
    ``block_q/kv/d``: the three block dimensions.
    ``vmem_resident``: operand names whose whole (block, D) slab stays in
    VMEM across the traversal loop.
    """

    max_d: int
    block_q: int
    block_kv: int
    block_d: int
    vmem_resident: tuple = field(default_factory=tuple)


def parse_table(text: str) -> list[ParameterRow]:
    """Parse a pipe-delimited table (reference: AttentionParameterRow.swift:22-74).

    Format per line:  max_d | block_q | block_kv | block_d | op1, op2, ...
    Lines starting with '#' or blank lines are ignored; a 'inf' max_d means
    unbounded (stored as 0).
    """
    rows = []
    for line in text.strip().splitlines():
        line = line.strip()
        if not line or line.startswith("#"):
            continue
        parts = [p.strip() for p in line.split("|")]
        if len(parts) not in (4, 5):
            raise ValueError(f"malformed parameter row: {line!r}")
        max_d = 0 if parts[0] in ("inf", "-") else int(parts[0])
        ops = ()
        if len(parts) == 5 and parts[4]:
            ops = tuple(o.strip() for o in parts[4].split(",") if o.strip())
        rows.append(
            ParameterRow(
                max_d=max_d,
                block_q=int(parts[1]),
                block_kv=int(parts[2]),
                block_d=int(parts[3]),
                vmem_resident=ops,
            )
        )
    if not rows:
        raise ValueError("empty parameter table")
    if rows[-1].max_d != 0:
        raise ValueError("last row of a parameter table must be unbounded (max_d=inf)")
    return rows


def select_row(rows: list[ParameterRow], head_dim: int) -> ParameterRow:
    """First row with head_dim <= max_d (reference:
    AttentionDescriptor+Parameters.swift:41-66)."""
    for row in rows:
        if row.max_d == 0 or head_dim <= row.max_d:
            return row
    raise AssertionError("unreachable: last row is unbounded")


# ---------------------------------------------------------------------------
# The tables themselves
# ---------------------------------------------------------------------------
# Seed values chosen from VMEM-budget analysis (validated by
# tests/test_params.py::test_vmem_budget); regenerated by the autotune
# harness (mfa_tpu/utils/autotune.py) per generation — the TPU analogue of
# the reference's 4-candidate occupancy search
# (GEMMDescriptor+PipelineCache.swift:75-119).
#
# Rationale: q/kv blocks are multiples of the 128-lane dimension; bf16 wants
# >=16 sublanes. Larger block_kv amortizes the online-softmax rescale work
# (the reference's reason for wide traversal blocks, README.md:13); block_q
# bounds the parallel grid granularity. For D > 256, block_d < D pages the
# accumulator through VMEM per d-block — the register-spill scheme of
# AttentionKernel+Accumulate.swift:176-264 recast as VMEM paging.

_FWD_BF16 = """
# max_d | block_q | block_kv | block_d | vmem-resident
# v5e-measured (scripts/sweep_r2.py + calibrated chained timing, N=4096,
# docs/sweeps/r2_sweep.jsonl + docs/MEASUREMENTS.md round-2 table): wide
# traversal blocks win — the online-softmax state update amortizes over
# block_kv — and 256-row grouping (block_q_inner) shrinks the live S tile
# to the current group, which is what lets block_q grow to 1024 (fewer
# grid steps). D=128: 1024/4096 = 0.856 util vs 512/4096 = 0.81;
# D=256: 256/4096/256 = 0.850. bkv clamps to the sequence, so short
# sequences degrade gracefully.
#
# Large-D rows v5e-measured round 5 (docs/sweeps/r2_sweep.jsonl N=4096;
# all large-D measurements at qg=256 — the qg=512 widening is gated to
# d_pad <= 128 by the scoped-VMEM compile probes, descriptors.py):
# D=384: the sweep winner 1024/2048/384 (0.855) does not COMPOSE — in the
# train-step VJP its scoped-VMEM allocation reaches 18.0M (bench_train
# compile error, twice-probed) — so ship the measured runner-up
# 512/2048/128 (166.3 TF/s, 0.844). D=512 (inf row): 256/1024/128 =
# 0.825 — the streamed-KV double buffer forces the narrow traversal
# block at d_pad=512 on 16 MiB VMEM.
   64   |   512   |   4096   |  128    | Q
  128   |  1024   |   4096   |  128    | Q
  256   |   256   |   4096   |  256    | Q
  384   |   512   |   2048   |  128    |
  inf   |   256   |   1024   |  128    |
"""

# FP32 rows carry no residency list: the fp32 kernel path scales S in fp32
# after the QK^T matmul (to hold the 2e-5 budget) and never materializes a
# pre-scaled Q slab, so the one tunable residency knob does not exist there.
_FWD_FP32 = """
   64   |   256   |    512   |   64    |
  128   |   256   |    256   |  128    |
  256   |   128   |    256   |  256    |
  inf   |   128   |    128   |  128    |
"""

_BWD_Q_BF16 = """
# v5e-measured (scripts/sweep_r2.py, N=4096 H=8, docs/sweeps/r2_sweep.jsonl):
# dQ parallelizes over q rows and streams kv; a big parallel block (fewer
# grid steps) beats a wide traversal block here because the streamed kv is
# read-only — no online-rescale work to amortize. D=128: 1024/2048 = 0.916
# util (vs 0.785 at the old 256/1024-class blocks); D=256: 1024/1024/256 =
# 0.937; D=64 is pad-limited (see MEASUREMENTS.md): 1024/2048 = 0.463.
   64   |  1024   |   2048   |  128    | Q
  128   |  1024   |   4096   |  128    | Q
  256   |  1024   |   1024   |  256    | Q
  384   |  1024   |   1024   |  384    |
  inf   |   512   |   1024   |  256    |
"""
# Large-D bwd_q rows v5e-measured round 5: D=384 1024/1024/384 = 0.978,
# D=512 (inf) 512/1024/256 = 0.953 — the parallel-block shape class of the
# D<=256 rows carries straight through; only bd grows with the dim.
# D=128 traversal widened to the whole sequence round 5: 1024/4096 =
# 0.950 measured vs 0.916 at 2048 — a config the old VMEM envelope
# wrongly pruned (compile probes showed it builds; docs/sweeps/
# vmem_probe.jsonl "loose" rows).

_BWD_Q_FP32 = """
   64   |   128   |    256   |   64    |
  128   |   128   |    256   |  128    |
  inf   |   128   |    128   |  128    |
"""

# bwd_kv parallelizes over KV columns (bkv) and streams q blocks (bq is the
# TRAVERSAL block here — K/V/dK/dV residency across the traversal is
# structural, see module docstring; "Q" marks the pre-scaled slab of the
# *streamed* q block, re-materialized per traversal step).
#
# v5e-measured (scripts/sweep_r2.py round 3, N=4096 H=8,
# docs/sweeps/r2_sweep.jsonl): the traversal block wants to be the WHOLE
# sequence (bq=4096 → one streamed pass per kv block, zero re-streaming of
# the parallel slabs) and the kv block as wide as the dK/dV accumulators
# allow. D=128: 4096/1024/128 = 0.921 util (vs 0.577 at the round-2 seed
# class 1024/256); D=64: 4096/1024 = 0.469, pad-limited (≈0.94 of the
# d_pad=128 work executed). D=256: the sweep's best was 4096/512/256 =
# 0.946, but that row overflows scoped VMEM by 512 KiB when composed in the
# full train-step VJP (the lane-replicated L/D-term blocks double-buffer at
# 2 MiB each at bq=4096×D=256 — bench_train round-3 OOM); ship the measured
# runner-up 2048/512/256 = 0.927 which fits with ~5 MiB headroom. bd=256
# beat bd=128 at every (bq,bkv) pair measured — the opposite of the
# forward. bq clamps to round_up(seq, 128), so short sequences degrade
# gracefully.
_BWD_KV_BF16 = """
   64   |  4096   |   1024   |  128    | Q
  128   |  4096   |   1024   |  128    | Q
  256   |  2048   |    512   |  256    | Q
  384   |  1024   |    512   |  384    |
  inf   |  1024   |    512   |  256    |
"""
# Large-D bwd_kv rows v5e-measured round 5: D=384 1024/512/384 = 0.902,
# D=512 (inf) 1024/512/256 = 0.891 — narrower traversal than the D<=256
# whole-sequence rows because the streamed-Q/dO double buffers scale with
# d_pad.

_BWD_KV_FP32 = """
   64   |   128   |    256   |   64    |
  128   |   128   |    256   |  128    |
  inf   |   128   |    128   |  128    |
"""

# ---------------------------------------------------------------------------
# Causal tables. Causal block selection differs from non-causal: the
# block-level skip ("blockskip" causal mode, descriptors.py) needs traversal
# granularity — at block_kv = N every block straddles the diagonal and
# nothing skips. v5e D=128 fwd measured (round-3 A/B, /tmp sweeps →
# MEASUREMENTS.md): 1024/1024 = 0.533 util vs 0.379 at the non-causal row's
# 1024/4096. Rows not marked measured are seeds in the measured row's shape
# class.

_FWD_BF16_CAUSAL = """
   64   |  1024   |   1024   |  128    | Q
  128   |  1024   |   1024   |  128    | Q
  256   |  1024   |   1024   |  256    | Q
  inf   |   128   |    512   |  128    |
"""

_BWD_Q_BF16_CAUSAL = """
   64   |  1024   |   1024   |  128    | Q
  128   |  1024   |   1024   |  128    | Q
  256   |   512   |   1024   |  256    | Q
  inf   |   128   |    128   |  128    |
"""
# Causal bwd_q D=256: 1024/1024/256 at the causal qg=0 (single row group)
# needs 16.43M scoped VMEM on the current Mosaic — 0.43M over (round-5
# compile probe). 512/1024/256 compiles; so does 1024/1024/256 at qg=256,
# but the qg=0 rule is the round-3 causal measurement — ship the smaller
# parallel block.

# bwd_kv: block_q is the TRAVERSAL block — causal skip granularity lives on
# it, so unlike non-causal (whole-sequence traversal) it stays moderate.
_BWD_KV_BF16_CAUSAL = """
   64   |  1024   |   1024   |  128    | Q
  128   |  1024   |   1024   |  128    | Q
  256   |  1024   |    512   |  256    | Q
  inf   |   128   |    128   |  128    |
"""

_TABLES = {
    ("forward", "bf16"): _FWD_BF16,
    ("forward", "fp32"): _FWD_FP32,
    ("backward_query", "bf16"): _BWD_Q_BF16,
    ("backward_query", "fp32"): _BWD_Q_FP32,
    ("backward_key_value", "bf16"): _BWD_KV_BF16,
    ("backward_key_value", "fp32"): _BWD_KV_FP32,
    ("forward", "bf16", "causal"): _FWD_BF16_CAUSAL,
    ("backward_query", "bf16", "causal"): _BWD_Q_BF16_CAUSAL,
    ("backward_key_value", "bf16", "causal"): _BWD_KV_BF16_CAUSAL,
}

# ---------------------------------------------------------------------------
# Generation axis. The reference keys its tables per architecture (M1/M2 vs
# M3+, AttentionDescriptor+Parameters.swift:13-39); here the base tables are
# the v5e-measured rows (16 MiB scoped VMEM) and per-generation overlays
# adjust rows whose v5e choice was a VMEM-budget compromise. v6e doubles
# scoped VMEM to 32 MiB, which un-compromises exactly the rows the round-3
# sweeps found VMEM-capped:
# - bwd_kv D=256: the sweep's BEST config 4096/512/256 (0.946 util) overflows
#   16 MiB by ~512 KiB in the composed train-step VJP (the shipped v5e row is
#   the runner-up 2048/512/256 = 0.927); 32 MiB fits it with room.
# - fwd D=256: the fp32 accumulator slab (block_q x 256 x 4 B) capped
#   block_q at 256 on v5e; 32 MiB admits 512 rows (fewer grid steps, same
#   whole-sequence traversal).
# - bwd_q D=256: the streamed-KV double buffer capped the traversal block at
#   1024; 32 MiB admits 2048 (matches the D=128 shape class the sweep
#   preferred everywhere it fit).
# v6e rows are VMEM-budget seeds (validated by test_params.py against the
# 32 MiB budget), to be re-measured by utils/autotune.py when a v6e chip is
# available. v4/v5p share v5e's 16 MiB scoped VMEM and fall through to the
# base tables.

_FWD_BF16_V6E = """
   64   |   512   |   4096   |  128    | Q
  128   |  1024   |   4096   |  128    | Q
  256   |   512   |   4096   |  256    | Q
  384   |  1024   |   2048   |  384    |
  inf   |   256   |   2048   |  128    |
"""

_BWD_Q_BF16_V6E = """
   64   |  1024   |   2048   |  128    | Q
  128   |  1024   |   2048   |  128    | Q
  256   |  1024   |   2048   |  256    | Q
  inf   |   128   |    128   |  128    |
"""

_BWD_KV_BF16_V6E = """
   64   |  4096   |   1024   |  128    | Q
  128   |  4096   |   1024   |  128    | Q
  256   |  4096   |    512   |  256    | Q
  inf   |   128   |    128   |  128    |
"""

_TABLES_BY_GEN = {
    "v6e": {
        ("forward", "bf16"): _FWD_BF16_V6E,
        ("backward_query", "bf16"): _BWD_Q_BF16_V6E,
        ("backward_key_value", "bf16"): _BWD_KV_BF16_V6E,
    },
}

_PARSED: dict = {}


def parameter_table(kernel_type: str, low_precision: bool,
                    causal: bool = False,
                    generation: str | None = None) -> list[ParameterRow]:
    """Pick the table for (kernel type, precision class, causality,
    generation) — reference: AttentionDescriptor+Parameters.swift:13-39
    keys per architecture; the causal axis is this build's extension.
    Generation overlays fall through to the v5e-measured base tables for
    (kernel, precision) pairs they don't override."""
    if generation is None:
        generation = detect_generation().name
    key = (kernel_type, "bf16" if low_precision else "fp32")
    if causal and (*key, "causal") in _TABLES:
        key = (*key, "causal")
    overlay = _TABLES_BY_GEN.get(generation, {})
    text = overlay.get(key) or _TABLES[key]
    cache_key = (generation if text is overlay.get(key) else "base", *key)
    if cache_key not in _PARSED:
        _PARSED[cache_key] = parse_table(text)
    return _PARSED[cache_key]


def vmem_bytes_estimate(
    row: ParameterRow,
    head_dim: int,
    in_bytes: float,
    kernel_type: str = "forward",
) -> int:
    """Rough VMEM footprint of one grid step for budget validation — the
    analogue of threadgroupMemoryAllocation (AttentionKernel.swift:272-363).

    Counts double-buffered streamed operands (Pallas pipelines use 2 slots),
    resident slabs, and the S/P scratch of one (block_q, block_kv) tile.
    """
    # Operand slabs in VMEM are lane-padded: the kernels stream/hold
    # d_pad = round_up(D, 128)-wide slices, so budget against the padded
    # width (a D=64 row with block_d=128 really moves 128-wide slabs).
    #
    # NO d-paging discount (round-5 compile-probe calibration,
    # scripts/calibrate_vmem.py → docs/sweeps/vmem_probe.jsonl): Mosaic's
    # scoped-stack allocation does not shrink when block_d < d_pad — it
    # GROWS (causal bwd_q D=256 1024/1024: 22.94M at bd=128 vs 16.43M at
    # bd=256; every probed bd<d_pad config the old discount admitted
    # failed to compile). The paged loop re-slices full-width slabs, so
    # budget slabs at d_pad regardless of block_d.
    d_pad = ((head_dim + 127) // 128) * 128
    d = d_pad
    bq, bkv = row.block_q, row.block_kv
    acc = 4  # fp32 accumulator bytes
    # Streamed K and V blocks, double buffered:
    streamed = 2 * 2 * (bkv * d * in_bytes)
    # Resident Q/O (fwd) or equivalents: q block + accumulator
    resident = bq * d * in_bytes + bq * d_pad * acc
    # S/P tile + m/l rows. All three kernels process q rows in groups of
    # block_q_inner (256, or 512 at bq>=1024 since round 4), so only the
    # live group's S tile materializes — never the full (bq, bkv) tile.
    # The 256/512 coefficients below stay calibrated against measured
    # compile outcomes (qg=512 at D=128/bq=1024/bkv=4096 compiles and runs
    # on v5e; Mosaic does not hold S fp32 and P bf16 fully live at once,
    # so the naive 6-byte-per-element sum over a 512-row group would
    # over-reject working configs).
    # Forward: S fp32 + P bf16 for one group. Backward: S + dP fp32 tiles
    # with up to ~2 groups in flight.
    if kernel_type == "forward":
        tile = min(bq, 256) * bkv * (acc + 2) + 2 * bq * acc
    else:
        # One live fp32 group tile, not two: the round-5 compile probes
        # (docs/sweeps/vmem_probe.jsonl) show bwd_q 1024/4096/128 builds
        # and runs (0.950 measured; composed train 0.945) — under the old
        # 2-tile model that row scored 22.5 MiB, impossible. Mosaic reuses
        # the S allocation for dS/dP within a group.
        tile = min(bq, 512) * bkv * acc + 2 * bq * acc
    if kernel_type != "forward":
        # backward holds more slabs (dO or K/V + two accumulators)
        resident += bq * d * in_bytes + bq * d_pad * acc
    # Lane-replicated row vectors (L out for forward; L in + D-term for the
    # backwards) are (bq, 128) fp32 blocks — 512 B/row each, which matters
    # at bq=4096 (the round-3 bench_train OOM: the bwd_kv 4096-row D=256
    # config exceeded scoped VMEM by 512 KiB through exactly these
    # buffers). Counted single-buffered: calibrated against measured
    # compile outcomes (D=128 bq=4096 fits on-chip, D=256 bq=4096 does
    # not), since the whole model is a conservative envelope, not Mosaic's
    # actual allocator.
    aux_rows = 1 if kernel_type == "forward" else 2
    resident += aux_rows * bq * 128 * acc
    return int(streamed + resident + tile)
