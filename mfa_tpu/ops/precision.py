"""Operand precision model and mixed-precision policy.

TPU-native recast of the reference's precision system:
- ``GEMMOperandPrecision`` (reference: Sources/FlashAttention/GEMM/
  GEMMOperandPrecision.swift:8-33) becomes :class:`OperandPrecision`, extended
  with the quantized formats the reference only documents as future work
  (INT8 / FP8 / INT4).
- ``AttentionDescriptor+Precisions.swift`` (reference: Sources/FlashAttention/
  Attention/AttentionDescriptor/AttentionDescriptor+Precisions.swift:10-215)
  becomes :func:`memory_precisions` / :func:`register_precisions`.

Key differences from Apple GPUs that reshape the policy:
- TPU has *native* BF16 matmul with FP32 accumulation on the MXU. All of the
  reference's BF16-emulation machinery (bit-twiddling decode paths in
  GEMMHeaders.swift:282-524) evaporates: BF16 is the default low precision,
  FP16 is the exotic one.
- MXU accumulators are FP32 by construction (``preferred_element_type``), so
  the reference's rule "all output accumulators FP32"
  (AttentionDescriptor+Precisions.swift:209-212) is enforced structurally.
- The attention-matrix operands S/P/dP/dS exist only inside the kernel
  (VMEM/registers); their precision is a compute choice, not a memory layout.
"""

from __future__ import annotations

import enum
from dataclasses import dataclass

import jax.numpy as jnp


class OperandPrecision(enum.Enum):
    """Storage/compute precision of one operand.

    Reference: GEMMOperandPrecision.swift:8-33 (FP32/FP16/BF16) plus the
    quantized extensions sketched in its doc comment (:12-28).
    """

    FP32 = "fp32"
    BF16 = "bf16"
    FP16 = "fp16"
    FP8_E4M3 = "fp8_e4m3"
    FP8_E5M2 = "fp8_e5m2"
    INT8 = "int8"
    INT4 = "int4"

    @property
    def dtype(self):
        return _DTYPES[self]

    @property
    def bits(self) -> int:
        return _BITS[self]

    @property
    def bytes(self) -> float:
        """Size in bytes (INT4 is fractional; it packs 2 values/byte)."""
        return self.bits / 8

    @property
    def is_quantized(self) -> bool:
        """Quantized formats need a scale (and optional zero point)."""
        return self in (
            OperandPrecision.FP8_E4M3,
            OperandPrecision.FP8_E5M2,
            OperandPrecision.INT8,
            OperandPrecision.INT4,
        )

    @classmethod
    def from_dtype(cls, dtype) -> "OperandPrecision":
        dtype = jnp.dtype(dtype)
        for prec, dt in _DTYPES.items():
            if prec is not cls.INT4 and jnp.dtype(dt) == dtype:
                return prec
        raise ValueError(f"no OperandPrecision for dtype {dtype}")


_DTYPES = {
    OperandPrecision.FP32: jnp.float32,
    OperandPrecision.BF16: jnp.bfloat16,
    OperandPrecision.FP16: jnp.float16,
    OperandPrecision.FP8_E4M3: jnp.float8_e4m3fn,
    OperandPrecision.FP8_E5M2: jnp.float8_e5m2,
    OperandPrecision.INT8: jnp.int8,
    OperandPrecision.INT4: jnp.int8,  # packed 2-per-byte; unpacked view is int8
}

_BITS = {
    OperandPrecision.FP32: 32,
    OperandPrecision.BF16: 16,
    OperandPrecision.FP16: 16,
    OperandPrecision.FP8_E4M3: 8,
    OperandPrecision.FP8_E5M2: 8,
    OperandPrecision.INT8: 8,
    OperandPrecision.INT4: 4,
}


class AttentionOperand(enum.Enum):
    """The operands of the three attention kernels.

    Reference: AttentionOperand.swift:9-71. S, P, dP, dS are *virtual*: they
    never touch HBM (``buffer binding nil`` in the reference; never leave
    VMEM here).
    """

    Q = "Q"
    K = "K"
    S = "S"
    P = "P"
    V = "V"
    O = "O"
    L = "L"
    D = "D"
    dO = "dO"
    dV = "dV"
    dP = "dP"
    dS = "dS"
    dK = "dK"
    dQ = "dQ"

    @property
    def is_virtual(self) -> bool:
        return self in (
            AttentionOperand.S,
            AttentionOperand.P,
            AttentionOperand.dP,
            AttentionOperand.dS,
        )


@dataclass(frozen=True)
class PrecisionPolicy:
    """Resolved per-operand precisions for one attention problem.

    ``memory`` is what lives in HBM; ``register`` is the compute/VMEM
    precision fed to the MXU (accumulators are always FP32 on TPU).

    Reference policy being recast: AttentionDescriptor+Precisions.swift —
    - low-precision inputs => Q/K/V/dO in reduced precision (:13-23)
    - low-precision intermediates => L/D reduced (:81-87)
    - O/dV/dK/dQ always FP32 in memory (:140-143)
    On TPU we keep L and D in FP32 always: they are O(N) row vectors, the
    bandwidth win of FP16 L (reference :81-87) is negligible next to native
    BF16 everywhere else, and FP32 L removes the reference's measured 7e-3
    L-error budget entirely.
    """

    memory: dict
    register: dict

    def mem(self, operand: AttentionOperand) -> OperandPrecision:
        return self.memory[operand]

    def reg(self, operand: AttentionOperand) -> OperandPrecision:
        return self.register[operand]


def make_precision_policy(
    low_precision_inputs: bool = False,
    low_precision_intermediates: bool = False,
    kv_cache_precision: OperandPrecision | None = None,
) -> PrecisionPolicy:
    """Map the reference's two boolean knobs (AttentionDescriptor.swift:14-22)
    plus a TPU-only KV-cache knob onto per-operand precisions.

    ``kv_cache_precision`` overrides K/V memory precision for the quantized
    decode path (INT8 / FP8 KV cache — north-star extension; not in the
    reference).
    """
    lo = OperandPrecision.BF16 if low_precision_inputs else OperandPrecision.FP32
    fp32 = OperandPrecision.FP32

    memory = {
        AttentionOperand.Q: lo,
        AttentionOperand.K: lo,
        AttentionOperand.V: lo,
        AttentionOperand.dO: lo,
        # Reference keeps O/dV/dK/dQ FP32 in memory for accumulation
        # correctness (Precisions.swift:140-143). On TPU the accumulator
        # lives in VMEM scratch in FP32; the HBM copy of O may be BF16 for
        # inference, but training-side outputs stay FP32.
        AttentionOperand.O: lo if low_precision_intermediates else fp32,
        AttentionOperand.L: fp32,
        AttentionOperand.D: fp32,
        AttentionOperand.dV: fp32,
        AttentionOperand.dK: fp32,
        AttentionOperand.dQ: fp32,
    }
    if kv_cache_precision is not None:
        memory[AttentionOperand.K] = kv_cache_precision
        memory[AttentionOperand.V] = kv_cache_precision

    # Register (MXU input) precisions. S/P/dP/dS are virtual. P may be cast
    # to BF16 before the PV matmul when inputs are low precision — the exact
    # analogue of the reference's "P FP16" rule (Precisions.swift:197-200).
    reg_p = OperandPrecision.BF16 if low_precision_inputs else fp32
    register = {
        AttentionOperand.Q: lo,
        AttentionOperand.K: lo,
        AttentionOperand.V: lo,
        AttentionOperand.dO: lo,
        AttentionOperand.S: fp32,  # QK^T accumulates in FP32 on the MXU
        AttentionOperand.P: reg_p,
        AttentionOperand.dP: fp32,
        AttentionOperand.dS: reg_p,
        # Accumulators: always FP32 (MXU preferred_element_type).
        AttentionOperand.O: fp32,
        AttentionOperand.L: fp32,
        AttentionOperand.D: fp32,
        AttentionOperand.dV: fp32,
        AttentionOperand.dK: fp32,
        AttentionOperand.dQ: fp32,
    }
    return PrecisionPolicy(memory=memory, register=register)


def tolerance_for(policy: PrecisionPolicy, operand: AttentionOperand,
                  accumulation_length: int = 0) -> float:
    """Error-budget model for tests, mirroring the reference's measured
    budgets (SquareAttentionTest.swift:539-554 — 2e-5 FP32, 5e-2 mixed for
    O/dV/dK/dQ) with an accumulation-length scaling term like
    AdversarialShapeTest.swift:288-336.
    """
    mem = policy.mem(operand)
    if mem is OperandPrecision.FP32 and policy.mem(AttentionOperand.Q) is OperandPrecision.FP32:
        base = 2e-5
    elif operand in (AttentionOperand.L, AttentionOperand.D):
        base = 7e-3
    else:
        base = 5e-2
    if accumulation_length > 4096:
        base *= accumulation_length / 4096
    return base
