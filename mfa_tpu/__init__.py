"""mfa_tpu — a TPU-native attention-centric inference/training framework.

A from-scratch reimplementation of the capabilities of
philipturner/metal-flash-attention (reference: /root/reference), redesigned
idiomatically for TPU (JAX / XLA / Pallas / pjit):

- Online-softmax tiled flash-attention forward (reference:
  Sources/FlashAttention/Attention/AttentionKernel/AttentionKernel+Source.swift:158-199)
- Atomics-free two-kernel backward — dQ and dK/dV as separate, fully
  parallel passes (reference: AttentionKernelType.swift:10-23)
- Head-dimension blocking with per-(D, dtype, generation) parameter tables
  (reference: AttentionDescriptor+Parameters.swift)
- Descriptor → heuristic → two-level kernel cache architecture (reference:
  GEMMDescriptor+PipelineCache.swift:16-19)

Extended with a quantized decode path (INT8/FP8 KV cache, INT4/INT8
weight-only projections), a Llama-family model layer, continuous-batching
serving, and multi-host sharding over ICI meshes.
"""

__version__ = "0.1.0"

from mfa_tpu.ops.attention import flash_attention, mha
from mfa_tpu.ops.decode import (
    decode_attention,
    decode_attention_append,
    paged_decode_attention,
)
from mfa_tpu.ops.descriptors import AttentionDescriptor, GEMMDescriptor
from mfa_tpu.ops.gemm import gemm

__all__ = [
    "flash_attention",
    "mha",
    "gemm",
    "decode_attention",
    "decode_attention_append",
    "paged_decode_attention",
    "AttentionDescriptor",
    "GEMMDescriptor",
]
