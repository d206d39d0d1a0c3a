"""Batched GEMM Pallas kernel with transpose states and accumulate.

TPU-native counterpart of the reference's GEMM kernel generator
(GEMMKernel+Source.swift, GEMMKernel+Multiply.swift, GEMMKernel+Caching.swift):

- generated MSL K-loop with async copies → Pallas grid with an innermost
  sequential K axis; Mosaic double-buffers the A/B block DMAs
  (the reference's simdgroup_event machinery, GEMMHeaders.swift:24-254)
- ``load_previous_C`` accumulate path (GEMMKernel+Caching.swift:36-57) →
  optional C0 input added when the K loop starts
- all four transpose states (GEMMDescriptor.swift:30-34) → BlockSpec index
  maps + dot_general dimension numbers; no data movement
- M/N-shift edge handling (GEMMKernel+Source.swift:42-80) → zero padding at
  the wrapper (zeros are exact for matmul) + slicing on return
- function-constant M/N/K (GEMMKernel+Source.swift:117-127) → static shapes

The MXU accumulates FP32 (``preferred_element_type``), which enforces the
reference's register-precision truth table (GEMMKernel.swift:46-103): BF16
accumulation is structurally impossible, exactly as the reference bans it.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from mfa_tpu.ops.descriptors import GEMMKernelDescriptor


def _gemm_kernel(*refs, kd: GEMMKernelDescriptor, num_k_blocks: int):
    if kd.load_previous_c:
        a_ref, b_ref, c0_ref, c_ref, acc = refs
    else:
        a_ref, b_ref, c_ref, acc = refs
        c0_ref = None
    kk = pl.program_id(3)
    _prec = (jax.lax.Precision.HIGHEST if a_ref.dtype == jnp.float32
             else jax.lax.Precision.DEFAULT)

    @pl.when(kk == 0)
    def _init():
        if c0_ref is not None:
            acc[...] = c0_ref[0].astype(jnp.float32)
        else:
            acc[...] = jnp.zeros_like(acc)

    a = a_ref[0]  # (bm, bk) or (bk, bm) when transpose_a
    b = b_ref[0]  # (bk, bn) or (bn, bk) when transpose_b
    # Contraction dims: pick the K axis of each operand's stored layout.
    a_contract = 0 if kd.transpose_a else 1
    b_contract = 1 if kd.transpose_b else 0
    acc[...] += jax.lax.dot_general(
        a, b,
        dimension_numbers=(((a_contract,), (b_contract,)), ((), ())),
        preferred_element_type=jnp.float32,
                precision=_prec,
    )

    @pl.when(kk == num_k_blocks - 1)
    def _store():
        c_ref[0] = acc[...].astype(c_ref.dtype)


def build_gemm(
    kd: GEMMKernelDescriptor,
    *,
    batch: int,
    m: int,
    n: int,
    k: int,
    a_dtype,
    b_dtype,
    c_dtype,
    interpret: bool = False,
):
    """Build the pallas_call for one GEMM shape class.

    Operand layout (already padded to block multiples by the caller):
      A: [batch, m, k]  (or [batch, k, m] when transpose_a)
      B: [batch, k, n]  (or [batch, n, k] when transpose_b)
      C0 (optional, when load_previous_c): [batch, m, n]
      C: [batch, m, n]
    """
    bm, bn, bk = kd.block_m, kd.block_n, kd.block_k
    gm, gn, gk = m // bm, n // bn, k // bk

    kernel = functools.partial(_gemm_kernel, kd=kd, num_k_blocks=gk)

    if kd.transpose_a:
        a_spec = pl.BlockSpec((1, bk, bm), lambda b_, i, j, kk: (b_, kk, i))
    else:
        a_spec = pl.BlockSpec((1, bm, bk), lambda b_, i, j, kk: (b_, i, kk))
    if kd.transpose_b:
        b_spec = pl.BlockSpec((1, bn, bk), lambda b_, i, j, kk: (b_, j, kk))
    else:
        b_spec = pl.BlockSpec((1, bk, bn), lambda b_, i, j, kk: (b_, kk, j))
    c_spec = pl.BlockSpec((1, bm, bn), lambda b_, i, j, kk: (b_, i, j))

    in_specs = [a_spec, b_spec]
    if kd.load_previous_c:
        in_specs.append(c_spec)

    flops = 2 * batch * m * n * k
    return pl.pallas_call(
        kernel,
        grid=(batch, gm, gn, gk),
        in_specs=in_specs,
        out_specs=c_spec,
        out_shape=jax.ShapeDtypeStruct((batch, m, n), c_dtype),
        scratch_shapes=[pltpu.VMEM((bm, bn), jnp.float32)],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "parallel", "arbitrary"),
        ),
        cost_estimate=pl.CostEstimate(
            flops=flops,
            bytes_accessed=batch * (
                m * k * jnp.dtype(a_dtype).itemsize
                + k * n * jnp.dtype(b_dtype).itemsize
                + m * n * jnp.dtype(c_dtype).itemsize
            ),
            transcendentals=0,
        ),
        interpret=interpret,
    )
