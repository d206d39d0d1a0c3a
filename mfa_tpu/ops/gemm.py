"""Public GEMM API: descriptor-driven, cached, all four transpose states.

The reference's GEMM entry point ``GEMMKernel.register(descriptor:)`` +
client dispatch (GEMMDescriptor+PipelineCache.swift:24-125;
LaplacianTest.swift:201-224) collapsed into one cached call.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

from mfa_tpu.kernels import gemm_kernel
from mfa_tpu.ops.cache import gemm_cache
from mfa_tpu.ops.descriptors import GEMMDescriptor, round_up
from mfa_tpu.ops.precision import OperandPrecision


def gemm(
    a,
    b,
    c0=None,
    *,
    transpose_a: bool = False,
    transpose_b: bool = False,
    out_dtype=None,
    interpret: bool | None = None,
):
    """C = op(A) @ op(B) (+ C0), where op is optional transpose.

    Accepts 2-D ([m, k]) or 3-D batched ([batch, m, k]) operands; batch dims
    must match. ``c0`` enables the reference's ``load_previous_C``
    accumulate path (GEMMDescriptor.swift:42-47).
    """
    if interpret is None:
        interpret = jax.default_backend() == "cpu"

    squeeze = a.ndim == 2
    if squeeze:
        a = a[None]
        b = b[None]
        if c0 is not None:
            c0 = c0[None]
    batch = a.shape[0]
    if b.shape[0] != batch:
        raise ValueError(f"batch mismatch: {a.shape} vs {b.shape}")

    m = a.shape[2] if transpose_a else a.shape[1]
    ka = a.shape[1] if transpose_a else a.shape[2]
    kb = b.shape[2] if transpose_b else b.shape[1]
    n = b.shape[1] if transpose_b else b.shape[2]
    if ka != kb:
        raise ValueError(f"K mismatch: {ka} vs {kb}")
    k = ka

    out_dtype = out_dtype or jnp.promote_types(a.dtype, b.dtype)
    desc = GEMMDescriptor(
        m=m, n=n, k=k,
        a_precision=OperandPrecision.from_dtype(a.dtype),
        b_precision=OperandPrecision.from_dtype(b.dtype),
        c_precision=OperandPrecision.from_dtype(out_dtype),
        transpose_a=transpose_a,
        transpose_b=transpose_b,
        batch=batch,
        load_previous_c=c0 is not None,
    )
    kd = desc.kernel_descriptor()

    m_pad = round_up(m, kd.block_m)
    n_pad = round_up(n, kd.block_n)
    k_pad = round_up(k, kd.block_k)

    a_pad = _pad_operand(a, (k_pad, m_pad) if transpose_a else (m_pad, k_pad))
    b_pad = _pad_operand(b, (n_pad, k_pad) if transpose_b else (k_pad, n_pad))
    args = [a_pad, b_pad]
    if c0 is not None:
        args.append(_pad_operand(c0.astype(out_dtype), (m_pad, n_pad)))

    build = functools.partial(
        gemm_kernel.build_gemm,
        kd,
        batch=batch, m=m_pad, n=n_pad, k=k_pad,
        a_dtype=a.dtype, b_dtype=b.dtype, c_dtype=out_dtype,
        interpret=interpret,
    )
    key = (kd, batch, m_pad, n_pad, k_pad, str(a.dtype), str(b.dtype),
           str(out_dtype), interpret)
    fn = gemm_cache.get_pipeline(key, key, build, lambda kern: kern)

    c = fn(*args)[:, :m, :n]
    return c[0] if squeeze else c


def _pad_operand(x, target_hw):
    th, tw = target_hw
    _, h, w = x.shape
    if h == th and w == tw:
        return x
    return jnp.pad(x, ((0, 0), (0, th - h), (0, tw - w)))
