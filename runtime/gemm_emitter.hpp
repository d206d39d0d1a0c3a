// C++ GEMM kernel codegen: descriptor → StableHLO module text.
//
// The native-codegen layer the reference ships in C++ (GEMMKernel.cpp's
// 646-line MSL emitter, Documentation/CppReference/GEMM/GEMMKernel.cpp) —
// recast for TPU: instead of emitting Metal Shading Language strings, the
// C++ side emits a StableHLO module parameterized by the problem descriptor
// (shapes, per-operand precisions, all four transpose states, batch,
// load_previous_C) and hands it to the PJRT driver (pjrt_driver.cpp) to
// JIT-compile and dispatch — the same source→compile→pipeline flow as
// GEMMShaderCache::fetchKernel (GEMMShaderCache.cpp:8-172).
//
// Transposes are expressed through dot_general dimension numbers (no
// materialized transpose — the MXU takes either operand orientation), and
// accumulation is always f32 with a final convert to the C precision,
// mirroring the register-precision rule (GEMMKernel.swift:98-103: BF16
// accumulators banned).
#pragma once

#include <string>

#include "descriptors.hpp"

namespace mfa {

enum class ElementType { kF32, kBF16 };

inline const char* mlir_name(ElementType t) {
  return t == ElementType::kF32 ? "f32" : "bf16";
}

struct GEMMEmitParams {
  GEMMDescriptor desc;
  ElementType a_type = ElementType::kF32;
  ElementType b_type = ElementType::kF32;
  ElementType c_type = ElementType::kF32;
  // Block config driving the emitted tiling (pad granularity + K-split).
  // Any non-positive field → run the VMEM-budget heuristic for
  // `generation` (gemm_kernel_descriptor), so the emitted program always
  // reflects the framework's block choice.
  GEMMKernelDescriptor kd{};
  const char* generation = "v5e";
};

// Emits a complete StableHLO module with one public function @gemm whose
// arguments are (A, B[, C0]) and whose result is C = op(A) · op(B) [+ C0].
std::string emit_gemm_stablehlo(const GEMMEmitParams& p);

// Chained-timing variant (square NN only): @main(A, B, n: i32) runs
// x = convert_to_a_type(x · B) in a stablehlo.while n times and returns x.
// One dispatch = n dependent GEMMs, so per-dispatch tunnel overhead
// amortizes away and the slope between two chain lengths is pure device
// time — the C++ twin of utils/roofline.py measure_chained. The trip
// count is an ARGUMENT (dynamic while bound): one compile serves every
// chain length, where the Python path recompiles per static n.
std::string emit_gemm_chain_stablehlo(const GEMMEmitParams& p);

}  // namespace mfa
