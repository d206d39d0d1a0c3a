// Problem/kernel descriptors + heuristics: the C++ kernel-config core.
// Mirrors the Python layer 1:1 (mfa_tpu/ops/descriptors.py, params.py),
// the way the reference maintains a C++ port of its Swift config layer
// (Documentation/CppReference/GEMM/GEMMDescriptor.hpp:8,
//  GEMMKernelDescriptor.cpp:174-195, GEMMShaderCache.hpp:43).
#pragma once

#include <cstdint>
#include <string>
#include <vector>

#include "mfa_hash.hpp"

namespace mfa {

// ---------------------------------------------------------------------------
// Chip generations (mfa_tpu/ops/params.py GENERATIONS)
// ---------------------------------------------------------------------------

struct TpuGeneration {
  const char* name;
  int64_t vmem_bytes;
  double hbm_gbps;
  double bf16_tflops;
  double int8_tops;
};

const TpuGeneration* find_generation(const std::string& name);

// ---------------------------------------------------------------------------
// Parameter-table rows + pipe-DSL parser
// (reference: AttentionParameterRow.swift:22-74; Python twin:
//  mfa_tpu/ops/params.py parse_table/select_row)
// ---------------------------------------------------------------------------

struct ParameterRow {
  int max_d = 0;  // 0 = unbounded
  int block_q = 0;
  int block_kv = 0;
  int block_d = 0;
  std::vector<std::string> vmem_resident;
};

// Parses the pipe-delimited mini-DSL. Returns false on malformed input
// (the Python parser raises; callers across the C ABI get an error code).
bool parse_table(const std::string& text, std::vector<ParameterRow>* rows,
                 std::string* error);

// First row with head_dim <= max_d (AttentionDescriptor+Parameters.swift:41-66).
int select_row(const std::vector<ParameterRow>& rows, int head_dim);

// VMEM footprint estimate of one grid step (params.py vmem_bytes_estimate).
int64_t vmem_bytes_estimate(const ParameterRow& row, int head_dim,
                            double in_bytes, const std::string& kernel_type);

// ---------------------------------------------------------------------------
// GEMM descriptor + block heuristic (ops/descriptors.py GEMMDescriptor)
// ---------------------------------------------------------------------------

struct GEMMDescriptor {
  int64_t m = 0, n = 0, k = 0;
  double a_bytes = 4.0, b_bytes = 4.0, c_bytes = 4.0;
  bool transpose_a = false, transpose_b = false;
  int64_t batch = 1;
  bool load_previous_c = false;

  uint64_t key() const {  // GEMMKey (GEMMDescriptor.swift:49-74)
    uint64_t h = 0;
    hash::combine_64(h, static_cast<uint64_t>(m));
    hash::combine_64(h, static_cast<uint64_t>(n));
    hash::combine_64(h, static_cast<uint64_t>(k));
    hash::combine_64(h, static_cast<uint64_t>(batch));
    hash::combine_32(h, static_cast<uint32_t>(a_bytes * 8));
    hash::combine_32(h, static_cast<uint32_t>(b_bytes * 8));
    hash::combine_32(h, static_cast<uint32_t>(c_bytes * 8));
    hash::combine_32(h, (transpose_a ? 1u : 0u) | (transpose_b ? 2u : 0u) |
                            (load_previous_c ? 4u : 0u));
    return h;
  }
};

struct GEMMKernelDescriptor {
  int block_m = 0, block_n = 0, block_k = 0;

  uint64_t key() const {  // GEMMKernelKey (GEMMKernelDescriptor.swift:183-255)
    uint64_t h = 1;
    hash::combine_32(h, static_cast<uint32_t>(block_m));
    hash::combine_32(h, static_cast<uint32_t>(block_n));
    hash::combine_32(h, static_cast<uint32_t>(block_k));
    return h;
  }
};

// VMEM-budget block heuristic; exact twin of
// GEMMDescriptor.kernel_descriptor in ops/descriptors.py (itself the TPU
// recast of GEMMDescriptor.swift:240-322).
GEMMKernelDescriptor gemm_kernel_descriptor(const GEMMDescriptor& desc,
                                            const TpuGeneration& gen);

}  // namespace mfa
