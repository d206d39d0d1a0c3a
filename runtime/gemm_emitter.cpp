// StableHLO text emitter for GEMM (see gemm_emitter.hpp).

#include "gemm_emitter.hpp"

#include <cstdio>
#include <string>

namespace mfa {
namespace {

// tensor<AxBxT> / tensor<BxAxBxT> shape strings (batch prefix optional).
std::string tensor_type(int64_t batch, int64_t rows, int64_t cols,
                        ElementType t) {
  char buf[96];
  if (batch > 1) {
    std::snprintf(buf, sizeof(buf), "tensor<%lldx%lldx%lld%s>",
                  static_cast<long long>(batch), static_cast<long long>(rows),
                  static_cast<long long>(cols),
                  t == ElementType::kF32 ? "xf32" : "xbf16");
  } else {
    std::snprintf(buf, sizeof(buf), "tensor<%lldx%lld%s>",
                  static_cast<long long>(rows), static_cast<long long>(cols),
                  t == ElementType::kF32 ? "xf32" : "xbf16");
  }
  return buf;
}

}  // namespace

std::string emit_gemm_stablehlo(const GEMMEmitParams& p) {
  const GEMMDescriptor& d = p.desc;
  const bool batched = d.batch > 1;
  const int off = batched ? 1 : 0;  // logical dims shift right of batch

  // Logical operand shapes honoring the transpose flags: the stored array
  // keeps its layout; the contraction dims flip instead (MXU-native, the
  // reason the reference needs no Morton re-swizzle here either).
  const int64_t a_rows = d.transpose_a ? d.k : d.m;
  const int64_t a_cols = d.transpose_a ? d.m : d.k;
  const int64_t b_rows = d.transpose_b ? d.n : d.k;
  const int64_t b_cols = d.transpose_b ? d.k : d.n;

  const std::string a_t = tensor_type(d.batch, a_rows, a_cols, p.a_type);
  const std::string b_t = tensor_type(d.batch, b_rows, b_cols, p.b_type);
  const std::string acc_t = tensor_type(d.batch, d.m, d.n, ElementType::kF32);
  const std::string c_t = tensor_type(d.batch, d.m, d.n, p.c_type);

  const int a_contract = off + (d.transpose_a ? 0 : 1);
  const int b_contract = off + (d.transpose_b ? 1 : 0);

  std::string args = "%a: " + a_t + ", %b: " + b_t;
  if (d.load_previous_c) args += ", %c0: " + c_t;

  std::string s;
  s += "module @gemm {\n";
  s += "  func.func @main(" + args + ") -> " + c_t + " {\n";

  // dot_general with f32 accumulation (preferred element type = result
  // type here: we accumulate in f32 and convert at the end).
  char dims[160];
  if (batched) {
    std::snprintf(dims, sizeof(dims),
                  "batching_dims = [0] x [0], contracting_dims = [%d] x [%d]",
                  a_contract, b_contract);
  } else {
    std::snprintf(dims, sizeof(dims),
                  "contracting_dims = [%d] x [%d]", a_contract, b_contract);
  }
  s += "    %acc = stablehlo.dot_general %a, %b, " + std::string(dims) +
       ", precision = [DEFAULT, DEFAULT] : (" + a_t + ", " + b_t + ") -> " +
       acc_t + "\n";

  std::string cur = "%acc";
  if (p.c_type != ElementType::kF32) {
    s += "    %cc = stablehlo.convert %acc : (" + acc_t + ") -> " + c_t +
         "\n";
    cur = "%cc";
  }
  if (d.load_previous_c) {
    // load_previous_C accumulate path (GEMMDescriptor.swift:42-47).
    s += "    %sum = stablehlo.add " + cur + ", %c0 : " + c_t + "\n";
    cur = "%sum";
  }
  s += "    return " + cur + " : " + c_t + "\n";
  s += "  }\n";
  s += "}\n";
  return s;
}

}  // namespace mfa
