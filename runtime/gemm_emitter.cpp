// StableHLO text emitter for GEMM (see gemm_emitter.hpp).
//
// Block-descriptor-driven codegen: the emitted module is parameterized by
// the framework's GEMMKernelDescriptor (block_m/n/k from the VMEM-budget
// heuristic, descriptors.cpp gemm_kernel_descriptor — the same table the
// Python dispatch path consults), the way the reference's 646-line C++
// emitter bakes its block dims into the MSL source
// (Documentation/CppReference/GEMM/GEMMKernel.cpp). What the blocks mean
// at the graph level differs per dimension, matching what each controls on
// TPU:
//
//  - block_m / block_n: the dispatch-granularity pad. Operands are padded
//    to block multiples and the result sliced back — identical math to the
//    Python dispatch (ops/gemm.py _pad_operand), so the emitted program is
//    exactly the program the framework's heuristic chose, not a clean-shape
//    idealization.
//  - block_k: the reduction split. The K loop is emitted UNROLLED as
//    k_pad/block_k partial dot_generals whose f32 partials chain through
//    adds — the graph-level twin of the Pallas kernel's fp32-scratch K loop
//    (kernels/gemm_kernel.py). Each partial's contraction is block_k wide,
//    which bounds the accumulation working set exactly the way the
//    heuristic's VMEM budget assumed.
//
// Intra-block tiling onto the 128x128 MXU stays with Mosaic/XLA (SURVEY §7:
// the compiler owns layout and DMA below the block level).
//
// Transposes are expressed through dot_general dimension numbers (no
// materialized transpose — the MXU takes either operand orientation), and
// accumulation is always f32 with a final convert to the C precision,
// mirroring the register-precision rule (GEMMKernel.swift:98-103: BF16
// accumulators banned).

#include "gemm_emitter.hpp"

#include <cstdio>
#include <string>
#include <vector>

namespace mfa {
namespace {

int64_t round_up(int64_t x, int64_t m) { return (x + m - 1) / m * m; }

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

// Emission helper bundling the running module text and a value counter.
struct Emitter {
  std::string s;
  int next = 0;
  std::string fresh() { return "%v" + std::to_string(next++); }

  // %zero scalar of the element type (for pad fill).
  std::string zero_scalar(ElementType t) {
    std::string v = fresh();
    s += "    " + v + " = stablehlo.constant dense<0.0> : tensor<" +
         std::string(mlir_name(t)) + ">\n";
    return v;
  }

  // Pad the trailing two dims of `val` from (rows, cols) to (rp, cp).
  // Returns the (possibly unchanged) value name.
  std::string pad2d(const std::string& val, int64_t batch, int64_t rows,
                    int64_t cols, int64_t rp, int64_t cp, ElementType t) {
    if (rows == rp && cols == cp) return val;
    std::string z = zero_scalar(t);
    std::string v = fresh();
    char lo[64], hi[64], in[64];
    if (batch > 1) {
      std::snprintf(lo, sizeof(lo), "[0, 0, 0]");
      std::snprintf(hi, sizeof(hi), "[0, %lld, %lld]",
                    static_cast<long long>(rp - rows),
                    static_cast<long long>(cp - cols));
      std::snprintf(in, sizeof(in), "[0, 0, 0]");
    } else {
      std::snprintf(lo, sizeof(lo), "[0, 0]");
      std::snprintf(hi, sizeof(hi), "[%lld, %lld]",
                    static_cast<long long>(rp - rows),
                    static_cast<long long>(cp - cols));
      std::snprintf(in, sizeof(in), "[0, 0]");
    }
    s += "    " + v + " = stablehlo.pad " + val + ", " + z + ", low = " + lo +
         ", high = " + hi + ", interior = " + in + " : (" +
         tensor_type(batch, rows, cols, t) + ", tensor<" + mlir_name(t) +
         ">) -> " + tensor_type(batch, rp, cp, t) + "\n";
    return v;
  }

  // Slice trailing-two-dims range [r0:r1, c0:c1] out of a (rows, cols) val.
  std::string slice2d(const std::string& val, int64_t batch, int64_t rows,
                      int64_t cols, int64_t r0, int64_t r1, int64_t c0,
                      int64_t c1, ElementType t) {
    if (r0 == 0 && r1 == rows && c0 == 0 && c1 == cols) return val;
    std::string v = fresh();
    char rng[96];
    if (batch > 1) {
      std::snprintf(rng, sizeof(rng), "[0:%lld, %lld:%lld, %lld:%lld]",
                    static_cast<long long>(batch), static_cast<long long>(r0),
                    static_cast<long long>(r1), static_cast<long long>(c0),
                    static_cast<long long>(c1));
    } else {
      std::snprintf(rng, sizeof(rng), "[%lld:%lld, %lld:%lld]",
                    static_cast<long long>(r0), static_cast<long long>(r1),
                    static_cast<long long>(c0), static_cast<long long>(c1));
    }
    s += "    " + v + " = stablehlo.slice " + val + " " + rng + " : (" +
         tensor_type(batch, rows, cols, t) + ") -> " +
         tensor_type(batch, r1 - r0, c1 - c0, t) + "\n";
    return v;
  }
};

}  // namespace

std::string emit_gemm_stablehlo(const GEMMEmitParams& p) {
  const GEMMDescriptor& d = p.desc;
  const bool batched = d.batch > 1;
  const int off = batched ? 1 : 0;  // logical dims shift right of batch

  // Resolve blocks: explicit kd wins; otherwise run the same VMEM-budget
  // heuristic the Python dispatch uses (descriptors.cpp twin).
  GEMMKernelDescriptor kd = p.kd;
  if (kd.block_m <= 0 || kd.block_n <= 0 || kd.block_k <= 0) {
    kd = gemm_kernel_descriptor(d, *find_generation(p.generation));
  }
  const int64_t m_pad = round_up(d.m, kd.block_m);
  const int64_t n_pad = round_up(d.n, kd.block_n);
  const int64_t k_pad = round_up(d.k, kd.block_k);
  const int64_t nk = k_pad / kd.block_k;

  // Logical operand shapes honoring the transpose flags: the stored array
  // keeps its layout; the contraction dims flip instead (MXU-native, the
  // reason the reference needs no Morton re-swizzle here either).
  const int64_t a_rows = d.transpose_a ? d.k : d.m;
  const int64_t a_cols = d.transpose_a ? d.m : d.k;
  const int64_t b_rows = d.transpose_b ? d.n : d.k;
  const int64_t b_cols = d.transpose_b ? d.k : d.n;
  const int64_t ap_rows = d.transpose_a ? k_pad : m_pad;
  const int64_t ap_cols = d.transpose_a ? m_pad : k_pad;
  const int64_t bp_rows = d.transpose_b ? n_pad : k_pad;
  const int64_t bp_cols = d.transpose_b ? k_pad : n_pad;

  const std::string a_t = tensor_type(d.batch, a_rows, a_cols, p.a_type);
  const std::string b_t = tensor_type(d.batch, b_rows, b_cols, p.b_type);
  const std::string acc_t =
      tensor_type(d.batch, m_pad, n_pad, ElementType::kF32);
  const std::string c_t = tensor_type(d.batch, d.m, d.n, p.c_type);

  const int a_contract = off + (d.transpose_a ? 0 : 1);
  const int b_contract = off + (d.transpose_b ? 1 : 0);

  std::string args = "%a: " + a_t + ", %b: " + b_t;
  if (d.load_previous_c) args += ", %c0: " + c_t;

  Emitter e;
  e.s += "module @gemm {\n";
  e.s += "  func.func @main(" + args + ") -> " + c_t + " {\n";

  // Pad operands to block multiples (the dispatch-path pad of ops/gemm.py
  // _pad_operand, emitted in-graph so the compiled kernel sees exactly the
  // block-aligned problem the heuristic sized).
  std::string ap =
      e.pad2d("%a", d.batch, a_rows, a_cols, ap_rows, ap_cols, p.a_type);
  std::string bp =
      e.pad2d("%b", d.batch, b_rows, b_cols, bp_rows, bp_cols, p.b_type);

  char dims[160];
  if (batched) {
    std::snprintf(dims, sizeof(dims),
                  "batching_dims = [0] x [0], contracting_dims = [%d] x [%d]",
                  a_contract, b_contract);
  } else {
    std::snprintf(dims, sizeof(dims), "contracting_dims = [%d] x [%d]",
                  a_contract, b_contract);
  }

  // K-blocked accumulation: nk partial dot_generals over block_k-wide
  // contraction slices, f32 partials chained through adds (the graph twin
  // of the Pallas kernel's fp32-scratch K loop, kernels/gemm_kernel.py).
  std::string acc;
  for (int64_t kb = 0; kb < nk; ++kb) {
    const int64_t k0 = kb * kd.block_k;
    const int64_t k1 = k0 + kd.block_k;
    // Slice the contraction range out of each (padded) operand; the
    // non-contracted dim stays whole.
    std::string a_sl =
        d.transpose_a
            ? e.slice2d(ap, d.batch, ap_rows, ap_cols, k0, k1, 0, m_pad,
                        p.a_type)
            : e.slice2d(ap, d.batch, ap_rows, ap_cols, 0, m_pad, k0, k1,
                        p.a_type);
    std::string b_sl =
        d.transpose_b
            ? e.slice2d(bp, d.batch, bp_rows, bp_cols, 0, n_pad, k0, k1,
                        p.b_type)
            : e.slice2d(bp, d.batch, bp_rows, bp_cols, k0, k1, 0, n_pad,
                        p.b_type);
    const std::string a_sl_t = tensor_type(
        d.batch, d.transpose_a ? kd.block_k : m_pad,
        d.transpose_a ? m_pad : kd.block_k, p.a_type);
    const std::string b_sl_t = tensor_type(
        d.batch, d.transpose_b ? n_pad : kd.block_k,
        d.transpose_b ? kd.block_k : n_pad, p.b_type);
    std::string part = e.fresh();
    e.s += "    " + part + " = stablehlo.dot_general " + a_sl + ", " + b_sl +
           ", " + dims + ", precision = [DEFAULT, DEFAULT] : (" + a_sl_t +
           ", " + b_sl_t + ") -> " + acc_t + "\n";
    if (acc.empty()) {
      acc = part;
    } else {
      std::string sum = e.fresh();
      e.s += "    " + sum + " = stablehlo.add " + acc + ", " + part + " : " +
             acc_t + "\n";
      acc = sum;
    }
  }

  // Slice the padded accumulator back to the logical (m, n).
  std::string cur =
      e.slice2d(acc, d.batch, m_pad, n_pad, 0, d.m, 0, d.n, ElementType::kF32);

  if (p.c_type != ElementType::kF32) {
    std::string cc = e.fresh();
    e.s += "    " + cc + " = stablehlo.convert " + cur + " : (" +
           tensor_type(d.batch, d.m, d.n, ElementType::kF32) + ") -> " + c_t +
           "\n";
    cur = cc;
  }
  if (d.load_previous_c) {
    // load_previous_C accumulate path (GEMMDescriptor.swift:42-47).
    std::string sum = e.fresh();
    e.s += "    " + sum + " = stablehlo.add " + cur + ", %c0 : " + c_t + "\n";
    cur = sum;
  }
  e.s += "    return " + cur + " : " + c_t + "\n";
  e.s += "  }\n";
  e.s += "}\n";
  return e.s;
}

std::string emit_gemm_chain_stablehlo(const GEMMEmitParams& p) {
  const GEMMDescriptor& d = p.desc;
  // Square, non-transposed, unbatched: the timing harness shape.
  if (d.m != d.n || d.n != d.k || d.transpose_a || d.transpose_b ||
      d.batch > 1 || d.load_previous_c) {
    return "";
  }
  const std::string x_t = tensor_type(1, d.m, d.m, p.a_type);
  const std::string b_t = tensor_type(1, d.m, d.m, p.b_type);
  const std::string f_t = tensor_type(1, d.m, d.m, ElementType::kF32);
  const bool cast = p.a_type != ElementType::kF32;

  std::string s;
  s += "module @gemm_chain {\n";
  s += "  func.func @main(%a: " + x_t + ", %b: " + b_t +
       ", %n: tensor<i32>) -> " + x_t + " {\n";
  s += "    %i0 = stablehlo.constant dense<0> : tensor<i32>\n";
  s += "    %one = stablehlo.constant dense<1> : tensor<i32>\n";
  s += "    %w:2 = stablehlo.while(%it = %i0, %x = %a) : tensor<i32>, " +
       x_t + "\n";
  s += "    cond {\n";
  s += "      %lt = stablehlo.compare LT, %it, %n : (tensor<i32>, "
       "tensor<i32>) -> tensor<i1>\n";
  s += "      stablehlo.return %lt : tensor<i1>\n";
  s += "    } do {\n";
  s += "      %ni = stablehlo.add %it, %one : tensor<i32>\n";
  s += "      %dot = stablehlo.dot_general %x, %b, contracting_dims = [1] x "
       "[0], precision = [DEFAULT, DEFAULT] : (" + x_t + ", " + b_t +
       ") -> " + f_t + "\n";
  if (cast) {
    s += "      %cv = stablehlo.convert %dot : (" + f_t + ") -> " + x_t +
         "\n";
    s += "      stablehlo.return %ni, %cv : tensor<i32>, " + x_t + "\n";
  } else {
    s += "      stablehlo.return %ni, %dot : tensor<i32>, " + x_t + "\n";
  }
  s += "    }\n";
  s += "    return %w#1 : " + x_t + "\n";
  s += "  }\n";
  s += "}\n";
  return s;
}

}  // namespace mfa
