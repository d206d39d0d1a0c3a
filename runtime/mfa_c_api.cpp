// C ABI for the kernel-config core — consumed by the Python layer via
// ctypes (mfa_tpu/ops/native.py). The reference keeps its C++ port as a
// standalone twin (Documentation/CppReference); ours is additionally wired
// into the live dispatch path.
#include <algorithm>
#include <cstring>
#include <string>
#include <vector>

#include "descriptors.hpp"
#include "gemm_emitter.hpp"
#include "kernel_cache.hpp"

extern "C" {

struct MfaRow {
  int max_d;
  int block_q;
  int block_kv;
  int block_d;
  char vmem_resident[96];  // comma-joined operand names
};

// Parse a pipe-DSL table into rows. Returns row count, or -1 on error
// (error text copied into err/err_len if provided).
int mfa_parse_table(const char* text, MfaRow* rows, int max_rows, char* err,
                    int err_len) {
  std::vector<mfa::ParameterRow> parsed;
  std::string error;
  if (!mfa::parse_table(text ? text : "", &parsed, &error)) {
    if (err && err_len > 0) {
      std::strncpy(err, error.c_str(), err_len - 1);
      err[err_len - 1] = '\0';
    }
    return -1;
  }
  int n = static_cast<int>(parsed.size());
  if (n > max_rows) n = max_rows;
  for (int i = 0; i < n; ++i) {
    rows[i].max_d = parsed[i].max_d;
    rows[i].block_q = parsed[i].block_q;
    rows[i].block_kv = parsed[i].block_kv;
    rows[i].block_d = parsed[i].block_d;
    std::string joined;
    for (const auto& op : parsed[i].vmem_resident) {
      if (!joined.empty()) joined += ",";
      joined += op;
    }
    std::strncpy(rows[i].vmem_resident, joined.c_str(),
                 sizeof(rows[i].vmem_resident) - 1);
    rows[i].vmem_resident[sizeof(rows[i].vmem_resident) - 1] = '\0';
  }
  return n;
}

int mfa_select_row(const MfaRow* rows, int n, int head_dim) {
  for (int i = 0; i < n; ++i) {
    if (rows[i].max_d == 0 || head_dim <= rows[i].max_d) return i;
  }
  return n - 1;
}

long long mfa_vmem_bytes_estimate(const MfaRow* row, int head_dim,
                                  double in_bytes, const char* kernel_type) {
  mfa::ParameterRow r;
  r.max_d = row->max_d;
  r.block_q = row->block_q;
  r.block_kv = row->block_kv;
  r.block_d = row->block_d;
  return mfa::vmem_bytes_estimate(r, head_dim, in_bytes,
                                  kernel_type ? kernel_type : "forward");
}

void mfa_gemm_blocks(long long m, long long n, long long k, double a_bytes,
                     double b_bytes, const char* generation, int* bm,
                     int* bn, int* bk) {
  const mfa::TpuGeneration* gen = mfa::find_generation(
      generation ? generation : "v5e");
  if (!gen) gen = mfa::find_generation("v5e");
  mfa::GEMMDescriptor d;
  d.m = m;
  d.n = n;
  d.k = k;
  d.a_bytes = a_bytes;
  d.b_bytes = b_bytes;
  auto kd = mfa::gemm_kernel_descriptor(d, *gen);
  *bm = kd.block_m;
  *bn = kd.block_n;
  *bk = kd.block_k;
}

unsigned long long mfa_hash_bytes(const void* data, long long len) {
  return mfa::hash::bytes(data, static_cast<size_t>(len));
}

// ---- GEMM StableHLO codegen (gemm_emitter.cpp) ----
// Returns the emitted module length; writes up to `cap` bytes into `out`
// (NUL-terminated when it fits). bf16 flags select per-operand element
// types; the accumulator is always f32 (GEMMKernel.swift:98-103 rule).

// Explicit-blocks variant: bm/bn/bk <= 0 → run the heuristic
// (gemm_kernel_descriptor), so every emitted module reflects either the
// caller's blocks or the framework's own choice — never an untiled ideal.
long long mfa_emit_gemm_blocked(long long m, long long n, long long k,
                                long long batch, int transpose_a,
                                int transpose_b, int load_previous_c,
                                int a_bf16, int b_bf16, int c_bf16, int bm,
                                int bn, int bk, char* out, long long cap) {
  mfa::GEMMEmitParams p;
  p.desc.m = m;
  p.desc.n = n;
  p.desc.k = k;
  p.desc.batch = batch;
  p.desc.transpose_a = transpose_a != 0;
  p.desc.transpose_b = transpose_b != 0;
  p.desc.load_previous_c = load_previous_c != 0;
  p.desc.a_bytes = a_bf16 ? 2.0 : 4.0;
  p.desc.b_bytes = b_bf16 ? 2.0 : 4.0;
  p.desc.c_bytes = c_bf16 ? 2.0 : 4.0;
  p.a_type = a_bf16 ? mfa::ElementType::kBF16 : mfa::ElementType::kF32;
  p.b_type = b_bf16 ? mfa::ElementType::kBF16 : mfa::ElementType::kF32;
  p.c_type = c_bf16 ? mfa::ElementType::kBF16 : mfa::ElementType::kF32;
  p.kd.block_m = bm;
  p.kd.block_n = bn;
  p.kd.block_k = bk;
  const std::string text = mfa::emit_gemm_stablehlo(p);
  if (out && cap > 0) {
    const long long ncopy =
        std::min<long long>(cap - 1, static_cast<long long>(text.size()));
    std::memcpy(out, text.data(), static_cast<size_t>(ncopy));
    out[ncopy] = '\0';
  }
  return static_cast<long long>(text.size());
}

long long mfa_emit_gemm(long long m, long long n, long long k,
                        long long batch, int transpose_a, int transpose_b,
                        int load_previous_c, int a_bf16, int b_bf16,
                        int c_bf16, char* out, long long cap) {
  return mfa_emit_gemm_blocked(m, n, k, batch, transpose_a, transpose_b,
                               load_previous_c, a_bf16, b_bf16, c_bf16, 0, 0,
                               0, out, cap);
}

// ---- opaque two-level cache (payloads are client-owned ints here; the
// Python side uses it for key→token memoization and stats) ----

void* mfa_cache_new() { return new mfa::TwoLevelCache(); }
void mfa_cache_free(void* c) { delete static_cast<mfa::TwoLevelCache*>(c); }

void* mfa_cache_get_pipeline(void* c, unsigned long long key) {
  return static_cast<mfa::TwoLevelCache*>(c)->get_pipeline(key);
}
void* mfa_cache_get_library(void* c, unsigned long long key) {
  return static_cast<mfa::TwoLevelCache*>(c)->get_library(key);
}
void* mfa_cache_put_pipeline(void* c, unsigned long long key, void* payload) {
  return static_cast<mfa::TwoLevelCache*>(c)->put_pipeline(key, payload);
}
void* mfa_cache_put_library(void* c, unsigned long long key, void* payload) {
  return static_cast<mfa::TwoLevelCache*>(c)->put_library(key, payload);
}
void mfa_cache_stats(void* c, unsigned long long* out4) {
  auto s = static_cast<mfa::TwoLevelCache*>(c)->stats();
  out4[0] = s.library_hits;
  out4[1] = s.library_misses;
  out4[2] = s.pipeline_hits;
  out4[3] = s.pipeline_misses;
}

}  // extern "C"
