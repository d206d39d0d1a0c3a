// Host-path benchmark driver: the native equivalent of the reference's
// standalone C++ benchmark (Documentation/CppReference/main.cpp:45-311).
// The reference's driver times GPU GEMMs; its *host-side* budget is the
// part that transfers to any backend — kernel-descriptor derivation must
// stay ~1 microsecond (GEMMDescriptor.swift:105: "Only 1 microsecond of
// CPU time"), cache probes nanoseconds. This driver measures exactly that
// for the C++ config core, plus correctness smoke tests.
//
// Device-side benchmarking lives in bench.py (the XLA/PJRT path owns the
// chip; duplicating a PJRT client here would just re-wrap the same
// runtime).
#include <chrono>
#include <cstdio>
#include <vector>

#include "descriptors.hpp"
#include "kernel_cache.hpp"
#include "mfa_error.hpp"

using Clock = std::chrono::steady_clock;

static double ns_per_iter(int iters, void (*fn)(int)) {
  auto t0 = Clock::now();
  fn(iters);
  auto t1 = Clock::now();
  return std::chrono::duration<double, std::nano>(t1 - t0).count() / iters;
}

static const char* kTable = R"(
   64   |   256   |   2048   |   64    | Q, O
  128   |   256   |   2048   |  128    | Q, O
  256   |   256   |   1024   |  256    | Q, O
  inf   |   128   |    512   |  128    |
)";

static std::vector<mfa::ParameterRow> g_rows;
static mfa::TwoLevelCache g_cache;

static void bench_heuristic(int iters) {
  for (int i = 0; i < iters; ++i) {
    mfa::GEMMDescriptor d;
    d.m = 4096 + (i & 7);
    d.n = 4096;
    d.k = 4096;
    d.a_bytes = 2.0;
    d.b_bytes = 2.0;
    auto kd = mfa::gemm_kernel_descriptor(d, *mfa::find_generation("v5e"));
    MFA_PRECONDITION(kd.block_m > 0);
  }
}

static void bench_row_select(int iters) {
  for (int i = 0; i < iters; ++i) {
    int idx = mfa::select_row(g_rows, 64 + (i & 255));
    MFA_PRECONDITION(idx >= 0);
  }
}

static void bench_cache_probe(int iters) {
  for (int i = 0; i < iters; ++i) {
    void* hit = g_cache.get_pipeline(static_cast<uint64_t>(i & 1023));
    MFA_PRECONDITION(hit != nullptr);
  }
}

int main() {
  // -- correctness smoke --
  std::string err;
  MFA_CHECK(mfa::parse_table(kTable, &g_rows, &err), err.c_str());
  MFA_PRECONDITION(g_rows.size() == 4);
  MFA_PRECONDITION(mfa::select_row(g_rows, 64) == 0);
  MFA_PRECONDITION(mfa::select_row(g_rows, 96) == 1);
  MFA_PRECONDITION(mfa::select_row(g_rows, 999) == 3);

  mfa::GEMMDescriptor d;
  d.m = d.n = d.k = 4096;
  d.a_bytes = d.b_bytes = 2.0;
  auto kd = mfa::gemm_kernel_descriptor(d, *mfa::find_generation("v5e"));
  std::printf(MFA_LOG_HEADER "gemm blocks 4096^3 bf16 on v5e: %dx%dx%d\n",
              kd.block_m, kd.block_n, kd.block_k);
  MFA_PRECONDITION(kd.block_m == 512 && kd.block_n == 512);

  for (uint64_t i = 0; i < 1024; ++i) {
    g_cache.put_pipeline(i, reinterpret_cast<void*>(i + 1));
  }

  // -- latency budget (reference: descriptor derivation <= 1 us) --
  double heur = ns_per_iter(200000, bench_heuristic);
  double row = ns_per_iter(2000000, bench_row_select);
  double probe = ns_per_iter(2000000, bench_cache_probe);
  std::printf(MFA_LOG_HEADER "kernel-descriptor heuristic: %.0f ns/call\n",
              heur);
  std::printf(MFA_LOG_HEADER "parameter-row select:        %.0f ns/call\n",
              row);
  std::printf(MFA_LOG_HEADER "pipeline-cache probe:        %.0f ns/call\n",
              probe);
  MFA_CHECK(heur < 1000.0, "heuristic exceeds the 1 us budget");
  std::printf(MFA_LOG_HEADER "host-path budget OK\n");
  return 0;
}
