// Native PJRT host driver: the C++ benchmark/driver path.
//
// The reference ships a standalone C++ driver that creates the device
// context, builds pipelines, dispatches, and reports GFLOPS
// (Documentation/CppReference/main.cpp:45-311, over metal-cpp). This is the
// TPU-native equivalent over the PJRT C API: dlopen a PJRT plugin (the
// axon TPU plugin by default, or any other), create a client, compile a
// StableHLO matmul, and run the timed dispatch loop.
//
// Usage: pjrt_driver [plugin.so] [iters]
//
// Every step degrades gracefully with a diagnostic (the plugin may need
// environment/session state, or the device may be unavailable) — the
// config-core benchmark (main.cpp here) never depends on a device.
#include <dlfcn.h>
#include <unistd.h>

#include <algorithm>
#include <chrono>
#include <cstdio>
#include <cstring>
#include <string>
#include <vector>

#include "xla/pjrt/c/pjrt_c_api.h"

#include "gemm_emitter.hpp"
#include "mfa_error.hpp"

namespace {

const PJRT_Api* g_api = nullptr;

std::string error_message(PJRT_Error* err) {
  if (!err) return "";
  PJRT_Error_Message_Args margs;
  margs.struct_size = PJRT_Error_Message_Args_STRUCT_SIZE;
  margs.extension_start = nullptr;
  margs.error = err;
  g_api->PJRT_Error_Message(&margs);
  std::string msg(margs.message, margs.message_size);
  PJRT_Error_Destroy_Args dargs;
  dargs.struct_size = PJRT_Error_Destroy_Args_STRUCT_SIZE;
  dargs.extension_start = nullptr;
  dargs.error = err;
  g_api->PJRT_Error_Destroy(&dargs);
  return msg;
}

#define CHECK_PJRT(expr)                                                    \
  do {                                                                      \
    PJRT_Error* _err = (expr);                                              \
    if (_err) {                                                             \
      std::fprintf(stderr, MFA_LOG_HEADER "PJRT error at %s:%d: %s\n",      \
                   __FILE__, __LINE__, error_message(_err).c_str());        \
      return 1;                                                             \
    }                                                                       \
  } while (0)

}  // namespace

int main(int argc, char** argv) {
  const char* so_path = argc > 1 ? argv[1] : "/opt/axon/libaxon_pjrt.so";
  int iters = argc > 2 ? std::atoi(argv[2]) : 20;

  void* handle = dlopen(so_path, RTLD_NOW | RTLD_LOCAL);
  if (!handle) {
    std::fprintf(stderr, MFA_LOG_HEADER "dlopen(%s) failed: %s\n", so_path,
                 dlerror());
    return 1;
  }
  using GetPjrtApiFn = const PJRT_Api* (*)();
  auto get_api = reinterpret_cast<GetPjrtApiFn>(dlsym(handle, "GetPjrtApi"));
  if (!get_api) {
    std::fprintf(stderr, MFA_LOG_HEADER "GetPjrtApi not found in %s\n",
                 so_path);
    return 1;
  }
  g_api = get_api();
  std::printf(MFA_LOG_HEADER "plugin %s — PJRT C API %d.%d (header %d.%d)\n",
              so_path, g_api->pjrt_api_version.major_version,
              g_api->pjrt_api_version.minor_version, PJRT_API_MAJOR,
              PJRT_API_MINOR);

  // ---- client ----
  // The axon plugin parameterizes its client via NamedValues (the same
  // options python's axon.register passes). Generic PJRT plugins ignore
  // unknown options or need none.
  std::string session_id = "mfa-pjrt-driver-" + std::to_string(getpid());
  const char* topology = std::getenv("PALLAS_AXON_TPU_GEN");
  std::string topo_str = std::string(topology ? topology : "v5e") + ":1x1x1";

  std::vector<PJRT_NamedValue> nv;
  auto add_str = [&](const char* name, const std::string& value) {
    PJRT_NamedValue v;
    std::memset(&v, 0, sizeof(v));
    v.struct_size = PJRT_NamedValue_STRUCT_SIZE;
    v.name = name;
    v.name_size = std::strlen(name);
    v.type = PJRT_NamedValue_kString;
    v.string_value = value.c_str();
    v.value_size = value.size();
    nv.push_back(v);
  };
  auto add_i64 = [&](const char* name, int64_t value) {
    PJRT_NamedValue v;
    std::memset(&v, 0, sizeof(v));
    v.struct_size = PJRT_NamedValue_STRUCT_SIZE;
    v.name = name;
    v.name_size = std::strlen(name);
    v.type = PJRT_NamedValue_kInt64;
    v.int64_value = value;
    v.value_size = 1;
    nv.push_back(v);
  };
  bool is_axon = std::string(so_path).find("axon") != std::string::npos;
  if (is_axon) {
    add_i64("remote_compile", 1);
    add_i64("local_only", 0);
    add_i64("priority", 0);
    add_str("topology", topo_str);
    add_i64("n_slices", 1);
    add_str("session_id", session_id);
    add_i64("rank", 0xFFFFFFFFll);
    add_i64("claim_timeout_s", 60);
  }

  PJRT_Client_Create_Args cargs;
  std::memset(&cargs, 0, sizeof(cargs));
  cargs.struct_size = PJRT_Client_Create_Args_STRUCT_SIZE;
  cargs.create_options = nv.data();
  cargs.num_options = nv.size();
  CHECK_PJRT(g_api->PJRT_Client_Create(&cargs));
  PJRT_Client* client = cargs.client;
  std::printf(MFA_LOG_HEADER "client created\n");

  PJRT_Client_Devices_Args devs;
  std::memset(&devs, 0, sizeof(devs));
  devs.struct_size = PJRT_Client_Devices_Args_STRUCT_SIZE;
  devs.client = client;
  CHECK_PJRT(g_api->PJRT_Client_Devices(&devs));
  std::printf(MFA_LOG_HEADER "%zu device(s)\n", devs.num_devices);
  if (devs.num_devices == 0) return 1;
  PJRT_Device* device = devs.devices[0];

  // ---- the benchmark suite (reference main.cpp:23-43 sizes + oracle) ----
  // Each case: C++ codegen (gemm_emitter.cpp) → PJRT JIT → timed dispatch
  // loop → correctness check vs the constant oracle. A = 0.5, B = 0.25 so
  // every C element is exactly K * 0.125 (all partial sums are multiples
  // of 0.125 < 2^21 — exact in f32 accumulation for both input dtypes).
  struct Case {
    int64_t n;
    mfa::ElementType in_type;
    int iters;
  };
  const Case cases[] = {
      {512, mfa::ElementType::kF32, iters},
      {512, mfa::ElementType::kBF16, iters},
      {1488, mfa::ElementType::kBF16, iters},
      {1489, mfa::ElementType::kBF16, iters},
  };

  PJRT_ExecuteOptions opts;
  std::memset(&opts, 0, sizeof(opts));
  opts.struct_size = PJRT_ExecuteOptions_STRUCT_SIZE;

  bool all_ok = true;
  for (const Case& c : cases) {
    mfa::GEMMEmitParams eparams;
    eparams.desc.m = eparams.desc.n = eparams.desc.k = c.n;
    eparams.a_type = eparams.b_type = c.in_type;
    eparams.c_type = mfa::ElementType::kF32;
    eparams.desc.a_bytes = eparams.desc.b_bytes =
        c.in_type == mfa::ElementType::kF32 ? 4.0 : 2.0;
    const std::string mlir_text = mfa::emit_gemm_stablehlo(eparams);

    PJRT_Program program;
    std::memset(&program, 0, sizeof(program));
    program.struct_size = PJRT_Program_STRUCT_SIZE;
    program.code = const_cast<char*>(mlir_text.c_str());
    program.code_size = mlir_text.size();
    const char kFormat[] = "mlir";
    program.format = kFormat;
    program.format_size = sizeof(kFormat) - 1;

    PJRT_Client_Compile_Args comp;
    std::memset(&comp, 0, sizeof(comp));
    comp.struct_size = PJRT_Client_Compile_Args_STRUCT_SIZE;
    comp.client = client;
    comp.program = &program;
    // Hand-encoded xla.CompileOptionsProto: executable_build_options
    // (field 3, message) { num_replicas = 1 (field 4), num_partitions = 1
    // (field 5) }. An empty proto fails with "Number of replicas (0)".
    static const char kOpts[] = {0x1A, 0x04, 0x20, 0x01, 0x28, 0x01};
    comp.compile_options = kOpts;
    comp.compile_options_size = sizeof(kOpts);
    CHECK_PJRT(g_api->PJRT_Client_Compile(&comp));
    PJRT_LoadedExecutable* exec = comp.executable;

    // Host operands. bf16 values are the top 16 bits of the f32 pattern
    // (0.5 and 0.25 are exact in bf16).
    const int64_t elems = c.n * c.n;
    std::vector<float> af(elems, 0.5f), bf(elems, 0.25f);
    std::vector<uint16_t> ah, bh;
    const int64_t dims[2] = {c.n, c.n};
    PJRT_Buffer_Type in_pjrt_type = PJRT_Buffer_Type_F32;
    void* a_data = af.data();
    void* b_data = bf.data();
    if (c.in_type == mfa::ElementType::kBF16) {
      ah.resize(elems);
      bh.resize(elems);
      for (int64_t i = 0; i < elems; ++i) {
        uint32_t bits;
        std::memcpy(&bits, &af[i], 4);
        ah[i] = static_cast<uint16_t>(bits >> 16);
        std::memcpy(&bits, &bf[i], 4);
        bh[i] = static_cast<uint16_t>(bits >> 16);
      }
      in_pjrt_type = PJRT_Buffer_Type_BF16;
      a_data = ah.data();
      b_data = bh.data();
    }

    auto make_buffer = [&](void* data) -> PJRT_Buffer* {
      PJRT_Client_BufferFromHostBuffer_Args h;
      std::memset(&h, 0, sizeof(h));
      h.struct_size = PJRT_Client_BufferFromHostBuffer_Args_STRUCT_SIZE;
      h.client = client;
      h.data = data;
      h.type = in_pjrt_type;
      h.dims = dims;
      h.num_dims = 2;
      h.host_buffer_semantics =
          PJRT_HostBufferSemantics_kImmutableUntilTransferCompletes;
      h.device = device;
      PJRT_Error* err = g_api->PJRT_Client_BufferFromHostBuffer(&h);
      if (err) {
        std::fprintf(stderr, MFA_LOG_HEADER "h2d failed: %s\n",
                     error_message(err).c_str());
        return nullptr;
      }
      PJRT_Event_Await_Args await;
      std::memset(&await, 0, sizeof(await));
      await.struct_size = PJRT_Event_Await_Args_STRUCT_SIZE;
      await.event = h.done_with_host_buffer;
      g_api->PJRT_Event_Await(&await);
      PJRT_Event_Destroy_Args edestroy;
      std::memset(&edestroy, 0, sizeof(edestroy));
      edestroy.struct_size = PJRT_Event_Destroy_Args_STRUCT_SIZE;
      edestroy.event = h.done_with_host_buffer;
      g_api->PJRT_Event_Destroy(&edestroy);
      return h.buffer;
    };

    PJRT_Buffer* ba = make_buffer(a_data);
    PJRT_Buffer* bb = make_buffer(b_data);
    if (!ba || !bb) return 1;

    auto destroy_buffer = [&](PJRT_Buffer* buf) {
      PJRT_Buffer_Destroy_Args bd;
      std::memset(&bd, 0, sizeof(bd));
      bd.struct_size = PJRT_Buffer_Destroy_Args_STRUCT_SIZE;
      bd.buffer = buf;
      g_api->PJRT_Buffer_Destroy(&bd);
    };

    // keep_out: return the result buffer (for the correctness readback)
    // instead of destroying it.
    auto run_once = [&](bool sync, PJRT_Buffer** keep_out) -> int {
      PJRT_Buffer* argv_list[2] = {ba, bb};
      PJRT_Buffer* const* arg_lists[1] = {argv_list};
      PJRT_Buffer* out_buf[1] = {nullptr};
      PJRT_Buffer** out_lists[1] = {out_buf};
      PJRT_Event* done = nullptr;

      PJRT_LoadedExecutable_Execute_Args ex;
      std::memset(&ex, 0, sizeof(ex));
      ex.struct_size = PJRT_LoadedExecutable_Execute_Args_STRUCT_SIZE;
      ex.executable = exec;
      ex.options = &opts;
      ex.argument_lists = arg_lists;
      ex.num_devices = 1;
      ex.num_args = 2;
      ex.output_lists = out_lists;
      ex.device_complete_events = sync ? &done : nullptr;
      ex.execute_device = nullptr;
      PJRT_Error* err = g_api->PJRT_LoadedExecutable_Execute(&ex);
      if (err) {
        std::fprintf(stderr, MFA_LOG_HEADER "execute failed: %s\n",
                     error_message(err).c_str());
        return 1;
      }
      if (sync && done) {
        PJRT_Event_Await_Args await;
        std::memset(&await, 0, sizeof(await));
        await.struct_size = PJRT_Event_Await_Args_STRUCT_SIZE;
        await.event = done;
        g_api->PJRT_Event_Await(&await);
        PJRT_Event_Destroy_Args ed;
        std::memset(&ed, 0, sizeof(ed));
        ed.struct_size = PJRT_Event_Destroy_Args_STRUCT_SIZE;
        ed.event = done;
        g_api->PJRT_Event_Destroy(&ed);
      }
      if (keep_out) {
        *keep_out = out_buf[0];
      } else if (out_buf[0]) {
        destroy_buffer(out_buf[0]);
      }
      return 0;
    };

    // Warm-up + correctness: read C back and check vs the constant oracle
    // (reference main.cpp checks vs a diagonal-matrix oracle, :216-279).
    PJRT_Buffer* result = nullptr;
    if (run_once(true, &result)) return 1;
    bool case_ok = result != nullptr;
    if (result) {
      std::vector<float> host_c(elems);
      PJRT_Buffer_ToHostBuffer_Args d2h;
      std::memset(&d2h, 0, sizeof(d2h));
      d2h.struct_size = PJRT_Buffer_ToHostBuffer_Args_STRUCT_SIZE;
      d2h.src = result;
      d2h.dst = host_c.data();
      d2h.dst_size = host_c.size() * sizeof(float);
      PJRT_Error* err = g_api->PJRT_Buffer_ToHostBuffer(&d2h);
      if (err) {
        std::fprintf(stderr, MFA_LOG_HEADER "d2h failed: %s\n",
                     error_message(err).c_str());
        case_ok = false;
      } else {
        PJRT_Event_Await_Args await;
        std::memset(&await, 0, sizeof(await));
        await.struct_size = PJRT_Event_Await_Args_STRUCT_SIZE;
        await.event = d2h.event;
        g_api->PJRT_Event_Await(&await);
        PJRT_Event_Destroy_Args ed;
        std::memset(&ed, 0, sizeof(ed));
        ed.struct_size = PJRT_Event_Destroy_Args_STRUCT_SIZE;
        ed.event = d2h.event;
        g_api->PJRT_Event_Destroy(&ed);
        const float expect = static_cast<float>(c.n) * 0.125f;
        int bad = 0;
        for (int64_t i = 0; i < elems; ++i) {
          if (host_c[i] != expect) {
            if (++bad <= 3) {
              std::fprintf(stderr,
                           MFA_LOG_HEADER "C[%lld] = %f, expected %f\n",
                           static_cast<long long>(i), host_c[i], expect);
            }
          }
        }
        if (bad) {
          std::fprintf(stderr, MFA_LOG_HEADER "%d mismatches\n", bad);
          case_ok = false;
        }
      }
      destroy_buffer(result);
    }

    auto destroy_exec = [&](PJRT_LoadedExecutable* x) {
      PJRT_LoadedExecutable_Destroy_Args xd;
      std::memset(&xd, 0, sizeof(xd));
      xd.struct_size = PJRT_LoadedExecutable_Destroy_Args_STRUCT_SIZE;
      xd.executable = x;
      g_api->PJRT_LoadedExecutable_Destroy(&xd);
    };

    // ---- chained timing (utils/roofline.py measure_chained protocol):
    // one dispatch = n dependent GEMMs inside a stablehlo.while; the slope
    // between two chain lengths cancels the fixed tunnel-sync cost. B for
    // the chain is 1/K so the carry stays ~0.5 (no inf saturation). ----
    eparams.kd = mfa::GEMMKernelDescriptor{};  // reuse heuristic blocks
    const std::string chain_text = mfa::emit_gemm_chain_stablehlo(eparams);
    program.code = const_cast<char*>(chain_text.c_str());
    program.code_size = chain_text.size();
    comp.program = &program;
    CHECK_PJRT(g_api->PJRT_Client_Compile(&comp));
    PJRT_LoadedExecutable* chain_exec = comp.executable;

    const float inv_k = 1.0f / static_cast<float>(c.n);
    std::vector<float> bcf(elems, inv_k);
    void* bc_data = bcf.data();
    std::vector<uint16_t> bch;
    if (c.in_type == mfa::ElementType::kBF16) {
      bch.resize(elems);
      uint32_t bits;
      std::memcpy(&bits, &inv_k, 4);
      const uint16_t hv = static_cast<uint16_t>(bits >> 16);
      for (int64_t i = 0; i < elems; ++i) bch[i] = hv;
      bc_data = bch.data();
    }
    PJRT_Buffer* bbc = make_buffer(bc_data);
    if (!bbc) return 1;

    auto make_scalar_i32 = [&](int32_t value) -> PJRT_Buffer* {
      PJRT_Client_BufferFromHostBuffer_Args h;
      std::memset(&h, 0, sizeof(h));
      h.struct_size = PJRT_Client_BufferFromHostBuffer_Args_STRUCT_SIZE;
      h.client = client;
      h.data = &value;
      h.type = PJRT_Buffer_Type_S32;
      h.dims = nullptr;
      h.num_dims = 0;
      h.host_buffer_semantics =
          PJRT_HostBufferSemantics_kImmutableOnlyDuringCall;
      h.device = device;
      PJRT_Error* err = g_api->PJRT_Client_BufferFromHostBuffer(&h);
      if (err) {
        std::fprintf(stderr, MFA_LOG_HEADER "scalar h2d failed: %s\n",
                     error_message(err).c_str());
        return nullptr;
      }
      PJRT_Event_Await_Args await;
      std::memset(&await, 0, sizeof(await));
      await.struct_size = PJRT_Event_Await_Args_STRUCT_SIZE;
      await.event = h.done_with_host_buffer;
      g_api->PJRT_Event_Await(&await);
      PJRT_Event_Destroy_Args edestroy;
      std::memset(&edestroy, 0, sizeof(edestroy));
      edestroy.struct_size = PJRT_Event_Destroy_Args_STRUCT_SIZE;
      edestroy.event = h.done_with_host_buffer;
      g_api->PJRT_Event_Destroy(&edestroy);
      return h.buffer;
    };

    // Synchronously run the chain with trip count `nb`; returns elapsed
    // wall seconds (device time + fixed sync cost) or <0 on error.
    auto run_chain = [&](PJRT_Buffer* nb) -> double {
      PJRT_Buffer* argv_list[3] = {ba, bbc, nb};
      PJRT_Buffer* const* arg_lists[1] = {argv_list};
      PJRT_Buffer* out_buf[1] = {nullptr};
      PJRT_Buffer** out_lists[1] = {out_buf};
      PJRT_Event* done = nullptr;

      PJRT_LoadedExecutable_Execute_Args ex;
      std::memset(&ex, 0, sizeof(ex));
      ex.struct_size = PJRT_LoadedExecutable_Execute_Args_STRUCT_SIZE;
      ex.executable = chain_exec;
      ex.options = &opts;
      ex.argument_lists = arg_lists;
      ex.num_devices = 1;
      ex.num_args = 3;
      ex.output_lists = out_lists;
      ex.device_complete_events = &done;
      ex.execute_device = nullptr;
      auto t0 = std::chrono::steady_clock::now();
      PJRT_Error* err = g_api->PJRT_LoadedExecutable_Execute(&ex);
      if (err) {
        std::fprintf(stderr, MFA_LOG_HEADER "chain execute failed: %s\n",
                     error_message(err).c_str());
        return -1.0;
      }
      if (done) {
        PJRT_Event_Await_Args await;
        std::memset(&await, 0, sizeof(await));
        await.struct_size = PJRT_Event_Await_Args_STRUCT_SIZE;
        await.event = done;
        g_api->PJRT_Event_Await(&await);
        PJRT_Event_Destroy_Args ed;
        std::memset(&ed, 0, sizeof(ed));
        ed.struct_size = PJRT_Event_Destroy_Args_STRUCT_SIZE;
        ed.event = done;
        g_api->PJRT_Event_Destroy(&ed);
      }
      // Through the tunnel the device-complete event can resolve at
      // ENQUEUE, not completion (observed: a 500k-GEMM chain "finished"
      // in microseconds) — a d2h readback of the result is the only hard
      // sync. Its cost is constant per dispatch, so the slope between the
      // two chain lengths cancels it exactly.
      if (out_buf[0]) {
        std::vector<char> sink(elems * (c.in_type == mfa::ElementType::kF32
                                            ? 4 : 2));
        PJRT_Buffer_ToHostBuffer_Args d2h;
        std::memset(&d2h, 0, sizeof(d2h));
        d2h.struct_size = PJRT_Buffer_ToHostBuffer_Args_STRUCT_SIZE;
        d2h.src = out_buf[0];
        d2h.dst = sink.data();
        d2h.dst_size = sink.size();
        PJRT_Error* derr = g_api->PJRT_Buffer_ToHostBuffer(&d2h);
        if (derr) {
          std::fprintf(stderr, MFA_LOG_HEADER "chain d2h failed: %s\n",
                       error_message(derr).c_str());
          destroy_buffer(out_buf[0]);
          return -1.0;
        }
        PJRT_Event_Await_Args await;
        std::memset(&await, 0, sizeof(await));
        await.struct_size = PJRT_Event_Await_Args_STRUCT_SIZE;
        await.event = d2h.event;
        g_api->PJRT_Event_Await(&await);
        PJRT_Event_Destroy_Args ed;
        std::memset(&ed, 0, sizeof(ed));
        ed.struct_size = PJRT_Event_Destroy_Args_STRUCT_SIZE;
        ed.event = d2h.event;
        g_api->PJRT_Event_Destroy(&ed);
      }
      auto t1 = std::chrono::steady_clock::now();
      if (out_buf[0]) destroy_buffer(out_buf[0]);
      return std::chrono::duration<double>(t1 - t0).count();
    };

    const int32_t n_small = 4;
    int32_t n_big = 256;
    const double min_window_s = 0.3;
    PJRT_Buffer* nb_small = make_scalar_i32(n_small);
    PJRT_Buffer* nb_big = make_scalar_i32(n_big);
    if (!nb_small || !nb_big) return 1;
    run_chain(nb_small);  // warm-up
    double dt = 1e-9;
    // Calibrate n_big until the slope window dominates tunnel-sync jitter
    // (iterative estimate-then-jump — see measure_chained's rationale).
    for (int attempt = 0; attempt < 8; ++attempt) {
      double t_s = run_chain(nb_small);
      double t_b = run_chain(nb_big);
      if (t_s < 0 || t_b < 0) return 1;
      dt = std::max((t_b - t_s) / (n_big - n_small), 1e-9);
      if (t_b - t_s >= min_window_s || n_big >= (1 << 19)) break;
      // Grow geometrically while the window is noise (a garbage slope
      // would otherwise jump straight to the cap — a 20 s chain at
      // 1489^3); jump to the estimate once the window is resolvable.
      int32_t next;
      if (t_b - t_s < 1e-3) {
        next = n_big * 8;
      } else {
        next = static_cast<int32_t>(min_window_s / dt) + n_small;
        next = std::min(next, n_big * 64);
      }
      n_big = std::min(std::max(next, n_big * 2), 1 << 19);
      destroy_buffer(nb_big);
      nb_big = make_scalar_i32(n_big);
      if (!nb_big) return 1;
    }
    // Median-of-3 slopes.
    double slopes[3];
    for (int t = 0; t < 3; ++t) {
      double t_s = run_chain(nb_small);
      double t_b = run_chain(nb_big);
      if (t_s < 0 || t_b < 0) return 1;
      slopes[t] = std::max((t_b - t_s) / (n_big - n_small), 1e-9);
    }
    std::sort(slopes, slopes + 3);
    dt = slopes[1];
    double gflops = 2.0 * c.n * c.n * c.n / dt / 1e9;
    std::printf(MFA_LOG_HEADER
                "%lld^3 %s: chained n=%d, %.2f us/GEMM — %.0f GFLOPS %s\n",
                static_cast<long long>(c.n), mfa::mlir_name(c.in_type),
                n_big, dt * 1e6, gflops,
                case_ok ? "(correct)" : "(MISMATCH)");
    all_ok &= case_ok;

    destroy_buffer(nb_small);
    destroy_buffer(nb_big);
    destroy_buffer(bbc);
    destroy_buffer(ba);
    destroy_buffer(bb);
    destroy_exec(exec);
    destroy_exec(chain_exec);
  }

  std::printf(MFA_LOG_HEADER "pjrt driver %s\n", all_ok ? "OK" : "FAILED");
  return all_ok ? 0 : 1;
}
