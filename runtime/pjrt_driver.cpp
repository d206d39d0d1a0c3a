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

  // ---- compile: C++ codegen (gemm_emitter.cpp) → PJRT JIT — the
  // source→library→pipeline flow of GEMMShaderCache::fetchKernel
  // (GEMMShaderCache.cpp:8-172) with StableHLO standing in for MSL. ----
  mfa::GEMMEmitParams eparams;
  eparams.desc.m = eparams.desc.n = eparams.desc.k = 512;
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
  const char kOpts[] = "";  // default CompileOptionsProto (empty)
  comp.compile_options = kOpts;
  comp.compile_options_size = 0;
  CHECK_PJRT(g_api->PJRT_Client_Compile(&comp));
  PJRT_LoadedExecutable* exec = comp.executable;
  std::printf(MFA_LOG_HEADER "compiled 512^3 matmul\n");

  // ---- host buffers ----
  const int64_t kN = 512;
  std::vector<float> a(kN * kN, 0.5f), b(kN * kN, 0.25f);
  const int64_t dims[2] = {kN, kN};

  auto make_buffer = [&](float* data) -> PJRT_Buffer* {
    PJRT_Client_BufferFromHostBuffer_Args h;
    std::memset(&h, 0, sizeof(h));
    h.struct_size = PJRT_Client_BufferFromHostBuffer_Args_STRUCT_SIZE;
    h.client = client;
    h.data = data;
    h.type = PJRT_Buffer_Type_F32;
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
    // Wait for the transfer-done event.
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

  PJRT_Buffer* ba = make_buffer(a.data());
  PJRT_Buffer* bb = make_buffer(b.data());
  if (!ba || !bb) return 1;

  // ---- timed dispatch loop (reference main.cpp:174-214 shape) ----
  PJRT_ExecuteOptions opts;
  std::memset(&opts, 0, sizeof(opts));
  opts.struct_size = PJRT_ExecuteOptions_STRUCT_SIZE;

  auto run_once = [&](bool sync) -> int {
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
    // Destroy the output buffer (we only time dispatch).
    if (out_buf[0]) {
      PJRT_Buffer_Destroy_Args bd;
      std::memset(&bd, 0, sizeof(bd));
      bd.struct_size = PJRT_Buffer_Destroy_Args_STRUCT_SIZE;
      bd.buffer = out_buf[0];
      g_api->PJRT_Buffer_Destroy(&bd);
    }
    return 0;
  };

  if (run_once(true)) return 1;  // warm-up + sanity

  auto t0 = std::chrono::steady_clock::now();
  for (int i = 0; i < iters; ++i) {
    if (run_once(i == iters - 1)) return 1;  // sync only on the last
  }
  auto t1 = std::chrono::steady_clock::now();
  double sec = std::chrono::duration<double>(t1 - t0).count();
  double gflops = 2.0 * kN * kN * kN * iters / sec / 1e9;
  std::printf(MFA_LOG_HEADER
              "%d dispatches in %.3f s — %.1f GFLOPS (512^3 f32)\n",
              iters, sec, gflops);
  std::printf(MFA_LOG_HEADER "pjrt driver OK\n");
  return 0;
}
