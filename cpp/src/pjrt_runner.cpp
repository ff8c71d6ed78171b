// hyt_run: standalone C++ host runner for AOT-compiled pipeline programs.
//
// TPU-native equivalent of the reference's TensorRT C++ engine runner
// (TensorRT-For-YOLO-Series cpp/end2end/main.cpp): where that program
// deserializes a .engine file and enqueues it on a CUDA stream, this one
// dlopens a PJRT plugin (e.g. libtpu / libaxon_pjrt.so), deserializes an
// XLA executable exported by tools/export_executable.py, uploads inputs,
// executes, and fetches outputs — no Python in the loop.
//
// Usage:
//   hyt_run <pjrt_plugin.so> <executable.bin> [input.meta] [image.raw HxW]
//
// input.meta lines: "<dtype> <d0,d1,...>" per executable argument, e.g.
//   f32 1,256,256,3
// Missing meta => runs with no arguments; zeros otherwise.
//
// With a raw image (HxW x 3 uint8 BGR, e.g. produced by
// `np.asarray(cv2.imread(p)).tofile("img.raw")`) and the detector engine
// from tools/export_executable.py --model yolo, the runner letterboxes the
// frame with the native hyt_letterbox, converts BGR->RGB /255, executes,
// and prints the surviving detections — the full equivalent of the
// reference's TensorRT C++ demo loop.

#include <dlfcn.h>

#include <chrono>
#include <cstdint>
#include <cstdio>
#include <cstring>
#include <fstream>
#include <sstream>
#include <string>
#include <vector>

#include "hyt.h"
#include "xla/pjrt/c/pjrt_c_api.h"

namespace {

const PJRT_Api* g_api = nullptr;

void CheckErr(PJRT_Error* err, const char* what) {
  if (err == nullptr) return;
  PJRT_Error_Message_Args margs;
  memset(&margs, 0, sizeof(margs));
  margs.struct_size = PJRT_Error_Message_Args_STRUCT_SIZE;
  margs.error = err;
  g_api->PJRT_Error_Message(&margs);
  fprintf(stderr, "FATAL %s: %.*s\n", what, (int)margs.message_size,
          margs.message);
  PJRT_Error_Destroy_Args dargs;
  memset(&dargs, 0, sizeof(dargs));
  dargs.struct_size = PJRT_Error_Destroy_Args_STRUCT_SIZE;
  dargs.error = err;
  g_api->PJRT_Error_Destroy(&dargs);
  exit(1);
}

std::string ReadFile(const char* path) {
  std::ifstream f(path, std::ios::binary);
  if (!f) {
    fprintf(stderr, "cannot open %s\n", path);
    exit(1);
  }
  std::ostringstream ss;
  ss << f.rdbuf();
  return ss.str();
}

struct ArgSpec {
  PJRT_Buffer_Type type;
  std::vector<int64_t> dims;
  size_t bytes;
};

std::vector<ArgSpec> ParseMeta(const char* path) {
  std::vector<ArgSpec> specs;
  std::ifstream f(path);
  if (!f) return specs;
  std::string dtype, dims_str;
  while (f >> dtype >> dims_str) {
    ArgSpec s;
    size_t elem = 4;
    if (dtype == "f32") {
      s.type = PJRT_Buffer_Type_F32;
    } else if (dtype == "i32") {
      s.type = PJRT_Buffer_Type_S32;
    } else if (dtype == "bf16") {
      s.type = PJRT_Buffer_Type_BF16;
      elem = 2;
    } else {
      fprintf(stderr, "unknown dtype %s\n", dtype.c_str());
      exit(1);
    }
    size_t n = 1;
    std::stringstream ds(dims_str);
    std::string tok;
    while (std::getline(ds, tok, ',')) {
      s.dims.push_back(std::stoll(tok));
      n *= s.dims.back();
    }
    s.bytes = n * elem;
    specs.push_back(std::move(s));
  }
  return specs;
}

}  // namespace

int main(int argc, char** argv) {
  if (argc < 3) {
    fprintf(stderr, "usage: %s <pjrt_plugin.so> <executable.bin> [input.meta]\n",
            argv[0]);
    return 2;
  }

  void* lib = dlopen(argv[1], RTLD_NOW | RTLD_GLOBAL);
  if (!lib) {
    fprintf(stderr, "dlopen failed: %s\n", dlerror());
    return 1;
  }
  auto get_api = reinterpret_cast<const PJRT_Api* (*)()>(dlsym(lib, "GetPjrtApi"));
  if (!get_api) {
    fprintf(stderr, "GetPjrtApi not found: %s\n", dlerror());
    return 1;
  }
  g_api = get_api();
  printf("PJRT api version: %d.%d (header %d.%d)\n",
         g_api->pjrt_api_version.major_version,
         g_api->pjrt_api_version.minor_version, PJRT_API_MAJOR, PJRT_API_MINOR);

  {
    PJRT_Plugin_Initialize_Args init;
    memset(&init, 0, sizeof(init));
    init.struct_size = PJRT_Plugin_Initialize_Args_STRUCT_SIZE;
    CheckErr(g_api->PJRT_Plugin_Initialize(&init), "Plugin_Initialize");
  }

  // Plugin-specific create options. The axon plugin (remote TPU tunnel)
  // needs the same NamedValues its python-side register() passes
  // (topology/session/rank/...); standard libtpu ignores unknown keys'
  // absence and works with an empty list, so these are set only when the
  // HYT_AXON env knob (default: auto-detect from PALLAS_AXON_TPU_GEN) is on.
  std::vector<PJRT_NamedValue> opts;
  std::string topology;
  std::string session_id = "hyt-run";
  const char* gen = getenv("PALLAS_AXON_TPU_GEN");
  if (gen != nullptr) {
    topology = std::string(gen) + ":1x1x1";
    if (getenv("AXON_COMPAT_VERSION") == nullptr) {
      setenv("AXON_COMPAT_VERSION", "49", 0);
    }
    // Tunnel/samebox terminal discovery (what the python sitecustomize
    // exports inside python processes).
    const char* pool_ips = getenv("PALLAS_AXON_POOL_IPS");
    if (pool_ips != nullptr) {
      setenv("AXON_POOL_SVC_OVERRIDE", pool_ips, 0);
      setenv("AXON_LOOPBACK_RELAY", "1", 0);
    }
    auto add_str = [&](const char* name, const std::string& v) {
      PJRT_NamedValue nv;
      memset(&nv, 0, sizeof(nv));
      nv.struct_size = PJRT_NamedValue_STRUCT_SIZE;
      nv.name = name;
      nv.name_size = strlen(name);
      nv.type = PJRT_NamedValue_kString;
      nv.string_value = v.c_str();
      nv.value_size = v.size();
      opts.push_back(nv);
    };
    auto add_i64 = [&](const char* name, int64_t v) {
      PJRT_NamedValue nv;
      memset(&nv, 0, sizeof(nv));
      nv.struct_size = PJRT_NamedValue_STRUCT_SIZE;
      nv.name = name;
      nv.name_size = strlen(name);
      nv.type = PJRT_NamedValue_kInt64;
      nv.int64_value = v;
      nv.value_size = 1;
      opts.push_back(nv);
    };
    add_str("topology", topology);
    add_str("session_id", session_id);
    add_i64("remote_compile", getenv("PALLAS_AXON_REMOTE_COMPILE") ? 1 : 0);
    add_i64("local_only", 0);
    add_i64("priority", 0);
    add_i64("n_slices", 1);
    add_i64("rank", (int64_t)0xFFFFFFFFll);
  }

  PJRT_Client* client = nullptr;
  {
    PJRT_Client_Create_Args args;
    memset(&args, 0, sizeof(args));
    args.struct_size = PJRT_Client_Create_Args_STRUCT_SIZE;
    args.create_options = opts.empty() ? nullptr : opts.data();
    args.num_options = opts.size();
    CheckErr(g_api->PJRT_Client_Create(&args), "Client_Create");
    client = args.client;
  }

  PJRT_Device* device = nullptr;
  {
    PJRT_Client_AddressableDevices_Args args;
    memset(&args, 0, sizeof(args));
    args.struct_size = PJRT_Client_AddressableDevices_Args_STRUCT_SIZE;
    args.client = client;
    CheckErr(g_api->PJRT_Client_AddressableDevices(&args), "AddressableDevices");
    if (args.num_addressable_devices == 0) {
      fprintf(stderr, "no addressable devices\n");
      return 1;
    }
    device = args.addressable_devices[0];
    printf("devices: %zu\n", args.num_addressable_devices);
  }

  const std::string exe_bytes = ReadFile(argv[2]);
  PJRT_LoadedExecutable* exe = nullptr;
  {
    PJRT_Executable_DeserializeAndLoad_Args args;
    memset(&args, 0, sizeof(args));
    args.struct_size = PJRT_Executable_DeserializeAndLoad_Args_STRUCT_SIZE;
    args.client = client;
    args.serialized_executable = exe_bytes.data();
    args.serialized_executable_size = exe_bytes.size();
    CheckErr(g_api->PJRT_Executable_DeserializeAndLoad(&args),
             "DeserializeAndLoad");
    exe = args.loaded_executable;
    printf("executable loaded: %zu bytes\n", exe_bytes.size());
  }

  // Upload inputs (zeros, or a letterboxed raw image for arg 0).
  std::vector<ArgSpec> specs =
      argc > 3 ? ParseMeta(argv[3]) : std::vector<ArgSpec>();
  std::vector<std::vector<char>> host_data;
  for (const ArgSpec& s : specs) host_data.emplace_back(s.bytes, 0);

  float lb_r = 1.f, lb_dw = 0.f, lb_dh = 0.f;
  if (argc > 5 && !specs.empty()) {
    // argv[4] = raw BGR uint8 file, argv[5] = HxW
    int ih = 0, iw = 0;
    sscanf(argv[5], "%dx%d", &ih, &iw);
    std::string raw = ReadFile(argv[4]);
    if ((int)raw.size() != ih * iw * 3) {
      fprintf(stderr, "raw image size mismatch: %zu vs %d\n", raw.size(),
              ih * iw * 3);
      return 1;
    }
    const int S = (int)specs[0].dims[1];  // (1, S, S, 3)
    std::vector<float> boxed(S * S * 3);
    hyt_letterbox(reinterpret_cast<const uint8_t*>(raw.data()), ih, iw, S,
                  boxed.data(), &lb_r, &lb_dw, &lb_dh);
    float* dst = reinterpret_cast<float*>(host_data[0].data());
    for (int i = 0; i < S * S; ++i) {  // BGR -> RGB, [0, 1]
      dst[i * 3 + 0] = boxed[i * 3 + 2] / 255.f;
      dst[i * 3 + 1] = boxed[i * 3 + 1] / 255.f;
      dst[i * 3 + 2] = boxed[i * 3 + 0] / 255.f;
    }
    printf("image %dx%d letterboxed to %d (r=%.4f pad %.1f,%.1f)\n", ih, iw,
           S, lb_r, lb_dw, lb_dh);
  }

  std::vector<PJRT_Buffer*> inputs;
  for (size_t si = 0; si < specs.size(); ++si) {
    const ArgSpec& s = specs[si];
    PJRT_Client_BufferFromHostBuffer_Args args;
    memset(&args, 0, sizeof(args));
    args.struct_size = PJRT_Client_BufferFromHostBuffer_Args_STRUCT_SIZE;
    args.client = client;
    args.data = host_data[si].data();
    args.type = s.type;
    args.dims = s.dims.data();
    args.num_dims = s.dims.size();
    args.host_buffer_semantics =
        PJRT_HostBufferSemantics_kImmutableUntilTransferCompletes;
    args.device = device;
    CheckErr(g_api->PJRT_Client_BufferFromHostBuffer(&args), "BufferFromHost");
    if (args.done_with_host_buffer) {
      PJRT_Event_Await_Args ev;
      memset(&ev, 0, sizeof(ev));
      ev.struct_size = PJRT_Event_Await_Args_STRUCT_SIZE;
      ev.event = args.done_with_host_buffer;
      CheckErr(g_api->PJRT_Event_Await(&ev), "Await(h2d)");
      PJRT_Event_Destroy_Args evd;
      memset(&evd, 0, sizeof(evd));
      evd.struct_size = PJRT_Event_Destroy_Args_STRUCT_SIZE;
      evd.event = args.done_with_host_buffer;
      g_api->PJRT_Event_Destroy(&evd);
    }
    inputs.push_back(args.buffer);
  }

  // Query output arity.
  size_t num_outputs = 0;
  {
    PJRT_LoadedExecutable_GetExecutable_Args ge;
    memset(&ge, 0, sizeof(ge));
    ge.struct_size = PJRT_LoadedExecutable_GetExecutable_Args_STRUCT_SIZE;
    ge.loaded_executable = exe;
    CheckErr(g_api->PJRT_LoadedExecutable_GetExecutable(&ge), "GetExecutable");
    PJRT_Executable_NumOutputs_Args no_args;
    memset(&no_args, 0, sizeof(no_args));
    no_args.struct_size = PJRT_Executable_NumOutputs_Args_STRUCT_SIZE;
    no_args.executable = ge.executable;
    CheckErr(g_api->PJRT_Executable_NumOutputs(&no_args), "NumOutputs");
    num_outputs = no_args.num_outputs;
  }
  printf("num inputs: %zu, num outputs: %zu\n", inputs.size(), num_outputs);

  // Execute (3 iterations; first includes warmup).
  std::vector<PJRT_Buffer*> outputs(num_outputs, nullptr);
  PJRT_Buffer** output_list = outputs.data();
  PJRT_Buffer* const* input_list = inputs.data();
  for (int iter = 0; iter < 3; ++iter) {
    for (PJRT_Buffer* b : outputs) {
      if (b) {
        PJRT_Buffer_Destroy_Args d;
        memset(&d, 0, sizeof(d));
        d.struct_size = PJRT_Buffer_Destroy_Args_STRUCT_SIZE;
        d.buffer = b;
        g_api->PJRT_Buffer_Destroy(&d);
      }
    }
    PJRT_ExecuteOptions opts;
    memset(&opts, 0, sizeof(opts));
    opts.struct_size = PJRT_ExecuteOptions_STRUCT_SIZE;
    PJRT_Event* done = nullptr;
    PJRT_LoadedExecutable_Execute_Args args;
    memset(&args, 0, sizeof(args));
    args.struct_size = PJRT_LoadedExecutable_Execute_Args_STRUCT_SIZE;
    args.executable = exe;
    args.options = &opts;
    args.argument_lists = &input_list;
    args.num_devices = 1;
    args.num_args = inputs.size();
    args.output_lists = &output_list;
    args.device_complete_events = &done;
    auto t0 = std::chrono::steady_clock::now();
    CheckErr(g_api->PJRT_LoadedExecutable_Execute(&args), "Execute");
    {
      PJRT_Event_Await_Args ev;
      memset(&ev, 0, sizeof(ev));
      ev.struct_size = PJRT_Event_Await_Args_STRUCT_SIZE;
      ev.event = done;
      CheckErr(g_api->PJRT_Event_Await(&ev), "Await(exec)");
      PJRT_Event_Destroy_Args evd;
      memset(&evd, 0, sizeof(evd));
      evd.struct_size = PJRT_Event_Destroy_Args_STRUCT_SIZE;
      evd.event = done;
      g_api->PJRT_Event_Destroy(&evd);
    }
    auto ms = std::chrono::duration<double, std::milli>(
                  std::chrono::steady_clock::now() - t0)
                  .count();
    printf("iter %d: %.2f ms\n", iter, ms);
  }

  // Fetch + report each output.
  std::vector<std::vector<char>> fetched(num_outputs);
  for (size_t i = 0; i < num_outputs; ++i) {
    PJRT_Buffer_Dimensions_Args dims;
    memset(&dims, 0, sizeof(dims));
    dims.struct_size = PJRT_Buffer_Dimensions_Args_STRUCT_SIZE;
    dims.buffer = outputs[i];
    CheckErr(g_api->PJRT_Buffer_Dimensions(&dims), "Dimensions");

    PJRT_Buffer_ToHostBuffer_Args th;
    memset(&th, 0, sizeof(th));
    th.struct_size = PJRT_Buffer_ToHostBuffer_Args_STRUCT_SIZE;
    th.src = outputs[i];
    CheckErr(g_api->PJRT_Buffer_ToHostBuffer(&th), "ToHost(size)");
    std::vector<char> host(th.dst_size);
    th.dst = host.data();
    CheckErr(g_api->PJRT_Buffer_ToHostBuffer(&th), "ToHost(copy)");
    if (th.event) {
      PJRT_Event_Await_Args ev;
      memset(&ev, 0, sizeof(ev));
      ev.struct_size = PJRT_Event_Await_Args_STRUCT_SIZE;
      ev.event = th.event;
      CheckErr(g_api->PJRT_Event_Await(&ev), "Await(d2h)");
    }
    double checksum = 0;
    const float* vals = reinterpret_cast<const float*>(host.data());
    for (size_t j = 0; j < host.size() / 4; ++j) checksum += vals[j];
    printf("output %zu: dims=[", i);
    for (size_t d = 0; d < dims.num_dims; ++d)
      printf("%s%lld", d ? "," : "", (long long)dims.dims[d]);
    printf("] bytes=%zu checksum=%.4f\n", host.size(), checksum);
    fetched[i] = std::move(host);
  }

  // Detector-engine detection printout (boxes, scores, classes, valid),
  // mapped back through the letterbox to original-image coordinates.
  if (argc > 5 && num_outputs == 4 && fetched[0].size() % 16 == 0) {
    const float* boxes = reinterpret_cast<const float*>(fetched[0].data());
    const float* scores = reinterpret_cast<const float*>(fetched[1].data());
    const int32_t* classes = reinterpret_cast<const int32_t*>(fetched[2].data());
    const uint8_t* valid = reinterpret_cast<const uint8_t*>(fetched[3].data());
    const size_t n = fetched[1].size() / 4;
    int kept = 0;
    for (size_t i = 0; i < n; ++i) {
      if (!valid[i]) continue;
      const float x1 = (boxes[i * 4 + 0] - lb_dw) / lb_r;
      const float y1 = (boxes[i * 4 + 1] - lb_dh) / lb_r;
      const float x2 = (boxes[i * 4 + 2] - lb_dw) / lb_r;
      const float y2 = (boxes[i * 4 + 3] - lb_dh) / lb_r;
      printf("det %d: cls=%d score=%.3f box=[%.1f, %.1f, %.1f, %.1f]\n",
             kept, classes[i], scores[i], x1, y1, x2, y2);
      ++kept;
    }
    printf("detections: %d\n", kept);
  }

  printf("OK\n");
  return 0;
}
