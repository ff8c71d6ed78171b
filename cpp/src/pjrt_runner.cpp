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
//   hyt_run <pjrt_plugin.so> <executable.bin> [input.meta] [image HxW]
//   hyt_run <pjrt_plugin.so> <executable.bin> <input.meta> --serve
//
// input.meta lines: "<dtype> <d0,d1,...>" per executable argument, e.g.
//   f32 1,256,256,3
// Missing meta => runs with no arguments; zeros otherwise.
//
// Image inputs (both one-shot and --serve):
//   *.ppm          binary P6 PPM (RGB; `cv2.imwrite("f.ppm", img)`)
//   *.raw [HxW]    raw HxWx3 uint8 BGR dump (`img.tofile("f.raw")`);
//                  in --serve mode the dims ride the path: "f.raw:720x1280"
// The frame is letterboxed with the native hyt_letterbox to the engine's
// input size, RGB-ordered, scaled to [0, 1], and fed as argument 0 — the
// full equivalent of the reference's TensorRT C++ demo loop.
//
// --serve: daemon mode (the TensorRT-demo "server" loop, reference
// cpp/end2end/main.cpp kept the engine hot the same way). After printing
// "ready", reads one image path per stdin line, runs the hot engine, and
// emits ONE JSON line per frame:
//   {"image": ..., "ms": ..., "detections": [{"cls":..,"score":..,
//    "box":[x1,y1,x2,y2]}, ...]}
// (detections present when the engine has the 4-output detector schema;
// otherwise per-output checksums). "quit" or EOF exits.

#include <dlfcn.h>

#include <chrono>
#include <cstdint>
#include <cstdio>
#include <cstring>
#include <fstream>
#include <iostream>
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

void AwaitAndDestroy(PJRT_Event* event, const char* what) {
  if (!event) return;
  PJRT_Event_Await_Args ev;
  memset(&ev, 0, sizeof(ev));
  ev.struct_size = PJRT_Event_Await_Args_STRUCT_SIZE;
  ev.event = event;
  CheckErr(g_api->PJRT_Event_Await(&ev), what);
  PJRT_Event_Destroy_Args evd;
  memset(&evd, 0, sizeof(evd));
  evd.struct_size = PJRT_Event_Destroy_Args_STRUCT_SIZE;
  evd.event = event;
  g_api->PJRT_Event_Destroy(&evd);
}

void DestroyBuffer(PJRT_Buffer* b) {
  if (!b) return;
  PJRT_Buffer_Destroy_Args d;
  memset(&d, 0, sizeof(d));
  d.struct_size = PJRT_Buffer_Destroy_Args_STRUCT_SIZE;
  d.buffer = b;
  g_api->PJRT_Buffer_Destroy(&d);
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

// ---------------------------------------------------------------------------
// Image loading: binary P6 PPM (RGB) or raw uint8 BGR dump.
// ---------------------------------------------------------------------------

// Parses "P6 <w> <h> <max>" headers (with #-comments) followed by RGB
// bytes. Returns false (with a message) on malformed input.
bool LoadPPM(const std::string& path, int* h, int* w, std::vector<uint8_t>* rgb) {
  std::ifstream f(path, std::ios::binary);
  if (!f) {
    fprintf(stderr, "cannot open %s\n", path.c_str());
    return false;
  }
  std::string magic;
  f >> magic;
  if (magic != "P6") {
    fprintf(stderr, "%s: not a binary P6 PPM\n", path.c_str());
    return false;
  }
  auto next_int = [&f](int* out) {
    for (;;) {
      f >> std::ws;
      if (f.peek() == '#') {
        std::string line;
        std::getline(f, line);
        continue;
      }
      return bool(f >> *out);
    }
  };
  int maxval = 0;
  if (!next_int(w) || !next_int(h) || !next_int(&maxval) || maxval != 255) {
    fprintf(stderr, "%s: bad PPM header\n", path.c_str());
    return false;
  }
  f.get();  // single whitespace byte after maxval
  rgb->resize((size_t)(*h) * (*w) * 3);
  f.read(reinterpret_cast<char*>(rgb->data()), rgb->size());
  if ((size_t)f.gcount() != rgb->size()) {
    fprintf(stderr, "%s: truncated PPM payload\n", path.c_str());
    return false;
  }
  return true;
}

// "f.ppm" or "f.raw:HxW" (BGR raw, converted to RGB here).
bool LoadImageAny(const std::string& spec, int* h, int* w,
                  std::vector<uint8_t>* rgb) {
  size_t colon = spec.rfind(':');
  if (colon != std::string::npos &&
      sscanf(spec.c_str() + colon + 1, "%dx%d", h, w) == 2) {
    std::string path = spec.substr(0, colon);
    std::ifstream f(path, std::ios::binary);
    if (!f) {
      fprintf(stderr, "cannot open %s\n", path.c_str());
      return false;
    }
    std::vector<uint8_t> bgr((size_t)(*h) * (*w) * 3);
    f.read(reinterpret_cast<char*>(bgr.data()), bgr.size());
    if ((size_t)f.gcount() != bgr.size()) {
      fprintf(stderr, "%s: raw size mismatch (want %dx%dx3)\n", path.c_str(),
              *h, *w);
      return false;
    }
    rgb->resize(bgr.size());
    for (size_t i = 0; i < bgr.size(); i += 3) {
      (*rgb)[i + 0] = bgr[i + 2];
      (*rgb)[i + 1] = bgr[i + 1];
      (*rgb)[i + 2] = bgr[i + 0];
    }
    return true;
  }
  return LoadPPM(spec, h, w, rgb);
}

// RGB uint8 frame -> letterboxed [0,1] RGB float32 engine input (S x S x 3).
// hyt_letterbox is channel-order-agnostic, so feeding RGB yields RGB out.
void LetterboxToInput(const std::vector<uint8_t>& rgb, int h, int w, int S,
                      float* dst, float* r, float* dw, float* dh) {
  std::vector<float> boxed((size_t)S * S * 3);
  hyt_letterbox(rgb.data(), h, w, S, boxed.data(), r, dw, dh);
  for (size_t i = 0; i < boxed.size(); ++i) dst[i] = boxed[i] / 255.f;
}

// ---------------------------------------------------------------------------
// PJRT session: client + device + loaded executable, hot across frames.
// ---------------------------------------------------------------------------

struct Session {
  PJRT_Client* client = nullptr;
  PJRT_Device* device = nullptr;
  PJRT_LoadedExecutable* exe = nullptr;
  size_t num_outputs = 0;
};

PJRT_Buffer* Upload(const Session& s, const ArgSpec& spec, const void* data) {
  PJRT_Client_BufferFromHostBuffer_Args args;
  memset(&args, 0, sizeof(args));
  args.struct_size = PJRT_Client_BufferFromHostBuffer_Args_STRUCT_SIZE;
  args.client = s.client;
  args.data = data;
  args.type = spec.type;
  args.dims = spec.dims.data();
  args.num_dims = spec.dims.size();
  args.host_buffer_semantics =
      PJRT_HostBufferSemantics_kImmutableUntilTransferCompletes;
  args.device = s.device;
  CheckErr(g_api->PJRT_Client_BufferFromHostBuffer(&args), "BufferFromHost");
  AwaitAndDestroy(args.done_with_host_buffer, "Await(h2d)");
  return args.buffer;
}

// Executes once; fills `outputs` (destroying any previous buffers there).
// Returns device-complete wall ms.
double ExecuteOnce(const Session& s, const std::vector<PJRT_Buffer*>& inputs,
                   std::vector<PJRT_Buffer*>* outputs) {
  for (PJRT_Buffer* b : *outputs) DestroyBuffer(b);
  outputs->assign(s.num_outputs, nullptr);
  PJRT_Buffer** output_list = outputs->data();
  PJRT_Buffer* const* input_list = inputs.data();
  PJRT_ExecuteOptions opts;
  memset(&opts, 0, sizeof(opts));
  opts.struct_size = PJRT_ExecuteOptions_STRUCT_SIZE;
  PJRT_Event* done = nullptr;
  PJRT_LoadedExecutable_Execute_Args args;
  memset(&args, 0, sizeof(args));
  args.struct_size = PJRT_LoadedExecutable_Execute_Args_STRUCT_SIZE;
  args.executable = s.exe;
  args.options = &opts;
  args.argument_lists = &input_list;
  args.num_devices = 1;
  args.num_args = inputs.size();
  args.output_lists = &output_list;
  args.device_complete_events = &done;
  auto t0 = std::chrono::steady_clock::now();
  CheckErr(g_api->PJRT_LoadedExecutable_Execute(&args), "Execute");
  AwaitAndDestroy(done, "Await(exec)");
  return std::chrono::duration<double, std::milli>(
             std::chrono::steady_clock::now() - t0)
      .count();
}

std::vector<char> FetchOutput(PJRT_Buffer* buf, std::vector<int64_t>* dims_out) {
  if (dims_out) {
    PJRT_Buffer_Dimensions_Args dims;
    memset(&dims, 0, sizeof(dims));
    dims.struct_size = PJRT_Buffer_Dimensions_Args_STRUCT_SIZE;
    dims.buffer = buf;
    CheckErr(g_api->PJRT_Buffer_Dimensions(&dims), "Dimensions");
    dims_out->assign(dims.dims, dims.dims + dims.num_dims);
  }
  PJRT_Buffer_ToHostBuffer_Args th;
  memset(&th, 0, sizeof(th));
  th.struct_size = PJRT_Buffer_ToHostBuffer_Args_STRUCT_SIZE;
  th.src = buf;
  CheckErr(g_api->PJRT_Buffer_ToHostBuffer(&th), "ToHost(size)");
  std::vector<char> host(th.dst_size);
  th.dst = host.data();
  CheckErr(g_api->PJRT_Buffer_ToHostBuffer(&th), "ToHost(copy)");
  AwaitAndDestroy(th.event, "Await(d2h)");
  return host;
}

// Detector-engine (boxes, scores, classes, valid) JSON, letterbox-unmapped.
// Returns false if the output schema does not match.
bool PrintDetectionsJSON(const std::string& image,
                         const std::vector<std::vector<char>>& fetched,
                         float lb_r, float lb_dw, float lb_dh, double ms) {
  if (fetched.size() != 4 || fetched[0].size() % 16 != 0 ||
      fetched[0].size() / 16 != fetched[1].size() / 4) {
    return false;
  }
  // classes (int32) and valid (uint8) must also cover n slots — without
  // this a 4-output non-detector engine with coincidental box/score
  // shapes would be read out of bounds below.
  if (fetched[2].size() < (fetched[1].size() / 4) * 4 ||
      fetched[3].size() < fetched[1].size() / 4) {
    return false;
  }
  const float* boxes = reinterpret_cast<const float*>(fetched[0].data());
  const float* scores = reinterpret_cast<const float*>(fetched[1].data());
  const int32_t* classes = reinterpret_cast<const int32_t*>(fetched[2].data());
  const uint8_t* valid = reinterpret_cast<const uint8_t*>(fetched[3].data());
  const size_t n = fetched[1].size() / 4;
  printf("{\"image\": \"%s\", \"ms\": %.2f, \"detections\": [", image.c_str(),
         ms);
  int kept = 0;
  for (size_t i = 0; i < n; ++i) {
    if (!valid[i]) continue;
    const float x1 = (boxes[i * 4 + 0] - lb_dw) / lb_r;
    const float y1 = (boxes[i * 4 + 1] - lb_dh) / lb_r;
    const float x2 = (boxes[i * 4 + 2] - lb_dw) / lb_r;
    const float y2 = (boxes[i * 4 + 3] - lb_dh) / lb_r;
    printf("%s{\"cls\": %d, \"score\": %.4f, \"box\": [%.1f, %.1f, %.1f, %.1f]}",
           kept ? ", " : "", classes[i], scores[i], x1, y1, x2, y2);
    ++kept;
  }
  printf("]}\n");
  fflush(stdout);
  return true;
}

void PrintChecksumsJSON(const std::string& image,
                        const std::vector<std::vector<char>>& fetched,
                        double ms) {
  printf("{\"image\": \"%s\", \"ms\": %.2f, \"outputs\": [", image.c_str(), ms);
  for (size_t i = 0; i < fetched.size(); ++i) {
    double checksum = 0;
    const float* vals = reinterpret_cast<const float*>(fetched[i].data());
    for (size_t j = 0; j < fetched[i].size() / 4; ++j) checksum += vals[j];
    printf("%s%.4f", i ? ", " : "", checksum);
  }
  printf("]}\n");
  fflush(stdout);
}

}  // namespace

int main(int argc, char** argv) {
  if (argc < 3) {
    fprintf(stderr,
            "usage: %s <pjrt_plugin.so> <executable.bin> [input.meta] "
            "[image[.ppm|.raw] [HxW] | --serve]\n",
            argv[0]);
    return 2;
  }
  bool serve = false;
  for (int i = 3; i < argc; ++i) {
    if (strcmp(argv[i], "--serve") == 0) serve = true;
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
  fprintf(stderr, "PJRT api version: %d.%d (header %d.%d)\n",
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
  // PALLAS_AXON_TPU_GEN env (what the python sitecustomize keys on) is set.
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

  Session s;
  {
    PJRT_Client_Create_Args args;
    memset(&args, 0, sizeof(args));
    args.struct_size = PJRT_Client_Create_Args_STRUCT_SIZE;
    args.create_options = opts.empty() ? nullptr : opts.data();
    args.num_options = opts.size();
    CheckErr(g_api->PJRT_Client_Create(&args), "Client_Create");
    s.client = args.client;
  }
  {
    PJRT_Client_AddressableDevices_Args args;
    memset(&args, 0, sizeof(args));
    args.struct_size = PJRT_Client_AddressableDevices_Args_STRUCT_SIZE;
    args.client = s.client;
    CheckErr(g_api->PJRT_Client_AddressableDevices(&args), "AddressableDevices");
    if (args.num_addressable_devices == 0) {
      fprintf(stderr, "no addressable devices\n");
      return 1;
    }
    s.device = args.addressable_devices[0];
    fprintf(stderr, "devices: %zu\n", args.num_addressable_devices);
  }

  const std::string exe_bytes = ReadFile(argv[2]);
  {
    PJRT_Executable_DeserializeAndLoad_Args args;
    memset(&args, 0, sizeof(args));
    args.struct_size = PJRT_Executable_DeserializeAndLoad_Args_STRUCT_SIZE;
    args.client = s.client;
    args.serialized_executable = exe_bytes.data();
    args.serialized_executable_size = exe_bytes.size();
    CheckErr(g_api->PJRT_Executable_DeserializeAndLoad(&args),
             "DeserializeAndLoad");
    s.exe = args.loaded_executable;
    fprintf(stderr, "executable loaded: %zu bytes\n", exe_bytes.size());
  }
  {
    PJRT_LoadedExecutable_GetExecutable_Args ge;
    memset(&ge, 0, sizeof(ge));
    ge.struct_size = PJRT_LoadedExecutable_GetExecutable_Args_STRUCT_SIZE;
    ge.loaded_executable = s.exe;
    CheckErr(g_api->PJRT_LoadedExecutable_GetExecutable(&ge), "GetExecutable");
    PJRT_Executable_NumOutputs_Args no_args;
    memset(&no_args, 0, sizeof(no_args));
    no_args.struct_size = PJRT_Executable_NumOutputs_Args_STRUCT_SIZE;
    no_args.executable = ge.executable;
    CheckErr(g_api->PJRT_Executable_NumOutputs(&no_args), "NumOutputs");
    s.num_outputs = no_args.num_outputs;
  }

  std::vector<ArgSpec> specs =
      argc > 3 && argv[3][0] != '-' ? ParseMeta(argv[3])
                                    : std::vector<ArgSpec>();
  std::vector<std::vector<char>> host_data;
  for (const ArgSpec& s2 : specs) host_data.emplace_back(s2.bytes, 0);
  fprintf(stderr, "num inputs: %zu, num outputs: %zu\n", specs.size(),
          s.num_outputs);

  std::vector<PJRT_Buffer*> inputs;
  for (size_t si = 0; si < specs.size(); ++si)
    inputs.push_back(Upload(s, specs[si], host_data[si].data()));
  std::vector<PJRT_Buffer*> outputs;

  if (serve) {
    if (specs.empty()) {
      fprintf(stderr, "--serve needs an input.meta with the image argument\n");
      return 2;
    }
    const int S = (int)specs[0].dims[1];  // (1, S, S, 3)
    // Warm the engine before accepting traffic: execute AND fetch once —
    // on tunneled backends the execute event resolves lazily, and only a
    // d2h fetch forces the remote load/compile to actually finish.
    ExecuteOnce(s, inputs, &outputs);
    for (size_t i = 0; i < s.num_outputs; ++i) FetchOutput(outputs[i], nullptr);
    printf("ready\n");
    fflush(stdout);
    std::string line;
    while (std::getline(std::cin, line)) {
      if (line.empty()) continue;
      if (line == "quit" || line == "exit") break;
      int ih = 0, iw = 0;
      std::vector<uint8_t> rgb;
      if (!LoadImageAny(line, &ih, &iw, &rgb)) {
        printf("{\"image\": \"%s\", \"error\": \"load failed\"}\n", line.c_str());
        fflush(stdout);
        continue;
      }
      float lb_r, lb_dw, lb_dh;
      LetterboxToInput(rgb, ih, iw, S,
                       reinterpret_cast<float*>(host_data[0].data()), &lb_r,
                       &lb_dw, &lb_dh);
      DestroyBuffer(inputs[0]);
      inputs[0] = Upload(s, specs[0], host_data[0].data());
      // Time through the d2h fetch: on tunneled backends the
      // device-complete event can resolve before remote completion, so
      // ExecuteOnce's own number under-reports; the fetch is the
      // serving-visible latency anyway.
      const auto t0 = std::chrono::steady_clock::now();
      ExecuteOnce(s, inputs, &outputs);
      std::vector<std::vector<char>> fetched(s.num_outputs);
      for (size_t i = 0; i < s.num_outputs; ++i)
        fetched[i] = FetchOutput(outputs[i], nullptr);
      const double ms = std::chrono::duration<double, std::milli>(
                            std::chrono::steady_clock::now() - t0)
                            .count();
      if (!PrintDetectionsJSON(line, fetched, lb_r, lb_dw, lb_dh, ms))
        PrintChecksumsJSON(line, fetched, ms);
    }
    fprintf(stderr, "serve loop done\n");
    return 0;
  }

  // One-shot mode: optional image -> arg 0.
  float lb_r = 1.f, lb_dw = 0.f, lb_dh = 0.f;
  bool have_image = false;
  if (argc > 4 && !specs.empty()) {
    std::string spec = argv[4];
    if (argc > 5) spec += std::string(":") + argv[5];  // legacy "f.raw HxW"
    int ih = 0, iw = 0;
    std::vector<uint8_t> rgb;
    if (!LoadImageAny(spec, &ih, &iw, &rgb)) return 1;
    const int S = (int)specs[0].dims[1];
    LetterboxToInput(rgb, ih, iw, S,
                     reinterpret_cast<float*>(host_data[0].data()), &lb_r,
                     &lb_dw, &lb_dh);
    DestroyBuffer(inputs[0]);
    inputs[0] = Upload(s, specs[0], host_data[0].data());
    fprintf(stderr, "image %dx%d letterboxed to %d (r=%.4f pad %.1f,%.1f)\n",
            ih, iw, S, lb_r, lb_dw, lb_dh);
    have_image = true;
  }

  for (int iter = 0; iter < 3; ++iter) {
    const double ms = ExecuteOnce(s, inputs, &outputs);
    printf("iter %d: %.2f ms\n", iter, ms);
  }

  std::vector<std::vector<char>> fetched(s.num_outputs);
  for (size_t i = 0; i < s.num_outputs; ++i) {
    std::vector<int64_t> dims;
    fetched[i] = FetchOutput(outputs[i], &dims);
    double checksum = 0;
    const float* vals = reinterpret_cast<const float*>(fetched[i].data());
    for (size_t j = 0; j < fetched[i].size() / 4; ++j) checksum += vals[j];
    printf("output %zu: dims=[", i);
    for (size_t d = 0; d < dims.size(); ++d)
      printf("%s%lld", d ? "," : "", (long long)dims[d]);
    printf("] bytes=%zu checksum=%.4f\n", fetched[i].size(), checksum);
  }

  if (have_image) {
    PrintDetectionsJSON(argv[4], fetched, lb_r, lb_dw, lb_dh, 0.0);
  }

  printf("OK\n");
  return 0;
}
