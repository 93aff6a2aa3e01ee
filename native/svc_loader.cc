// svc_loader — native host-side data loading for the training input pipeline.
//
// The per-item cost of a training batch is one 16-bit WAV decode plus five
// .npy reads (reference data pipeline: vits/data_utils.py:69-125, fed by 4
// torch DataLoader worker processes). This library does the same work with a
// C++ thread pool inside the trainer process: no worker processes, no pickle
// round-trips, buffers written straight into numpy-owned memory via ctypes.
//
// Exposed C ABI (see whisper_vits_svc_tpu/data/native_loader.py):
//   svc_load_wav      — RIFF/PCM16 (or float32) WAV -> float32 [-1, 1]
//   svc_load_npy_f32  — .npy (v1/v2/v3, '<f4' C-order) -> float32 buffer
//   svc_load_npy_many — thread-pooled batch of npy loads
//
// Build: make -C native   (g++ -O3 -shared -fPIC, no dependencies)

#include <atomic>
#include <cstdint>
#include <cstdio>
#include <cstring>
#include <string>
#include <thread>
#include <vector>

namespace {

struct FileBuf {
  std::vector<unsigned char> data;
  bool ok = false;
};

FileBuf read_file(const char* path) {
  FileBuf fb;
  FILE* f = std::fopen(path, "rb");
  if (!f) return fb;
  std::fseek(f, 0, SEEK_END);
  long size = std::ftell(f);
  std::fseek(f, 0, SEEK_SET);
  if (size < 0) {
    std::fclose(f);
    return fb;
  }
  fb.data.resize(static_cast<size_t>(size));
  size_t got = size ? std::fread(fb.data.data(), 1, fb.data.size(), f) : 0;
  std::fclose(f);
  fb.ok = got == fb.data.size();
  return fb;
}

uint32_t rd_u32(const unsigned char* p) {
  return static_cast<uint32_t>(p[0]) | (static_cast<uint32_t>(p[1]) << 8) |
         (static_cast<uint32_t>(p[2]) << 16) | (static_cast<uint32_t>(p[3]) << 24);
}

uint16_t rd_u16(const unsigned char* p) {
  return static_cast<uint16_t>(p[0]) | (static_cast<uint16_t>(p[1]) << 8);
}

}  // namespace

extern "C" {

// Returns 0 on success. out receives min(max_len, n_samples) mono samples in
// [-1, 1]; *out_len = full sample count, *out_sr = sample rate.
int svc_load_wav(const char* path, float* out, int64_t max_len,
                 int64_t* out_len, int32_t* out_sr) {
  FileBuf fb = read_file(path);
  if (!fb.ok || fb.data.size() < 44) return 1;
  const unsigned char* p = fb.data.data();
  if (std::memcmp(p, "RIFF", 4) != 0 || std::memcmp(p + 8, "WAVE", 4) != 0)
    return 2;

  size_t off = 12;
  uint16_t fmt = 0, channels = 0, bits = 0;
  uint32_t sr = 0;
  const unsigned char* payload = nullptr;
  uint32_t payload_size = 0;
  while (off + 8 <= fb.data.size()) {
    uint32_t chunk_size = rd_u32(p + off + 4);
    if (std::memcmp(p + off, "fmt ", 4) == 0 && off + 8 + 16 <= fb.data.size()) {
      fmt = rd_u16(p + off + 8);
      channels = rd_u16(p + off + 10);
      sr = rd_u32(p + off + 12);
      bits = rd_u16(p + off + 22);
    } else if (std::memcmp(p + off, "data", 4) == 0) {
      payload = p + off + 8;
      payload_size = chunk_size;
      if (off + 8 + payload_size > fb.data.size())
        payload_size = static_cast<uint32_t>(fb.data.size() - off - 8);
      break;
    }
    off += 8 + chunk_size + (chunk_size & 1);
  }
  if (!payload || channels == 0) return 3;

  int64_t n = 0;
  if (fmt == 1 && bits == 16) {
    n = payload_size / 2 / channels;
    int64_t take = n < max_len ? n : max_len;
    for (int64_t i = 0; i < take; ++i) {
      int32_t acc = 0;
      for (int c = 0; c < channels; ++c) {
        int16_t s = static_cast<int16_t>(rd_u16(payload + 2 * (i * channels + c)));
        acc += s;
      }
      out[i] = static_cast<float>(acc) / channels / 32768.0f;
    }
  } else if (fmt == 3 && bits == 32) {
    n = payload_size / 4 / channels;
    int64_t take = n < max_len ? n : max_len;
    for (int64_t i = 0; i < take; ++i) {
      float acc = 0.f;
      for (int c = 0; c < channels; ++c) {
        float v;
        std::memcpy(&v, payload + 4 * (i * channels + c), 4);
        acc += v;
      }
      out[i] = acc / channels;
    }
  } else {
    return 4;  // unsupported encoding
  }
  *out_len = n;
  *out_sr = static_cast<int32_t>(sr);
  return 0;
}

// .npy parser for little-endian float32 C-order arrays (any npy version).
// shape_out must hold 4 int64s; unused dims set to 1. Returns 0 on success;
// out receives min(max_elems, total) elements.
int svc_load_npy_f32(const char* path, float* out, int64_t max_elems,
                     int64_t* shape_out, int32_t* ndim_out) {
  FileBuf fb = read_file(path);
  if (!fb.ok || fb.data.size() < 10) return 1;
  const unsigned char* p = fb.data.data();
  if (std::memcmp(p, "\x93NUMPY", 6) != 0) return 2;
  int major = p[6];
  size_t header_len, header_off;
  if (major == 1) {
    header_len = rd_u16(p + 8);
    header_off = 10;
  } else {
    header_len = rd_u32(p + 8);
    header_off = 12;
  }
  if (header_off + header_len > fb.data.size()) return 3;
  std::string header(reinterpret_cast<const char*>(p + header_off), header_len);

  if (header.find("'<f4'") == std::string::npos &&
      header.find("\"<f4\"") == std::string::npos)
    return 4;  // not float32 LE
  if (header.find("'fortran_order': True") != std::string::npos) return 5;

  size_t sp = header.find("'shape':");
  if (sp == std::string::npos) return 6;
  size_t lp = header.find('(', sp);
  size_t rp = header.find(')', lp);
  if (lp == std::string::npos || rp == std::string::npos) return 6;
  std::string dims = header.substr(lp + 1, rp - lp - 1);

  int32_t ndim = 0;
  int64_t total = 1;
  for (size_t i = 0; i < 4; ++i) shape_out[i] = 1;
  const char* s = dims.c_str();
  while (*s && ndim < 4) {
    while (*s == ' ' || *s == ',') ++s;
    if (!*s) break;
    char* end;
    long long v = std::strtoll(s, &end, 10);
    if (end == s) break;
    shape_out[ndim++] = v;
    total *= v;
    s = end;
  }
  if (ndim == 0) {  // scalar
    ndim = 1;
    shape_out[0] = 1;
  }
  *ndim_out = ndim;

  size_t data_off = header_off + header_len;
  int64_t avail = static_cast<int64_t>((fb.data.size() - data_off) / 4);
  int64_t take = total < avail ? total : avail;
  if (take > max_elems) take = max_elems;
  std::memcpy(out, p + data_off, static_cast<size_t>(take) * 4);
  return 0;
}

// Thread-pooled batch npy load: n files into n caller-provided buffers.
// paths: array of n C strings; outs: array of n float* buffers;
// max_elems[i]: capacity of outs[i]; shapes: n*4 int64; ndims: n int32;
// status: n int32 (per-file return code). n_threads <= 0 -> hardware count.
void svc_load_npy_many(const char** paths, float** outs,
                       const int64_t* max_elems, int64_t* shapes,
                       int32_t* ndims, int32_t* status, int32_t n,
                       int32_t n_threads) {
  if (n_threads <= 0) {
    n_threads = static_cast<int32_t>(std::thread::hardware_concurrency());
    if (n_threads <= 0) n_threads = 4;
  }
  if (n_threads > n) n_threads = n;
  std::atomic<int32_t> next(0);
  auto worker = [&]() {
    while (true) {
      int32_t i = next.fetch_add(1);
      if (i >= n) return;
      status[i] = svc_load_npy_f32(paths[i], outs[i], max_elems[i],
                                   shapes + 4 * i, ndims + i);
    }
  };
  std::vector<std::thread> threads;
  for (int32_t t = 0; t < n_threads; ++t) threads.emplace_back(worker);
  for (auto& t : threads) t.join();
}

}  // extern "C"
