// combat_io: native host-side data pipeline for COMBAT-TPU.
//
// The reference feeds the GPU through 6-40 DataLoader worker *processes*
// (reference utils/dataloader.py:120-122).  On TPU the dataset lives in HBM,
// so the only host-side work left is the one-time decode/normalize at
// startup and (for datasets too big for HBM) per-epoch host gathers.  This
// library does that work in native code with std::thread parallelism:
//
//   * decode of the CIFAR-10 *binary* layout (cifar-10-batches-bin: 10000
//     records of [1 label byte][3072 CHW pixel bytes] per file) straight
//     into NHWC float32 in [-1, 1],
//   * uint8 -> float32 affine normalization (y = x*scale + bias),
//   * float32 batch gather (rows by index) for host-resident datasets.
//
// Exposed as a plain C ABI consumed via ctypes (no pybind11 in this image);
// every entry point has a pure-numpy fallback in python (native/__init__.py).

#include <cstdint>
#include <cstdio>
#include <cstring>
#include <thread>
#include <vector>

namespace {

int resolve_threads(int n_threads) {
  if (n_threads > 0) return n_threads;
  unsigned hw = std::thread::hardware_concurrency();
  return hw ? static_cast<int>(hw) : 1;
}

// Run fn(begin, end) over [0, total) split across threads.
template <typename F>
void parallel_for(int64_t total, int n_threads, F fn) {
  n_threads = resolve_threads(n_threads);
  if (n_threads <= 1 || total < (1 << 16)) {
    fn(static_cast<int64_t>(0), total);
    return;
  }
  std::vector<std::thread> pool;
  int64_t chunk = (total + n_threads - 1) / n_threads;
  for (int t = 0; t < n_threads; ++t) {
    int64_t begin = t * chunk;
    int64_t end = begin + chunk < total ? begin + chunk : total;
    if (begin >= end) break;
    pool.emplace_back([=] { fn(begin, end); });
  }
  for (auto& th : pool) th.join();
}

}  // namespace

extern "C" {

// y[i] = x[i] * scale + bias  (uint8 -> float32)
void normalize_u8_f32(const uint8_t* src, float* dst, int64_t n, float scale,
                      float bias, int n_threads) {
  parallel_for(n, n_threads, [=](int64_t begin, int64_t end) {
    for (int64_t i = begin; i < end; ++i)
      dst[i] = static_cast<float>(src[i]) * scale + bias;
  });
}

// Gather rows: out[i] = data[idx[i]] where each row is `row_elems` floats.
void gather_rows_f32(const float* data, const int64_t* idx, float* out,
                     int64_t n_rows, int64_t row_elems, int n_threads) {
  parallel_for(n_rows, n_threads, [=](int64_t begin, int64_t end) {
    for (int64_t i = begin; i < end; ++i)
      std::memcpy(out + i * row_elems, data + idx[i] * row_elems,
                  sizeof(float) * row_elems);
  });
}

// Decode one CIFAR-10 binary batch file (10000 x [label u8, 3072 CHW u8])
// into NHWC float32 [-1, 1] images + int32 labels.  Returns the number of
// records decoded, or -1 on IO error.
int64_t decode_cifar10_bin(const char* path, float* images /*N*32*32*3*/,
                           int32_t* labels /*N*/, int64_t max_records,
                           int n_threads) {
  FILE* f = std::fopen(path, "rb");
  if (!f) return -1;
  std::fseek(f, 0, SEEK_END);
  int64_t bytes = std::ftell(f);
  std::fseek(f, 0, SEEK_SET);
  const int64_t rec = 1 + 3 * 32 * 32;
  int64_t n = bytes / rec;
  if (n > max_records) n = max_records;
  std::vector<uint8_t> buf(static_cast<size_t>(n * rec));
  if (std::fread(buf.data(), 1, static_cast<size_t>(n * rec), f) !=
      static_cast<size_t>(n * rec)) {
    std::fclose(f);
    return -1;
  }
  std::fclose(f);
  const float scale = 2.0f / 255.0f;
  parallel_for(n, n_threads, [&](int64_t begin, int64_t end) {
    for (int64_t i = begin; i < end; ++i) {
      const uint8_t* r = buf.data() + i * rec;
      labels[i] = static_cast<int32_t>(r[0]);
      const uint8_t* chw = r + 1;
      float* img = images + i * 3 * 32 * 32;
      // CHW u8 -> HWC f32 in [-1, 1]
      for (int c = 0; c < 3; ++c)
        for (int p = 0; p < 32 * 32; ++p)
          img[p * 3 + c] = static_cast<float>(chw[c * 32 * 32 + p]) * scale - 1.0f;
    }
  });
  return n;
}

}  // extern "C"
