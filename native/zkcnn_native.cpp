// Native runtime helpers for zkcnn_tpu.
//
// The TPU compute path is JAX/XLA; these C++ kernels cover the
// host-side circuit-builder hot paths, where the reference is also
// C++ (reference src/neuralNetwork.cpp gate-emission loops and
// src/circuit.cpp:4-88 subset compaction):
//   * naive-convolution bin-gate emission (vgg-scale models emit
//     hundreds of millions of gates; Python/numpy intermediates are
//     the bottleneck, not the TPU),
//   * first-appearance subset compaction (order-preserving dedup),
//   * whitespace/comma csv loading for the demo data format
//     (reference README.md:34-58).
//
// Exposed with a plain C ABI consumed via ctypes (no pybind11).

#include <cstdint>
#include <cstdio>
#include <cstdlib>
#include <cstring>
#include <vector>

extern "C" {

// Emit naive-conv bin gates (reference naiveConvLayerFast,
// src/neuralNetwork.cpp:254-282). Returns count written; out buffers
// must have room for pic*co*ci*ox*oy*m*m entries.
int64_t emit_nconv_gates(
    int64_t pic, int64_t co, int64_t ci,
    int64_t nx_in, int64_t ny_in, int64_t m,
    int64_t padding, int64_t log_stride,
    int64_t first_conv_id, int64_t l_code,
    int64_t* out_g, int64_t* out_u, int64_t* out_v,
    int64_t* out_sc, int64_t* out_l) {
  const int64_t L = -padding;
  const int64_t st = int64_t(1) << log_stride;
  const int64_t nx_out = ((nx_in + 2 * padding - m) >> log_stride) + 1;
  const int64_t ny_out = ((ny_in + 2 * padding - m) >> log_stride) + 1;
  int64_t k = 0;
  for (int64_t p = 0; p < pic; ++p)
    for (int64_t o = 0; o < co; ++o)
      for (int64_t c = 0; c < ci; ++c)
        for (int64_t xi = 0; xi < nx_out; ++xi)
          for (int64_t yi = 0; yi < ny_out; ++yi) {
            const int64_t x = L + xi * st, y = L + yi * st;
            const int64_t g =
                ((p * co + o) * nx_out + xi) * ny_out + yi;
            for (int64_t tx = x; tx < x + m; ++tx)
              for (int64_t ty = y; ty < y + m; ++ty) {
                if (tx < 0 || tx >= nx_in || ty < 0 || ty >= ny_in)
                  continue;
                out_g[k] = g;
                out_u[k] = ((p * ci + c) * nx_in + tx) * ny_in + ty;
                out_v[k] = first_conv_id +
                           ((o * ci + c) * m + (tx - x)) * m + (ty - y);
                out_sc[k] = 0;
                out_l[k] = l_code;
                ++k;
              }
          }
  return k;
}

// First-appearance subset compaction (reference initSubset,
// src/circuit.cpp:16-47): remap ids to dense indices in order of first
// appearance. ori_out gets the original id per subset slot; remap_out
// the slot per input element. Returns subset size. visited/aux must be
// an int64 array of `universe` elements initialized to -1 by the
// caller (reusable across layers).
int64_t subset_compact(const int64_t* ids, int64_t n,
                       int64_t* visited, int64_t universe,
                       int64_t* ori_out, int64_t* remap_out) {
  int64_t cnt = 0;
  for (int64_t i = 0; i < n; ++i) {
    const int64_t id = ids[i];
    if (id < 0 || id >= universe) return -1;
    if (visited[id] < 0) {
      visited[id] = cnt;
      ori_out[cnt] = id;
      ++cnt;
    }
    remap_out[i] = visited[id];
  }
  // reset for reuse
  for (int64_t s = 0; s < cnt; ++s) visited[ori_out[s]] = -1;
  return cnt;
}

// Fast numeric loader: whitespace/comma separated doubles.
// Returns count parsed (up to cap).
int64_t csv_load(const char* path, double* out, int64_t cap) {
  FILE* f = fopen(path, "rb");
  if (!f) return -1;
  fseek(f, 0, SEEK_END);
  long sz = ftell(f);
  fseek(f, 0, SEEK_SET);
  std::vector<char> buf(sz + 1);
  if (fread(buf.data(), 1, sz, f) != (size_t)sz) { fclose(f); return -1; }
  fclose(f);
  buf[sz] = 0;
  for (long i = 0; i < sz; ++i)
    if (buf[i] == ',') buf[i] = ' ';
  int64_t k = 0;
  char* p = buf.data();
  char* end = p + sz;
  while (p < end && k < cap) {
    char* q;
    double v = strtod(p, &q);
    if (q == p) { ++p; continue; }
    out[k++] = v;
    p = q;
  }
  return k;
}

}  // extern "C"
