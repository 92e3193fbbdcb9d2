// Fused banded-tap bilinear image resampling (the host half of the serving
// pipeline's letterbox stage).
//
// The Python loader computes jax.image.resize-"bilinear"-semantics taps
// (edgeml_tpu/data/loader.py _linear_taps: half-pixel centers, antialiased
// triangle kernel, renormalized rows) and hands them over; this kernel only
// evaluates them, so the native path is numerically the same resampling as
// the NumPy fallback — summation fused per output element instead of one
// pass per tap. Replaces the reference pipeline's host-side image prep
// (ultralytics letterbox / torchvision Resize, both C++ under the hood).
//
// Layout: images are HWC float32, contiguous. The row pass contracts the
// height taps (output (oh, w, c)); the column pass contracts the width taps
// per row with the tap loop innermost (span is 4-8). Rows of the output are
// partitioned over a small thread pool — on a many-core host the decode
// thread keeps up with one serving chip; on a 1-core box it degrades to the
// single-threaded fused loop, still several times faster than NumPy's
// per-tap full-plane passes.

#include <algorithm>
#include <cstdint>
#include <functional>
#include <thread>
#include <vector>

namespace {

void row_pass(const float* img, int64_t w, int64_t c, float* tmp, int64_t oh,
              const int32_t* jh, const float* wh, int span_h, int64_t r0,
              int64_t r1) {
  const int64_t line = w * c;
  for (int64_t o = r0; o < r1; ++o) {
    float* dst = tmp + o * line;
    const float w0 = wh[o * span_h];
    const float* src0 = img + (int64_t)jh[o * span_h] * line;
    for (int64_t i = 0; i < line; ++i) dst[i] = w0 * src0[i];
    for (int t = 1; t < span_h; ++t) {
      const float wt = wh[o * span_h + t];
      if (wt == 0.0f) continue;
      const float* src = img + (int64_t)jh[o * span_h + t] * line;
      for (int64_t i = 0; i < line; ++i) dst[i] += wt * src[i];
    }
  }
}

void col_pass(const float* tmp, int64_t w, int64_t c, float* out, int64_t ow,
              const int32_t* jw, const float* ww, int span_w, int64_t r0,
              int64_t r1) {
  for (int64_t o = r0; o < r1; ++o) {
    const float* row = tmp + o * w * c;
    float* dst = out + o * ow * c;
    if (c == 3) {  // RGB fast path: channel accumulators in registers
      for (int64_t x = 0; x < ow; ++x) {
        float a0 = 0.0f, a1 = 0.0f, a2 = 0.0f;
        for (int t = 0; t < span_w; ++t) {
          const float wt = ww[x * span_w + t];
          const float* s = row + (int64_t)jw[x * span_w + t] * 3;
          a0 += wt * s[0];
          a1 += wt * s[1];
          a2 += wt * s[2];
        }
        dst[x * 3] = a0;
        dst[x * 3 + 1] = a1;
        dst[x * 3 + 2] = a2;
      }
      continue;
    }
    for (int64_t x = 0; x < ow; ++x) {
      for (int64_t ch = 0; ch < c; ++ch) {
        float acc = 0.0f;
        for (int t = 0; t < span_w; ++t) {
          acc += ww[x * span_w + t] * row[(int64_t)jw[x * span_w + t] * c + ch];
        }
        dst[x * c + ch] = acc;
      }
    }
  }
}

void parallel_rows(int64_t rows, int nthreads,
                   const std::function<void(int64_t, int64_t)>& fn) {
  if (nthreads <= 1 || rows < 64) {
    fn(0, rows);
    return;
  }
  std::vector<std::thread> pool;
  int64_t chunk = (rows + nthreads - 1) / nthreads;
  for (int t = 0; t < nthreads; ++t) {
    int64_t r0 = t * chunk, r1 = std::min(rows, r0 + chunk);
    if (r0 >= r1) break;
    pool.emplace_back(fn, r0, r1);
  }
  for (auto& th : pool) th.join();
}

}  // namespace

extern "C" {

// img (h, w, c) f32 -> out (oh, ow, c) f32 using precomputed banded taps.
// scratch must hold oh * w * c floats. Returns 0 on success.
int resize_bilinear_f32(const float* img, int64_t h, int64_t w, int64_t c,
                        float* out, int64_t oh, int64_t ow,
                        const int32_t* jh, const float* wh, int span_h,
                        const int32_t* jw, const float* ww, int span_w,
                        float* scratch, int nthreads) {
  if (h <= 0 || w <= 0 || c <= 0 || oh <= 0 || ow <= 0) return 1;
  if (nthreads <= 0) {
    unsigned hc = std::thread::hardware_concurrency();
    nthreads = hc ? (int)std::min(hc, 8u) : 1;
  }
  parallel_rows(oh, nthreads, [&](int64_t r0, int64_t r1) {
    row_pass(img, w, c, scratch, oh, jh, wh, span_h, r0, r1);
  });
  parallel_rows(oh, nthreads, [&](int64_t r0, int64_t r1) {
    col_pass(scratch, w, c, out, ow, jw, ww, span_w, r0, r1);
  });
  return 0;
}
}
