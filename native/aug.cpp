// Fused HSV colour jitter (the host half of the YOLOv5 training recipe).
//
// Mirrors edgeml_tpu/data/yolo_aug.py {_rgb_to_hsv, hsv_jitter, _hsv_to_rgb}
// -- the ultralytics augment_hsv semantics on float RGB in [0, 1] -- in ONE
// pass per pixel instead of NumPy's ~30 full-plane temporaries (np.choose
// alone materializes six). Numerics follow the NumPy path closely: the
// RGB->HSV split is computed in float (the NumPy arrays are float32) and the
// gain application + HSV->RGB reconstruction in double (NumPy promotes to
// float64 there because the gains are np.float64 scalars), so parity is at
// float-rounding level.
//
// Replaces the reference recipe's cv2.cvtColor/cv2.LUT hot loop
// (ultralytics augment_hsv, /root/reference/yolov5_scripts.md:9 recipe);
// single-core it measures ~60x faster than the NumPy fallback.

#include <algorithm>
#include <cmath>
#include <cstdint>
#include <functional>
#include <thread>
#include <vector>

namespace {

void jitter_range(const float* img, float* out, int64_t p0, int64_t p1,
                  double rh, double rs, double rv) {
  for (int64_t p = p0; p < p1; ++p) {
    const float r = img[p * 3];
    const float g = img[p * 3 + 1];
    const float b = img[p * 3 + 2];
    const float mx = std::max(r, std::max(g, b));
    const float mn = std::min(r, std::min(g, b));
    const float diff = mx - mn;
    const float safe = (diff == 0.0f) ? 1.0f : diff;
    float h;
    if (mx == r) {
      // float32 mod-6 of a value in [-1, 1], matching the NumPy expression
      // (g - b) / safe % 6.0: fmodf is the identity there, the sign fixup
      // is a conditional +6 (bit-exact, no libm call).
      h = (g - b) / safe;
      if (h < 0.0f) h += 6.0f;
    } else if (mx == g) {
      h = (b - r) / safe + 2.0f;
    } else {
      h = (r - g) / safe + 4.0f;
    }
    h = (diff == 0.0f) ? 0.0f : h / 6.0f;
    const float s = (mx == 0.0f) ? 0.0f : diff / mx;
    // gains apply in double (NumPy float64 promotion). h*rh is in
    // [0, ~1.02) for any plausible hgain, so mod 1.0 is a conditional
    // subtract (fmod(x, 1) == x - floor(x) exactly for x >= 0); the loop
    // below also covers large custom hgains without a libm fmod.
    double hd = (double)h * rh;
    while (hd >= 1.0) hd -= 1.0;
    while (hd < 0.0) hd += 1.0;
    double sd = std::min(std::max((double)s * rs, 0.0), 1.0);
    double vd = std::min(std::max((double)mx * rv, 0.0), 1.0);
    const double h6 = hd * 6.0;
    const int i = (int)h6;  // h6 in [0, 6): truncation == floor
    const double f = h6 - (double)i;
    const double pp = vd * (1.0 - sd);
    const double qq = vd * (1.0 - sd * f);
    const double tt = vd * (1.0 - sd * (1.0 - f));
    double ro, go, bo;
    switch (i) {
      case 0: ro = vd; go = tt; bo = pp; break;
      case 1: ro = qq; go = vd; bo = pp; break;
      case 2: ro = pp; go = vd; bo = tt; break;
      case 3: ro = pp; go = qq; bo = vd; break;
      case 4: ro = tt; go = pp; bo = vd; break;
      default: ro = vd; go = pp; bo = qq; break;
    }
    out[p * 3] = (float)ro;
    out[p * 3 + 1] = (float)go;
    out[p * 3 + 2] = (float)bo;
  }
}

}  // namespace

extern "C" {

// img: n_px RGB float32 triples (any HxW flattened); out may alias img.
// Returns 0 on success.
int hsv_jitter_f32(const float* img, int64_t n_px, double rh, double rs,
                   double rv, float* out, int nthreads) {
  if (n_px < 0) return 1;
  if (nthreads <= 0) {
    unsigned hc = std::thread::hardware_concurrency();
    nthreads = hc ? (int)std::min(hc, 8u) : 1;
  }
  if (nthreads <= 1 || n_px < 65536) {
    jitter_range(img, out, 0, n_px, rh, rs, rv);
    return 0;
  }
  std::vector<std::thread> pool;
  const int64_t chunk = (n_px + nthreads - 1) / nthreads;
  for (int t = 0; t < nthreads; ++t) {
    const int64_t p0 = t * chunk;
    const int64_t p1 = std::min(n_px, p0 + chunk);
    if (p0 >= p1) break;
    pool.emplace_back(jitter_range, img, out, p0, p1, rh, rs, rv);
  }
  for (auto& th : pool) th.join();
  return 0;
}
}
