// Host-side image primitives (letterbox / crop / normalize).
//
// Native equivalent of the reference's C++ TRT runner preprocessing
// (TensorRT-For-YOLO-Series cpp/end2end/main.cpp letterbox) re-derived
// for this framework's geometry: identical sampling rule to
// pipeline/preprocess.py so host and device paths agree bit-for-bit up to
// FMA ordering.

#include "hyt.h"

#include <algorithm>
#include <cmath>
#include <cstring>

namespace {

inline float sample_bilinear(const float* img, int h, int w, int c_stride,
                             float x, float y, int c, float border) {
  const int x0 = static_cast<int>(std::floor(x));
  const int y0 = static_cast<int>(std::floor(y));
  const float wx = x - x0;
  const float wy = y - y0;
  auto tap = [&](int yy, int xx) -> float {
    if (xx < 0 || xx >= w || yy < 0 || yy >= h) return border;
    return img[(yy * w + xx) * c_stride + c];
  };
  const float top = tap(y0, x0) * (1.f - wx) + tap(y0, x0 + 1) * wx;
  const float bot = tap(y0 + 1, x0) * (1.f - wx) + tap(y0 + 1, x0 + 1) * wx;
  return top * (1.f - wy) + bot * wy;
}

}  // namespace

extern "C" {

void hyt_letterbox(const uint8_t* img, int h, int w, int out_size,
                   float* out, float* r_out, float* dw_out, float* dh_out) {
  const float r = std::min(static_cast<float>(out_size) / h,
                           static_cast<float>(out_size) / w);
  const float new_w = w * r;
  const float new_h = h * r;
  const float dw = (out_size - new_w) / 2.f;
  const float dh = (out_size - new_h) / 2.f;
  *r_out = r;
  *dw_out = dw;
  *dh_out = dh;

  for (int oy = 0; oy < out_size; ++oy) {
    for (int ox = 0; ox < out_size; ++ox) {
      const bool inside = ox >= std::floor(dw) && ox < std::ceil(out_size - dw) &&
                          oy >= std::floor(dh) && oy < std::ceil(out_size - dh);
      float* dst = out + (oy * out_size + ox) * 3;
      if (!inside) {
        dst[0] = dst[1] = dst[2] = 114.f;
        continue;
      }
      const float sx = (ox - dw + 0.5f) / r - 0.5f;
      const float sy = (oy - dh + 0.5f) / r - 0.5f;
      for (int c = 0; c < 3; ++c) {
        // uint8 source; promote taps inline.
        const int x0 = static_cast<int>(std::floor(sx));
        const int y0 = static_cast<int>(std::floor(sy));
        const float wx = sx - x0;
        const float wy = sy - y0;
        auto tap = [&](int yy, int xx) -> float {
          xx = std::clamp(xx, 0, w - 1);  // resize clamps at edges (cv2)
          yy = std::clamp(yy, 0, h - 1);
          return static_cast<float>(img[(yy * w + xx) * 3 + c]);
        };
        const float top = tap(y0, x0) * (1.f - wx) + tap(y0, x0 + 1) * wx;
        const float bot = tap(y0 + 1, x0) * (1.f - wx) + tap(y0 + 1, x0 + 1) * wx;
        dst[c] = top * (1.f - wy) + bot * wy;
      }
    }
  }
}

void hyt_crop_bilinear(const float* img, int h, int w, float cx, float cy,
                       float size, int out_size, float* out) {
  // src = (o - out/2) * (size / out) + c  (same rule as warp_matmul.py).
  const float scale = size / out_size;
  for (int oy = 0; oy < out_size; ++oy) {
    for (int ox = 0; ox < out_size; ++ox) {
      const float sx = (ox - out_size / 2.f) * scale + cx;
      const float sy = (oy - out_size / 2.f) * scale + cy;
      float* dst = out + (oy * out_size + ox) * 3;
      for (int c = 0; c < 3; ++c) {
        dst[c] = sample_bilinear(img, h, w, 3, sx, sy, c, 0.f);
      }
    }
  }
}

void hyt_normalize(float* img, int h, int w, const float* mean,
                   const float* std_) {
  const int n = h * w;
  for (int i = 0; i < n; ++i) {
    for (int c = 0; c < 3; ++c) {
      img[i * 3 + c] = (img[i * 3 + c] - 255.f * mean[c]) / (255.f * std_[c]);
    }
  }
}

}  // extern "C"
