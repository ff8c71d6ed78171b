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

namespace {
// round-half-to-even, matching Python round()/jnp.round
inline double round_he(double v) { return std::nearbyint(v); }
}  // namespace

void hyt_letterbox(const uint8_t* img, int h, int w, int out_size,
                   float* out, float* r_out, float* dw_out, float* dh_out) {
  // cv2-letterbox-EXACT geometry (reference general.py:999-1029,
  // auto=True stride 32), rect content TOP-LEFT aligned in the square
  // canvas — mirrors geometry/affine.letterbox_geometry_traced.
  const double r = std::min(static_cast<double>(out_size) / h,
                            static_cast<double>(out_size) / w);
  const double new_w = round_he(w * r);
  const double new_h = round_he(h * r);
  const double dw_total = std::fmod(out_size - new_w, 32.0);
  const double dh_total = std::fmod(out_size - new_h, 32.0);
  const double left = round_he(dw_total / 2.0 - 0.1);
  const double top = round_he(dh_total / 2.0 - 0.1);
  const double rect_w = new_w + dw_total;
  const double rect_h = new_h + dh_total;
  const double gain = std::min(rect_h / h, rect_w / w);
  *r_out = static_cast<float>(gain);
  *dw_out = static_cast<float>((rect_w - w * gain) / 2.0);
  *dh_out = static_cast<float>((rect_h - h * gain) / 2.0);

  const double sx_scale = w / new_w;
  const double sy_scale = h / new_h;
  for (int oy = 0; oy < out_size; ++oy) {
    for (int ox = 0; ox < out_size; ++ox) {
      const bool inside = ox >= left && ox < left + new_w &&
                          oy >= top && oy < top + new_h;
      float* dst = out + (oy * out_size + ox) * 3;
      if (!inside) {
        dst[0] = dst[1] = dst[2] = 114.f;
        continue;
      }
      const float sx = std::clamp(
          static_cast<float>((ox - left + 0.5) * sx_scale - 0.5), 0.f,
          static_cast<float>(w - 1));
      const float sy = std::clamp(
          static_cast<float>((oy - top + 0.5) * sy_scale - 0.5), 0.f,
          static_cast<float>(h - 1));
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
        const float top_v = tap(y0, x0) * (1.f - wx) + tap(y0, x0 + 1) * wx;
        const float bot_v = tap(y0 + 1, x0) * (1.f - wx) + tap(y0 + 1, x0 + 1) * wx;
        // cv2.resize emits uint8: snap to the integer grid.
        dst[c] = std::nearbyint(top_v * (1.f - wy) + bot_v * wy);
      }
    }
  }
}

void hyt_crop_bilinear(const float* img, int h, int w, float cx, float cy,
                       float size, int out_size, float* out) {
  // src = (o - out/2) * (size / out) + c  (same rule as warp_matmul.py),
  // with cv2.warpAffine parity: 1/32-px coordinate quantization
  // (INTER_BITS=5) + uint8 output rounding.
  const float scale = size / out_size;
  for (int oy = 0; oy < out_size; ++oy) {
    for (int ox = 0; ox < out_size; ++ox) {
      // cv2.warpAffine (8U) coordinate model: round to the 1/128
      // interpolation grid (measured; see warp_matmul.py).
      const float sx =
          std::nearbyint(((ox - out_size / 2.f) * scale + cx) * 128.f) / 128.f;
      const float sy =
          std::nearbyint(((oy - out_size / 2.f) * scale + cy) * 128.f) / 128.f;
      float* dst = out + (oy * out_size + ox) * 3;
      for (int c = 0; c < 3; ++c) {
        // uint8 rounding: (acc + (1<<21)) >> 22 == round-half-up
        dst[c] = std::floor(sample_bilinear(img, h, w, 3, sx, sy, c, 0.f) + 0.5f);
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
