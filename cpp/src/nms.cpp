// YOLO decode + greedy NMS (host-side C++ path).
//
// Equivalent of the reference's cpp/norm CPU decode+NMS
// (TensorRT-For-YOLO-Series cpp/norm/yolo.hpp) re-expressed for decoded
// predictions; semantics match utils/general.py:611-706 and the
// Pallas/XLA device kernels (ops/nms.py).

#include "hyt.h"

#include <algorithm>
#include <cmath>
#include <numeric>
#include <vector>

namespace {

struct Det {
  float x1, y1, x2, y2, score;
  int cls;
};

inline float iou(const Det& a, const Det& b, float offset_a, float offset_b) {
  const float ax1 = a.x1 + offset_a, ay1 = a.y1, ax2 = a.x2 + offset_a, ay2 = a.y2;
  const float bx1 = b.x1 + offset_b, by1 = b.y1, bx2 = b.x2 + offset_b, by2 = b.y2;
  const float ix1 = std::max(ax1, bx1);
  const float iy1 = std::max(ay1, by1);
  const float ix2 = std::min(ax2, bx2);
  const float iy2 = std::min(ay2, by2);
  const float inter = std::max(ix2 - ix1, 0.f) * std::max(iy2 - iy1, 0.f);
  const float area_a = (ax2 - ax1) * (ay2 - ay1);
  const float area_b = (bx2 - bx1) * (by2 - by1);
  return inter / std::max(area_a + area_b - inter, 1e-12f);
}

}  // namespace

extern "C" {

int hyt_nms(const float* pred, int n, int nc, float conf_thres,
            float iou_thres, int agnostic, int max_det, float* out) {
  std::vector<Det> cands;
  cands.reserve(256);
  const int no = 5 + nc;
  for (int i = 0; i < n; ++i) {
    const float* row = pred + i * no;
    const float obj = row[4];
    if (obj <= conf_thres) continue;
    float best = -1.f;
    int cls = 0;
    if (nc == 1) {
      best = obj;
    } else {
      for (int c = 0; c < nc; ++c) {
        const float s = row[5 + c] * obj;
        if (s > best) {
          best = s;
          cls = c;
        }
      }
    }
    if (best <= conf_thres) continue;
    Det d;
    d.x1 = row[0] - row[2] / 2.f;
    d.y1 = row[1] - row[3] / 2.f;
    d.x2 = row[0] + row[2] / 2.f;
    d.y2 = row[1] + row[3] / 2.f;
    d.score = best;
    d.cls = cls;
    cands.push_back(d);
  }
  std::stable_sort(cands.begin(), cands.end(),
                   [](const Det& a, const Det& b) { return a.score > b.score; });

  std::vector<char> suppressed(cands.size(), 0);
  int kept = 0;
  for (size_t i = 0; i < cands.size() && kept < max_det; ++i) {
    if (suppressed[i]) continue;
    const float off_i = agnostic ? 0.f : cands[i].cls * 4096.f;
    float* dst = out + kept * 6;
    dst[0] = cands[i].x1;
    dst[1] = cands[i].y1;
    dst[2] = cands[i].x2;
    dst[3] = cands[i].y2;
    dst[4] = cands[i].score;
    dst[5] = static_cast<float>(cands[i].cls);
    ++kept;
    for (size_t j = i + 1; j < cands.size(); ++j) {
      if (suppressed[j]) continue;
      const float off_j = agnostic ? 0.f : cands[j].cls * 4096.f;
      if (iou(cands[i], cands[j], off_i, off_j) > iou_thres) suppressed[j] = 1;
    }
  }
  return kept;
}

}  // extern "C"
