/* hyt: native host runtime for the hamer-yolo-tpu pipeline.
 *
 * C API over the host-side primitives the reference implements natively
 * (SURVEY.md 2.5): letterbox preprocessing, bilinear crops, YOLO decode +
 * greedy NMS (the cpp/norm C++ path), exposed as a shared library for
 * ctypes use and linked into the PJRT runner binary.
 */
#ifndef HYT_H_
#define HYT_H_

#include <stdint.h>

#ifdef __cplusplus
extern "C" {
#endif

/* Aspect-preserving letterbox: HWC uint8 BGR -> out_size x out_size x 3
 * float32, pad value 114, bilinear (cv2.INTER_LINEAR-compatible sampling:
 * src = (dst + 0.5) / r - 0.5). Returns the resize gain r and half-pads. */
void hyt_letterbox(const uint8_t* img, int h, int w, int out_size,
                   float* out, float* r, float* dw, float* dh);

/* Square crop centered at (cx, cy) of side `size`, bilinear, zero border,
 * output out_size x out_size x 3 float32 (channels kept in input order). */
void hyt_crop_bilinear(const float* img, int h, int w, float cx, float cy,
                       float size, int out_size, float* out);

/* Per-channel (x - 255*mean) / (255*std) in-place over HWC float32. */
void hyt_normalize(float* img, int h, int w, const float* mean,
                   const float* std_);

/* YOLO decode + class-aware greedy NMS.
 * pred: (n, 5 + nc) rows [cx cy w h obj cls...] (already grid-decoded).
 * Writes up to max_det rows [x1 y1 x2 y2 score cls] into out; returns the
 * number kept. Class offset trick (4096 * cls) unless agnostic. */
int hyt_nms(const float* pred, int n, int nc, float conf_thres,
            float iou_thres, int agnostic, int max_det, float* out);

#ifdef __cplusplus
}
#endif

#endif /* HYT_H_ */
