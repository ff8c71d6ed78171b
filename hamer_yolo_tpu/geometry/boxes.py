"""Bounding-box algebra (pure JAX, branchless / jit-safe).

Parity targets:
- xywh<->xyxy, box_iou, scale_coords/clip (reference yolov7/utils/general.py:260-345,447).
- ``expand_to_aspect_ratio`` (reference hamer/hamer/datasets/utils.py:15-34).
- ``process_bbox`` aspect-preserving expand (reference rootnet/preprocessing.py:167-188)
  and ``sanitize_bbox`` (:156-166).
- HaMeR bbox prep: rescaling factor 2.5, bbox-shape [192, 256]
  (reference hamer/infer.py:181-200).
"""
from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp


def xyxy2xywh(x: jax.Array) -> jax.Array:
    """(..., 4) corner boxes -> (cx, cy, w, h)."""
    cx = (x[..., 0] + x[..., 2]) / 2
    cy = (x[..., 1] + x[..., 3]) / 2
    w = x[..., 2] - x[..., 0]
    h = x[..., 3] - x[..., 1]
    return jnp.stack([cx, cy, w, h], axis=-1)


def xywh2xyxy(x: jax.Array) -> jax.Array:
    """(..., 4) center boxes -> (x1, y1, x2, y2)."""
    x1 = x[..., 0] - x[..., 2] / 2
    y1 = x[..., 1] - x[..., 3] / 2
    x2 = x[..., 0] + x[..., 2] / 2
    y2 = x[..., 1] + x[..., 3] / 2
    return jnp.stack([x1, y1, x2, y2], axis=-1)


def box_area(box: jax.Array) -> jax.Array:
    return (box[..., 2] - box[..., 0]) * (box[..., 3] - box[..., 1])


def box_iou(a: jax.Array, b: jax.Array) -> jax.Array:
    """Pairwise IoU between (N, 4) and (M, 4) xyxy boxes -> (N, M)."""
    lt = jnp.maximum(a[:, None, :2], b[None, :, :2])
    rb = jnp.minimum(a[:, None, 2:], b[None, :, 2:])
    wh = jnp.clip(rb - lt, 0.0, None)
    inter = wh[..., 0] * wh[..., 1]
    union = box_area(a)[:, None] + box_area(b)[None, :] - inter
    return inter / jnp.maximum(union, 1e-12)


def clip_boxes(boxes: jax.Array, img_hw: Tuple[jax.Array, jax.Array]) -> jax.Array:
    """Clip xyxy boxes to image (height, width)."""
    h, w = img_hw
    x1 = jnp.clip(boxes[..., 0], 0, w)
    y1 = jnp.clip(boxes[..., 1], 0, h)
    x2 = jnp.clip(boxes[..., 2], 0, w)
    y2 = jnp.clip(boxes[..., 3], 0, h)
    return jnp.stack([x1, y1, x2, y2], axis=-1)


def scale_coords(
    boxes: jax.Array,
    gain: jax.Array,
    pad_wh: jax.Array,
    orig_hw: Tuple[jax.Array, jax.Array],
) -> jax.Array:
    """Undo letterbox: map xyxy boxes from network-input frame to original frame.

    gain: scalar resize ratio, pad_wh: (2,) (dw, dh) one-sided padding.
    """
    x1 = (boxes[..., 0] - pad_wh[0]) / gain
    y1 = (boxes[..., 1] - pad_wh[1]) / gain
    x2 = (boxes[..., 2] - pad_wh[0]) / gain
    y2 = (boxes[..., 3] - pad_wh[1]) / gain
    return clip_boxes(jnp.stack([x1, y1, x2, y2], axis=-1), orig_hw)


def expand_to_aspect_ratio(wh: jax.Array, target_aspect: Tuple[float, float]) -> jax.Array:
    """Grow (..., 2) box (w, h) minimally to reach target aspect w_t:h_t.

    Branchless equivalent of reference datasets/utils.py:15-34.
    """
    w, h = wh[..., 0], wh[..., 1]
    w_t, h_t = float(target_aspect[0]), float(target_aspect[1])
    too_wide = (h / jnp.maximum(w, 1e-12)) < (h_t / w_t)
    h_new = jnp.where(too_wide, jnp.maximum(w * h_t / w_t, h), h)
    w_new = jnp.where(too_wide, w, jnp.maximum(h * w_t / h_t, w))
    return jnp.stack([w_new, h_new], axis=-1)


def hamer_box_params(
    bbox_xyxy: jax.Array,
    rescale_factor: float = 2.5,
    bbox_shape: Tuple[float, float] = (192.0, 256.0),
) -> Tuple[jax.Array, jax.Array]:
    """Detector box -> (center (..., 2), square crop size (...,)) for HaMeR.

    Mirrors reference infer.py:181-200: scale = rescale * wh / 200, then
    expand scale*200 to aspect [192, 256] and take the max side.
    """
    center = jnp.stack(
        [
            (bbox_xyxy[..., 0] + bbox_xyxy[..., 2]) / 2.0,
            (bbox_xyxy[..., 1] + bbox_xyxy[..., 3]) / 2.0,
        ],
        axis=-1,
    )
    wh = jnp.stack(
        [
            bbox_xyxy[..., 2] - bbox_xyxy[..., 0],
            bbox_xyxy[..., 3] - bbox_xyxy[..., 1],
        ],
        axis=-1,
    )
    expanded = expand_to_aspect_ratio(rescale_factor * wh, bbox_shape)
    size = jnp.max(expanded, axis=-1)
    return center, size


def track_boxes_from_keypoints(
    kp2d: jax.Array,
    valid: jax.Array,
    orig_hw: jax.Array,
    expand: float = 1.3,
    min_size: float = 32.0,
) -> jax.Array:
    """Detector-shaped xyxy boxes from a previous frame's projected 2D
    keypoints — the detect-skip tracking primitive.

    The reference re-runs its detector on every video frame
    (yolo/detector.py:35-104 webcam loop); a TPU-native serving loop can
    instead refresh detections every K-th tick and, in between, derive
    each slot's box from the PREVIOUS tick's predicted full-image 2D
    keypoints (pipeline output ``keypoints_2d``): the 21-joint extent
    covers wrist..fingertips, so its bbox tracks the moving hand. The
    ``expand`` margin absorbs inter-frame motion; ``min_size`` guards
    degenerate keypoint collapses.

    kp2d: (S, 21, 2) full-image pixel keypoints; valid: (S,) bool/0-1;
    orig_hw: (2,) (height, width). Returns (S, 4) rounded, frame-clipped
    xyxy with invalid slots zeroed — the same shape/rounding contract as
    ``detect_hands`` boxes, so the boxes-driven pipeline
    (frame.infer_frames_tracked) consumes them unchanged.
    """
    lo = jnp.min(kp2d, axis=-2)                      # (S, 2)
    hi = jnp.max(kp2d, axis=-2)
    center = (lo + hi) / 2.0
    wh = jnp.maximum((hi - lo) * expand, min_size)   # (S, 2)
    xyxy = jnp.concatenate([center - wh / 2.0, center + wh / 2.0], axis=-1)
    xyxy = jnp.round(clip_boxes(xyxy, (orig_hw[0], orig_hw[1])))
    return xyxy * valid.astype(xyxy.dtype)[..., None]


def sanitize_bbox_xywh(
    bbox: jax.Array, img_w: jax.Array, img_h: jax.Array
) -> Tuple[jax.Array, jax.Array]:
    """Clamp an xywh box into the image; returns (box, valid mask).

    Branchless version of reference preprocessing.py:156-166 (which returns
    None for degenerate boxes — here encoded as valid=False).
    """
    x, y, w, h = bbox[..., 0], bbox[..., 1], bbox[..., 2], bbox[..., 3]
    x1 = jnp.maximum(0.0, x)
    y1 = jnp.maximum(0.0, y)
    x2 = jnp.minimum(img_w - 1.0, x1 + jnp.maximum(0.0, w - 1.0))
    y2 = jnp.minimum(img_h - 1.0, y1 + jnp.maximum(0.0, h - 1.0))
    valid = (w * h > 0) & (x2 > x1) & (y2 > y1)
    return jnp.stack([x1, y1, x2 - x1, y2 - y1], axis=-1), valid


def process_bbox(
    bbox_xywh: jax.Array,
    img_w: jax.Array,
    img_h: jax.Array,
    input_hw: Tuple[float, float] = (256.0, 256.0),
    ratio: float = 1.5,
) -> Tuple[jax.Array, jax.Array]:
    """RootNet bbox prep: sanitize, force aspect, pad by ratio.

    Reference preprocessing.py:167-188 (input_img_shape (256, 256), ratio 1.5
    per Model_RGB.py:596). Returns ((..., 4) xywh, valid mask).
    """
    bbox, valid = sanitize_bbox_xywh(bbox_xywh, img_w, img_h)
    w, h = bbox[..., 2], bbox[..., 3]
    c_x = bbox[..., 0] + w / 2.0
    c_y = bbox[..., 1] + h / 2.0
    aspect = float(input_hw[1]) / float(input_hw[0])
    h_new = jnp.where(w > aspect * h, w / aspect, h)
    w_new = jnp.where(w < aspect * h, h * aspect, w)
    w_out = w_new * ratio
    h_out = h_new * ratio
    out = jnp.stack([c_x - w_out / 2.0, c_y - h_out / 2.0, w_out, h_out], axis=-1)
    return out, valid
