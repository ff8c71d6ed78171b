"""Batched class-aware NMS with fixed-capacity outputs (jit-safe).

Replaces the reference's dynamic-shape pipeline
(yolov7/utils/general.py:611-706: conf filter -> conf=obj*cls ->
xywh->xyxy -> class filter -> class-offset trick -> torchvision.ops.nms
-> max_det cap) with a fully static masked formulation:

1. score = obj * cls (single-class models keep obj, general.py:653-656);
2. best-class selection (multi_label=False path);
3. class whitelist and conf threshold become score masks;
4. top-K candidate selection (K = ``max_nms_static``, default 512 — the
   reference's 30000 cap is a CPU-side guard; 512 covers the per-frame
   candidate count of every pipeline config at conf 0.25);
5. greedy suppression as a sequential scan over the K sorted candidates
   with an O(K^2) IoU matrix computed once — a TPU-friendly formulation:
   one (K, K) matmul-shaped mask update per step instead of data-dependent
   loops;
6. outputs padded to ``max_det`` (reference max_det=300) with a validity
   mask.

The class-offset trick (general.py:685-687) is reproduced exactly:
agnostic=False adds cls * 4096 to box coordinates before IoU so boxes of
different classes never suppress each other.
"""
from __future__ import annotations

from functools import partial
from typing import NamedTuple, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp

from hamer_yolo_tpu.geometry.boxes import box_iou, xywh2xyxy

MAX_WH = 4096.0  # class-offset multiplier (general.py:624)


class NmsOutput(NamedTuple):
    boxes: jax.Array  # (B, max_det, 4) xyxy in input-pixel space
    scores: jax.Array  # (B, max_det)
    classes: jax.Array  # (B, max_det) int32
    valid: jax.Array  # (B, max_det) bool


def _greedy_suppress(iou: jax.Array, active: jax.Array, iou_thres: float) -> jax.Array:
    """Sequential greedy NMS over score-sorted candidates.

    iou: (K, K) symmetric IoU of sorted candidates; active: (K,) validity.
    Returns keep mask (K,). Row i suppresses lower-scored j>i when
    iou > thres, matching torchvision tie-breaking (sorted order stable).
    """
    K = iou.shape[0]
    sup = iou > iou_thres

    def body(carry, i):
        alive = carry
        keep_i = alive[i] & active[i]
        # Suppress all j with iou(i, j) > thres (j > i by masking upper tri).
        kill = keep_i & sup[i]
        alive = alive & (~kill | jax.nn.one_hot(i, K, dtype=bool))
        return alive, keep_i

    alive0 = jnp.ones((K,), bool)
    _, keep = jax.lax.scan(body, alive0, jnp.arange(K))
    return keep


def _use_pallas_default() -> bool:
    try:
        return jax.devices()[0].platform in ("tpu", "axon")
    except Exception:
        return False


@partial(jax.jit, static_argnames=("max_det", "max_nms_static", "agnostic",
                                  "classes", "use_pallas", "merge",
                                  "redundant"))
def non_max_suppression(
    prediction: jax.Array,
    conf_thres: float = 0.25,
    iou_thres: float = 0.45,
    classes: Optional[Tuple[int, ...]] = None,
    agnostic: bool = False,
    max_det: int = 300,
    max_nms_static: int = 512,
    use_pallas: Optional[bool] = None,
    merge: bool = False,
    redundant: bool = True,
) -> NmsOutput:
    """prediction: (B, N, 5 + nc) decoded xywh + obj + cls scores.

    ``merge=True`` reproduces the reference's Merge-NMS branch
    (general.py:689-695): each kept box is replaced by the score-weighted
    mean of every candidate overlapping it above ``iou_thres`` (IoU taken
    on the class-offset boxes, the mean on the raw boxes), and with
    ``redundant`` (reference default) kept boxes supported by no second
    candidate are dropped. The reference guards the O(n^2) matrix with
    ``1 < n < 3e3``; here the candidate set is already the static top-K,
    so the matrix is always (K, K) and no guard is needed.
    """
    out, _ = _nms_core(prediction, conf_thres, iou_thres, classes, agnostic,
                       max_det, max_nms_static, use_pallas, merge, redundant)
    return out


def _nms_core(prediction, conf_thres, iou_thres, classes, agnostic, max_det,
              max_nms_static, use_pallas, merge, redundant):
    """Shared NMS body; also returns the kept candidates' original indices
    (B, max_det) so callers can gather side payloads (keypoint columns in
    non_max_suppression_kpt, general.py:706-800)."""
    B, N, no = prediction.shape
    nc = no - 5
    xywh = prediction[..., :4]
    obj = prediction[..., 4]
    cls_scores = prediction[..., 5:]

    if nc == 1:
        score = obj
        cls_id = jnp.zeros((B, N), jnp.int32)
    else:
        conf = cls_scores * obj[..., None]
        score = jnp.max(conf, axis=-1)
        cls_id = jnp.argmax(conf, axis=-1).astype(jnp.int32)

    keep_mask = (obj > conf_thres) & (score > conf_thres)
    if classes is not None:
        cls_ok = jnp.zeros((B, N), bool)
        for c in classes:
            cls_ok = cls_ok | (cls_id == c)
        keep_mask = keep_mask & cls_ok

    score = jnp.where(keep_mask, score, 0.0)
    boxes = xywh2xyxy(xywh)

    # Top-K candidates by score (static K).
    K = min(max_nms_static, N)
    top_scores, top_idx = jax.lax.top_k(score, K)
    top_boxes = jnp.take_along_axis(boxes, top_idx[..., None], axis=1)
    top_cls = jnp.take_along_axis(cls_id, top_idx, axis=1)
    top_active = top_scores > conf_thres

    offset = 0.0 if agnostic else MAX_WH
    shifted = top_boxes + (top_cls[..., None].astype(top_boxes.dtype) * offset)

    if use_pallas is None:
        use_pallas = _use_pallas_default()
    if use_pallas:
        from hamer_yolo_tpu.ops.nms_pallas import greedy_nms_keep

        keep = greedy_nms_keep(shifted, top_active.astype(jnp.float32), iou_thres) > 0.5
    else:
        def per_image(bx, act):
            iou = box_iou(bx, bx)
            return _greedy_suppress(iou, act, iou_thres)

        keep = jax.vmap(per_image)(shifted, top_active)  # (B, K)

    if merge:
        def merge_image(kp, bx_shift, bx, sc, act):
            ov = (box_iou(bx_shift, bx_shift) > iou_thres) & act[None, :]
            w = ov.astype(bx.dtype) * sc[None, :]  # (K, K) candidate weights
            denom = jnp.maximum(jnp.sum(w, axis=1, keepdims=True), 1e-12)
            merged = (w @ bx) / denom
            new_bx = jnp.where(kp[:, None], merged, bx)
            if redundant:
                kp = kp & (jnp.sum(ov, axis=1) > 1)
            return new_bx, kp

        top_boxes, keep = jax.vmap(merge_image)(
            keep, shifted, top_boxes, top_scores, top_active)

    # Compact kept detections to the front, cap at max_det.
    keep_score = jnp.where(keep, top_scores, -1.0)
    m = min(max_det, K)
    out_scores, order = jax.lax.top_k(keep_score, m)
    out_boxes = jnp.take_along_axis(top_boxes, order[..., None], axis=1)
    out_cls = jnp.take_along_axis(top_cls, order, axis=1)
    out_idx = jnp.take_along_axis(top_idx, order, axis=1)
    if m < max_det:
        pad = max_det - m
        out_scores = jnp.pad(out_scores, ((0, 0), (0, pad)), constant_values=-1.0)
        out_boxes = jnp.pad(out_boxes, ((0, 0), (0, pad), (0, 0)))
        out_cls = jnp.pad(out_cls, ((0, 0), (0, pad)))
        out_idx = jnp.pad(out_idx, ((0, 0), (0, pad)))
    out_valid = out_scores > 0.0
    return NmsOutput(
        boxes=out_boxes, scores=jnp.maximum(out_scores, 0.0),
        classes=out_cls, valid=out_valid,
    ), out_idx


class NmsKptOutput(NamedTuple):
    boxes: jax.Array  # (B, max_det, 4) xyxy
    scores: jax.Array  # (B, max_det)
    classes: jax.Array  # (B, max_det) int32
    kpts: jax.Array  # (B, max_det, 3 * nkpt) x,y,conf per keypoint
    valid: jax.Array  # (B, max_det) bool


@partial(jax.jit, static_argnames=("nc", "max_det", "max_nms_static",
                                  "agnostic", "classes", "use_pallas"))
def non_max_suppression_kpt(
    prediction: jax.Array,
    conf_thres: float = 0.25,
    iou_thres: float = 0.45,
    nc: int = 1,
    classes: Optional[Tuple[int, ...]] = None,
    agnostic: bool = False,
    max_det: int = 300,
    max_nms_static: int = 512,
    use_pallas: Optional[bool] = None,
) -> NmsKptOutput:
    """Keypoint-carrying NMS (general.py:706-800 kpt_label=True path):
    prediction is (B, N, 5 + nc + 3*nkpt) from the IKeypoint decode; the
    trailing 3*nkpt (x, y, conf) columns ride along with each kept box.
    Suppression semantics are identical to :func:`non_max_suppression`
    (the reference's kpt variant hardcodes merge=False)."""
    det = prediction[..., : 5 + nc]
    kpts = prediction[..., 5 + nc:]
    if nc == 1:
        # The reference kpt path scores by obj*cls even single-class
        # (general.py:762: conf from x[:, 5:6] after the obj multiply);
        # _nms_core's nc==1 shortcut uses obj alone, so fold cls in. The
        # kept set is identical: cls<=1 makes the raw-obj>thres gate
        # implied by obj*cls>thres.
        det = jnp.concatenate(
            [det[..., :4], (det[..., 4] * det[..., 5])[..., None],
             det[..., 5:6]], axis=-1)
    out, idx = _nms_core(det, conf_thres, iou_thres, classes, agnostic,
                         max_det, max_nms_static, use_pallas, False, True)
    out_kpts = jnp.take_along_axis(kpts, idx[..., None], axis=1)
    out_kpts = jnp.where(out.valid[..., None], out_kpts, 0.0)
    return NmsKptOutput(boxes=out.boxes, scores=out.scores,
                        classes=out.classes, kpts=out_kpts, valid=out.valid)
