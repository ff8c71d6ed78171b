"""Shared detector-evaluation loop (reference yolov7/test.py harness).

One implementation of the per-image eval path — letterbox -> jitted
forward+NMS -> pad/ratio un-mapping -> labels -> iterate — consumed by
both ``tools/eval_detector.py`` (standalone mAP CLI with ConfusionMatrix
and COCO-json extras) and ``tools/train_yolo.py --evolve`` (fitness),
so the two can never drift apart on conf/iou settings or geometry.
"""
from __future__ import annotations

from typing import Iterable, Iterator, Tuple

import numpy as np


def eval_detector_images(
    params,
    cfg,
    pairs: Iterable[Tuple[str, str]],
    spec=None,
    conf: float = 0.001,
    iou: float = 0.65,
    img_size: int = 640,
) -> Iterator[dict]:
    """Yield per-image eval records over (image_path, label_path) pairs.

    Record keys: ``img_path``, ``boxes`` (N, 4 xyxy in ORIGINAL-frame
    pixels), ``scores``, ``classes``, ``gt_boxes`` (M, 4 xyxy),
    ``gt_cls`` (M,). Settings default to the reference test.py harness
    (conf 0.001 / iou 0.65). Unreadable images are skipped.

    Raises for BIN/IKeypoint head specs: their decoded rows carry extra
    columns that plain NMS would misread as class scores — evaluate
    those with their dedicated decode paths instead.
    """
    import cv2

    import jax
    import jax.numpy as jnp

    from hamer_yolo_tpu.geometry.affine import letterbox_numpy
    from hamer_yolo_tpu.io.datasets import load_yolo_labels
    from hamer_yolo_tpu.models.yolov7 import yolov7_forward
    from hamer_yolo_tpu.models.yolov7.model import BIN, KPT, yolov7_spec
    from hamer_yolo_tpu.ops.nms import non_max_suppression

    head_op = (spec if spec is not None else yolov7_spec())[-1][1]
    if head_op in (BIN, KPT):
        raise ValueError(
            f"eval_detector_images: {head_op} head emits extra per-row "
            "columns; plain NMS would treat them as class scores. Use the "
            "dedicated decode (non_max_suppression_kpt / bin eval) paths.")

    @jax.jit
    def detect(p, img):
        pred = yolov7_forward(p, img, cfg, spec=spec)
        return non_max_suppression(pred, conf, iou, max_det=300)

    for img_path, lbl_path in pairs:
        img = cv2.imread(img_path)
        if img is None:
            continue
        h0, w0 = img.shape[:2]
        padded, r, (dw, dh) = letterbox_numpy(img, img_size, auto=False)
        x = jnp.asarray(padded[:, :, ::-1].astype(np.float32) / 255.0)[None]
        nms = detect(params, x)
        valid = np.asarray(nms.valid[0])
        boxes = np.asarray(nms.boxes[0])[valid]
        boxes[:, [0, 2]] = (boxes[:, [0, 2]] - dw) / r
        boxes[:, [1, 3]] = (boxes[:, [1, 3]] - dh) / r
        # reference test.py applies clip_coords (general.py) before
        # matching / COCO json: boxes crossing the letterbox edge must
        # not extend past the original frame
        boxes[:, [0, 2]] = boxes[:, [0, 2]].clip(0, w0)
        boxes[:, [1, 3]] = boxes[:, [1, 3]].clip(0, h0)
        labels = load_yolo_labels(lbl_path)
        gt_cls = labels[:, 0] if len(labels) else np.zeros((0,))
        gt_boxes = np.stack([
            (labels[:, 1] - labels[:, 3] / 2) * w0,
            (labels[:, 2] - labels[:, 4] / 2) * h0,
            (labels[:, 1] + labels[:, 3] / 2) * w0,
            (labels[:, 2] + labels[:, 4] / 2) * h0,
        ], axis=1) if len(labels) else np.zeros((0, 4))
        yield {
            "img_path": img_path,
            "boxes": boxes,
            "scores": np.asarray(nms.scores[0])[valid],
            "classes": np.asarray(nms.classes[0])[valid],
            "gt_boxes": gt_boxes,
            "gt_cls": gt_cls,
        }


def detector_map(
    params, cfg, pairs, spec=None, conf: float = 0.001, iou: float = 0.65,
    img_size: int = 640,
) -> Tuple[float, float, float, float]:
    """(mP, mR, mAP@.5, mAP@.5:.95) over the pairs — the fitness inputs."""
    from hamer_yolo_tpu.utils.metrics import ap_per_class, match_predictions

    iou_thresholds = np.linspace(0.5, 0.95, 10)
    all_tp, all_conf, all_cls, all_tcls = [], [], [], []
    for rec in eval_detector_images(params, cfg, pairs, spec=spec,
                                    conf=conf, iou=iou, img_size=img_size):
        all_tp.append(match_predictions(rec["boxes"], rec["classes"],
                                        rec["gt_boxes"], rec["gt_cls"],
                                        iou_thresholds))
        all_conf.append(rec["scores"])
        all_cls.append(rec["classes"])
        all_tcls.append(rec["gt_cls"])
    if not all_tp:
        return 0.0, 0.0, 0.0, 0.0
    res = ap_per_class(np.concatenate(all_tp), np.concatenate(all_conf),
                       np.concatenate(all_cls), np.concatenate(all_tcls))
    mp = float(np.mean(res["precision"])) if len(res["precision"]) else 0.0
    mr = float(np.mean(res["recall"])) if len(res["recall"]) else 0.0
    return mp, mr, float(res["map50"]), float(res["map"])
