"""Detector evaluation CLI: COCO-style mAP over a labeled image dir.

Parity: reference yolo/yolov7/test.py (per-epoch mAP harness with
ap_per_class + ConfusionMatrix).

python tools/eval_detector.py --data <images_dir> [--labels <dir>]
    [--checkpoint ckpt] [--conf 0.001] [--iou 0.65]
"""
from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> int:
    p = argparse.ArgumentParser()
    p.add_argument("--data", required=True)
    p.add_argument("--labels", default=None)
    p.add_argument("--checkpoint", default=None)
    p.add_argument("--nc", type=int, default=3)
    p.add_argument("--img-size", type=int, default=640)
    p.add_argument("--conf", type=float, default=0.001)
    p.add_argument("--iou", type=float, default=0.65)
    p.add_argument("--save-json", default=None, metavar="PATH",
                   help="write a cocoapi-compatible results JSON "
                        "(test.py --save-json, test.py:167-176 schema)")
    args = p.parse_args()

    import numpy as np

    import jax

    from hamer_yolo_tpu.core.checkpoint import load_checkpoint
    from hamer_yolo_tpu.io.datasets import image_label_pairs
    from hamer_yolo_tpu.models.yolov7 import YoloConfig, init_yolov7
    from hamer_yolo_tpu.utils.detect_eval import eval_detector_images
    from hamer_yolo_tpu.utils.metrics import (
        ConfusionMatrix, ap_per_class, match_predictions,
    )

    cfg = YoloConfig(nc=args.nc, img_size=args.img_size)
    if args.checkpoint and os.path.exists(args.checkpoint):
        params = load_checkpoint(args.checkpoint)
        if "params" in params:  # a train state; prefer EMA weights
            params = params.get("ema", {}).get("params", params["params"])
    else:
        print("warning: random-init weights (no checkpoint)")
        params = init_yolov7(jax.random.PRNGKey(0), cfg)

    iou_thresholds = np.linspace(0.5, 0.95, 10)
    all_tp, all_conf, all_cls, all_target_cls = [], [], [], []
    jdict = []
    cm = ConfusionMatrix(args.nc)

    pairs = image_label_pairs(args.data, args.labels)
    # Shared per-image loop with train_yolo --evolve fitness
    # (utils/detect_eval.eval_detector_images) — same letterbox geometry,
    # NMS settings, and un-mapping by construction.
    for rec in eval_detector_images(params, cfg, pairs, conf=args.conf,
                                    iou=args.iou, img_size=args.img_size):
        boxes, scores, classes = rec["boxes"], rec["scores"], rec["classes"]
        gt_boxes, gt_cls = rec["gt_boxes"], rec["gt_cls"]

        if args.save_json is not None:
            stem = os.path.splitext(os.path.basename(rec["img_path"]))[0]
            image_id = int(stem) if stem.isnumeric() else stem
            for bx, sc, cl in zip(boxes, scores, classes):
                jdict.append({
                    "image_id": image_id,
                    "category_id": int(cl),
                    "bbox": [round(float(bx[0]), 3), round(float(bx[1]), 3),
                             round(float(bx[2] - bx[0]), 3),
                             round(float(bx[3] - bx[1]), 3)],
                    "score": round(float(sc), 5),
                })
        tp = match_predictions(boxes, classes, gt_boxes, gt_cls, iou_thresholds)
        all_tp.append(tp)
        all_conf.append(scores)
        all_cls.append(classes)
        all_target_cls.append(gt_cls)
        if len(boxes):
            dets6 = np.concatenate([boxes, scores[:, None], classes[:, None]], 1)
            cm.process_batch(dets6, np.concatenate([gt_cls[:, None], gt_boxes], 1)
                             if len(gt_boxes) else np.zeros((0, 5)))

    if args.save_json is not None:
        import json

        with open(args.save_json, "w") as f:
            json.dump(jdict, f)
        print(f"saved {len(jdict)} predictions to {args.save_json}")
    if not all_tp:
        print("no images evaluated")
        return 1
    res = ap_per_class(
        np.concatenate(all_tp), np.concatenate(all_conf),
        np.concatenate(all_cls), np.concatenate(all_target_cls),
    )
    print(f"images: {len(pairs)}  mAP@0.5: {res['map50']:.4f}  "
          f"mAP@0.5:0.95: {res['map']:.4f}")
    for i, c in enumerate(res["classes"]):
        print(f"  class {int(c)}: AP50={res['ap'][i, 0]:.4f} "
              f"P={res['precision'][i]:.4f} R={res['recall'][i]:.4f}")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
