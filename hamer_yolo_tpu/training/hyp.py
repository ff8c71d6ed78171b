"""Reference hyp-yaml ingestion (yolo/yolov7/data/hyp.scratch.*.yaml).

The reference's train.py takes ``--hyp <yaml>`` holding optimizer, loss
and augmentation hyperparameters (train.py:546-565 loads it; keys
documented inline in hyp.scratch.p5.yaml). `load_hyp_yaml` maps those
keys onto this framework's knobs so tuned hyp files carry over verbatim:

- optimizer: lr0 / lrf / momentum / weight_decay
  (training/optim.yolo_optimizer)
- loss gains: box / cls / obj / anchor_t (training/losses.yolo_loss);
  loss_ota=1 selects the SimOTA assigner (train.py uses ComputeLossOTA)
- augmentation: hsv_h/s/v, degrees, translate, scale, shear,
  perspective, fliplr, mosaic, mixup (io/datasets.YoloDataConfig)

Keys with no counterpart here are returned in `extras` and should be
warned about, not silently dropped: cls_pw / obj_pw (BCE pos-weights
are 1.0 in every shipped hyp), iou_t (unused by the reference's own OTA
losses), fl_gamma (focal loss off in every shipped hyp), flipud,
copy_paste / paste_in, warmup_* (we schedule warmup in steps, not
epochs).
"""
from __future__ import annotations

from typing import Any, Dict, Tuple

_OPT_KEYS = {"lr0": "lr0", "lrf": "lrf", "momentum": "momentum",
             "weight_decay": "weight_decay"}
_LOSS_KEYS = {"box": "box_w", "cls": "cls_w", "obj": "obj_w",
              "anchor_t": "anchor_t"}
_DATA_KEYS = ("hsv_h", "hsv_s", "hsv_v", "degrees", "translate", "scale",
              "shear", "perspective", "fliplr", "mixup")


def load_hyp_yaml(path: str) -> Tuple[Dict[str, float], Dict[str, float],
                                      Dict[str, Any], Dict[str, Any]]:
    """hyp yaml -> (optimizer_kwargs, loss_kwargs, data_kwargs, extras)."""
    import yaml

    with open(path) as f:
        hyp = yaml.safe_load(f) or {}
    return map_hyp(hyp)


def map_hyp(hyp: Dict[str, Any]) -> Tuple[Dict[str, float], Dict[str, float],
                                          Dict[str, Any], Dict[str, Any]]:
    """In-memory hyp dict -> the same kwargs split (used by --evolve,
    where candidates never touch disk)."""
    opt = {dst: float(hyp[src]) for src, dst in _OPT_KEYS.items()
           if src in hyp}
    loss = {dst: float(hyp[src]) for src, dst in _LOSS_KEYS.items()
            if src in hyp}
    data: Dict[str, Any] = {k: float(hyp[k]) for k in _DATA_KEYS if k in hyp}
    if "mosaic" in hyp:
        data["mosaic"] = float(hyp["mosaic"]) > 0.0
    extras = {k: v for k, v in hyp.items()
              if k not in _OPT_KEYS and k not in _LOSS_KEYS
              and k not in _DATA_KEYS and k not in ("mosaic", "loss_ota")}
    if hyp.get("loss_ota", 0):
        extras["_assigner"] = "simota"
    return opt, loss, data, extras
