"""Training/eval metric logging: JSONL always, TensorBoard/W&B when available.

Replaces the reference's SummaryWriter/W&B/rich mix (SURVEY.md 5;
yolo/yolov7/utils/wandb_logging/wandb_utils.py, train.py:34) with a
single MetricLogger: every log() appends a JSON line (machine-readable,
greppable) and mirrors scalars to TensorBoard if tensorflow is
importable and to Weights & Biases if wandb is importable AND
``wandb=True`` (or env HYT_WANDB=1) — both sinks are best-effort
optional; the JSONL artifact is the source of truth either way.
"""
from __future__ import annotations

import json
import os
import time
from typing import Dict, Optional


class MetricLogger:
    def __init__(self, log_dir: str, tensorboard: bool = True,
                 wandb: Optional[bool] = None, project: str = "hamer-yolo-tpu"):
        os.makedirs(log_dir, exist_ok=True)
        self.path = os.path.join(log_dir, "metrics.jsonl")
        self._file = open(self.path, "a")
        self._tb = None
        if tensorboard:
            try:
                import tensorflow as tf

                self._tb = tf.summary.create_file_writer(
                    os.path.join(log_dir, "tb"))
            except Exception:
                self._tb = None
        self._wandb = None
        if wandb is None:
            wandb = os.environ.get("HYT_WANDB") == "1"
        if wandb:
            try:
                import wandb as _wandb  # not in the base image: opt-in

                self._wandb = _wandb.init(
                    project=project, dir=log_dir,
                    name=os.path.basename(os.path.normpath(log_dir)),
                    resume="allow")
            except Exception:
                self._wandb = None

    def log(self, step: int, metrics: Dict[str, float], prefix: str = "") -> None:
        rec = {"step": int(step), "time": time.time()}
        for k, v in metrics.items():
            key = f"{prefix}{k}" if prefix else k
            try:
                rec[key] = float(v)
            except (TypeError, ValueError):
                rec[key] = str(v)
        self._file.write(json.dumps(rec) + "\n")
        self._file.flush()
        if self._tb is not None:
            import tensorflow as tf

            with self._tb.as_default():
                for k, v in rec.items():
                    if k in ("step", "time") or not isinstance(v, float):
                        continue
                    tf.summary.scalar(k, v, step=step)
        if self._wandb is not None:
            try:
                self._wandb.log(
                    {k: v for k, v in rec.items()
                     if k not in ("step", "time") and isinstance(v, float)},
                    step=int(step))
            except Exception:
                pass

    def log_image(self, step: int, name: str, image_bgr) -> None:
        """Log a prediction image (reference hamer.py:213-267
        tensorboard_logging grids). Goes to tensorboard when available,
        and always to ``<log_dir>/images/<name>_<step>.png`` so the
        artifact exists without a tf install."""
        import numpy as np

        img = np.asarray(image_bgr)
        img_dir = os.path.join(os.path.dirname(self.path), "images")
        os.makedirs(img_dir, exist_ok=True)
        try:
            import cv2

            cv2.imwrite(os.path.join(img_dir, f"{name}_{int(step)}.png"), img)
        except Exception:
            pass
        if self._tb is not None:
            import tensorflow as tf

            with self._tb.as_default():
                tf.summary.image(name, img[None, :, :, ::-1], step=int(step))

    def close(self) -> None:
        self._file.close()
        if self._wandb is not None:
            try:
                self._wandb.finish()
            except Exception:
                pass
