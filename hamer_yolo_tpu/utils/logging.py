"""Training/eval metric logging: JSONL always, TensorBoard when available.

Replaces the reference's SummaryWriter/W&B/rich mix (SURVEY.md 5) with a
single MetricLogger: every log() appends a JSON line (machine-readable,
greppable) and mirrors scalars to TensorBoard if tensorflow is importable.
"""
from __future__ import annotations

import json
import os
import time
from typing import Dict, Optional


class MetricLogger:
    def __init__(self, log_dir: str, tensorboard: bool = True):
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

    def close(self) -> None:
        self._file.close()
