"""Video / webcam / image-stream readers (LoadImages & LoadStreams parity).

Reference yolo/yolov7/utils/datasets.py LoadImages (:143+, files and
videos) and LoadStreams (:226+, webcam/RTSP with a reader thread). Here:
- ``iter_media`` yields BGR frames from a directory, a video file, or a
  glob, in order;
- ``StreamReader`` wraps a live capture with a latest-frame thread so the
  consumer never blocks on IO (the serving loop drains at its own rate).
"""
from __future__ import annotations

import glob
import os
import threading
import time
from typing import Iterator, Optional

import numpy as np

VIDEO_EXTS = (".mp4", ".avi", ".mov", ".mkv", ".webm")
IMAGE_EXTS = (".jpg", ".jpeg", ".png", ".bmp")


def iter_media(source: str, max_frames: Optional[int] = None) -> Iterator[np.ndarray]:
    """Yield BGR frames from an image dir / image file / video file / glob."""
    import cv2

    def _iter_video(path):
        cap = cv2.VideoCapture(path)
        try:
            while True:
                ok, frame = cap.read()
                if not ok:
                    break
                yield frame
        finally:
            cap.release()

    count = 0
    paths = []
    if os.path.isdir(source):
        paths = sorted(
            p for p in glob.glob(os.path.join(source, "*"))
            if p.lower().endswith(IMAGE_EXTS + VIDEO_EXTS)
        )
    elif any(ch in source for ch in "*?["):
        paths = sorted(glob.glob(source))
    else:
        paths = [source]

    for path in paths:
        if path.lower().endswith(VIDEO_EXTS):
            for frame in _iter_video(path):
                yield frame
                count += 1
                if max_frames and count >= max_frames:
                    return
        else:
            img = cv2.imread(path)
            if img is None:
                continue
            yield img
            count += 1
            if max_frames and count >= max_frames:
                return


class StreamReader:
    """Threaded latest-frame reader for live sources (webcam index or URL)."""

    def __init__(self, source=0):
        import cv2

        self.cap = cv2.VideoCapture(source)
        if not self.cap.isOpened():
            raise RuntimeError(f"cannot open stream {source}")
        self.frame: Optional[np.ndarray] = None
        self.running = True
        self._lock = threading.Lock()
        self._thread = threading.Thread(target=self._loop, daemon=True)
        self._thread.start()

    def _loop(self):
        while self.running:
            ok, frame = self.cap.read()
            if not ok:
                time.sleep(0.005)
                continue
            with self._lock:
                self.frame = frame

    def read(self, timeout: float = 1.0) -> Optional[np.ndarray]:
        t0 = time.time()
        while time.time() - t0 < timeout:
            with self._lock:
                if self.frame is not None:
                    f = self.frame
                    self.frame = None
                    return f
            time.sleep(0.002)
        return None

    def frames(self) -> Iterator[np.ndarray]:
        while self.running:
            f = self.read()
            if f is not None:
                yield f

    def close(self):
        self.running = False
        self._thread.join(timeout=1.0)
        self.cap.release()
