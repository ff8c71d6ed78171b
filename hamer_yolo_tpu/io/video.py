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


class MultiStreamReader:
    """N concurrent sources -> synchronized frame batches (LoadStreams).

    The reference's LoadStreams (yolo/yolov7/utils/datasets.py:226+)
    spawns one reader thread per webcam/RTSP source and stacks the latest
    frame of every source into one batch per step. TPU-native version:
    per-source ring buffers feed ONE batched program (the serving
    pipeline runs batch = n_sources per dispatch, so N streams cost one
    device program instead of N).

    ``sources`` items may be:
      - int / str: cv2.VideoCapture device index, file, or URL;
      - an iterator/generator of frames (testing / synthetic streams).
    """

    def __init__(self, sources, buffer: int = 4):
        from collections import deque

        self.n = len(sources)
        self._buffers = [deque(maxlen=buffer) for _ in sources]
        self._locks = [threading.Lock() for _ in sources]
        self.running = True
        self._threads = []
        self._caps = []
        for i, src in enumerate(sources):
            if isinstance(src, (int, str)):
                import cv2

                cap = cv2.VideoCapture(src)
                if not cap.isOpened():
                    self.close()
                    raise RuntimeError(f"cannot open stream {src}")
                self._caps.append(cap)
                t = threading.Thread(target=self._cap_loop, args=(i, cap),
                                     daemon=True)
            else:
                t = threading.Thread(target=self._iter_loop,
                                     args=(i, iter(src)), daemon=True)
            t.start()
            self._threads.append(t)

    def _push(self, i: int, frame: np.ndarray):
        with self._locks[i]:
            self._buffers[i].append(frame)

    def _cap_loop(self, i: int, cap):
        while self.running:
            ok, frame = cap.read()
            if not ok:
                time.sleep(0.005)
                continue
            self._push(i, frame)

    def _iter_loop(self, i: int, it):
        for frame in it:
            if not self.running:
                return
            self._push(i, frame)

    def read_batch(self, timeout: float = 1.0):
        """One frame per source (oldest buffered = in-order playback);
        None for sources with nothing new within ``timeout``."""
        out = [None] * self.n
        deadline = time.time() + timeout
        remaining = set(range(self.n))
        while remaining and time.time() < deadline:
            for i in list(remaining):
                with self._locks[i]:
                    if self._buffers[i]:
                        out[i] = self._buffers[i].popleft()
                        remaining.discard(i)
            if remaining:
                time.sleep(0.002)
        return out

    def batches(self, max_batches: Optional[int] = None,
                timeout: float = 1.0) -> Iterator[list]:
        """Yield [frame_or_None] * n_sources batches until closed / all
        sources dry. A batch is yielded as soon as every live source has
        contributed (or the timeout passes with partial data)."""
        count = 0
        while self.running:
            batch = self.read_batch(timeout)
            if all(f is None for f in batch):
                return
            yield batch
            count += 1
            if max_batches and count >= max_batches:
                return

    def close(self):
        self.running = False
        for t in self._threads:
            t.join(timeout=1.0)
        for cap in self._caps:
            cap.release()
