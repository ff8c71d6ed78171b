"""HTTP serving front end: POST an image, get hands back as JSON.

The reference deploys its detector behind Triton inference server
(/root/reference/yolo/yolov7/deploy/triton-inference-server/) with
client-side batching. The TPU-native equivalent wraps the hot jitted
frame program (pipeline/serving.BatchedPipeline) behind a stdlib
ThreadingHTTPServer with Triton-style *dynamic micro-batching*:
concurrent client requests are collected for up to ``max_wait_ms`` (or
until ``batch_size`` frames are queued) and dispatched as ONE device
program, so concurrency converts into MXU batch efficiency instead of
queueing on a per-frame program.

Endpoints:
  POST /infer        image bytes (jpg/png; any cv2-decodable) ->
                     {"hands": [{side, box, score, betas, theta, cam_t,
                     root_depth}, ...], "batch": n}
                     query: ?vertices=1 to include the 778x3 vertices
  GET  /healthz      {"ok": true, "device": ...}
  GET  /stats        serving counters (frames, batches, fps since start)

No extra dependencies: stdlib http.server + threading; cv2 for decode.
"""
from __future__ import annotations

import json
import threading
import time
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer
from typing import Any, Dict, List, Optional

import numpy as np


def _default_K(hw) -> np.ndarray:
    h, w = hw
    return np.array([[906.96, 0.0, w / 2.0],
                     [0.0, 906.79, h / 2.0],
                     [0.0, 0.0, 1.0]], np.float32)


class MicroBatcher:
    """Collects concurrent requests into device-sized batches.

    submit() blocks the calling (request-handler) thread until its
    frame's results are ready; a single dispatcher thread owns the
    device, so JAX dispatch stays single-threaded (required) while N
    HTTP threads feed it.
    """

    def __init__(self, pipe, K_default: Optional[np.ndarray] = None,
                 max_wait_ms: float = 15.0):
        self.pipe = pipe
        self.K_default = K_default
        self.max_wait = max_wait_ms / 1e3
        self._lock = threading.Lock()
        self._queue: List[dict] = []
        self._wake = threading.Event()
        self._stop = False
        self.frames = 0
        self.batches = 0
        self.t0 = time.time()
        self._thread = threading.Thread(target=self._run, daemon=True)
        self._thread.start()

    def submit(self, image: np.ndarray, K: Optional[np.ndarray] = None
               ) -> Dict[str, np.ndarray]:
        item = {"img": image, "K": K, "ev": threading.Event(), "out": None,
                "err": None}
        with self._lock:
            self._queue.append(item)
        self._wake.set()
        item["ev"].wait()
        if item["err"] is not None:
            raise item["err"]
        return item["out"]

    def close(self):
        self._stop = True
        self._wake.set()
        self._thread.join(timeout=5)

    def _run(self):
        while not self._stop:
            self._wake.wait(timeout=0.25)
            self._wake.clear()
            with self._lock:
                pending = bool(self._queue)
            if not pending:
                continue
            # micro-batching window: let concurrent requests pile up
            deadline = time.time() + self.max_wait
            while time.time() < deadline:
                with self._lock:
                    if len(self._queue) >= self.pipe.batch_size:
                        break
                time.sleep(0.001)
            with self._lock:
                batch = self._queue[: self.pipe.batch_size]
                self._queue = self._queue[self.pipe.batch_size:]
            if not batch:
                continue
            try:
                frames = [it["img"] for it in batch]
                K = next((it["K"] for it in batch if it["K"] is not None),
                         None)
                if K is None:
                    K = (self.K_default if self.K_default is not None
                         else _default_K(frames[0].shape[:2]))
                out = self.pipe.process_batch(frames, K)
                for i, it in enumerate(batch):
                    it["out"] = {k: v[i] for k, v in out.items()}
                    it["ev"].set()
                self.frames += len(batch)
                self.batches += 1
            except Exception as e:  # surface errors to the waiting clients
                for it in batch:
                    it["err"] = e
                    it["ev"].set()
            with self._lock:
                if self._queue:
                    self._wake.set()


def _hands_json(out: Dict[str, np.ndarray], include_vertices: bool
                ) -> List[Dict[str, Any]]:
    hands = []
    valid = np.asarray(out["valid"]).astype(bool)
    for s in range(valid.shape[0]):
        if not valid[s]:
            continue
        h = {
            "side": "right" if float(out["is_right"][s]) > 0.5 else "left",
            "box": np.asarray(out["boxes"][s], np.float64).tolist(),
            "score": float(out["scores"][s]),
            "betas": np.asarray(out["betas"][s], np.float64).tolist(),
            "theta": np.asarray(out["theta"][s], np.float64).ravel().tolist(),
            "cam_t": np.asarray(out["cam_t"][s], np.float64).tolist(),
        }
        if "root_depth" in out:
            h["root_depth"] = float(np.asarray(out["root_depth"][s]).ravel()[0])
        if include_vertices:
            h["vertices"] = np.asarray(out["vertices"][s],
                                       np.float64).tolist()
        hands.append(h)
    return hands


def make_http_server(pipe, host: str = "127.0.0.1", port: int = 8100,
                     K_default: Optional[np.ndarray] = None,
                     max_wait_ms: float = 15.0) -> ThreadingHTTPServer:
    """Build (not start) the server; .serve_forever() / .shutdown() to run.

    The returned server exposes ``.batcher`` for stats/close.
    """
    import cv2

    batcher = MicroBatcher(pipe, K_default, max_wait_ms)

    class Handler(BaseHTTPRequestHandler):
        def log_message(self, *a):  # quiet
            pass

        def _json(self, code: int, payload: dict):
            body = json.dumps(payload).encode()
            self.send_response(code)
            self.send_header("Content-Type", "application/json")
            self.send_header("Content-Length", str(len(body)))
            self.end_headers()
            self.wfile.write(body)

        def do_GET(self):
            if self.path.startswith("/healthz"):
                import jax
                self._json(200, {"ok": True,
                                 "device": str(jax.devices()[0])})
            elif self.path.startswith("/stats"):
                dt = time.time() - batcher.t0
                self._json(200, {
                    "frames": batcher.frames, "batches": batcher.batches,
                    "uptime_s": round(dt, 2),
                    "fps": round(batcher.frames / dt, 2) if dt else 0.0,
                    "batch_size": pipe.batch_size,
                })
            else:
                self._json(404, {"error": "unknown path"})

        def do_POST(self):
            if not self.path.startswith("/infer"):
                self._json(404, {"error": "unknown path"})
                return
            try:
                n = int(self.headers.get("Content-Length", "0"))
                raw = self.rfile.read(n)
                img = cv2.imdecode(np.frombuffer(raw, np.uint8),
                                   cv2.IMREAD_COLOR)
                if img is None:
                    self._json(400, {"error": "undecodable image"})
                    return
                out = batcher.submit(img.astype(np.float32))
                include_v = "vertices=1" in (self.path.split("?", 1) + [""])[1]
                self._json(200, {"hands": _hands_json(out, include_v),
                                 "height": img.shape[0],
                                 "width": img.shape[1]})
            except Exception as e:
                self._json(500, {"error": f"{type(e).__name__}: {e}"})

    srv = ThreadingHTTPServer((host, port), Handler)
    srv.batcher = batcher
    return srv
