"""Batched serving loop: video/stream -> MANO params at video rate.

The BASELINE "multi-hand video stream" configuration: frames are grouped
into fixed-size batches, one jitted vmapped frame program processes each
batch per dispatch (amortizing host<->device latency — measured 5x over
frame-at-a-time on v5e), and, when more than one device is visible, the
batch is sharded over the "data" mesh axis so ICI carries the fan-out
(the reference's closest analogue is its webcam loop, yolo/detector.py:35,
which is strictly single-frame).
"""
from __future__ import annotations

import time
from dataclasses import dataclass
from typing import Any, Dict, Iterator, List, Optional

import numpy as np

import jax
import jax.numpy as jnp

from hamer_yolo_tpu.models.mano import ManoModel
from hamer_yolo_tpu.pipeline.frame import (PipelineConfig, infer_frame,
                                            infer_frames)
from hamer_yolo_tpu.pipeline.runner import pick_bucket


@dataclass
class ServingStats:
    frames: int = 0
    batches: int = 0
    total_s: float = 0.0

    @property
    def fps(self) -> float:
        return self.frames / self.total_s if self.total_s else 0.0


class BatchedPipeline:
    """Fixed-batch frame processor with optional data-parallel sharding."""

    def __init__(
        self,
        params: Dict[str, Any],
        mano_model: ManoModel,
        cfg: Optional[PipelineConfig] = None,
        batch_size: int = 16,
        bucket_hw: Optional[tuple] = None,
        mesh=None,
        attn_impl=None,
    ):
        self.cfg = cfg or PipelineConfig()
        self.batch_size = batch_size
        self.bucket_hw = bucket_hw
        self.mesh = mesh
        self.params = jax.device_put(params)
        mano = mano_model
        pcfg = self.cfg

        @jax.jit
        def fn(p, images, hws, Ks):
            # Stage-batched program (natively batched detector trunk+NMS;
            # same outputs as vmap(infer_frame), ~22 ms/b128 faster).
            return infer_frames(p, mano, images, hws, Ks, pcfg,
                                attn_impl=attn_impl)

        self._fn = fn

    def _dispatch(self, frames: List[np.ndarray], K: np.ndarray):
        """Pad + upload + enqueue one batch; returns (lazy pytree, n).

        JAX dispatch is asynchronous: this returns as soon as the program
        is enqueued, so host prep of the NEXT batch overlaps the device's
        work on this one (the H2D/dispatch pipelining of the stream path).
        """
        n = len(frames)
        hmax = max(f.shape[0] for f in frames)
        wmax = max(f.shape[1] for f in frames)
        bh, bw = self.bucket_hw or pick_bucket(hmax, wmax)
        images = np.zeros((self.batch_size, bh, bw, 3), np.float32)
        hws = np.zeros((self.batch_size, 2), np.float32)
        for i, f in enumerate(frames[: self.batch_size]):
            images[i, : f.shape[0], : f.shape[1]] = f
            hws[i] = f.shape[:2]
        hws[n:] = [bh, bw]  # harmless defaults for pad slots
        K = np.asarray(K, np.float32)
        if K.ndim == 3:  # per-frame intrinsics (n, 3, 3)
            Ks = np.broadcast_to(K[-1], (self.batch_size, 3, 3)).copy()
            Ks[: K.shape[0]] = K
        else:
            Ks = np.broadcast_to(K, (self.batch_size, 3, 3)).copy()

        batch = (jnp.asarray(images), jnp.asarray(hws), jnp.asarray(Ks))
        if self.mesh is not None:
            from hamer_yolo_tpu.parallel.mesh import shard_batch

            batch = tuple(shard_batch(list(batch), self.mesh))
        return self._fn(self.params, *batch), n

    @staticmethod
    def _fetch(out, n: int) -> Dict[str, np.ndarray]:
        return jax.tree_util.tree_map(lambda x: np.asarray(x)[:n], out)

    def process_batch(self, frames: List[np.ndarray], K: np.ndarray) -> Dict[str, np.ndarray]:
        """frames: list of HWC BGR uint8/float; K: (3, 3) shared or
        (len(frames), 3, 3) per-frame intrinsics. Returns stacked outputs
        (leading dim = len(frames); padded internally to batch_size)."""
        return self._fetch(*self._dispatch(frames, K))

    def stream(self, frame_iter: Iterator[np.ndarray], K: np.ndarray,
               depth: int = 2) -> Iterator[Dict[str, np.ndarray]]:
        """Consume a frame iterator in batches; yields per-batch outputs.

        Keeps up to ``depth`` batches in flight: batch i+1 is prepped,
        uploaded, and enqueued before batch i's results are fetched, so
        the host never sits idle waiting on the device (nor vice versa).
        """
        from collections import deque

        stats = ServingStats()
        buf: List[np.ndarray] = []
        pending: deque = deque()
        t0 = time.time()

        def _drain_one():
            out, n = pending.popleft()
            stats.frames += n
            stats.batches += 1
            return self._fetch(out, n)

        for frame in frame_iter:
            buf.append(frame)
            if len(buf) == self.batch_size:
                pending.append(self._dispatch(buf, K))
                buf = []
                if len(pending) >= depth:
                    yield _drain_one()
        if buf:
            pending.append(self._dispatch(buf, K))
        while pending:
            yield _drain_one()
        stats.total_s = time.time() - t0
        self.last_stats = stats

    def stream_multi(self, sources, K: np.ndarray,
                     max_batches: Optional[int] = None,
                     timeout: float = 1.0,
                     buffer: int = 4) -> Iterator[Dict[str, Any]]:
        """Drive N live sources as one batched program per tick (the
        reference's LoadStreams N-webcam loop, datasets.py:226+, made
        TPU-native: one dispatch covers all sources).

        Yields {"outputs": stacked pytree (n_live leading dim),
        "source_idx": list} per tick; sources with no new frame in a tick
        are skipped (their slot simply isn't dispatched).
        """
        from hamer_yolo_tpu.io.video import MultiStreamReader

        reader = MultiStreamReader(sources, buffer=buffer)
        stats = ServingStats()
        t0 = time.time()
        try:
            for batch in reader.batches(max_batches=max_batches,
                                        timeout=timeout):
                live = [(i, f) for i, f in enumerate(batch) if f is not None]
                if not live:
                    continue
                frames = [f for _, f in live]
                out = self.process_batch(frames, K)
                stats.frames += len(frames)
                stats.batches += 1
                yield {"outputs": out, "source_idx": [i for i, _ in live]}
        finally:
            reader.close()
            stats.total_s = time.time() - t0
            self.last_stats = stats
