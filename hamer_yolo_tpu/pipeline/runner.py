"""Host-side batch runner: image dir -> per-frame .npy + .obj outputs.

The equivalent of the reference CLI loop (process_batch_manopara,
infer.py:1223-1318 + reconstruct pass :1321-1436), with:
- shape bucketing: frames are padded host-side to a small set of bucket
  shapes so the jitted frame program compiles once per bucket, not per
  unique resolution;
- a single H2D upload per frame (the raw image); all preprocessing is
  on-device (pipeline/preprocess.py);
- per-frame robustness: failures skip the frame, mirroring the reference's
  try/except-continue (infer.py:1306-1316).
"""
from __future__ import annotations

import os
import time
from dataclasses import dataclass, replace
from typing import Any, Dict, List, Optional, Tuple

import numpy as np

import jax
import jax.numpy as jnp

from hamer_yolo_tpu.io.writers import (
    frame_outputs_to_hand_dicts,
    list_images,
    load_intrinsics,
    save_hand_npy,
)
from hamer_yolo_tpu.models.mano import ManoModel
from hamer_yolo_tpu.pipeline.frame import PipelineConfig, infer_frame
from hamer_yolo_tpu.pipeline.reconstruct import reconstruct_and_save_obj

# Common camera resolutions, smallest-first; frames pad up to the first fit.
DEFAULT_BUCKETS: Tuple[Tuple[int, int], ...] = (
    (480, 640), (720, 1280), (1080, 1920), (1536, 2048), (2160, 3840),
)


def pick_bucket(h: int, w: int,
                buckets: Tuple[Tuple[int, int], ...] = DEFAULT_BUCKETS) -> Tuple[int, int]:
    portrait = h > w
    for bh, bw in buckets:
        if portrait:
            bh, bw = bw, bh  # transpose the ladder for portrait frames
        if h <= bh and w <= bw:
            return bh, bw
    return (int(np.ceil(h / 64) * 64), int(np.ceil(w / 64) * 64))


class FrameProgram:
    """Caches one jitted frame program per bucket shape."""

    def __init__(self, params: Dict[str, Any], mano_model: ManoModel,
                 cfg: PipelineConfig, attn_impl=None):
        self.params = params
        self.mano_model = mano_model
        self.cfg = cfg
        self.attn_impl = attn_impl
        self._cache: Dict[Tuple[int, int], Any] = {}

    def _fn_for_bucket(self, bucket: Tuple[int, int]):
        if bucket not in self._cache:
            mano, cfg, attn = self.mano_model, self.cfg, self.attn_impl

            # params passed as an argument (closure capture would bake
            # multi-GB weights into the executable as constants).
            @jax.jit
            def fn(params, image_bgr, orig_hw, K):
                # uint8 frames cast on-device: 4x fewer H2D bytes
                # (exact for 0..255; dtype is part of the jit signature)
                image_bgr = image_bgr.astype(jnp.float32)
                return infer_frame(params, mano, image_bgr, orig_hw, K, cfg,
                                   attn_impl=attn)

            self._cache[bucket] = fn
        return self._cache[bucket]

    def __call__(self, image_bgr: np.ndarray, K: np.ndarray) -> Dict[str, np.ndarray]:
        h, w = image_bgr.shape[:2]
        bh, bw = pick_bucket(h, w)
        dtype = np.uint8 if image_bgr.dtype == np.uint8 else np.float32
        padded = np.zeros((bh, bw, 3), dtype)
        padded[:h, :w] = image_bgr
        out = self._fn_for_bucket((bh, bw))(
            self.params,
            jnp.asarray(padded),
            jnp.asarray([h, w], jnp.float32),
            jnp.asarray(K, jnp.float32),
        )
        return jax.tree_util.tree_map(np.asarray, out)


@dataclass
class RunStats:
    frames: int = 0
    hands: int = 0
    skipped: int = 0
    total_s: float = 0.0


def process_image_dir(
    input_dir: str,
    output_dir: str,
    params: Dict[str, Any],
    mano_model: ManoModel,
    cfg: Optional[PipelineConfig] = None,
    intrinsics_path: Optional[str] = None,
    save_obj: bool = True,
    attn_impl=None,
    progress: bool = True,
    batch_size: int = 1,
) -> RunStats:
    """CLI-parity batch inference: per-image .npy + .obj outputs.

    ``batch_size`` > 1 routes chunks through the stage-batched program
    (serving.BatchedPipeline) — same per-image outputs, device dispatch
    amortized over the chunk (the single-frame program is tunnel-
    latency-bound at ~28 ms/dispatch on this environment)."""
    import cv2

    cfg = cfg or PipelineConfig()
    os.makedirs(output_dir, exist_ok=True)
    obj_dir = os.path.join(output_dir, "obj")
    if save_obj:
        os.makedirs(obj_dir, exist_ok=True)

    if intrinsics_path and os.path.exists(intrinsics_path):
        K = load_intrinsics(intrinsics_path)
    else:
        K = None

    stats = RunStats()
    paths = list_images(input_dir)
    t0 = time.time()

    def write_frame(name: str, out: Dict[str, np.ndarray]) -> None:
        results = frame_outputs_to_hand_dicts(out)
        save_hand_npy(os.path.join(output_dir, f"{name}.npy"), results)
        n_hands = sum(1 for v in results.values() if v is not None)
        stats.hands += n_hands
        if save_obj and n_hands:
            reconstruct_and_save_obj(
                mano_model, results, os.path.join(obj_dir, f"{name}.obj")
            )
        stats.frames += 1
        if progress:
            print(f"[{stats.frames}/{len(paths)}] {name}: {n_hands} hand(s)")

    if batch_size > 1:
        # Throughput mode: chunks of frames through the stage-batched
        # program (pipeline.frame.infer_frames) — amortizes the
        # per-dispatch latency that dominates single-frame mode.
        from hamer_yolo_tpu.pipeline.serving import BatchedPipeline

        pipe = BatchedPipeline(params, mano_model, cfg,
                               batch_size=batch_size, attn_impl=attn_impl)
        chunk: list = []

        def flush():
            if not chunk:
                return
            names, frames, Ks = zip(*chunk)
            try:
                out = pipe.process_batch(list(frames), np.stack(Ks))
                for i, name in enumerate(names):
                    write_frame(name, {k: np.asarray(v[i])
                                       for k, v in out.items()})
            except Exception as e:  # whole-chunk failure
                stats.skipped += len(chunk)
                if progress:
                    print(f"skip chunk [{names[0]}..{names[-1]}]: {e}")
            chunk.clear()

        for path in paths:
            name = os.path.splitext(os.path.basename(path))[0]
            image = cv2.imread(path)
            if image is None:
                stats.skipped += 1
                continue
            Ki = K if K is not None else _default_intrinsics(image.shape)
            # keep cv2's uint8: BatchedPipeline uploads it as-is (4x
            # fewer H2D bytes) and casts on-device, bit-identically
            chunk.append((name, image, Ki))
            if len(chunk) == batch_size:
                flush()
        flush()
        stats.total_s = time.time() - t0
        return stats

    program = FrameProgram(params, mano_model, cfg, attn_impl)
    for path in paths:
        name = os.path.splitext(os.path.basename(path))[0]
        try:
            image = cv2.imread(path)
            if image is None:
                stats.skipped += 1
                continue
            Ki = K if K is not None else _default_intrinsics(image.shape)
            out = program(image, Ki)  # uint8 uploads as-is (cast on-device)
            write_frame(name, out)
        except Exception as e:  # per-frame robustness (reference behavior)
            stats.skipped += 1
            if progress:
                print(f"skip {name}: {e}")
    stats.total_s = time.time() - t0
    return stats


def process_masked_dir(
    input_dir: str,
    mask_dir: str,
    output_dir: str,
    params: Dict[str, Any],
    mano_model: ManoModel,
    cfg: Optional[PipelineConfig] = None,
    intrinsics_path: Optional[str] = None,
    mask_value: int = 3,
    mask_hand: str = "right",
    save_obj: bool = True,
) -> RunStats:
    """Mask-driven variant (reference process_batch_manopara_with_mask):
    per-image .npy mask -> bbox of `mask_value` pixels -> pipeline with the
    detector bypassed."""
    import cv2

    import jax.numpy as jnp

    from hamer_yolo_tpu.io.writers import frame_outputs_to_hand_dicts, save_hand_npy
    from hamer_yolo_tpu.pipeline.frame import infer_frame_with_boxes
    from hamer_yolo_tpu.pipeline.reconstruct import reconstruct_and_save_obj
    from hamer_yolo_tpu.pipeline.sar_mesh import bbox_from_mask

    cfg = cfg or PipelineConfig()
    os.makedirs(output_dir, exist_ok=True)
    obj_dir = os.path.join(output_dir, "obj")
    if save_obj:
        os.makedirs(obj_dir, exist_ok=True)
    K_fixed = load_intrinsics(intrinsics_path) if intrinsics_path and \
        os.path.exists(intrinsics_path) else None

    fn_cache: Dict[Tuple[int, int], Any] = {}

    def fn_for(bucket):
        if bucket not in fn_cache:
            mano, pcfg = mano_model, cfg

            @jax.jit
            def fn(p, image, boxes, is_right, valid, hw, K):
                return infer_frame_with_boxes(p, mano, image, boxes, is_right,
                                              valid, hw, K, pcfg)

            fn_cache[bucket] = fn
        return fn_cache[bucket]

    stats = RunStats()
    t0 = time.time()
    for path in list_images(input_dir):
        name = os.path.splitext(os.path.basename(path))[0]
        try:
            image = cv2.imread(path)
            mask_path = os.path.join(mask_dir, f"{name}.npy")
            if image is None or not os.path.exists(mask_path):
                stats.skipped += 1
                continue
            bbox = bbox_from_mask(np.load(mask_path), mask_value)
            if bbox is None:
                stats.skipped += 1
                continue
            h, w = image.shape[:2]
            bh, bw = pick_bucket(h, w)
            padded = np.zeros((bh, bw, 3), np.float32)
            padded[:h, :w] = image
            S = cfg.max_hands
            boxes = np.zeros((S, 4), np.float32)
            boxes[0] = bbox
            valid = np.zeros((S,), np.float32)
            valid[0] = 1.0
            is_right = np.full((S,), 1.0 if mask_hand == "right" else 0.0, np.float32)
            K = K_fixed if K_fixed is not None else _default_intrinsics(image.shape)
            out = fn_for((bh, bw))(
                params, jnp.asarray(padded), jnp.asarray(boxes),
                jnp.asarray(is_right), jnp.asarray(valid),
                jnp.asarray([h, w], jnp.float32), jnp.asarray(K),
            )
            out = jax.tree_util.tree_map(np.asarray, out)
            results = frame_outputs_to_hand_dicts(out)
            save_hand_npy(os.path.join(output_dir, f"{name}.npy"), results)
            if save_obj and any(v is not None for v in results.values()):
                reconstruct_and_save_obj(mano_model, results,
                                         os.path.join(obj_dir, f"{name}.obj"))
            stats.frames += 1
            stats.hands += 1
        except Exception as e:
            stats.skipped += 1
            print(f"skip {name}: {e}")
    stats.total_s = time.time() - t0
    return stats


def _default_intrinsics(shape) -> np.ndarray:
    """Reference fallback: f = 5000/256 * max(h, w), principal point center."""
    h, w = shape[:2]
    f = 5000.0 / 256.0 * max(h, w)
    return np.array([[f, 0, w / 2], [0, f, h / 2], [0, 0, 1]], np.float32)
