"""Interleaved A/B: uint8 vs float32 frame upload through the tunnel.

The steady-state bench keeps inputs resident on device, so H2D never
shows up in the 293-fps headline. REAL streaming uploads every tick;
at b32 720p a float32 batch is ~354 MB vs ~88 MB uint8 — on the
tunnel-attached chip the upload is the binding constraint of the
pipelined stream path, so the 4x byte cut should show directly in
end-to-end wall time. This measures full process_batch wall (pad +
upload + compute + fetch) with FRESH host arrays per call, interleaving
the two arms per iteration (CLAUDE.md: back-to-back runs drift ~5%).

Usage: python tools/bench_upload.py [--batch 32] [--iters 6]
"""
from __future__ import annotations

import argparse
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=32)
    ap.add_argument("--iters", type=int, default=6)
    ap.add_argument("--height", type=int, default=720)
    ap.add_argument("--width", type=int, default=1280)
    args = ap.parse_args()

    import jax

    import hamer_yolo_tpu  # noqa: F401  (platform + cache config)
    from hamer_yolo_tpu.core.checkpoint import init_pipeline_params
    from hamer_yolo_tpu.core.mano_assets import load_mano_model
    from hamer_yolo_tpu.models.mano import ManoModel
    from hamer_yolo_tpu.pipeline.frame import PipelineConfig
    from hamer_yolo_tpu.pipeline.serving import BatchedPipeline

    print("devices:", jax.devices())
    cfg = PipelineConfig()
    mano = ManoModel.from_arrays(load_mano_model("right"))
    params = init_pipeline_params(jax.random.PRNGKey(0), mano,
                                  yolo_cfg=cfg.yolo, hamer_cfg=cfg.hamer,
                                  sar_cfg=cfg.sar)
    pipe = BatchedPipeline(params, mano, cfg, batch_size=args.batch,
                           bucket_hw=(args.height, args.width))
    K = np.array([[906.96, 0, 960], [0, 906.79, 540], [0, 0, 1]], np.float32)

    rng = np.random.default_rng(0)
    base = rng.integers(0, 255, (args.batch, args.height, args.width, 3))
    frames_u8 = [f.astype(np.uint8) for f in base]
    frames_f32 = [f.astype(np.float32) for f in base]

    # warm both programs (compile + first upload)
    t0 = time.time()
    pipe.process_batch(frames_u8, K)
    print(f"warm uint8 (compile): {time.time() - t0:.1f}s", flush=True)
    t0 = time.time()
    pipe.process_batch(frames_f32, K)
    print(f"warm f32 (compile): {time.time() - t0:.1f}s", flush=True)

    times = {"u8": [], "f32": []}
    for it in range(args.iters):
        for name, frames in (("u8", frames_u8), ("f32", frames_f32)):
            # fresh copies so no caching hides the host-side cost
            fresh = [f.copy() for f in frames]
            t0 = time.time()
            out = pipe.process_batch(fresh, K)
            _ = float(np.asarray(out["cam_t"]).sum())  # force full fetch
            dt = time.time() - t0
            times[name].append(dt)
            print(f"iter {it} {name}: {dt * 1000:.1f} ms", flush=True)

    for name in ("u8", "f32"):
        arr = np.array(times[name]) * 1000
        print(f"{name}: p50 {np.percentile(arr, 50):.1f} ms "
              f"min {arr.min():.1f} ms over {len(arr)}")
    mb_u8 = args.batch * args.height * args.width * 3 / 1e6
    print(f"upload bytes/batch: uint8 {mb_u8:.0f} MB vs f32 {4 * mb_u8:.0f} MB")


if __name__ == "__main__":
    main()
