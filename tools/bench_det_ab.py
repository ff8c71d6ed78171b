"""Interleaved detector A/B: bf16 vs int8 YOLO trunk variants.

Same qualification discipline as tools/bench_attn_ab.py (CLAUDE.md:
back-to-back bench.py runs drift ~5% on wall-clock timescales, so every
arm is compiled in ONE process and timed interleaved A B C A B C ...).

Arms:
  bf16       the exact trunk (current deployment default)
  int8_1x1   pointwise convs as static-scale int8 dot_general
  int8_all   every trunk conv int8 — spatial convs as shifted int8
             GEMMs (core/nn.conv2d "sx" branch)

The measured program is bench.py's detector-only surface: device
letterbox 720p -> YOLOv7 640 -> NMS, vmapped over the batch —
apples-to-apples with the reference's own headline benchmark
(yolo/yolov7/README.md:26, V100 batch-32 2.8 ms/img).

  python tools/bench_det_ab.py [batch] [iters]
"""
from __future__ import annotations

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    import functools

    import jax
    import jax.numpy as jnp

    from hamer_yolo_tpu.core.checkpoint import init_pipeline_params
    from hamer_yolo_tpu.core.mano_assets import (load_mano_model,
                                                 synthetic_mano_model)
    from hamer_yolo_tpu.core.quant import (calibrate_yolo_act_scales,
                                           quantize_yolo_params)
    from hamer_yolo_tpu.models.mano import ManoModel
    from hamer_yolo_tpu.pipeline.frame import PipelineConfig, detect_hands

    batch = int(sys.argv[1]) if len(sys.argv) > 1 else 128
    iters = int(sys.argv[2]) if len(sys.argv) > 2 else 8
    H, W = 720, 1280

    cfg = PipelineConfig(max_hands=2)
    try:
        mano = ManoModel.from_arrays(load_mano_model("right"))
    except Exception:
        mano = ManoModel.from_arrays(synthetic_mano_model())
    params = init_pipeline_params(jax.random.PRNGKey(0), mano,
                                  yolo_cfg=cfg.yolo, hamer_cfg=cfg.hamer,
                                  sar_cfg=cfg.sar)

    crng = np.random.default_rng(2)
    calib = crng.random((2, cfg.det_size, cfg.det_size, 3),
                        dtype=np.float64).astype(np.float32)

    def quantized(only_1x1: bool):
        q = jax.jit(functools.partial(quantize_yolo_params,
                                      only_1x1=only_1x1))(params["yolo"])
        return jax.device_put(calibrate_yolo_act_scales(q, calib, cfg.yolo))

    arms = {"bf16": jax.device_put(params["yolo"])}
    for name in os.environ.get("BENCH_DET_ARMS",
                               "bf16,int8_1x1,int8_all").split(","):
        if name == "int8_1x1":
            arms[name] = quantized(only_1x1=True)
        elif name == "int8_all":
            arms[name] = quantized(only_1x1=False)

    def checksum(yolo_params, images, hws):
        def one(i, hw):
            det = detect_hands(yolo_params, i, hw, cfg)
            return (jnp.sum(det["boxes"]) + jnp.sum(det["scores"])
                    + jnp.sum(det["valid"]))
        return jnp.sum(jax.vmap(one)(images, hws))

    run = jax.jit(checksum)

    rng = np.random.default_rng(0)
    image = jnp.asarray(rng.integers(0, 255, (H, W, 3)).astype(np.float32))
    images = jnp.broadcast_to(image, (batch, H, W, 3))
    hws = jnp.broadcast_to(jnp.asarray([H, W], jnp.float32), (batch, 2))

    fns = {}
    for name, yp in arms.items():
        t0 = time.time()
        try:
            float(run(yp, images, hws))
        except Exception as e:
            print(f"{name}: FAILED: {type(e).__name__}: {str(e)[:400]}",
                  flush=True)
            continue
        print(f"{name}: compiled in {time.time() - t0:.0f}s", flush=True)
        fns[name] = yp

    times = {name: [] for name in fns}
    for it in range(iters):
        for name, yp in fns.items():
            t0 = time.time()
            float(run(yp, images, hws))
            times[name].append(time.time() - t0)
        print(f"iter {it}: " + "  ".join(
            f"{n} {times[n][-1]*1e3:7.1f} ms" for n in fns), flush=True)

    for name, ts in times.items():
        ts = np.array(ts)
        p50 = float(np.percentile(ts, 50))
        print(f"{name:9s} p50 {p50*1e3:7.1f} ms  ({p50*1e3/batch:6.3f} "
              f"ms/img, {batch/p50:7.1f} fps)  min {ts.min()*1e3:7.1f}  "
              f"max {ts.max()*1e3:7.1f}", flush=True)

    if os.environ.get("BENCH_DET_ACC", "1") == "1" and "bf16" in fns:
        # Accuracy deltas vs the bf16 arm on the SAME frame: post-NMS box
        # drift of matched slots + score drift. Untimed (one extra
        # compile per arm).
        def boxes(yolo_params, image, hw):
            det = detect_hands(yolo_params, image, hw, cfg)
            return det["boxes"], det["scores"], det["valid"]

        bfn = jax.jit(boxes)
        hw1 = jnp.asarray([H, W], jnp.float32)
        ref = None
        for name, yp in fns.items():
            b, s, v = (np.asarray(a) for a in bfn(yp, image, hw1))
            if name == "bf16":
                ref = (b, s, v)
                continue
            rb, rs, rv = ref
            both = (v > 0) & (rv > 0)
            if both.any():
                dbox = float(np.abs(b[both] - rb[both]).max())
                dscore = float(np.abs(s[both] - rs[both]).max())
            else:
                dbox = dscore = float("nan")
            print(f"acc {name:9s} valid {int(v.sum())}/{int(rv.sum())} "
                  f"max|dbox| {dbox:.2f} px  max|dscore| {dscore:.4f}",
                  flush=True)


if __name__ == "__main__":
    import sys as _sys  # _hyt_help_guard
    if "-h" in _sys.argv or "--help" in _sys.argv:
        print(__doc__ or "env-configured tool; see module docstring")
        raise SystemExit(0)
    main()
