"""Benchmark every YOLOv7 variant the reference publishes numbers for.

The reference's ONLY quantitative performance claims are the vendored
YOLOv7 README table (yolo/yolov7/README.md:26-32, Tesla V100, batch-32
average inference time): yolov7 2.8 ms / yolov7x 4.3 ms @640 and
yolov7-w6 7.6 / e6 12.3 / d6 15.0 / e6e 18.7 ms @1280. bench.py covers
the base model; this tool sweeps the rest — each variant built from the
reference's own deploy yaml by the spec loader
(models/yolov7/yaml_spec.py), random weights (throughput is
weight-independent), bf16 trunk + f32 decode + batched NMS on one v5e
chip.

Two columns per variant: `ours_ms_per_img` includes sigmoid decode +
the full fixed-capacity NMS (conf 0.25 / iou 0.35, max_det 300, 512
static candidates) — conservative in our disfavor, since the V100
figure is model-forward-only (yolov7/test.py times the forward pass
and reports NMS separately); `fwd_ms_per_img` is the like-for-like
forward-only (trunk + Detect-head decode) number.

Timing rule (CLAUDE.md): jit reduces to a scalar, host fetches it.

Usage: python tools/bench_variants.py  [BENCH_ITERS=6 BENCH_BATCH=32]
Writes one JSON line per variant + a summary line.
"""
from __future__ import annotations

import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

REF_CFG = "/root/reference/yolo/yolov7/cfg/deploy"

# (yaml, img size, V100 batch-32 ms/img, V100 batch-1 fps) from
# yolo/yolov7/README.md:26-32.
VARIANTS = [
    ("yolov7.yaml", 640, 2.8, 161),
    ("yolov7x.yaml", 640, 4.3, 114),
    ("yolov7-w6.yaml", 1280, 7.6, 84),
    ("yolov7-e6.yaml", 1280, 12.3, 56),
    ("yolov7-d6.yaml", 1280, 15.0, 44),
    ("yolov7-e6e.yaml", 1280, 18.7, 36),
]


def main():
    import jax
    import jax.numpy as jnp

    from hamer_yolo_tpu.models.yolov7.model import init_yolov7, yolov7_forward
    from hamer_yolo_tpu.models.yolov7.yaml_spec import load_yaml_model_cfg
    from hamer_yolo_tpu.ops.nms import non_max_suppression

    iters = int(os.environ.get("BENCH_ITERS", "6"))
    batch = int(os.environ.get("BENCH_BATCH", "32"))
    rng = np.random.default_rng(0)
    results = {}

    for name, size, v100_ms, v100_fps in VARIANTS:
        spec, cfg = load_yaml_model_cfg(os.path.join(REF_CFG, name), nc=3)

        def det_sum(params, x, spec=spec, cfg=cfg):
            pred = yolov7_forward(params, x, cfg, spec=spec)
            nms = non_max_suppression(pred, conf_thres=0.25, iou_thres=0.35,
                                      classes=(0, 1, 2), agnostic=True,
                                      max_det=300, max_nms_static=512)
            return (jnp.sum(nms.boxes.astype(jnp.float32))
                    + jnp.sum(nms.scores.astype(jnp.float32))
                    + jnp.sum(nms.valid))

        def fwd_sum(params, x, spec=spec, cfg=cfg):
            return jnp.sum(
                yolov7_forward(params, x, cfg, spec=spec).astype(jnp.float32))

        params = jax.device_put(init_yolov7(jax.random.PRNGKey(0), cfg,
                                            spec=spec))
        x = jnp.asarray(rng.random((batch, size, size, 3), np.float32))

        def timed(f):
            fn = jax.jit(f)
            t0 = time.time()
            float(fn(params, x))
            print(f"{name}: compiled in {time.time()-t0:.0f}s", flush=True)
            lat = []
            for _ in range(iters):
                t0 = time.time()
                float(fn(params, x))
                lat.append(time.time() - t0)
            return float(np.percentile(lat, 50))

        print(f"{name}: compiling @{size} b{batch} ...", flush=True)
        p50 = timed(det_sum)
        fwd_p50 = timed(fwd_sum)
        ours_ms = p50 / batch * 1e3
        fwd_ms = fwd_p50 / batch * 1e3
        row = {
            "img_size": size, "batch": batch,
            "ours_ms_per_img": round(ours_ms, 3),
            "ours_fps": round(batch / p50, 1),
            "fwd_ms_per_img": round(fwd_ms, 3),
            "v100_ms_per_img_b32": v100_ms,
            "v100_fps_b1": v100_fps,
            "speedup_vs_v100": round(v100_ms / ours_ms, 2),
            "fwd_speedup_vs_v100": round(v100_ms / fwd_ms, 2),
        }
        results[name.removesuffix(".yaml")] = row
        print(json.dumps({name.removesuffix(".yaml"): row}), flush=True)
        del params, x

    print(json.dumps({
        "summary": results,
        "note": "V100 column is the reference's own published table "
                "(yolo/yolov7/README.md:26-32, model-forward-only); ours "
                "includes decode + fixed-capacity NMS.",
        "device": str(jax.devices()[0]),
    }))


if __name__ == "__main__":
    import sys as _sys  # _hyt_help_guard
    if "-h" in _sys.argv or "--help" in _sys.argv:
        print(__doc__ or "env-configured tool; see module docstring")
        raise SystemExit(0)
    main()
