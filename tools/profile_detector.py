"""Stage attribution INSIDE the detector at the bench batch.

The e2e cost map (tools/profile_stages.py) prices the whole detector
stage (~163 ms/b128 device time); this tool splits it by ablation, all
arms compiled in one process and timed interleaved (the bench_attn_ab
discipline — wall-clock drift hits every arm equally):

  letterbox   device letterbox 720p -> 640 only
  trunk       letterbox + YOLOv7 trunk + head decode (no NMS)
  full        letterbox + trunk + NMS + scale_coords (= deployed stage,
              detect_hands_batched)

  python tools/profile_detector.py [batch] [iters]
"""
from __future__ import annotations

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    import jax
    import jax.numpy as jnp

    from hamer_yolo_tpu.core.checkpoint import init_pipeline_params
    from hamer_yolo_tpu.core.mano_assets import (load_mano_model,
                                                 synthetic_mano_model)
    from hamer_yolo_tpu.models.mano import ManoModel
    from hamer_yolo_tpu.models.yolov7 import yolov7_forward
    from hamer_yolo_tpu.pipeline.frame import (PipelineConfig,
                                               detect_hands_batched)
    from hamer_yolo_tpu.pipeline.preprocess import device_letterbox

    batch = int(sys.argv[1]) if len(sys.argv) > 1 else 128
    iters = int(sys.argv[2]) if len(sys.argv) > 2 else 10
    H, W = 720, 1280

    cfg = PipelineConfig(max_hands=2)
    try:
        mano = ManoModel.from_arrays(load_mano_model("right"))
    except Exception:
        mano = ManoModel.from_arrays(synthetic_mano_model())
    params = init_pipeline_params(jax.random.PRNGKey(0), mano,
                                  yolo_cfg=cfg.yolo, hamer_cfg=cfg.hamer,
                                  sar_cfg=cfg.sar)
    yolo = jax.device_put(params["yolo"])

    rng = np.random.default_rng(0)
    image = jnp.asarray(rng.integers(0, 255, (H, W, 3)).astype(np.float32))
    images = jnp.broadcast_to(image, (batch, H, W, 3))
    hws = jnp.broadcast_to(jnp.asarray([H, W], jnp.float32), (batch, 2))

    @jax.jit
    def letterbox(images, hws):
        lb, r, pad = jax.vmap(
            lambda i, h: device_letterbox(i, h, cfg.det_size))(images, hws)
        return jnp.sum(lb.astype(jnp.float32)) + jnp.sum(r) + jnp.sum(pad)

    @jax.jit
    def trunk(p, images, hws):
        lb, r, pad = jax.vmap(
            lambda i, h: device_letterbox(i, h, cfg.det_size))(images, hws)
        pred = yolov7_forward(p, lb[..., ::-1] / 255.0, cfg.yolo)
        return jnp.sum(pred.astype(jnp.float32)) + jnp.sum(r) + jnp.sum(pad)

    @jax.jit
    def full(p, images, hws):
        det = detect_hands_batched(p, images, hws, cfg)
        return sum(jnp.sum(det[k].astype(jnp.float32))
                   for k in ("boxes", "scores", "is_right", "valid"))

    arms = {"letterbox": lambda: letterbox(images, hws),
            "trunk": lambda: trunk(yolo, images, hws),
            "full": lambda: full(yolo, images, hws)}
    for name, fn in arms.items():
        t0 = time.time()
        float(fn())
        print(f"{name}: compiled in {time.time() - t0:.0f}s", flush=True)

    times = {n: [] for n in arms}
    for it in range(iters):
        for n, fn in arms.items():
            t0 = time.time()
            float(fn())
            times[n].append(time.time() - t0)

    p50s = {}
    for n, ts in times.items():
        p50s[n] = float(np.percentile(np.asarray(ts) * 1e3, 50))
        print(f"{n:10s} p50 {p50s[n]:8.1f} ms  "
              f"({p50s[n] / batch:6.3f} ms/img)")
    print(f"attribution (ms/b{batch}, tunnel overhead cancels in deltas): "
          f"letterbox~{p50s['letterbox'] - 28:.0f}  "
          f"trunk+decode {p50s['trunk'] - p50s['letterbox']:.0f}  "
          f"nms+scale {p50s['full'] - p50s['trunk']:.0f}")


if __name__ == "__main__":
    import sys as _sys  # _hyt_help_guard
    if "-h" in _sys.argv or "--help" in _sys.argv:
        print(__doc__ or "env-configured tool; see module docstring")
        raise SystemExit(0)
    main()
