"""Qualify the detect-skip tracking program (serving detect_every=K).

Interleaved in-process A/B (the only timing protocol that survives this
chip's ~5% run-to-run drift, see CLAUDE.md) between the two frame-batch
programs at the bench default config (int8-static megakernels, b128,
720p):

- DETECT arm: ``pipeline.frame.infer_frames`` — letterbox + YOLOv7 trunk
  + NMS + HaMeR + SAR (what every tick runs at detect_every=1).
- TRACKED arm: ``pipeline.frame.infer_frames_tracked`` — boxes derived
  on-device from the previous tick's projected 2D keypoints
  (geometry.boxes.track_boxes_from_keypoints); the detector stage
  disappears entirely.

The detector is ~148 ms of the 446 ms b128 device time
(assets/profile_stages_poly_r03.log), so the tracked program should land
near 300 ms. The report includes the amortized serving throughput for
detect_every=K (K-1 tracked ticks per keyframe) and a BOX-ROUNDTRIP
accuracy probe: keypoints constructed so their tracked extent reproduces
the detector's own boxes must yield the detect program's outputs
(scores aside — they're passthrough). That isolates the tracked
program's numeric path; it does NOT measure real tracking drift, which
depends on the model's keypoints landing on the hand — meaningless on
random weights (a naive probe feeding random-weight kp2d back in
measures detector-vs-noise box divergence, ~130 mm, not tracking).
The reference re-detects every frame (yolo/detector.py:35-104), so it
has no comparable mode.

Timing rule (CLAUDE.md): every timed program reduces to a scalar that
the host fetches; arms interleave within one process.

Usage: BENCH_BATCH=128 python tools/bench_tracking.py
Env: BENCH_BATCH (128), BENCH_ITERS (8), BENCH_MAX_HANDS (2),
BENCH_INT8 (1, the bench default math).
"""
from __future__ import annotations

import dataclasses
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    import jax
    import jax.numpy as jnp

    from hamer_yolo_tpu.core.checkpoint import init_pipeline_params
    from hamer_yolo_tpu.core.mano_assets import (load_mano_model,
                                                 synthetic_mano_model)
    from hamer_yolo_tpu.models.mano import ManoModel
    from hamer_yolo_tpu.pipeline.frame import (PipelineConfig, infer_frames,
                                               infer_frames_tracked)

    batch = int(os.environ.get("BENCH_BATCH", "128"))
    iters = int(os.environ.get("BENCH_ITERS", "8"))
    max_hands = int(os.environ.get("BENCH_MAX_HANDS", "2"))
    H, W = 720, 1280

    cfg = PipelineConfig(max_hands=max_hands)
    if os.environ.get("BENCH_INT8", "1") == "1":
        cfg = dataclasses.replace(
            cfg, hamer=dataclasses.replace(cfg.hamer, int8_backbone=True))

    try:
        mano = ManoModel.from_arrays(load_mano_model("right"))
    except Exception:
        mano = ManoModel.from_arrays(synthetic_mano_model())
    params = init_pipeline_params(jax.random.PRNGKey(0), mano,
                                  yolo_cfg=cfg.yolo, hamer_cfg=cfg.hamer,
                                  sar_cfg=cfg.sar)
    if cfg.hamer.int8_backbone:
        from hamer_yolo_tpu.core.quant import (attach_static_act_scales,
                                               collect_vit_act_stats,
                                               quantize_vit_params)

        params["hamer"]["backbone"] = jax.jit(quantize_vit_params)(
            params["hamer"]["backbone"])
        crng = np.random.default_rng(1)
        calib = jnp.asarray(crng.standard_normal((8, 256, 192, 3)),
                            jnp.float32)
        stats = jax.jit(lambda p, x: collect_vit_act_stats(
            p, x, cfg.hamer.vit))(params["hamer"]["backbone"], calib)
        params["hamer"]["backbone"] = attach_static_act_scales(
            params["hamer"]["backbone"], stats)
    params = jax.device_put(params)

    rng = np.random.default_rng(0)
    images = jnp.asarray(
        rng.integers(0, 255, (batch, H, W, 3)).astype(np.float32))
    hws = jnp.broadcast_to(jnp.asarray([H, W], jnp.float32), (batch, 2))
    Ks = jnp.broadcast_to(jnp.asarray(
        [[906.96, 0, W / 2], [0, 906.79, H / 2], [0, 0, 1]], jnp.float32),
        (batch, 3, 3))

    def _checksum(tree):
        leaves = jax.tree_util.tree_leaves(tree)
        return sum(jnp.sum(l.astype(jnp.float32)) for l in leaves)

    det_fn = jax.jit(lambda p, i, hw, k: infer_frames(p, mano, i, hw, k, cfg))
    det_sum = jax.jit(
        lambda p, i, hw, k: _checksum(infer_frames(p, mano, i, hw, k, cfg)))
    trk_sum = jax.jit(
        lambda p, i, kp, ir, v, hw, k: _checksum(infer_frames_tracked(
            p, mano, i, kp, ir, v, hw, k, cfg)))
    trk_fn = jax.jit(lambda p, i, kp, ir, v, hw, k: infer_frames_tracked(
        p, mano, i, kp, ir, v, hw, k, cfg))

    # Timing inputs for the tracked arm: ALL slots valid (worst-case
    # occupancy; the fixed-slot downstream cost is validity-independent,
    # but box geometry should be hand-plausible).
    S = max_hands
    kp = np.zeros((batch, S, 21, 2), np.float32)
    centers = rng.uniform([200, 200], [W - 200, H - 200], (batch, S, 2))
    kp[:] = centers[..., None, :] + rng.uniform(
        -60, 60, (batch, S, 21, 2)).astype(np.float32)
    kp_j = jnp.asarray(kp)
    ones = jnp.ones((batch, S), jnp.float32)

    print("compiling detect arm ...", flush=True)
    det_out = det_fn(params, images, hws, Ks)
    n_valid = int(np.asarray(det_out["valid"]).sum())
    float(det_sum(params, images, hws, Ks))
    print(f"detect arm compiled; {n_valid} valid slots on noise frames",
          flush=True)
    print("compiling tracked arm ...", flush=True)
    float(trk_sum(params, images, kp_j, ones, ones, hws, Ks))

    det_t, trk_t = [], []
    for i in range(iters):
        t0 = time.time()
        float(det_sum(params, images, hws, Ks))
        det_t.append(time.time() - t0)
        t0 = time.time()
        float(trk_sum(params, images, kp_j, ones, ones, hws, Ks))
        trk_t.append(time.time() - t0)
        print(f"iter {i}: detect {det_t[-1]*1e3:.1f} ms  "
              f"tracked {trk_t[-1]*1e3:.1f} ms", flush=True)

    det_p50 = float(np.percentile(det_t, 50))
    trk_p50 = float(np.percentile(trk_t, 50))

    # Box-roundtrip probe: kp whose tracked extent reproduces the
    # detector's boxes -> the tracked program must match the detect
    # program on those slots (same boxes -> same crops -> same math).
    acc = None
    if n_valid:
        expand = 1.3  # infer_frames_tracked default track_expand
        boxes = np.asarray(det_out["boxes"], np.float64)  # (B, S, 4)
        c = (boxes[..., :2] + boxes[..., 2:]) / 2.0
        wh = boxes[..., 2:] - boxes[..., :2]
        rkp = np.broadcast_to(c[..., None, :],
                              boxes.shape[:2] + (21, 2)).copy()
        rkp[..., 0, :] = c - wh / (2.0 * expand)
        rkp[..., 1, :] = c + wh / (2.0 * expand)
        trk_out = trk_fn(params, images, jnp.asarray(rkp, jnp.float32),
                         det_out["is_right"], det_out["valid"], hws, Ks)
        # min_size=32 inflates sub-32px detections by design; compare
        # only slots the roundtrip can represent.
        v = (np.asarray(det_out["valid"], bool)
             & (wh >= 32.0).all(axis=-1))
        db = np.abs(np.asarray(trk_out["boxes"], np.float64) - boxes)
        dv = (np.asarray(trk_out["vertices"], np.float64)
              - np.asarray(det_out["vertices"], np.float64))
        mpvpe = float(np.linalg.norm(dv[v], axis=-1).mean() * 1e3)
        acc = {"box_roundtrip_mpvpe_mm": round(mpvpe, 4),
               "box_roundtrip_max_px": round(float(db[v].max()), 3),
               "roundtrip_slots": int(v.sum()), "valid_slots": n_valid}
        print(f"box-roundtrip MPVPE {mpvpe:.4f} mm, max box delta "
              f"{db[v].max():.3f} px over {int(v.sum())} slots", flush=True)

    amort = {
        f"detect_every_{k}_fps": round(
            batch * k / (det_p50 + (k - 1) * trk_p50), 1)
        for k in (1, 2, 4, 8)
    }
    print(json.dumps({
        "batch": batch,
        "detect_p50_ms": round(det_p50 * 1e3, 1),
        "tracked_p50_ms": round(trk_p50 * 1e3, 1),
        "detector_saving_ms": round((det_p50 - trk_p50) * 1e3, 1),
        "tracked_fps": round(batch / trk_p50, 1),
        **amort,
        "accuracy": acc,
        "device": str(jax.devices()[0]),
    }))


if __name__ == "__main__":
    import sys as _sys  # _hyt_help_guard
    if "-h" in _sys.argv or "--help" in _sys.argv:
        print(__doc__ or "env-configured tool; see module docstring")
        raise SystemExit(0)
    main()
