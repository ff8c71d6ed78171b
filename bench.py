"""Single-chip benchmark: end-to-end frame pipeline (detect -> mesh).

Runs the full-size jitted frame-batch program (YOLOv7 640 detect + NMS +
fused crops + HaMeR ViT-H + MANO LBS + camera lift + RootNet depth) on
one TPU chip over synthetic 720p frames and prints ONE JSON line:

  {"metric": "...", "value": N, "unit": "...", "vs_baseline": N}

vs_baseline compares against the reference's only published single-image
throughput figure: YOLOv7 batch-1 @640 = 161 fps on V100
(yolo/yolov7/README.md:26) — NOTE that figure is detector-only, while our
value is the FULL pipeline (detector + ViT-H mesh recovery + depth), so
vs_baseline is a conservative lower bound on relative speed.

DEFAULT CONFIGURATION: the qualified int8 hybrid ViT path with STATIC
calibrated activation scales + the megaproj attention-block megakernel +
poly-GELU MLP megakernel pair + stage-batched detector at batch 128
(BENCH_INT8=1, BENCH_INT8_STATIC=1, BENCH_BATCH=128). Accuracy delta:
1.40 mm MPVPE vs f32 (bf16-vs-f32 noise floor 0.83 mm;
tools/eval_fastpaths.py, int8_megaproj arm).

BUDGET DESIGN (round-3 postmortem: the driver run timed out, rc=124,
because four large programs compiled back-to-back behind the tunnel):
the DEFAULT mode compiles exactly ONE large program (the b128 batch
pipeline) and prints the headline JSON immediately after measuring it.
The single-frame-latency and detector-only sections are opt-in
(BENCH_FULL=1), tracking is opt-in (BENCH_TRACKING=1); each opt-in
re-prints an enriched JSON line when it completes, so the LAST JSON
line on stdout is always the most complete record. A persistent XLA
compilation cache (hamer_yolo_tpu/__init__.py, ~/.cache/hamer_yolo_tpu/
jax_cache) makes warm reruns skip the multi-minute tunnel compiles.

Env knobs: BENCH_FRAMES (timed iters, default 20), BENCH_MAX_HANDS (2),
BENCH_HW ("720x1280"), BENCH_BATCH (128), BENCH_INT8 (1),
BENCH_INT8_STATIC (1), BENCH_TOME (0), BENCH_INT8_YOLO (0, measured
loss), BENCH_ATTN, BENCH_FUSED_MANO, BENCH_FULL (0), BENCH_TRACKING (0).
"""
from __future__ import annotations

import functools
import json
import os
import time

import numpy as np


def main() -> None:
    import jax
    import jax.numpy as jnp

    from hamer_yolo_tpu.core.checkpoint import init_pipeline_params
    from hamer_yolo_tpu.core.mano_assets import load_mano_model, synthetic_mano_model
    from hamer_yolo_tpu.models.mano import ManoModel
    from hamer_yolo_tpu.pipeline.frame import PipelineConfig, infer_frame

    frames = int(os.environ.get("BENCH_FRAMES", "20"))
    max_hands = int(os.environ.get("BENCH_MAX_HANDS", "2"))
    hw = os.environ.get("BENCH_HW", "720x1280")
    H, W = (int(x) for x in hw.split("x"))

    # Optional kernel knobs (ablation): Pallas attention, fused MANO, ToMe.
    import dataclasses

    attn_impl = None
    if os.environ.get("BENCH_ATTN") == "pallas":
        from hamer_yolo_tpu.ops.attention import flash_mha_self_attention

        attn_impl = flash_mha_self_attention
    cfg = PipelineConfig(max_hands=max_hands)
    hamer_cfg = cfg.hamer
    if os.environ.get("BENCH_FUSED_MANO") == "1":
        hamer_cfg = dataclasses.replace(hamer_cfg, fused_mano=True)
    tome_r = int(os.environ.get("BENCH_TOME", "0"))
    if tome_r:
        hamer_cfg = dataclasses.replace(hamer_cfg, tome_r=tome_r)
    use_int8 = os.environ.get("BENCH_INT8", "1") == "1"
    if use_int8:
        hamer_cfg = dataclasses.replace(hamer_cfg, int8_backbone=True)
    cfg = dataclasses.replace(cfg, hamer=hamer_cfg)
    try:
        mano = ManoModel.from_arrays(load_mano_model("right"))
    except Exception:
        mano = ManoModel.from_arrays(synthetic_mano_model())

    key = jax.random.PRNGKey(0)
    params = init_pipeline_params(key, mano, yolo_cfg=cfg.yolo,
                                  hamer_cfg=cfg.hamer, sar_cfg=cfg.sar)
    if use_int8:
        from hamer_yolo_tpu.core.quant import quantize_vit_params

        params["hamer"]["backbone"] = jax.jit(quantize_vit_params)(
            params["hamer"]["backbone"])
        if os.environ.get("BENCH_INT8_STATIC", "1") == "1":
            # Static calibrated activation scales: the dynamic per-row
            # absmax pass disappears from every int8 GEMM (quantize
            # becomes a pure map fused into the prologue). Calibrate on
            # noise crops — scale VALUES don't affect throughput.
            from hamer_yolo_tpu.core.quant import (
                attach_static_act_scales, collect_vit_act_stats)

            crng = np.random.default_rng(1)
            # ViT input = the 256x192 center crop (hamer crop_margin 32).
            calib = jnp.asarray(crng.standard_normal((8, 256, 192, 3)),
                                jnp.float32)
            stats = jax.jit(lambda p, x: collect_vit_act_stats(
                p, x, cfg.hamer.vit))(params["hamer"]["backbone"], calib)
            params["hamer"]["backbone"] = attach_static_act_scales(
                params["hamer"]["backbone"], stats)
    yolo_mode = os.environ.get("BENCH_INT8_YOLO", "0")
    if yolo_mode in ("1", "all"):
        from hamer_yolo_tpu.core.quant import quantize_yolo_params

        # "1" = pointwise (1x1) convs only; "all" = every trunk conv —
        # spatial convs run as shifted int8 GEMMs (needs the static
        # calibrated scales below; nn.conv2d falls back to the widening
        # lowering without them, a measured loss).
        params["yolo"] = jax.jit(functools.partial(
            quantize_yolo_params, only_1x1=yolo_mode == "1"))(params["yolo"])
        if os.environ.get("BENCH_INT8_STATIC", "1") == "1":
            from hamer_yolo_tpu.core.quant import calibrate_yolo_act_scales

            crng = np.random.default_rng(2)
            calib_imgs = crng.random((2, cfg.det_size, cfg.det_size, 3),
                                     dtype=np.float64).astype(np.float32)
            params["yolo"] = calibrate_yolo_act_scales(
                params["yolo"], calib_imgs, cfg.yolo)

    def _payload(out):
        # The full npy-schema payload (what a serving loop fetches).
        return (out["boxes"], out["scores"], out["valid"], out["betas"],
                out["theta"], out["cam_t"], out["vertices"], out["root_depth"])

    def _checksum(tree):
        # TIMING RULE (CLAUDE.md): on the axon backend block_until_ready
        # can return before device completion — every timed program must
        # reduce to a scalar that the host then fetches (float()).
        leaves = jax.tree_util.tree_leaves(tree)
        return sum(jnp.sum(l.astype(jnp.float32)) for l in leaves)

    batch = int(os.environ.get("BENCH_BATCH", "128"))

    from hamer_yolo_tpu.pipeline.frame import infer_frames

    def _batch_raw(params, images, orig_hws, Ks):
        # Stage-batched program: natively batched detector trunk+NMS
        # (detect_hands_batched), ~22 ms/b128 faster than
        # vmap(infer_frame) — same outputs (tests/test_pipeline.py).
        return _payload(infer_frames(params, mano, images, orig_hws, Ks, cfg,
                                     attn_impl=attn_impl))

    batch_fn_sum = jax.jit(
        lambda p, i, hw, k: _checksum(_batch_raw(p, i, hw, k)))

    params = jax.device_put(params)

    rng = np.random.default_rng(0)
    image = jnp.asarray(rng.integers(0, 255, (H, W, 3)).astype(np.float32))
    orig_hw = jnp.asarray([H, W], jnp.float32)
    K = jnp.asarray([[906.96, 0, W / 2], [0, 906.79, H / 2], [0, 0, 1]],
                    jnp.float32)
    images = jnp.broadcast_to(image, (batch,) + image.shape)
    hws = jnp.broadcast_to(orig_hw, (batch, 2))
    Ks = jnp.broadcast_to(K, (batch, 3, 3))

    # THE headline program — the only large compile in default mode.
    t_compile = time.time()
    float(batch_fn_sum(params, images, hws, Ks))
    compile_s = time.time() - t_compile

    for _ in range(2):  # steady-state warmup
        float(batch_fn_sum(params, images, hws, Ks))
    tlat = []
    for _ in range(max(frames // 2, 3)):
        t0 = time.time()
        float(batch_fn_sum(params, images, hws, Ks))
        tlat.append(time.time() - t0)
    batch_p50 = float(np.percentile(np.array(tlat), 50))
    fps = batch / batch_p50

    baseline_fps = 161.0  # YOLOv7 batch-1 @640 V100, detector-only
    record = {
        "metric": "e2e_images_per_sec_per_chip",
        "value": round(fps, 3),
        "unit": "frames/s",
        "vs_baseline": round(fps / baseline_fps, 4),
        "extra": {
            "batch": batch,
            "batch_p50_ms": round(batch_p50 * 1e3, 2),
            "compile_s": round(compile_s, 1),
            "frame_hw": [H, W],
            "max_hands": max_hands,
            "device": str(jax.devices()[0]),
            "math": (("int8-hybrid + static act scales + megaproj/MLP "
                      "megakernels (qualified: 1.40 mm MPVPE vs f32, "
                      "noise floor 0.83 mm)"
                      if os.environ.get("BENCH_INT8_STATIC", "1") == "1"
                      else "int8-hybrid dynamic (qualified: 1.13 mm MPVPE "
                           "vs f32, noise floor 0.83 mm)") if use_int8
                     else "exact bf16/f32"),
            "tome_r": tome_r,
            # Full per-variant qualification table (static reference, NOT
            # measured by this run) lives in assets/fastpaths_r03.json;
            # reproduce any row with the env knobs documented there.
            "fastpaths_recorded": "assets/fastpaths_r03.json",
            "baseline_note": "vs_baseline is CROSS-SCOPE and conservative: "
                             "our value is the FULL pipeline (detect + ViT-H "
                             "mesh x2 hands + depth) while the 161 fps V100 "
                             "baseline is detector-only batch-1. "
                             "BENCH_FULL=1 adds the like-for-like "
                             "detector-only comparison (last round: 1.484 "
                             "ms/img b128 vs the reference's published 2.8 "
                             "ms/img V100 b32). See 'math' for the numeric "
                             "mode (exact bf16 via BENCH_INT8=0).",
        },
    }
    # Print the headline IMMEDIATELY: a record exists from this point on
    # even if an opt-in section below runs long.
    print(json.dumps(record), flush=True)

    enriched = False

    # Single-frame latency + detector-only sections (opt-in: two more
    # large tunnel compiles).
    if os.environ.get("BENCH_FULL", "0") == "1":
        frame_fn_sum = jax.jit(
            lambda p, i, hw, k: _checksum(_payload(infer_frame(
                p, mano, i, hw, k, cfg, attn_impl=attn_impl))))
        float(frame_fn_sum(params, image, orig_hw, K))  # compile
        for _ in range(3):
            float(frame_fn_sum(params, image, orig_hw, K))
        lat = []
        for _ in range(frames):
            t0 = time.time()
            float(frame_fn_sum(params, image, orig_hw, K))
            lat.append(time.time() - t0)
        lat = np.array(lat)
        p50 = float(np.percentile(lat, 50))
        record["extra"].update({
            "single_frame_p50_ms": round(p50 * 1e3, 2),
            "single_frame_fps": round(1.0 / p50, 2),
            "p90_latency_ms": round(float(np.percentile(lat, 90)) * 1e3, 2),
        })

        from hamer_yolo_tpu.pipeline.frame import detect_hands

        def _detector_raw(params, images, orig_hws):
            def one(i, hw):
                det = detect_hands(params["yolo"], i, hw, cfg)
                return det["boxes"], det["scores"], det["valid"]
            return jax.vmap(one)(images, orig_hws)

        detector_fn_sum = jax.jit(
            lambda p, i, hw: _checksum(_detector_raw(p, i, hw)))
        float(detector_fn_sum(params, images, hws))  # compile
        dlat = []
        for _ in range(max(frames // 2, 3)):
            t0 = time.time()
            float(detector_fn_sum(params, images, hws))
            dlat.append(time.time() - t0)
        det_p50 = float(np.percentile(np.array(dlat), 50))
        det_ms = det_p50 / batch * 1e3
        record["extra"]["reference_own_benchmark"] = {
            # The reference's ONLY published throughput numbers are the
            # vendored YOLOv7 table (yolo/yolov7/README.md:26): V100
            # batch-32 avg 2.8 ms/img @640. This is the like-for-like
            # comparison on the reference's own benchmark surface (ours
            # additionally includes the 720p->640 device letterbox).
            "surface": "detector batch avg ms/img @640",
            "v100_batch32_ms_per_img": 2.8,
            "ours_ms_per_img": round(det_ms, 3),
            "ours_fps": round(batch / det_p50, 1),
            "speedup_vs_reference": round(2.8 / det_ms, 2),
        }
        enriched = True

    # Detect-skip tracking throughput (opt-in; serving detect_every=K).
    if os.environ.get("BENCH_TRACKING", "0") == "1":
        from hamer_yolo_tpu.pipeline.frame import infer_frames_tracked

        trk_sum = jax.jit(
            lambda p, i, kp, ir, v, hw, k: _checksum(_payload(
                infer_frames_tracked(p, mano, i, kp, ir, v, hw, k, cfg,
                                     attn_impl=attn_impl))))
        S = max_hands
        kp = np.zeros((batch, S, 21, 2), np.float32)
        centers = rng.uniform([200, 200], [W - 200, H - 200], (batch, S, 2))
        kp[:] = centers[..., None, :] + rng.uniform(
            -60, 60, (batch, S, 21, 2)).astype(np.float32)
        kp_j = jnp.asarray(kp)
        ones = jnp.ones((batch, S), jnp.float32)
        float(trk_sum(params, images, kp_j, ones, ones, hws, Ks))  # compile
        trk_t = []
        for _ in range(max(frames // 2, 3)):
            t0 = time.time()
            float(trk_sum(params, images, kp_j, ones, ones, hws, Ks))
            trk_t.append(time.time() - t0)
        trk_p50 = float(np.percentile(np.array(trk_t), 50))
        record["extra"]["tracking_measured"] = {
            "tracked_tick_fps": round(batch / trk_p50, 1),
            "tracked_p50_ms": round(trk_p50 * 1e3, 1),
            **{f"detect_every_{k}_fps": round(
                batch * k / (batch_p50 + (k - 1) * trk_p50), 1)
               for k in (2, 4, 8)},
        }
        enriched = True

    if enriched:
        # Re-print the full record: the LAST JSON line is the most
        # complete one.
        print(json.dumps(record), flush=True)


if __name__ == "__main__":
    main()
