"""Single-chip benchmark: end-to-end frame pipeline (detect -> mesh).

Runs the full-size jitted frame program (YOLOv7 640 detect + NMS + fused
crops + HaMeR ViT-H + MANO LBS + camera lift + RootNet depth) on one TPU
chip over a synthetic 720p frame and prints ONE JSON line:

  {"metric": "...", "value": N, "unit": "...", "vs_baseline": N}

vs_baseline compares against the reference's only published single-image
throughput figure: YOLOv7 batch-1 @640 = 161 fps on V100
(yolo/yolov7/README.md:26) — NOTE that figure is detector-only, while our
value is the FULL pipeline (detector + ViT-H mesh recovery + depth), so
vs_baseline is a conservative lower bound on relative speed.

DEFAULT CONFIGURATION: the qualified int8 hybrid ViT path with STATIC
calibrated activation scales + the direct-vmapped fused Pallas
attention kernel at batch 128 (BENCH_INT8=1, BENCH_INT8_STATIC=1,
BENCH_BATCH=128) — beyond the accuracy/speed point prescribed by the
round-2 review ("bench.py >=161 fps at b128, MPVPE delta <=1.5 mm, no
ToMe"). Accuracy delta: 1.40 mm MPVPE vs f32 (bf16-vs-f32 noise floor
0.83 mm; tools/eval_fastpaths.py, int8_megaproj arm). Measured 285.5 fps b128 same-chip
with the megakernels (megaproj full attention-block kernel +
polynomial-GELU MLP pair, tm 192) + stage-batched detector (see
fastpaths_recorded table below for every qualified variant).

Env knobs: BENCH_FRAMES (timed iters, default 20), BENCH_MAX_HANDS (2),
BENCH_HW ("720x1280"), BENCH_BATCH (128), BENCH_INT8 (1),
BENCH_INT8_STATIC (1), BENCH_TOME (0), BENCH_INT8_YOLO (0, measured
loss), BENCH_ATTN, BENCH_FUSED_MANO, BENCH_DETECTOR (1).
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
            # Static per-tensor scales for the detector's 1x1 convs:
            # kills the per-pixel absmax HBM pass (at detector M =
            # B*80*80 rows that pass is what made dynamic int8 YOLO a
            # measured LOSS). Calibration is an eager pass — host-side,
            # once, before device_put.
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

    def _frame_raw(params, image, orig_hw, K):
        return _payload(infer_frame(params, mano, image, orig_hw, K, cfg,
                                    attn_impl=attn_impl))

    frame_fn = jax.jit(_frame_raw)

    batch = int(os.environ.get("BENCH_BATCH", "128"))

    from hamer_yolo_tpu.pipeline.frame import infer_frames

    def _batch_raw(params, images, orig_hws, Ks):
        # Stage-batched program: natively batched detector trunk+NMS
        # (detect_hands_batched), ~22 ms/b128 faster than
        # vmap(infer_frame) — same outputs (tests/test_pipeline.py).
        return _payload(infer_frames(params, mano, images, orig_hws, Ks, cfg,
                                     attn_impl=attn_impl))

    # Detector-only program: device letterbox 720p -> YOLOv7 640 -> NMS.
    # Apples-to-apples with the reference's OWN headline benchmark
    # (yolov7/README.md:26: V100 batch-1 161 fps / batch-32 2.8 ms/img at
    # 640; ours additionally includes the 720p->640 letterbox).
    from hamer_yolo_tpu.pipeline.frame import detect_hands

    def _detector_raw(params, images, orig_hws):
        def one(i, hw):
            det = detect_hands(params["yolo"], i, hw, cfg)
            return det["boxes"], det["scores"], det["valid"]
        return jax.vmap(one)(images, orig_hws)

    # Scalar-fetch variants for timing (see _checksum).
    frame_fn_sum = jax.jit(
        lambda p, i, hw, k: _checksum(_frame_raw(p, i, hw, k)))
    batch_fn_sum = jax.jit(
        lambda p, i, hw, k: _checksum(_batch_raw(p, i, hw, k)))
    detector_fn_sum = jax.jit(
        lambda p, i, hw: _checksum(_detector_raw(p, i, hw)))

    params = jax.device_put(params)

    rng = np.random.default_rng(0)
    image = jnp.asarray(rng.integers(0, 255, (H, W, 3)).astype(np.float32))
    orig_hw = jnp.asarray([H, W], jnp.float32)
    K = jnp.asarray([[906.96, 0, W / 2], [0, 906.79, H / 2], [0, 0, 1]], jnp.float32)

    t_compile = time.time()
    out = frame_fn(params, image, orig_hw, K)
    jax.block_until_ready(out)
    compile_s = time.time() - t_compile

    # Warmup steady-state (compiles the _sum variant too).
    for _ in range(3):
        float(frame_fn_sum(params, image, orig_hw, K))

    lat = []
    for _ in range(frames):
        t0 = time.time()
        float(frame_fn_sum(params, image, orig_hw, K))
        lat.append(time.time() - t0)
    lat = np.array(lat)
    p50 = float(np.percentile(lat, 50))

    # Batched throughput: F frames per dispatch amortizes host->device
    # round-trip latency (the serving configuration).
    images = jnp.broadcast_to(image, (batch,) + image.shape)
    hws = jnp.broadcast_to(orig_hw, (batch, 2))
    Ks = jnp.broadcast_to(K, (batch, 3, 3))
    float(batch_fn_sum(params, images, hws, Ks))  # compile
    tlat = []
    for _ in range(max(frames // 2, 3)):
        t0 = time.time()
        float(batch_fn_sum(params, images, hws, Ks))
        tlat.append(time.time() - t0)
    batch_p50 = float(np.percentile(np.array(tlat), 50))
    fps = batch / batch_p50

    # Detector-only (the reference's own published benchmark surface).
    det_extra = {}
    if os.environ.get("BENCH_DETECTOR", "1") == "1":
        float(detector_fn_sum(params, images, hws))  # compile
        dlat = []
        for _ in range(max(frames // 2, 3)):
            t0 = time.time()
            float(detector_fn_sum(params, images, hws))
            dlat.append(time.time() - t0)
        det_p50 = float(np.percentile(np.array(dlat), 50))
        det_ms = det_p50 / batch * 1e3
        det_extra = {
            # The reference's ONLY published throughput numbers are the
            # vendored YOLOv7 table (yolo/yolov7/README.md:26): V100
            # batch-32 avg 2.8 ms/img @640. This is the like-for-like
            # comparison on the reference's own benchmark surface (ours
            # additionally includes the 720p->640 device letterbox).
            "reference_own_benchmark": {
                "surface": "detector batch avg ms/img @640",
                "v100_batch32_ms_per_img": 2.8,
                "ours_ms_per_img": round(det_ms, 3),
                "ours_fps": round(batch / det_p50, 1),
                "speedup_vs_reference": round(2.8 / det_ms, 2),
            },
        }

    baseline_fps = 161.0  # YOLOv7 batch-1 @640 V100, detector-only
    print(json.dumps({
        "metric": "e2e_images_per_sec_per_chip",
        "value": round(fps, 3),
        "unit": "frames/s",
        "vs_baseline": round(fps / baseline_fps, 4),
        "extra": {
            "batch": batch,
            "batch_p50_ms": round(batch_p50 * 1e3, 2),
            "single_frame_p50_ms": round(p50 * 1e3, 2),
            "single_frame_fps": round(1.0 / p50, 2),
            "p90_latency_ms": round(float(np.percentile(lat, 90)) * 1e3, 2),
            "compile_s": round(compile_s, 1),
            "frame_hw": [H, W],
            "max_hands": max_hands,
            "device": str(jax.devices()[0]),
            "math": (("int8-hybrid + static act scales + fused attention "
                      "kernel (qualified: 1.40 mm MPVPE vs f32, noise "
                      "floor 0.83 mm)"
                      if os.environ.get("BENCH_INT8_STATIC", "1") == "1"
                      else "int8-hybrid dynamic (qualified: 1.13 mm MPVPE "
                           "vs f32, noise floor 0.83 mm)") if use_int8
                     else "exact bf16/f32"),
            "tome_r": tome_r,
            **det_extra,
            "fastpaths_recorded_2026_08_17_r3": {
                # STATIC reference table, NOT measured by this run — from
                # dedicated sweeps on this chip (720p, 2 hand slots);
                # reproduce with BENCH_INT8=1 / BENCH_INT8_STATIC=1 /
                # BENCH_TOME=4 / BENCH_BATCH=N, MPVPE deltas via
                # tools/eval_fastpaths.py (bf16-vs-f32 noise floor
                # 0.83 mm). int8 = the M-dispatched hybrid
                # (ops/int8_matmul.py): inline XLA int8 chain at large M
                # (+calibrated static act scales killing the dynamic-
                # quantize HBM pass), fully-fused Pallas GEMM at
                # serving-size M.
                # TPU DEFAULT: FULL attention-block megakernel incl.
                # proj+residual (HYT_ATTN=megaproj autodefault,
                # assets/ab_megaproj_r03.log) + resident-weight MLP pair
                # (HYT_INT8_MLP=megakernel) + polynomial GELU
                # (HYT_GELU=poly, MPVPE identical to exact-erf) + tm=192
                "int8_static_fps_b128": 285.5,  # grouped-GEMM megaproj default
                "int8_static_megakernel_fps_b128": 281.8,  # pre-megaproj
                "int8_static_exact_gelu_fps_b128": 265.1,  # pre-poly
                "int8_static_vmap_det_fps_b128": 243.8,  # same-session
                "int8_static_mpvpe_mm": 1.52,   # int8_sta_mega arm
                "int8_static_direct_kernel_fps_b128": 191.7,  # pre-mega
                "int8_static_einsum_attn_fps_b128": 183.0,  # HYT_ATTN=xla
                "int8_static_einsum_attn_mpvpe_mm": 1.22,
                # megakernels engage at ToMe-shrunk N too (BENCH_AB_TOME=4
                # interleaved: einsum 199.4 / mega 237.7 / mega_mlp 236.8)
                "int8_static_tome_r4_fps_b128": 236.8,
                "int8_static_tome_r4_mpvpe_mm": 5.34,
                "exact_bf16_mega_fps_b128": 167.1,  # fused LN+QKV+attn
                                                    # + stage-batched det
                "exact_bf16_mega_mpvpe_mm": 0.84,   # = the noise floor
                "int8_dynamic_fps_b128": 170.2,  # einsum attn; mpvpe w/ kernel
                "int8_dynamic_mpvpe_mm": 1.13,
                "int8_dyn_tome_r4_fps_b128": 195.7,
                "int8_dyn_tome_r4_mpvpe_mm": 4.97,
                "tome_r4_fps_b128": 176.4, "tome_r4_mpvpe_mm": 4.58,
                "tome_r2_fps_b128": 144.4, "tome_r2_mpvpe_mm": 3.02,
                "int8_unfused_fps_b128_same_day": 158.6,
                "int8_yolo_1x1_fps_b128": 159.7,  # measured LOSS
                # Detector-only interleaved A/B b128 (assets/
                # det_ab_int8_r03.log): bf16 1.484 ms/img / static 1x1
                # int8 1.684 / full-trunk shifted-GEMM int8 8.282 —
                # EVERY int8 YOLO formulation measured is a loss on
                # this chip; the trunk stays bf16.
                # Detect-skip tracking program (serving detect_every=K;
                # tools/bench_tracking.py, assets/bench_tracking_r03.log):
                # boxes from the previous tick's keypoints, detector
                # stage gone — box-roundtrip exact (0.000 mm/0.000 px).
                "tracked_tick_fps_b128": 437.4,   # 292.6 ms vs 439.1 detect
                "tracked_detect_every4_fps_b128": 388.8,
                "det_bf16_ms_per_img_b128": 1.484,
                "det_int8_1x1_ms_per_img_b128": 1.684,
                "det_int8_all_ms_per_img_b128": 8.282,
            },
            "baseline_note": "vs_baseline is CROSS-SCOPE and conservative: "
                             "our value is the FULL pipeline (detect + ViT-H "
                             "mesh x2 hands + depth) while the 161 fps V100 "
                             "baseline is detector-only batch-1 — see "
                             "reference_own_benchmark for the like-for-like "
                             "comparison. See 'math' for the numeric mode "
                             "(default: int8 hybrid at near-noise accuracy, "
                             "the round-2-review-prescribed config; exact "
                             "bf16 via BENCH_INT8=0). The reference's own "
                             "optional ToMe adapter "
                             "(selective_vit_adapter.py, r=(8,-1)) maps to "
                             "BENCH_TOME=4 (qualified in fastpaths).",
        },
    }))


if __name__ == "__main__":
    main()
