"""Unified CLI (replaces the reference's four entry scripts + four config
systems with one argparse tree over a single dataclass config).

Subcommands:
  infer        image dir -> per-frame .npy MANO dicts + .obj meshes
               (parity with `python infer.py --input --output`,
               reference infer.py:1495-1536)
  detect       standalone hand detection boxes (detect.py equivalent)
  depth        standalone RootNet absolute depth (estimate_root_depth)
  reconstruct  saved .npy dir -> .obj meshes
               (reconstruct_and_save_obj_with_wrapper equivalent)
  bench        single-chip throughput/latency benchmark
"""
from __future__ import annotations

import argparse
import json
import os
import sys
from typing import Optional

import numpy as np


def _load_runtime(args):
    import jax

    from hamer_yolo_tpu.core.checkpoint import init_pipeline_params, load_checkpoint
    from hamer_yolo_tpu.core.mano_assets import load_mano_model, synthetic_mano_model
    from hamer_yolo_tpu.models.mano import ManoModel
    from hamer_yolo_tpu.pipeline.frame import PipelineConfig

    try:
        mano = ManoModel.from_arrays(load_mano_model("right", getattr(args, "mano_dir", None)))
    except Exception as e:
        print(f"warning: MANO assets unavailable ({e}); using synthetic model", file=sys.stderr)
        mano = ManoModel.from_arrays(synthetic_mano_model())

    if getattr(args, "tiny", False):
        # Scaled-down models: CI/CPU smoke of the full CLI machinery.
        from hamer_yolo_tpu.models.hamer import HamerConfig
        from hamer_yolo_tpu.models.mano_head import ManoHeadConfig
        from hamer_yolo_tpu.models.sar import SarConfig
        from hamer_yolo_tpu.models.vit import ViTConfig
        from hamer_yolo_tpu.models.yolov7 import YoloConfig

        cfg = PipelineConfig(
            max_hands=getattr(args, "max_hands", 2),
            det_size=64, crop_size=64,
            use_depth_refine=getattr(args, "depth_refine", False),
            yolo=YoloConfig(nc=3, img_size=64),
            hamer=HamerConfig(
                image_size=64, crop_margin=8,
                vit=ViTConfig(img_size=(64, 48), embed_dim=64, depth=2,
                              num_heads=4),
                head=ManoHeadConfig(dim=32, context_dim=64, depth=2, heads=2,
                                    dim_head=8, mlp_dim=32),
            ),
            sar=SarConfig(backbone="resnet34", input_size=64, feature_hw=2,
                          heatmap_size=8),
        )
    else:
        cfg = PipelineConfig(
            max_hands=getattr(args, "max_hands", 4),
            conf_thres=getattr(args, "conf_thres", 0.25),
            iou_thres=getattr(args, "iou_thres", 0.35),
            use_depth_refine=getattr(args, "depth_refine", False),
        )
    ckpt = getattr(args, "checkpoint", None)
    if ckpt and os.path.exists(ckpt):
        params = load_checkpoint(ckpt)
    else:
        if ckpt:
            print(f"warning: checkpoint {ckpt} not found; random init", file=sys.stderr)
        params = init_pipeline_params(jax.random.PRNGKey(0), mano,
                                      yolo_cfg=cfg.yolo, hamer_cfg=cfg.hamer,
                                      sar_cfg=cfg.sar)

    # Qualified fast paths (tools/eval_fastpaths.py MPVPE deltas vs the
    # 0.83 mm bf16 noise floor: int8 1.26 mm, tome-r4 4.6 mm): the same
    # accelerations bench.py measures, exposed at the user surface.
    fast = getattr(args, "fast_path", "none") or "none"
    if fast != "none":
        import dataclasses

        hcfg = cfg.hamer
        if "int8" in fast:
            from hamer_yolo_tpu.core.quant import quantize_vit_params

            params = dict(params)
            params["hamer"] = dict(params["hamer"])
            params["hamer"]["backbone"] = jax.jit(quantize_vit_params)(
                params["hamer"]["backbone"])
            calib = getattr(args, "calib_scales", None)
            if calib:
                # Static per-tensor activation scales from
                # tools/calibrate_int8.py: +8% e2e at b128 (the dynamic
                # per-row absmax pass disappears from the large-M GEMMs).
                from hamer_yolo_tpu.core.quant import (
                    attach_static_act_scales, load_act_stats)

                params["hamer"]["backbone"] = attach_static_act_scales(
                    params["hamer"]["backbone"], load_act_stats(calib))
            hcfg = dataclasses.replace(hcfg, int8_backbone=True)
        if "tome" in fast:
            hcfg = dataclasses.replace(hcfg, tome_r=getattr(args, "tome_r", 4))
        cfg = dataclasses.replace(cfg, hamer=hcfg)
    yolo_mode = getattr(args, "int8_yolo", "off") or "off"
    if yolo_mode != "off":
        # Detector-side W8A8 (static calibrated per-tensor scales,
        # nn.conv2d "sx" fast path). Calibrates on the caller's own
        # input frames when available — the TPU-native analog of the
        # reference's TensorRT calibrator loop.
        import functools

        from hamer_yolo_tpu.core.quant import (calibrate_yolo_act_scales,
                                               quantize_yolo_params)

        params = dict(params)
        q = jax.jit(functools.partial(
            quantize_yolo_params,
            only_1x1=yolo_mode == "1x1"))(params["yolo"])
        frames = _calibration_frames(getattr(args, "input", None),
                                     cfg.det_size)
        params["yolo"] = calibrate_yolo_act_scales(q, frames, cfg.yolo)
    return params, mano, cfg


def _calibration_frames(input_dir, det_size: int, n: int = 2):
    """Up to ``n`` letterboxed RGB [0,1] frames for int8 calibration —
    real frames from ``input_dir`` when present, noise otherwise."""
    import numpy as np

    frames = []
    if input_dir:
        import glob as _glob
        import os as _os

        import cv2

        paths = sorted(
            p for p in _glob.glob(_os.path.join(input_dir, "*"))
            if p.lower().endswith((".jpg", ".jpeg", ".png", ".bmp")))[:n]
        for path in paths:
            img = cv2.imread(path)
            if img is None:
                continue
            h, w = img.shape[:2]
            r = min(det_size / h, det_size / w)
            nh, nw = int(round(h * r)), int(round(w * r))
            canvas = np.full((det_size, det_size, 3), 114, np.uint8)
            top, left = (det_size - nh) // 2, (det_size - nw) // 2
            canvas[top:top + nh, left:left + nw] = cv2.resize(img, (nw, nh))
            frames.append(canvas[..., ::-1].astype(np.float32) / 255.0)
    if not frames:
        rng = np.random.default_rng(2)
        frames = list(rng.random((n, det_size, det_size, 3),
                                 dtype=np.float64).astype(np.float32))
    return frames


def cmd_infer(args) -> int:
    import contextlib

    from hamer_yolo_tpu.pipeline.runner import process_image_dir, process_masked_dir
    from hamer_yolo_tpu.utils.profiling import trace

    params, mano, cfg = _load_runtime(args)
    prof = trace(args.profile) if getattr(args, "profile", None) else contextlib.nullcontext()
    with prof:
        return _run_infer(args, params, mano, cfg)


def _run_infer(args, params, mano, cfg) -> int:
    from hamer_yolo_tpu.pipeline.runner import process_image_dir, process_masked_dir
    if args.mask_dir:
        stats = process_masked_dir(
            args.input, args.mask_dir, args.output, params, mano, cfg,
            intrinsics_path=args.intrinsics, mask_value=args.mask_value,
            mask_hand=args.mask_hand, save_obj=not args.no_obj,
        )
    else:
        stats = process_image_dir(
            args.input, args.output, params, mano, cfg,
            intrinsics_path=args.intrinsics, save_obj=not args.no_obj,
            batch_size=getattr(args, "batch", 1) or 1,
        )
    print(f"processed {stats.frames} frames / {stats.hands} hands "
          f"({stats.skipped} skipped) in {stats.total_s:.1f}s")
    return 0


def cmd_serve(args) -> int:
    """Batched video-rate processing of a video file / stream / image dir."""
    from hamer_yolo_tpu.io.video import iter_media
    from hamer_yolo_tpu.io.writers import load_intrinsics
    from hamer_yolo_tpu.pipeline.serving import BatchedPipeline

    params, mano, cfg = _load_runtime(args)
    K = load_intrinsics(args.intrinsics) if args.intrinsics else None
    K = K if K is not None else _default_K((720, 1280))
    if args.multi:
        # N concurrent sources, one batched dispatch per tick (LoadStreams
        # equivalent); --detect-every K skips the detector between
        # keyframes by tracking boxes from each source's last keypoints.
        sources = [int(s) if s.isdigit() else s
                   for s in args.input.split(",")]
        pipe = BatchedPipeline(params, mano, cfg, batch_size=len(sources),
                               detect_every=args.detect_every,
                               upload_dtype=args.upload_dtype)
        for tick in pipe.stream_multi(sources, K,
                                      max_batches=args.max_frames):
            out = tick["outputs"]
            n = int(np.asarray(out["valid"]).sum())
            det = (f" (detected: {tick['detected']})"
                   if "detected" in tick else "")
            print(f"tick: sources {tick['source_idx']}, {n} hands{det}")
        stats = pipe.last_stats
        print(f"{stats.frames} frames in {stats.total_s:.1f}s "
              f"= {stats.fps:.1f} fps")
        return 0
    pipe = BatchedPipeline(params, mano, cfg, batch_size=args.batch,
                           upload_dtype=args.upload_dtype)
    total = 0
    for out in pipe.stream(iter_media(args.input, args.max_frames), K):
        n = int(np.asarray(out["valid"]).sum())
        total += out["boxes"].shape[0]
        print(f"batch: {out['boxes'].shape[0]} frames, {n} hands")
    stats = pipe.last_stats
    print(f"{stats.frames} frames in {stats.total_s:.1f}s = {stats.fps:.1f} fps")
    return 0


def cmd_serve_http(args) -> int:
    """HTTP front end over the batched pipeline (see pipeline/http_server)."""
    from hamer_yolo_tpu.io.writers import load_intrinsics
    from hamer_yolo_tpu.pipeline.http_server import make_http_server
    from hamer_yolo_tpu.pipeline.serving import BatchedPipeline

    params, mano, cfg = _load_runtime(args)
    K = load_intrinsics(args.intrinsics) if args.intrinsics else None
    pipe = BatchedPipeline(params, mano, cfg, batch_size=args.batch)
    srv = make_http_server(pipe, args.host, args.port, K_default=K,
                           max_wait_ms=args.max_wait_ms)
    print(f"serving on http://{args.host}:{srv.server_address[1]} "
          f"(batch {args.batch}, window {args.max_wait_ms} ms); "
          "POST /infer, GET /healthz /stats", flush=True)
    try:
        srv.serve_forever()
    except KeyboardInterrupt:
        pass
    finally:
        srv.batcher.close()
    return 0


def cmd_detect(args) -> int:
    import cv2
    import jax.numpy as jnp

    from hamer_yolo_tpu.io.writers import list_images
    from hamer_yolo_tpu.pipeline.runner import FrameProgram

    params, mano, cfg = _load_runtime(args)
    if getattr(args, "augment", False):
        import dataclasses

        cfg = dataclasses.replace(cfg, tta=True)
    program = FrameProgram(params, mano, cfg)
    if args.save_txt:
        os.makedirs(args.save_txt, exist_ok=True)
    if args.save_img:
        os.makedirs(args.save_img, exist_ok=True)
    for path in list_images(args.input):
        img = cv2.imread(path)
        if img is None:
            continue
        out = program(img.astype(np.float32), _default_K(img.shape))
        dets = [
            {"label": "right" if out["is_right"][i] > 0.5 else "left",
             "box": out["boxes"][i].tolist(), "score": float(out["scores"][i]),
             "class": int(out["classes"][i])}
            for i in range(len(out["valid"])) if out["valid"][i]
        ]
        stem = os.path.splitext(os.path.basename(path))[0]
        if args.save_txt:
            # reference detect.py:111-115 label format: cls x_c y_c w h
            # [conf], normalized by image size, '%g' rendering
            h, w = img.shape[:2]
            lines = []
            for d in dets:
                x1, y1, x2, y2 = d["box"]
                row = [d["class"], (x1 + x2) / 2 / w, (y1 + y2) / 2 / h,
                       (x2 - x1) / w, (y2 - y1) / h]
                if args.save_conf:
                    row.append(d["score"])
                lines.append(" ".join(f"{v:g}" for v in row))
            with open(os.path.join(args.save_txt, stem + ".txt"), "w") as f:
                f.write("\n".join(lines) + ("\n" if lines else ""))
        if args.save_img:
            from hamer_yolo_tpu.utils.viz import plot_box

            vis = img
            for d in dets:
                vis = plot_box(vis, d["box"],
                               label=f"{d['label']} {d['score']:.2f}",
                               color=(0, 200, 0) if d["label"] == "right"
                               else (0, 120, 255))
            cv2.imwrite(os.path.join(args.save_img,
                                     os.path.basename(path)), vis)
        print(json.dumps({"image": os.path.basename(path), "detections": dets}))
    return 0


def cmd_depth(args) -> int:
    import cv2

    from hamer_yolo_tpu.io.writers import list_images, load_intrinsics
    from hamer_yolo_tpu.pipeline.runner import FrameProgram

    params, mano, cfg = _load_runtime(args)
    program = FrameProgram(params, mano, cfg)
    K = load_intrinsics(args.intrinsics) if args.intrinsics else None
    for path in list_images(args.input):
        img = cv2.imread(path)
        if img is None:
            continue
        out = program(img.astype(np.float32), K if K is not None else _default_K(img.shape))
        depths = [float(out["root_depth"][i]) for i in range(len(out["valid"]))
                  if out["valid"][i]]
        print(json.dumps({"image": os.path.basename(path), "root_depths": depths}))
    return 0


def cmd_reconstruct(args) -> int:
    from hamer_yolo_tpu.io.writers import load_hand_npy
    from hamer_yolo_tpu.pipeline.reconstruct import reconstruct_and_save_obj

    params, mano, cfg = _load_runtime(args)
    os.makedirs(args.output, exist_ok=True)
    overlay_dir = getattr(args, "overlay_images", None)
    count = 0
    for f in sorted(os.listdir(args.input)):
        if not f.endswith(".npy"):
            continue
        results = load_hand_npy(os.path.join(args.input, f))
        obj_path = os.path.join(args.output, f.replace(".npy", ".obj"))
        if reconstruct_and_save_obj(mano, results, obj_path) is not None:
            count += 1
        if overlay_dir:
            _write_lit_overlay(mano, results, f, overlay_dir, args.output)
    print(f"wrote {count} OBJ files to {args.output}")
    return 0


def _write_lit_overlay(mano, results, npy_name, image_dir, out_dir) -> None:
    """Lit z-buffered AA mesh overlay (pyrender-capability path,
    reference renderer.py:222-386) for one frame's npy next to its image."""
    import cv2

    from hamer_yolo_tpu.pipeline.reconstruct import reconstruct_hand_mesh
    from hamer_yolo_tpu.utils.render import lit_mesh_overlay

    stem = npy_name[:-4]
    img = None
    for ext in (".png", ".jpg", ".jpeg", ".bmp"):
        p = os.path.join(image_dir, stem + ext)
        if os.path.exists(p):
            img = cv2.imread(p)
            break
    if img is None:
        return
    hands = [reconstruct_hand_mesh(mano, results[s])
             for s in ("left", "right") if results.get(s) is not None]
    if not hands:
        return
    K = _default_K(img.shape)
    out = img
    for h in hands:
        out = lit_mesh_overlay(out, h["vertices"], h["faces"], K)
    cv2.imwrite(os.path.join(out_dir, stem + "_overlay.png"), out)


def cmd_bench(args) -> int:
    import runpy

    sys.argv = ["bench.py"]
    runpy.run_path(os.path.join(os.path.dirname(__file__), "..", "..", "bench.py"),
                   run_name="__main__")
    return 0


def cmd_rgbd(args) -> int:
    """RGB-D KeypointFusion inference (Model_RGBD / test_wild equivalent:
    reference Model_RGBD.py:64-205, test_wild.py)."""
    import json

    import cv2
    import jax
    import jax.numpy as jnp

    from hamer_yolo_tpu.models.kpfusion_rgbd.model import (
        KPFusionConfig, init_kpfusion,
    )
    from hamer_yolo_tpu.models.kpfusion_rgbd.runtime import RGBDRuntime

    cfg = KPFusionConfig()
    if args.kpf_checkpoint:
        from hamer_yolo_tpu.core.convert import convert_kpfusion_checkpoint

        params = jax.tree_util.tree_map(
            jnp.asarray, convert_kpfusion_checkpoint(args.kpf_checkpoint))
    else:
        print("warning: no --kpf-checkpoint; random weights", file=sys.stderr)
        params = init_kpfusion(jax.random.PRNGKey(0), cfg)

    if not args.bbox and not args.bbox_file:
        print("error: rgbd needs --bbox x,y,w,h or --bbox-file", file=sys.stderr)
        return 2
    rgb = cv2.imread(args.rgb)
    if rgb is None:
        print(f"error: cannot read RGB image {args.rgb}", file=sys.stderr)
        return 2
    rgb = rgb.astype(np.float32)
    if args.depth.endswith(".npy"):
        depth = np.load(args.depth).astype(np.float32)
    else:
        depth = cv2.imread(args.depth, cv2.IMREAD_ANYDEPTH)
        if depth is None:
            print(f"error: cannot read depth image {args.depth}", file=sys.stderr)
            return 2
        depth = depth.astype(np.float32)
    if args.bbox_file:
        # the reference's wild-test fixtures store normalized CENTER
        # boxes (test_wild.py:666-671): cx, cy, w, h in image fractions
        v = np.loadtxt(args.bbox_file).reshape(-1)[:4]
        H, W = depth.shape[:2]
        bw, bh = v[2] * W, v[3] * H
        bbox = [v[0] * W - bw / 2, v[1] * H - bh / 2, bw, bh]
    else:
        bbox = [float(x) for x in args.bbox.split(",")]

    rt = RGBDRuntime(params, cfg)
    np.random.seed(args.seed)  # pcl sampling (reference process_depth RNG)
    out = rt.estimate_pose_rgbd(rgb, depth, bbox)
    print(json.dumps({
        "joint_uvd_full": out["joint_uvd_full"].tolist(),
        "joint_xyz_world": out["joint_xyz_world"].tolist(),
        "center": np.asarray(out["center"]).tolist(),
    }))
    return 0


def _default_K(shape) -> np.ndarray:
    h, w = shape[:2]
    f = 5000.0 / 256.0 * max(h, w)
    return np.array([[f, 0, w / 2], [0, f, h / 2], [0, 0, 1]], np.float32)


def main(argv: Optional[list] = None) -> int:
    parser = argparse.ArgumentParser(prog="hamer-yolo-tpu",
                                     description=__doc__,
                                     formatter_class=argparse.RawDescriptionHelpFormatter)
    sub = parser.add_subparsers(dest="cmd", required=True)

    def common(p):
        p.add_argument("--checkpoint", default=None, help="orbax checkpoint dir")
        p.add_argument("--mano-dir", default=None, help="dir with MANO_*.pkl")
        p.add_argument("--max-hands", type=int, default=4)
        p.add_argument("--conf-thres", type=float, default=0.25)
        p.add_argument("--iou-thres", type=float, default=0.35)
        p.add_argument("--tiny", action="store_true",
                       help="scaled-down models (smoke testing)")
        p.add_argument("--fast-path", default="none",
                       choices=["none", "int8", "tome", "int8-tome"],
                       help="accuracy-qualified ViT accelerations "
                            "(eval_fastpaths MPVPE deltas: int8 1.26 mm, "
                            "tome-r4 4.6 mm, int8-tome 5.0 mm; bench.py "
                            "b128 fps: 170 / 176 / 196 vs 129 exact)")
        p.add_argument("--tome-r", type=int, default=4,
                       help="tokens merged per ViT layer for --fast-path "
                            "tome (reference selective_vit_adapter r)")
        p.add_argument("--calib-scales", default=None, metavar="NPZ",
                       help="static int8 activation scales from "
                            "tools/calibrate_int8.py (with --fast-path "
                            "int8*: per-tensor static quantize, +8%% e2e)")
        p.add_argument("--int8-yolo", default="off",
                       choices=["off", "1x1", "all"],
                       help="W8A8 the detector trunk with static "
                            "calibrated scales (calibrates on your input "
                            "frames): 1x1 = pointwise convs only, all = "
                            "spatial convs too (shifted int8 GEMMs). "
                            "Composes with --fast-path. NOTE: measured "
                            "SLOWER than the bf16 trunk on v5e in both "
                            "modes (assets/det_ab_int8_r03.log) — for "
                            "A/B use and other backends.")

    p = sub.add_parser("infer", help="full pipeline over an image dir")
    common(p)
    p.add_argument("--input", required=True)
    p.add_argument("--output", required=True)
    p.add_argument("--intrinsics", default=None, help="cam_K.txt path")
    p.add_argument("--depth-refine", action="store_true",
                   help="force tz from RootNet depth (d_infer.py behavior)")
    p.add_argument("--no-obj", action="store_true")
    p.add_argument("--batch", type=int, default=1,
                   help="frames per device dispatch (>1 = the stage-"
                        "batched throughput program; same per-image "
                        "outputs)")
    p.add_argument("--mask-dir", default=None,
                   help="dir of per-image .npy masks (bypasses the detector)")
    p.add_argument("--mask-value", type=int, default=3)
    p.add_argument("--mask-hand", default="right", choices=["left", "right"])
    p.add_argument("--profile", default=None, metavar="DIR",
                   help="write a jax.profiler/xprof trace to DIR "
                        "(the reference's line_profiler/kernprof equivalent)")
    p.set_defaults(fn=cmd_infer)

    p = sub.add_parser("serve", help="batched video/stream processing")
    common(p)
    p.add_argument("--input", required=True, help="video file / image dir / glob")
    p.add_argument("--intrinsics", default=None)
    p.add_argument("--batch", type=int, default=16)
    p.add_argument("--max-frames", type=int, default=None)
    p.add_argument("--multi", action="store_true",
                   help="treat --input as a comma list of N live sources "
                        "(device idx / file / URL); one batched dispatch "
                        "per tick across all sources")
    p.add_argument("--detect-every", type=int, default=1,
                   help="with --multi: run the detector every K-th tick "
                        "per source, tracking boxes from the previous "
                        "tick's keypoints in between (detector is ~1/3 "
                        "of frame cost)")
    p.add_argument("--upload-dtype", default=None,
                   choices=["uint8", "float32"],
                   help="pin the frame-upload dtype (default: auto per "
                        "batch). uint8 moves 4x fewer host->device bytes "
                        "— the streaming bottleneck on remote chips — "
                        "and pinning prevents a stray float frame from "
                        "retracing the program mid-stream")
    p.set_defaults(fn=cmd_serve)

    p = sub.add_parser("serve-http", help="HTTP endpoint: POST /infer an "
                       "image, get hands JSON (Triton-deploy equivalent "
                       "with dynamic micro-batching)")
    common(p)
    p.add_argument("--host", default="127.0.0.1")
    p.add_argument("--port", type=int, default=8100)
    p.add_argument("--batch", type=int, default=8,
                   help="max micro-batch per device dispatch")
    p.add_argument("--max-wait-ms", type=float, default=15.0,
                   help="micro-batch collection window")
    p.add_argument("--intrinsics", default=None)
    p.set_defaults(fn=cmd_serve_http)

    p = sub.add_parser("detect", help="hand detection only")
    common(p)
    p.add_argument("--input", required=True)
    p.add_argument("--save-txt", default=None, metavar="DIR",
                   help="write per-image YOLO label txt (detect.py "
                        "--save-txt format: cls x_c y_c w h, normalized)")
    p.add_argument("--save-conf", action="store_true",
                   help="append confidence to --save-txt rows")
    p.add_argument("--save-img", default=None, metavar="DIR",
                   help="write annotated images (plot_one_box equivalent)")
    p.add_argument("--augment", action="store_true",
                   help="3-scale+flip detector TTA (detect.py --augment)")
    p.set_defaults(fn=cmd_detect)

    p = sub.add_parser("depth", help="RootNet absolute depth only")
    common(p)
    p.add_argument("--input", required=True)
    p.add_argument("--intrinsics", default=None)
    p.set_defaults(fn=cmd_depth)

    p = sub.add_parser("rgbd", help="RGB-D KeypointFusion inference "
                                    "(Model_RGBD equivalent)")
    p.add_argument("--rgb", required=True, help="RGB image path")
    p.add_argument("--depth", required=True, help="depth image (.npy / 16-bit png, mm)")
    p.add_argument("--bbox", default=None, help="x,y,w,h")
    p.add_argument("--bbox-file", default=None, help="txt with x y w h "
                   "(e.g. the reference's test/20_bbox.txt fixtures)")
    p.add_argument("--kpf-checkpoint", default=None,
                   help="KPFusion .pth (Model_RGBD format)")
    p.add_argument("--seed", type=int, default=0,
                   help="point-cloud sampling seed (deterministic output)")
    p.set_defaults(fn=cmd_rgbd)

    p = sub.add_parser("reconstruct", help=".npy dir -> .obj meshes")
    common(p)
    p.add_argument("--input", required=True)
    p.add_argument("--output", required=True)
    p.add_argument("--overlay-images", default=None, metavar="DIR",
                   help="source image dir: also write lit z-buffered mesh "
                        "overlays (<stem>_overlay.png) next to the OBJs")
    p.set_defaults(fn=cmd_reconstruct)

    p = sub.add_parser("bench", help="run the benchmark")
    p.set_defaults(fn=cmd_bench)

    args = parser.parse_args(argv)
    return args.fn(args)


if __name__ == "__main__":
    raise SystemExit(main())
