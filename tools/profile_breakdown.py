"""Fine-grained cost map of the pipeline on the live backend.

Decomposes the stage numbers from profile_stages.py one level further:
- ViT-H internals by ablation (attention / MLP / LayerNorm isolated),
- detector sub-stages (device letterbox warp, YOLO conv trunk, NMS),
- RootNet sub-stages (patch warp, backbone).

Scalar-fetch timing (axon block_until_ready on lazy arrays doesn't sync).

Usage: [BENCH_BATCH=16] [BENCH_MAX_HANDS=2] python tools/profile_breakdown.py
"""
from __future__ import annotations

import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def bench(fn, *args, iters=10, warmup=3):
    t0 = time.time()
    float(fn(*args))
    compile_s = time.time() - t0
    for _ in range(warmup):
        float(fn(*args))
    lat = []
    for _ in range(iters):
        t0 = time.perf_counter()
        float(fn(*args))
        lat.append(time.perf_counter() - t0)
    return float(np.percentile(np.asarray(lat) * 1e3, 50)), compile_s


def main():
    import jax
    import jax.numpy as jnp

    from hamer_yolo_tpu.core import nn
    from hamer_yolo_tpu.core.checkpoint import init_pipeline_params
    from hamer_yolo_tpu.core.mano_assets import load_mano_model, synthetic_mano_model
    from hamer_yolo_tpu.models.mano import ManoModel
    from hamer_yolo_tpu.models.sar import sar_backbone_forward
    from hamer_yolo_tpu.models.vit import vit_forward
    from hamer_yolo_tpu.models.yolov7 import yolov7_forward
    from hamer_yolo_tpu.ops.nms import non_max_suppression
    from hamer_yolo_tpu.pipeline.frame import PipelineConfig
    from hamer_yolo_tpu.pipeline.preprocess import device_letterbox, sar_patch

    batch = int(os.environ.get("BENCH_BATCH", "16"))
    max_hands = int(os.environ.get("BENCH_MAX_HANDS", "2"))
    H, W = 720, 1280
    cfg = PipelineConfig(max_hands=max_hands)
    try:
        mano = ManoModel.from_arrays(load_mano_model("right"))
    except Exception:
        mano = ManoModel.from_arrays(synthetic_mano_model())
    params = jax.device_put(init_pipeline_params(
        jax.random.PRNGKey(0), mano, yolo_cfg=cfg.yolo, hamer_cfg=cfg.hamer,
        sar_cfg=cfg.sar))
    print(f"device: {jax.devices()[0]}  batch={batch} slots={max_hands}", flush=True)

    rng = np.random.default_rng(0)
    images = jnp.asarray(rng.integers(0, 255, (batch, H, W, 3)).astype(np.float32))
    hws = jnp.broadcast_to(jnp.asarray([H, W], jnp.float32), (batch, 2))
    ncrops = batch * max_hands
    vit_in = jnp.asarray(rng.standard_normal(
        (ncrops,) + cfg.hamer.vit.img_size + (3,)), jnp.float32)
    det640 = jnp.asarray(rng.standard_normal((batch, 640, 640, 3)) * 0.2 + 0.5,
                         jnp.float32)

    results = {}

    def report(name, fn, *args):
        ms, comp = bench(jax.jit(fn), *args)
        results[name] = round(ms, 2)
        print(f"{name:<28s} {ms:8.2f} ms  (compile {comp:.0f}s)", flush=True)

    def ssum(x):
        return jnp.sum(x.astype(jnp.float32))

    # PROF_ONLY=vit|det|sar limits to one section (fewer tunnel compiles).
    only = os.environ.get("PROF_ONLY", "")

    # ---- ViT ablations ----
    vcfg = cfg.hamer.vit
    vp = params["hamer"]["backbone"]

    if only in ("", "vit"):
        report("vit_full", lambda p, x: ssum(vit_forward(p, x, vcfg)), vp,
               vit_in)

    def attn_identity(p, x, num_heads):
        return x

    if only in ("", "vit"):
        report("vit_no_attention", lambda p, x: ssum(
            vit_forward(p, x, vcfg, attn_impl=attn_identity)), vp, vit_in)

        def attn_projs_only(p, x, num_heads):
            # QKV + output projections kept; attention math itself skipped.
            qkv = nn.linear(p["qkv"], x)
            d = x.shape[-1]
            return nn.linear(p["proj"], qkv[..., :d])

        report("vit_attn_projs_only", lambda p, x: ssum(
            vit_forward(p, x, vcfg, attn_impl=attn_projs_only)), vp, vit_in)

    # ---- detector sub-stages ----
    if only in ("", "det"):
        report("letterbox_warp", lambda im, hw: ssum(jax.vmap(
            lambda i, h: device_letterbox(i, h, cfg.det_size)[0])(im, hw)),
            images, hws)

        report("yolo_trunk", lambda p, x: ssum(
            yolov7_forward(p, x, cfg.yolo)), params["yolo"], det640)

        pred = jax.jit(lambda p, x: yolov7_forward(p, x, cfg.yolo))(
            params["yolo"], det640)
        pred = jnp.asarray(np.asarray(pred))

        def nms_fn(pr):
            out = non_max_suppression(pr, conf_thres=cfg.conf_thres,
                                      iou_thres=cfg.iou_thres,
                                      classes=cfg.classes,
                                      agnostic=cfg.agnostic_nms,
                                      max_det=cfg.max_hands)
            return ssum(out.boxes) + ssum(out.scores)

        report("nms", nms_fn, pred)

        # Composition check: the full detect stage in BOTH formulations.
        # vmap(detect_hands) is what the pipeline runs; the hand-batched
        # variant chains the exact sub-stages above. A gap between
        # either and letterbox+trunk+nms isolates what the sub-stage
        # measurements miss (input provenance/layout, normalize, vmapped
        # NMS batching rule).
        from hamer_yolo_tpu.pipeline.frame import detect_hands

        report("detect_vmap", lambda p, im, hw: ssum(jax.vmap(
            lambda i, h: detect_hands(p, i, h, cfg)["boxes"])(im, hw)),
            params["yolo"], images, hws)

        def detect_batched(p, im, hw):
            lb, r, pad = jax.vmap(
                lambda i, h: device_letterbox(i, h, cfg.det_size))(im, hw)
            pr = yolov7_forward(p, lb[..., ::-1] / 255.0, cfg.yolo)
            out = non_max_suppression(
                pr, conf_thres=cfg.conf_thres, iou_thres=cfg.iou_thres,
                classes=cfg.classes, agnostic=cfg.agnostic_nms,
                max_det=cfg.max_hands, max_nms_static=cfg.max_nms_static)
            return ssum(out.boxes) + ssum(out.scores)

        report("detect_batched", detect_batched, params["yolo"], images, hws)

    # ---- RootNet sub-stages ----
    if "sar" in params and only in ("", "sar"):
        pb = jnp.broadcast_to(jnp.asarray([100.0, 100.0, 200.0, 200.0]),
                              (ncrops, 4))
        report("sar_patch_warp", lambda im: ssum(jax.vmap(lambda i: jax.vmap(
            lambda bb: sar_patch(i, bb, cfg.sar.input_size))(pb[:max_hands])
        )(im)), images)
        patches = jnp.asarray(rng.standard_normal(
            (ncrops, cfg.sar.input_size, cfg.sar.input_size, 3)), jnp.float32)
        report("sar_backbone", lambda p, x: ssum(
            sar_backbone_forward(p, x, cfg.sar)), params["sar"], patches)

    print(json.dumps(results))


if __name__ == "__main__":
    import sys as _sys  # _hyt_help_guard
    if "-h" in _sys.argv or "--help" in _sys.argv:
        print(__doc__ or "env-configured tool; see module docstring")
        raise SystemExit(0)
    main()
