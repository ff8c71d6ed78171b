"""Stage-level wall-clock breakdown of the frame pipeline on the live backend.

Times each pipeline stage as its own jitted program at the benchmark
configuration (BENCH_BATCH frames, BENCH_MAX_HANDS slots, 720p), so the
e2e batch_p50_ms can be attributed: detector (YOLOv7+NMS), ViT-H backbone,
full HaMeR (ViT + head + LBS), RootNet depth, and the composed program.

Usage: [BENCH_BATCH=16] [BENCH_MAX_HANDS=2] python tools/profile_stages.py
"""
from __future__ import annotations

import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def bench(fn, *args, iters=12, warmup=3):
    """fn must return a SCALAR: on the axon remote backend
    block_until_ready on large lazy arrays returns before device
    completion, so every timed program reduces its outputs to one scalar
    whose host fetch forces the true sync."""
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


def _scalarize(out):
    import jax
    import jax.numpy as jnp

    leaves = jax.tree_util.tree_leaves(out)
    return sum(jnp.sum(x.astype(jnp.float32)) for x in leaves)


def main():
    import jax
    import jax.numpy as jnp

    from hamer_yolo_tpu.core.checkpoint import init_pipeline_params
    from hamer_yolo_tpu.core.mano_assets import load_mano_model, synthetic_mano_model
    from hamer_yolo_tpu.models.hamer import hamer_forward
    from hamer_yolo_tpu.models.mano import ManoModel
    from hamer_yolo_tpu.models.vit import vit_forward
    from hamer_yolo_tpu.pipeline.frame import (
        PipelineConfig, detect_hands, estimate_depths, infer_frame,
    )

    batch = int(os.environ.get("BENCH_BATCH", "16"))
    max_hands = int(os.environ.get("BENCH_MAX_HANDS", "2"))
    H, W = 720, 1280
    cfg = PipelineConfig(max_hands=max_hands)

    try:
        mano = ManoModel.from_arrays(load_mano_model("right"))
    except Exception:
        mano = ManoModel.from_arrays(synthetic_mano_model())
    params = init_pipeline_params(jax.random.PRNGKey(0), mano, yolo_cfg=cfg.yolo,
                                  hamer_cfg=cfg.hamer, sar_cfg=cfg.sar)
    use_int8 = os.environ.get("BENCH_INT8", "0") == "1"
    if use_int8:
        # Mirror bench.py's DEFAULT config: W8A8 backbone + calibrated
        # static activation scales (megakernels auto-engage on TPU), so
        # the attribution matches the deployed program.
        import dataclasses

        from hamer_yolo_tpu.core.quant import (attach_static_act_scales,
                                               collect_vit_act_stats,
                                               quantize_vit_params)

        cfg = dataclasses.replace(
            cfg, hamer=dataclasses.replace(cfg.hamer, int8_backbone=True))
        params["hamer"]["backbone"] = jax.jit(quantize_vit_params)(
            params["hamer"]["backbone"])
        calib = jnp.asarray(
            np.random.default_rng(1).standard_normal((8, 256, 192, 3)),
            jnp.float32)
        stats = jax.jit(lambda p, x: collect_vit_act_stats(
            p, x, cfg.hamer.vit))(params["hamer"]["backbone"], calib)
        params["hamer"]["backbone"] = attach_static_act_scales(
            params["hamer"]["backbone"], stats)
    params = jax.device_put(params)
    print(f"device: {jax.devices()[0]}  batch={batch} slots={max_hands}"
          f"  int8={use_int8}", flush=True)

    rng = np.random.default_rng(0)
    images = jnp.asarray(rng.integers(0, 255, (batch, H, W, 3)).astype(np.float32))
    hws = jnp.broadcast_to(jnp.asarray([H, W], jnp.float32), (batch, 2))
    K = jnp.asarray([[906.96, 0, W / 2], [0, 906.79, H / 2], [0, 0, 1]], jnp.float32)
    Ks = jnp.broadcast_to(K, (batch, 3, 3))
    ncrops = batch * max_hands
    crops = jnp.asarray(rng.standard_normal((ncrops, 256, 256, 3)), jnp.float32)
    vit_in = jnp.asarray(rng.standard_normal(
        (ncrops,) + cfg.hamer.vit.img_size + (3,)), jnp.float32)

    results = {}

    def report(name, fn, *args):
        ms, comp = bench(fn, *args)
        results[name] = round(ms, 2)
        print(f"{name:<28s} {ms:8.2f} ms   (compile {comp:.0f}s)", flush=True)

    # 1. Detector stage (letterbox + YOLOv7 + NMS + scale_coords).
    det_fn = jax.jit(lambda p, im, hw: _scalarize(jax.vmap(
        lambda i, h: detect_hands(p, i, h, cfg))(im, hw)))
    report("detect(YOLO+NMS)", det_fn, params["yolo"], images, hws)
    dets = jax.jit(lambda p, im, hw: jax.vmap(
        lambda i, h: detect_hands(p, i, h, cfg))(im, hw))(params["yolo"], images, hws)
    dets = jax.tree_util.tree_map(np.asarray, dets)
    dets = jax.tree_util.tree_map(jnp.asarray, dets)

    # 2. ViT-H backbone alone on the crop batch.
    if use_int8:
        from hamer_yolo_tpu.core.quant import vit_forward_int8

        vit_fn = jax.jit(lambda p, x: _scalarize(
            vit_forward_int8(p, x, cfg.hamer.vit)))
    else:
        vit_fn = jax.jit(lambda p, x: _scalarize(
            vit_forward(p, x, cfg.hamer.vit)))
    report("vit_backbone", vit_fn, params["hamer"]["backbone"], vit_in)

    # 3. Full HaMeR forward (center-crop + ViT + MANO head + LBS + proj).
    ham_fn = jax.jit(lambda p, x: _scalarize(hamer_forward(p, mano, x, cfg.hamer)))
    report("hamer_forward", ham_fn, params["hamer"], crops)

    # 4. RootNet depth stage.
    if "sar" in params:
        sar_fn = jax.jit(lambda p, im, d, hw, k: _scalarize(jax.vmap(
            lambda i, dd, h, kk: estimate_depths(p, i, dd, h, kk, cfg)
        )(im, d, hw, k)))
        report("rootnet_depth", sar_fn, params["sar"], images, dets, hws, Ks)

    # 5. Composed program (the bench number).
    full_fn = jax.jit(lambda p, im, hw, k: _scalarize(jax.vmap(
        lambda i, h, kk: infer_frame(p, mano, i, h, kk, cfg))(im, hw, k)))
    report("full_pipeline", full_fn, params, images, hws, Ks)

    print(json.dumps(results))


if __name__ == "__main__":
    import sys as _sys  # _hyt_help_guard
    if "-h" in _sys.argv or "--help" in _sys.argv:
        print(__doc__ or "env-configured tool; see module docstring")
        raise SystemExit(0)
    main()
