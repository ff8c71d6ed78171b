"""Calibrate static int8 activation scales on REAL images.

Runs the detector over an image dir, extracts the exact HaMeR crops the
pipeline would feed the ViT (detect -> hamer_box_params -> hamer_crop ->
center-crop margin), pushes them through the int8 forward recording
per-matmul absmax (core.quant.collect_vit_act_stats), max-reduces over
all batches, and saves the stats .npz for
`cli ... --fast-path int8 --calib-scales scales.npz`.

TPU-native replacement for the reference's TensorRT entropy-calibration
story (yolo/yolov7/TensorRT-For-YOLO-Series-cuda-python/export.py:17-92,
`EngineBuilder(... int8=True, calib_input=...)`).

  python tools/calibrate_int8.py --input imgs/ --out scales.npz \
      [--checkpoint ckpt] [--max-images 64] [--tiny]
"""
from __future__ import annotations

import argparse
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> int:
    p = argparse.ArgumentParser()
    p.add_argument("--input", required=True, help="calibration image dir")
    p.add_argument("--out", required=True, help="output stats .npz")
    p.add_argument("--checkpoint", default=None)
    p.add_argument("--mano-dir", default=None)
    p.add_argument("--max-images", type=int, default=64)
    p.add_argument("--batch", type=int, default=8,
                   help="crops per calibration dispatch")
    p.add_argument("--tiny", action="store_true")
    args = p.parse_args()

    import cv2
    import jax
    import jax.numpy as jnp

    from hamer_yolo_tpu.cli.main import _default_K, _load_runtime
    from hamer_yolo_tpu.core.quant import (
        collect_vit_act_stats, quantize_vit_params, save_act_stats,
    )
    from hamer_yolo_tpu.geometry.boxes import hamer_box_params
    from hamer_yolo_tpu.io.writers import list_images
    from hamer_yolo_tpu.pipeline.frame import detect_hands
    from hamer_yolo_tpu.pipeline.preprocess import hamer_crop

    params, mano, cfg = _load_runtime(args)
    qbackbone = jax.jit(quantize_vit_params)(params["hamer"]["backbone"])

    @jax.jit
    def crops_fn(yolo_params, image_bgr, orig_hw):
        det = detect_hands(yolo_params, image_bgr, orig_hw, cfg)
        do_flip = 1.0 - det["is_right"]
        center, size = hamer_box_params(det["boxes"])
        crops = jax.vmap(
            lambda c, s, f: hamer_crop(image_bgr, c, s, f, cfg.crop_size)
        )(center, size, do_flip)
        return crops, det["valid"]

    m = cfg.hamer.crop_margin
    vit_cfg = cfg.hamer.vit
    stats_fn = jax.jit(lambda p, x: collect_vit_act_stats(p, x, vit_cfg))

    collected = []
    stats = None
    n_crops = 0

    def flush():
        nonlocal stats, n_crops, collected
        if not collected:
            return
        batch = np.stack(collected[:args.batch])
        # pad to the fixed dispatch size with repeats (max-reduction is
        # unaffected by duplicates)
        while batch.shape[0] < args.batch:
            batch = np.concatenate([batch, batch[:args.batch - batch.shape[0]]])
        s = stats_fn(qbackbone, jnp.asarray(batch))
        stats = s if stats is None else jax.tree_util.tree_map(
            jnp.maximum, stats, s)
        n_crops += len(collected[:args.batch])
        collected = collected[args.batch:]

    images = list_images(args.input)[:args.max_images]
    for path in images:
        img = cv2.imread(path)
        if img is None:
            continue
        hw = np.asarray(img.shape[:2], np.float32)
        crops, valid = crops_fn(params["yolo"], jnp.asarray(
            img.astype(np.float32)), jnp.asarray(hw))
        crops = np.asarray(crops)
        for i in range(crops.shape[0]):
            if bool(np.asarray(valid)[i]):
                collected.append(crops[i][:, m:-m, :])  # ViT 256x192 input
        while len(collected) >= args.batch:
            flush()
    flush()

    if stats is None:
        print("error: no valid hand crops found in the calibration set",
              file=sys.stderr)
        return 1
    save_act_stats(args.out, jax.device_get(stats))
    print(f"calibrated on {n_crops} crops from {len(images)} images "
          f"-> {args.out}")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
